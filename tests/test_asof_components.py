"""asof_join and connected_components operator semantics."""

from pyspark.sql import functions as F

from reductstore_spark.operators.asof import asof_join
from reductstore_spark.operators.dedup import connected_components


def _asof_rows(spark, left_rows, right_rows, **kw):
    left = spark.createDataFrame(left_rows, "k string, ts long, lv double")
    right = spark.createDataFrame(right_rows, "k string, ts long, rv double")
    out = asof_join(left, right, on="ts", by=["k"], **kw)
    return {(r["k"], r["ts"]): (r["ts_r"], r["rv_r"]) for r in out.collect()}


def test_asof_backward_with_ties(spark):
    got = _asof_rows(
        spark,
        [("a", 100, 1.0), ("a", 200, 2.0), ("a", 300, 3.0)],
        [("a", 100, 10.0), ("a", 250, 25.0)],
    )
    assert got[("a", 100)] == (100, 10.0)   # same-instant right row matches
    assert got[("a", 200)] == (100, 10.0)
    assert got[("a", 300)] == (250, 25.0)


def test_asof_no_match_and_group_isolation(spark):
    got = _asof_rows(
        spark,
        [("a", 50, 1.0), ("b", 500, 2.0)],
        [("a", 100, 10.0)],
    )
    assert got[("a", 50)] == (None, None)    # right is later than left
    assert got[("b", 500)] == (None, None)   # other group's rows invisible


def test_asof_tolerance(spark):
    got = _asof_rows(
        spark,
        [("a", 100, 1.0), ("a", 1000, 2.0)],
        [("a", 90, 9.0)],
        tolerance=50,
    )
    assert got[("a", 100)] == (90, 9.0)      # 10 ticks back: within 50
    assert got[("a", 1000)] == (None, None)  # 910 back: nulled, row kept


def test_asof_left_rows_all_survive(spark):
    left = spark.createDataFrame(
        [("a", i * 10, float(i)) for i in range(20)],
        "k string, ts long, lv double")
    right = spark.createDataFrame([("a", 95, 1.0)],
                                  "k string, ts long, rv double")
    assert asof_join(left, right, on="ts", by=["k"]).count() == 20


def _components(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    out = connected_components(df)
    return {r["id"]: r["component"] for r in out.collect()}


def test_components_chain_and_isolated_cluster(spark):
    got = _components(spark, [(1, 2), (2, 3), (7, 9)])
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_components_long_path_converges(spark):
    """A 12-node path graph needs multi-round propagation (exercises the
    pointer-jump acceleration, not just one neighbor-min step)."""
    got = _components(spark, [(i, i + 1) for i in range(1, 12)])
    assert got == {i: 1 for i in range(1, 13)}


def test_components_min_id_not_first_seen(spark):
    got = _components(spark, [(10, 20), (20, 5), (30, 10)])
    assert got == {5: 5, 10: 5, 20: 5, 30: 5}


def test_asof_join_empty_by_raises():
    """Un-keyed as-of joins single-partition the whole union — refuse
    (round-2 verdict #4)."""
    import pytest as _pytest
    from reductstore_spark.operators.asof import asof_join

    class _Fake:  # never reaches Spark: the guard fires first
        columns = ["ts", "v"]

    with _pytest.raises(ValueError, match="at least one `by` key"):
        asof_join(_Fake(), _Fake(), on="ts", by=[])
