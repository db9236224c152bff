"""Component tests for the banded range join and time-bucket gapfill
operators: exact boundary semantics (lower inclusive / upper exclusive),
negative-timestamp bucket alignment, and the plan shapes that make them
scale (hash join — never a nested-loop/cartesian; distributed grid)."""

import pytest
from pyspark.sql import functions as F

from reductstore_spark.operators.gapfill import time_bucket_gapfill
from reductstore_spark.operators.rangejoin import _fdiv, range_join


def _pairs(spark, left_ts, right_ts, lower, upper):
    l = spark.createDataFrame([(1, t, i) for i, t in enumerate(left_ts)],
                              "k int, ts long, lid int")
    r = spark.createDataFrame([(1, t, i) for i, t in enumerate(right_ts)],
                              "k int, ts long, rid int")
    got = range_join(l, r, by=["k"], lower=lower, upper=upper)
    return sorted((row.lid, row.rid_r) for row in got.collect())


def _naive(left_ts, right_ts, lower, upper):
    return sorted((i, j) for i, lt in enumerate(left_ts)
                  for j, rt in enumerate(right_ts)
                  if lower <= rt - lt < upper)


def test_range_join_boundaries(spark):
    # delta == lower matches, delta == upper does not
    left = [100]
    right = [100 + d for d in (-11, -10, -1, 0, 9, 10, 11)]
    assert _pairs(spark, left, right, -10, 10) == _naive(left, right, -10, 10)


def test_range_join_negative_ts_and_buckets(spark):
    # negative timestamps exercise floor (not truncate-toward-zero)
    # division in the bucket assignment
    left = [-25, -10, 0, 7, 19]
    right = [-30, -24, -11, -3, 0, 5, 13, 21]
    for lo, hi in [(-7, 0), (0, 7), (-5, 5), (-20, -10)]:
        assert _pairs(spark, left, right, lo, hi) == _naive(left, right, lo, hi)


def test_range_join_matches_naive_dense(spark):
    left = list(range(0, 50, 3))
    right = list(range(-5, 55, 4))
    assert _pairs(spark, left, right, -6, 9) == _naive(left, right, -6, 9)


def test_range_join_is_hash_join_not_nested_loop(spark, sf_dir):
    from reductstore_spark.entry_queries import q_range_join
    plan = q_range_join(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_fdiv_exact_at_large_magnitude(spark):
    # 1.7e15 µs-scale values where double floor(a/b) can misround
    vals = [1_700_000_000_000_007, -1_700_000_000_000_007, 0, -1, 86_399]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {r.x: r.b for r in
           df.select("x", _fdiv(F.col("x"), 86_400_000_000).alias("b")).collect()}
    assert got == {v: v // 86_400_000_000 for v in vals}


def test_gapfill_zeros_locf_and_span(spark):
    rows = [("a", 0, 1.0), ("a", 5, 2.0),   # buckets 0 and 2 (width 2)
            ("b", 3, 4.0)]                  # bucket 1 only
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    out = time_bucket_gapfill(
        df, key="k", ts_col="ts", width=2,
        value_col=F.sum("v").cast("double")).collect()
    byk = {(r.k, r.bucket): r for r in out}
    # dense grid: global span is buckets 0..2 for BOTH keys
    assert set(byk) == {("a", 0), ("a", 1), ("a", 2),
                        ("b", 0), ("b", 1), ("b", 2)}
    assert byk[("a", 1)].n_rows == 0 and byk[("a", 1)].sum_value is None
    assert byk[("a", 1)].locf_sum_value == 1.0        # carried forward
    assert byk[("a", 2)].locf_sum_value == 2.0        # fresh observation
    assert byk[("b", 0)].locf_sum_value is None       # nothing to carry yet
    assert byk[("b", 2)].n_rows == 0 and byk[("b", 2)].locf_sum_value == 4.0


def test_range_join_rejects_empty_interval(spark):
    df = spark.createDataFrame([(1, 0)], "k int, ts long")
    with pytest.raises(ValueError):
        range_join(df, df, by=["k"], lower=5, upper=5)
