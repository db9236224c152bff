"""Driver-style oracle parity: run every queries() entry on Spark and its
oracle_sql() on DuckDB over the same parquet, compare row count, schema
shape, and order-insensitive values with columns sorted by name — the
same gate CORRECTNESS_r{N}.json applies.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # compare doubles by exact repr — decimal-backed aggregates and
        # rounded scores must match bit-for-bit
        return repr(v)
    if isinstance(v, int):
        return v
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(normalize(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


NAMES = sorted(entry_mod.queries().keys())

# DuckDB result types the driver's type-sensitive hash can never match,
# because Spark has no corresponding physical type.
FORBIDDEN_ORACLE_TYPES = {"HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER",
                          "USMALLINT", "UTINYINT"}


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if sql is None:
        assert len(srows) >= 0  # rows-only check for non-SQL ops
        return
    res = ddb.sql(sql)
    # Driver hashes are TYPE-sensitive: a DuckDB HUGEINT (sum(BIGINT)
    # widens to int128) hashes differently from Spark's BIGINT even when
    # every value matches (the r3 corpus_stats/pipeline_end_to_end reds).
    # Pin every oracle's output to types Spark can emit.
    bad = [(c, str(t)) for c, t in zip(res.columns, res.types)
           if str(t).split("(")[0].upper() in FORBIDDEN_ORACLE_TYPES]
    assert not bad, f"{name}: oracle column types Spark cannot emit: {bad}"
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    sc, sv = canon(scols, srows)
    dc, dv = canon(dcols, drows)
    mism = [i for i, (a, b) in enumerate(zip(sv, dv)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} value mismatches; first: "
        f"spark={sv[mism[0]]} duckdb={dv[mism[0]]}"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["entry", "ts", "labels"]


def test_partition_invariance_subprocess(sf_dir):
    """Decimal-aggregation discipline means results are bit-identical
    under ANY parallelism: re-run numerically-sensitive queries in a
    separate process on local[5]/shuffle=7 and compare to DuckDB."""
    import subprocess
    import sys

    script = r"""
import sys; sys.path.insert(0, %r)
import duckdb
import __spark_entry__ as e
from reductstore_spark.session import get_session
spark = get_session("pinv", master="local[5]", shuffle_partitions=7)
spark.sparkContext.setLogLevel("ERROR")
sf = %r
con = duckdb.connect(); con.sql("SET TimeZone='UTC'")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
for name in ["agg_pricing", "nation_share", "class_spread",
             "embedding_quantize", "agg_rollup", "small_qty_revenue"]:
    sdf = e.queries()[name](spark, sf)
    cols = sorted(sdf.columns)
    srows = sorted([tuple(map(repr, r)) for r in sdf.select(*cols).collect()])
    drows = sorted([tuple(map(repr, r)) for r in con.sql(
        f"SELECT {', '.join(cols)} FROM ({e.oracle_sql()[name]})").fetchall()])
    assert srows == drows, name
print("PINV-OK")
spark.stop()
""" % ("/root/repo", sf_dir)
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=600)
    assert "PINV-OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]
