"""Verify-skill drive: the strtier-affected records-model family, run
through the driver contract (queries() vs oracle_sql()) against DuckDB
on sf0.001 and sf0.01 — the end-to-end evidence that the expression-
string tier computes identical results."""
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from reductstore_spark.session import get_session  # noqa: E402

FAMILY = [
    "when_logic2", "when_string", "when_in", "when_date2", "when_arith",
    "when_cast_ref", "when_exists", "when_date_tz", "when_rem_divnum",
    "when_cmp", "when_logic", "ctx_limit", "ctx_after_limit", "gate",
    "each_t", "each_n", "limit", "strict_mode", "ext_pipeline",
    "multi_entry", "select_labels", "ctx_each_n", "count",
    "update_labels", "scan_time_range", "remove_count", "ctx_padding",
    "repetition", "sql_surface",
]

spark = get_session("verify", master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

qs = e.queries()
oq = e.oracle_sql()
bad = []
for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
    con = duckdb.connect()
    for t in ("events", "documents", "orders", "lineitem", "region",
              "nation", "customer", "part", "supplier", "embeddings",
              "images"):
        try:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
        except Exception:
            pass
    for name in FAMILY:
        if name not in qs or name not in oq:
            bad.append((sf, name, "missing"))
            continue
        df = qs[name](spark, sf)
        got = sorted(map(tuple, df.collect()))
        want = sorted(map(tuple, con.sql(oq[name]).fetchall()))
        ok = got == want
        print(f"{sf.split('/')[-1]:8s} {name:18s} rows={len(got):6d} "
              f"{'OK' if ok else 'MISMATCH'}", flush=True)
        if not ok:
            bad.append((sf, name, f"{len(got)} vs {len(want)}",
                        got[:2], want[:2]))
    con.close()

if bad:
    print("FAILURES:", bad[:5])
    sys.exit(1)
print("ALL OK")
