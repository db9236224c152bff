"""Generate a local sf1 soak corpus by FK-consistent 10x upsampling of the
driver's sf0.1 tables (the driver corpus itself is read-only and capped at
sf0.1; this gives the one-order-of-magnitude data point SCALING.md's
plan-shape arguments predict).

Replication scheme (replica r in 0..9):
- every synthetic key (orderkey/custkey/partkey/suppkey/user_id/doc_id/
  vec_id/event_id) shifts by r * 10_000_000 — joins stay referentially
  intact, per-key row counts match sf0.1
- event/lineitem/order timestamps jitter by r microseconds so
  (entry, ts) upsert keys stay distinct without moving any distribution
- document text gets a per-replica suffix: replicas become NEAR
  duplicates of each other (realistic for dedup operators) rather than
  byte-identical explosions; n_chars is recomputed
- dimension tables region/nation copy through unchanged

Usage: python tools/make_scale_data.py [out_dir] [replicas]
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/_scale/sf1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
K = 10_000_000

QUERIES = {
    "region": "SELECT * FROM src",
    "nation": "SELECT * FROM src",
    "customer": """
        SELECT c_custkey + r.r * {K} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment FROM src, reps r""",
    "supplier": """
        SELECT s_suppkey + r.r * {K} AS s_suppkey, s_name, s_nationkey,
               s_acctbal FROM src, reps r""",
    "part": """
        SELECT p_partkey + r.r * {K} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice FROM src, reps r""",
    "orders": """
        SELECT o_orderkey + r.r * {K} AS o_orderkey,
               o_custkey + r.r * {K} AS o_custkey, o_orderstatus,
               o_totalprice, o_orderdate + to_microseconds(r.r) AS o_orderdate,
               o_orderpriority FROM src, reps r""",
    "lineitem": """
        SELECT l_orderkey + r.r * {K} AS l_orderkey,
               l_partkey + r.r * {K} AS l_partkey,
               l_suppkey + r.r * {K} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus,
               l_shipdate + to_microseconds(r.r) AS l_shipdate
        FROM src, reps r""",
    "events": """
        SELECT event_id + r.r * {K} AS event_id,
               ts + to_microseconds(r.r) AS ts,
               user_id + r.r * {K} AS user_id,
               event_type, value, props FROM src, reps r""",
    "documents": """
        SELECT doc_id + r.r * {K} AS doc_id,
               CASE WHEN r.r = 0 THEN text
                    ELSE text || ' r' || r.r END AS text,
               lang, source,
               length(CASE WHEN r.r = 0 THEN text
                           ELSE text || ' r' || r.r END) AS n_chars
        FROM src, reps r""",
    "embeddings": """
        SELECT vec_id + r.r * {K} AS vec_id, embedding, label
        FROM src, reps r""",
}


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE reps AS SELECT unnest(range({REPS})) AS r")
    for name, q in QUERIES.items():
        con.execute(f"CREATE OR REPLACE VIEW src AS "
                    f"SELECT * FROM '{SRC}/{name}.parquet'")
        sql = q.format(K=K)
        con.execute(f"COPY ({sql}) TO '{OUT}/{name}.parquet' "
                    f"(FORMAT PARQUET, COMPRESSION ZSTD)")
        n = con.sql(f"SELECT count(*) FROM '{OUT}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
