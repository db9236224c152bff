"""SQL-surface smoke: registered views answer SQL over the same data
the condition-language queries see."""

from pyspark.sql import functions as F

from reductstore_spark.catalog import register_tables, sql_over


def test_register_tables_and_records_view(spark, sf_dir):
    register_tables(spark, sf_dir)
    n_li = spark.sql("SELECT count(*) AS n FROM lineitem").collect()[0]["n"]
    assert n_li == spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    # records view carries the record model: entry/ts(µs)/labels
    row = spark.sql(
        "SELECT entry, ts, labels['user'] AS u FROM records "
        "ORDER BY ts, entry LIMIT 1").collect()[0]
    assert isinstance(row["ts"], int) and row["u"] is not None


def test_sql_join_agg_over_views(spark, sf_dir):
    out = sql_over(spark, sf_dir, """
        SELECT r_name, count(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
    """).collect()
    ref = (spark.read.parquet(f"{sf_dir}/customer.parquet")
           .join(spark.read.parquet(f"{sf_dir}/nation.parquet"),
                 F.col("c_nationkey") == F.col("n_nationkey"))
           .join(spark.read.parquet(f"{sf_dir}/region.parquet"),
                 F.col("n_regionkey") == F.col("r_regionkey"))
           .groupBy("r_name").count().orderBy("r_name").collect())
    assert [(r["r_name"], r["n"]) for r in out] == \
        [(r["r_name"], r["count"]) for r in ref]


def test_register_store_view(spark, tmp_path):
    from reductstore_spark.catalog import register_store
    from reductstore_spark.sources.store import RecordStore
    schema = ("bucket string, entry string, ts long, payload binary, "
              "content_type string, state int, labels map<string,string>, "
              "computed_labels map<string,string>")
    store = RecordStore(spark, str(tmp_path / "s"))
    store.write(spark.createDataFrame(
        [("b", "e1", i * 1000, None, "", 1, {"v": str(i)}, {})
         for i in range(5)], schema))
    register_store(spark, str(tmp_path / "s"), view="store_recs")
    got = spark.sql(
        "SELECT ts FROM store_recs WHERE labels['v'] >= '3' ORDER BY ts"
    ).collect()
    assert [r["ts"] for r in got] == [3000, 4000]


def test_sql_pushdown_through_view(spark, sf_dir):
    register_tables(spark, sf_dir)
    df = spark.sql(
        "SELECT doc_id FROM documents WHERE doc_id BETWEEN 10 AND 20")
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.split("\n") if "PushedFilters" in l][0]
    assert "GreaterThanOrEqual(doc_id,10)" in scan, scan
    scheme = [l for l in plan.split("\n") if "ReadSchema" in l][0]
    assert "text" not in scheme, scheme  # pruned through the view
