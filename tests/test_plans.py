"""Plan-shape regression tests: pushdown, broadcasts, partial aggregation,
$meta system entries.  Guards the scale-critical physical-plan properties
the engine depends on at 100 TB."""

import pytest
from pyspark.sql import functions as F

from reductstore_spark.entry_queries import QUERIES, T0, T1, _records, prep
from reductstore_spark.query import QueryEngine
from reductstore_spark.sources.store import RecordStore

SCHEMA = ("bucket string, entry string, ts long, payload binary, "
          "content_type string, state int, labels map<string,string>, "
          "computed_labels map<string,string>")


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_time_range_reaches_parquet_scan(spark, sf_dir):
    df = QueryEngine().query(
        _records(spark, sf_dir, start_us=T0, stop_us=T1),
        start=T0, stop=T1, ordered=False)
    plan = plan_of(df)
    scan = [l for l in plan.split("\n") if "PushedFilters" in l][0]
    assert "GreaterThanOrEqual(ts" in scan and "LessThan(ts" in scan, scan


def test_store_scan_pushes_ts_range(spark, tmp_path):
    store = RecordStore(spark, str(tmp_path / "s"))
    rows = [("b", "e", i * 1_000_000, None, "", 1, {}, {}) for i in range(10)]
    store.write(spark.createDataFrame(rows, SCHEMA))
    df = QueryEngine().query(store.read(), start=2_000_000, stop=8_000_000,
                             ordered=False)
    plan = plan_of(df)
    scan = [l for l in plan.split("\n") if "PushedFilters" in l][0]
    # the physical ts column lets both bounds reach the scan
    assert "GreaterThanOrEqual(ts,2000000)" in scan and "LessThan(ts,8000000)" in scan, scan


def test_small_dims_broadcast(spark, sf_dir):
    plan = plan_of(QUERIES["join_region"][0](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, plan[:500]


def test_agg_partial_mapside(spark, sf_dir):
    plan = plan_of(QUERIES["agg_pricing"][0](spark, sf_dir))
    assert "partial_" in plan, "no map-side partial aggregation"
    scan = [l for l in plan.split("\n") if "ReadSchema" in l][0]
    # column pruning: unused lineitem columns never reach the scan
    assert "l_orderkey" not in scan and "l_partkey" not in scan, scan


@pytest.mark.parametrize("qname", ["join_topn", "sim_cosine_topk",
                                   "ann_lsh", "ann_ivf"])
def test_topk_is_take_ordered_not_global_window(spark, sf_dir, qname):
    """Global top-k must plan as TakeOrderedAndProject (per-partition
    top-k + k-row merge), never a single-partition row_number window
    over the scored corpus (VERDICT r1 finding #1)."""
    plan = plan_of(QUERIES[qname][0](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan[:800]
    # any remaining GLOBAL window (windowspec starts with an ordering, not
    # a partition column) must sit directly on a TakeOrderedAndProject,
    # i.e. ranks <= k rows — never the scored corpus
    lines = [l for l in plan.split("\n")
             if "Window [" in l or "TakeOrderedAndProject" in l]
    for i, line in enumerate(lines):
        if "windowspecdefinition(" not in line:
            continue
        first_arg = line.split("windowspecdefinition(", 1)[1].split(",", 1)[0]
        if "DESC" in first_arg or "ASC" in first_arg:  # global window
            assert i + 1 < len(lines) and "TakeOrderedAndProject" in lines[i + 1], line


def test_flat_predicate_no_python_no_hof(spark, sf_dir):
    df = QUERIES["when_in"][0](spark, sf_dir)
    plan = plan_of(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "transform(" not in plan  # no interpreted HOF in the hot path


def test_meta_entries(spark, tmp_path):
    store = RecordStore(spark, str(tmp_path / "s"))
    rows = [("b", "e1", 0, None, "", 1, {}, {})]
    store.write(spark.createDataFrame(rows, SCHEMA))
    store.write_meta("b", "e1", "ext_defaults", {"img": "rgb"})
    store.write_meta("b", "e1", "ext_defaults", {"img": "gray"})  # upsert by key
    store.write_meta("b", "e1", "other", {"x": "1"})
    meta = store.read_meta("b", "e1")
    assert meta == {"ext_defaults": {"img": "gray"}, "other": {"x": "1"}}
    # hidden from listings and wildcard queries
    assert store.entries() == [("b", "e1")]
    assert ("b", "e1/$meta") in store.entries(include_hidden=True)
    out = QueryEngine().query(store.read())
    assert {r["entry"] for r in out.select("entry").collect()} == {"e1"}
    # FIFO eviction ignores $meta partitions
    assert store.evict_fifo("b", quota_bytes=1) == 0


def test_asof_is_windowed_merge_not_range_join(spark, sf_dir):
    """asof_join must compile to a keyed window pass — an inequality
    join would become a per-key cross product (O(|L|x|R|)) at scale."""
    plan = plan_of(QUERIES["asof_purchase"][0](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "windowspecdefinition(user_id" in plan  # keyed, not global


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed+sorted on the join key must sort-merge join
    with zero Exchange and zero per-task Sort — the co-location that
    makes repeated fact-fact joins affordable at 100 TB."""
    from reductstore_spark.sources.bucketed import write_bucketed
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "orders_b", ["o_orderkey"], 4,
                   str(tmp_path / "ob"))
    write_bucketed(li, "lineitem_b", ["l_orderkey"], 4,
                   str(tmp_path / "lb"))
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # scan-reports-sorted is opt-in since Spark 3 (it requires one
        # file per bucket, which write_bucketed guarantees)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        j = spark.table("orders_b").join(
            spark.table("lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"))
        plan = plan_of(j)
        assert "SortMergeJoin" in plan, plan[:600]
        assert "Exchange" not in plan, plan[:600]
        assert "Sort " not in plan, plan[:600]  # bucket files pre-sorted
        n = j.count()
        ref = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
        assert n == ref
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset(
            "spark.sql.legacy.bucketedTableScan.outputOrdering")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_ngram_topk_codegen_and_takeordered(spark, sf_dir):
    """Bigram construction must stay in whole-stage codegen (posexplode +
    lead, not an interpreted array HOF) and the final top-k must be
    TakeOrderedAndProject."""
    plan = plan_of(QUERIES["ngram_topk"][0](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan[:600]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_count" in plan  # map-side combine before the shuffle


def test_ext_pipeline_label_expr_compiles_to_jvm(spark, sf_dir):
    """The #ext label_expr step must run as Catalyst column transforms
    (no Python stage), and its strict per-step when must filter on the
    bound computed_labels attribute — not re-expand the map
    construction per reference (the plan stays small)."""
    plan = plan_of(QUERIES["ext_pipeline"][0](spark, sf_dir))
    assert "MapInPandas" not in plan and "EvalPython" not in plan, plan[:500]
    assert len(plan) < 20000, f"plan blew up to {len(plan)} chars"


def test_quality_and_split_prune_columns(spark, sf_dir):
    for q in ["sample_split", "quality_filter"]:
        plan = plan_of(QUERIES[q][0](spark, sf_dir))
        scan = [l for l in plan.split("\n") if "ReadSchema" in l][0]
        assert "text" not in scan or q == "quality_filter", scan
        assert "lang" not in scan and "source" not in scan, scan


@pytest.mark.parametrize("qname", ["each_n", "limit", "ctx_each_n",
                                   "ctx_after_each_n"])
def test_counter_shapes_stay_jvm_side(spark, sf_dir, qname):
    """$each_n/$limit conjuncts (with or without ctx paddings) must plan
    as window rewrites — never a Python stage.  Guards the $and
    flattening: the parser's implicit root AllOf used to hide the
    single-stateful-conjunct pattern from the rewrite tiers."""
    plan = plan_of(QUERIES[qname][0](spark, sf_dir))
    assert "FlatMapGroupsInPandas" not in plan, plan[:600]
    assert "EvalPython" not in plan, plan[:600]


@pytest.mark.parametrize("qname", ["each_t", "gate"])
def test_time_stateful_walk_is_keys_only(spark, sf_dir, qname):
    """$each_t/$gate route through the vectorized walk tier: the Python
    stage must see only the (bucket, entry, ts, flags) key columns —
    whole records never cross the Arrow boundary — and rejoin as a
    broadcastable semi-join."""
    plan = plan_of(QUERIES[qname][0](spark, sf_dir))
    assert "FlatMapGroupsInPandas" in plan, plan[:600]
    line = [l for l in plan.split("\n") if "FlatMapGroupsInPandas" in l][0]
    assert "labels" not in line and "props" not in line, line
    assert "LeftSemi" in plan, plan[:600]


def test_rollup_single_shuffle_expand(spark, sf_dir):
    """ROLLUP computes all grouping levels from ONE Expand + one
    aggregation shuffle — never a per-level rescan of the fact table."""
    plan = plan_of(QUERIES["agg_rollup"][0](spark, sf_dir))
    assert "Expand" in plan
    assert plan.count("Scan parquet") == 1, "rollup rescanned the fact table"
    assert plan.count("Exchange") == 1, "rollup needs exactly one shuffle"


def test_anti_and_scalar_joins_broadcast(spark, sf_dir):
    """The Q22-style anti join: threshold is a 1-row broadcast, the
    recent-orders anti side a broadcast hash join — no shuffle of
    customer for either."""
    plan = plan_of(QUERIES["join_anti_inactive"][0](spark, sf_dir))
    assert "LeftAnti" in plan, plan[:800]
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_set_ops_no_cartesian(spark, sf_dir):
    plan = plan_of(QUERIES["user_set_ops"][0](spark, sf_dir))
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_curriculum_window_is_partitioned(spark, sf_dir):
    """The cumsum window partitions by source — the shuffle is a hash
    partitioning on source, never a single-partition global sort."""
    plan = plan_of(QUERIES["curriculum_mix"][0](spark, sf_dir))
    assert "hashpartitioning(source" in plan, plan[:800]
    assert "SinglePartition" not in plan


def test_gapfill_grid_is_distributed_explode(spark, sf_dir):
    """The dense gapfill grid comes from a distributed sequence explode
    over the reduced key list (a Generate node), not a driver-side
    calendar; the only nested-loop is the 1-row span broadcast."""
    plan = plan_of(QUERIES["gapfill_daily"][0](spark, sf_dir))
    assert "Generate explode" in plan, plan[:800]
    assert "CartesianProduct" not in plan


def test_ext_pipeline_binds_leaves_once(spark, sf_dir):
    """Compiled extensions pre-bind the label parse: the numeric-parse
    regex appears a bounded number of times in the plan (once per bound
    leaf + one dry-run remnant), not once per AST reference."""
    plan = plan_of(QUERIES["ext_pipeline"][0](spark, sf_dir))
    # one extra bounded RLIKE per leaf since the exact-i64 lane landed
    # (lng tries a strict i64 parse); still O(leaves), not O(references)
    assert plan.count("RLIKE") <= 6, f"leaf parse re-inlined: {plan.count('RLIKE')} RLIKEs"


def test_wide_conjunction_compiles_within_janino_limit(spark, sf_dir):
    """when_date2's five date extractions previously blew the generated
    count-stage method past Janino's 64 KB limit and the whole stage ran
    interpreted.  With codegen fallback DISABLED, compilation failures
    become hard errors — this pins that the conjunct-binding planner
    path keeps every generated method compilable."""
    prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        for name in ("when_date2", "when_logic", "when_date", "when_cmp",
                     "when_arith", "when_rem_divnum", "count"):
            QUERIES[name][0](spark, sf_dir).count()
    finally:
        spark.conf.set("spark.sql.codegen.fallback", prev)


def test_strict_conjunct_binding_first_error_wins(spark):
    """The conjunct-binding path (wide $and/$or) must keep strict-mode
    semantics: raise the FIRST error in operand order, and not raise at
    all when an earlier operand already decided the result."""
    from reductstore_spark.condition.parser import parse_when
    from reductstore_spark.plans.planner import plan_parsed

    df = spark.createDataFrame(
        [(0, {"a": "5"})], "ts long, labels map<string,string>")

    def run(when):
        node, d = parse_when(when)
        return plan_parsed(df, node, d, strict=True).count()

    # 3+ operands engage conjunct binding; missing labels error in order
    with pytest.raises(Exception, match="Reference '&m1' not found"):
        run({"$and": [{"&a": {"$gt": 1}}, {"&m1": {"$gt": 0}},
                      {"&m2": {"$gt": 0}}]})
    # an earlier operand deciding the result short-circuits the error
    # (all_of.rs: the scan stops at the first falsifying operand)
    assert run({"$and": [{"&a": {"$gt": 99}}, {"&m1": {"$gt": 0}},
                         {"&a": {"$gt": 1}}]}) == 0
    assert run({"$or": [{"&a": {"$gt": 1}}, {"&m1": {"$gt": 0}},
                        {"&m2": {"$gt": 0}}]}) == 1
