"""Fleet-wide physical-plan audit: every bench query must be free of
cartesian products, unexpected nested-loop joins, and Python stages
outside the operators that semantically need them.  New queries that
legitimately add a Python/Pandas stage or a scalar-broadcast nested loop
must be added to the allowlists — the audit is the checklist forcing
that conversation."""

import pytest

from reductstore_spark.entry_queries import BENCH_EXCLUDE, QUERIES, prep

# stateful interpreter tiers, pandas-vectorized ops, store paths
PY_OK = {
    "each_t", "gate", "ctx_each_n", "ctx_after_each_n", "remove_count",
    "winnow_fingerprint", "winnow_overlap", "multimodal_meta",
    "pack_sequences", "select_labels", "ctx_padding_duration", "limit",
    "ctx_padding", "each_n", "dedup_components", "ann_ivf",
    "store_roundtrip", "store_remove", "update_labels",
    "dedup_embedding",  # Arrow-vectorized pair cosine (cosine_pd)
    "ctx_limit", "ctx_after_limit",  # ctx x $limit: slim interpreter
}
# scalar (1-row / tiny-broadcast) cross joins
NLJ_OK = {
    "join_anti_inactive", "small_qty_revenue", "top_supplier",
    "gapfill_daily", "pmi_bigrams", "ann_ivf", "decontaminate",
    "tfidf_topk", "sim_cosine_topk", "ann_lsh", "curriculum_mix",
    "doc_rarity", "embedding_quantize",
    "curation_report",  # 1-row corpus-total broadcast
    "dsir_weights", "drift_report",  # 1-row totals + 256-row score grid
}

NAMES = sorted(n for n in QUERIES if n not in BENCH_EXCLUDE)


@pytest.mark.parametrize("name", NAMES)
def test_plan_has_no_scale_red_flags(spark, sf_dir, name):
    prep(spark)
    plan = QUERIES[name][0](spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in NLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, \
            f"{name}: unexpected nested-loop join"
    if name not in PY_OK:
        for marker in ("ArrowEvalPython", "BatchEvalPython",
                       "MapInPandas", "FlatMapGroupsInPandas"):
            assert marker not in plan, f"{name}: unexpected {marker}"


def test_fleet_codegen_compiles_no_fallback(spark, sf_dir):
    """Execute every bench query with codegen fallback DISABLED: any
    generated method past Janino's 64 KB limit (or otherwise
    uncompilable) becomes a hard error instead of a silent interpreted
    fallback.  An interpreted stage on the scan path is a 100 TB
    perf cliff that plan-shape checks cannot see (plans compile lazily
    at execution, not at explain)."""
    prep(spark)
    prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    failures = []
    try:
        for name in NAMES:
            try:
                QUERIES[name][0](spark, sf_dir).count()
            except Exception as exc:  # noqa: BLE001
                failures.append((name, str(exc)[:160]))
    finally:
        spark.conf.set("spark.sql.codegen.fallback", prev)
    assert not failures, failures


def test_simhash_pairs_signature_computed_once(spark, sf_dir):
    """The band self-join must read the CACHED signature on both sides —
    without the persist the whole signature pipeline (scan -> explode ->
    64 votes -> aggregate) executed once per side (measured: 2 parquet
    scans / 4 explodes / 6 aggregates)."""
    from reductstore_spark.caching import release_caches
    from reductstore_spark.operators.dedup import simhash_near_dup_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = simhash_near_dup_pairs(docs, "doc_id", "text", 3) \
        ._jdf.queryExecution().executedPlan().toString()
    release_caches()
    # both join sides read the cache (the signature subtree still PRINTS
    # inside InMemoryRelation, so raw scan/aggregate counts stay — the
    # cache hit is what prevents double execution)
    assert plan.count("InMemoryTableScan") == 2, plan.count("InMemoryTableScan")
