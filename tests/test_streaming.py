"""Streaming: continuous queries, replication, stateful stream operators.

Strategy: write batches into a RecordStore, run the stream with
Trigger.AvailableNow into a memory sink, append more data, run again —
verifying restart-from-checkpoint picks up only new records (the
reference's continuous-query restart-from-last_ts+1, continuous.rs:16-84).
"""

import json
import time

import pytest
from pyspark.sql import functions as F

from reductstore_spark.condition.interpreter import Context, Evaluator
from reductstore_spark.condition.parser import parse_when
from reductstore_spark.sources.store import RecordStore
from reductstore_spark.streaming.continuous import continuous_query
from reductstore_spark.streaming.replication import (
    ReplicationSettings,
    replication_stream,
    start_replication,
)
from reductstore_spark.streaming.stateful import stateful_stream

SCHEMA = ("bucket string, entry string, ts long, payload binary, "
          "content_type string, state int, labels map<string,string>, "
          "computed_labels map<string,string>")


def mk_rows(entry, n, base=0):
    return [("b1", entry, base + i * 1_000_000, None, "", 1,
             {"v": str(i + base // 1_000_000)}, {}) for i in range(n)]


def drain(spark, stream_df, out_dir, checkpoint):
    """Drain available data to a parquet sink (checkpoint-recoverable,
    unlike the memory sink); returns the ts values written this run."""
    import os
    before = set()
    if os.path.exists(out_dir):
        before = {r["ts"] for r in spark.read.parquet(out_dir).select("ts").collect()}
    q = (stream_df.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    after = {r["ts"] for r in spark.read.parquet(out_dir).select("ts").collect()}
    return after - before


def test_continuous_query_restarts_from_checkpoint(spark, tmp_path):
    root = str(tmp_path / "store")
    cp = str(tmp_path / "cp")
    store = RecordStore(spark, root)
    store.write(spark.createDataFrame(mk_rows("e1", 5), SCHEMA))

    out = str(tmp_path / "out")
    stream = continuous_query(spark, root, when={"&v": {"$gte": 2}})
    got1 = drain(spark, stream, out, cp)
    assert got1 == {2_000_000, 3_000_000, 4_000_000}

    # append new data; a new AvailableNow run over the same checkpoint
    # must process ONLY the new files (restart semantics)
    store.write(spark.createDataFrame(mk_rows("e1", 3, base=10_000_000), SCHEMA))
    stream2 = continuous_query(spark, root, when={"&v": {"$gte": 2}})
    got2 = drain(spark, stream2, out, cp)
    assert got2 == {10_000_000, 11_000_000, 12_000_000}  # v=10,11,12 all >= 2


def test_continuous_query_glob_sees_post_start_entries(spark, tmp_path):
    """The entry glob compiles to a JVM predicate, so an entry that first
    appears AFTER the stream is registered is picked up by the SAME
    checkpointed stream — no restart, no driver-side entry listing (the
    reference resolves entries once at registration; the predicate form
    is strictly better)."""
    root = str(tmp_path / "store")
    cp = str(tmp_path / "cp")
    out = str(tmp_path / "out")
    store = RecordStore(spark, root)
    store.write(spark.createDataFrame(mk_rows("cam1/front", 3), SCHEMA))

    stream = continuous_query(spark, root, entries=["cam*", "!cam2/**"])
    got1 = drain(spark, stream, out, cp)
    assert got1 == {0, 1_000_000, 2_000_000}

    # new entries appear after the stream started: one matching the glob,
    # one matched by the exclusion, one not matching at all
    store.write(spark.createDataFrame(
        mk_rows("cam9/front", 2, base=10_000_000)
        + mk_rows("cam2/front", 2, base=20_000_000)
        + mk_rows("logs", 2, base=30_000_000), SCHEMA))
    stream2 = continuous_query(spark, root, entries=["cam*", "!cam2/**"])
    got2 = drain(spark, stream2, out, cp)
    assert got2 == {10_000_000, 11_000_000}
    ent = {r["entry"] for r in spark.read.parquet(out).select("entry").collect()}
    assert ent == {"cam1/front", "cam9/front"}


def test_stateful_stream_ctx_before_spans_micro_batches(spark, tmp_path):
    """#ctx_before on a stream: the buffer lives in the group state, so
    a match at the START of batch 2 drains context rows written in
    batch 1 — the reference's sequential tail scan behavior
    (when.rs:60-107 + ctx_before.rs queue/drain)."""
    root = str(tmp_path / "store")
    cp = str(tmp_path / "cp")
    out = str(tmp_path / "out")
    store = RecordStore(spark, root)
    when = {"#ctx_before": 2, "&v": {"$gte": 10}}

    # batch 1: v = 0..4 — no match, but the last two rows are context
    store.write(spark.createDataFrame(mk_rows("e1", 5), SCHEMA))
    got1 = drain(spark, stateful_stream(continuous_query(spark, root), when),
                 out, cp)
    assert got1 == set()

    # batch 2: v = 10, 11 at ts 10s, 11s — first row matches and must
    # drain ts=3s,4s from the PREVIOUS batch's buffer
    store.write(spark.createDataFrame(mk_rows("e1", 2, base=10_000_000), SCHEMA))
    got2 = drain(spark, stateful_stream(continuous_query(spark, root), when),
                 out, cp)
    assert got2 == {3_000_000, 4_000_000, 10_000_000, 11_000_000}


def test_stateful_stream_ctx_limit_interrupt_persists(spark, tmp_path):
    """ctx_before + $limit on a stream: context rows do not count
    against the limit, and once the counter passes N the Interrupt
    latches across checkpoint recovery — later batches emit nothing."""
    root = str(tmp_path / "store")
    cp = str(tmp_path / "cp")
    out = str(tmp_path / "out")
    store = RecordStore(spark, root)
    when = {"#ctx_before": 1,
            "$and": [{"&v": {"$gte": 3}}, {"$limit": 2}]}

    store.write(spark.createDataFrame(mk_rows("e1", 6), SCHEMA))
    got1 = drain(spark, stateful_stream(continuous_query(spark, root), when),
                 out, cp)
    # matches v=3,4 (limit 2); each drains 1-before context
    assert got1 == {2_000_000, 3_000_000, 4_000_000}

    store.write(spark.createDataFrame(mk_rows("e1", 3, base=10_000_000), SCHEMA))
    got2 = drain(spark, stateful_stream(continuous_query(spark, root), when),
                 out, cp)
    assert got2 == set()  # interrupted scan stays interrupted


def test_continuous_query_select_labels_and_ctx_raises(spark, tmp_path):
    root = str(tmp_path / "store")
    store = RecordStore(spark, root)
    store.write(spark.createDataFrame(mk_rows("e1", 3), SCHEMA))
    stream = continuous_query(
        spark, root, when={"#select_labels": ["v"], "&v": {"$gte": 1}})
    q = stream.writeStream.format("memory").queryName("selstream") \
        .trigger(availableNow=True).start()
    q.awaitTermination(60)
    rows = spark.sql("SELECT ts, labels FROM selstream ORDER BY ts").collect()
    assert [r["ts"] for r in rows] == [1_000_000, 2_000_000]
    assert all(set(r["labels"].keys()) == {"v"} for r in rows)
    with pytest.raises(NotImplementedError, match="ctx"):
        continuous_query(spark, root,
                         when={"#ctx_before": 2, "&v": {"$gte": 1}})


def test_replication_entry_glob_prefix_and_when(spark, tmp_path):
    src_root = str(tmp_path / "src")
    dst_root = str(tmp_path / "dst")
    cp = str(tmp_path / "cp")
    src = RecordStore(spark, src_root)
    rows = (mk_rows("cam1/front", 4) + mk_rows("cam2/front", 4)
            + mk_rows("logs", 4))
    src.write(spark.createDataFrame(rows, SCHEMA))

    settings = ReplicationSettings(
        src_bucket="b1", dst_bucket="replica",
        entries=["cam*", "!cam2/**"], dst_prefix="mirror/",
        when={"&v": {"$gte": 1}},
    )
    q = start_replication(spark, src_root, dst_root, settings, cp,
                          available_now=True)
    q.awaitTermination(120)

    dst = RecordStore(spark, dst_root).read()
    rows = dst.select("bucket", "entry", "ts").collect()
    assert {r["bucket"] for r in rows} == {"replica"}
    assert {r["entry"] for r in rows} == {"mirror/cam1/front"}
    assert {r["ts"] for r in rows} == {1_000_000, 2_000_000, 3_000_000}


def test_windowed_rollup_watermark_late_data(spark, tmp_path):
    """Watermarked rollup: a belated write folds into its bucket as long
    as the bucket is still open (window end > watermark — for windowed
    aggregation Spark's lateness unit is the window, not the row); a
    write into an already-closed bucket is dropped; append mode emits
    each bucket exactly once when the watermark passes its end."""
    from reductstore_spark.streaming.rollup import windowed_rollup

    root = str(tmp_path / "store")
    cp = str(tmp_path / "cp")
    out = str(tmp_path / "out")
    store = RecordStore(spark, root)

    def run(expect_new):
        roll = windowed_rollup(continuous_query(spark, root),
                               window_duration="2 seconds",
                               watermark_delay="1 second")
        q = (roll.writeStream.format("parquet").outputMode("append")
             .option("path", out).option("checkpointLocation", cp)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = {(r["win_start"], r["n"])
                for r in spark.read.parquet(out).collect()}
        return rows

    # ts 0..4s; watermark ends at 4s-1s=3s -> only window [0,2) closes
    store.write(spark.createDataFrame(mk_rows("e1", 5), SCHEMA))
    assert run(1) == {(0, 2)}

    # watermark restored at 3s: 1.5s targets the CLOSED [0,2) bucket ->
    # dropped (its n=2 stands); 2.5s and 3.5s fold into the still-open
    # [2,4) bucket; 7s advances the watermark to 6s, closing [2,4)
    # (n=4: ts 2, 2.5, 3, 3.5) and [4,6) (n=1)
    late = [("b1", "e1", 1_500_000, None, "", 1, {}, {}),
            ("b1", "e1", 2_500_000, None, "", 1, {}, {}),
            ("b1", "e1", 3_500_000, None, "", 1, {}, {}),
            ("b1", "e1", 7_000_000, None, "", 1, {}, {})]
    store.write(spark.createDataFrame(late, SCHEMA))
    assert run(2) == {(0, 2), (2_000_000, 4), (4_000_000, 1)}


def test_windowed_rollup_value_label_aggregates(spark, tmp_path):
    """value_label aggregates parse the label as double per record;
    missing / non-numeric labels count toward n but not the value
    aggregates (the condition language's parse-don't-fail posture)."""
    from reductstore_spark.streaming.rollup import windowed_rollup

    rows = [("b1", "e1", 0, None, "", 1, {"v": "1.5"}, {}),
            ("b1", "e1", 500_000, None, "", 1, {"v": "2.5"}, {}),
            ("b1", "e1", 900_000, None, "", 1, {"v": "oops"}, {}),
            ("b1", "e1", 1_100_000, None, "", 1, {}, {})]
    df = spark.createDataFrame(rows, SCHEMA)
    out = windowed_rollup(df, window_duration="1 second",
                          watermark_delay="1 second", value_label="v")
    got = {r["win_start"]: r for r in out.collect()}
    w0 = got[0]
    assert (w0["n"], w0["v_sum"], w0["v_min"], w0["v_max"]) == (3, 4.0, 1.5, 2.5)
    w1 = got[1_000_000]
    assert (w1["n"], w1["v_sum"]) == (1, None)


def test_stateful_stream_gate_across_batches(spark, tmp_path):
    """$gate's deadline/latch state must survive micro-batch boundaries."""
    root = str(tmp_path / "store")
    cp = str(tmp_path / "cp")
    out = str(tmp_path / "out")
    store = RecordStore(spark, root)
    # input condition true while v < 3; gate window 2.5s
    when = {"$gate": ["2500ms", {"&v": {"$lt": 3}}]}

    store.write(spark.createDataFrame(mk_rows("e1", 5), SCHEMA))
    got1 = sorted(drain(spark, stateful_stream(continuous_query(spark, root), when), out, cp))
    store.write(spark.createDataFrame(mk_rows("e1", 5, base=5_000_000), SCHEMA))
    got2 = sorted(drain(spark, stateful_stream(continuous_query(spark, root), when), out, cp))

    node, _ = parse_when(when)
    ev = Evaluator(node)
    from reductstore_spark.condition import values as V
    expect = []
    for i in range(10):
        ts = i * 1_000_000
        labels = {"v": str(i if i < 5 else i)}
        if V.as_bool(ev.apply(Context(ts, {"v": str(i)}, {}))):
            expect.append(ts)
    assert got1 + got2 == expect, (got1, got2, expect)


def test_stateful_stream_each_t_across_batches(spark, tmp_path):
    root = str(tmp_path / "store")
    cp = str(tmp_path / "cp")
    store = RecordStore(spark, root)
    # 0s, 1s, 2s, 3s, 4s — $each_t 2.5s: first primes (False), emits at
    # >= 2.5s elapsed
    store.write(spark.createDataFrame(mk_rows("e1", 5), SCHEMA))

    out = str(tmp_path / "out")
    when = {"$each_t": 2.5}
    stream = stateful_stream(continuous_query(spark, root), when)
    got1 = sorted(drain(spark, stream, out, cp))

    # second batch continues the SAME state (last emit carried over)
    store.write(spark.createDataFrame(mk_rows("e1", 5, base=5_000_000), SCHEMA))
    stream2 = stateful_stream(continuous_query(spark, root), when)
    got2 = sorted(drain(spark, stream2, out, cp))

    # oracle: one continuous interpreter run over all 10 records
    node, _ = parse_when(when)
    ev = Evaluator(node)
    expect = []
    from reductstore_spark.condition import values as V
    for ts in [i * 1_000_000 for i in range(10)]:
        if V.as_bool(ev.apply(Context(ts, {}, {}))):
            expect.append(ts)
    assert got1 + got2 == expect, (got1, got2, expect)


def test_deduped_ingest_drops_duplicates_across_batches(spark, tmp_path):
    """Streaming upsert-by-(entry, ts): a retransmitted record inside the
    watermark window is dropped; distinct timestamps all pass; state is
    keyed on (entry, ts) so the same ts on another entry survives."""
    from reductstore_spark.streaming.ingest import deduped_ingest

    src_root = str(tmp_path / "src")
    cp = str(tmp_path / "cp")
    out = str(tmp_path / "out")
    store = RecordStore(spark, src_root)

    # realistic epoch base: ts=0 would sit exactly on Spark's initial
    # zero watermark and be discarded as late before dedup even runs
    B = 1_700_000_000_000_000
    rows = mk_rows("e1", 3, base=B) + mk_rows("e1", 3, base=B) \
        + mk_rows("e2", 2, base=B)
    # write duplicates via two appends so they land in separate files —
    # the file stream surfaces both copies (no global shadowing mid-stream)
    store.write(spark.createDataFrame(rows[:3] + rows[6:], SCHEMA))
    store.write(spark.createDataFrame(rows[3:6], SCHEMA))

    stream = deduped_ingest(continuous_query(spark, src_root))
    q = (stream.writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", cp)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.read.parquet(out).select("entry", "ts").collect()
    pairs = sorted((r["entry"], r["ts"]) for r in got)
    assert pairs == sorted(
        [("e1", B), ("e1", B + 1_000_000), ("e1", B + 2_000_000),
         ("e2", B), ("e2", B + 1_000_000)])


def test_deduped_ingest_batch_mode_equivalent(spark):
    """The same helper on a batch frame dedups identically (watermark is
    a no-op in batch execution)."""
    from reductstore_spark.streaming.ingest import deduped_ingest

    df = spark.createDataFrame(mk_rows("e1", 2) + mk_rows("e1", 2), SCHEMA)
    got = sorted((r["entry"], r["ts"])
                 for r in deduped_ingest(df).select("entry", "ts").collect())
    assert got == [("e1", 0), ("e1", 1_000_000)]
    assert deduped_ingest(df).columns == df.columns


def test_deduped_ingest_batch_mode_nested_map_columns(spark):
    """Unorderable types anywhere in a column's type tree (array<map>,
    struct containing a map) must be excluded from the deterministic
    ordering, not just top-level maps — a nested map in the orderBy
    fails at analysis time (ADVICE r3)."""
    from reductstore_spark.streaming.ingest import deduped_ingest

    schema = ("entry string, ts long, v long, am array<map<string,string>>, "
              "sm struct<a: long, m: map<string,string>>")
    df = spark.createDataFrame(
        [("e1", 0, 2, [{"x": "1"}], (1, {"y": "2"})),
         ("e1", 0, 1, [{"x": "9"}], (2, {"y": "9"})),
         ("e1", 1, 5, [], (0, {}))], schema)
    got = deduped_ingest(df)
    rows = sorted((r["entry"], r["ts"], r["v"])
                  for r in got.select("entry", "ts", "v").collect())
    # v is the only orderable non-key column -> deterministic winner v=1
    assert rows == [("e1", 0, 1), ("e1", 1, 5)]
    assert got.columns == df.columns


def test_system_source_replication_excludes_own_diagnostics(spark, tmp_path):
    """PR-1567 parity: replicating the $system bucket must not replicate
    the task's OWN per-batch diagnostics (feedback loop), while other
    $system events replicate normally."""
    from reductstore_spark.sources.syslog import SystemEventLog

    src_root = str(tmp_path / "src")
    dst_root = str(tmp_path / "dst")
    cp = str(tmp_path / "cp")
    src = RecordStore(spark, src_root)
    syslog = SystemEventLog(src, instance="i1")
    B = 1_700_000_000_000_000
    syslog.emit([("lifecycle_run/b1", B, {"status": "ok"})])

    settings = ReplicationSettings(src_bucket="$system", dst_bucket="sysrep")

    def run():
        q = start_replication(spark, src_root, dst_root, settings, cp,
                              available_now=True, syslog=syslog, name="r1")
        q.awaitTermination(120)

    run()   # replicates the lifecycle event; emits its own diagnostic
    run()   # sees the diagnostic as new source data -> must exclude it

    dst_entries = {r["entry"] for r in
                   RecordStore(spark, dst_root).read().select("entry").collect()}
    assert dst_entries == {"lifecycle_run/b1"}
    # the diagnostics DID land in the source $system bucket
    src_entries = {r["entry"] for r in src.read().select("entry").collect()}
    assert "replications/i1/r1" in src_entries


def test_stateful_stream_limit_stays_interrupted_after_restart(spark, tmp_path):
    """$limit's Interrupt latch must survive checkpoint recovery: once a
    stream hit its limit, a restarted run over the same checkpoint emits
    NOTHING for later records (round-2 verdict #9 — the interrupted flag
    is persisted but recovery was never exercised)."""
    root = str(tmp_path / "store")
    cp = str(tmp_path / "cp")
    out = str(tmp_path / "out")
    store = RecordStore(spark, root)
    when = {"$and": [{"$limit": 3}]}

    store.write(spark.createDataFrame(mk_rows("e1", 5), SCHEMA))
    got1 = sorted(drain(spark, stateful_stream(continuous_query(spark, root), when), out, cp))
    assert got1 == [0, 1_000_000, 2_000_000]  # limit hit inside run 1

    # restart over the SAME checkpoint with fresh later records: the
    # recovered state must stay interrupted
    store.write(spark.createDataFrame(mk_rows("e1", 5, base=10_000_000), SCHEMA))
    got2 = sorted(drain(spark, stateful_stream(continuous_query(spark, root), when), out, cp))
    assert got2 == [], got2


def test_spread_python_stage_passes_streaming_frames_through(spark):
    """spread_python_stage must not touch streaming frames (.rdd is
    illegal on them — round-5 advice): the wrapped Arrow-batched
    operators stay streaming-composable, and batch frames still get
    spread to the session parallelism."""
    from reductstore_spark.operators.text import spread_python_stage

    stream = spark.readStream.format("rate").load()
    assert spread_python_stage(stream) is stream  # untouched, no raise

    small = spark.range(10).coalesce(1)
    spread = spread_python_stage(small)
    assert (spread.rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism)


def test_stateful_stream_tws_matches_applyinpandas_path(spark, tmp_path):
    """The transformWithStateInPandas form (Spark 4) must produce exactly
    what the applyInPandasWithState form produces, across micro-batch
    boundaries AND a checkpoint restart, for a condition exercising
    $gate state + the #ctx_before buffer + $limit's Interrupt latch."""
    pytest.importorskip("reductstore_spark.streaming.stateful_tws")
    from reductstore_spark.streaming.stateful_tws import stateful_stream_tws

    when = {"#ctx_before": 1,
            "$and": [{"$gate": ["2500ms", {"&v": {"$lt": 3}}]},
                     {"$limit": 4}]}
    results = {}
    for name, mk in (("apply", stateful_stream), ("tws", stateful_stream_tws)):
        root = str(tmp_path / f"store_{name}")
        cp = str(tmp_path / f"cp_{name}")
        out = str(tmp_path / f"out_{name}")
        store = RecordStore(spark, root)
        store.write(spark.createDataFrame(mk_rows("e1", 5), SCHEMA))
        got1 = sorted(drain(spark, mk(continuous_query(spark, root), when),
                            out, cp))
        # restart over the same checkpoint with later data: recovered
        # state must continue seamlessly in both forms
        store.write(spark.createDataFrame(mk_rows("e1", 5, base=5_000_000),
                                          SCHEMA))
        got2 = sorted(drain(spark, mk(continuous_query(spark, root), when),
                            out, cp))
        results[name] = (got1, got2)
    assert results["tws"] == results["apply"], results
    assert results["apply"][0], "scenario must actually emit rows"
