#!/usr/bin/env python
"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect-to-count).  A
warmup query first absorbs session/JIT startup so numbers reflect steady
state — which is what matters for the 100 TB design point.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    # --out <path>: where to write the full-precision artifact.  Default
    # stays BENCH_LOCAL.json (the committed sf0.1 baseline) — sf1/soak
    # runs must pass --out so they stop clobbering it (the footgun both
    # ROUND9_NOTES and the r9 driver run hit).
    out_path = None
    argv = sys.argv[1:]
    if "--out" in argv:
        out_path = argv[argv.index("--out") + 1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_CPUS", cpus)

    from pyspark.sql import functions as F

    from reductstore_spark.caching import release_caches
    from reductstore_spark.entry_queries import BENCH_EXCLUDE, prep
    from reductstore_spark.entry_queries import QUERIES as ALL_QUERIES
    from reductstore_spark.session import get_session

    # streaming-path entries materialize a store + run a real stream per
    # invocation — they stay in the CORRECTNESS gate (queries()) but are
    # not a throughput measurement
    QUERIES = {n: v for n, v in ALL_QUERIES.items() if n not in BENCH_EXCLUDE}

    spark = get_session("bench", master=f"local[{cpus}]",
                        shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    prep(spark)

    # warmup pass: absorb JVM/JIT/codegen startup so the measured pass
    # reflects steady-state throughput (the 100 TB design point — long
    # scans amortize compilation, local micro-queries don't)
    for name, (fn, _sql) in QUERIES.items():
        df = fn(spark, sf_dir)
        df.agg(F.sum(F.xxhash64(*df.columns))).collect()
        release_caches()
    spark.catalog.clearCache()

    # min-of-2 damps scheduler/GC jitter.  The two trials run as two
    # full INTERLEAVED passes (pass all queries, then pass them again)
    # rather than back-to-back: a transient slow window (GC storm,
    # co-tenant contention) inflates BOTH back-to-back trials of the
    # same query — min can't recover — but hits different queries in
    # temporally distant passes, so the per-query min sheds it.
    trials: dict = {name: [] for name in QUERIES}
    for _pass in range(2):
        for name, (fn, _sql) in QUERIES.items():
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            # force full execution touching every output value, not counts
            df.agg(F.sum(F.xxhash64(*df.columns))).collect()
            trials[name].append(time.perf_counter() - t0)
            release_caches()

    timings = {}
    spreads = {}
    total = 0.0
    for name, ts_list in trials.items():
        best = min(ts_list)
        timings[name] = round(best, 4)
        # per-query trial spread (max/min): the jitter the min damps —
        # readable directly instead of re-attributed every round
        spreads[name] = round(max(ts_list) / best, 3) if best > 0 else 1.0
        total += best

    sf = sf_dir.rstrip("/").split("sf")[-1]
    sorted_spreads = sorted(spreads.values())
    result = {
        "metric": "sum of per-query wall seconds over the SURVEY §2 inventory",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # protocol markers: each timing is min-of-2 after a full warmup
        # pass; spread is the per-query max/min trial ratio
        "min2": True,
        "spread": spreads,
        "spread_med": sorted_spreads[len(sorted_spreads) // 2],
        "spread_max": sorted_spreads[-1],
    }
    # full-precision artifact on disk: the authoritative per-query map,
    # immune to any stdout capture truncation
    here = os.path.dirname(os.path.abspath(__file__))
    out_name = os.path.basename(out_path) if out_path else "BENCH_LOCAL.json"
    with open(out_path or os.path.join(here, "BENCH_LOCAL.json"), "w") as fh:
        json.dump(result, fh, indent=1)

    # The driver keeps only the LAST ~2000 chars of stdout; the previous
    # full-precision single line exceeded that, got its HEAD cut, and
    # parsed as null (BENCH_r04/r05).  So the ONE printed JSON line is a
    # compact variant guaranteed to fit the capture window: 2-decimal
    # timings, no-space separators, and if the query set ever outgrows
    # the budget, the fastest entries are dropped (slowest kept — they
    # carry the signal) with an explicit counter and a pointer to the
    # full file.
    budget = 1900
    compact = dict(result)
    compact["metric"] = "sum per-query wall sec (SURVEY §2)"
    # the full per-query spread map lives in BENCH_LOCAL.json; the
    # printed line keeps the min2 marker + median/max summary only
    del compact["spread"]
    q2 = {k: round(v, 2) for k, v in timings.items()}
    line = json.dumps({**compact, "queries": q2}, separators=(",", ":"))
    if len(line) > budget:
        # degrade precision before dropping entries — 1 decimal still
        # carries the cross-round signal for every query
        q2 = {k: round(v, 1) for k, v in timings.items()}
        line = json.dumps({**compact, "queries": q2},
                          separators=(",", ":"))
    if len(line) > budget:
        by_time = sorted(q2.items(), key=lambda kv: -kv[1])
        kept: dict = {}
        for k, v in by_time:
            trial = json.dumps(
                {**compact, "queries": {**kept, k: v},
                 "queries_omitted": len(q2), "queries_full": out_name},
                separators=(",", ":"))
            if len(trial) > budget:
                break
            kept[k] = v
        line = json.dumps(
            {**compact, "queries": kept,
             "queries_omitted": len(q2) - len(kept),
             "queries_full": out_name}, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
