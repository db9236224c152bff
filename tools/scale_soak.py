"""Heavy-family scaling soak: time the dedup/fingerprint/ANN operators at
several scale factors and fit a per-operator scaling exponent.

Round-4 verdict task #5: turn "no super-linear operator" into a measured
curve.  For each operator, fit  time ~ a * data^b  across the given SF
dirs (log-log least squares on the SF ratios); report b.  b <= ~1.2 is
linear-ish (constant overheads make small-SF points sub-linear); anything
above ~1.3 needs a named fix.

Usage:
    python tools/scale_soak.py out.json sf_label=sf_dir [sf_label=sf_dir ...]
e.g.
    python tools/scale_soak.py SOAK_r5.json \
        0.1=/root/testdata/sf0.1 1=_scale/sf1 3=_scale/sf3
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = [
    "dedup_exact", "dedup_minhash", "dedup_simhash", "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_embedding", "dedup_components", "dedup_keep_best",
    "winnow_fingerprint", "winnow_overlap", "minhash_accuracy",
    "ann_lsh", "ann_ivf", "join_salted",
]


def main() -> None:
    global HEAVY
    out_path = sys.argv[1]
    sfs = []  # (sf_float, dir)
    for arg in sys.argv[2:]:
        if arg.startswith("--ops="):
            HEAVY = arg[len("--ops="):].split(",")
            continue
        label, d = arg.split("=", 1)
        sfs.append((float(label), d))
    sfs.sort()

    from pyspark.sql import functions as F

    from reductstore_spark.caching import release_caches
    from reductstore_spark.entry_queries import QUERIES, prep
    from reductstore_spark.session import get_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session("scale-soak", master=f"local[{cpus}]",
                        shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    prep(spark)

    results: dict = {"timings": {}, "exponents": {}, "sfs": [s for s, _ in sfs]}
    for sf, d in sfs:
        for name in HEAVY:
            fn, _sql = QUERIES[name]
            # warmup once (codegen/JIT), then min-of-2 timed
            df = fn(spark, d)
            df.agg(F.sum(F.xxhash64(*df.columns))).collect()
            release_caches()
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                df = fn(spark, d)
                df.agg(F.sum(F.xxhash64(*df.columns))).collect()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                release_caches()
            spark.catalog.clearCache()
            results["timings"].setdefault(name, {})[str(sf)] = round(best, 4)
            print(f"sf{sf} {name}: {best:.2f}s", flush=True)

    # log-log least-squares slope per operator
    for name in HEAVY:
        pts = [(math.log(sf), math.log(results["timings"][name][str(sf)]))
               for sf, _ in sfs]
        n = len(pts)
        mx = sum(x for x, _ in pts) / n
        my = sum(y for _, y in pts) / n
        num = sum((x - mx) * (y - my) for x, y in pts)
        den = sum((x - mx) ** 2 for x, _ in pts)
        results["exponents"][name] = round(num / den, 3) if den else None

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results["exponents"], indent=2))


if __name__ == "__main__":
    main()
