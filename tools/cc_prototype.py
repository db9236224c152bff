#!/usr/bin/env python
"""Connected-components strategy bake-off (r11, VERDICT task 1).

Isolates the CC iteration from candidate generation: the simhash banded
edge set of each corpus is materialized (eager localCheckpoint) once per
SF, then each variant runs over the SAME edge table.  Reports wall
seconds (min of N trials), label rounds, and Spark job count per
variant, and verifies every variant's fixpoint is IDENTICAL to the
library implementation's output.

Variants:
  lib          — reductstore_spark.operators.dedup.connected_components
                 (whatever the tree currently implements)
  r10          — the round-10 shape: groupBy+left-join step, lazy
                 checkpointed edges, path-halving pointer jump
  union        — r10 with the step folded into one union-aggregate
  union_cache  — union + edges repartitioned by the join key and cached
                 (InMemoryRelation keeps hashpartitioning -> no per-round
                 edge shuffle)
  stars        — alternating large-star / small-star contraction
                 (Kiveris et al., "Connected Components in MapReduce and
                 Beyond"): edge set re-keyed per round, converges when
                 the graph is a star forest

Usage:
  python tools/cc_prototype.py out.json sf_label=sf_dir [...] \
      [--trials N] [--cpus N]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _lblsum(df):
    return df.agg(F.sum(F.col("lbl").cast("decimal(38,0)"))).collect()[0][0]


def _seed(edges):
    return (edges.groupBy("src").agg(F.min("dst").alias("__mn"))
            .select(F.col("src").alias("id"),
                    F.least("src", "__mn").alias("lbl"))
            ).localCheckpoint(eager=False)


def cc_r10(edges_in: DataFrame, max_iter: int = 25):
    """Round-10 library shape (groupBy + left join + pointer jump)."""
    from reductstore_spark.caching import release_local_checkpoint
    edges = edges_in.localCheckpoint(eager=False)
    labels = _seed(edges)
    prev = _lblsum(labels)
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        nbr = (edges.join(labels.select(F.col("id").alias("dst"), "lbl"),
                          "dst")
               .groupBy("src").agg(F.min("lbl").alias("nlbl"))
               .withColumnRenamed("src", "id"))
        stepped = (labels.join(nbr, "id", "left")
                   .select("id", F.least(
                       "lbl", F.coalesce("nlbl", "lbl")).alias("lbl")))
        jumped = (stepped.alias("n")
                  .join(stepped.select(F.col("id").alias("lbl"),
                                       F.col("lbl").alias("plbl")).alias("p"),
                        "lbl", "left")
                  .select("id", F.coalesce("plbl", "lbl").alias("lbl"))
                  ).localCheckpoint(eager=False)
        superseded = labels
        labels = jumped
        cur = _lblsum(labels)
        release_local_checkpoint(superseded)
        if cur == prev:
            break
        prev = cur
    release_local_checkpoint(edges)
    out = labels.select("id", F.col("lbl").alias("component"))
    return out, rounds, labels


def cc_union(edges_in: DataFrame, max_iter: int = 25, cache_edges=False):
    """Union-aggregate step; optionally cache edges partitioned by dst."""
    from reductstore_spark.caching import release_local_checkpoint
    if cache_edges:
        edges = edges_in.repartition("dst").persist()
    else:
        edges = edges_in.localCheckpoint(eager=False)
    labels = _seed(edges)
    prev = _lblsum(labels)
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        nbr = (edges.join(labels.select(F.col("id").alias("dst"), "lbl"),
                          "dst")
               .select(F.col("src").alias("id"), F.col("lbl").alias("lbl")))
        # alias-project BOTH union branches to FRESH exprIds: the
        # branches otherwise share labels' attribute ids (nbr derives
        # from labels too) and Union.rewriteConstraints crashes with
        # "key not found: id#..." when the plan is checkpointed
        relabeled = labels.select(F.col("id").alias("id"),
                                  F.col("lbl").alias("lbl"))
        stepped = (nbr.union(relabeled)
                   .groupBy("id").agg(F.min("lbl").alias("lbl")))
        jumped = (stepped.alias("n")
                  .join(stepped.select(F.col("id").alias("lbl"),
                                       F.col("lbl").alias("plbl")).alias("p"),
                        "lbl", "left")
                  .select("id", F.coalesce("plbl", "lbl").alias("lbl"))
                  ).localCheckpoint(eager=False)
        superseded = labels
        labels = jumped
        cur = _lblsum(labels)
        release_local_checkpoint(superseded)
        if cur == prev:
            break
        prev = cur
    if cache_edges:
        edges.unpersist(blocking=False)
    else:
        release_local_checkpoint(edges)
    out = labels.select("id", F.col("lbl").alias("component"))
    return out, rounds, labels


def cc_stars(edges_in: DataFrame, max_iter: int = 50):
    """Alternating large-star / small-star contraction.

    State: a symmetric-free edge multiset as (u, v) rows (u != v).
    large-star: per u over N(u) ∪ {u}: emit (v, m) for v in N(u), v > u.
    small-star: per u: emit (v, m) for v in N(u) ∪ {u}, v <= u, v != m.
    Converged when the edge set stops changing (checked via a
    sum-of-hashes fingerprint, one aggregate per half-round).  The final
    edge set is a star forest rooted at component minima; labels follow
    directly, with isolated seeds handled by a left join."""
    from reductstore_spark.caching import release_local_checkpoint
    edges0 = edges_in.localCheckpoint(eager=False)

    def fingerprint(e):
        return e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h")
        ).collect()[0]

    cur = edges0
    prev_fp = None
    rounds = 0
    for i in range(max_iter):
        rounds += 1
        large = (i % 2 == 0)
        # symmetrize: every node sees its full neighborhood
        sym = cur.union(cur.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
        grp = sym.groupBy("src").agg(
            F.min(F.least("src", F.col("dst"))).alias("m"),
            F.collect_set("dst").alias("nbrs"))
        if large:
            out = (grp.select("src", "m", F.explode("nbrs").alias("v"))
                   .where(F.col("v") > F.col("src"))
                   .select(F.col("v").alias("src"), F.col("m").alias("dst")))
        else:
            out = (grp.select("src", "m",
                              F.explode(F.array_union(
                                  "nbrs", F.array("src"))).alias("v"))
                   .where((F.col("v") <= F.col("src"))
                          & (F.col("v") != F.col("m")))
                   .select(F.col("v").alias("src"), F.col("m").alias("dst")))
        out = (out.where(F.col("src") != F.col("dst")).dropDuplicates()
               .localCheckpoint(eager=False))
        fp = fingerprint(out)
        superseded = cur
        cur = out
        if superseded is not edges0:
            release_local_checkpoint(superseded)
        if prev_fp is not None and not large and tuple(fp) == tuple(prev_fp):
            break
        prev_fp = fp
    # star forest: dst is the component root for every src; roots and
    # isolated nodes label themselves
    nodes = (edges0.select(F.col("src").alias("id"))
             .union(edges0.select(F.col("dst").alias("id"))).distinct())
    lbl = cur.select(F.col("src").alias("id"), F.col("dst").alias("lbl"))
    labels = (nodes.join(lbl.groupBy("id").agg(F.min("lbl").alias("lbl")),
                         "id", "left")
              .select("id", F.coalesce("lbl", "id").alias("lbl"))
              ).localCheckpoint(eager=False)
    _lblsum(labels)
    release_local_checkpoint(edges0)
    release_local_checkpoint(cur)
    out = labels.select("id", F.col("lbl").alias("component"))
    return out, rounds, labels


def main() -> None:
    argv = sys.argv[1:]
    out_path = argv[0]
    trials = 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sfs = []
    i = 1
    while i < len(argv):
        a = argv[i]
        if a == "--trials":
            trials = int(argv[i + 1]); i += 2; continue
        if a == "--cpus":
            cpus = argv[i + 1]; i += 2; continue
        label, d = a.split("=", 1)
        sfs.append((label, d)); i += 1

    from reductstore_spark.caching import release_caches, release_local_checkpoint
    from reductstore_spark.operators.dedup import (
        connected_components,
        simhash64_table,
        _banded_pairs_from_sig,
    )
    from reductstore_spark.session import get_session

    spark = get_session("cc_proto", master=f"local[{cpus}]",
                        shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    results = {}
    for label, d in sfs:
        docs = spark.read.parquet(f"{d}/documents.parquet")
        # the simhash components operator's edge set (post hamming-0
        # contraction), materialized so every variant starts from the
        # same stored table
        from pyspark.sql import Window
        sig = simhash64_table(docs, "doc_id", "text")
        mapping = sig.select(
            F.col("doc_id").alias("id"), "sim_hi", "sim_lo",
            F.min("doc_id").over(
                Window.partitionBy("sim_hi", "sim_lo")).alias("rep"))
        reps = mapping.where(F.col("id") == F.col("rep")).select(
            "id", "sim_hi", "sim_lo")
        pairs = (_banded_pairs_from_sig(reps, "id", 3)
                 .select("id_a", "id_b").dropDuplicates()
                 .localCheckpoint())  # eager: variants all read blocks
        e = pairs.select(F.col("id_a").alias("src"),
                         F.col("id_b").alias("dst"))
        sym = e.union(e.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
        edges = sym.localCheckpoint()
        n_edges = edges.count()
        release_caches()

        # union/union_cache dropped from the matrix: the union-fold step
        # (nbr ∪ labels -> groupBy min) trips a Union.rewriteConstraints
        # "key not found" Catalyst bug when the round result is lazily
        # localCheckpoint'ed on real graphs (reproduced at sf0.1 even
        # with fresh exprIds on both branches), and the completed
        # attempt-1 measurements already showed the cached-edge union
        # shape ~2x SLOWER than r10 at sf0.1 (5.3-5.5 s vs 2.4-3.0 s)
        variants = {
            "lib": lambda: (lambda o: (o, None, o))(
                connected_components(pairs)),
            "r10": lambda: cc_r10(edges),
            "stars": lambda: cc_stars(edges),
        }
        # reference fixpoint from the library implementation
        ref_out = connected_components(pairs)
        ref = {r["id"]: r["component"] for r in ref_out.collect()}
        release_caches()

        per = {"n_edges": n_edges}
        for name, fn in variants.items():
            walls, rounds_seen, jobs_seen = [], None, None
            ok = True
            for t in range(trials):
                release_caches()
                j0 = sc._jsc.sc().dagScheduler().nextJobId()
                t0 = time.perf_counter()
                out, rounds, labels_df = fn()
                got = {r["id"]: r["component"] for r in out.collect()}
                wall = time.perf_counter() - t0
                j1 = sc._jsc.sc().dagScheduler().nextJobId()
                walls.append(wall)
                rounds_seen = rounds
                jobs_seen = j1 - j0
                if got != ref:
                    ok = False
                release_caches()
            per[name] = {"wall_min": round(min(walls), 3),
                         "walls": [round(w, 3) for w in walls],
                         "rounds": rounds_seen, "jobs": jobs_seen,
                         "fixpoint_identical": ok}
            print(json.dumps({"sf": label, "variant": name, **per[name]}))
        release_local_checkpoint(edges)
        results[label] = per
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
