"""Similarity search over embedding columns.

* ``cosine`` — exact kernel on array<float> columns (JVM-side
  F.zip_with/F.aggregate, no UDF).
* brute-force top-k: the exactness baseline (one pass + a top-k sort).
* ``lsh_bucket`` — random-hyperplane LSH for the 100 TB path: the
  corpus is bucketed by sign pattern once (embarrassingly parallel);
  a query probes only its bucket.  Hyperplanes use small deterministic
  integer coefficients ((p*31 + d*17) mod 13 - 6) so any engine
  reproduces the exact same buckets (DuckDB oracle included).
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def cosine_pd(a: Column, b: Column) -> Column:
    """Arrow-vectorized cosine for PAIR-heavy plans.

    The Column `cosine` kernel runs its higher-order lambdas interpreted
    per element — fine when cosines number ~rows (top-k, ANN probes),
    but a bucketed near-dup join computes O(sum bucket^2) cosines and
    the per-element interpretation dominated the sf1 soak (dedup
    embedding 95 s; numpy batches the same dot products in
    milliseconds).  Same float64 math, same rounding behavior, same null
    semantics as the Column kernel: a NULL embedding or a zero-norm
    vector yields NULL (the Column path's non-ANSI 0/0 division), while
    NaN/Inf vector COMPONENTS yield NaN, exactly as the JVM division
    does.  Precondition: non-null vectors in one batch share a fixed
    length (embedding tables are fixed-dim; ragged batches are the one
    divergence left undefined)."""
    return _cosine_pd_udf()(a, b)


def _cosine_pd_udf():
    import pandas as pd  # noqa: F401 — needed for the udf type hints
    from pyspark.sql.functions import pandas_udf

    def _cos(xs, ys):
        import numpy as np
        import pandas as pd
        if len(xs) == 0:
            return pd.Series([], dtype="float64")
        bad = xs.isna().to_numpy() | ys.isna().to_numpy()
        if bad.any():
            probe = next(v for v, m in zip(xs, bad) if not m) \
                if not bad.all() else []
            zero = [0.0] * len(probe)
            xs = xs.where(~bad, other=None).map(
                lambda v: zero if v is None else v)
            ys = ys.where(~bad, other=None).map(
                lambda v: zero if v is None else v)
        ax = np.asarray(xs.tolist(), dtype=np.float64)
        ay = np.asarray(ys.tolist(), dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            num = (ax * ay).sum(axis=1)
            den = np.linalg.norm(ax, axis=1) * np.linalg.norm(ay, axis=1)
            out = num / den
        # NULL only for null-input / zero-norm positions (the Column
        # path's non-ANSI 0/0); a genuinely computed NaN (NaN/Inf vector
        # components) stays NaN, as the JVM kernel returns it — a masked
        # FloatingArray keeps NaN in the value buffer where the mask is
        # clear, unlike astype("Float64") which folds NaN into NA
        mask = np.asarray(bad | (den == 0), dtype=bool)
        return pd.Series(
            pd.arrays.FloatingArray(np.asarray(out, dtype=np.float64), mask))

    _cos.__annotations__ = {"xs": pd.Series, "ys": pd.Series,
                            "return": pd.Series}
    return pandas_udf(_cos, "double")


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def plane_coeffs(num_planes: int, dim: int) -> List[List[int]]:
    """Deterministic pseudo-random hyperplanes with integer coefficients."""
    return [[(p * 31 + d * 17) % 13 - 6 for d in range(dim)]
            for p in range(num_planes)]


def _dot_plane_sql(vec_col: str, coeffs: Sequence[float]) -> str:
    """SQL text of dot(`vec_col`, literal plane) — the same
    aggregate/zip_with fold :func:`dot` builds as Columns."""
    arr = ", ".join(f"CAST({float(c)!r} AS DOUBLE)" for c in coeffs)
    return (f"aggregate(zip_with(`{vec_col}`, array({arr}), "
            "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")


def lsh_bucket(vec, planes: Sequence[Sequence[int]]) -> Column:
    """Sign-pattern bucket id: bit p set iff dot(vec, plane_p) >= 0.

    ``vec`` may be a column NAME (preferred: the whole expression is
    built as one SQL string — a planes x dim literal table costs ~500
    py4j round-trips per invocation in Column form, one here; same
    resolved plan) or a Column (compat path, identical semantics)."""
    if isinstance(vec, str):
        bits = " + ".join(
            f"(CASE WHEN {_dot_plane_sql(vec, coeffs)} >= 0"
            f" THEN {2 ** p} ELSE 0 END)"
            for p, coeffs in enumerate(planes))
        return F.expr(f"CAST({bits} AS BIGINT)")
    bits = []
    for p, coeffs in enumerate(planes):
        plane = F.array(*[F.lit(float(c)) for c in coeffs])
        d = dot(vec, plane)
        bits.append(F.when(d >= 0, F.lit(2 ** p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def sq_dist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0), lambda acc, x: acc + x)


def _sq_dist_sql(vec_col: str, coeffs: Sequence[float]) -> str:
    """SQL text of sq_dist(`vec_col`, literal centroid)."""
    arr = ", ".join(f"CAST({float(x)!r} AS DOUBLE)" for x in coeffs)
    return (f"aggregate(zip_with(`{vec_col}`, array({arr}), "
            "(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
            " * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
            "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")


def assign_centroids(df: DataFrame, centroids: Sequence[Sequence[float]],
                     vec_col: str = "embedding") -> DataFrame:
    """Nearest-centroid assignment (ties -> lowest cid): adds ``cid``.

    The centroid table is a broadcast literal — k x dim doubles — so
    assignment is one embarrassingly parallel pass, no shuffle; the
    argmin folds as ``array_min`` over (dist, cid) structs (struct
    ordering = dist then cid, giving the deterministic tie-break).
    Built as ONE SQL expression string: the k x dim literal table costs
    ~k*dim py4j round-trips in Column form, one call here (same
    resolved plan)."""
    pairs = ", ".join(
        f"named_struct('d', {_sq_dist_sql(vec_col, c)}, 'i', {i})"
        for i, c in enumerate(centroids))
    return df.withColumn("cid", F.expr(f"array_min(array({pairs})).i"))


def kmeans_refine(df: DataFrame, centroids: Sequence[Sequence[float]],
                  iters: int = 2, vec_col: str = "embedding"
                  ) -> List[List[float]]:
    """Lloyd iterations over a vector corpus: assign (broadcast
    centroids, no shuffle) then recompute means (posexplode ->
    one hash aggregate on (cid, pos) with map-side combine; k x dim
    result rows collect to the driver — centroids are model state, tiny
    by construction).  Empty clusters keep their previous centroid.

    This is the IVF training path: refined centroids tighten the cells
    so fewer probes reach the same recall.  Deterministic given the
    initial centroids — no RNG."""
    cents = [list(map(float, c)) for c in centroids]
    dim = len(cents[0])
    for _ in range(iters):
        assigned = assign_centroids(df, cents, vec_col)
        rows = (assigned
                .select("cid", F.posexplode(F.col(vec_col))
                        .alias("pos", "x"))
                .groupBy("cid", "pos")
                .agg(F.avg(F.col("x").cast("double")).alias("m"))
                .collect())
        new = [list(c) for c in cents]
        for r in rows:
            new[r["cid"]][r["pos"]] = r["m"]
        cents = new
    return cents


def inertia(df: DataFrame, centroids: Sequence[Sequence[float]],
            vec_col: str = "embedding") -> float:
    """Sum of squared distances to the assigned centroid (the k-means
    objective) — one pass, used to verify refinement monotonicity."""
    assigned = assign_centroids(df, centroids, vec_col)
    pairs = ", ".join(
        f"named_struct('d', {_sq_dist_sql(vec_col, c)}, 'i', {i})"
        for i, c in enumerate(centroids))
    return assigned.select(
        F.expr(f"sum(array_min(array({pairs})).d) AS j")).collect()[0]["j"]


def brute_force_topk(df: DataFrame, query_vec_df: DataFrame, k: int,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k of df rows against a single query vector
    (query_vec_df: one row with column ``qv``)."""
    from .topk import global_top_k

    joined = df.crossJoin(F.broadcast(query_vec_df))
    scored = joined.select(
        id_col, F.round(cosine(F.col(vec_col), F.col("qv")), 6).alias("cosine"))
    return global_top_k(scored, k, [F.col("cosine").desc(), F.col(id_col)])
