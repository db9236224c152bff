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


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def plane_coeffs(num_planes: int, dim: int) -> List[List[int]]:
    """Deterministic pseudo-random hyperplanes with integer coefficients."""
    return [[(p * 31 + d * 17) % 13 - 6 for d in range(dim)]
            for p in range(num_planes)]


def lsh_bucket(vec: Column, planes: Sequence[Sequence[int]]) -> Column:
    """Sign-pattern bucket id: bit p set iff dot(vec, plane_p) >= 0."""
    bits = []
    for p, coeffs in enumerate(planes):
        plane = F.array(*[F.lit(float(c)) for c in coeffs])
        d = dot(vec, plane)
        bits.append(F.when(d >= 0, F.lit(2 ** p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def brute_force_topk(df: DataFrame, query_vec_df: DataFrame, k: int,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k of df rows against a single query vector
    (query_vec_df: one row with column ``qv``)."""
    from .topk import global_top_k

    joined = df.crossJoin(F.broadcast(query_vec_df))
    scored = joined.select(
        id_col, F.round(cosine(F.col(vec_col), F.col("qv")), 6).alias("cosine"))
    return global_top_k(scored, k, [F.col("cosine").desc(), F.col(id_col)])
