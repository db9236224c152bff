"""Deduplication operators for large-scale document corpora.

All operators are pure DataFrame transformations built on deterministic,
engine-portable primitives (md5 over strings) so results are exactly
reproducible by any engine — the DuckDB oracles in entry_queries mirror
these formulas term-for-term.

Scale design (100 TB): everything is shuffle-bounded by the LSH band
join — no all-pairs comparison ever materializes.  Candidate generation
is `explode(bands) -> groupBy(band)` (equi-join on band hash), and
verification touches only candidate pairs.  Skewed bands (e.g. boiler-
plate text) are handled by AQE skew-join splitting; exact dedup is a
single hash aggregation with map-side combine.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..caching import persist_tracked


def normalized_words(text: Column) -> Column:
    """lower + whitespace-collapse + split — the canonical token stream."""
    return F.split(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "), " ")


def word_shingles(text: Column, k: int) -> Column:
    """Distinct word k-gram shingles of a text column."""
    words = normalized_words(text)
    if k == 1:
        return F.array_distinct(words)
    n = F.size(words)
    idx = F.sequence(F.lit(1), n - (k - 1))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, k)))
    return F.when(n >= k, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>"))


def exploded_shingles(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, shingle) rows, distinct per doc — built with posexplode +
    window lead() so every expression stays in whole-stage codegen (the
    array-HOF construction evaluates interpreted, ~10x slower at scale)."""
    from pyspark.sql import Window

    words = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(normalized_words(F.col(text_col))).alias("pos", "w"))
    if k == 1:
        return words.select("id", F.col("w").alias("s")).distinct()
    w = Window.partitionBy("id").orderBy("pos")
    parts = [F.col("w")] + [F.lead("w", i).over(w) for i in range(1, k)]
    grams = words.select(
        "id", F.concat_ws(" ", *parts).alias("s"),
        F.lead("w", k - 1).over(w).alias("__last"))
    return grams.where(F.col("__last").isNotNull()).select("id", "s").distinct()


def minhash_signature(shingles: Column, num_hashes: int) -> Column:
    """MinHash signature: per hash i, the minimum md5 of ('i|' + shingle).

    md5-as-hash keeps the signature engine-portable (identical in any
    SQL engine) and uniformly distributed; the classic (a*x+b) mod p
    family would need a shared bigint hash of the shingle first."""
    def hasher(i: int):
        # NB: single-parameter lambdas only — F.transform feeds an index
        # argument to two-parameter callables
        return lambda s: F.md5(F.concat(F.lit(f"{i}|"), s))

    sigs = [F.array_min(F.transform(shingles, hasher(i)))
            for i in range(num_hashes)]
    return F.array(*sigs)


def lsh_bands(signature: Column, num_bands: int, rows_per_band: int) -> Column:
    """Band hashes: md5 of the concatenated signature slice per band."""
    bands = []
    for b in range(num_bands):
        parts = [signature.getItem(b * rows_per_band + r) for r in range(rows_per_band)]
        bands.append(F.md5(F.concat(*parts)))
    return F.array(*bands)


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter.cast("double") / union


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 1,
    num_hashes: int = 8,
    num_bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding, verified with true
    Jaccard over the shingle sets.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    """
    rows = num_hashes // num_bands
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text"))

    # signature computation in exploded form: per (doc, shingle) row the 8
    # md5s are FLAT codegen'd expressions; groupBy(id).min folds them with
    # map-side combine.  (Array-HOF form evaluates interpreted: ~10x slower.)
    exploded = exploded_shingles(base, "id", "__text", shingle_k)
    hashed = exploded.select(
        "id", *[F.md5(F.concat(F.lit(f"{i}|"), F.col("s"))).alias(f"h{i}")
                for i in range(num_hashes)])
    sig = hashed.groupBy("id").agg(
        *[F.min(f"h{i}").alias(f"sig{i}") for i in range(num_hashes)])

    band_cols = []
    for b in range(num_bands):
        parts = [F.col(f"sig{b * rows + r}") for r in range(rows)]
        band_cols.append(F.md5(F.concat(*parts)))
    # candidate generation shuffles ONLY (id, band) — never the shingle
    # arrays; a hot band (boilerplate cluster) would otherwise square the
    # array payload through the join
    banded = sig.select(
        "id", F.posexplode(F.array(*band_cols)).alias("band_idx", "band_hash"))
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.band_hash") == F.col("b.band_hash"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # the candidate set is tiny and referenced three times below (two id
    # branches + verification) — persist so the signature pipeline runs
    # once; tracked so session owners can release it after materializing
    cand = persist_tracked(cand)
    cand_ids = cand.select(F.col("id_a").alias("id")).union(
        cand.select(F.col("id_b").alias("id"))).distinct()
    shingle_sets = (
        base.join(cand_ids, "id", "left_semi")
        .select("id", word_shingles(F.col("__text"), shingle_k).alias("sh"))
    )
    verified = (
        cand
        .join(shingle_sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(shingle_sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn("jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6))
    )
    return (verified.where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def simhash32(text: Column) -> Column:
    """32-bit SimHash over unigram tokens.

    Per token: h = first 8 hex chars of md5 (a 32-bit int); bit b of the
    result is 1 iff sum over tokens of (2*bit_b(h) - 1) > 0.  Portable:
    only md5 + integer arithmetic."""
    words = F.array_distinct(normalized_words(text))
    hashes = F.transform(
        words, lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long"))

    # single pass: fold all 32 bit-votes at once — per-bit aggregates
    # would re-evaluate the md5 hash array 32 times
    def step(acc, h):
        bit_votes = F.transform(
            F.sequence(F.lit(0), F.lit(31)),
            lambda b: (F.floor(h / F.pow(F.lit(2.0), b.cast("double"))).cast("long") % 2) * 2 - 1,
        )
        return F.zip_with(acc, bit_votes, lambda a, v: a + v)

    votes = F.aggregate(
        hashes, F.array_repeat(F.lit(0).cast("long"), 32), step)
    return F.aggregate(
        F.zip_with(votes, F.sequence(F.lit(0), F.lit(31)),
                   lambda v, b: F.when(v > 0, F.pow(F.lit(2.0), b.cast("double"))
                                       .cast("long")).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def exact_dedup_keep_first(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: keep the lowest-id row per identical content."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))
