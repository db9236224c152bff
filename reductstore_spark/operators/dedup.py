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
    """Distinct word k-gram shingles of a text column.

    The word array is let-bound via a single-element ``transform`` so the
    inner gram lambda references a variable instead of re-evaluating the
    split per element (which would be O(n^2) interpreted).  Still a HOF
    (no whole-stage codegen) — prefer ``shingle_arrays`` in hot paths."""
    if k == 1:
        return F.array_distinct(normalized_words(text))

    def with_words(words: Column) -> Column:
        n = F.size(words)
        idx = F.sequence(F.lit(1), n - (k - 1))
        grams = F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(words, i, k)))
        return F.when(n >= k, F.array_distinct(grams)).otherwise(
            F.array().cast("array<string>"))

    return F.transform(F.array(normalized_words(text)), with_words).getItem(0)


def exploded_shingles(df: DataFrame, id_col: str, text_col: str, k: int,
                      distinct: bool = True) -> DataFrame:
    """(id, shingle) rows, distinct per doc — built with posexplode +
    window lead() so every expression stays in whole-stage codegen (the
    array-HOF construction evaluates interpreted, ~10x slower at scale).

    ``distinct=False`` skips the per-doc dedup aggregation and emits one
    row per shingle OCCURRENCE — for consumers whose downstream
    aggregation is multiset-insensitive (``min`` per hash,
    ``collect_set``), where the dedup pass is a pure extra aggregation
    over the widest intermediate (guide §2.4: remove redundant
    aggregations; min over a multiset equals min over its set)."""
    from pyspark.sql import Window

    words = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(normalized_words(F.col(text_col))).alias("pos", "w"))
    if k == 1:
        out = words.select("id", F.col("w").alias("s"))
        return out.distinct() if distinct else out
    w = Window.partitionBy("id").orderBy("pos")
    parts = [F.col("w")] + [F.lead("w", i).over(w) for i in range(1, k)]
    grams = words.select(
        "id", F.concat_ws(" ", *parts).alias("s"),
        F.lead("w", k - 1).over(w).alias("__last"))
    out = grams.where(F.col("__last").isNotNull()).select("id", "s")
    return out.distinct() if distinct else out


def shingle_arrays(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, sh: array<string>) distinct shingle sets via the codegen path:
    exploded shingles folded back with collect_set (which dedups, so the
    explode side skips its own distinct aggregation — one aggregation
    over the gram stream instead of two).  ~4x faster than the HOF array
    construction at sf0.1 (whole-stage codegen end to end).  Docs with
    fewer than k words yield NO row — join with the doc table and
    coalesce to empty if completeness matters."""
    return (exploded_shingles(df, id_col, text_col, k, distinct=False)
            .groupBy("id").agg(F.collect_set("s").alias("sh")))


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
    """Jaccard of two DISTINCT-element arrays: |a ∩ b| / (|a|+|b|-|a ∩ b|).

    The union size is derived arithmetically instead of materializing
    ``array_union`` — half the hash-set work per pair; whole-stage codegen
    CSE evaluates the shared ``array_intersect`` once.  Inputs must be
    sets (``array_distinct``/``collect_set`` output), as all callers are."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    return inter / (F.size(a) + F.size(b) - inter)


def hashed_shingles(sh: Column) -> Column:
    """60-bit md5-prefix hash of each shingle, as array<long>.

    Pair verification intersects these instead of raw strings (~3x
    faster — long equality vs UTF8 hashing per element).  The hex->int
    parse is bijective, so a SQL oracle intersecting the same 15-char
    ``md5(s)`` prefixes as STRINGS sees exactly the same set sizes and
    jaccard values, collisions included; disagreement with true string
    jaccard needs an md5-prefix collision inside one document pair
    (~2^-60 x pairs — negligible, and standard at corpus scale)."""
    return F.transform(
        sh, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10)
        .cast("long"))


def hashed_shingle_sets(df: DataFrame, id_col: str, text_col: str,
                        k: int) -> DataFrame:
    """(id, sh: array<long>) — the 60-bit-hashed shingle sets
    ``shingle_arrays`` + :func:`hashed_shingles` produce, computed the
    cheap way: the md5 prefix is hashed per exploded (id, gram) row
    INSIDE whole-stage codegen and ``collect_set`` folds the longs, so
    no interpreted per-element ``transform`` runs over the collected
    arrays and the aggregation payload is 8-byte longs instead of gram
    strings.  Identical output up to a 15-hex-char md5-prefix collision
    inside one document (~2^-60 per pair — the same negligible-collision
    contract ``hashed_shingles`` documents; ``array_intersect``
    consumers dedup either way).  Docs with fewer than k words yield NO
    row, exactly like ``shingle_arrays``."""
    return (exploded_shingles(df, id_col, text_col, k, distinct=False)
            .selectExpr("id", "CAST(conv(substring(md5(s), 1, 15), 16, 10)"
                              " AS BIGINT) AS h")
            .groupBy("id").agg(F.collect_set("h").alias("sh")))


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
    # distinct=False: min per hash over the occurrence multiset equals min
    # over the distinct set, so the per-doc dedup aggregation is dropped.
    exploded = exploded_shingles(base, "id", "__text", shingle_k,
                                 distinct=False)
    # selectExpr strings instead of nested Column objects: the 8 hash +
    # 8 min + 4 band expressions cost ~100 py4j round-trips in Column
    # form, one listed call here (same resolved plan)
    hashed = exploded.selectExpr(
        "id", *[f"md5(concat('{i}|', s)) AS h{i}" for i in range(num_hashes)])
    # persist: the band self-join below references the signature pipeline
    # on BOTH sides and Spark reuses nothing across self-join branches —
    # without this the full tokenize+window+hash tree executed twice
    # (r10 plan audit).  The cached frame is (id, 8 hex strings) per doc.
    sig = persist_tracked(hashed.groupBy("id").agg(
        *[F.expr(f"min(h{i}) AS sig{i}") for i in range(num_hashes)]))

    band_sql = ", ".join(
        "md5(concat({}))".format(
            ", ".join(f"sig{b * rows + r}" for r in range(rows)))
        for b in range(num_bands))
    # candidate generation shuffles ONLY (id, band) — never the shingle
    # arrays; a hot band (boilerplate cluster) would otherwise square the
    # array payload through the join
    banded = sig.selectExpr(
        "id", f"posexplode(array({band_sql})) AS (band_idx, band_hash)")
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
    shingle_sets = hashed_shingle_sets(
        base.join(cand_ids, "id", "left_semi"), "id", "__text", shingle_k)
    verified = (
        cand
        .join(shingle_sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(shingle_sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn("jaccard", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6))
    )
    return (verified.where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def simhash32(text: Column) -> Column:
    """32-bit SimHash over unigram tokens — Column (HOF) form.

    Per token: h = first 8 hex chars of md5 (a 32-bit int); bit b of the
    result is 1 iff sum over tokens of (2*bit_b(h) - 1) > 0.  Portable:
    only md5 + integer arithmetic.

    The nested ``aggregate``/``transform``/``zip_with`` fold evaluates
    *interpreted* (per element, per bit — no whole-stage codegen); keep
    this form for single-row/embedded use and prefer
    :func:`simhash32_table` in any table-scale path (~10x faster)."""
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


def simhash32_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "simhash",
) -> DataFrame:
    """32-bit SimHash per row — exploded whole-stage-codegen form.

    Same formula as :func:`simhash32` (bit b of the result is 1 iff the
    sum over distinct tokens of ``2*bit_b(md5_32(token)) - 1`` is
    positive), evaluated as flat columns: distinct tokens are exploded,
    one 32-bit md5 prefix is computed per (doc, token) row, the 32
    bit-votes are plain shift/mask integer expressions over it (all
    whole-stage codegen), and ``groupBy(id).sum`` folds them with
    map-side combine.  Mirrors the r2 exploded rewrite of
    ``minhash_lsh_pairs`` — the HOF fold it replaces evaluated
    interpreted, per element per bit, ~10x slower at corpus scale.

    The one shuffle carries (id, 32 small ints) — never the token
    strings.  Null text is coalesced to the empty string, so every
    input id survives with the (deterministic) empty-text signature —
    matching the HOF Column form, which never drops rows.

    Returns a DataFrame with columns (``id_col``, ``out_col``).
    """
    return _simhash_halves_table(df, id_col, text_col, [(1, out_col)])


def simhash64_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hi_col: str = "sim_hi",
    lo_col: str = "sim_lo",
) -> DataFrame:
    """64-bit SimHash per row, as two 32-bit halves (hi from md5 hex
    chars 1-8, lo from 9-16) — the width the Manku/Jain/Sarma simhash
    dedup design assumes (WWW'07: 64-bit fingerprints, hamming <= 3).
    Kept as two longs so every bit operation stays in exact non-negative
    i64 arithmetic on both Spark and the SQL oracle.  Same exploded
    whole-stage-codegen shape as :func:`simhash32_table`; the one
    shuffle carries (id, 64 small ints)."""
    return _simhash_halves_table(
        df, id_col, text_col, [(1, hi_col), (9, lo_col)])


def _simhash_halves_table(df, id_col, text_col, halves) -> DataFrame:
    """Shared exploded-codegen simhash core: one 32-bit md5-prefix hash
    per (doc, distinct token, half), 32 flat shift/mask bit-votes per
    half, one map-side-combined groupBy sum, flat signature reassembly.
    ``halves``: list of (md5 hex start char, output column name).

    Text is coalesced to '' first: ``normalized_words('')`` is the
    single-element array [''], so a null/empty text still yields one
    token row and its id survives to the output (an explode of an empty
    set would silently drop the row — a divergence from the HOF Column
    form this replaces).

    Expressions are built as ``selectExpr`` SQL strings, not nested
    Column objects: the 64 vote columns cost ~500 py4j round-trips in
    Column form (measured 7.4 s of pure plan CONSTRUCTION per
    invocation on a loaded driver, vs 0.27 s for the string form — the
    resolved plan is identical, verified by two-sided exceptAll)."""
    nw = ("split(regexp_replace(lower(trim(coalesce("
          f"`{text_col}`, ''))), '\\\\s+', ' '), ' ')")
    toks = df.selectExpr(
        f"`{id_col}` AS __id",
        f"explode(array_distinct({nw})) AS __w")
    # separate select so each md5+conv evaluates once per row; the vote
    # expressions below reference the materialized __h columns
    hashed = toks.selectExpr(
        "__id",
        *[f"CAST(conv(substring(md5(__w), {start}, 8), 16, 10) AS BIGINT)"
          f" AS __h{j}"
          for j, (start, _out) in enumerate(halves)])
    votes = hashed.selectExpr("__id", *[
        f"(shiftright(__h{j}, {b}) & 1) * 2 - 1 AS __v{j}_{b}"
        for j in range(len(halves)) for b in range(32)])
    summed = votes.groupBy("__id").agg(
        *[F.expr(f"sum(__v{j}_{b}) AS __v{j}_{b}")
          for j in range(len(halves)) for b in range(32)])
    sigs = []
    for j, (_start, out) in enumerate(halves):
        body = " + ".join(
            f"(CASE WHEN __v{j}_{b} > 0 THEN CAST({1 << b} AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END)" for b in range(32))
        sigs.append(f"(CAST(0 AS BIGINT) + {body}) AS `{out}`")
    return summed.selectExpr(f"__id AS `{id_col}`", *sigs)


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by 64-bit SimHash hamming distance — the
    Manku/Jain/Sarma web-dedup design (WWW'07), Spark-first.

    Pigeonhole banding: two signatures within hamming <= 3 agree
    EXACTLY on at least one of four 16-bit bands, so candidates are an
    equi-join on (band_idx, band_value) — never an all-pairs scan —
    then verified with ``bit_count(xor)`` over both halves (all
    whole-stage codegen).  The band join carries only (id, hi, lo): two
    longs per row, so no rematerialization pass is needed (contrast
    ``minhash_lsh_pairs``, whose shingle arrays must stay out of the
    join).  Hot bands (boilerplate clusters) split under AQE skew-join.

    The signature frame is cached via ``persist_tracked`` (the band
    self-join references it on both sides); library consumers should
    call :func:`reductstore_spark.caching.release_caches` after
    materializing the result to free it.

    NOTE (scale): pair *enumeration* is inherently quadratic inside a
    near-dup cluster even with perfect banding — a boilerplate-heavy
    corpus at 100 TB wants :func:`simhash_near_dup_components`, which
    consumes the pair set with a group aggregation instead of
    materializing it.

    Returns (id_a, id_b, hamming) with id_a < id_b, hamming <= max.
    """
    pairs, _sig = _simhash_banded_pairs(df, id_col, text_col, max_hamming)
    return pairs.dropDuplicates(["id_a", "id_b"])


def _simhash_banded_pairs(df, id_col, text_col, max_hamming):
    """Shared Manku banding core: (verified-pairs frame WITHOUT the
    duplicate-band dedup shuffle, cached signature frame).  A pair whose
    signatures agree on k of the 4 bands appears k times — callers that
    feed an order-insensitive aggregate (connected components' hash-min)
    skip the dropDuplicates shuffle entirely; pair-output callers apply
    it."""
    # persist: the band self-join references the signature pipeline on
    # BOTH sides and Spark reuses nothing across self-join branches
    # (measured: 2 scans / 4 explodes / 6 aggregates without it) — the
    # cached frame is 3 small columns per doc
    sig = persist_tracked(simhash64_table(df, id_col, text_col))
    return _banded_pairs_from_sig(sig, id_col, max_hamming), sig


def _banded_pairs_from_sig(sig, id_col, max_hamming):
    """Banded self-join + hamming verify over a precomputed
    (id_col, sim_hi, sim_lo) signature frame."""
    hi, lo = F.col("sim_hi"), F.col("sim_lo")
    bands = [F.shiftright(hi, 16), hi.bitwiseAND(F.lit(0xFFFF)),
             F.shiftright(lo, 16), lo.bitwiseAND(F.lit(0xFFFF))]
    banded = sig.select(
        F.col(id_col).alias("id"), "sim_hi", "sim_lo",
        F.posexplode(F.array(*bands)).alias("band_idx", "band_val"))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.band_val") == F.col("b.band_val"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                (F.bit_count(F.col("a.sim_hi").bitwiseXOR(F.col("b.sim_hi")))
                 + F.bit_count(F.col("a.sim_lo").bitwiseXOR(F.col("b.sim_lo")))
                 ).alias("hamming"))
        # verify BEFORE any downstream shuffle: the hamming test is pure
        # codegen and drops most candidates, so only matches move on
        .where(F.col("hamming") <= max_hamming))
    return pairs


def simhash_near_dup_components(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Pair-free near-dup grouping: every document labeled with the
    smallest doc id in its SimHash hamming <= ``max_hamming``
    neighborhood's transitive closure — the Manku/Jain/Sarma (WWW'07)
    web-dedup END STATE, where banded candidate pairs feed straight into
    connected components and are never materialized to the user.

    Why this is the 100 TB shape: inside a k-document boilerplate
    cluster the verified pair set is k^2/2 rows no matter how good the
    banding is, so *returning pairs* is output-bound on duplicate-heavy
    corpora (measured: the sf3 ``simhash_near_dup_pairs`` wall is
    dominated by 33.2 M genuine pairs).  Grouping dodges that two ways:

    * **Signature contraction (hamming-0 collapse).**  Documents with
      IDENTICAL 64-bit signatures — the bulk of real web duplication —
      are contracted to one representative node (min doc id per
      signature, a single window shuffle) BEFORE the banded self-join,
      so an exact-dup clique of size k contributes one node instead of
      k^2/2 candidate pairs.  Candidate generation is quadratic only in
      *distinct-signature* cluster sizes.
    * **One edge dedup, amortized over rounds.**  A candidate pair that
      agrees on k of the 4 pigeonhole bands is emitted k times; CC's
      hash-min is duplicate-insensitive but re-joins the edge list
      EVERY round, so one up-front ``dropDuplicates`` beats shipping
      the multiset through every iteration (measured at sf3: the
      dedup-free form cost 131 s vs 39 s for the pairs operator; this
      form removes that regression).

    The doc→representative mapping is localCheckpoint-ed (its blocks
    are registered for ``release_caches()``), which both truncates the
    self-join's lineage and lets the signature pipeline run exactly
    once — no persist of the signature frame is needed at all.

    Returns (id_col, component): one row per input document, component
    = smallest reachable doc id (singletons map to themselves).
    """
    from pyspark.sql import Window

    from ..caching import localcheckpoint_tracked

    # lazy checkpoint: truncates the self-join lineage at call time; the
    # blocks materialize inside connected_components' first aggregate job
    # instead of a dedicated up-front job
    mapping = localcheckpoint_tracked(
        simhash64_table(df, id_col, text_col).select(
            F.col(id_col).alias("id"), "sim_hi", "sim_lo",
            F.min(id_col).over(
                Window.partitionBy("sim_hi", "sim_lo")).alias("rep")),
        eager=False,
        materialized_by="connected_components' round-0 label-sum job "
                        "(reads reps -> mapping before the final join "
                        "branch runs)")
    reps = mapping.where(F.col("id") == F.col("rep")).select(
        "id", "sim_hi", "sim_lo")
    edges = (_banded_pairs_from_sig(reps, "id", max_hamming)
             .select("id_a", "id_b").dropDuplicates())
    comp = connected_components(edges)
    return (mapping
            .join(comp.withColumnRenamed("id", "rep"), "rep", "left")
            .select(F.col("id").alias(id_col),
                    F.coalesce("component", F.col("rep")).alias("component")))


def minhash_near_dup_components(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 1,
    num_hashes: int = 8,
    num_bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Pair-free MinHash near-dup grouping: every document labeled with
    the smallest doc id in the transitive closure of the
    jaccard >= ``threshold`` pair graph — the grouping end state for
    the MinHash family, symmetric with
    :func:`simhash_near_dup_components`.

    Exact-duplicate contraction: documents with byte-identical text are
    contracted to one representative (min doc id per ``md5(text)``)
    BEFORE signature computation, so an exact-dup clique of size k
    contributes one node to candidate generation instead of k^2/2
    verified pairs — the dominant duplication mode of a real web-scale
    corpus.  Contraction is SOUND only for documents that can form at
    least one shingle (identical non-degenerate texts have jaccard
    exactly 1 >= any threshold); texts shorter than ``shingle_k``
    words have an EMPTY shingle set, are never pairs under the operator
    contract (0/0 jaccard), and therefore stay their own singleton
    representatives — contracting them would diverge from the pair
    closure.

    Returns (id_col, component): one row per input document, component
    = smallest reachable doc id (singletons map to themselves)."""
    from pyspark.sql import Window

    from ..caching import localcheckpoint_tracked

    txt = F.coalesce(F.col(text_col), F.lit(""))
    n_words = F.size(normalized_words(txt))
    w = Window.partitionBy(F.md5(txt))
    # identical text => identical word count, so the whole md5 group
    # either contracts or stays singletons — never a mixed group
    # lazy checkpoint: materializes inside the pair pipeline's first
    # action instead of a dedicated up-front job
    mapping = localcheckpoint_tracked(df.select(
        F.col(id_col).alias("id"),
        F.when(n_words >= F.lit(shingle_k), F.min(id_col).over(w))
        .otherwise(F.col(id_col)).alias("rep")), eager=False,
        materialized_by="connected_components' round-0 label-sum job "
                        "(reads pairs -> reps_src -> mapping before the "
                        "final join branch runs)")
    reps_src = df.join(
        mapping.where(F.col("id") == F.col("rep"))
        .select(F.col("id").alias(id_col)), id_col, "left_semi")
    pairs = minhash_lsh_pairs(reps_src, id_col, text_col, shingle_k,
                              num_hashes, num_bands, threshold)
    comp = connected_components(pairs.select("id_a", "id_b"))
    return (mapping
            .join(comp.withColumnRenamed("id", "rep"), "rep", "left")
            .select(F.col("id").alias(id_col),
                    F.coalesce("component", F.col("rep")).alias("component")))


def exact_dedup_keep_first(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: keep the lowest-id row per identical content.

    Content identity is ``md5(text)`` — chosen because every oracle
    engine computes it identically, which is what the correctness gate
    needs.  At 100 TB against adversarial web text, swap the digest for
    ``xxhash64(text)`` paired with a full-text tiebreak, or
    ``sha2(text, 256)`` where a collision-resistant 256-bit digest is
    the (industry-floor) requirement — the window/partition shape is
    unchanged, only the hash expression swaps."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every id in the pair graph; component is the
    smallest id reachable — the canonical-id assignment that turns
    pairwise near-dups into dedup groups (keep one doc per component).

    Hash-min label propagation with path halving: each round a node
    takes the min of its own and its neighbors' labels (one join +
    map-side-combined groupBy shuffling only (id, label)), then labels
    chase their label's label (pointer jump), so convergence is
    O(log diameter) rounds, not O(diameter) — the standard large-graph
    CC shape (large-star/small-star family), never an all-pairs closure.

    Two details carry the iteration at scale:

    * **Lineage truncation.**  Every round is ``localCheckpoint``-ed.
      Without it the logical plan *doubles* per round (the pointer-jump
      self-join references the step twice) and Catalyst re-analyzes the
      entire upstream candidate-generation tree on every iteration —
      empirically the optimizer, not the data, dominated wall time by
      round 3.  Checkpoints are LAZY (``eager=False``): the plan is
      truncated at call time either way, and the convergence aggregate
      below is the round's one action, so it materializes the
      checkpoint and computes the sum in a single job — an eager
      checkpoint spent a second driver-scheduled job per round on the
      same tiny data (r10 measured: 2 jobs/round -> 1, and the
      edges/seed round-0 jobs fold into the first sum the same way).
      On a cluster where executor loss must be survivable, swap for
      reliable ``checkpoint`` with a checkpoint dir.
      Superseded rounds' blocks are freed eagerly (each round's
      checkpoint is safe to drop the moment the next one has
      materialized) and the edge list is freed on return — without
      this, a long session accumulates every round of every invocation
      in the block manager until an unrelated broadcast build OOMs.
      The returned frame's own blocks are registered for
      ``release_caches()``.
    * **Join-free convergence test.**  Labels are monotonically
      non-increasing, so the iteration has converged exactly when
      ``sum(lbl)`` stops decreasing — one map-side-combined aggregate
      per round (decimal, overflow-proof) instead of a join + count.

    Near-dup graphs have tiny components, so 2-4 rounds typically
    suffice; ``max_iter`` only bounds pathology.

    **Input contract — this is the explicit pairs-consumer.**  The
    operator's cost scales with the size of the *materialized pair
    multiset* it is fed, which on a duplicate-heavy corpus is
    quadratic in clique size: the SCALING.md §13 soak shows its
    sf3→sf10 segment going superlinear (20.6 s→102.9 s over 3.3×
    data) precisely because the ~250 M-pair input dominates.  When the
    goal is dedup GROUPS rather than the pairs themselves, do not
    route through this operator — use ``simhash_components`` /
    ``minhash_components``, which contract identical signatures to one
    representative BEFORE candidate generation (an exact-dup clique of
    size k enters the graph as 1 node, not k²/2 pairs) and measured
    2.1× faster with exponent 0.704 vs 0.928 at the sf10 worst case.
    Feed this operator directly only when the pair list is already the
    product (audit trails, pair-level scoring) or known to be sparse.
    """
    from ..caching import _LIVE_CKPT, release_local_checkpoint

    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = e.union(e.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst"))
                    ).localCheckpoint(eager=False)
    # round-0 fold: seed every node with min(id, min neighbor id) directly
    # from the edge list — one aggregate instead of the first full
    # join+step round (single-edge components converge immediately)
    labels = (edges.groupBy("src").agg(F.min("dst").alias("__mn"))
              .select(F.col("src").alias("id"),
                      F.least("src", "__mn").alias("lbl"))
              ).localCheckpoint(eager=False)

    def lblsum(df: DataFrame):
        return df.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)"))).collect()[0][0]

    # materializes the edges AND seed-label checkpoints inside this one
    # aggregate job (lazy checkpoints above)
    prev = lblsum(labels)
    for _ in range(max_iter):
        nbr = (edges.join(labels.select(F.col("id").alias("dst"), "lbl"),
                          "dst")
               .groupBy("src").agg(F.min("lbl").alias("nlbl"))
               .withColumnRenamed("src", "id"))
        # stepped stays lazy: labels/edges are checkpointed, so its tree
        # is constant-depth and the self-join below merely computes the
        # (tiny, cache-fed) step twice within one job — cheaper than an
        # extra checkpoint job per round
        stepped = (labels.join(nbr, "id", "left")
                   .select("id", F.least(
                       "lbl", F.coalesce("nlbl", "lbl")).alias("lbl")))
        # pointer jump: follow my label's label (parent's label is never
        # larger than the parent id, which IS my label)
        jumped = (stepped.alias("n")
                  .join(stepped.select(F.col("id").alias("lbl"),
                                       F.col("lbl").alias("plbl")).alias("p"),
                        "lbl", "left")
                  .select("id", F.coalesce("plbl", "lbl").alias("lbl"))
                  ).localCheckpoint(eager=False)
        superseded = labels
        labels = jumped
        # the round's single job: materializes the lazy checkpoint and
        # computes the convergence sum together.  The superseded round's
        # blocks are released only AFTER this job (the lazy checkpoint
        # reads them while materializing — freeing first would lose data).
        cur = lblsum(labels)
        release_local_checkpoint(superseded)
        if cur == prev:
            break
        prev = cur
    release_local_checkpoint(edges)
    _LIVE_CKPT.append(labels)  # freed by the caller's release_caches()
    return labels.select(F.col("id"), F.col("lbl").alias("component"))


def span_dedup(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", span_words: int = 8) -> DataFrame:
    """Global repeated-span REMOVAL: the C4 / "Deduplicating Training
    Data Makes Language Models Better" (Lee et al., 2022) exact-substring
    stage at fixed span granularity — every ``span_words``-word window of
    every document is hashed corpus-wide, and any span that occurs more
    than once survives only at its first occurrence (lowest
    ``(doc_id, span_pos)``); all later copies are cut and the document
    reassembled from its surviving spans.

    Unlike the profiling operators (``ngram_novelty``,
    ``shingle_dup_profile``, winnowing overlap) this is a *transform*:
    it returns the cleaned corpus, one row per input document —

        (id, n_spans, n_kept, new_text)

    with ``new_text`` the space-joined surviving spans in original
    order (empty when every span was cut or the text was empty/null).

    100 TB shape: span construction is pure whole-stage-codegen Column
    work on the split array (``slice``/``transform`` — no explode-
    regroup shuffle just to window the words); the global first-
    occurrence pass is ONE hash aggregation keyed on the span text and
    ONE keyed join back (AQE is free to broadcast the firsts side when
    the duplicate universe is small), then one re-aggregation per doc.
    Nothing is quadratic: a span repeated a million times costs one
    aggregate row.  The first-occurrence key packs ``(doc_id, pos)``
    into a single long (``doc_id * 2^20 + pos``) so the min-aggregation
    is a primitive ``min(long)``; documents are capped at 2^20 spans
    (≈8M words) and ids at 2^43 — a runtime ``assert_true`` fails
    loudly (no silent mis-ordering) past the cap; raise the shift for
    longer documents.
    """
    # one F.expr string instead of ~25 py4j Column constructions (r10;
    # same resolved plan — the lambda/sequence/slice fold is unchanged)
    txt = f"coalesce(`{text_col}`, '')"
    arr = f"split({txt}, ' ')"
    n_sp = f"CAST(ceil(size({arr}) / {span_words}) AS INT)"
    # split("") is [""] in both engines — an empty/null text must yield
    # ZERO spans, so gate on the text length, not the array size
    spans_col = F.expr(
        f"CASE WHEN length({txt}) = 0 THEN CAST(array() AS ARRAY<STRING>) "
        f"ELSE transform(sequence(0, {n_sp} - 1), "
        f"i -> array_join(slice({arr}, i * {span_words} + 1, {span_words})"
        f", ' ')) END")
    return _span_dedup_assemble(df, id_col, spans_col)


# sentinel marking content-defined span ends; stripped from input text
# first so adversarial text cannot forge a boundary
_CDC_SENT = "\x01"


def span_dedup_cdc(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   avg_words: int = 8,
                   min_words: int = 4) -> DataFrame:
    """Offset-robust :func:`span_dedup`: span boundaries are
    CONTENT-DEFINED — a span ends at every word whose md5-derived hash
    satisfies ``h(word) % avg_words == 0`` (the winnowing / CDC
    breakpoint trick), so a passage duplicated at *any* word offset
    chunks into identical spans in every copy and dedups like an
    aligned one.  Fixed windows (``span_dedup``) miss a passage whose
    copy starts at a word offset not ≡ 0 (mod ``span_words``) relative
    to its document start — the gap a curation user hits first, and the
    reason the Lee et al. (2022) design this family cites is
    offset-independent.  Expected span length is ``avg_words`` words
    (geometric); spans are unbounded above in adversarial
    no-breakpoint runs, but such a run costs one aggregate row, not a
    blowup.  Same output contract and 100 TB plan shape as
    ``span_dedup``: one span-keyed hash aggregation, one keyed join,
    one per-doc re-aggregation.

    The span construction stays whole-stage codegen: breakpoint words
    get a one-byte sentinel appended (``transform`` over the split
    array), the array is re-joined and re-split on ``sentinel + " "``
    — an O(words) pure-Column pass, no per-element prefix-sum and no
    explode-regroup shuffle just to window the words.  The sentinel is
    stripped from the input first so text cannot forge a boundary.

    ``min_words`` is the FastCDC-style minimum-span floor: a breakpoint
    only takes effect when the span it would close has at least
    ``min_words`` words; shorter spans merge forward into their
    successor (the document-final remainder may still be short — it has
    no successor).  Without the floor, adjacent breakpoint words
    produce 1-2-word spans, and short common-word spans ("was",
    "it was" — ~10% of frequent English words are breakpoints under
    the md5 % 8 rule) collide across UNRELATED documents by chance;
    global first-occurrence removal would then cut them corpus-wide —
    systematic over-deletion of natural text.  Lee et al. (2022) guard
    the same failure mode with a 50-token minimum match; FastCDC with a
    min-chunk floor.  The merge is one ``F.aggregate`` fold over the
    split span array — still pure-Column, O(words) per document.  Set
    ``min_words=1`` for raw content-defined boundaries.  Offset
    robustness is preserved: two copies of a passage re-align at the
    first post-breakpoint raw span of >= ``min_words`` words (with the
    default ``avg_words=8`` that is ~2/3 of raw spans), pinned by the
    metamorphic properties in ``tests/test_llm_ops.py``.
    """
    # one F.expr string instead of ~60 py4j Column constructions for the
    # mark/split/fold chain (r10; same resolved plan — the sentinel
    # chars embed literally in the SQL string)
    s = _CDC_SENT
    txt = f"regexp_replace(coalesce(`{text_col}`, ''), '{s}', '')"
    arr = f"split({txt}, ' ')"
    is_break = ("(CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT)"
                f" % {avg_words}) = 0")
    marked = (f"array_join(transform({arr}, w -> CASE WHEN {is_break} "
              f"THEN concat(w, '{s}') ELSE w END), ' ')")
    # a breakpoint on the final word ends nothing — strip it so the
    # last span never carries a dangling sentinel
    marked = f"regexp_replace({marked}, '{s}$', '')"
    spans_sql = (f"CASE WHEN length({txt}) = 0 "
                 f"THEN CAST(array() AS ARRAY<STRING>) "
                 f"ELSE split({marked}, '{s} ') END")
    if min_words > 1:
        spans_sql = _min_span_merge_sql(spans_sql, min_words)
    return _span_dedup_assemble(df, id_col, F.expr(spans_sql))


def _min_span_merge_sql(spans_sql: str, min_words: int) -> str:
    """SQL text merging sub-``min_words`` spans forward into their
    successor: a left-to-right fold (``aggregate``) carrying the
    under-min accumulator; any span reaching ``min_words`` words is
    emitted and the carry resets.  The trailing carry (document-final
    remainder) is emitted as-is — it has no successor.  Pure Column,
    O(total words): the carry never holds more than ``min_words - 1``
    words, so the per-step word count is bounded.  Null (not ``''``)
    marks "no carry" so an empty-string span can never be confused with
    the reset state.  (The ``comb`` expression is textually inlined
    into each branch exactly as the Column form it replaces inlined its
    shared sub-Column.)"""
    comb = ("CASE WHEN acc.carry IS NULL THEN s"
            " ELSE concat(acc.carry, ' ', s) END")
    full = f"size(split({comb}, ' ')) >= {min_words}"
    return (
        f"aggregate({spans_sql}, "
        "named_struct('out', CAST(array() AS ARRAY<STRING>), "
        "'carry', CAST(NULL AS STRING)), "
        "(acc, s) -> named_struct("
        f"'out', CASE WHEN {full} THEN array_append(acc.out, {comb})"
        " ELSE acc.out END, "
        f"'carry', CASE WHEN {full} THEN CAST(NULL AS STRING)"
        f" ELSE {comb} END), "
        "acc -> CASE WHEN acc.carry IS NULL THEN acc.out"
        " ELSE array_append(acc.out, acc.carry) END)")


def _span_dedup_assemble(df: DataFrame, id_col: str,
                         spans_col) -> DataFrame:
    """Shared tail of the span-dedup family: global first-occurrence
    over the given per-doc span array, then per-doc reassembly.  See
    :func:`span_dedup` for the plan-shape discussion."""
    sp = (df.select(F.col(id_col).alias("__id"), spans_col.alias("__sp"))
            .select("__id", F.posexplode_outer("__sp")
                    .alias("__pos", "__span")))
    # packed (doc_id, pos) so first-occurrence is min(long), not
    # min(struct) — identical ordering, cheaper aggregate.  The packing
    # is only an order embedding for 0 <= pos < 2^20 and
    # 0 <= doc_id < 2^43; span counts are data-dependent (CDC spans
    # especially), so out-of-range rows FAIL LOUDLY here instead of
    # silently mis-ordering first-occurrence.
    key = (F.col("__id") * F.lit(1 << 20) + F.coalesce("__pos", F.lit(0)))
    in_range = ((F.coalesce("__pos", F.lit(0)) < F.lit(1 << 20))
                & (F.col("__id") >= 0) & (F.col("__id") < F.lit(1 << 43)))
    guard = F.assert_true(in_range, F.concat(
        F.lit("span_dedup: packed (doc_id, pos) key out of range "
              "(need 0 <= doc_id < 2^43 and pos < 2^20; got doc_id="),
        F.col("__id"), F.lit(" pos="), F.coalesce("__pos", F.lit(0)),
        F.lit("); raise the pack shift for longer documents")))
    sp = sp.withColumn("__key", F.coalesce(guard.cast("long"), key))

    firsts = sp.groupBy("__span").agg(F.min("__key").alias("__first"))
    # annotate kept-ness on the full span stream, then fold the span
    # count, the kept count, AND the reassembly into ONE per-doc
    # aggregate — the scan+split+explode subtree executes twice (the
    # firsts aggregate and the join probe), not once per output column.
    # A window over the span partition would get it to once, but a hot
    # boilerplate span then lands on a single reducer with no partial
    # aggregation and no AQE remedy; the equi-join keeps AQE's
    # skew-split applicable.  collect_list drops the nulls the `when`
    # leaves on non-first copies.
    ann = (sp.where(F.col("__span").isNotNull())
             .join(firsts, "__span"))
    is_first = F.col("__key") == F.col("__first")
    agg = ann.groupBy("__id").agg(
        F.count("*").alias("n_spans"),
        F.sum(is_first.cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(
                    F.when(is_first, F.struct("__pos", "__span")))),
                lambda s: s["__span"]), " ").alias("new_text"))
    out = (df.select(F.col(id_col).alias("__id"))
           .join(agg, "__id", "left")
           .select(F.col("__id").alias(id_col),
                   F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
                   F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
                   F.coalesce("new_text", F.lit("")).alias("new_text")))
    return out
