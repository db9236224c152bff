"""LLM-pipeline operators: dedup, similarity, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from reductstore_spark.operators.dedup import (
    exact_dedup_keep_first,
    jaccard,
    minhash_lsh_pairs,
    simhash32,
    simhash32_table,
    word_shingles,
)
from reductstore_spark.operators.multimodal import (
    attach_payload,
    decode_stub,
    extract_media_meta,
    frame_sample_stub,
)
from reductstore_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    lsh_bucket,
    plane_coeffs,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "completely different text about spark engines here"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d")], "id long, text string")
    got = df.select(word_shingles(F.col("text"), 3).alias("s")).collect()[0]["s"]
    assert sorted(got) == ["a b c", "b c d"]
    short = spark.createDataFrame([(1, "a b")], "id long, text string")
    assert short.select(word_shingles(F.col("text"), 3).alias("s")).collect()[0]["s"] == []


def test_exact_dedup_keep_first(docs):
    out = exact_dedup_keep_first(docs, "doc_id", "text")
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2, 3]


def test_minhash_lsh_finds_near_dups(docs):
    pairs = minhash_lsh_pairs(docs, shingle_k=3, threshold=0.4)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert (1, 4) in got and got[(1, 4)] == 1.0  # exact dup
    assert (1, 2) in got  # near dup shares most trigrams
    assert not any(3 in p for p in got)  # unrelated doc never pairs


def test_simhash_close_for_near_dups(docs):
    out = {r["doc_id"]: r["simhash"] for r in
           docs.select("doc_id", simhash32(F.col("text")).alias("simhash")).collect()}
    assert out[1] == out[4]  # identical text -> identical signature
    ham_near = bin(out[1] ^ out[2]).count("1")
    ham_far = bin(out[1] ^ out[3]).count("1")
    assert ham_near < ham_far  # near-dup closer in hamming space


def test_simhash_near_dup_pairs_matches_brute_force(docs):
    """Banding is exact for hamming <= 3 over 4x16-bit bands
    (pigeonhole): the pair set must equal a brute-force all-pairs
    hamming computation over the same 64-bit signatures."""
    from reductstore_spark.operators.dedup import (
        simhash64_table, simhash_near_dup_pairs)

    sigs = {r["doc_id"]: (r["sim_hi"], r["sim_lo"]) for r in
            simhash64_table(docs, "doc_id", "text").collect()}
    want = {}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = (bin(sigs[a][0] ^ sigs[b][0]).count("1")
                 + bin(sigs[a][1] ^ sigs[b][1]).count("1"))
            if h <= 3:
                want[(a, b)] = h
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in
           simhash_near_dup_pairs(docs, "doc_id", "text", 3).collect()}
    assert got == want
    assert got[(1, 4)] == 0  # exact dup -> identical signature


def test_simhash_table_matches_column_form(docs):
    """The exploded-codegen table form computes the exact same signature
    as the HOF Column form it replaces in hot paths."""
    col_form = {r["doc_id"]: r["simhash"] for r in
                docs.select("doc_id",
                            simhash32(F.col("text")).alias("simhash")).collect()}
    tbl_form = {r["doc_id"]: r["simhash"] for r in
                simhash32_table(docs, "doc_id", "text").collect()}
    assert tbl_form == col_form
    # every input id survives (non-null text contract) and range is 32-bit
    assert set(tbl_form) == {1, 2, 3, 4}
    assert all(0 <= v < 2 ** 32 for v in tbl_form.values())


def test_simhash_table_survives_null_and_empty_text(spark):
    """A null text coalesces to '' so its id survives with the
    deterministic empty-text signature (the explode would otherwise
    silently drop the row — ADVICE r6)."""
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "some real text")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["simhash"] for r in
           simhash32_table(df, "doc_id", "text").collect()}
    assert set(out) == {1, 2, 3}
    assert out[1] == out[2]  # null and empty share the '' signature
    assert out[1] is not None


def test_simhash_components_matches_pair_union_find(docs):
    """The pair-free grouping operator must assign exactly the labels a
    brute-force union-find over the materialized hamming <= 3 pair set
    would (smallest reachable id), with singletons mapping to
    themselves — and cover every input id exactly once."""
    from reductstore_spark.operators.dedup import (
        simhash_near_dup_components, simhash_near_dup_pairs)

    pairs = [(r["id_a"], r["id_b"]) for r in
             simhash_near_dup_pairs(docs, "doc_id", "text", 3).collect()]
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in ids}
    got = {r["doc_id"]: r["component"] for r in
           simhash_near_dup_components(docs, "doc_id", "text", 3).collect()}
    assert got == want
    # the fixture's exact-dup pair (1, 4) must share a component
    assert got[1] == got[4]


def test_minhash_components_matches_pair_union_find(spark):
    """minhash_near_dup_components must equal a brute-force union-find
    over the materialized pair set — including the exact-dup contraction
    path (byte-identical texts) and the degenerate path (texts too short
    to form a shingle must stay singletons, never contract)."""
    from reductstore_spark.operators.dedup import (
        minhash_lsh_pairs, minhash_near_dup_components)

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base),                            # exact dup of 1 (contracts)
        (3, base + " extra trailing words"),  # near dup of 1/2
        (4, "completely different content about spark query planning"),
        (5, "xy"),                            # < shingle_k words: singleton
        (6, "xy"),                            # identical short text: must
                                              # NOT contract with 5
        (7, None),                            # null text: singleton
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(shingle_k=3, num_hashes=8, num_bands=4, threshold=0.5)

    pairs = [(r["id_a"], r["id_b"]) for r in
             minhash_lsh_pairs(docs, "doc_id", "text", **kw).collect()]
    parent = {i: i for i in range(1, 8)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(1, 8)}
    got = {r["doc_id"]: r["component"] for r in
           minhash_near_dup_components(docs, "doc_id", "text",
                                       **kw).collect()}
    assert got == want
    assert got[1] == got[2]          # exact dups share a component
    assert got[5] == 5 and got[6] == 6 and got[7] == 7  # degenerates


def test_connected_components_releases_checkpoint_blocks(spark, docs):
    """``connected_components`` localCheckpoints every round; superseded
    rounds and the edge list must be freed eagerly and the final labels
    frame via release_caches() — otherwise a long session (bench, soak,
    serving) accumulates every invocation's blocks in the block manager
    until an unrelated broadcast build OOMs (observed: the r7 4-SF soak
    died at sf3 join_salted with 'Not enough memory to build and
    broadcast' before this fix)."""
    from reductstore_spark.caching import release_caches
    from reductstore_spark.operators.dedup import simhash_near_dup_components

    sc = spark.sparkContext
    for _ in range(2):
        out = simhash_near_dup_components(docs, "doc_id", "text", 3)
        out.agg(F.sum(F.xxhash64(*out.columns))).collect()
        release_caches()
    leaked = [(i.id(), i.name()) for i in sc._jsc.sc().getRDDStorageInfo()]
    assert leaked == []


@pytest.fixture(scope="module")
def vecs(spark):
    import math
    rows = []
    for i in range(50):
        ang = i / 50 * math.pi
        rows.append((i, [math.cos(ang), math.sin(ang), 0.1 * i, 1.0]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk(vecs):
    q = vecs.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    out = brute_force_topk(vecs.where(F.col("vec_id") != 0), q, 5)
    rows = out.orderBy("rnk").collect()
    assert len(rows) == 5
    assert rows[0]["cosine"] >= rows[-1]["cosine"]
    assert rows[0]["vec_id"] == 1  # angularly closest


def test_lsh_bucket_groups_similar(vecs):
    planes = plane_coeffs(6, 4)
    b = vecs.withColumn("bucket", lsh_bucket(F.col("embedding"), planes))
    rows = {r["vec_id"]: r["bucket"] for r in b.collect()}
    # neighbors mostly share buckets; distant vectors differ
    assert rows[0] == rows[1] or rows[1] == rows[2]
    assert len(set(rows.values())) > 1


def test_media_meta_and_frames(docs):
    media = attach_payload(docs)
    meta = {r["doc_id"]: r for r in extract_media_meta(media).collect()}
    assert meta[1]["sha256"] == meta[4]["sha256"]
    assert meta[1]["n_bytes"] == len(b"the quick brown fox jumps over the lazy dog")
    d, w, h = decode_stub(b"the quick brown fox jumps over the lazy dog")
    assert (meta[1]["width"], meta[1]["height"]) == (w, h)
    assert 16 <= w < 256 and 16 <= h < 256

    frames = frame_sample_stub(media, every_n=1)
    rows = frames.collect()
    assert len(rows) >= 4
    assert {r["frame_idx"] for r in rows} == {0}  # tiny payloads: 1 frame each


def test_media_resize_and_feature_vectors(docs):
    """resize keeps the 1:1 row contract with target-dim payloads;
    feature extraction emits deterministic unit-norm array<float>
    embeddings that plug straight into the similarity operators."""
    from reductstore_spark.operators.multimodal import (
        feature_vector_stub,
        resize_stub,
    )

    media = attach_payload(docs)
    resized = {r["doc_id"]: r for r in resize_stub(media, 8, 4).collect()}
    assert len(resized) == 4
    assert all(len(bytes(r["payload"])) == 32 for r in resized.values())
    assert (resized[1]["width"], resized[1]["height"]) == (8, 4)
    assert bytes(resized[1]["payload"]) == bytes(resized[4]["payload"])  # dup

    feats = {r["doc_id"]: r["embedding"]
             for r in feature_vector_stub(media, dim=16).collect()}
    assert len(feats) == 4 and all(len(v) == 16 for v in feats.values())
    assert feats[1] == feats[4] and feats[1] != feats[3]  # content-determined
    import math
    assert abs(math.fsum(x * x for x in feats[1]) - 1.0) < 1e-3  # unit norm


def test_release_caches_leaves_no_retained_rdds(spark, docs):
    """Session-reuse hygiene: queries that persist intermediates must not
    leak storage across queries — release_caches() drops every tracked
    cache (a long-lived serving/bench session would otherwise accumulate
    one candidate cache per dedup query)."""
    from reductstore_spark.caching import release_caches

    minhash_lsh_pairs(docs, shingle_k=3, threshold=0.4).collect()
    jsc = spark.sparkContext._jsc.sc()
    assert jsc.getPersistentRDDs().size() > 0  # cache was actually used
    assert release_caches() >= 1
    assert jsc.getPersistentRDDs().size() == 0


def test_winnow_pandas_matches_column_version(spark, sf_dir):
    """The vectorized mapInPandas winnowing stage must be bit-identical to
    the pure-Column oracle (same grams, window mins, digest) on the real
    corpus plus the short/empty/whitespace edge shapes."""
    from reductstore_spark.operators.text import (
        fingerprint_digest,
        winnow_digests_pandas,
        winnow_fingerprints,
    )

    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    edges = spark.createDataFrame(
        [(10_001, ""), (10_002, "ab"), (10_003, "exactly8!"),
         (10_004, "  many   spaces\tand\nnewlines  "),
         (10_005, "MiXeD Case UPPER lower 1234567890"),
         (10_006, "x" * 7), (10_007, "y" * 8), (10_008, "z" * 12)],
        "doc_id long, text string")
    docs = corpus.union(edges)

    fps = winnow_fingerprints(F.col("text"), k=8, w=4)
    want = {r["doc_id"]: (r["n_fps"], r["fp_digest"]) for r in docs.select(
        "doc_id", F.size(fps).cast("bigint").alias("n_fps"),
        fingerprint_digest(fps).alias("fp_digest")).collect()}
    got = {r["doc_id"]: (r["n_fps"], r["fp_digest"])
           for r in winnow_digests_pandas(docs).collect()}
    assert got == want


def test_salted_join_matches_plain_join(spark):
    """Salting must be a pure execution-shape change: the result set
    equals the unsalted join, and the salted side's hot key spreads
    across salt buckets."""
    from reductstore_spark.operators.skew import salted_join

    skewed = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(k, 0) for k in range(2, 10)],
        "k long, payload long")
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(10)],
                                "k long, name string")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        got = salted_join(skewed, dim, ["k"], salt=8)
        plain = skewed.join(dim, "k")
        assert got.count() == plain.count() == 508
        assert (got.exceptAll(plain).count() == 0
                and plain.exceptAll(got).count() == 0)
        # the hot key's rows really do carry >1 distinct salt
        from pyspark.sql import functions as F
        n_salt = (skewed.withColumn(
            "s", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]),
                        F.lit(8)))
            .where(F.col("k") == 1).select("s").distinct().count())
        assert n_salt > 1
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_kmeans_refine_monotone_inertia(spark, sf_dir):
    """Lloyd iterations must not increase the k-means objective, and the
    refined centroids must strictly improve on the naive seed for the
    real embeddings corpus."""
    from reductstore_spark.operators.similarity import inertia, kmeans_refine

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("embedding")
    dim = len(emb.first()["embedding"])
    # naive deterministic seed: 4 corners of a small hypercube slice
    seed = [[(0.5 if (i >> (d % 4)) & 1 else -0.5) for d in range(dim)]
            for i in range(4)]
    j0 = inertia(emb, seed)
    c1 = kmeans_refine(emb, seed, iters=1)
    j1 = inertia(emb, c1)
    c2 = kmeans_refine(emb, c1, iters=1)
    j2 = inertia(emb, c2)
    assert j1 < j0 and j2 <= j1, (j0, j1, j2)


def test_pack_sequences_greedy_semantics(spark):
    from reductstore_spark.operators.packing import pack_sequences

    rows = [
        # source a, ordered by doc_id: token counts 3, 4, 5, 10, 2
        (1, "a", "w w w"),
        (2, "a", "w w w w"),
        (3, "a", "w w w w w"),
        (4, "a", " ".join(["w"] * 10)),   # larger than budget -> own pack
        (5, "a", "w w"),
        (6, "b", "w"),                    # other group starts at pack 0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: (r["pack_id"], r["pack_offset"], r["n_tokens"])
           for r in pack_sequences(docs, budget=8).collect()}
    assert out[1] == (0, 0, 3)
    assert out[2] == (0, 3, 4)   # 3+4=7 <= 8 stays
    assert out[3] == (1, 0, 5)   # 7+5 > 8 -> new pack
    assert out[4] == (2, 0, 10)  # oversized doc: alone in its own pack
    assert out[5] == (3, 0, 2)   # 10+2 > 8 with cum>0 -> next pack
    assert out[6] == (0, 0, 1)   # group b independent

    with pytest.raises(ValueError):
        pack_sequences(docs, budget=0)


def test_chunk_documents_windows(spark):
    from reductstore_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(7))),  # 7 tokens
         (2, "a b")],                               # shorter than window
        "doc_id long, text string")
    rows = chunk_documents(docs, window=4, stride=2).collect()
    got = {(r["doc_id"], r["chunk_id"]): r["chunk_tokens"] for r in rows}
    # doc 1 (7 tokens): starts 1,3 then the tail start clamps to 4 so
    # t6 is covered — every token lands in at least one chunk
    assert got == {(1, 0): 4, (1, 1): 4, (1, 2): 4, (2, 0): 2}
    # chunk hash = md5 of the joined slice
    import hashlib
    h = {(r["doc_id"], r["chunk_id"]): r["chunk_hash"] for r in rows}
    assert h[(1, 1)] == hashlib.md5(b"t2 t3 t4 t5").hexdigest()
    assert h[(1, 2)] == hashlib.md5(b"t3 t4 t5 t6").hexdigest()
    assert h[(2, 0)] == hashlib.md5(b"a b").hexdigest()


def test_ngram_novelty_and_dup_profile_hand_case(spark):
    """doc 1 is original; doc 2 copies half of doc 1's text; doc 3 is
    fully distinct.  Novelty credits first occurrence by doc_id; the
    dup profile flags shared shingles symmetrically."""
    from reductstore_spark.operators.dedup import exploded_shingles

    rows = [
        (1, "a b c d e f"),
        (2, "a b c d x y"),   # shares 3-grams "a b c", "b c d" with doc 1
        (3, "p q r s t u"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    g = exploded_shingles(docs, "doc_id", "text", 3)
    first = g.groupBy("s").agg(F.min("id").alias("first_doc"))
    nov = {r["id"]: r["novel"] for r in
           g.join(first, "s").groupBy("id")
            .agg(F.sum((F.col("first_doc") == F.col("id")).cast("long"))
                 .alias("novel")).collect()}
    # doc 1: all 4 grams novel; doc 2: 2 of 4 novel; doc 3: all novel
    assert nov == {1: 4, 2: 2, 3: 4}

    spread = g.groupBy("s").agg(
        (F.min("id") != F.max("id")).cast("long").alias("shared"))
    shr = {r["id"]: r["shared"] for r in
           g.join(spread, "s").groupBy("id")
            .agg(F.sum("shared").alias("shared")).collect()}
    assert shr == {1: 2, 2: 2, 3: 0}


def test_cosine_pd_matches_column_cosine(spark):
    """The Arrow-vectorized cosine must agree with the JVM Column kernel
    bit-for-bit after round(6) (it replaces it on pair-heavy plans)."""
    from reductstore_spark.operators.similarity import cosine, cosine_pd

    rows = [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
            ([1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
            ([0.5, -2.5, 1.25], [-3.0, 0.25, 8.0])]
    df = spark.createDataFrame(rows, "a array<float>, b array<float>")
    got = df.select(
        F.round(cosine(F.col("a"), F.col("b")), 6).alias("jvm"),
        F.round(cosine_pd(F.col("a"), F.col("b")), 6).alias("np")).collect()
    for r in got:
        assert r["jvm"] == r["np"], (r["jvm"], r["np"])


def test_cosine_pd_degenerate_inputs_match_column_kernel(spark):
    """NULL embeddings and zero-norm vectors yield NULL from BOTH kernels
    (the Column path's non-ANSI 0/0 division), so callers can swap one
    for the other without changing null semantics (ADVICE r3)."""
    from reductstore_spark.operators.similarity import cosine, cosine_pd

    rows = [([1.0, 2.0], [2.0, 1.0]),
            ([0.0, 0.0], [1.0, 1.0]),   # zero-norm
            (None, [1.0, 1.0]),
            ([1.0, 1.0], None),
            (None, None)]
    df = spark.createDataFrame(rows, "a array<double>, b array<double>")
    got = df.select(cosine(F.col("a"), F.col("b")).alias("jvm"),
                    cosine_pd(F.col("a"), F.col("b")).alias("np")).collect()
    for r in got:
        assert r["jvm"] == r["np"], (r["jvm"], r["np"])
    assert [r["np"] for r in got[1:]] == [None] * 4
    # all-null batch (no probe vector available)
    df2 = spark.createDataFrame([(None, None)] * 3,
                                "a array<double>, b array<double>")
    assert [r["x"] for r in df2.select(
        cosine_pd(F.col("a"), F.col("b")).alias("x")).collect()] == [None] * 3


def test_span_dedup_keeps_first_occurrence(spark):
    from reductstore_spark.operators.dedup import span_dedup

    # k=2 spans: doc 1 = [a b][c d], doc 2 = [c d][x y] (span "c d"
    # repeats -> survives only in doc 1), doc 3 = odd tail, doc 4 empty
    rows = [(1, "a b c d"), (2, "c d x y"), (3, "a b e"), (4, None)]
    out = {r["doc_id"]: r for r in span_dedup(
        spark.createDataFrame(rows, "doc_id long, text string"),
        "doc_id", "text", span_words=2).collect()}

    assert out[1]["new_text"] == "a b c d"
    assert (out[1]["n_spans"], out[1]["n_kept"]) == (2, 2)
    assert out[2]["new_text"] == "x y"          # "c d" cut, first kept
    assert (out[2]["n_spans"], out[2]["n_kept"]) == (2, 1)
    assert out[3]["new_text"] == "e"            # "a b" cut, odd tail kept
    assert (out[3]["n_spans"], out[3]["n_kept"]) == (2, 1)
    assert out[4]["new_text"] == ""             # null text -> zero spans
    assert (out[4]["n_spans"], out[4]["n_kept"]) == (0, 0)


def test_span_dedup_kept_equals_distinct_spans(spark, sf_dir):
    """Every distinct span survives exactly once corpus-wide."""
    from reductstore_spark.operators.dedup import span_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = span_dedup(docs, "doc_id", "text", span_words=8)
    total_kept = out.agg(F.sum("n_kept")).collect()[0][0]

    txt = F.coalesce(F.col("text"), F.lit(""))
    arr = F.split(txt, " ")
    spans = F.when(F.length(txt) == 0, F.array().cast("array<string>")) \
        .otherwise(F.transform(
            F.sequence(F.lit(0),
                       F.ceil(F.size(arr) / F.lit(8)).cast("int") - 1),
            lambda i: F.array_join(F.slice(arr, i * 8 + 1, 8), " ")))
    distinct = (docs.select(F.explode(spans).alias("s"))
                .select("s").distinct().count())
    assert total_kept == distinct


# -- span-dedup family: CDC variant + metamorphic properties -----------------

def _model_brk(w, k):
    import hashlib
    return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % k == 0


def _model_spans_fixed(text, k):
    import math
    text = text or ""
    if not text:
        return []
    words = text.split(" ")
    return [" ".join(words[i * k:(i + 1) * k])
            for i in range(math.ceil(len(words) / k))]


def _model_spans_cdc(text, k, min_words=1):
    """Word-level CDC chunking with the FastCDC-style minimum floor: a
    breakpoint only closes a span of >= min_words words (equivalent to
    the operator's span-level merge-forward fold — a suppressed
    breakpoint IS a sub-min span merging into its successor)."""
    text = (text or "").replace("\x01", "")
    if not text:
        return []
    out, cur = [], []
    for w in text.split(" "):
        cur.append(w)
        if _model_brk(w, k) and len(cur) >= min_words:
            out.append(" ".join(cur))
            cur = []
    if cur:
        out.append(" ".join(cur))
    return out


def _model_span_dedup(docs, spanfn, k):
    """Pure-Python oracle of the span-dedup family: global
    first-occurrence by packed (doc_id, pos), per-doc reassembly."""
    spans = {i: spanfn(t, k) for i, t in docs}
    firsts = {}
    for i, _t in docs:
        for p, s in enumerate(spans[i]):
            key = i * (1 << 20) + p
            if s not in firsts or key < firsts[s]:
                firsts[s] = key
    res = {}
    for i, _t in docs:
        kept = [s for p, s in enumerate(spans[i])
                if firsts[s] == i * (1 << 20) + p]
        res[i] = (len(spans[i]), len(kept), " ".join(kept))
    return res


def _run_span_dedup(spark, docs, mode, k, min_words=1):
    from reductstore_spark.operators.dedup import span_dedup, span_dedup_cdc
    df = spark.createDataFrame(list(docs), "doc_id long, text string")
    if mode == "fixed":
        out = span_dedup(df, "doc_id", "text", k)
    else:
        out = span_dedup_cdc(df, "doc_id", "text", k, min_words=min_words)
    return {r["doc_id"]: (r["n_spans"], r["n_kept"], r["new_text"])
            for r in out.collect()}


def test_span_dedup_cdc_shifted_passage_dedups(spark):
    """THE gap CDC exists for: a passage duplicated at a word offset
    not ≡ 0 (mod span_words) survives fixed windows (different span
    strings in each copy) but is cut under content-defined boundaries
    (identical chunking regardless of document offset)."""
    from reductstore_spark.operators.dedup import span_dedup, span_dedup_cdc

    passage = ("alpha beta gamma delta epsilon zeta eta theta iota "
               "kappa lam mu nu xi omicron pi rho sigma tau upsilon "
               "phi chi psi omega one two three four five six")
    rows = [(1, "p1 p2 p3 p4 p5 " + passage),
            (2, "q1 q2 q3 q4 q5 q6 q7 q8 " + passage)]  # shift ≢ 0 mod 8
    df = spark.createDataFrame(rows, "doc_id long, text string")

    fixed = {r["doc_id"]: r for r in span_dedup(df).collect()}
    # fixed windows: every doc-2 span differs from every doc-1 span
    assert fixed[2]["n_kept"] == fixed[2]["n_spans"]

    # default min_words=4 floor active: the copies re-align at the
    # first >= 4-word raw span past the first breakpoint, so the
    # shared tail chunks are STILL cut
    cdc = {r["doc_id"]: r for r in span_dedup_cdc(df).collect()}
    # CDC: doc 1 keeps everything; doc 2 keeps only the chunks its
    # preamble participates in — the shared tail chunks are cut
    assert cdc[1]["n_kept"] == cdc[1]["n_spans"]
    assert cdc[2]["n_kept"] < cdc[2]["n_spans"]
    assert passage.split(" ")[-1] not in cdc[2]["new_text"]
    # and both agree with the pure-python model term for term
    m = _model_span_dedup(
        rows, lambda t, k: _model_spans_cdc(t, k, min_words=4), 8)
    for i in (1, 2):
        assert (cdc[i]["n_spans"], cdc[i]["n_kept"], cdc[i]["new_text"]) \
            == m[i]
    # and without the floor (min_words=1) the raw-boundary behavior
    # is unchanged from round 8
    cdc1 = {r["doc_id"]: r
            for r in span_dedup_cdc(df, min_words=1).collect()}
    m1 = _model_span_dedup(rows, _model_spans_cdc, 8)
    for i in (1, 2):
        assert (cdc1[i]["n_spans"], cdc1[i]["n_kept"],
                cdc1[i]["new_text"]) == m1[i]


def test_span_dedup_cdc_kept_equals_distinct_spans(spark, sf_dir):
    """Corpus-wide: every distinct CDC span survives exactly once (the
    sum(n_kept) == count(distinct span) invariant on real documents)."""
    from reductstore_spark.operators.dedup import _CDC_SENT, span_dedup_cdc

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # min_words=1: this test reimplements the RAW content-defined
    # boundaries independently below; the floored variant's invariant
    # is pinned by the DuckDB recursive-CTE oracle (parity gate) and
    # the model-level hypothesis properties
    out = span_dedup_cdc(docs, "doc_id", "text", avg_words=8, min_words=1)
    total_kept = out.agg(F.sum("n_kept")).collect()[0][0]

    txt = F.regexp_replace(F.coalesce(F.col("text"), F.lit("")),
                           _CDC_SENT, "")
    brk = lambda w: (F.conv(F.substring(F.md5(w), 1, 8), 16, 10)
                     .cast("long") % 8) == 0
    marked = F.regexp_replace(
        F.array_join(F.transform(
            F.split(txt, " "),
            lambda w: F.when(brk(w), F.concat(w, F.lit(_CDC_SENT)))
            .otherwise(w)), " "),
        _CDC_SENT + "$", "")
    spans = F.when(F.length(txt) == 0, F.array().cast("array<string>")) \
        .otherwise(F.split(marked, _CDC_SENT + " "))
    distinct = (docs.select(F.explode(spans).alias("s"))
                .select("s").distinct().count())
    assert total_kept == distinct


def test_span_dedup_duplicate_injection_monotone(spark):
    """Injecting a higher-id duplicate document never changes any
    existing document's kept spans (first occurrence is keyed on the
    packed (doc_id, pos), so later ids never steal firsts)."""
    base = [(1, "a b c d e f g h i"), (2, "c d e f x y")]
    extra = base + [(9, "a b c d e f g h i"), (10, "x y a b")]
    for mode, mw in (("fixed", 1), ("cdc", 1), ("cdc", 3)):
        out0 = _run_span_dedup(spark, base, mode, 4, min_words=mw)
        out1 = _run_span_dedup(spark, extra, mode, 4, min_words=mw)
        for i in (1, 2):
            assert out0[i] == out1[i], (mode, mw, i)


def test_span_dedup_cdc_min_floor_protects_stopword_spans(spark):
    """THE hazard the min_words floor exists for: 'was' / 'it' / 'from'
    are breakpoint words under md5 % 8, so without a floor two
    UNRELATED documents both containing 'was' share a 1-word span and
    global first-occurrence removal cuts it from the later one — text
    deleted by chance collision, not duplication.  With the default
    floor the sub-min spans merge forward, no span collides, and both
    documents survive intact — while a TRUE duplicate is still fully
    cut."""
    from reductstore_spark.operators.dedup import span_dedup_cdc
    rows = [(1, "he said it was a dark and stormy night she told them"),
            (2, "nothing here overlaps but it was also from the start"),
            (3, "he said it was a dark and stormy night she told them")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    raw = {r["doc_id"]: r for r in span_dedup_cdc(df, min_words=1).collect()}
    # without the floor, the unrelated doc 2 loses text to the chance
    # 'was' span collision with doc 1
    assert raw[2]["n_kept"] < raw[2]["n_spans"]
    assert "was" not in raw[2]["new_text"].split(" ")

    out = {r["doc_id"]: r for r in span_dedup_cdc(df).collect()}
    # default floor: both unrelated documents keep every span and
    # reassemble to their original text
    for i in (1, 2):
        assert out[i]["n_kept"] == out[i]["n_spans"], i
        assert out[i]["new_text"] == rows[i - 1][1], i
    # the true duplicate (doc 3 == doc 1) is still fully cut
    assert out[3]["n_kept"] == 0
    assert out[3]["new_text"] == ""


def test_span_dedup_packed_key_guard(spark):
    """The packed (doc_id, pos) first-occurrence key is only an order
    embedding for doc_id < 2^43 — past it the operator must FAIL
    LOUDLY, never silently mis-order (span counts are data-dependent
    under CDC)."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    from reductstore_spark.operators.dedup import span_dedup

    ok = spark.createDataFrame(
        [((1 << 43) - 1, "a b c d")], "doc_id long, text string")
    assert span_dedup(ok, "doc_id", "text", 2).count() == 1
    bad = spark.createDataFrame(
        [(1 << 43, "a b c d")], "doc_id long, text string")
    with pytest.raises(SparkRuntimeException, match="out of range"):
        span_dedup(bad, "doc_id", "text", 2).collect()


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:
    # small vocabulary on purpose: span collisions must actually occur.
    # breakpoint status at k=4 (md5-derived): beta/delta/iota break,
    # alpha/gamma/eta/x7/y do not
    _vocab = st.sampled_from(
        ["alpha", "beta", "gamma", "delta", "eta", "iota", "x7", "y"])
    _doc = st.lists(_vocab, min_size=0, max_size=12).map(" ".join)
    _corpus = st.lists(_doc, min_size=1, max_size=5).map(
        lambda ts: [(i + 1, t) for i, t in enumerate(ts)])

    @settings(max_examples=8, deadline=None)
    @given(_corpus, st.sampled_from([("fixed", 1), ("cdc", 1),
                                     ("cdc", 2), ("cdc", 3)]))
    def test_span_dedup_matches_python_model(spark, corpus, mode_mw):
        """Spark == the pure-Python oracle on random corpora, both
        modes, with and without the min_words floor.  The model is
        order-independent, so this also pins doc-order permutation
        invariance of the Spark plan."""
        mode, mw = mode_mw
        if mode == "fixed":
            spanfn = _model_spans_fixed
        else:
            spanfn = lambda t, k: _model_spans_cdc(t, k, min_words=mw)
        expect = _model_span_dedup(corpus, spanfn, 4)
        got = _run_span_dedup(spark, corpus, mode, 4, min_words=mw)
        assert got == expect

    @settings(max_examples=300, deadline=None)
    @given(_corpus, st.data())
    def test_span_dedup_model_metamorphic(corpus, data):
        """Model-level metamorphic properties (the model itself is
        pinned to Spark above): doc-order permutation invariance,
        higher-id duplicate-injection monotonicity, and
        sum(n_kept) == count(distinct span) — all hold for ANY span
        function, so the floored CDC variants are in the loop."""
        for spanfn in (_model_spans_fixed, _model_spans_cdc,
                       lambda t, k: _model_spans_cdc(t, k, min_words=2),
                       lambda t, k: _model_spans_cdc(t, k, min_words=3)):
            base = _model_span_dedup(corpus, spanfn, 4)
            # permutation invariance
            perm = data.draw(st.permutations(corpus))
            assert _model_span_dedup(perm, spanfn, 4) == base
            # duplicate injection at a higher id never disturbs
            # existing docs
            dup = data.draw(st.sampled_from(corpus))[1]
            grown = corpus + [(len(corpus) + 7, dup)]
            after = _model_span_dedup(grown, spanfn, 4)
            assert all(after[i] == base[i] for i, _ in corpus)
            # every distinct span survives exactly once
            n_kept = sum(v[1] for v in base.values())
            distinct = len({s for _i, t in corpus for s in spanfn(t, 4)})
            assert n_kept == distinct

    @settings(max_examples=300, deadline=None)
    @given(_doc, _doc)
    def test_cdc_chunking_is_offset_independent(prefix, passage):
        """The offset-robustness kernel: past the passage's first
        breakpoint word, CDC chunking of (prefix + passage) is
        IDENTICAL to the chunking of the passage alone — whatever the
        prefix.  (Fixed windows have no such property.)"""
        if not passage:
            return
        joined = (prefix + " " + passage) if prefix else passage
        alone = _model_spans_cdc(passage, 4)
        merged = _model_spans_cdc(joined, 4)
        # drop everything through the first breakpoint in each
        words = passage.split(" ")
        brk_at = next((i for i, w in enumerate(words)
                       if _model_brk(w, 4)), None)
        if brk_at is None:
            return  # no breakpoint: the whole passage rides the prefix
        tail = " ".join(words[brk_at + 1:])
        alone_tail = _model_spans_cdc(tail, 4)
        assert merged[len(merged) - len(alone_tail):] == alone_tail
        assert alone[len(alone) - len(alone_tail):] == alone_tail

    def _model_floor_merge(spans, min_words):
        """Span-level reference of the operator's F.aggregate fold:
        merge sub-min spans forward; trailing carry stands alone."""
        out, carry = [], None
        for s in spans:
            comb = s if carry is None else carry + " " + s
            if len(comb.split(" ")) >= min_words:
                out.append(comb)
                carry = None
            else:
                carry = comb
        if carry is not None:
            out.append(carry)
        return out

    @settings(max_examples=300, deadline=None)
    @given(_doc, st.sampled_from([2, 3, 4]))
    def test_cdc_min_floor_no_short_spans(doc, mw):
        """With the floor active, NO span is shorter than min_words —
        except the document-final remainder, which has no successor to
        merge into.  Also pins the word/span-level equivalence: the
        word-level model == the span-level merge fold the operator
        runs."""
        merged = _model_spans_cdc(doc, 4, min_words=mw)
        for s in merged[:-1]:
            assert len(s.split(" ")) >= mw, (doc, mw, merged)
        assert merged == _model_floor_merge(_model_spans_cdc(doc, 4), mw)

    @settings(max_examples=300, deadline=None)
    @given(_doc, _doc, _doc, st.sampled_from([2, 3]))
    def test_cdc_min_floor_resyncs_across_offsets(p1, p2, passage, mw):
        """Offset robustness WITH the floor: two copies of a passage
        under different prefixes re-align at the first raw span of
        >= min_words words past the passage's first breakpoint — that
        span always closes regardless of carried prefix words, both
        folds reset, and every merged span after it is identical in
        both copies."""
        if not passage:
            return
        j1 = (p1 + " " + passage) if p1 else passage
        j2 = (p2 + " " + passage) if p2 else passage
        m1 = _model_spans_cdc(j1, 4, min_words=mw)
        m2 = _model_spans_cdc(j2, 4, min_words=mw)
        # shared raw-span suffix: the passage past its first breakpoint
        words = passage.split(" ")
        brk_at = next((i for i, w in enumerate(words)
                       if _model_brk(w, 4)), None)
        if brk_at is None:
            return  # no breakpoint: the whole passage rides the prefix
        tail_raw = _model_spans_cdc(" ".join(words[brk_at + 1:]), 4)
        sync = next((r for r, s in enumerate(tail_raw)
                     if len(s.split(" ")) >= mw), None)
        if sync is None:
            return  # no full raw span: carries may never re-align
        expect = _model_floor_merge(tail_raw[sync + 1:], mw)
        if expect:
            assert m1[len(m1) - len(expect):] == expect, (j1, m1, expect)
            assert m2[len(m2) - len(expect):] == expect, (j2, m2, expect)


def test_ann_ivf_kernel_choice_is_result_invariant(spark, monkeypatch):
    """ann_ivf switches its cosine kernel on a vector-count floor
    (entry_queries._IVF_PD_MIN_ROWS) — a pure cost decision.  Both
    kernels must produce the identical top-5 result on the real corpus,
    including the rounded 9-dp centroid-assignment tie-breaks."""
    import reductstore_spark.entry_queries as EQ

    sf = "/root/testdata/sf0.01"
    monkeypatch.setattr(EQ, "_IVF_PD_MIN_ROWS", 1 << 62)  # force JVM
    jvm = sorted(map(tuple, EQ.q_ann_ivf(spark, sf).collect()))
    monkeypatch.setattr(EQ, "_IVF_PD_MIN_ROWS", 0)  # force numpy
    pd_res = sorted(map(tuple, EQ.q_ann_ivf(spark, sf).collect()))
    assert jvm == pd_res and len(jvm) == 5
