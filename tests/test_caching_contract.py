"""The lazy-checkpoint contract (caching.py).

``localcheckpoint_tracked(eager=False)`` folds the checkpoint's
materialization into a job the caller runs anyway — but only if that job
runs before any branch divergence.  The r10 verdict flagged the contract
as caller-enforced with nothing asserting it; these tests pin it:

* the helper REFUSES the lazy form unless the call site names the
  materializing action (no silent lazy checkpoints can be added);
* ``cached_fraction`` detects a diverged (recomputing) lazy checkpoint;
* after each components operator materializes, every tracked lazy
  checkpoint it created is fully cached — the no-silent-recompute gate
  for the current call sites.
"""

import pytest
from pyspark.sql import functions as F

from reductstore_spark.caching import (
    _LIVE_CKPT,
    cached_fraction,
    localcheckpoint_tracked,
    release_caches,
)


def test_lazy_requires_materialized_by(spark):
    df = spark.range(4)
    with pytest.raises(ValueError, match="materialized_by"):
        localcheckpoint_tracked(df, eager=False)
    release_caches()


def test_cached_fraction_probe(spark):
    # eager checkpoint: blocks exist immediately
    eager = localcheckpoint_tracked(spark.range(8).toDF("n"))
    assert cached_fraction(eager) == 1.0
    # lazy checkpoint: nothing cached until an action runs over it
    lazy = localcheckpoint_tracked(
        spark.range(8).toDF("n"), eager=False,
        materialized_by="the count() below (this test)")
    assert cached_fraction(lazy) == 0.0
    lazy.count()
    assert cached_fraction(lazy) == 1.0
    # a non-checkpoint plan is simply "not cached", not an error
    assert cached_fraction(spark.range(3).toDF("n")) == 0.0
    release_caches()


@pytest.mark.parametrize("op", ["simhash", "minhash"])
def test_components_lazy_checkpoints_materialize_once(spark, op):
    """Every lazy checkpoint the components operators register must be
    fully cached after the operator's own first action — if a future
    edit makes a branch diverge before that action, this catches the
    silent recompute."""
    from reductstore_spark.operators.dedup import (
        minhash_near_dup_components,
        simhash_near_dup_components,
    )

    release_caches()
    # docs 0/2 are identical (contract away); doc 1 is a true near-dup of
    # doc 0 (simhash hamming 1, jaccard 30/31) so the POST-contraction
    # graph has an edge — an empty label table stores zero-size blocks
    # the block manager does not report, which would blind the probe
    base = " ".join(f"word{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(0, base), (1, base + " extra3"), (2, base),
         (3, "completely different words here"),
         (4, "another unrelated document text"), (5, "")],
        ["doc_id", "text"])
    fn = (simhash_near_dup_components if op == "simhash"
          else minhash_near_dup_components)
    n0 = len(_LIVE_CKPT)
    out = fn(docs, "doc_id", "text")
    rows = out.collect()
    assert len(rows) == 6
    lazy_ckpts = _LIVE_CKPT[n0:]
    assert lazy_ckpts, "operator registered no tracked checkpoints"
    for df in lazy_ckpts:
        assert cached_fraction(df) == 1.0, (
            "a tracked checkpoint is not fully cached after the "
            "operator's action — a branch diverged before the "
            "materializing job (silent recompute)")
    release_caches()
