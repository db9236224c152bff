"""Text-analysis operators beyond the inline registry queries.

Winnowing document fingerprints (Schleimer/Wilkerson/Aiken style): hash
every character k-gram, slide a window of w hashes, keep each window's
minimum — the classic plagiarism/near-dup fingerprint that is robust to
insertions.  Built purely from md5 + integer arithmetic so any engine
reproduces it bit-for-bit (DuckDB oracle in entry_queries).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _let(expr: Column, body) -> Column:
    """Bind ``expr`` to a lambda variable so ``body`` can reference it
    many times without re-evaluation (an expression embedded in a HOF
    lambda is otherwise recomputed per element — O(n^2) blowup here)."""
    return F.transform(F.array(expr), body).getItem(0)


def winnow_fingerprints(text: Column, k: int = 8, w: int = 4) -> Column:
    """Distinct winnowed fingerprint hashes (sorted array<long>)."""
    norm_expr = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")

    def with_norm(norm: Column) -> Column:
        n = F.length(norm)
        gram_idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
        hashes_expr = F.transform(
            gram_idx,
            lambda i: F.conv(
                F.substring(F.md5(F.substring(norm, i, k)), 1, 8), 16, 10
            ).cast("long"),
        )

        def with_hashes(hs: Column) -> Column:
            nh = F.size(hs)
            win_idx = F.sequence(F.lit(1), F.greatest(nh - (w - 1), F.lit(1)))
            mins = F.transform(win_idx, lambda j: F.array_min(F.slice(hs, j, w)))
            return F.array_sort(F.array_distinct(mins))

        return _let(hashes_expr, with_hashes)

    return _let(norm_expr, with_norm)


def fingerprint_digest(fps: Column) -> Column:
    """Stable digest of a fingerprint set (md5 of the joined sorted list)."""
    return F.md5(F.concat_ws(",", F.transform(fps, lambda x: x.cast("string"))))
