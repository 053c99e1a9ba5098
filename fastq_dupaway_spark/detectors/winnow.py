"""Winnowing document fingerprints — rolling-hash near-dup detection.

No reference analog (the reference's loose mode is prefix containment,
/root/reference/src/comparator.cpp:60-74); this is the classic document
fingerprinting scheme of Schleimer, Wilkerson & Aiken, "Winnowing: Local
Algorithms for Document Fingerprinting" (SIGMOD 2003), the algorithm behind
MOSS — the standard fourth member of the LLM-pipeline dedup family next to
MinHash (set similarity), SimHash (token-vector distance) and the exact
char-containment scan:

1. k-gram rolling hashes: every length-k character window of a document is
   hashed with a polynomial rolling hash (Horner, base B mod M). Documents
   shorter than k contribute ONE whole-document gram.
2. winnowing: slide a window of w consecutive gram hashes; the MINIMUM of
   each window is selected. Density is 2/(w+1) and the scheme guarantees
   any shared substring of length >= w + k - 1 yields at least one shared
   fingerprint (the paper's Theorem: every match of that length contains a
   full hash window, and both documents pick the same minimum from it).
   Documents with fewer than w grams contribute min(all grams).
3. dedup: documents sharing >= min_shared distinct fingerprints are
   near-dup pairs. Ubiquitous fingerprints (boilerplate shared by more
   than max_df documents — license headers, templates) are excluded from
   pair generation and SURFACED via winnow_hot_fingerprints, the paper's
   "ignore overly common fingerprints" rule and this repo's never-silent
   skew policy (buckets.py): at 10^12 turns one boilerplate fingerprint
   would otherwise emit O(df^2) pairs.

Only the fingerprint SET is emitted (positions are internal), so the
leftmost/rightmost window tie-break — which only affects positions — is
irrelevant and the output is engine-portable: the hash is plain integer
arithmetic (base 1000003 mod 2^31-1 over Unicode code points), computable
bit-identically by the DuckDB oracle (list_reduce Horner + slice minima),
unlike xxhash64. 64-bit headroom: code points < 2^21 and M*B < 2^51.

Scale shape: the kernel is a flattened-batch Arrow UDF (one vectorized
rolling-hash pass over the concatenated batch text — the minhash/hamming
house style, no per-row Python in the hot loop); the fingerprint table is
~2/(w+1) * total_chars rows of (id, int64) and every downstream step is a
bounded equi-join or map-side-combined aggregation. No corpus-sized
collect, no cartesian anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .buckets import hot_buckets

#: k-gram length (chars). Following the paper's guidance k must exceed
#: the length of text shared by chance: at k=8 common English words alone
#: make ~40% of all document pairs share >= 8 fingerprints on the test
#: corpus; at k=16 the background drops ~100x and true near-dups separate
#: cleanly (measured: 487 pairs at min_shared=8 vs 18.9k pairs sharing
#: just one fingerprint).
K_GRAM = 16
#: winnow window (grams). Guarantee threshold = W_WINDOW + K_GRAM - 1 = 23
#: chars of shared text; density 2/(w+1) = 2/9.
W_WINDOW = 8
#: polynomial rolling-hash base/modulus — engine-portable integer
#: arithmetic (DuckDB BIGINT exact); M = 2^31 - 1 (Mersenne), B prime.
HASH_BASE = 1000003
HASH_MOD = 2147483647


def _winnow_batch(texts, k: int, w: int) -> list[list[int]]:
    """Winnowed fingerprint sets for a batch of strings, vectorized.

    One flattened pass: all texts are concatenated into a single code-point
    array; the rolling Horner hash runs in k vectorized passes over the
    flat array (grams crossing document boundaries are simply never
    selected); window minima come from ONE sliding_window_view over the
    flat gram array (windows crossing boundaries likewise unselected).
    Per-row work is only the final slice + np.unique + tolist.

    Semantics (mirrored exactly by the DuckDB oracle):
      n >= k: grams = Horner(text[i:i+k]) for i in 0..n-k
      0 < n < k: one gram = Horner(whole text)
      n == 0 / NULL: no fingerprints
      m >= w grams: fingerprints = { min(grams[p:p+w]) } for each window p
      m < w: one fingerprint = min(grams)
    """
    m_docs = len(texts)
    codes = [
        np.frombuffer(
            ("" if t is None else t).encode("utf-32-le"), dtype="<u4"
        ).astype(np.int64)
        for t in texts
    ]
    lens = np.fromiter((c.size for c in codes), dtype=np.int64, count=m_docs)
    n_flat = int(lens.sum())
    if n_flat == 0:
        return [[] for _ in range(m_docs)]
    flat = np.concatenate(codes)
    starts = np.zeros(m_docs, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])

    # grams per doc and their slots in the flat gram array
    m_grams = np.where(lens >= k, lens - k + 1, np.where(lens > 0, 1, 0))
    gstarts = np.zeros(m_docs, dtype=np.int64)
    np.cumsum(m_grams[:-1], out=gstarts[1:])
    total_g = int(m_grams.sum())
    g = np.empty(total_g, dtype=np.int64)

    # long docs (n >= k): k vectorized Horner passes over the flat array,
    # then scatter each doc's valid gram span via a segmented arange
    long_reps = np.where(lens >= k, m_grams, 0)
    n_long = int(long_reps.sum())
    if n_long:
        n_h = n_flat - k + 1
        h = np.zeros(n_h, dtype=np.int64)
        for j in range(k):
            h = (h * HASH_BASE + flat[j : j + n_h]) % HASH_MOD
        seg = np.repeat(np.arange(m_docs), long_reps)
        intra = np.arange(n_long) - np.repeat(
            np.cumsum(long_reps) - long_reps, long_reps
        )
        g[gstarts[seg] + intra] = h[starts[seg] + intra]

    # short docs (0 < n < k): one whole-text gram each, <= k-1 masked
    # vectorized Horner passes over the short rows only
    short = np.nonzero((lens > 0) & (lens < k))[0]
    if short.size:
        sl = lens[short]
        hs = np.zeros(short.size, dtype=np.int64)
        for col in range(int(sl.max())):
            c = flat[starts[short] + np.minimum(col, sl - 1)]
            hs = np.where(col < sl, (hs * HASH_BASE + c) % HASH_MOD, hs)
        g[gstarts[short]] = hs

    # window minima: one sliding view over the flat gram array; docs with
    # fewer than w grams take min over their whole gram span (reduceat)
    sw = (
        np.lib.stride_tricks.sliding_window_view(g, w).min(axis=1)
        if total_g >= w
        else None
    )
    out: list[list[int]] = []
    for i in range(m_docs):
        mg = int(m_grams[i])
        gs = int(gstarts[i])
        if mg == 0:
            out.append([])
        elif mg >= w:
            out.append(np.unique(sw[gs : gs + mg - w + 1]).tolist())
        else:
            # min over the doc's own gram slice (NOT a batch-wide
            # reduceat: clamped segment boundaries next to a zero-gram
            # doc would silently drop this doc's last gram)
            out.append([int(g[gs : gs + mg].min())])
    return out


def _winnow_udf(k: int, w: int):
    @F.pandas_udf("array<bigint>")
    def udf(texts: pd.Series) -> pd.Series:
        return pd.Series(_winnow_batch(texts.tolist(), k, w))

    return udf


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = K_GRAM,
    w: int = W_WINDOW,
) -> DataFrame:
    """(id_col, fp bigint): each document's DISTINCT winnowed fingerprints
    (the kernel emits sets, so no further dedup is needed). Narrow map +
    explode — no shuffle; empty/NULL text yields no rows."""
    return docs.select(
        F.col(id_col),
        F.explode(_winnow_udf(k, w)(F.col(text_col))).alias("fp"),
    )


def winnow_hot_fingerprints(
    fingerprints: DataFrame, max_df: int
) -> DataFrame:
    """(fp, bucket_n) for fingerprints occurring in more than max_df
    documents — the boilerplate quarantine surface (these are EXCLUDED
    from pair generation, so the pipeline checkpoints this table and the
    manifest row count makes the exclusion visible)."""
    return hot_buckets(fingerprints, ["fp"], max_df)


def winnow_pairs_from_fingerprints(
    fingerprints: DataFrame,
    id_col: str = "conv_id",
    min_shared: int = 8,
    max_df: int | None = None,
) -> DataFrame:
    """(conv_a, conv_b, n_shared) from a pre-computed — ideally persisted
    or checkpointed — fingerprint table: pairs sharing at least min_shared
    distinct fingerprints, conv_a < conv_b.

    max_df: document-frequency cap — fingerprints present in more than
    max_df documents are excluded (and reportable via
    winnow_hot_fingerprints). This bounds the fp equi-join's per-key pair
    volume at O(max_df^2) — the skew defense for boilerplate; None (the
    oracle-parity setting) disables it, correct at test scale where no
    fingerprint is ubiquitous."""
    fps = fingerprints
    if max_df is not None:
        hot = winnow_hot_fingerprints(fps, max_df)
        # heavy hitters are few by definition (<= |fps| / max_df):
        # broadcast anti-join, same envelope argument as buckets.with_salt
        fps = fps.join(F.broadcast(hot.select("fp")), "fp", "left_anti")
    a = fps.select(F.col(id_col).alias("conv_a"), "fp")
    b = fps.select(F.col(id_col).alias("conv_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("conv_a") < F.col("conv_b"))
        .groupBy("conv_a", "conv_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def winnow_dup_pairs(
    docs: DataFrame,
    id_col: str = "conv_id",
    text_col: str = "text",
    k: int = K_GRAM,
    w: int = W_WINDOW,
    min_shared: int = 8,
    max_df: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """End-to-end: fingerprints -> shared-fingerprint pairs.

    materialize (default): persist the fingerprint table — it feeds the
    df-cap sizing plus both join sides, and would otherwise re-run the
    kernel per consumer. Lifecycle follows the house detector contract
    (minhash_pairs_fused): the cache is MEMORY_AND_DISK and evicts under
    pressure; a long-lived driver issuing many runs should either pass
    materialize=False with its own checkpointed fingerprint table
    (winnow_pairs_from_fingerprints) or unpersist via
    result.sparkSession.catalog.clearCache() between runs.
    """
    fps = winnow_fingerprints(docs, id_col, text_col, k, w)
    if materialize:
        fps = fps.persist()
    return winnow_pairs_from_fingerprints(fps, id_col, min_shared, max_df)
