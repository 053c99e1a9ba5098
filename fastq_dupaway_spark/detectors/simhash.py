"""SimHash detector — structural near-dups via bit-sliced Hamming
neighborhoods over conversation-level 64-bit SimHash.

Reference analog: `--compare-seq tail-hamming --distance d`
(/root/reference/src/comparator.cpp:76-91) re-imagined for text at scale.
The reference's predicate (per-turn char Hamming <= d) is served exactly
and cheaply by detectors/hamming_exact (chunk-blocking, recall 1.0); this
detector is the classic web-scale SimHash pass (Charikar / Manku et al.):

1. one 64-bit SimHash per CONVERSATION over the token multiset of all its
   turns (vectorized pandas UDF — flattened numpy, no per-row loops).
   Conversation-level granularity matters: token-vote margins grow with
   document length, so small edits flip few bits; per-turn simhash on
   10-token turns has razor-thin margins and every band collides.
2. bit-sliced banding: n_bands = bit_threshold+1 contiguous slices;
   Hamming(h1,h2) <= k implies some slice equal (pigeonhole) — recall 1.0
   for the simhash-distance relation. Default k=3 -> 4 bands x 16 bits,
   selective at 10^12 scale.
3. band self-join (hot buckets capped + AQE skew split) -> candidates.
4. exact verify JVM-side: bit_count(xor(sim_a, sim_b)) <= k.

An optional second verify (verify_hamming_pairs) re-checks candidates
against the reference's per-turn char-Hamming predicate when parity with
fastq-dupaway semantics is wanted.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

SIMHASH_BITS = 64


def hash64(token: str) -> int:
    """Deterministic 64-bit token hash (FNV-1a), stable across workers —
    Python's builtin hash() is salted per-process and unusable here."""
    h = 0xCBF29CE484222325
    for byte in token.encode("utf-8"):
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


#: per-worker token-hash memo — transcript corpora have heavy-tailed token
#: reuse, so the pure-Python FNV runs once per distinct token per worker.
_token_hashes: dict[str, int] = {}


def _simhash_flat(tok_lists: list[list[str]]) -> np.ndarray:
    """SimHash for every token list in one flattened numpy pass
    (np.add.reduceat over token segments) — no per-row inner loops."""
    cache = _token_hashes
    for tl in tok_lists:
        for t in tl:
            if t not in cache:
                cache[t] = hash64(t)
    lens = np.fromiter(
        (len(tl) for tl in tok_lists), dtype=np.int64, count=len(tok_lists)
    )
    out = np.zeros(len(tok_lists), dtype=np.uint64)
    nonempty = np.nonzero(lens > 0)[0]
    if len(nonempty):
        flat = np.fromiter(
            (cache[t] for tl in tok_lists for t in tl),
            dtype=np.uint64,
            count=int(lens.sum()),
        )
        ne_lens = lens[nonempty]
        offsets = np.zeros(len(nonempty), dtype=np.int64)
        np.cumsum(ne_lens[:-1], out=offsets[1:])
        # bit-plane loop: one O(total) pass per bit keeps peak memory at
        # O(total) instead of a (total x 64) matrix per batch
        acc = np.zeros(len(nonempty), dtype=np.uint64)
        for b in range(SIMHASH_BITS):
            plane = ((flat >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
            sums = np.add.reduceat(plane, offsets)
            acc |= ((2 * sums - ne_lens) > 0).astype(np.uint64) << np.uint64(b)
        out[nonempty] = acc
    return out.astype(np.int64)


@F.pandas_udf(T.LongType())
def conv_simhash_udf(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """texts: array<string> column (conversation turns, in order) ->
    64-bit simhash over the concatenated token stream."""
    for batch in texts:
        tok_lists = [
            [t for turn in turns for t in turn.split(" ")] if turns is not None else []
            for turns in batch
        ]
        yield pd.Series(_simhash_flat(tok_lists))


def conversation_simhashes(conv_texts: DataFrame) -> DataFrame:
    """(conv_id, simhash). At extreme scale the same signature can be
    built without collecting turn arrays: per-turn 64-wide vote vectors
    summed in a groupBy (simhash votes are associative); this direct form
    keeps one Arrow pass and is what the bench exercises."""
    return conv_texts.select(
        "conv_id", conv_simhash_udf(F.col("texts")).alias("simhash")
    )


def candidate_pairs(
    conv_sims: DataFrame,
    bit_threshold: int = 3,
    max_bucket: int = 512,
) -> DataFrame:
    """(conv_a, conv_b, sim_a, sim_b) candidates via bit-sliced banding.

    n_bands = bit_threshold+1 slices of 64/(k+1) bits: any pair within k
    bits shares a slice (pigeonhole). Oversized buckets (boilerplate
    conversations hashing identically) are quarantined, not exploded —
    the hot-key defense of SURVEY.md §4; AQE skew-join handles the rest.
    """
    n_bands = bit_threshold + 1
    width = SIMHASH_BITS // n_bands
    bands = conv_sims.select(
        "conv_id",
        "simhash",
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
    ).select("conv_id", "simhash", "band.band_id", "band.band_val")

    sized = bands.withColumn(
        "bucket_n",
        F.count("*").over(Window.partitionBy("band_id", "band_val")),
    )
    capped = sized.where(F.col("bucket_n") <= max_bucket).drop("bucket_n")
    a, b = capped.alias("a"), capped.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.conv_id") < F.col("b.conv_id"),
            ],
        )
        .select(
            F.col("a.conv_id").alias("conv_a"),
            F.col("b.conv_id").alias("conv_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )


def simhash_pairs(
    conv_texts: DataFrame,
    bit_threshold: int = 3,
    max_bucket: int = 512,
) -> DataFrame:
    """(conv_a, conv_b) with simhash bit distance <= bit_threshold.
    Recall 1.0 for the bit-distance relation (pigeonhole banding + exact
    bit_count verify, both deterministic)."""
    sims = conversation_simhashes(conv_texts)
    cands = candidate_pairs(sims, bit_threshold, max_bucket)
    return (
        cands.where(
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
            <= bit_threshold
        )
        .select("conv_a", "conv_b")
    )


def _hamming_ok_udf(d: int):
    """Arrow-batched verifier: every aligned turn equal-length and char
    Hamming <= d. numpy over UTF-32 views — exact CHARACTER distance
    (matching the oracle) at memcmp speed; the earlier expression-based
    split(x,'') verify dominated whole stages in UTF8String.split."""

    @F.pandas_udf(T.BooleanType())
    def ok(texts_a: pd.Series, texts_b: pd.Series) -> pd.Series:
        out = np.zeros(len(texts_a), dtype=bool)
        for i, (ta, tb) in enumerate(zip(texts_a, texts_b)):
            if ta is None or tb is None or len(ta) != len(tb):
                continue
            good = True
            for x, y in zip(ta, tb):
                if len(x) != len(y):
                    good = False
                    break
                if x != y:
                    ax = np.frombuffer(x.encode("utf-32-le"), dtype=np.uint32)
                    ay = np.frombuffer(y.encode("utf-32-le"), dtype=np.uint32)
                    if int(np.count_nonzero(ax != ay)) > d:
                        good = False
                        break
            out[i] = good
        return pd.Series(out)

    return ok


def verify_hamming_pairs(
    conv_texts: DataFrame, candidates: DataFrame, d: int
) -> DataFrame:
    """Exact per-turn character-Hamming verification.

    dup <=> same n_turns AND every aligned turn has equal length and
    Hamming <= d (reference comparator semantics, all-turns conjunction
    /root/reference/src/comparator.cpp:84-91). Used by hamming_exact and
    as the optional reference-parity re-verify after simhash banding.
    """
    a = conv_texts.select(
        F.col("conv_id").alias("conv_a"), F.col("texts").alias("texts_a")
    )
    b = conv_texts.select(
        F.col("conv_id").alias("conv_b"), F.col("texts").alias("texts_b")
    )
    joined = candidates.select("conv_a", "conv_b").join(a, "conv_a").join(b, "conv_b")
    return (
        joined.where(F.size("texts_a") == F.size("texts_b"))
        .where(_hamming_ok_udf(d)(F.col("texts_a"), F.col("texts_b")))
        .select("conv_a", "conv_b")
    )
