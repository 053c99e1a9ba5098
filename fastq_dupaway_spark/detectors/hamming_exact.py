"""Exact Hamming-pair detector via pigeonhole chunk blocking.

Reference analog: `--compare-seq tail-hamming --distance d`
(/root/reference/src/comparator.cpp:76-91) — but emitting the TRANSITIVE
pair relation (every pair of conversations whose aligned turns are all
within Hamming d), not the reference's sort-order runs (those live in
parity_scan). Unlike the SimHash detector this one has recall 1.0 by
construction, so it is oracle-checkable:

pigeonhole: if hamming(a, b) <= d then at least one of d+1 contiguous
character chunks of a equals the matching chunk of b. Blocking key =
(n_turns, len(turn0), chunk_id, chunk_text) — an equi-join Catalyst
shuffles on a short string key; AQE splits skewed chunks. Verification is
exact per-turn Hamming, JVM-side (zip_with/aggregate — no Python).

At 10^12-turn scale the chunk key keeps candidate sets small because a
1/(d+1) slice of a turn is long enough to be nearly unique; pathological
blocks (boilerplate) are capped and surfaced, as in the other detectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .simhash import verify_hamming_pairs


def hamming_candidates(
    transcripts: DataFrame, d: int = 2, max_bucket: int = 4000
) -> DataFrame:
    """(conv_a, conv_b) candidates: same n_turns, same turn-0 length, and
    at least one of the d+1 turn-0 chunks equal."""
    n_chunks = d + 1
    turn0 = transcripts.where(F.col("turn_idx") == 0).select("conv_id", "text")
    n_turns = transcripts.groupBy("conv_id").agg(F.count("*").alias("n_turns"))
    base = turn0.join(n_turns, "conv_id").select(
        "conv_id", "n_turns", F.length("text").alias("len0"), "text"
    )
    # chunk i covers [floor(i*len/n), floor((i+1)*len/n)) — same arithmetic
    # as the oracle SQL; zero-width chunks (len0 < n_chunks) are dropped,
    # leaving whole-text blocking via the surviving chunks.
    chunks = (
        base.select(
            "conv_id",
            "n_turns",
            "len0",
            "text",
            F.explode(F.sequence(F.lit(0), F.lit(n_chunks - 1))).alias(
                "chunk_id"
            ),
        )
        .withColumn(
            "c_start",
            F.floor(F.col("chunk_id") * F.col("len0") / n_chunks).cast("int"),
        )
        .withColumn(
            "c_end",
            F.floor((F.col("chunk_id") + 1) * F.col("len0") / n_chunks).cast(
                "int"
            ),
        )
        .where(F.col("c_end") > F.col("c_start"))
        .select(
            "conv_id",
            "n_turns",
            "len0",
            "chunk_id",
            F.expr("substr(text, c_start + 1, c_end - c_start)").alias(
                "chunk_text"
            ),
        )
    )
    sized = chunks.withColumn(
        "bucket_n",
        F.count("*").over(
            Window.partitionBy("n_turns", "len0", "chunk_id", "chunk_text")
        ),
    )
    capped = sized.where(F.col("bucket_n") <= max_bucket).drop("bucket_n")
    a, b = capped.alias("a"), capped.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.n_turns") == F.col("b.n_turns"),
                F.col("a.len0") == F.col("b.len0"),
                F.col("a.chunk_id") == F.col("b.chunk_id"),
                F.col("a.chunk_text") == F.col("b.chunk_text"),
                F.col("a.conv_id") < F.col("b.conv_id"),
            ],
        )
        .select(
            F.col("a.conv_id").alias("conv_a"), F.col("b.conv_id").alias("conv_b")
        )
        .distinct()
    )


def hamming_pairs_exact(
    transcripts: DataFrame,
    conv_texts: DataFrame,
    d: int = 2,
    max_bucket: int = 4000,
) -> DataFrame:
    """Recall-1.0 Hamming pair relation: chunk blocking + exact verify."""
    cands = hamming_candidates(transcripts, d, max_bucket)
    return verify_hamming_pairs(conv_texts, cands, d)
