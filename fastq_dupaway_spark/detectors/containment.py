"""Containment detector — conversation-in-conversation substring matches.

Reference analog: `--compare-seq loose` (prefix containment,
/root/reference/src/comparator.cpp:60-74) generalized per the north star
to substring containment via a distributed suffix pass:

    conv A is contained in conv B iff A's canonical text occurs in B's
    canonical text starting at one of B's TURN BOUNDARIES (turn-aligned
    sub-conversation). Boundary 0 reproduces the reference's prefix rule.

Suffix granularity is turn boundaries, not characters: a conversation of
k turns contributes k suffixes, so the suffix table is exactly |turns|
rows — the scalable discretization of a generalized suffix array (the
classic char-level SA would be |total_bytes| rows).

Candidate generation is a prefix-blocked equi-join, not a sort-adjacency
scan, so it parallelizes with no sequential stitching:

  suffix side:  for each turn-boundary suffix S, emit (k, S[:k]) for
                k in 1..PREFIX_LEN  (PREFIX_LEN rows per suffix)
  needle side:  each conversation's full text P emits ONE row
                (min(len(P), PREFIX_LEN), P[:...])
  join on (k, prefix) -> verify startswith(S, P) exactly, JVM-side.

Any P with len <= PREFIX_LEN matches its full text in the block key, so
recall is 1.0; longer needles share their 1..PREFIX_LEN-char block with
few suffixes (prefix entropy), AQE splits the skewed ones, and hot blocks
are capped + surfaced like every other detector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: block key width: join fan-out is |turns| * PREFIX_LEN rows
PREFIX_LEN = 16

#: separator between turns inside canonical conversation text; \x1f sorts
#: below printable chars and cannot appear in transcript tokens
_US = "\x1f"


def _conv_text(conv_texts: DataFrame) -> DataFrame:
    return conv_texts.select(
        "conv_id", F.concat_ws(_US, "texts").alias("full_text")
    )


def turn_suffixes(conv_texts: DataFrame) -> DataFrame:
    """(conv_id, suffix): canonical text from each turn boundary on."""
    return conv_texts.select(
        "conv_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("texts")),
                lambda k: F.concat_ws(
                    _US, F.slice("texts", k, F.size("texts") - k + 1)
                ),
            )
        ).alias("suffix"),
    )


def containment_pairs(
    conv_texts: DataFrame, max_bucket: int = 4000
) -> DataFrame:
    """(conv_a, conv_b): conv_a's text occurs at a turn boundary of conv_b
    (conv_a != conv_b; equal-text conversations pair both ways reduced to
    a < b). Exact — blocking is lossless, verification is startswith."""
    needles = _conv_text(conv_texts).select(
        "conv_id",
        "full_text",
        F.substring("full_text", 1, PREFIX_LEN).alias("prefix"),
        F.least(F.length("full_text"), F.lit(PREFIX_LEN)).alias("k"),
    )
    suffixes = turn_suffixes(conv_texts)
    sfx_blocks = suffixes.select(
        F.col("conv_id").alias("container_id"),
        "suffix",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1), F.least(F.length("suffix"), F.lit(PREFIX_LEN))
                ),
                lambda k: F.struct(
                    k.alias("k"), F.substring("suffix", 1, k).alias("prefix")
                ),
            )
        ).alias("b"),
    ).select("container_id", "suffix", "b.k", "b.prefix")

    sized = sfx_blocks.withColumn(
        "bucket_n", F.count("*").over(Window.partitionBy("k", "prefix"))
    )
    capped = sized.where(F.col("bucket_n") <= max_bucket).drop("bucket_n")

    return (
        needles.join(capped, ["k", "prefix"])
        .where(F.col("conv_id") != F.col("container_id"))
        .where(F.col("suffix").startswith(F.col("full_text")))
        .select(
            F.least("conv_id", "container_id").alias("conv_a"),
            F.greatest("conv_id", "container_id").alias("conv_b"),
        )
        .distinct()
    )


def prefix_containment_pairs(
    conv_texts: DataFrame, max_bucket: int = 4000
) -> DataFrame:
    """Reference-loose relation only (needle is a PREFIX of the container,
    boundary 0): the transitive pair set matching
    /root/reference/src/comparator.cpp:60-63 semantics."""
    first = conv_texts.select(
        "conv_id", F.concat_ws(_US, "texts").alias("suffix")
    )
    needles = _conv_text(conv_texts).select(
        "conv_id",
        "full_text",
        F.substring("full_text", 1, PREFIX_LEN).alias("prefix"),
        F.least(F.length("full_text"), F.lit(PREFIX_LEN)).alias("k"),
    )
    sfx_blocks = first.select(
        F.col("conv_id").alias("container_id"),
        "suffix",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1), F.least(F.length("suffix"), F.lit(PREFIX_LEN))
                ),
                lambda k: F.struct(
                    k.alias("k"), F.substring("suffix", 1, k).alias("prefix")
                ),
            )
        ).alias("b"),
    ).select("container_id", "suffix", "b.k", "b.prefix")
    sized = sfx_blocks.withColumn(
        "bucket_n", F.count("*").over(Window.partitionBy("k", "prefix"))
    )
    capped = sized.where(F.col("bucket_n") <= max_bucket).drop("bucket_n")
    return (
        needles.join(capped, ["k", "prefix"])
        .where(F.col("conv_id") != F.col("container_id"))
        .where(F.col("suffix").startswith(F.col("full_text")))
        .select(
            F.least("conv_id", "container_id").alias("conv_a"),
            F.greatest("conv_id", "container_id").alias("conv_b"),
        )
        .distinct()
    )
