"""Exact-duplicate detector.

Reference analog: tight comparator + fast/hash mode
(/root/reference/src/comparator.cpp:45-58,
/root/reference/src/hash_dup_remover.hpp:105-148 single-end,
:194-255 paired) — dup <=> every aligned turn byte-equal, first occurrence
survives. The reference streams through an unordered_set; the distributed
re-expression is two hash shuffles:

  1. groupBy(conv_id)   -> conversation signature  (canonicalize)
  2. window by conv_sig -> representative election (min conv_id,
                           the deterministic stand-in for the reference's
                           unspecified tie-break — SURVEY.md §7.3.2)

Both keys are high-entropy digests: no skew, map-side partial aggregation
applies, and no join is needed for rep election (single window pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..canonicalize import conversation_signatures


def exact_clusters(transcripts: DataFrame) -> DataFrame:
    """(conv_id, rep_conv_id): every conversation mapped to its exact-dup
    cluster representative (rep == conv_id for survivors/singletons)."""
    sigs = conversation_signatures(transcripts)
    w = Window.partitionBy("conv_sig")
    return sigs.select(
        "conv_id", F.min("conv_id").over(w).alias("rep_conv_id")
    )


def exact_survivor_ids(transcripts: DataFrame) -> DataFrame:
    """(conv_id) of surviving representatives."""
    return (
        exact_clusters(transcripts)
        .where(F.col("conv_id") == F.col("rep_conv_id"))
        .select("conv_id")
    )


def exact_survivors(transcripts: DataFrame) -> DataFrame:
    """Full transcript rows of surviving conversations, text verbatim
    (per-row invariant: survivors' turns byte-identical to input)."""
    reps = exact_survivor_ids(transcripts)
    return transcripts.join(reps, "conv_id", "left_semi")
