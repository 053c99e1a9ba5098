"""Structured Streaming ingestion + online exact dedup.

The reference is strictly batch (SURVEY.md §2.7: no streaming anywhere),
but a transcript pipeline at 10^12-turn scale ingests continuously; this
module provides the streaming front door that feeds the batch detectors:

- `streaming_turn_hashes`: per-turn digests computed on the stream (same
  canonicalize expressions — narrow, watermark-friendly);
- `streaming_exact_dedup`: drop exact duplicate turns online via
  dropDuplicatesWithinWatermark on the content digest — bounded state,
  late data beyond the watermark handled by the nightly batch exact pass
  (the lambda-ish split: stream = cheap online filter, batch = authority);
- `write_transcripts_stream`: append to the checkpointed table the batch
  pipeline reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .canonicalize import turn_hashes


def streaming_turn_hashes(stream: DataFrame) -> DataFrame:
    """Same digest expressions as the batch path (turn_hashes is narrow,
    so it composes with readStream unchanged)."""
    return turn_hashes(stream)


def streaming_exact_dedup(
    stream: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Online exact-dup suppression on (conv_id, turn_idx, text digest).

    dropDuplicatesWithinWatermark keeps state only for the watermark
    horizon — bounded memory at any throughput; duplicates that arrive
    further apart are caught by the batch exact detector, which is the
    source of truth.
    """
    hashed = streaming_turn_hashes(stream)
    return hashed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx", "turn_hash"]
    )


def write_transcripts_stream(
    deduped: DataFrame, path: str, checkpoint: str, trigger_seconds: int = 60
):
    """Append the deduped stream to the parquet/Iceberg transcripts table
    (storage shim mirrors checkpoints.CheckpointStore: swap format for
    Iceberg on a real cluster)."""
    return (
        deduped.drop("turn_hash")
        .writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .outputMode("append")
    )
