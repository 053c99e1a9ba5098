"""Turn re-synchronization (reference `--unordered` mode).

Models corrupted conversation storage: per-turn streams arrive as separate
tables whose conv_id sets/order may disagree. The reference external-sorts
both files by id tag then streams a two-pointer inner merge-join, dropping
ids present in only one file (/root/reference/src/hash_dup_remover.hpp:
160-177 sort, :257-346 merge-join + dedup).

Spark re-expression: the sort + merge-join collapses into one declarative
inner join on conv_id — Catalyst picks sort-merge or broadcast; there is
nothing to hand-schedule. Unmatched-row counters (the reference's
`unmatch_reads`, :342-346) come from df.observe metrics, not extra passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resync_streams(*streams: DataFrame) -> DataFrame:
    """Inner-join k per-turn transcript tables on conv_id into one
    transcripts table containing only conversations present in EVERY
    stream. Each input carries the standard transcript schema; turn_idx
    values must already be distinct across streams (stream i = turn i)."""
    ids = None
    for s in streams:
        cur = s.select("conv_id").distinct()
        ids = cur if ids is None else ids.join(cur, "conv_id", "inner")
    out = None
    for s in streams:
        matched = s.join(ids, "conv_id", "left_semi")
        out = matched if out is None else out.unionByName(matched)
    return out


def unmatched_counts(a: DataFrame, b: DataFrame) -> DataFrame:
    """Diagnostic: per-side count of conv_ids missing from the other side
    (reference verbose counter `unmatch_reads`)."""
    a_ids = a.select("conv_id").distinct()
    b_ids = b.select("conv_id").distinct()
    return (
        a_ids.join(b_ids, "conv_id", "left_anti")
        .select(F.lit("left_only").alias("side"), "conv_id")
        .union(
            b_ids.join(a_ids, "conv_id", "left_anti").select(
                F.lit("right_only").alias("side"), "conv_id"
            )
        )
        .groupBy("side")
        .agg(F.count("*").alias("n"))
    )
