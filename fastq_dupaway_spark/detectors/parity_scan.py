"""Sorted-adjacency parity scan — distributed reproduction of the
reference's sequence-based dedup pass.

Reference analog: external sort by sequence then a single forward scan with
a stateful comparator (/root/reference/src/external_sort.hpp:88-207 sort,
/root/reference/src/seq_dup_remover.hpp:54-109 SE scan, :131-218 PE scan,
comparators /root/reference/src/comparator.cpp:45-91). Clusters are *runs
in sort order* (non-transitive for hamming — SURVEY.md §2.6), which LSH +
connected components deliberately does NOT reproduce; this mode exists to
score dup-pair recall against reference semantics and to pass the golden
parity fixtures.

Distributed design (SURVEY.md §4 custom-work item 3):

1. global sort: `repartitionByRange(sort_key).sortWithinPartitions(...)` —
   Spark's range exchange replaces the reference's bounded-memory external
   merge sort; Tungsten spills automatically.
2. per-partition sequential scan in `mapInPandas` (Arrow batches, one
   Python pass per partition — not per-row).
3. boundary stitching: each partition exports a small head prefix plus its
   outgoing reference record; the driver replays partition heads in range
   order with the true incoming reference (a single O(partitions * cap)
   sequential pass over tiny data) and broadcasts the corrections back.

The scan state entering a partition is one record (the comparator
reference), so the only rows whose verdict can change are a head run; the
replay realigns with the local scan at the first position where both agree
on the kept reference. A cascade longer than `head_cap` raises — at that
point the data is one giant duplicate run and the parity mode is the wrong
tool (use the transitive detectors).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..oracle import conv_dup

#: unit separator — sorts below all printable chars, joins turn texts into
#: the composite (turn0, turn1, ...) sort key (paired composite order,
#: /root/reference/src/paired_external_sort.hpp:14-34). The composite key
#: equals tuple-of-texts order ONLY for text free of C0 control chars —
#: the invariant the P9 quarantine stage (canonicalize.validate_transcripts)
#: enforces at pipeline ingest; run it first on untrusted input.
_US = "\x1f"

_SCAN_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType()),
        T.StructField("pos", T.LongType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("local_survivor", T.BooleanType()),
        T.StructField("local_head", T.StringType()),
        # exported rows carry the composite sort key (texts joined on \x1f)
        # instead of the texts array — split(_US) reconstructs it exactly
        T.StructField("exported_key", T.StringType()),
        T.StructField("in_head", T.BooleanType()),
        T.StructField("is_last_survivor", T.BooleanType()),
        T.StructField("is_last_row", T.BooleanType()),
        T.StructField("n_rows", T.LongType()),
    ]
)


@dataclass
class _PartSummary:
    part_id: int
    n_rows: int
    # ordered exported head rows: (pos, conv_id, texts, local_survivor, local_head)
    head: list[tuple[int, str, list[str], bool, str]]
    last_survivor: tuple[str, list[str]] | None  # (conv_id, texts)
    last_row: tuple[str, list[str], str] | None  # (conv_id, texts, local_head)


def parity_clusters(
    conv_texts: DataFrame,
    mode: str,
    d: int = 2,
    num_partitions: int | None = None,
    head_cap: int = 4096,
    head_survivors: int = 8,
) -> DataFrame:
    """(conv_id, rep_conv_id) under reference run semantics.

    conv_texts: (conv_id, texts array<string>) from
    canonicalize.conversation_texts. mode: 'tight' | 'loose' | 'hamming'.
    """
    if mode not in ("tight", "loose", "hamming"):
        raise ValueError(
            f"unknown parity mode {mode!r}; expected tight|loose|hamming"
        )
    spark = conv_texts.sparkSession
    # the composite sort key IS the conversation (texts joined on \x1f and
    # reconstructible by split), so ONLY (conv_id, sort_key) enters the
    # range exchange — round 1 shipped texts + key, 2x conversation bytes
    keyed = conv_texts.select(
        "conv_id", F.concat_ws(_US, F.col("texts")).alias("sort_key")
    )
    if num_partitions:
        keyed = keyed.repartitionByRange(num_partitions, "sort_key", "conv_id")
    else:
        keyed = keyed.repartitionByRange("sort_key", "conv_id")
    keyed = keyed.sortWithinPartitions("sort_key", "conv_id")

    cap = head_cap
    hs = head_survivors

    def scan_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """Streaming comparator scan: one Arrow batch resident at a time
        (round 1 accumulated the whole partition in Python — the memory
        hazard the round-1 verdict flagged). Regular rows carry decisions;
        two trailer rows (pos -1 / -2) carry the partition summary the
        driver-side boundary replay needs.

        Export rule == round 1's export_limit: a row is exported while
        fewer than `head_survivors` survivors have been seen and pos < cap
        (the replay realigns at a survivor both scans keep — almost always
        the first; cap guards giant duplicate runs).
        """
        from pyspark import TaskContext

        part_id = TaskContext.get().partitionId()
        ref: list[str] | None = None
        head_id: str | None = None
        pos = 0
        surv_seen = 0
        last_surv: tuple[str, str] | None = None  # (cid, key)
        last_row: tuple[str, str, str] | None = None  # (cid, key, local_head)
        for pdf in batches:
            out = {
                "part_id": [], "pos": [], "conv_id": [], "local_survivor": [],
                "local_head": [], "exported_key": [], "in_head": [],
                "is_last_survivor": [], "is_last_row": [], "n_rows": [],
            }
            for cid, key in zip(pdf["conv_id"], pdf["sort_key"]):
                texts = key.split(_US)
                if ref is not None and conv_dup(ref, texts, mode, d):
                    surv, head = False, head_id
                    if mode == "loose" and all(
                        len(c) >= len(r) for r, c in zip(ref, texts)
                    ):
                        ref = texts
                else:
                    surv, head = True, cid
                    ref, head_id = texts, cid
                in_head = surv_seen < hs and pos < cap
                if surv:
                    surv_seen += 1
                    last_surv = (cid, key)
                last_row = (cid, key, head)
                out["part_id"].append(part_id)
                out["pos"].append(pos)
                out["conv_id"].append(cid)
                out["local_survivor"].append(surv)
                out["local_head"].append(head)
                out["exported_key"].append(key if in_head else None)
                out["in_head"].append(in_head)
                out["is_last_survivor"].append(False)
                out["is_last_row"].append(False)
                out["n_rows"].append(0)
                pos += 1
            yield pd.DataFrame(out)
        if pos:
            yield pd.DataFrame(
                {
                    "part_id": [part_id, part_id],
                    "pos": [-1, -2],
                    "conv_id": [last_surv[0], last_row[0]],
                    "local_survivor": [True, False],
                    "local_head": [last_surv[0], last_row[2]],
                    "exported_key": [last_surv[1], last_row[1]],
                    "in_head": [False, False],
                    "is_last_survivor": [True, False],
                    "is_last_row": [False, True],
                    "n_rows": [pos, pos],
                }
            )

    # persist, not localCheckpoint: the exported-heads collect below is
    # the FIRST action and populates the cache in passing (the
    # materialize_and_size pattern), so the scan runs exactly once in ONE
    # job instead of the former eager-checkpoint job + collect job — one
    # driver barrier saved per parity call; lineage is kept, so an
    # evicted block recomputes its partition instead of failing the job.
    scanned = keyed.mapInPandas(scan_partition, _SCAN_SCHEMA).persist()

    # --- driver-side boundary replay over the tiny exported heads -------
    exported = (
        scanned.where(F.col("exported_key").isNotNull())
        .select(
            "part_id", "pos", "conv_id", "local_survivor", "local_head",
            "exported_key", "in_head", "is_last_survivor", "is_last_row",
            "n_rows",
        )
        .collect()
    )
    parts: dict[int, _PartSummary] = {}
    for r in exported:
        s = parts.setdefault(
            r["part_id"], _PartSummary(r["part_id"], 0, [], None, None)
        )
        texts = r["exported_key"].split(_US)
        if r["in_head"]:
            s.head.append(
                (r["pos"], r["conv_id"], texts,
                 r["local_survivor"], r["local_head"])
            )
        if r["is_last_survivor"]:
            s.last_survivor = (r["conv_id"], texts)
        if r["is_last_row"]:
            s.last_row = (r["conv_id"], texts, r["local_head"])
            s.n_rows = r["n_rows"]

    # Replay invariants (hamming: ref = last kept survivor; loose: ref =
    # previous record — see SURVEY.md §2.6):
    # - replay and local scans realign at the first position where BOTH
    #   keep the row as a survivor: both states become (texts_i, cid_i);
    # - a local scan with no incoming ref always keeps row 0, so every
    #   partition has a local last survivor;
    # - if the replay demotes every local survivor it sees, it either
    #   consumes the whole partition (state chains through) or overruns
    #   head_cap (error).
    corrections: dict[str, tuple[bool, str]] = {}  # conv_id -> (survivor, head)
    ref: list[str] | None = None  # incoming comparator reference
    head_id: str | None = None
    for pid in sorted(parts):
        s = parts[pid]
        s.head.sort(key=lambda t: t[0])
        whole_partition_replayed = False
        if ref is not None:
            cur_ref, cur_head = ref, head_id
            realigned = False
            for pos, cid, texts, lsurv, lhead in s.head:
                if conv_dup(cur_ref, texts, mode, d):
                    corrections[cid] = (False, cur_head)
                    if mode == "loose" and all(
                        len(c) >= len(r) for r, c in zip(cur_ref, texts)
                    ):
                        cur_ref = texts
                elif lsurv:
                    realigned = True  # both scans keep cid: states merge
                    break
                else:
                    corrections[cid] = (True, cid)
                    cur_ref, cur_head = texts, cid
            if not realigned:
                if len(s.head) == s.n_rows:
                    ref, head_id = cur_ref, cur_head
                    whole_partition_replayed = True
                else:
                    raise RuntimeError(
                        f"parity boundary cascade exceeded head_cap={cap} "
                        f"in partition {pid}; raise head_cap or use a "
                        "transitive detector"
                    )
        if whole_partition_replayed:
            continue
        # outgoing state for the next partition (local decisions stand from
        # the realignment point on, so the partition's last survivor / last
        # row is authoritative)
        if mode == "loose":
            cid, texts, lhead = s.last_row
            eff_head = corrections.get(cid, (None, lhead))[1]
            ref, head_id = texts, eff_head
        else:
            cid, texts = s.last_survivor
            ref, head_id = texts, cid

    rows = scanned.where(F.col("pos") >= 0)  # drop partition-summary trailers
    if corrections:
        corr_df = spark.createDataFrame(
            [(cid, sv, hd) for cid, (sv, hd) in corrections.items()],
            "conv_id string, survivor boolean, head string",
        )
        fixed = (
            rows.join(F.broadcast(corr_df), "conv_id", "left")
            .select(
                "conv_id",
                F.coalesce(F.col("head"), F.col("local_head")).alias(
                    "rep_conv_id"
                ),
            )
        )
    else:
        fixed = rows.select(
            "conv_id", F.col("local_head").alias("rep_conv_id")
        )
    return fixed


def parity_survivors(
    transcripts: DataFrame, clusters: DataFrame
) -> DataFrame:
    """Transcript rows of surviving representatives, text verbatim."""
    reps = clusters.where(F.col("conv_id") == F.col("rep_conv_id")).select(
        "conv_id"
    )
    return transcripts.join(reps, "conv_id", "left_semi")
