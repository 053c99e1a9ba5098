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
#: /root/reference/src/paired_external_sort.hpp:14-34).
_US = "\x1f"

_SCAN_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType()),
        T.StructField("pos", T.LongType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("local_survivor", T.BooleanType()),
        T.StructField("local_head", T.StringType()),
        T.StructField("exported_texts", T.ArrayType(T.StringType())),
        T.StructField("in_head", T.BooleanType()),
        T.StructField("is_last_survivor", T.BooleanType()),
        T.StructField("is_last_row", T.BooleanType()),
        T.StructField("n_rows", T.LongType()),
    ]
)


def _scan(
    rows: list[tuple[str, list[str]]],
    mode: str,
    d: int,
    incoming_ref: list[str] | None = None,
    incoming_head: str | None = None,
) -> list[tuple[str, bool, str]]:
    """Sequential reference scan over (conv_id, texts) rows already in sort
    order. Returns [(conv_id, survivor, head_conv_id)]. With an incoming
    reference the head run is judged against it first (boundary replay)."""
    out: list[tuple[str, bool, str]] = []
    ref, head = incoming_ref, incoming_head
    for conv_id, texts in rows:
        if ref is not None and conv_dup(ref, texts, mode, d):
            out.append((conv_id, False, head))
            if mode == "loose" and all(
                len(c) >= len(r) for r, c in zip(ref, texts)
            ):
                ref = texts
        else:
            out.append((conv_id, True, conv_id))
            ref, head = texts, conv_id
    return out


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
    keyed = conv_texts.withColumn(
        "sort_key", F.concat_ws(_US, F.col("texts"))
    )
    if num_partitions:
        keyed = keyed.repartitionByRange(num_partitions, "sort_key", "conv_id")
    else:
        keyed = keyed.repartitionByRange("sort_key", "conv_id")
    keyed = keyed.sortWithinPartitions("sort_key", "conv_id")

    cap = head_cap

    def scan_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        part_id = TaskContext.get().partitionId()
        rows: list[tuple[str, list[str]]] = []
        for pdf in batches:
            for cid, texts in zip(pdf["conv_id"], pdf["texts"]):
                rows.append((cid, list(texts)))
        if not rows:
            return
        decisions = _scan(rows, mode, d)
        n = len(rows)
        surv_positions = [i for i, dec in enumerate(decisions) if dec[1]]
        last_surv_pos = surv_positions[-1] if surv_positions else None
        # export budget: replay realigns at a local survivor the replay
        # also keeps — almost always the 1st; export up to the
        # `head_survivors`-th so the driver ships a handful of rows per
        # partition, not the whole head (cap guards giant dup runs).
        if len(surv_positions) >= head_survivors:
            export_limit = min(surv_positions[head_survivors - 1], cap - 1)
        else:
            export_limit = min(n - 1, cap - 1)
        out = {
            "part_id": [],
            "pos": [],
            "conv_id": [],
            "local_survivor": [],
            "local_head": [],
            "exported_texts": [],
            "in_head": [],
            "is_last_survivor": [],
            "is_last_row": [],
            "n_rows": [],
        }
        for i, ((cid, texts), (_, surv, head)) in enumerate(zip(rows, decisions)):
            in_head = i <= export_limit
            export = in_head or i == n - 1 or i == last_surv_pos
            out["part_id"].append(part_id)
            out["pos"].append(i)
            out["conv_id"].append(cid)
            out["local_survivor"].append(surv)
            out["local_head"].append(head)
            out["exported_texts"].append(texts if export else None)
            out["in_head"].append(in_head)
            out["is_last_survivor"].append(i == last_surv_pos)
            out["is_last_row"].append(i == n - 1)
            out["n_rows"].append(n)
        yield pd.DataFrame(out)

    scanned = keyed.mapInPandas(scan_partition, _SCAN_SCHEMA)
    scanned = scanned.localCheckpoint()

    # --- driver-side boundary replay over the tiny exported heads -------
    exported = (
        scanned.where(F.col("exported_texts").isNotNull())
        .select(
            "part_id", "pos", "conv_id", "local_survivor", "local_head",
            "exported_texts", "in_head", "is_last_survivor", "is_last_row",
            "n_rows",
        )
        .collect()
    )
    parts: dict[int, _PartSummary] = {}
    for r in exported:
        s = parts.setdefault(
            r["part_id"], _PartSummary(r["part_id"], r["n_rows"], [], None, None)
        )
        if r["in_head"]:
            s.head.append(
                (r["pos"], r["conv_id"], list(r["exported_texts"]),
                 r["local_survivor"], r["local_head"])
            )
        if r["is_last_survivor"]:
            s.last_survivor = (r["conv_id"], list(r["exported_texts"]))
        if r["is_last_row"]:
            s.last_row = (r["conv_id"], list(r["exported_texts"]), r["local_head"])

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

    if corrections:
        corr_df = spark.createDataFrame(
            [(cid, sv, hd) for cid, (sv, hd) in corrections.items()],
            "conv_id string, survivor boolean, head string",
        )
        fixed = (
            scanned.join(F.broadcast(corr_df), "conv_id", "left")
            .select(
                "conv_id",
                F.coalesce(F.col("head"), F.col("local_head")).alias(
                    "rep_conv_id"
                ),
            )
        )
    else:
        fixed = scanned.select(
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
