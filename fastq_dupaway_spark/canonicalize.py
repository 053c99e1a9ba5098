"""Canonicalization: stable turn ordering + conversation signatures.

Reference analog: the record view + packed-hash projection
(/root/reference/src/fastqview.cpp:89-119 parse,
/root/reference/src/seq_utils.cpp:23-49 base-5 packing,
/root/reference/src/hash_dup_remover.hpp:43-68 setRecordHash). The packing
existed to compare sequences via compact 64-bit words; Spark's equivalent is
a cryptographic digest column computed JVM-side (sha2 — collision-safe at
10^12-turn scale, where 64-bit xxhash64 WOULD birthday-collide), grouped and
shuffled as a fixed-width binary key instead of full text.

All expressions are built-in column functions — whole-stage codegen, no
Python in this path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: separator between per-turn digests inside a conversation signature;
#: cannot appear in hex sha output.
_SEP = "|"

#: C0 control chars that CANNOT be normalized away — corrupt in transcript
#: text and unsafe for the engine's composite keys (\x1f joins turn texts
#: in sort/containment keys). \t/\n/\r are NOT here: real transcript text
#: (code blocks, multi-line answers) routinely contains them, so they are
#: normalized to spaces instead of quarantining the conversation.
_CONTROL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"

#: normalized-to-space whitespace: tab, newline, carriage return
_WS_FROM = "\t\n\r"
_WS_TO = "   "


def normalize_whitespace(transcripts: DataFrame) -> DataFrame:
    """Canonicalize \\t/\\n/\\r to single spaces (narrow projection).

    Preserves the composite-key invariant (post-normalization text is free
    of chars below \\x1f except the ones _CONTROL_RE quarantines), keeps
    multi-line answers/code blocks in the pipeline instead of dropping
    them, and makes tokenization treat newlines as token breaks — the
    behavior a whitespace tokenizer owes multi-line text anyway.
    """
    return transcripts.withColumn(
        "text", F.translate(F.col("text"), _WS_FROM, _WS_TO)
    )


def validate_transcripts(transcripts: DataFrame) -> tuple[DataFrame, DataFrame]:
    """P9 canonicalization/quarantine split -> (clean, quarantined).

    Reference analog: the alphabet validator that ABORTS on any
    out-of-alphabet byte (/root/reference/src/seq_utils.cpp:3-21). A
    distributed pipeline must not abort on one dirty row at 10^12-turn
    scale. Text is first canonicalized (\\t/\\n/\\r -> spaces — normal in
    real transcripts, not corruption); rows whose text is NULL or still
    contains non-normalizable control characters are routed to a
    quarantine table with a `reason` on the offending rows. Whole
    CONVERSATIONS are quarantined (one corrupt turn poisons every
    composite key the detectors build from the conversation); innocent
    sibling rows carry reason NULL.

    Both outputs are narrow derivations of the input (a filter-join on the
    small bad-id set — broadcast at any scale where corruption is rare).
    The clean side carries the NORMALIZED text; the quarantine side
    carries the ORIGINAL raw bytes (forensic fidelity: the offending
    \\x00..\\x1f bytes are preserved for inspection, not rewritten).
    Flagging on raw text is equivalent to flagging post-normalization
    because _CONTROL_RE excludes exactly the three chars
    normalize_whitespace rewrites.
    """
    reason = F.when(F.col("text").isNull(), F.lit("null_text")).when(
        F.col("text").rlike(_CONTROL_RE), F.lit("control_chars")
    )
    flagged = transcripts.withColumn("reason", reason)
    bad_ids = (
        flagged.where(F.col("reason").isNotNull()).select("conv_id").distinct()
    )
    clean = normalize_whitespace(
        transcripts.join(bad_ids, "conv_id", "left_anti")
    )
    quarantined = flagged.join(bad_ids, "conv_id", "left_semi")
    return clean, quarantined


def turn_hashes(transcripts: DataFrame) -> DataFrame:
    """Per-turn content digest. Narrow (no shuffle); scan-adjacent so
    Catalyst prunes unused carried columns out of the parquet read."""
    return transcripts.withColumn("turn_hash", F.sha2(F.col("text"), 256))


def conversation_signatures(transcripts: DataFrame) -> DataFrame:
    """(conv_id, conv_sig, n_turns): one row per conversation.

    conv_sig = sha2 over the turn digests in stable (turn_idx) order —
    the k-turn generalization of setRecordPair equality
    (/root/reference/src/hash_dup_remover.cpp:26-33: both hashes AND both
    lengths must match; n_turns is baked into the digest stream so
    differing turn counts can never collide).

    One shuffle, keyed by conv_id (high-entropy key — no skew). On an
    Iceberg table bucketed by conv_id this becomes shuffle-free.

    r6 (guide §2.3, narrower types through the exchange): the per-turn
    digest crosses the shuffle as 32-byte BINARY (unhex'd sha2) instead
    of the 64-char hex string — half the digest bytes per row — and is
    re-hexed (lower(hex(..)) == sha2's hex output exactly) inside the
    post-shuffle aggregation, so `conv_sig` is bit-identical to the r5
    formulation (oracle-pinned by the four exact_* queries). NULL text
    still yields a NULL digest that concat_ws skips, unchanged.
    """
    return (
        transcripts.withColumn(
            "turn_hash_bin", F.unhex(F.sha2(F.col("text"), 256))
        )
        .groupBy("conv_id")
        .agg(
            F.sha2(
                F.concat_ws(
                    _SEP,
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("turn_idx", "turn_hash_bin")
                            )
                        ),
                        lambda s: F.lower(F.hex(s["turn_hash_bin"])),
                    ),
                ),
                256,
            ).alias("conv_sig"),
            F.count("*").alias("n_turns"),
        )
    )


def conversation_texts(transcripts: DataFrame) -> DataFrame:
    """(conv_id, texts: array<string>) with texts in turn order — feeds the
    parity scan and the small-scale detectors' verify stages. Carries full
    text, so only used where the stage genuinely needs payload bytes.

    NULL turn text is coalesced to '' so the array NEVER holds NULL
    elements: the parity scan round-trips texts through a concat_ws
    composite key, and concat_ws silently DROPS null array elements — a
    NULL turn would be compared as if it didn't exist. (The quarantine
    pre-stage already routes null-text conversations out; the coalesce
    makes the invariant hold even when quarantine is disabled or
    conversation_texts is called directly on unvalidated input.)"""
    return transcripts.groupBy("conv_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct("turn_idx", F.coalesce("text", F.lit("")).alias("text"))
                )
            ),
            lambda s: s["text"],
        ).alias("texts")
    )
