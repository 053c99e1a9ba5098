"""Deterministic test corpora.

Three sources, all seeded / derived — no external data:

1. `FIXTURES`: the 18 reference golden fixtures (test/inputs/*.fa under
   /root/reference) recast as transcript rows per FIXTURES.md — text values
   copied verbatim (they preserve every equality / prefix / Hamming
   relation).
2. `generate_corpus`: the F9 seeded generator — planted exact dups,
   prefix-extensions, <=d Hamming edits, a hot boilerplate turn (LSH skew
   trigger), permuted/deleted alignments. Used for property tests and the
   N vs 4N bench.
3. `build_transcripts` / `TRANSCRIPTS_DUCKDB_SQL`: a transcripts table
   derived from the driver's documents.parquet with planted duplicate
   conversations, expressed identically in Spark DataFrame ops and DuckDB
   SQL so the driver's oracle can verify the whole pipeline end-to-end.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)


def rows_from_convs(convs: list[tuple[str, list[str]]]) -> list[tuple]:
    """FIXTURES.md generation rules: role cycles user/assistant, tool='',
    ts = 2026-01-01 + row_number seconds."""
    rows = []
    n = 0
    for conv_id, turns in convs:
        for idx, text in enumerate(turns):
            rows.append(
                (
                    conv_id,
                    idx,
                    "user" if idx % 2 == 0 else "assistant",
                    text,
                    "",
                    _EPOCH + timedelta(seconds=n),
                )
            )
            n += 1
    return rows


def conv_df(spark: SparkSession, convs: list[tuple[str, list[str]]]) -> DataFrame:
    return spark.createDataFrame(rows_from_convs(convs), TRANSCRIPT_SCHEMA)


# ---------------------------------------------------------------------------
# F1-F8: reference golden fixtures as conversations (FIXTURES.md)
# Texts verbatim from /root/reference/test/inputs/*.fa.
# ---------------------------------------------------------------------------

_F4_TURN0 = [
    "ATGCTAGCTA", "CGTACGTAGC", "TTGACCGTAA", "ATGCTAGCTA", "GGCATACGTT",
    "CGTACGTAGC", "AACGTTGGCA", "TTGACCGTAA", "TTAACCGGTT", "GGCATACGTT",
]
_F6_TURN1 = [
    "TAGCTAGCAT", "GCTACGTACG", "TTACGGTCAA", "TAGCTAGCAA", "AACGTATGCC",
    "GCTACGTACG", "TGCCAACGTT", "TTACGGTCAA", "AACCGGTTAA", "AACGTATGCC",
]
_IDS10 = [f"{i:04d}" for i in range(1, 11)]

FIXTURES: dict[str, list[tuple[str, list[str]]]] = {
    "single_tight": [
        ("00001", ["GGATAGA"]),
        ("00002", ["GGATAGA"]),
        ("00003", ["GGATCGA"]),
    ],
    "single_loose": [
        ("00001", ["GGATAGA"]),
        ("00002", ["GGATAGACCT"]),
        ("00003", ["GGATCGA"]),
        ("00004", ["GGATAGACCTG"]),
    ],
    "single_hamming": [
        ("00001", ["GGATAGA"]),
        ("00002", ["GGATAGT"]),
        ("00003", ["GGATATC"]),
        ("00004", ["TGATAGA"]),
    ],
    "single_fast": [(cid, [t]) for cid, t in zip(_IDS10, _F4_TURN0)],
    "paired_tight": [
        ("00001", ["GGATAGA", "TCAGATT"]),
        ("00002", ["GGATAGA", "TCAGATT"]),
        ("00003", ["GGATAGA", "GCAGATT"]),
        ("00004", ["GGATCGA", "TCACCTT"]),
    ],
    "paired_fast": [
        (cid, [t0, t1]) for cid, t0, t1 in zip(_IDS10, _F4_TURN0, _F6_TURN1)
    ],
}

# F7 unordered variants: per-turn streams [(conv_id, text)], arbitrary order.
_T0 = dict(zip(_IDS10, _F4_TURN0))
_T1 = dict(zip(_IDS10, _F6_TURN1))
_SHUF = ["0004", "0007", "0005", "0002", "0003", "0001", "0006", "0010", "0008", "0009"]

UNORDERED_FIXTURES: dict[str, tuple[list[tuple[str, str]], list[tuple[str, str]]]] = {
    "shuffled": (
        [(i, _T0[i]) for i in _IDS10],
        [(i, _T1[i]) for i in _SHUF],
    ),
    "skewed": (
        [(i, _T0[i]) for i in _IDS10],
        [(i, _T1[i]) for i in _IDS10[3:]],
    ),
    "deletion": (
        [(i, _T0[i]) for i in ["0001", "0002", "0003", "0007", "0008", "0009", "0010"]],
        [(i, _T1[i]) for i in _IDS10],
    ),
    "interleaved": (
        # verbatim from test/inputs/unordered_interleaved_r{1,2}.fa:
        # only ids 0003/0008 appear in both streams and their joined
        # conversations are identical -> single survivor 0003.
        [(i, _T0[i]) for i in ["0001", "0002", "0003", "0008", "0009", "0010"]],
        [(i, _T1[i]) for i in ["0003", "0004", "0005", "0006", "0007", "0008"]],
    ),
    "not_overlapped": (
        [(i, _T0[i]) for i in _IDS10[:5]],
        [(i, _T1[i]) for i in _IDS10[5:]],
    ),
}


def unordered_conv_df(
    spark: SparkSession, variant: str
) -> tuple[DataFrame, DataFrame]:
    """Two single-turn transcript tables (turn_idx 0 / 1) for a F7 variant."""
    s0, s1 = UNORDERED_FIXTURES[variant]
    df0 = conv_df(spark, [(cid, [t]) for cid, t in s0])
    df1 = conv_df(spark, [(cid, [t]) for cid, t in s1]).withColumn(
        "turn_idx", F.lit(1)
    )
    return df0, df1


# ---------------------------------------------------------------------------
# F9: seeded synthetic corpus with planted duplicate structure
# ---------------------------------------------------------------------------

_WORDS = (
    "the quick brown fox jumps over lazy dog while spark shuffles rows "
    "into sorted partitions and every turn carries text that may repeat "
    "across conversations with small edits or long shared prefixes plus "
    "agent tool calls results and user questions about data pipelines"
).split()


def generate_corpus(
    seed: int = 42,
    n_conv: int = 200,
    dup_rate: float = 0.3,
    max_turns: int = 8,
    hamming_d: int = 2,
    hot_fraction: float = 0.05,
) -> list[tuple[str, list[str]]]:
    """F9 generator (FIXTURES.md). Deterministic in (seed, n_conv, ...).

    Base conversations get 1..max_turns turns of word-salad text; a
    dup_rate fraction spawn a variant: exact copy / last-turn prefix
    extension / <=d Hamming edit in one turn. hot_fraction of conversations
    share one boilerplate turn (the LSH hot-bucket trigger).
    """
    rng = random.Random(seed)
    hot_turn = "standard boilerplate greeting how can i help you today " * 3
    convs: list[tuple[str, list[str]]] = []
    for i in range(n_conv):
        cid = f"c{i:07d}"
        turns = []
        for t in range(rng.randint(1, max_turns)):
            words = [rng.choice(_WORDS) for _ in range(rng.randint(8, 40))]
            turns.append(" ".join(words))
        if rng.random() < hot_fraction:
            turns[0] = hot_turn.strip()
        convs.append((cid, turns))
        if rng.random() < dup_rate:
            kind = rng.choice(["exact", "extend", "hamming"])
            vturns = list(turns)
            if kind == "extend":
                vturns[-1] = vturns[-1] + " appended tail tokens"
            elif kind == "hamming":
                k = rng.randrange(len(vturns))
                s = vturns[k]
                edits = rng.sample(range(len(s)), min(hamming_d, len(s)))
                chars = list(s)
                for p in edits:
                    chars[p] = "~"
                vturns[k] = "".join(chars)
            convs.append((f"c{i:07d}d", vturns))
    return convs


# ---------------------------------------------------------------------------
# Transcripts derived from the driver's documents.parquet — the shared
# ground both Spark and the DuckDB oracle can construct bit-identically.
# ---------------------------------------------------------------------------
#
# Derivation (portable SQL semantics only: length/substr/concat/modulo):
#   For each document, emit variant conversations r:
#     r=0  base                       (always)
#     r=1  exact copy                 (doc_id % 3 == 0)  -> exact dup
#     r=2  text || ' appended tail'   (doc_id % 5 == 0)  -> prefix extension
#     r=3  one char at pos 11 -> '~'  (doc_id % 7 == 0)  -> Hamming dist 1
#   conv_id = lpad(doc_id, 8, '0') || '-' || r
#   turns   = 80-char chunks of the variant text, at most 8 turns
#   role    = user/assistant alternating; tool = ''.

TURN_WIDTH = 80
MAX_TURNS = 8

# DuckDB dialect; oracle queries embed this CTE. Keep semantically in
# lockstep with build_transcripts() below (tested by parity test).
TRANSCRIPTS_DUCKDB_SQL = f"""
WITH variants AS (
    SELECT doc_id, 0 AS variant, text FROM documents
    UNION ALL
    SELECT doc_id, 1, text FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, 2, text || ' appended tail' FROM documents WHERE doc_id % 5 = 0
    UNION ALL
    SELECT doc_id, 3, substr(text, 1, 10) || '~' || substr(text, 12)
    FROM documents WHERE doc_id % 7 = 0
),
convs AS (
    SELECT
        lpad(CAST(doc_id AS VARCHAR), 8, '0') || '-' || CAST(variant AS VARCHAR)
            AS conv_id,
        text,
        LEAST(CAST(ceil(length(text) / {TURN_WIDTH}.0) AS INTEGER), {MAX_TURNS})
            AS n_turns
    FROM variants
),
transcripts AS (
    SELECT
        conv_id,
        CAST(k AS INTEGER) AS turn_idx,
        CASE WHEN k % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
        substr(text, CAST(k * {TURN_WIDTH} + 1 AS INTEGER), {TURN_WIDTH}) AS text,
        '' AS tool
    FROM convs, LATERAL unnest(range(CAST(n_turns AS BIGINT))) AS u(k)
    WHERE n_turns >= 1
)
"""


def build_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of TRANSCRIPTS_DUCKDB_SQL (no ts column — ts is carried,
    never compared; checked queries exclude it).

    Variant generation is ONE parquet scan + an array/filter/explode (a
    union of per-variant filters would re-read the scan once per variant —
    4x the I/O at corpus scale; explain showed exactly that before this
    form). Text expressions stay literally identical to the DuckDB CTE.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")

    def v(variant: int, text_col):
        return F.struct(F.lit(variant).alias("variant"), text_col.alias("text"))

    arr = F.array(
        v(0, F.col("text")),
        F.when(F.col("doc_id") % 3 == 0, v(1, F.col("text"))),
        F.when(
            F.col("doc_id") % 5 == 0,
            v(2, F.concat(F.col("text"), F.lit(" appended tail"))),
        ),
        F.when(
            F.col("doc_id") % 7 == 0,
            v(
                3,
                F.concat(
                    F.substring(F.col("text"), 1, 10),
                    F.lit("~"),
                    F.expr("substr(text, 12)"),
                ),
            ),
        ),
    )
    variants = docs.select(
        "doc_id",
        F.explode(F.filter(arr, lambda x: x.isNotNull())).alias("v"),
    ).select("doc_id", "v.variant", "v.text")
    convs = variants.select(
        F.concat(
            F.lpad(F.col("doc_id").cast("string"), 8, "0"),
            F.lit("-"),
            F.col("variant").cast("string"),
        ).alias("conv_id"),
        F.col("text"),
        F.least(
            F.ceil(F.length("text") / TURN_WIDTH).cast("int"), F.lit(MAX_TURNS)
        ).alias("n_turns"),
    )
    # n_turns >= 1 on BOTH sides: an empty document (n_turns = 0) must
    # emit no rows — Spark's sequence(0, -1) would produce a descending
    # [0, -1] where DuckDB's range(0) produces nothing
    return convs.where(F.col("n_turns") >= 1).select(
        "conv_id",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
        "text",
    ).select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.when(F.col("turn_idx") % 2 == 0, "user")
        .otherwise("assistant")
        .alias("role"),
        F.expr(f"substr(text, turn_idx * {TURN_WIDTH} + 1, {TURN_WIDTH})").alias(
            "text"
        ),
        F.lit("").alias("tool"),
    )
