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

Candidate generation is a prefix-blocked equi-join carrying ONLY ids and
64-bit block hashes — no text flows through the blocking exchange (round 1
shipped each suffix string 16x through the shuffle; this design ships
16 fixed-width rows per suffix and joins text back exactly once for the
verify):

  suffix side:  for suffix S at turn boundary t of container C, emit
                (C, t, ph) where ph = xxhash64(k, S[:k]) for k in
                1..min(len(S), PREFIX_LEN), plus k = PREFIX_LEN_LONG
                when len(S) >= PREFIX_LEN_LONG (the selective tier)
  needle side:  needle P emits ONE row (conv_id, ph) with
                k = k_probe(len(P)) — len if < PREFIX_LEN, PREFIX_LEN if
                < PREFIX_LEN_LONG, else PREFIX_LEN_LONG (_probe_key)
  join on ph -> candidates (needle, container, t) -> join text back once
  and verify startswith(suffix(C, t), P) exactly, JVM-side.

Any P with len <= PREFIX_LEN matches its full text in the block key, so
blocking recall is 1.0 (a 64-bit ph collision can only ADD a false
candidate, removed by the verify). Hot blocks (a prefix shared by many
suffixes) are salted into bounded sub-buckets with the needle row
replicated across salts — recall stays 1.0, skew is defused, and hot keys
are surfaced by containment_hot_buckets. Join OUTPUT volume for a hot
block is needle-count x bucket-size, which is the size of the true
relation being asked for (a 1-char needle genuinely is contained in a
quarter of the corpus) — intrinsic, not overhead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .buckets import hot_buckets, materialize_and_size, with_salt

#: block key width of the SHORT tier: blocking fan-out is
#: |turns| * PREFIX_LEN (+1, see PREFIX_LEN_LONG) id-only rows
PREFIX_LEN = 16

#: r6 SELECTIVE tier (guide §2.3: shuffle fewer bytes by emitting fewer
#: candidate rows): needles of len >= PREFIX_LEN_LONG key on their first
#: PREFIX_LEN_LONG chars instead of the first PREFIX_LEN — at bench x8
#: scale this cut boundary-path candidates 961k -> 238k (4x) with the
#: verified pair set bit-identical, because most false candidates were
#: long needles sharing a generic 16-char opening. Each suffix emits at
#: most ONE extra block row (k = PREFIX_LEN_LONG when len allows), so the
#: block table stays ~PREFIX_LEN rows/suffix at any corpus. Exactness
#: (recall 1.0) per needle length l with k_probe(l) = l if l < PREFIX_LEN
#: else PREFIX_LEN if l < PREFIX_LEN_LONG else PREFIX_LEN_LONG: a true
#: containment implies suffix_len >= l >= k_probe(l), so the suffix
#: always emits the k_probe(l) row (k <= PREFIX_LEN rows always exist up
#: to suffix_len; the k = PREFIX_LEN_LONG row exists whenever
#: suffix_len >= PREFIX_LEN_LONG <= l), and the hash includes k, so
#: cross-tier collisions cannot lose a candidate — only 64-bit hash
#: collisions ADD candidates, which the exact startswith verify removes.
PREFIX_LEN_LONG = 64

#: separator between turns inside canonical conversation text; \x1f sorts
#: below printable chars and is excluded from transcript text by the
#: canonicalize.quarantine stage (P9).
_US = "\x1f"


def _needle_key_semi_join(
    blocks: DataFrame, keys: DataFrame, key: str, broadcast: bool
) -> DataFrame:
    """The needle-set pushdown semi-join, with its scale fallback.

    broadcast=True (default everywhere): explicit F.broadcast hint on the
    distinct needle-key side — one 8-byte hash per conversation, fine to
    ~10^8 conversations (~1-2 GB on executors; see
    _salted_blocks_and_probes for why the hint is load-bearing).

    broadcast=False (beyond that envelope): the SHUFFLE_HASH hint forces
    a co-partitioned shuffled hash semi-join that builds the hash table
    from the needle-key side — both sides hash-exchange on `key`, no
    executor ever holds the full key set, and the block side is still
    never sorted (a MERGE fallback would sort the O(|turns| x PREFIX_LEN)
    table). The block-side exchange this re-admits is the price of
    leaving the broadcast envelope; candidates/verify are unchanged, so
    recall stays 1.0 by construction (pytest-pinned identical pair sets
    and plan shape in test_containment)."""
    keys = keys.select(key).distinct()
    if broadcast:
        return blocks.join(F.broadcast(keys), key, "left_semi")
    return blocks.join(keys.hint("shuffle_hash"), key, "left_semi")


def _probe_key(col: str):
    """Tiered probe-prefix hash for a needle text column (see
    PREFIX_LEN_LONG): k_probe = len if len < PREFIX_LEN, else PREFIX_LEN
    if len < PREFIX_LEN_LONG, else PREFIX_LEN_LONG; ph = xxhash64(k_probe,
    first k_probe chars). MUST stay expression-identical to the block
    side (_suffix_blocks emits exactly these (k, prefix-hash) keys)."""
    ln = F.length(col)
    k_probe = (
        F.when(ln < PREFIX_LEN, ln)
        .when(ln < PREFIX_LEN_LONG, F.lit(PREFIX_LEN))
        .otherwise(F.lit(PREFIX_LEN_LONG))
    )
    return F.xxhash64(k_probe, F.col(col).substr(F.lit(1), k_probe))


def _needles(conv_texts: DataFrame) -> DataFrame:
    """(conv_id, full_text, ph): one probe row per conversation."""
    return conv_texts.select(
        "conv_id", F.concat_ws(_US, "texts").alias("full_text")
    ).select(
        "conv_id",
        "full_text",
        _probe_key("full_text").alias("ph"),
    )


def _suffixes(conv_texts: DataFrame, all_boundaries: bool) -> DataFrame:
    """(container_id, turn_k, suffix): canonical text from each turn
    boundary (turn_k is 1-based); boundary 1 only when not all_boundaries."""
    last = F.size("texts") if all_boundaries else F.lit(1)
    return conv_texts.select(
        F.col("conv_id").alias("container_id"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), last),
                lambda k: F.struct(
                    k.alias("turn_k"),
                    F.concat_ws(
                        _US, F.slice("texts", k, F.size("texts") - k + 1)
                    ).alias("suffix"),
                ),
            )
        ).alias("s"),
    ).select("container_id", "s.turn_k", "s.suffix")


def _suffix_blocks(suffixes: DataFrame) -> DataFrame:
    """(container_id, turn_k, ph) id-only blocking rows: PREFIX_LEN short
    -tier hashes per suffix plus ONE selective PREFIX_LEN_LONG-tier hash
    when the suffix is long enough (see PREFIX_LEN_LONG — serves every
    needle of len >= PREFIX_LEN_LONG at 4x the candidate selectivity).
    Computed where the suffix row lives (narrow — the suffix string
    itself never enters the blocking exchange)."""
    short_tier = F.transform(
        F.sequence(F.lit(1), F.least(F.length("suffix"), F.lit(PREFIX_LEN))),
        lambda k: F.xxhash64(k, F.substring("suffix", 1, k)),
    )
    long_tier = F.when(
        F.length("suffix") >= PREFIX_LEN_LONG,
        F.array(
            F.xxhash64(
                F.lit(PREFIX_LEN_LONG),
                F.substring("suffix", 1, PREFIX_LEN_LONG),
            )
        ),
    ).otherwise(F.expr("array()").cast("array<bigint>"))
    return suffixes.select(
        "container_id",
        "turn_k",
        F.explode(F.concat(short_tier, long_tier)).alias("ph"),
    )



def _salted_blocks_and_probes(
    blocks: DataFrame,
    needles: DataFrame,
    key: str,
    max_bucket: int,
    broadcast_needles: bool = True,
):
    """Shared hot-block machinery for the two-sided (needle x block)
    joins: persist + size the id-only block table in one fused job
    (map-side-combined groupBy, no window sort), salt over-cap blocks,
    and replicate each needle probe across its block's salts (probes
    carry only ids + hashes). Returns (salted_blocks, probes) — join on
    (key, salt).

    NEEDLE-SET PUSHDOWN: the block table is first semi-joined against
    the distinct needle keys, INSIDE the narrow block-generation stage,
    with an EXPLICIT broadcast hint on the needle side. The hint is
    load-bearing: the needle key set is one 8-byte hash per conversation
    (tiny next to the block fan-out), but at ~400k conversations its
    size ESTIMATE crosses the default autoBroadcastJoinThreshold and
    Catalyst silently flips the semi-join to a SortMergeJoin whose first
    move is a full hash Exchange of the O(|turns| x PREFIX_LEN) /
    O(total_chars / stride) block table — the kernel-bound shuffle the
    pushdown exists to avoid (measured at x48 bench scale: the
    containment rows stopped scaling with cores entirely, T_8 ~= T_2,
    because the exchange dominates both). Blocks whose key no needle
    carries can never produce a candidate, so pruning them BEFORE the
    checkpoint / sizing / exchange removes ~all of the gram index's
    rows and most of the suffix blocks' rows from every downstream
    shuffle (round-3 finding: the unpruned gram exchange multiplied
    suite time ~10x). Bucket sizes (and therefore salts + the hot
    surface used for probe replication) are computed on the PRUNED
    table — the rows that can actually join.

    100 TB envelope: broadcasting one distinct hash per conversation is
    fine up to ~10^8 conversations (~1-2 GB on executors); beyond that,
    pass broadcast_needles=False (DedupConfig.broadcast_needle_keys) and
    the semi-join runs as a co-partitioned shuffled hash join instead
    (_needle_key_semi_join)."""
    salted, dim = _prune_salt_checkpoint(
        blocks, needles, key, max_bucket, broadcast_needles
    )
    return salted, _probes_for(needles, dim, key)


def _prune_salt_checkpoint(
    blocks: DataFrame,
    needle_keys: DataFrame,
    key: str,
    max_bucket: int,
    broadcast_needles: bool = True,
):
    """Needle-set pushdown + one fused materialize+size job + salting
    (see _salted_blocks_and_probes). Split out so char_containment_pairs
    can build the suffix-block table ONCE (pruned by the UNION of its two
    needle-key sets) and share it across the boundary and tail paths.
    The pruned block table is persisted and its over-cap buckets sized in
    a single action (buckets.materialize_and_size), so the salt dim — and
    the probe-replication dim derived from it — is a driver-local
    relation: one job instead of the round-4 checkpoint-then-size pair.
    Returns (salted_blocks, salt_dim)."""
    blocks = _needle_key_semi_join(blocks, needle_keys, key, broadcast_needles)
    blocks, hot = materialize_and_size(blocks, [key], max_bucket)
    dim = hot.select(
        key, F.ceil(F.col("bucket_n") / max_bucket).cast("int").alias("n_salts")
    )
    salted = with_salt(blocks, [key], "container_id", max_bucket, hot=hot)
    return salted, dim


def _probes_for(needles: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Replicate each needle probe across its block's salts (keys absent
    from `dim` get the single salt 0). Exact for ANY salting `dim` that is
    >= the key's true bucket count: a block row lands on one salt in
    0..n_salts-1 and the probe visits all of them, so a superset-pruned
    shared table (union of needle sets) preserves recall 1.0."""
    return (
        needles.join(F.broadcast(dim), key, "left")
        .withColumn(
            "salt",
            F.explode(
                F.sequence(F.lit(0), F.coalesce(F.col("n_salts"), F.lit(1)) - 1)
            ),
        )
        .drop("n_salts")
    )


def _contained_pairs(
    conv_texts: DataFrame,
    all_boundaries: bool,
    max_bucket: int,
    shared_blocks=None,
    broadcast_needles: bool = True,
) -> DataFrame:
    needles = _needles(conv_texts)
    if shared_blocks is not None:
        salted, dim = shared_blocks
        probes = _probes_for(needles.select("conv_id", "ph"), dim, "ph")
    else:
        blocks = _suffix_blocks(_suffixes(conv_texts, all_boundaries))
        salted, probes = _salted_blocks_and_probes(
            blocks,
            needles.select("conv_id", "ph"),
            "ph",
            max_bucket,
            broadcast_needles,
        )

    cands = (
        probes.join(salted, ["ph", "salt"])
        .where(F.col("conv_id") != F.col("container_id"))
        .select("conv_id", "container_id", "turn_k")
    )
    # verify: join needle text + container texts back ONCE, rebuild the
    # suffix at turn_k, exact startswith (kills ph collisions and false
    # prefix matches). SHUFFLE_HASH on the text sides (guide §3.1): the
    # sort-merge fallback sorts candidate rows with text payloads
    # attached once the text tables outgrow the broadcast envelope
    # (measured 6x on the semantic verify at x48).
    verified = (
        cands.join(
            needles.select("conv_id", "full_text").hint("shuffle_hash"),
            "conv_id",
        )
        .join(
            conv_texts.select(
                F.col("conv_id").alias("container_id"), "texts"
            ).hint("shuffle_hash"),
            "container_id",
        )
        .where(
            F.concat_ws(
                _US,
                F.slice(
                    "texts", F.col("turn_k"), F.size("texts") - F.col("turn_k") + 1
                ),
            ).startswith(F.col("full_text"))
        )
    )
    return verified.select(
        F.least("conv_id", "container_id").alias("conv_a"),
        F.greatest("conv_id", "container_id").alias("conv_b"),
    ).distinct()


def containment_pairs(
    conv_texts: DataFrame,
    max_bucket: int = 4000,
    shared_blocks=None,
    broadcast_needles: bool = True,
) -> DataFrame:
    """(conv_a, conv_b): conv_a's text occurs at a turn boundary of conv_b
    (conv_a != conv_b; equal-text conversations pair both ways reduced to
    a < b). Exact — blocking is lossless, verification is startswith.

    shared_blocks: optional (salted_blocks, salt_dim) from
    _shared_suffix_blocks — char_containment_pairs passes it so the
    O(|turns| x PREFIX_LEN) block table is built + checkpointed once per
    run instead of once per path."""
    return _contained_pairs(
        conv_texts,
        all_boundaries=True,
        max_bucket=max_bucket,
        shared_blocks=shared_blocks,
        broadcast_needles=broadcast_needles,
    )


def prefix_containment_pairs(
    conv_texts: DataFrame,
    max_bucket: int = 4000,
    broadcast_needles: bool = True,
) -> DataFrame:
    """Reference-loose relation only (needle is a PREFIX of the container,
    boundary 0): the transitive pair set matching
    /root/reference/src/comparator.cpp:60-63 semantics."""
    return _contained_pairs(
        conv_texts,
        all_boundaries=False,
        max_bucket=max_bucket,
        broadcast_needles=broadcast_needles,
    )


def containment_hot_buckets(
    conv_texts: DataFrame,
    max_bucket: int = 4000,
    broadcast_needles: bool = True,
) -> DataFrame:
    """Quarantine surface: over-cap (ph, bucket_n) blocks, measured after
    the needle-set pushdown (the same pruned table the candidate join
    sees — that is the fan-out that matters). ph is a hash; joining back
    to _suffixes recovers the offending prefixes if needed."""
    blocks = _needle_key_semi_join(
        _suffix_blocks(_suffixes(conv_texts, all_boundaries=True)),
        _needles(conv_texts),
        "ph",
        broadcast_needles,
    )
    return hot_buckets(blocks, ["ph"], max_bucket)


# ---------------------------------------------------------------------------
# Char-level generalized substring containment (SURVEY.md §7.1 M4)
# ---------------------------------------------------------------------------

#: 16-gram window for the single-turn position index
GRAM_LEN = 16

#: default gram-index STRIDE (extreme-tier lever, STATUS.md known-limit
#: #2): the container index keeps only every stride-th gram offset while
#: each needle probes its first `stride` 16-grams — EXACT for needles of
#: len >= GRAM_LEN + stride - 1 (see _gram_path_pairs proof), cutting the
#: O(total_chars) index generation + distinct + exchange by ~stride.
#: Needles below that length ride the multi-needle scan instead.
GRAM_STRIDE = 4


def _tail_needles(conv_texts: DataFrame) -> DataFrame:
    """(conv_id, head, tail_text, ph): the multi-turn-needle probe rows
    for the tail path (ph keys the tail text's prefix block)."""
    return (
        conv_texts.where(F.size("texts") >= 2)
        .select(
            "conv_id",
            F.element_at("texts", 1).alias("head"),
            F.concat_ws(
                _US, F.slice("texts", 2, F.size("texts") - 1)
            ).alias("tail_text"),
        )
        .select(
            "conv_id",
            "head",
            "tail_text",
            _probe_key("tail_text").alias("ph"),
        )
    )


def _shared_suffix_blocks(
    conv_texts: DataFrame, max_bucket: int, broadcast_needles: bool = True
):
    """Build the all-boundaries suffix-block table ONCE for
    char_containment_pairs: pruned by the UNION of the boundary path's
    needle keys and the tail path's needle keys, persisted + sized in one
    fused job, salted once. Each path then semi-filters by joining its own
    probes (a non-matching ph simply never joins), so sharing is exact;
    the union-pruned table is a superset of each path's former table and
    union sizing only ever INCREASES a key's salt count, which
    _probes_for's full-salt replication absorbs. Replaces the round-4
    shape where both paths independently generated, pruned, and
    checkpointed the O(|turns| x PREFIX_LEN) block table (VERDICT r4
    'What's wrong' #1 — two of the four serial planning constants)."""
    keys = (
        _needles(conv_texts)
        .select("ph")
        .unionByName(_tail_needles(conv_texts).select("ph"))
    )
    blocks = _suffix_blocks(_suffixes(conv_texts, all_boundaries=True))
    return _prune_salt_checkpoint(
        blocks, keys, "ph", max_bucket, broadcast_needles
    )


def _tail_path_pairs(
    conv_texts: DataFrame,
    max_bucket: int,
    shared_blocks=None,
    broadcast_needles: bool = True,
) -> DataFrame:
    """Mid-turn occurrences of MULTI-turn needles.

    \\x1f appears exactly at turn boundaries, so an occurrence of a k>=2
    turn needle A inside composite(B) at char offset o>0 of B's turn j-1
    decomposes into: turn 0 of A is a SUFFIX of B's turn j-1, and
    composite(A minus turn 0) is turn-boundary-contained at boundary j.
    That reuses the id-only suffix blocks — |turns| * PREFIX_LEN rows, no
    position index needed for multi-turn needles (and with shared_blocks,
    the very same checkpointed table the boundary path joins, filtered to
    turn_k >= 2).
    """
    tails = _tail_needles(conv_texts)
    if shared_blocks is not None:
        salted, dim = shared_blocks
        salted = salted.where(F.col("turn_k") >= 2)
        probes = _probes_for(tails.select("conv_id", "ph"), dim, "ph")
    else:
        blocks = _suffix_blocks(_suffixes(conv_texts, all_boundaries=True)).where(
            F.col("turn_k") >= 2
        )
        salted, probes = _salted_blocks_and_probes(
            blocks, tails.select("conv_id", "ph"), "ph", max_bucket,
            broadcast_needles,
        )
    cands = (
        probes.join(salted, ["ph", "salt"])
        .where(F.col("conv_id") != F.col("container_id"))
        .select("conv_id", "container_id", "turn_k")
        .distinct()
    )
    verified = (
        cands.join(
            tails.select("conv_id", "head", "tail_text").hint("shuffle_hash"),
            "conv_id",
        )
        .join(
            conv_texts.select(
                F.col("conv_id").alias("container_id"), "texts"
            ).hint("shuffle_hash"),
            "container_id",
        )
        .where(
            F.concat_ws(
                _US,
                F.slice("texts", F.col("turn_k"), F.size("texts") - F.col("turn_k") + 1),
            ).startswith(F.col("tail_text"))
            & F.element_at("texts", F.col("turn_k") - 1).endswith(F.col("head"))
        )
    )
    return verified.select(
        F.least("conv_id", "container_id").alias("conv_a"),
        F.greatest("conv_id", "container_id").alias("conv_b"),
    )


def _gram_index(conv_texts: DataFrame, stride: int) -> DataFrame:
    """(container_id, turn_k, gh): the strided rolling GRAM_LEN-gram
    position index over container turns — id-only rows at container
    offsets o ≡ 1 (mod stride), O(total_chars / stride) of them. Split
    out so the sampled-mode cost test can count index rows directly."""
    turns = conv_texts.select(
        F.col("conv_id").alias("container_id"),
        F.posexplode("texts").alias("tk0", "turn"),
    ).where(F.length("turn") >= GRAM_LEN)
    return (
        turns.select(
            "container_id",
            (F.col("tk0") + 1).alias("turn_k"),
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.length("turn") - (GRAM_LEN - 1),
                        F.lit(stride),
                    ),
                    lambda o: F.xxhash64(F.substring("turn", o, F.lit(GRAM_LEN))),
                )
            ).alias("gh"),
        )
        .distinct()  # one candidate per (container, turn, gram value)
    )


def _gram_path_pairs(
    conv_texts: DataFrame,
    max_bucket: int,
    stride: int = GRAM_STRIDE,
    sampled: bool = False,
    broadcast_needles: bool = True,
) -> DataFrame:
    """Mid-turn occurrences of SINGLE-turn needles with
    len >= GRAM_LEN + stride - 1 (exact mode) / len >= GRAM_LEN (sampled).

    A needle without the separator lies inside exactly one turn of the
    container, so a rolling GRAM_LEN-gram position index over turn bytes
    (id-only rows — THE discretized generalized-suffix-array pass,
    hash-partitioned) blocks needle 16-grams to candidate (container,
    turn) slots; verify is one JVM locate() after joining the turn text
    back once. Hot grams (common English windows) are salted with
    needle-probe replication like the prefix blocks.

    STRIDE (exact, not sampled): the container index keeps only offsets
    o ≡ 1 (mod stride); each needle emits its 16-grams at offsets
    1..stride. Proof of recall 1.0: an occurrence at container offset o
    puts needle gram j (0-based) at container offset o+j; among the
    stride consecutive offsets o..o+stride-1 exactly one is ≡ 1 (mod
    stride), and that needle gram exists whenever
    len(needle) >= GRAM_LEN + stride - 1 — so every true occurrence
    shares at least one indexed (gh) key. This divides the O(total_chars)
    index generation / distinct / exchange volume by ~stride while
    multiplying only the tiny needle probe side by stride. Single-turn
    needles SHORTER than GRAM_LEN + stride - 1 are served exactly by the
    vectorized multi-needle scan (_short_needle_pairs) — the round-2
    boundary-only carve-out no longer exists on any path.

    SAMPLED (recall < 1, extreme tier): `sampled=True` admits every
    needle of len >= GRAM_LEN and emits only the grams the needle
    actually has — offsets 1..min(stride, len - GRAM_LEN + 1). Needles
    of len >= GRAM_LEN + stride - 1 still cover every offset residue
    (exact, by the proof above); a shorter needle covers
    (len - GRAM_LEN + 1) of the stride residues, so each occurrence is
    found with alignment coverage (len - GRAM_LEN + 1) / stride — the
    DOCUMENTED per-needle recall bound (precision stays 1.0: the verify
    is an exact locate()). The point of the knob: stride can be raised
    far past the exact tier's scan ceiling (the multi-needle scan then
    only serves len < GRAM_LEN, a fixed <= 15 Horner passes) so the
    index shrinks by ~stride without the scan absorbing the mid-length
    class — char containment at a fraction of the O(total_chars) cost.
    """
    min_len = GRAM_LEN if sampled else GRAM_LEN + stride - 1
    last_probe = (
        F.least(F.lit(stride), F.length("full") - (GRAM_LEN - 1))
        if sampled
        else F.lit(stride)
    )
    needles = (
        conv_texts.where(F.size("texts") == 1)
        .select("conv_id", F.element_at("texts", 1).alias("full"))
        .where(F.length("full") >= min_len)
        .select(
            "conv_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), last_probe),
                        lambda j: F.xxhash64(
                            F.substring("full", j, F.lit(GRAM_LEN))
                        ),
                    )
                )
            ).alias("gh"),
        )
    )
    grams = _gram_index(conv_texts, stride)
    salted, probes = _salted_blocks_and_probes(
        grams, needles.select("conv_id", "gh"), "gh", max_bucket,
        broadcast_needles,
    )
    cands = (
        probes.join(salted, ["gh", "salt"])
        .where(F.col("conv_id") != F.col("container_id"))
        .select("conv_id", "container_id", "turn_k")
        .distinct()
    )
    verified = (
        cands.join(
            conv_texts.where(F.size("texts") == 1)
            .select("conv_id", F.element_at("texts", 1).alias("full"))
            .hint("shuffle_hash"),
            "conv_id",
        )
        .join(
            conv_texts.select(
                F.col("conv_id").alias("container_id"), "texts"
            ).hint("shuffle_hash"),
            "container_id",
        )
        .where(F.expr("locate(full, element_at(texts, turn_k)) > 0"))
    )
    return verified.select(
        F.least("conv_id", "container_id").alias("conv_a"),
        F.greatest("conv_id", "container_id").alias("conv_b"),
    )


#: deterministic cap on the short-needle scan set — purely a MEMORY guard
#: on the driver collect + task closure (~100k needles of < ~20 chars is
#: ~10 MB pickled); CPU cost of the scan is independent of needle count
#: (one rolling-hash pass per distinct length — see _short_needle_pairs).
#: The over-cap remainder is surfaced by unindexed_short_needles, never
#: silently lost.
SHORT_NEEDLE_CAP = 100_000

#: odd multiplier for the scan's polynomial rolling hash (uint64
#: wraparound arithmetic; the exact substring verify kills collisions)
_SCAN_P = np.uint64(1099511628211)


def _short_needles(
    conv_texts: DataFrame, stride: int = GRAM_STRIDE, sampled: bool = False
) -> DataFrame:
    """Single-turn conversations shorter than GRAM_LEN + stride - 1 chars
    (non-empty): the needle class the strided gram index cannot block.
    In sampled mode the gram path absorbs everything >= GRAM_LEN (at
    partial recall), so the scan ceiling is fixed at GRAM_LEN."""
    ceiling = GRAM_LEN if sampled else GRAM_LEN + stride - 1
    return (
        conv_texts.where(F.size("texts") == 1)
        .select("conv_id", F.element_at("texts", 1).alias("full"))
        .where((F.length("full") >= 1) & (F.length("full") < ceiling))
    )


def _short_needle_pairs(
    conv_texts: DataFrame,
    max_short: int = SHORT_NEEDLE_CAP,
    stride: int = GRAM_STRIDE,
    sampled: bool = False,
) -> DataFrame:
    """Mid-turn occurrences of single-turn needles SHORTER than
    GRAM_LEN + stride - 1: one vectorized MULTI-NEEDLE scan.

    A short needle is an entire CONVERSATION under ~20 chars — a
    degenerate class that is tiny on any real corpus. The needle set
    (bounded by max_short, a deterministic smallest-conv_id driver
    collect — the cap is a MEMORY guard on the task closure, the
    remainder surfaced by unindexed_short_needles) rides the mapInPandas
    closure; each Arrow batch of container turns is scanned ONCE per
    distinct needle length with a vectorized polynomial rolling hash over
    a flat UTF-32 buffer (Horner: L numpy passes of O(batch_chars)), hit
    positions checked against the sorted needle-hash table via
    searchsorted, then exact-substring-verified. Cost is
    O(batch_chars x n_distinct_lengths) — INDEPENDENT of needle count
    (the round-3 broadcast nested-loop locate() was
    O(turn_chars x n_short), intractable at 10^12 turns), with no
    shuffle of the corpus and no per-row Python in the hot loop.
    """
    short_rows = (
        _short_needles(conv_texts, stride, sampled)
        .orderBy("conv_id")
        .limit(max_short)
        .collect()  # bounded by max_short: the explicit memory guard
    )
    spark = conv_texts.sparkSession
    if not short_rows:
        return spark.createDataFrame([], "conv_a string, conv_b string")

    # length -> (sorted uint64 hashes, per-hash [(text, [conv_ids])...])
    by_len: dict[int, dict[str, list[str]]] = {}
    for r in short_rows:
        by_len.setdefault(len(r["full"]), {}).setdefault(r["full"], []).append(
            r["conv_id"]
        )
    tables: list[tuple[int, np.ndarray, list]] = []
    for length, texts in sorted(by_len.items()):
        groups: dict[int, list] = {}  # hash -> [(text, cids)...] (collisions merged)
        for txt, cids in texts.items():
            h = np.zeros(1, dtype=np.uint64)  # array ops: silent uint64 wrap
            for c in np.frombuffer(txt.encode("utf-32-le"), np.uint32):
                h = h * _SCAN_P + np.uint64(c)
            groups.setdefault(int(h[0]), []).append((txt, cids))
        hs = np.asarray(sorted(groups), dtype=np.uint64)
        tables.append((length, hs, [groups[int(h)] for h in hs]))

    def scan(batches):
        for pdf in batches:
            turns = [t if t is not None else "" for t in pdf["turn"]]
            cids = pdf["container_id"].tolist()
            enc = [t.encode("utf-32-le") for t in turns]
            lens = np.fromiter((len(e) >> 2 for e in enc), np.int64, len(enc))
            total = int(lens.sum())
            if not total:
                continue
            flat = np.frombuffer(b"".join(enc), np.uint32).astype(np.uint64)
            char_turn = np.repeat(np.arange(len(enc)), lens)
            out_a: list[str] = []
            out_b: list[str] = []
            for length, nh, entries in tables:
                m = total - length + 1
                if m <= 0:
                    continue
                h = np.zeros(m, dtype=np.uint64)
                for j in range(length):  # Horner: L vectorized passes
                    h = h * _SCAN_P + flat[j : j + m]
                # windows straddling a turn boundary are invalid
                valid = char_turn[:m] == char_turn[length - 1 : length - 1 + m]
                pos = np.minimum(np.searchsorted(nh, h), len(nh) - 1)
                hit = (nh[pos] == h) & valid
                if not hit.any():
                    continue
                # dedup to (turn, needle-hash) BEFORE the exact verify:
                # hit volume is bounded by the true pair relation, not by
                # occurrence count (a 1-char needle may occur millions of
                # times in one turn but yields one pair)
                tn = np.unique(np.stack([char_turn[:m][hit], pos[hit]]), axis=1)
                for trow, ni in tn.T:
                    for txt, needle_cids in entries[int(ni)]:
                        if txt in turns[int(trow)]:  # kills hash collisions
                            out_a.extend([cids[int(trow)]] * len(needle_cids))
                            out_b.extend(needle_cids)
            if out_a:
                yield pd.DataFrame({"container_id": out_a, "conv_id": out_b})

    turns_df = conv_texts.select(
        F.col("conv_id").alias("container_id"), F.explode("texts").alias("turn")
    )
    pairs = turns_df.mapInPandas(scan, "container_id string, conv_id string")
    return (
        pairs.where(F.col("conv_id") != F.col("container_id"))
        .select(
            F.least("conv_id", "container_id").alias("conv_a"),
            F.greatest("conv_id", "container_id").alias("conv_b"),
        )
    )


def unindexed_short_needles(
    conv_texts: DataFrame,
    max_short: int = SHORT_NEEDLE_CAP,
    stride: int = GRAM_STRIDE,
    sampled: bool = False,
) -> DataFrame:
    """Quarantine surface: short needles beyond the scan-closure memory
    cap (empty on any non-pathological corpus)."""
    return (
        _short_needles(conv_texts, stride, sampled)
        .orderBy("conv_id")
        .offset(max_short)
    )


def char_containment_pairs(
    conv_texts: DataFrame,
    max_bucket: int = 4000,
    max_short: int = SHORT_NEEDLE_CAP,
    gram_stride: int = GRAM_STRIDE,
    sampled: bool = False,
    broadcast_needles: bool = True,
) -> DataFrame:
    """(conv_a, conv_b): conv_a's canonical composite text occurs ANYWHERE
    in conv_b's composite text (char-level generalized substring
    containment — SURVEY.md section 7.1 M4), not just at turn boundaries.

    Decomposition (exact, because the separator appears only at turn
    boundaries): boundary-aligned occurrences come from containment_pairs;
    mid-turn occurrences of multi-turn needles from the tail path (suffix
    blocks reused, |turns|*PREFIX_LEN id rows); mid-turn occurrences of
    single-turn needles >= GRAM_LEN + gram_stride - 1 from the STRIDED
    rolling-gram position index (O(total_bytes / stride) id rows — priced
    like a sampled distributed suffix array but with an exactness proof,
    see _gram_path_pairs); the remaining short single-turn needles from
    the vectorized multi-needle scan (one rolling-hash pass per distinct
    length, cost independent of needle count — see _short_needle_pairs).
    gram_stride=1 reproduces the dense round-3 index; every stride is
    EXACT (recall 1.0), the knob only trades index volume against
    (stride x tiny) needle-probe fan-out and the scan's length ceiling.

    sampled=True (EXTREME tier, recall < 1 — documented, off by
    default): pair with a LARGE gram_stride (e.g. 16/64). The gram index
    shrinks by ~stride; mid-length single-turn needles
    (GRAM_LEN <= len < GRAM_LEN + stride - 1) are gram-blocked at
    alignment coverage (len - GRAM_LEN + 1) / stride instead of riding
    the scan, whose length ceiling stays fixed at GRAM_LEN. Boundary,
    tail, long-needle, and sub-GRAM_LEN paths remain exact; precision is
    1.0 everywhere (every candidate is verify-checked). See
    test_sampled_char_containment_* for the measured recall/cost curve.
    """
    # the four paths are independent until the final union, but each path's
    # construction runs blocking driver work (the pruned-block
    # localCheckpoint; the short-needle collect) — serially that is
    # back-to-back jobs of constant driver latency. Building them on a
    # small thread pool lets the Spark scheduler run those jobs
    # CONCURRENTLY (thread-safe: each thread only submits jobs on the
    # shared session), cutting the per-call constant that dominates this
    # detector's small-corpus floor. The boundary and tail paths share ONE
    # union-pruned suffix-block checkpoint (_shared_suffix_blocks) instead
    # of each building their own — one localCheckpoint job, one block
    # generation pass (r4 verdict item 2).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        gram_f = pool.submit(
            _gram_path_pairs,
            conv_texts,
            max_bucket,
            gram_stride,
            sampled,
            broadcast_needles,
        )
        short_f = pool.submit(
            _short_needle_pairs, conv_texts, max_short, gram_stride, sampled
        )
        shared = _shared_suffix_blocks(conv_texts, max_bucket, broadcast_needles)
        base_f = pool.submit(containment_pairs, conv_texts, max_bucket, shared)
        tail_f = pool.submit(_tail_path_pairs, conv_texts, max_bucket, shared)
        base, tail, gram, short = (
            base_f.result(), tail_f.result(), gram_f.result(), short_f.result()
        )
    return (
        base.unionByName(tail).unionByName(gram).unionByName(short).distinct()
    )
