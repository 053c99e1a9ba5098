"""Incremental (delta-vs-corpus) dedup — the daily-batch pattern.

No reference analog: fastq-dupaway dedups one closed file per run
(/root/reference/src/main.cpp:40-179 reads -i, writes -o, exits). A
100 TB training-data pipeline instead receives bounded DELTA batches
(today's crawl) against an already-deduplicated CORPUS, and must answer
"which new conversations are duplicates of something we already kept, or
of each other?" without re-deduplicating the corpus. Two detectors, the
same signature/shingle config as their full-corpus counterparts (the
north rule's "same shingle/signature config" requirement applies across
runs too — an incremental pass at a different config would not compose
with the corpus's existing clusters):

- exact_incremental_assign: content-signature assignment. ONE corpus
  pass in the default (broadcast) tier: the delta's distinct conv_sig
  set — bounded by the delta batch — is broadcast as a semi-join filter
  onto the corpus signature table, so only matched corpus rows
  (<= |delta| distinct signatures) reach the rep-election groupBy. The
  only corpus-sized exchange is the signature groupBy itself — absent
  entirely when the checkpointed signatures stage table of a prior full
  run is passed (checkpoints.py), and shuffle-free on a
  conv_id-bucketed table (conversation_signatures docstring).

- minhash_incremental_pairs: LSH candidates = (corpus bands x delta
  bands, via buckets.salted_cross_pairs) + (delta self-join, via
  salted_self_pairs), then the exact-Jaccard verify restricted to
  candidate conversations only — the full-corpus verify aggregates
  shingle sets for EVERY conversation; the incremental verify semi-joins
  the (conv_id, shs) set table down to candidate ids first, so
  corpus-side work is proportional to the delta's neighborhood, not the
  corpus.

Both carry the broadcast/shuffled-hash two-tier scale story of the
containment needle pushdown (containment._needle_key_semi_join):
broadcast of delta-derived keys is fine to ~10^7-10^8 delta
conversations; `broadcast_delta=False` keeps every exchange
co-partitioned beyond that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .canonicalize import conversation_signatures
from .detectors.buckets import (
    materialize_and_size,
    salted_cross_pairs,
    salted_self_pairs,
)
from .detectors.minhash import (
    _banded,
    minhash_signatures_from_sets,
    shingle_sets,
    verify_jaccard_pairs_from_sets,
)

#: deterministic engine-portable corpus/delta split used by tests,
#: benchmarks, and the driver oracle: a conversation is "delta" iff the
#: first hex char of md5(conv_id) falls in this set (~25%). md5 of the
#: UTF-8 conv_id bytes is bit-identical in Spark and DuckDB, so the same
#: predicate splits both engines' views of the corpus.
DELTA_HEX = ("0", "1", "2", "3")


def split_corpus_delta(
    transcripts: DataFrame, hex_chars: tuple[str, ...] = DELTA_HEX
) -> tuple[DataFrame, DataFrame]:
    """(corpus, delta) views of one transcript table — a test/bench
    harness for the incremental API (production passes two real tables).
    Narrow filters on a scan-adjacent md5: no shuffle, and Catalyst keeps
    both sides' predicates pushed at the parquet scan."""
    is_delta = F.substring(F.md5(F.col("conv_id")), 1, 1).isin(*hex_chars)
    return transcripts.where(~is_delta), transcripts.where(is_delta)


def exact_incremental_assign(
    corpus: DataFrame | None,
    delta: DataFrame,
    corpus_signatures: DataFrame | None = None,
    broadcast_delta: bool = True,
) -> DataFrame:
    """(conv_id, rep_conv_id) for every DELTA conversation.

    rep_conv_id is the min-conv_id corpus member whose conversation
    signature (canonicalize.conversation_signatures — per-turn sha2
    digests in stable turn order) matches, else the min conv_id within
    the delta's own signature group (so within-batch dups collapse the
    same way exact_clusters would). Survivors of the batch are the rows
    with rep_conv_id == conv_id; appending those to the corpus keeps the
    corpus exactly-deduplicated (min-id rep election is stable under
    union because corpus ids already beat delta ids where signatures
    match).

    corpus_signatures: pass the checkpointed signatures stage table to
    skip the corpus scan + signature groupBy entirely; otherwise they
    are computed from `corpus` (one corpus pass).
    """
    if corpus_signatures is None:
        if corpus is None:
            raise ValueError("need corpus or corpus_signatures")
        corpus_signatures = conversation_signatures(corpus)
    # persisted: the delta signature aggregation feeds BOTH the broadcast
    # key-set branch and the assignment branch; the broadcast build (the
    # first action) populates the cache in passing — no extra job barrier
    sigs_d = (
        conversation_signatures(delta).select("conv_id", "conv_sig").persist()
    )
    keys = sigs_d.select("conv_sig").distinct()
    if broadcast_delta:
        matched = corpus_signatures.join(F.broadcast(keys), "conv_sig", "left_semi")
    else:
        matched = corpus_signatures.join(
            keys.hint("shuffle_hash"), "conv_sig", "left_semi"
        )
    # matched is <= |delta| rows by construction (one corpus signature
    # group per distinct delta signature), so the rep dim broadcasts.
    corpus_reps = matched.groupBy("conv_sig").agg(
        F.min("conv_id").alias("corpus_rep")
    )
    w = Window.partitionBy("conv_sig")
    assigned = sigs_d.select(
        "conv_id",
        "conv_sig",
        F.min("conv_id").over(w).alias("delta_min"),
    )
    reps = F.broadcast(corpus_reps) if broadcast_delta else corpus_reps
    return assigned.join(reps, "conv_sig", "left").select(
        "conv_id",
        F.coalesce("corpus_rep", "delta_min").alias("rep_conv_id"),
    )


def minhash_incremental_pairs(
    corpus: DataFrame | None,
    delta: DataFrame,
    n: int = 3,
    k: int = 128,
    n_bands: int = 16,
    threshold: float = 0.8,
    max_bucket: int = 2000,
    seed: int = 42,
    corpus_sets: DataFrame | None = None,
    corpus_minhash_signatures: DataFrame | None = None,
    broadcast_delta: bool = True,
) -> DataFrame:
    """Verified Jaccard pairs TOUCHING the delta: (corpus x delta) cross
    pairs plus within-delta pairs, (conv_a, conv_b) with conv_a < conv_b.
    Same (n, k, n_bands, threshold, seed) config as minhash_pairs_fused —
    run it with the config of the corpus's original full pass.

    Plan shape (the 100 TB path): the corpus band table — ideally
    restored from the checkpointed signatures stage of the original run
    (pass corpus_minhash_signatures) — is persisted + sized once
    (buckets.materialize_and_size) and probed by the replicated delta
    bands (salted_cross_pairs: broadcast by default, shuffled-hash
    beyond the delta-broadcast envelope). The delta band table is sized
    once and reused for both the cross probe and its own self-join.
    Shingle data rides the single-exchange set path (shingle_sets; pass
    the checkpointed minhash_shingle_sets stage table as corpus_sets to
    skip even that), and the Jaccard verify reads set rows ONLY for
    conversations that appear in a candidate pair (semi-join pushdown),
    so no corpus-wide aggregation or shingle-sized exchange ever runs.
    """
    if k % n_bands:
        raise ValueError(f"k={k} must be a multiple of n_bands={n_bands}")
    sets_d = shingle_sets(delta, n).persist()
    bands_d, hot_d = materialize_and_size(
        _banded(minhash_signatures_from_sets(sets_d, k, seed), n_bands),
        ["band_id", "band_key"],
        max_bucket,
    )
    if corpus_sets is None:
        if corpus is None:
            raise ValueError("need corpus or corpus_sets")
        # persisted: consumed by the signature stage AND the verify's
        # semi-join below; a checkpointed stage table passed in needs no
        # cache (it is already materialized storage)
        corpus_sets = shingle_sets(corpus, n).persist()
    if corpus_minhash_signatures is None:
        corpus_minhash_signatures = minhash_signatures_from_sets(
            corpus_sets, k, seed
        )
    bands_c = _banded(corpus_minhash_signatures, n_bands)
    cross = salted_cross_pairs(
        bands_c,
        bands_d,
        ["band_id", "band_key"],
        "conv_id",
        max_bucket,
        broadcast_probes=broadcast_delta,
    )
    within = salted_self_pairs(
        bands_d,
        ["band_id", "band_key"],
        "conv_id",
        max_bucket,
        materialize=False,
        hot=hot_d,
    )
    # disjoint by construction (cross pairs have exactly one corpus
    # member, within pairs none; each side is already distinct) — a
    # union-wide distinct would only add an exchange on the pair table.
    # persisted: consumed by the candidate-id derivation (twice, via the
    # union) and the verify join
    cands = cross.union(within).persist()
    ids = (
        cands.select(F.col("conv_a").alias("conv_id"))
        .union(cands.select(F.col("conv_b").alias("conv_id")))
        .distinct()
    )
    ids = F.broadcast(ids) if broadcast_delta else ids.hint("shuffle_hash")
    # localCheckpoint (eager, same role as verify_jaccard_pairs'
    # materialize flag): the pruned set table feeds BOTH candidate-join
    # sides — without it each side re-scans the corpus set table
    sets_needed = (
        corpus_sets.union(sets_d)
        .join(ids, "conv_id", "left_semi")
        .localCheckpoint()
    )
    return verify_jaccard_pairs_from_sets(sets_needed, cands, threshold).select(
        "conv_a", "conv_b"
    )
