"""End-to-end dedup pipeline orchestration.

The Spark lifecycle of SURVEY.md §3.4: quarantine -> canonicalize ->
per-detector signature/candidate stages -> union pair sets -> connected
components -> survivor election -> survivors + clusters + metrics, with
every stage checkpointed (checkpoints.CheckpointStore) for resumability —
the north rule's "signatures, bands, candidate pairs, components" stage
list, each with per-partition lineage, observed counters, and a
hot-bucket quarantine table per detector.

The reference's 8-way mode dispatch (/root/reference/src/main.cpp:196-245,
{seq,hash} x {SE,PE} x {fastq,fasta}) becomes one config object: detectors
are composable flags instead of exclusive modes, and SE/PE collapses into
the k-turn conversation model.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .canonicalize import conversation_texts, validate_transcripts
from .checkpoints import CheckpointStore
from .clustering import clusters_with_singletons
from .detectors import exact
from .detectors.containment import containment_hot_buckets, containment_pairs
from .detectors.hamming_exact import (
    hamming_candidates,
    hamming_hot_buckets,
)
from .detectors.minhash import (
    lsh_candidates,
    lsh_hot_buckets,
    minhash_pairs_fused,
    minhash_signatures_from_sets,
    shingle_sets,
    verify_jaccard_pairs_from_sets,
)
from .detectors.parity_scan import parity_clusters
from .detectors.simhash import (
    candidate_pairs as simhash_candidates,
    conversation_simhashes,
    simhash_hot_buckets,
    simhash_pairs,
    verify_hamming_pairs,
)


@dataclass
class DedupConfig:
    """Detector selection + parameters (reference CLI C1/C2 analog)."""

    exact: bool = True
    minhash: bool = False
    simhash: bool = False
    hamming_exact: bool = False
    containment: bool = False
    # char-level generalized substring containment (needle ANYWHERE in
    # the container composite, not just at turn boundaries)
    char_containment: bool = False
    # gram-index stride for char_containment — EXACT at every value
    # (containment.GRAM_STRIDE proof); higher = smaller gram index,
    # 1 = the dense index
    char_gram_stride: int = 4
    # EXTREME tier (recall < 1, documented): pair a LARGE stride with
    # sampled=True — mid-length needles are gram-blocked at alignment
    # coverage (len - GRAM_LEN + 1) / stride instead of widening the
    # multi-needle scan; precision stays 1.0. Default off: exact.
    char_sampled: bool = False
    # needle-key pushdown strategy for the containment detectors
    # (containment._needle_key_semi_join): True broadcasts the distinct
    # needle-key set (one 8-byte hash per conversation — the default,
    # good to ~10^8 conversations / ~1-2 GB per executor); False is the
    # beyond-envelope fallback, a co-partitioned shuffled-hash semi-join
    # that never materializes the key set on executors
    broadcast_needle_keys: bool = True
    # semantic (embedding-cosine) detector: uses the embeddings frame
    # (conv_id, embedding array<float>) passed to run_pipeline, or —
    # with semantic_embedder="feature_hash" — derives deterministic
    # hashing-trick vectors from the text itself (functions/embed.py)
    semantic: bool = False
    semantic_embedder: str = "external"  # "external" | "feature_hash"
    # winnowing fingerprint detector (Schleimer et al. SIGMOD'03,
    # detectors/winnow.py): conversations sharing >= winnow_min_shared
    # rolling-hash fingerprints over the turn-composite text
    winnow: bool = False
    winnow_k: int = 16
    winnow_w: int = 8
    winnow_min_shared: int = 8
    # document-frequency cap: fingerprints in more than this many
    # conversations (boilerplate) are excluded from pair generation and
    # surfaced via the winnow_hot_fingerprints stage; None = uncapped
    winnow_max_df: int | None = 2000
    # parity_mode: None | 'tight' | 'loose' | 'hamming' — run the
    # reference-run-semantics scan INSTEAD of transitive detectors
    parity_mode: str | None = None
    # P9 quarantine pre-stage: route conversations with NULL /
    # control-char text to a quarantine table instead of aborting
    quarantine: bool = True
    hamming_d: int = 2
    simhash_bit_threshold: int = 3
    # tf-idf-weighted simhash: restores band selectivity on natural text
    # where shared boilerplate compresses unweighted simhash distances
    simhash_weighted: bool = False
    simhash_idf_top_k: int = 1 << 15
    # idf aggregation sample fraction (1.0 = full corpus); heavy-token
    # ranks are sampling-stable, so < 1 is the 100 TB setting — it turns
    # the one corpus-wide (conv, token) distinct aggregation into a
    # sample-sized one
    simhash_idf_sample: float = 1.0
    shingle_n: int = 3
    minhash_k: int = 128
    minhash_bands: int = 16
    # "set" (default): ONE exchange of deduped shingle sets reused by
    # signatures + verify — best when most conversations are candidates
    # (dup-heavy corpora). "agg": signatures via k JVM min-aggregations
    # (full shingle rows never shuffle) + candidate-scoped verify sets —
    # best at sparse duplicate rates, where the verify exchange shrinks
    # from the corpus to the candidate set (minhash.minhash_pairs_agg).
    minhash_path: str = "set"
    jaccard_threshold: float = 0.8
    semantic_threshold: float = 0.9
    semantic_planes: int = 8
    semantic_tables: int = 6
    # None = infer from the first embedding row at pipeline start
    semantic_dim: int | None = None
    max_bucket: int = 2000
    seed: int = 42

    def __post_init__(self):
        # guard at the config boundary: the checkpointed pipeline calls
        # lsh_candidates directly, where a non-divisible k would silently
        # truncate the trailing signature rows (minhash._banded)
        if self.minhash_k % self.minhash_bands:
            raise ValueError(
                f"minhash_k={self.minhash_k} must be a multiple of "
                f"minhash_bands={self.minhash_bands}"
            )
        if self.minhash_path not in ("set", "agg"):
            raise ValueError(
                f"minhash_path must be 'set' or 'agg', got "
                f"{self.minhash_path!r}"
            )

    def params(self) -> dict:
        return {k: getattr(self, k) for k in self.__dataclass_fields__}


@dataclass
class PipelineResult:
    clusters: DataFrame  # (conv_id, rep_conv_id)
    survivors: DataFrame  # transcript rows of representatives, verbatim
    pairs: DataFrame | None
    quarantined: DataFrame | None = None
    stages: list[dict] = field(default_factory=list)


def run_pipeline(
    transcripts: DataFrame,
    config: DedupConfig,
    checkpoint_root: str | None = None,
    embeddings: DataFrame | None = None,
) -> PipelineResult:
    """embeddings: (conv_id, embedding array<float>) — required when
    config.semantic with the default external embedder (a real encoder on
    a real cluster produces it); with
    config.semantic_embedder="feature_hash" the pipeline derives
    hashing-trick vectors from the text itself instead."""
    if (
        config.semantic
        and embeddings is None
        and config.semantic_embedder != "feature_hash"
    ):
        raise ValueError(
            "config.semantic requires an embeddings DataFrame (or "
            "semantic_embedder='feature_hash')"
        )
    spark = transcripts.sparkSession
    store = CheckpointStore(spark, checkpoint_root) if checkpoint_root else None
    base_params = config.params()
    stages: list[dict] = []

    def stage(name: str, fn, observe=None, extra: dict | None = None):
        # `extra` is passed BY REFERENCE into materialize: df_fn() may
        # fill it while running (e.g. CC round stats), and materialize
        # merges it into the manifest only after the stage completes
        if store is None:
            return fn()
        res = store.materialize(
            name, fn, {**base_params, "stage": name}, extra, observe=observe
        )
        stages.append(
            {
                "stage": name,
                "rows": res.rows,
                "resumed": res.resumed,
                "metrics": res.metrics,
            }
        )
        return res.df

    quarantined = None
    if config.quarantine:
        clean, quar = validate_transcripts(transcripts)
        quarantined = stage("quarantine", lambda: quar)
        transcripts = clean

    ct = stage("conversation_texts", lambda: conversation_texts(transcripts))

    if config.parity_mode:
        clusters = stage(
            f"parity_{config.parity_mode}",
            lambda: parity_clusters(
                ct, config.parity_mode, d=config.hamming_d
            ),
        )
        pairs = None
    else:
        pair_sets: list[DataFrame] = []
        if config.exact:
            # exact clusters expressed as pairs (member -> rep) so all
            # detectors merge in one components pass
            ec = stage("exact_clusters", lambda: exact.exact_clusters(transcripts))
            pair_sets.append(
                ec.where(F.col("conv_id") != F.col("rep_conv_id")).select(
                    F.col("rep_conv_id").alias("conv_a"),
                    F.col("conv_id").alias("conv_b"),
                )
            )
        if config.hamming_exact:
            if store is None:
                from .detectors.hamming_exact import hamming_pairs_exact

                pair_sets.append(
                    hamming_pairs_exact(
                        transcripts, ct, config.hamming_d, config.max_bucket
                    )
                )
            else:
                stage(
                    "hamming_hot_buckets",
                    lambda: hamming_hot_buckets(
                        transcripts, config.hamming_d, config.max_bucket
                    ),
                )
                hc = stage(
                    "hamming_candidates",
                    lambda: hamming_candidates(
                        transcripts, config.hamming_d, config.max_bucket
                    ),
                )
                pair_sets.append(
                    stage(
                        "hamming_pairs",
                        lambda: verify_hamming_pairs(ct, hc, config.hamming_d),
                    )
                )
        if config.containment:
            if store is not None:
                stage(
                    "containment_hot_buckets",
                    lambda: containment_hot_buckets(
                        ct,
                        config.max_bucket,
                        broadcast_needles=config.broadcast_needle_keys,
                    ),
                )
            pair_sets.append(
                stage(
                    "containment_pairs",
                    lambda: containment_pairs(
                        ct,
                        config.max_bucket,
                        broadcast_needles=config.broadcast_needle_keys,
                    ),
                )
            )
        if config.char_containment:
            from .detectors.containment import (
                char_containment_pairs,
                unindexed_short_needles,
            )

            if store is not None:
                # quarantine surface: short single-turn needles beyond the
                # broadcast probe cap (empty on non-pathological corpora;
                # the manifest row count makes any loss visible)
                stage(
                    "containment_unindexed_needles",
                    lambda: unindexed_short_needles(
                        ct,
                        stride=config.char_gram_stride,
                        sampled=config.char_sampled,
                    ),
                )
            pair_sets.append(
                stage(
                    "char_containment_pairs",
                    lambda: char_containment_pairs(
                        ct,
                        config.max_bucket,
                        gram_stride=config.char_gram_stride,
                        sampled=config.char_sampled,
                        broadcast_needles=config.broadcast_needle_keys,
                    ),
                )
            )
        if config.winnow:
            from .detectors.winnow import (
                winnow_dup_pairs,
                winnow_fingerprints,
                winnow_hot_fingerprints,
                winnow_pairs_from_fingerprints,
            )

            comp = ct.select(
                "conv_id", F.concat_ws("\x1f", "texts").alias("text")
            )
            if store is None:
                pair_sets.append(
                    winnow_dup_pairs(
                        comp,
                        k=config.winnow_k,
                        w=config.winnow_w,
                        min_shared=config.winnow_min_shared,
                        max_df=config.winnow_max_df,
                    ).select("conv_a", "conv_b")
                )
            else:
                wf = stage(
                    "winnow_fingerprints",
                    lambda: winnow_fingerprints(
                        comp, "conv_id", "text", config.winnow_k,
                        config.winnow_w,
                    ),
                )
                if config.winnow_max_df is not None:
                    # boilerplate quarantine surface (the fingerprints
                    # excluded from pair generation, with their df)
                    stage(
                        "winnow_hot_fingerprints",
                        lambda: winnow_hot_fingerprints(
                            wf, config.winnow_max_df
                        ),
                    )
                pair_sets.append(
                    stage(
                        "winnow_pairs",
                        lambda: winnow_pairs_from_fingerprints(
                            wf,
                            min_shared=config.winnow_min_shared,
                            max_df=config.winnow_max_df,
                        ).select("conv_a", "conv_b"),
                    )
                )
        if config.simhash:

            def _sims():
                # weights computed lazily so a RESUMED signatures stage
                # skips the idf aggregation job entirely
                if config.simhash_weighted:
                    from .detectors.simhash import (
                        conversation_simhashes_weighted,
                        token_idf_weights,
                    )

                    w, d = token_idf_weights(
                        ct,
                        config.simhash_idf_top_k,
                        config.simhash_idf_sample,
                        config.seed,
                    )
                    return conversation_simhashes_weighted(ct, w, d)
                return conversation_simhashes(ct)

            if store is None:
                if config.simhash_weighted:
                    from .detectors.simhash import simhash_pairs_weighted

                    pair_sets.append(
                        simhash_pairs_weighted(
                            ct,
                            bit_threshold=config.simhash_bit_threshold,
                            max_bucket=config.max_bucket,
                            top_k=config.simhash_idf_top_k,
                            idf_sample_fraction=config.simhash_idf_sample,
                        )
                    )
                else:
                    pair_sets.append(
                        simhash_pairs(
                            ct,
                            bit_threshold=config.simhash_bit_threshold,
                            max_bucket=config.max_bucket,
                        )
                    )
            else:
                sims = stage("simhash_signatures", _sims)
                stage(
                    "simhash_hot_buckets",
                    lambda: simhash_hot_buckets(
                        sims, config.simhash_bit_threshold, config.max_bucket
                    ),
                )
                sc = stage(
                    "simhash_candidates",
                    lambda: simhash_candidates(
                        sims, config.simhash_bit_threshold, config.max_bucket
                    ),
                )
                pair_sets.append(
                    stage(
                        "simhash_pairs",
                        lambda: sc.where(
                            F.bit_count(
                                F.col("sim_a").bitwiseXOR(F.col("sim_b"))
                            )
                            <= config.simhash_bit_threshold
                        ).select("conv_a", "conv_b"),
                    )
                )
        if config.minhash and config.minhash_path == "agg":
            from .detectors.minhash import (
                minhash_pairs_agg,
                minhash_signatures_agg,
                shingle_rows,
            )

            if store is None:
                pair_sets.append(
                    minhash_pairs_agg(
                        transcripts,
                        n=config.shingle_n,
                        k=config.minhash_k,
                        n_bands=config.minhash_bands,
                        threshold=config.jaccard_threshold,
                        max_bucket=config.max_bucket,
                        seed=config.seed,
                    )
                )
            else:
                # agg path, staged: signatures are a pure aggregation
                # (no shingle-sized exchange to checkpoint); the verify
                # set table is candidate-scoped so it is derived inside
                # the pairs stage rather than checkpointed corpus-wide
                rows = shingle_rows(transcripts, config.shingle_n)
                sigs = stage(
                    "minhash_signatures",
                    lambda: minhash_signatures_agg(
                        rows, config.minhash_k, config.seed
                    ),
                )
                stage(
                    "minhash_hot_buckets",
                    lambda: lsh_hot_buckets(
                        sigs, config.minhash_bands, config.max_bucket
                    ),
                )
                mc = stage(
                    "minhash_candidates",
                    lambda: lsh_candidates(
                        sigs, config.minhash_bands, config.max_bucket
                    ),
                )

                def _agg_pairs():
                    cand_ids = (
                        mc.select(F.col("conv_a").alias("conv_id"))
                        .unionByName(mc.select(F.col("conv_b").alias("conv_id")))
                        .distinct()
                    )
                    sets = (
                        rows.join(cand_ids, "conv_id", "left_semi")
                        .groupBy("conv_id")
                        .agg(F.collect_set("sh").alias("shs"))
                    )
                    return verify_jaccard_pairs_from_sets(
                        sets, mc, config.jaccard_threshold
                    ).select("conv_a", "conv_b")

                pair_sets.append(stage("minhash_pairs", _agg_pairs))
        elif config.minhash:
            if store is None:
                pair_sets.append(
                    minhash_pairs_fused(
                        transcripts,
                        n=config.shingle_n,
                        k=config.minhash_k,
                        n_bands=config.minhash_bands,
                        threshold=config.jaccard_threshold,
                        max_bucket=config.max_bucket,
                        seed=config.seed,
                    )
                )
            else:
                # the north rule's stage list verbatim: signatures, bands
                # (candidates), pairs — each its own resumable checkpoint.
                # Single-exchange set path (minhash.shingle_sets): the
                # checkpointed set table replaces the shingle-row table
                # and feeds signatures AND the verify with no further
                # shingle-sized exchange.
                sets = stage(
                    "minhash_shingle_sets",
                    lambda: shingle_sets(transcripts, config.shingle_n),
                )
                sigs = stage(
                    "minhash_signatures",
                    lambda: minhash_signatures_from_sets(
                        sets, config.minhash_k, config.seed
                    ),
                )
                stage(
                    "minhash_hot_buckets",
                    lambda: lsh_hot_buckets(
                        sigs, config.minhash_bands, config.max_bucket
                    ),
                )
                mc = stage(
                    "minhash_candidates",
                    lambda: lsh_candidates(
                        sigs, config.minhash_bands, config.max_bucket
                    ),
                )
                pair_sets.append(
                    stage(
                        "minhash_pairs",
                        lambda: verify_jaccard_pairs_from_sets(
                            sets, mc, config.jaccard_threshold
                        ).select("conv_a", "conv_b"),
                    )
                )
        if config.semantic:
            from .detectors.semantic import (
                semantic_candidates,
                semantic_hot_buckets,
                semantic_pairs,
                verify_cosine_pairs,
            )

            if embeddings is None:  # feature_hash mode
                from .functions.embed import feature_hash_embeddings

                dim = config.semantic_dim or 64
                embeddings = stage(
                    "semantic_embeddings",
                    lambda: feature_hash_embeddings(ct, dim),
                )
            else:
                dim = config.semantic_dim
                if dim is None:
                    # one bounded driver action, only when the dim is not
                    # declared; external-encoder users should set
                    # semantic_dim to skip it
                    row = embeddings.select(
                        F.size("embedding").alias("d")
                    ).first()
                    if row is None or row["d"] is None:
                        raise ValueError(
                            "embeddings frame is empty (or first embedding "
                            "is NULL); set config.semantic_dim explicitly"
                        )
                    dim = row["d"]
            sem_args = dict(
                n_planes=config.semantic_planes,
                n_tables=config.semantic_tables,
                dim=dim,
                max_bucket=config.max_bucket,
                seed=config.seed,
            )
            if store is None:
                pair_sets.append(
                    semantic_pairs(
                        embeddings, config.semantic_threshold, **sem_args
                    ).select("conv_a", "conv_b")
                )
            else:
                stage(
                    "semantic_hot_buckets",
                    lambda: semantic_hot_buckets(embeddings, **sem_args),
                )
                sc2 = stage(
                    "semantic_candidates",
                    lambda: semantic_candidates(embeddings, **sem_args),
                )
                pair_sets.append(
                    stage(
                        "semantic_pairs",
                        lambda: verify_cosine_pairs(
                            embeddings, sc2, config.semantic_threshold
                        ).select("conv_a", "conv_b"),
                    )
                )
        if not pair_sets:
            raise ValueError("no detector enabled in DedupConfig")
        pairs = pair_sets[0]
        for p in pair_sets[1:]:
            pairs = pairs.unionByName(p.select("conv_a", "conv_b"))
        pairs = stage("candidate_pairs", lambda: pairs.distinct())
        cc_stats: dict = {}
        clusters = stage(
            "components",
            lambda: clusters_with_singletons(
                ct.select("conv_id"), pairs, stats=cc_stats
            ),
            observe={
                "total_convs": F.count(F.lit(1)),
                "dup_convs": F.sum(
                    F.when(F.col("conv_id") != F.col("rep_conv_id"), 1).otherwise(0)
                ),
            },
            extra=cc_stats,
        )

    reps = clusters.where(F.col("conv_id") == F.col("rep_conv_id")).select(
        "conv_id"
    )
    survivors = transcripts.join(reps, "conv_id", "left_semi")
    return PipelineResult(clusters, survivors, pairs, quarantined, stages)
