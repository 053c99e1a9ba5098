"""End-to-end dedup pipeline orchestration.

The Spark lifecycle of SURVEY.md §3.4: canonicalize -> per-detector
signature/candidate stages -> union pair sets -> connected components ->
survivor election -> survivors + clusters + metrics, with every stage
checkpointed (checkpoints.CheckpointStore) for resumability.

The reference's 8-way mode dispatch (/root/reference/src/main.cpp:196-245,
{seq,hash} x {SE,PE} x {fastq,fasta}) becomes one config object: detectors
are composable flags instead of exclusive modes, and SE/PE collapses into
the k-turn conversation model.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .canonicalize import conversation_texts
from .checkpoints import CheckpointStore
from .clustering import clusters_with_singletons
from .detectors import exact
from .detectors.containment import containment_pairs
from .detectors.hamming_exact import hamming_pairs_exact
from .detectors.minhash import minhash_pairs
from .detectors.parity_scan import parity_clusters
from .detectors.simhash import simhash_pairs


@dataclass
class DedupConfig:
    """Detector selection + parameters (reference CLI C1/C2 analog)."""

    exact: bool = True
    minhash: bool = False
    simhash: bool = False
    hamming_exact: bool = False
    containment: bool = False
    # parity_mode: None | 'tight' | 'loose' | 'hamming' — run the
    # reference-run-semantics scan INSTEAD of transitive detectors
    parity_mode: str | None = None
    hamming_d: int = 2
    simhash_bit_threshold: int = 3
    shingle_n: int = 3
    minhash_k: int = 128
    minhash_bands: int = 16
    jaccard_threshold: float = 0.8
    max_bucket: int = 2000
    seed: int = 42

    def params(self) -> dict:
        return {k: getattr(self, k) for k in self.__dataclass_fields__}


@dataclass
class PipelineResult:
    clusters: DataFrame  # (conv_id, rep_conv_id)
    survivors: DataFrame  # transcript rows of representatives, verbatim
    pairs: DataFrame | None
    stages: list[dict] = field(default_factory=list)


def run_pipeline(
    transcripts: DataFrame,
    config: DedupConfig,
    checkpoint_root: str | None = None,
) -> PipelineResult:
    spark = transcripts.sparkSession
    store = CheckpointStore(spark, checkpoint_root) if checkpoint_root else None
    base_params = config.params()
    stages: list[dict] = []

    def stage(name: str, fn, **extra):
        if store is None:
            return fn()
        res = store.materialize(name, fn, {**base_params, "stage": name}, extra)
        stages.append(
            {"stage": name, "rows": res.rows, "resumed": res.resumed}
        )
        return res.df

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
            pair_sets.append(
                stage(
                    "hamming_pairs",
                    lambda: hamming_pairs_exact(
                        transcripts, ct, config.hamming_d, config.max_bucket
                    ),
                )
            )
        if config.containment:
            pair_sets.append(
                stage(
                    "containment_pairs",
                    lambda: containment_pairs(ct, config.max_bucket),
                )
            )
        if config.simhash:
            pair_sets.append(
                stage(
                    "simhash_pairs",
                    lambda: simhash_pairs(
                        ct,
                        bit_threshold=config.simhash_bit_threshold,
                        max_bucket=config.max_bucket,
                    ),
                )
            )
        if config.minhash:
            pair_sets.append(
                stage(
                    "minhash_pairs",
                    lambda: minhash_pairs(
                        transcripts,
                        n=config.shingle_n,
                        k=config.minhash_k,
                        n_bands=config.minhash_bands,
                        threshold=config.jaccard_threshold,
                        max_bucket=config.max_bucket,
                        seed=config.seed,
                    ),
                )
            )
        if not pair_sets:
            raise ValueError("no detector enabled in DedupConfig")
        pairs = pair_sets[0]
        for p in pair_sets[1:]:
            pairs = pairs.unionByName(p)
        pairs = stage("candidate_pairs", lambda: pairs.distinct())
        clusters = stage(
            "components",
            lambda: clusters_with_singletons(ct.select("conv_id"), pairs),
        )

    reps = clusters.where(F.col("conv_id") == F.col("rep_conv_id")).select(
        "conv_id"
    )
    survivors = transcripts.join(reps, "conv_id", "left_semi")
    return PipelineResult(clusters, survivors, pairs, stages)
