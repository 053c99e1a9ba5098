"""Benchmark harness: headline dedup queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "dedup_total", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>, "turns": N,
   "turns_per_sec": ...}

The transcripts input is derived deterministically from documents.parquet
(corpus.build_transcripts) and replicated BENCH_REPLICAS times (default 8)
with a per-replica text perturbation, so dup structure scales linearly and
no external data is used. Scaling-efficiency runs (local[N] vs local[4N])
use tools/scaling_bench.py which shells out to this file.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F

from fastq_dupaway_spark.canonicalize import conversation_texts
from fastq_dupaway_spark.clustering import clusters_with_singletons
from fastq_dupaway_spark.corpus import build_transcripts
from fastq_dupaway_spark.detectors import exact
from fastq_dupaway_spark.detectors.hamming_exact import hamming_pairs_exact
from fastq_dupaway_spark.detectors.minhash import minhash_pairs
from fastq_dupaway_spark.detectors.parity_scan import parity_clusters
from fastq_dupaway_spark.detectors.simhash import simhash_pairs
from fastq_dupaway_spark.session import get_spark


def replicated_transcripts(spark, sf_dir: str, replicas: int):
    """Deterministic xN corpus preserving intra-replica dup structure while
    making replicas mutually UNRELATED (work must scale ~linearly in
    replicas, not quadratically):

    a replica tag token is interleaved between every pair of original
    tokens (space -> ' q<r> '): every word 3-gram then contains the tag,
    so cross-replica Jaccard is 0; tags are equal-length across replicas,
    so cross-replica char-Hamming is ~#tokens >> d; prefixes can't match
    across replicas either. Within a replica every planted relation is
    preserved (the rewrite is uniform)."""
    t = build_transcripts(spark, sf_dir)
    if replicas <= 1:
        return t
    r = spark.range(replicas).select(F.col("id").cast("int").alias("replica"))
    return (
        t.crossJoin(F.broadcast(r))
        .select(
            F.concat_ws("#", "conv_id", F.col("replica").cast("string")).alias(
                "conv_id"
            ),
            "turn_idx",
            "role",
            F.expr("replace(text, ' ', concat(' q', replica, ' '))").alias(
                "text"
            ),
            "tool",
        )
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    replicas = int(os.environ.get("BENCH_REPLICAS", "8"))
    # constant work decomposition across parallelism levels: the scaling
    # comparison (local[N] vs local[4N]) must run the IDENTICAL job —
    # only executor threads may differ
    partitions = int(os.environ.get("BENCH_PARTITIONS", "128"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark(
        parallelism=cpus, app_name="bench", shuffle_partitions=partitions
    )
    t = replicated_transcripts(spark, sf_dir, replicas)
    t = t.repartition(partitions).persist()
    n_turns = t.count()
    n_convs = t.select("conv_id").distinct().count()
    ct = conversation_texts(t).persist()
    ct.count()
    # prewarm the Python worker pool so the first pandas-UDF query is not
    # charged ~30s of process spawn (steady-state timing)
    from fastq_dupaway_spark.detectors.simhash import conversation_simhashes

    conversation_simhashes(ct.limit(512)).count()

    timings: dict[str, float] = {}

    def run(name: str, fn) -> None:
        t0 = time.monotonic()
        fn()
        timings[name] = round(time.monotonic() - t0, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr, flush=True)

    run(
        "exact_dedup",
        lambda: exact.exact_clusters(t)
        .where(F.col("conv_id") != F.col("rep_conv_id"))
        .count(),
    )
    run(
        "parity_loose",
        lambda: parity_clusters(ct, "loose", num_partitions=partitions)
        .where(F.col("conv_id") != F.col("rep_conv_id"))
        .count(),
    )
    run(
        "hamming_pairs_exact",
        lambda: hamming_pairs_exact(t, ct, d=2).count(),
    )
    run(
        "simhash_pairs",
        lambda: simhash_pairs(ct, bit_threshold=3).count(),
    )

    def minhash_cc():
        # staged materialization — exactly how the checkpointed pipeline
        # executes (each stage lands in a table); a single lazy DAG here
        # recomputes the shared shingle table and invites AQE replans
        from fastq_dupaway_spark.detectors import minhash as mh

        sh = mh.shingle_hashes(t, 3).persist()
        sh.count()
        sigs = mh.minhash_signatures(sh, 128).persist()
        sigs.count()
        cands = mh.lsh_candidates(sigs, 16).persist()
        cands.count()
        pairs = mh.verify_jaccard_pairs(sh, cands, 0.8).select(
            "conv_a", "conv_b"
        ).persist()
        pairs.count()
        clusters_with_singletons(ct.select("conv_id"), pairs).where(
            F.col("conv_id") != F.col("rep_conv_id")
        ).count()
        for df in (sh, sigs, cands, pairs):
            df.unpersist()

    run("minhash_lsh_cc", minhash_cc)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "dedup_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "replicas": replicas,
                "turns": n_turns,
                "convs": n_convs,
                "turns_per_sec": round(n_turns * len(timings) / total, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
