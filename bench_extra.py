"""Per-stage profiling harness for the optimization round (guide §1).

NOT the official bench (bench.py is frozen for measurement): this file
isolates each heavy bench row standalone with sub-stage timings, noop-sink
isolation where useful, and job descriptions, so OPTIMIZATION_r06.md can
cite where each row's seconds actually go. Corpus construction is imported
from bench.py so the data is bit-identical to the official suite.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      python bench_extra.py [row ...]
rows: parity hamming simhash containment char_containment semantic minhash
      exact recall   (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F

import bench as B
from fastq_dupaway_spark.canonicalize import conversation_texts
from fastq_dupaway_spark.clustering import clusters_with_singletons
from fastq_dupaway_spark.session import get_spark

MAX_BUCKET = B.MAX_BUCKET
T = {}


def timed(name):
    class _Ctx:
        def __enter__(self):
            self.t0 = time.monotonic()
            return self

        def __exit__(self, *a):
            T[name] = round(time.monotonic() - self.t0, 3)
            print(f"## {name}: {T[name]}s", file=sys.stderr, flush=True)

    return _Ctx()


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    rows = set(sys.argv[1:]) or {
        "exact", "parity", "hamming", "simhash", "containment",
        "char_containment", "semantic", "minhash", "recall",
    }
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    replicas = int(os.environ.get("BENCH_REPLICAS", "8"))
    B.HOT_MOD = 42 * max(replicas, 1)
    partitions = int(os.environ.get("BENCH_PARTITIONS", "64"))
    spark = get_spark(parallelism=cpus, app_name="bench_extra",
                      shuffle_partitions=partitions)
    sc = spark.sparkContext

    t = B.replicated_transcripts(spark, sf_dir, replicas)
    t = t.repartition(partitions).persist()
    t.count()
    ct = conversation_texts(t).persist()
    ct.count()
    # python worker prewarm, mirroring bench.py
    from fastq_dupaway_spark.detectors.minhash import (
        minhash_signatures_from_sets, shingle_sets,
    )
    minhash_signatures_from_sets(shingle_sets(t.limit(512), 3), k=8).count()

    def gc():
        import gc as _g
        _g.collect()
        sc._jvm.System.gc()

    if "exact" in rows:
        from fastq_dupaway_spark.detectors import exact
        sc.setJobDescription("exact: clusters")
        with timed("exact_total"):
            ec = exact.exact_clusters(t).persist()
            ec.where(F.col("conv_id") != F.col("rep_conv_id")).count()
        ec.unpersist()
        gc()

    if "parity" in rows:
        from fastq_dupaway_spark.detectors.parity_scan import parity_clusters
        sc.setJobDescription("parity: loose")
        with timed("parity_total"):
            pc = parity_clusters(ct, "loose", num_partitions=partitions).persist()
            pc.where(F.col("conv_id") != F.col("rep_conv_id")).count()
        pc.unpersist()
        gc()

    if "hamming" in rows:
        from fastq_dupaway_spark.detectors.hamming_exact import (
            _chunk_blocks, hamming_candidates,
        )
        from fastq_dupaway_spark.detectors.simhash import verify_hamming_pairs
        sc.setJobDescription("hamming: blocks noop")
        with timed("hamming_blocks_noop"):
            noop(_chunk_blocks(t, 2))
        gc()
        sc.setJobDescription("hamming: candidates")
        with timed("hamming_candidates"):
            cands = hamming_candidates(t, 2, MAX_BUCKET).persist()
            n = cands.count()
        print(f"## hamming n_cands={n}", file=sys.stderr)
        sc.setJobDescription("hamming: verify")
        with timed("hamming_verify"):
            verify_hamming_pairs(ct, cands, 2).count()
        cands.unpersist()
        gc()
        sc.setJobDescription("hamming: full row (bench shape)")
        from fastq_dupaway_spark.detectors.hamming_exact import hamming_pairs_exact
        with timed("hamming_total"):
            p = hamming_pairs_exact(t, ct, d=2, max_bucket=MAX_BUCKET).persist()
            p.count()
        p.unpersist()
        gc()

    if "simhash" in rows:
        from fastq_dupaway_spark.detectors.simhash import (
            conversation_simhashes, simhash_pairs,
        )
        sc.setJobDescription("simhash: hashes noop")
        with timed("simhash_hashes_noop"):
            noop(conversation_simhashes(ct))
        gc()
        sc.setJobDescription("simhash: full row")
        with timed("simhash_total"):
            simhash_pairs(ct, bit_threshold=3, max_bucket=MAX_BUCKET).count()
        gc()

    if "containment" in rows:
        from fastq_dupaway_spark.detectors.containment import containment_pairs
        sc.setJobDescription("containment: full row")
        with timed("containment_total"):
            p = containment_pairs(ct, max_bucket=MAX_BUCKET).persist()
            p.count()
        p.unpersist()
        gc()

    if "char_containment" in rows:
        from fastq_dupaway_spark.detectors import containment as C
        sc.setJobDescription("charc: gram path")
        with timed("charc_gram"):
            C._gram_path_pairs(ct, MAX_BUCKET).count()
        gc()
        sc.setJobDescription("charc: short needles")
        with timed("charc_short"):
            C._short_needle_pairs(ct).count()
        gc()
        sc.setJobDescription("charc: shared blocks + boundary + tail")
        with timed("charc_boundary_tail"):
            shared = C._shared_suffix_blocks(ct, MAX_BUCKET)
            C.containment_pairs(ct, MAX_BUCKET, shared).count()
            C._tail_path_pairs(ct, MAX_BUCKET, shared).count()
        gc()
        sc.setJobDescription("charc: full row")
        with timed("charc_total"):
            C.char_containment_pairs(ct, max_bucket=MAX_BUCKET).count()
        gc()

    if "semantic" in rows:
        from fastq_dupaway_spark.detectors.semantic import (
            semantic_candidates, verify_cosine_pairs,
        )
        sc.setJobDescription("semantic: embeddings persist")
        with timed("semantic_emb"):
            emb = B.conv_embeddings(spark, t, sf_dir).persist()
            emb.count()
        sc.setJobDescription("semantic: candidates")
        with timed("semantic_cands"):
            cands = semantic_candidates(
                emb, n_planes=20, n_tables=8, dim=64, max_bucket=MAX_BUCKET
            ).persist()
            n = cands.count()
        print(f"## semantic n_cands={n}", file=sys.stderr)
        sc.setJobDescription("semantic: verify")
        with timed("semantic_verify"):
            p = verify_cosine_pairs(emb, cands, 0.9).persist()
            p.count()
        sc.setJobDescription("semantic: recall")
        with timed("semantic_recall"):
            expected = B.planted_semantic_pairs(t)
            B._recall_counts(expected, p)
        cands.unpersist(); emb.unpersist(); p.unpersist()
        gc()

    if "minhash" in rows:
        from fastq_dupaway_spark.detectors.minhash import (
            lsh_candidates, minhash_signatures_from_sets, shingle_sets,
            verify_jaccard_pairs_from_sets,
        )
        sc.setJobDescription("minhash: sets noop")
        with timed("minhash_sets_noop"):
            noop(shingle_sets(t, 3))
        gc()
        with timed("minhash_total"):
            sc.setJobDescription("minhash: cands (sets+sigs+bands+sizing)")
            with timed("minhash_cands"):
                sets = shingle_sets(t, 3).persist()
                cands = lsh_candidates(
                    minhash_signatures_from_sets(sets, 128), 16,
                    max_bucket=MAX_BUCKET,
                ).persist()
                n = cands.count()
            print(f"## minhash n_cands={n}", file=sys.stderr)
            sc.setJobDescription("minhash: verify")
            with timed("minhash_verify"):
                pairs = verify_jaccard_pairs_from_sets(sets, cands, 0.8).select(
                    "conv_a", "conv_b"
                ).persist()
                pairs.count()
            sc.setJobDescription("minhash: cc")
            with timed("minhash_cc"):
                stats = {}
                clusters_with_singletons(
                    ct.select("conv_id"), pairs, stats=stats
                ).where(F.col("conv_id") != F.col("rep_conv_id")).count()
            print(f"## cc_rounds={stats.get('cc_rounds')}", file=sys.stderr)
        sets.unpersist(); cands.unpersist(); pairs.unpersist()
        gc()

    print(json.dumps(T))
    spark.stop()


if __name__ == "__main__":
    main()
