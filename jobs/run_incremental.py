"""spark-submit entrypoint for the incremental (delta-vs-corpus) dedup job.

The daily-batch pattern a 100 TB training-data pipeline actually runs:
a bounded delta of new transcripts is deduplicated AGAINST the existing,
already-deduplicated corpus without re-processing the corpus (no
reference analog — fastq-dupaway dedups one closed file per run,
/root/reference/src/main.cpp:40-179).

Usage (cluster):
  spark-submit --py-files fastq_dupaway_spark.zip jobs/run_incremental.py \
      --corpus /path/corpus.parquet --delta /path/delta.parquet \
      --output /path/out --detectors exact,minhash \
      [--corpus-signatures /ckpt/signatures] [--jaccard 0.8] \
      [--no-broadcast-delta]

Outputs under --output:
  assignments/   (conv_id, rep_conv_id) for every delta conversation
                 (exact detector; rep is a corpus conv where matched)
  pairs/         (conv_a, conv_b) verified Jaccard pairs touching the
                 delta (minhash detector)
  survivors/     delta transcript rows whose conversation is a batch
                 survivor (exact rep == itself) — appendable to the
                 corpus while keeping it exactly-deduplicated
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="incremental transcript dedup")
    p.add_argument("--corpus", help="existing deduplicated corpus parquet")
    p.add_argument("--delta", required=True, help="new batch parquet")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument(
        "--detectors",
        default="exact",
        help="comma list: exact,minhash",
    )
    p.add_argument(
        "--corpus-signatures",
        help="checkpointed conversation-signatures stage table of the "
        "corpus (skips the corpus scan for the exact detector)",
    )
    p.add_argument("--jaccard", type=float, default=0.8)
    p.add_argument("--shingle-n", type=int, default=3)
    p.add_argument("--minhash-k", type=int, default=128)
    p.add_argument("--bands", type=int, default=16)
    p.add_argument("--max-bucket", type=int, default=2000)
    p.add_argument(
        "--no-broadcast-delta",
        action="store_true",
        help="beyond the delta-broadcast envelope (~10^7-10^8 delta "
        "conversations): route delta-derived key/probe joins through "
        "co-partitioned shuffled-hash joins instead of broadcasts",
    )
    p.add_argument("--cpus", type=int, default=None)
    args = p.parse_args(argv)
    dets = {d.strip() for d in args.detectors.split(",") if d.strip()}
    unknown = dets - {"exact", "minhash"}
    if unknown:
        p.error(f"unknown detectors: {sorted(unknown)}")
    if not args.corpus and not args.corpus_signatures:
        p.error("need --corpus or --corpus-signatures")
    if "minhash" in dets and not args.corpus:
        p.error("--detectors minhash requires --corpus (shingle sets are "
                "needed for the Jaccard verify)")
    if args.minhash_k % args.bands:
        p.error(f"--minhash-k {args.minhash_k} must be a multiple of "
                f"--bands {args.bands}")
    return args


def main(argv=None) -> None:
    args = parse_args(argv)
    from pyspark.sql import functions as F

    from fastq_dupaway_spark.incremental import (
        exact_incremental_assign,
        minhash_incremental_pairs,
    )
    from fastq_dupaway_spark.session import get_spark
    from pyspark.sql import SparkSession

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(parallelism=args.cpus, app_name="run-incremental")
    dets = {d.strip() for d in args.detectors.split(",") if d.strip()}
    corpus = spark.read.parquet(args.corpus) if args.corpus else None
    delta = spark.read.parquet(args.delta)
    corpus_sigs = (
        spark.read.parquet(args.corpus_signatures)
        if args.corpus_signatures
        else None
    )
    broadcast = not args.no_broadcast_delta

    counters = []
    if "exact" in dets:
        assign = exact_incremental_assign(
            corpus, delta,
            corpus_signatures=corpus_sigs,
            broadcast_delta=broadcast,
        ).persist()
        assign.write.mode("overwrite").parquet(f"{args.output}/assignments")
        survivors = delta.join(
            assign.where(F.col("conv_id") == F.col("rep_conv_id"))
            .select("conv_id"),
            "conv_id",
            "left_semi",
        )
        survivors.write.mode("overwrite").parquet(f"{args.output}/survivors")
        n_delta = assign.count()
        n_surv = assign.where(
            F.col("conv_id") == F.col("rep_conv_id")
        ).count()
        counters.append(
            f"delta_convs={n_delta} batch_dups={n_delta - n_surv} "
            f"batch_survivors={n_surv}"
        )
        assign.unpersist()
    if "minhash" in dets:
        pairs = minhash_incremental_pairs(
            corpus, delta,
            n=args.shingle_n,
            k=args.minhash_k,
            n_bands=args.bands,
            threshold=args.jaccard,
            max_bucket=args.max_bucket,
            broadcast_delta=broadcast,
        ).persist()
        pairs.write.mode("overwrite").parquet(f"{args.output}/pairs")
        counters.append(f"jaccard_pairs={pairs.count()}")
        pairs.unpersist()
    print(" ".join(counters))
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
