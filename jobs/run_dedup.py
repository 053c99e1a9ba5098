"""spark-submit entrypoint for the transcript dedup pipeline.

Usage (cluster):
  spark-submit --py-files fastq_dupaway_spark.zip jobs/run_dedup.py \
      --input /path/transcripts.parquet --output /path/out \
      --detectors exact,minhash,simhash --checkpoint /path/ckpt \
      --write-clusters

CLI surface mirrors the reference driver
(/root/reference/src/main.cpp:40-179, C1 in SURVEY.md §2.8):

  reference                       | here
  --------------------------------|--------------------------------
  -i/-u input file(s)             | --input table/parquet path (+ --input2
                                  |   for per-turn streams needing resync)
  -o/-p output file(s)            | --output dir (survivors table)
  --compare-seq tight|loose|      | --parity tight|loose|hamming
    tail-hamming                  |   (reference run semantics) or
                                  |   --detectors exact,hamming,simhash,minhash
  --distance N                    | --distance N
  --fast                          | --detectors exact (hash mode IS the
                                  |   exact detector; no sort pass exists)
  --unordered                     | --input2 + automatic conv_id re-sync
  --write-clusters                | --write-clusters
  --mem-limit MB                  | (Spark memory conf; not a job arg)
  invalid combos                  | argparse errors, matching C1 guards
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="transcript near-dup pipeline")
    p.add_argument("--input", required=True, help="transcripts parquet/table path")
    p.add_argument(
        "--input2",
        help="second per-turn stream (reference --unordered mode): rows are "
        "re-synced on conv_id before dedup",
    )
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument(
        "--detectors",
        default="exact",
        help="comma list: exact,hamming,simhash,minhash,containment,"
        "char_containment,semantic,winnow",
    )
    p.add_argument(
        "--embeddings",
        help="parquet of (conv_id, embedding array<float>) for the "
        "semantic detector, or 'auto' to derive deterministic "
        "feature-hash vectors from the text itself",
    )
    p.add_argument(
        "--parity",
        choices=["tight", "loose", "hamming"],
        help="reference run-semantics mode (mutually exclusive with --detectors)",
    )
    p.add_argument("--distance", type=int, default=2, help="hamming distance d")
    p.add_argument("--jaccard", type=float, default=0.8)
    p.add_argument("--checkpoint", help="stage checkpoint root (resumable)")
    p.add_argument("--write-clusters", action="store_true")
    p.add_argument(
        "--no-quarantine",
        action="store_true",
        help="skip the P9 malformed-text quarantine pre-stage (reference "
        "aborts on out-of-alphabet bytes, src/seq_utils.cpp:3-21; the "
        "pipeline quarantines instead — this flag trusts the input)",
    )
    p.add_argument(
        "--simhash-weighted",
        action="store_true",
        help="tf-idf-weight the simhash detector's token votes (restores "
        "band selectivity on boilerplate-heavy corpora)",
    )
    p.add_argument(
        "--no-broadcast-needles",
        action="store_true",
        help="beyond-envelope tier (> ~10^8 conversations) for the "
        "containment detectors: run the needle-key pushdown as a "
        "co-partitioned shuffled-hash semi-join instead of broadcasting "
        "the distinct key set to every executor",
    )
    p.add_argument(
        "--winnow-min-shared",
        type=int,
        default=8,
        help="winnow detector operating point: pairs must share at least "
        "this many distinct fingerprints (raise on template-heavy corpora "
        "-- measured knob in STATUS #18)",
    )
    p.add_argument(
        "--winnow-max-df",
        type=int,
        default=2000,
        help="winnow boilerplate cap: fingerprints in more than this many "
        "conversations are excluded from pair generation and surfaced",
    )
    p.add_argument(
        "--minhash-agg",
        action="store_true",
        help="run the minhash detector on the aggregation path (k JVM "
        "min-aggregations for signatures, candidate-scoped verify sets) "
        "instead of the single-exchange set path — the sparse-duplicate "
        "cluster-scale shape (minhash.minhash_pairs_agg)",
    )
    p.add_argument("--max-bucket", type=int, default=2000)
    p.add_argument("--cpus", type=int, default=None)
    args = p.parse_args(argv)
    if args.parity and args.detectors != "exact":
        p.error("--parity and --detectors are mutually exclusive "
                "(reference guard: mode conflicts, src/main.cpp:147-164)")
    if args.input2 == args.input:
        p.error("--input and --input2 must differ "
                "(reference guard: same-file, src/main.cpp:102-108)")
    dets = {d.strip() for d in args.detectors.split(",") if d.strip()}
    unknown = dets - {
        "exact", "hamming", "simhash", "minhash", "containment",
        "char_containment", "semantic", "winnow",
    }
    if unknown:
        p.error(f"unknown detectors: {sorted(unknown)}")
    if "semantic" in dets and not args.embeddings:
        p.error("--detectors semantic requires --embeddings "
                "(a (conv_id, embedding) parquet, or 'auto')")
    return args


def main(argv=None) -> None:
    args = parse_args(argv)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from fastq_dupaway_spark.pipeline import DedupConfig, run_pipeline
    from fastq_dupaway_spark.resync import resync_streams
    from fastq_dupaway_spark.session import get_spark

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(parallelism=args.cpus, app_name="run-dedup")
    t = spark.read.parquet(args.input)
    if args.input2:
        t = resync_streams(t, spark.read.parquet(args.input2))

    dets = {d.strip() for d in args.detectors.split(",") if d.strip()}
    cfg = DedupConfig(
        exact="exact" in dets,
        hamming_exact="hamming" in dets,
        simhash="simhash" in dets,
        simhash_weighted=args.simhash_weighted,
        minhash="minhash" in dets,
        minhash_path="agg" if args.minhash_agg else "set",
        containment="containment" in dets,
        char_containment="char_containment" in dets,
        semantic="semantic" in dets,
        winnow="winnow" in dets,
        winnow_min_shared=args.winnow_min_shared,
        winnow_max_df=args.winnow_max_df,
        semantic_embedder=(
            "feature_hash" if args.embeddings == "auto" else "external"
        ),
        parity_mode=args.parity,
        quarantine=not args.no_quarantine,
        hamming_d=args.distance,
        jaccard_threshold=args.jaccard,
        max_bucket=args.max_bucket,
        broadcast_needle_keys=not args.no_broadcast_needles,
    )
    emb = (
        spark.read.parquet(args.embeddings)
        if args.embeddings and args.embeddings != "auto"
        else None
    )
    res = run_pipeline(t, cfg, checkpoint_root=args.checkpoint, embeddings=emb)
    res.survivors.write.mode("overwrite").parquet(f"{args.output}/survivors")
    if args.write_clusters:
        res.clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
    n_quar = 0
    if res.quarantined is not None:
        # the counter rides the write job (observe) — no second action
        from pyspark.sql import Observation

        obs = Observation("quarantine_rows")
        res.quarantined.observe(
            obs, F.count(F.lit(1)).alias("n")
        ).write.mode("overwrite").parquet(f"{args.output}/quarantine")
        n_quar = obs.get["n"]
    summary = res.clusters.agg(
        F.count("*").alias("n_all"),
        F.sum(
            (F.col("conv_id") == F.col("rep_conv_id")).cast("int")
        ).alias("n_surv"),
    ).first()
    n_all, n_surv = summary["n_all"], summary["n_surv"] or 0
    # the reference's --verbose counters (src/seq_dup_remover.hpp:107-108)
    print(
        f"tot_convs={n_all} dup_convs={n_all - n_surv} survivors={n_surv} "
        f"quarantined_rows={n_quar}"
    )
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
