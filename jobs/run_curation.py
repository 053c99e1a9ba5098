"""spark-submit entrypoint for one-command training-data curation:
quarantine -> conversation-level quality/language/length filters ->
near-dup pipeline -> curated survivors + audit tables.

The operator-facing composition of the engine's tested pieces (no new
semantics): canonicalize.validate_transcripts (P9 quarantine),
functions/text quality + language heuristics over the conversation
composite, and pipeline.run_pipeline for the detector union. Every
dropped conversation is accounted for — the curation stats line adds up
to the input conversation count, and rejected conversations are written
to an audit table with their reject reason (never silently discarded).

Usage:
  spark-submit --py-files fastq_dupaway_spark.zip jobs/run_curation.py \
      --input transcripts.parquet --output out \
      --min-quality 2000 --langs en,de --min-tokens 8 --max-tokens 100000 \
      --detectors exact,minhash [--checkpoint ckpt]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DETECTORS = {
    "exact", "hamming", "simhash", "minhash", "containment",
    "char_containment", "winnow",
}


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="transcript curation pipeline")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument(
        "--min-quality",
        type=int,
        default=0,
        help="minimum quality_score_x10k (0..10000) on the conversation "
        "composite; 0 disables",
    )
    p.add_argument(
        "--langs",
        default="",
        help="comma list of lang_guess codes to KEEP (empty = keep all)",
    )
    p.add_argument("--min-tokens", type=int, default=0)
    p.add_argument(
        "--max-tokens", type=int, default=0, help="0 disables the cap"
    )
    p.add_argument("--detectors", default="exact")
    p.add_argument("--checkpoint")
    p.add_argument("--winnow-min-shared", type=int, default=8)
    p.add_argument("--winnow-max-df", type=int, default=2000)
    p.add_argument("--max-bucket", type=int, default=2000)
    p.add_argument("--minhash-agg", action="store_true")
    p.add_argument("--cpus", type=int, default=None)
    args = p.parse_args(argv)
    dets = {d.strip() for d in args.detectors.split(",") if d.strip()}
    unknown = dets - DETECTORS
    if unknown:
        p.error(f"unknown detectors: {sorted(unknown)}")
    if args.min_quality < 0 or args.min_quality > 10000:
        p.error("--min-quality must be in [0, 10000]")
    if args.max_tokens and args.max_tokens < args.min_tokens:
        p.error("--max-tokens must be >= --min-tokens")
    return args


def main(argv=None) -> None:
    args = parse_args(argv)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from fastq_dupaway_spark.canonicalize import conversation_texts
    from fastq_dupaway_spark.functions import text as TX
    from fastq_dupaway_spark.pipeline import DedupConfig, run_pipeline
    from fastq_dupaway_spark.session import get_spark

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(parallelism=args.cpus, app_name="run-curation")
    t = spark.read.parquet(args.input)

    # conversation-level features over the composite text (filters are
    # per conversation: a transcript is kept or rejected whole)
    comp = conversation_texts(t).select(
        "conv_id", F.concat_ws(" ", "texts").alias("ctext")
    )
    c = F.col("ctext")
    feats = comp.select(
        "conv_id",
        TX.token_count(c).alias("n_tokens"),
        TX.quality_score_x10k(c).alias("quality_score_x10k"),
        TX.lang_guess(c).alias("lang_guess"),
    )
    keep_langs = [x.strip() for x in args.langs.split(",") if x.strip()]
    reject = (
        F.when(
            F.col("quality_score_x10k") < args.min_quality, "low_quality"
        )
        .when(
            ~F.col("lang_guess").isin(*keep_langs)
            if keep_langs
            else F.lit(False),
            "lang",
        )
        .when(F.col("n_tokens") < args.min_tokens, "too_short")
        .when(
            (F.col("n_tokens") > args.max_tokens)
            if args.max_tokens
            else F.lit(False),
            "too_long",
        )
    )
    flagged = feats.withColumn("reject_reason", reject).persist()
    rejected = flagged.where(F.col("reject_reason").isNotNull())
    # audit table: every dropped conversation with its reason + features
    rejected.write.mode("overwrite").parquet(f"{args.output}/rejected")
    kept_ids = flagged.where(F.col("reject_reason").isNull()).select("conv_id")
    kept = t.join(kept_ids, "conv_id", "left_semi")

    dets = {d.strip() for d in args.detectors.split(",") if d.strip()}
    cfg = DedupConfig(
        exact="exact" in dets,
        hamming_exact="hamming" in dets,
        simhash="simhash" in dets,
        minhash="minhash" in dets,
        minhash_path="agg" if args.minhash_agg else "set",
        containment="containment" in dets,
        char_containment="char_containment" in dets,
        winnow="winnow" in dets,
        winnow_min_shared=args.winnow_min_shared,
        winnow_max_df=args.winnow_max_df,
        max_bucket=args.max_bucket,
    )
    res = run_pipeline(kept, cfg, checkpoint_root=args.checkpoint)
    res.survivors.write.mode("overwrite").parquet(f"{args.output}/survivors")
    res.clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")

    # exact accounting in two aggregations (reject reasons; dedup counts)
    reasons = {
        r["reject_reason"]: r["n"]
        for r in flagged.groupBy("reject_reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    summary = res.clusters.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(
            (F.col("conv_id") == F.col("rep_conv_id")).cast("int")
        ).alias("n_surv"),
    ).first()
    n_kept, n_surv = summary["n_kept"], summary["n_surv"] or 0
    n_quar = 0
    if res.quarantined is not None:
        n_quar = res.quarantined.select("conv_id").distinct().count()
    parts = [
        f"tot_convs={sum(reasons.values())}",
        f"kept={reasons.get(None, 0)}",
        *(
            f"rejected_{k}={v}"
            for k, v in sorted(
                (k, v) for k, v in reasons.items() if k is not None
            )
        ),
        f"quarantined_convs={n_quar}",
        f"dedup_survivors={n_surv}",
        f"dup_convs={n_kept - n_surv}",
    ]
    print(" ".join(parts))
    flagged.unpersist()
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
