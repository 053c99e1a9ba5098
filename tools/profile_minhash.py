"""Phase-level wall-time profile of the minhash_lsh_cc bench row at one
parallelism level — the instrument for the row's N->4N scaling gap.

The bench row is one opaque timing; this splits it at the driver-side
eager boundaries (materialize_and_size's fused collect, cands.count(),
verify's localCheckpoint, the CC loop's per-round checkpoints) so the
phases whose wall time does NOT shrink with cores can be identified by
running this twice:

  taskset -c 0-0 python tools/profile_minhash.py 1 /root/testdata/sf0.1 48
  taskset -c 0-3 python tools/profile_minhash.py 4 /root/testdata/sf0.1 48

Prints one JSON line {"cpus": N, "phases": {...}, "total": s}.
Profiling-only tool: adds one extra action (pairs.count) vs the bench
row, so totals are close to but not identical with bench timings.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

import bench
from fastq_dupaway_spark.clustering import clusters_with_singletons
from fastq_dupaway_spark.detectors.minhash import (
    lsh_candidates,
    minhash_signatures,
    shingle_hashes,
    verify_jaccard_pairs,
)
from fastq_dupaway_spark.session import get_spark


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 48
    bench.HOT_MOD = 42 * replicas
    spark = get_spark(parallelism=cpus, app_name=f"profile-minhash-{cpus}")

    t = bench.replicated_transcripts(spark, sf_dir, replicas).persist()
    t.count()
    # same prewarm as bench.py: python worker pool + JIT
    minhash_signatures(shingle_hashes(t.limit(512), 3), k=8).count()
    spark.sparkContext._jvm.System.gc()

    phases: dict[str, float] = {}

    def mark(name, t0):
        phases[name] = round(time.monotonic() - t0, 3)
        return time.monotonic()

    t0 = time.monotonic()
    sh = shingle_hashes(t, 3).persist()
    # lsh_candidates construction runs the fused persist+size job
    # (shingles -> distinct -> signatures -> banding -> hot collect)
    cands = lsh_candidates(
        minhash_signatures(sh, 128), 16, max_bucket=bench.MAX_BUCKET
    ).persist()
    t0 = mark("fused_sigs_bands_size", t0)
    cands.count()
    t0 = mark("salt_join_distinct", t0)
    # verify construction runs the eager sets localCheckpoint
    pairs = verify_jaccard_pairs(sh, cands, 0.8).select(
        "conv_a", "conv_b"
    )
    t0 = mark("verify_sets_checkpoint", t0)
    pairs = pairs.persist()
    pairs.count()
    t0 = mark("verify_join", t0)
    cc_stats: dict = {}
    clusters_with_singletons(
        t.select("conv_id").distinct(), pairs, stats=cc_stats
    ).where(F.col("conv_id") != F.col("rep_conv_id")).count()
    t0 = mark("cc_and_singletons", t0)
    total = round(sum(phases.values()), 3)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "replicas": replicas,
                "phases": phases,
                "total": total,
                "cc_rounds": cc_stats.get("cc_rounds"),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
