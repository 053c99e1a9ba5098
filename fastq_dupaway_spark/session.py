"""SparkSession factory tuned for the dedup pipeline.

Local-mode testing runs a single JVM with N executor threads; on a real
cluster the same configs apply per executor. AQE is always on: the
candidate-pair self-joins produce runtime-skewed partitions (hot LSH
buckets) that AQE's skew-join splitting handles, per SURVEY.md §4.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    parallelism: int | None = None,
    app_name: str = "transcript-dedup",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    parallelism: local[N] thread count; defaults to $SPARK_GRAFT_CPUS or '*'.
    shuffle_partitions: defaults to parallelism (local mode: match cores,
    not the 200 default — avoids tiny-partition overhead at test scale
    while staying proportional on a real cluster where AQE coalesces).
    """
    if parallelism is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        cores = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{parallelism}]"
        cores = parallelism
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)

    # shuffle I/O: the bypass-merge writer opens one file per reduce
    # partition per map task (P*M opens per shuffle) — a syscall storm on
    # container filesystems that showed up as ~90% system CPU. Force the
    # sort-based writer (one spill file per map task) and keep shuffle
    # scratch on tmpfs when available (reference analog: its v1.5 output
    # buffering existed to cut write syscalls, CHANGELOG.md:14).
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.shuffle.sort.bypassMergeThreshold", "8")
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        # coalescing merges by BYTES; our verify/kernel stages are
        # byte-small but CPU-dense (array intersections, numpy UDFs), and
        # coalescing was observed to serialize them into 1-2 tasks. Keep
        # AQE for skew-join splitting, size partitions via
        # spark.sql.shuffle.partitions instead.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # broadcast threshold stays at the 10 MB default: the sides this
        # pipeline NEEDS broadcast (needle-key sets, salt dims, top-k
        # weight tables) carry explicit F.broadcast hints at the join
        # sites — hints scale with intent, not with size estimates. A
        # global 64m bump was tried at x48 bench scale and made AQE
        # broadcast mid-size salted-bucket tables (driver-built,
        # single-threaded): the minhash row went 85s -> 272s at local[8]
        # while the hinted joins gained nothing the hints didn't already
        # provide.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # deliberately right-sized, not maximal: an oversized lazy-commit
        # heap makes G1 fault in fresh pages forever instead of reusing
        # collected ones — measured 60% kernel CPU and a 4x slowdown at
        # 48g on this VM vs 12g. Override with SPARK_DRIVER_MEM for big
        # inputs.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        # GC threads default to the MACHINE core count (32 here) even for
        # local[2] — on this VM idle GC workers burn kernel time and
        # distort small-parallelism runs; scale them with task threads.
        .config(
            "spark.driver.extraJavaOptions",
            "-Djava.net.preferIPv4Stack=true "
            f"-XX:ParallelGCThreads={max(2, min(cores, 8))} "
            f"-XX:ConcGCThreads={max(1, min(cores, 8) // 4)}",
        )
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
