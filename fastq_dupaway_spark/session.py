"""SparkSession factory tuned for the dedup pipeline.

Local-mode testing runs a single JVM with N executor threads; on a real
cluster the same configs apply per executor. AQE is always on: the
candidate-pair self-joins produce runtime-skewed partitions (hot LSH
buckets) that AQE's skew-join splitting handles, per SURVEY.md §4.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def get_spark(
    parallelism: int | None = None,
    app_name: str = "transcript-dedup",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    warmup: bool = True,
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
        # r6: AQE partition coalescing ON, with an explicit parallelism
        # floor. Rounds 1-5 ran it off because coalescing-by-bytes was
        # observed to serialize byte-small CPU-dense kernel stages into
        # 1-2 tasks; the guard is `minPartitionNum = cores`
        # (parallelismFirst semantics): AQE may merge the many tiny
        # exchanges these pipelines produce, but never below one
        # partition per core, so kernel stages keep full parallelism at
        # every core count (including the local[1]/local[4] scaling
        # legs, where coalescing toward the core count is exactly the
        # scale-adaptive behavior wanted). Alternating same-window
        # bench A/B x2: 41.4/45.8 s off vs 41.0/44.2 s on, with the
        # char-containment and simhash rows consistently faster and no
        # row pathological.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionNum",
            str(cores),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE re-optimize the materialization of persisted plans: by
        # default a cached plan keeps its STATIC output partitioning, so
        # persist()+count() ran the full static sort-merge plan while the
        # identical un-persisted count got AQE's runtime join re-planning
        # — measured 2-3x on the detector verify stages (semantic verify
        # persist+count 2.3-3.1 s warm vs 1.0-1.8 s direct; with this
        # flag 1.5-1.9 s). The staged pipeline persists every candidate /
        # verify table, so the static-plan penalty was paid per stage.
        # Trade-off (documented upstream): the cache's output
        # partitioning may change, costing a downstream exchange — every
        # consumer here re-keys anyway (joins/aggregations on different
        # keys), so there is nothing to preserve.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
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
    if warmup:
        _warmup_once(spark)
    return spark


def _warmup_once(spark: SparkSession) -> None:
    """Exercise the hot physical-operator families once on tiny data so
    the first REAL query does not pay JVM JIT / codegen-compiler /
    shuffle-machinery first-execution costs (guide §1: the first
    execution of a heavy pipeline measured 2-3x its warm floor; a fresh
    session running the bench minhash row cold took 14.7-16.4 s vs
    11.6-14.8 s after this warmup, fresh-process A/B x3).

    Covered: hash aggregate + window, sort-merge and broadcast joins,
    range partitioning + sort + mapInPandas + localCheckpoint (the parity
    scan shape), collect_set + explode + distinct + shuffled-hash join
    (the detector banding shape). A few hundred ms of driver time per
    NEW session, guarded by a session tag so getOrCreate reuse never
    repeats it; no user data is touched and nothing is cached."""
    tag = "spark.fastq_dupaway.warmed"
    try:
        if spark.conf.get(tag, None) == "1":
            return
        spark.conf.set(tag, "1")
        from pyspark.sql import Window

        sc = spark.sparkContext
        sc.setJobDescription("session warmup")
        df = spark.range(0, 8192, 1, 4).select(
            F.col("id"),
            (F.col("id") % 63).alias("k"),
            F.col("id").cast("string").alias("s"),
        )
        w = Window.partitionBy("k")
        df.select(F.min("id").over(w)).write.format("noop").mode(
            "overwrite"
        ).save()
        df.alias("a").join(df.alias("b"), "id").select(
            F.count(F.lit(1))
        ).write.format("noop").mode("overwrite").save()
        df.join(
            F.broadcast(df.limit(64).select("id")), "id", "left_semi"
        ).count()

        def _idp(batches):
            for p in batches:
                yield p[["id"]]

        (
            df.repartitionByRange(4, "s")
            .sortWithinPartitions("s")
            .mapInPandas(_idp, "id long")
            .localCheckpoint()
            .count()
        )
        (
            df.groupBy("k")
            .agg(F.collect_set("id").alias("v"))
            .select("k", F.explode("v").alias("x"))
            .distinct()
            .join(df.hint("shuffle_hash"), F.col("x") == F.col("id"))
            .count()
        )
        # array-typed Arrow round-trip (the semantic/minhash verify shape:
        # array columns through ArrowEvalPython) — list-vector Arrow paths
        # JIT separately from the scalar paths above
        import pandas as pd  # noqa: F401  (ships with pyspark extras)

        @F.pandas_udf("double")
        def _wsum(v: "pd.Series") -> "pd.Series":
            import numpy as np

            return pd.Series(
                [float(np.sum(x)) if x is not None else 0.0 for x in v]
            )

        arr = df.select(
            "id", F.array(F.col("id"), F.col("k"), F.lit(1)).alias("v")
        )
        arr.select(_wsum(F.col("v"))).write.format("noop").mode(
            "overwrite"
        ).save()
        sc.setJobDescription(None)
    except Exception:
        # warmup is best-effort: a restricted environment (no pandas, no
        # noop sink) must never block session creation
        pass
