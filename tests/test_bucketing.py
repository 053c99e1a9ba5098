"""At-scale shuffle elimination: several docstrings claim the conv_id
groupBy exchange disappears on a conv_id-bucketed table (the parquet
stand-in for Iceberg `bucket(N, conv_id)` partitioning). Prove it on the
plan, not by assertion-in-prose."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from fastq_dupaway_spark import corpus
from fastq_dupaway_spark.canonicalize import conversation_signatures


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_bucketed_table_eliminates_conv_exchange(spark, tmp_path):
    t = corpus.conv_df(spark, corpus.generate_corpus(seed=7, n_conv=60))
    (
        t.write.mode("overwrite")
        .bucketBy(4, "conv_id")
        .sortBy("conv_id", "turn_idx")
        .format("parquet")
        .option("path", str(tmp_path / "bucketed"))  # external table
        .saveAsTable("bucketed_transcripts")
    )
    try:
        bt = spark.table("bucketed_transcripts")

        plain_plan = _plan(conversation_signatures(t))
        bucketed_plan = _plan(conversation_signatures(bt))
        # unbucketed input shuffles on conv_id; the bucketed scan does not
        assert "Exchange hashpartitioning(conv_id" in plain_plan
        assert "Exchange hashpartitioning(conv_id" not in bucketed_plan

        # and results are identical
        a = {
            (r["conv_id"], r["conv_sig"], r["n_turns"])
            for r in conversation_signatures(t).collect()
        }
        b = {
            (r["conv_id"], r["conv_sig"], r["n_turns"])
            for r in conversation_signatures(bt).collect()
        }
        assert a == b

        # bucketed-to-bucketed co-located join: no exchange on either side
        sig = conversation_signatures(bt)
        j = bt.join(bt.select("conv_id").distinct(), "conv_id", "left_semi")
        jp = _plan(j)
        assert "Exchange hashpartitioning(conv_id" not in jp
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_transcripts")


def test_fused_sizing_single_pass_and_local_dim(spark):
    """materialize_and_size (STATUS r5 known-limit #2 fix) fuses the
    band-table materialization into the hot-bucket sizing scan. Raw
    Spark job-ID counts are AQE-split noise (persist changes how one
    query splits into jobs), so pin the properties that actually matter:
    (a) the upstream plan is evaluated EXACTLY ONCE — the sizing action
        populates the cache as a side effect, and later actions on the
        returned frame hit the cache instead of recomputing (the round-4
        shape paid a separate localCheckpoint materialization first);
    (b) the hot frame is a driver-LOCAL relation, so the downstream
        salt-dim broadcast is a driver-side copy — no extra scan job;
    (c) it agrees exactly with the lazy hot_buckets aggregation."""
    from fastq_dupaway_spark.detectors.buckets import (
        hot_buckets,
        materialize_and_size,
        salted_self_pairs,
    )

    sc = spark.sparkContext
    acc = sc.accumulator(0)

    @F.udf("long")
    def tick(x):
        acc.add(1)
        return x

    # 7 buckets of ~143 rows; cap 50 -> every bucket over-cap. The key
    # column itself is UDF-instrumented so column pruning can never skip
    # the counter: every evaluation of the upstream plan ticks 1000.
    def mk():
        return spark.range(0, 1000).select(
            tick(F.col("id") % 7).alias("key"), F.col("id").alias("conv_id")
        )

    expected = {
        (r["key"], r["bucket_n"]) for r in hot_buckets(mk(), ["key"], 50).collect()
    }
    base = acc.value  # one bare-path evaluation

    cached, hot = materialize_and_size(mk(), ["key"], 50)
    assert acc.value == base + 1000, (
        "fused sizing should evaluate the upstream plan exactly once",
        acc.value - base,
    )

    # later actions hit the cache populated by the sizing pass — the
    # upstream plan is NOT recomputed (this is the barrier the fusion
    # removes vs the round-4 localCheckpoint-then-size shape)
    assert cached.count() == 1000
    assert cached.agg(F.sum("conv_id")).collect()[0][0] == 999 * 1000 // 2
    assert acc.value == base + 1000, "downstream action recomputed upstream"

    # the hot frame is a driver-local source with lineage severed from
    # the band table: its whole optimized plan is ONE leaf (PySpark's
    # createDataFrame parallelizes driver rows into a LogicalRDD; Scala
    # would say LocalRelation), so broadcasting it can never rescan the
    # persisted band table or its upstream
    hot_plan = hot._jdf.queryExecution().optimizedPlan().toString()
    first = hot_plan.strip().splitlines()[0]
    assert first.startswith(("LogicalRDD", "LocalRelation")), hot_plan
    assert len(hot_plan.strip().splitlines()) == 1, hot_plan

    assert {(r["key"], r["bucket_n"]) for r in hot.collect()} == expected

    # end-to-end: the salted self-join over the fused path still obeys
    # the bounded-bucket policy (every pair same key, same salt; salts
    # split each 143-row bucket into ceil(143/50)=3 sub-buckets)
    pairs = salted_self_pairs(mk(), ["key"], "conv_id", 50)
    n_pairs = pairs.count()
    # well under the unsalted 7 * C(143,2) ~ 71k: bounded by ~3 salts
    assert 0 < n_pairs < 7 * 143 * 143 / 2 / 2
    cached.unpersist()
