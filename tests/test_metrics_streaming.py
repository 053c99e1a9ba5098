"""Recall scoring vs oracle + streaming dedup micro-batch behavior."""

from __future__ import annotations

import time
from datetime import datetime, timezone

from pyspark.sql import functions as F

from fastq_dupaway_spark import corpus, oracle
from fastq_dupaway_spark.metrics import score_vs_oracle, score_pairs, cluster_pairs
from fastq_dupaway_spark.pipeline import DedupConfig, run_pipeline
from fastq_dupaway_spark.streaming import streaming_exact_dedup


def test_exact_pipeline_recall_one(spark):
    """Exact detector must reproduce reference fast-mode clusters with
    dup-pair recall AND precision 1.0 (>= 0.99 is the BASELINE.json gate;
    exact modes require exactly 1.0 per FIXTURES.md)."""
    convs = corpus.generate_corpus(seed=21, n_conv=150, dup_rate=0.5)
    t = corpus.conv_df(spark, convs)
    res = run_pipeline(t, DedupConfig(exact=True))
    want = oracle.fast_dedup(convs)
    score = score_vs_oracle(res.clusters, want)
    assert score.recall == 1.0, score
    assert score.precision == 1.0, score


def test_parity_hamming_recall_one(spark):
    """Parity scan reproduces reference seq-mode hamming clusters exactly
    (the same-config recall >= 0.99 criterion, met at 1.0)."""
    convs = corpus.generate_corpus(seed=22, n_conv=150, dup_rate=0.5, hamming_d=2)
    t = corpus.conv_df(spark, convs)
    res = run_pipeline(t, DedupConfig(parity_mode="hamming", hamming_d=2))
    want = oracle.seq_dedup(convs, "hamming", d=2)
    score = score_vs_oracle(res.clusters, want)
    assert score.recall == 1.0, score
    assert score.precision == 1.0, score


def test_score_pairs_partial(spark):
    got = spark.createDataFrame(
        [("a", "b"), ("c", "d")], "conv_a string, conv_b string"
    )
    want = spark.createDataFrame(
        [("b", "a"), ("e", "f")], "conv_a string, conv_b string"
    )
    s = score_pairs(got, want)
    assert s.recall == 0.5 and s.precision == 0.5


def test_cluster_pairs_expansion(spark):
    clusters = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("z", "z")],
        "conv_id string, rep_conv_id string",
    )
    pairs = {
        (r["conv_a"], r["conv_b"]) for r in cluster_pairs(clusters).collect()
    }
    assert pairs == {("a", "b"), ("a", "c"), ("b", "c")}


def test_streaming_exact_dedup(spark, tmp_path):
    """Memory-source micro-batch: duplicate turns within the watermark are
    suppressed, firsts survive."""
    rows = corpus.rows_from_convs(
        [("s1", ["hello world"]), ("s2", ["hello world"]), ("s3", ["other"])]
    )
    q = (
        streaming_exact_dedup(_memory_stream(spark, rows), watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM dedup_out")
    # exact duplicate payload rows from the doubled source are suppressed
    assert out.count() == 3
    assert {r["conv_id"] for r in out.collect()} == {"s1", "s2", "s3"}


def _memory_stream(spark, rows):
    """availableNow parquet-backed stream with each row duplicated."""
    import tempfile

    d = tempfile.mkdtemp(prefix="stream_src")
    df = spark.createDataFrame(rows + rows, corpus.TRANSCRIPT_SCHEMA)
    df.write.mode("overwrite").parquet(d)
    return spark.readStream.schema(corpus.TRANSCRIPT_SCHEMA).parquet(d)


def test_streaming_lsh_candidates(spark, tmp_path):
    """Stateful LSH near-dup candidates over a file stream: planted
    near-identical conversations collide in at least one band ACROSS
    micro-batches (state carries bucket membership), unrelated ones don't
    flood candidates."""
    import time

    from fastq_dupaway_spark.streaming import streaming_lsh_candidates

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows1 = [("a1", base, datetime(2026, 1, 1, tzinfo=timezone.utc))]
    rows2 = [
        ("a2", base + " extra", datetime(2026, 1, 1, 0, 1, tzinfo=timezone.utc)),
        ("zz", "completely different words about spark shuffles and parquet files",
         datetime(2026, 1, 1, 0, 1, tzinfo=timezone.utc)),
    ]
    schema = "conv_id string, text string, ts timestamp"
    src = tmp_path / "stream_src"
    src.mkdir()
    # two files -> file source processes them (state must persist across
    # the micro-batch boundary for the a1/a2 pair to be emitted)
    spark.createDataFrame(rows1, schema).write.parquet(str(src / "f1.parquet"))
    spark.createDataFrame(rows2, schema).write.parquet(str(src / "f2.parquet"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    cands = streaming_lsh_candidates(stream, n=3, k=32, n_bands=8)
    q = (
        cands.writeStream.format("memory")
        .queryName("lsh_cands")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["conv_a"], r["conv_b"])
        for r in spark.sql("select * from lsh_cands").collect()
    }
    assert ("a1", "a2") in got
    assert not any("zz" in p for p in got)


def test_cluster_pairs_max_cluster_cap(spark):
    """Giant-cluster expansion cap: pairs per cluster bounded by the
    sampled member count, sample deterministic (smallest ids)."""
    rows = [(f"g{i:03d}", "g000") for i in range(50)] + [
        ("s1", "s1"), ("s2", "s2"),
    ]
    clusters = spark.createDataFrame(rows, "conv_id string, rep_conv_id string")
    full = cluster_pairs(clusters).count()
    assert full == 50 * 49 / 2
    capped = cluster_pairs(clusters, max_cluster=10)
    got = capped.collect()
    assert len(got) == 10 * 9 / 2
    members = {r["conv_a"] for r in got} | {r["conv_b"] for r in got}
    assert members == {f"g{i:03d}" for i in range(10)}  # deterministic sample
