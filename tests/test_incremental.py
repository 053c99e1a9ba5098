"""Incremental (delta-vs-corpus) dedup: exact assignment, the salted
cross-join primitive, and the LSH incremental pair detector.

Semantics pinned against the full-corpus detectors on the same table:
an incremental pass at the same config must agree with what a full
re-dedup of corpus+delta would have decided about the delta rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from fastq_dupaway_spark.corpus import build_transcripts
from fastq_dupaway_spark.detectors.buckets import salted_cross_pairs
from fastq_dupaway_spark.detectors.exact import exact_clusters
from fastq_dupaway_spark.detectors.minhash import minhash_pairs
from fastq_dupaway_spark.incremental import (
    exact_incremental_assign,
    minhash_incremental_pairs,
    split_corpus_delta,
)

SF_DIR = "/root/testdata/sf0.001"


def _expected_exact(spark, t, corpus, delta):
    """Derive the expected incremental assignment from the FULL
    exact_clusters relation: a delta conv's rep is the min corpus member
    of its cluster if the cluster touches the corpus, else the min delta
    member."""
    full = exact_clusters(t)  # (conv_id, rep_conv_id) over corpus+delta
    delta_ids = delta.select("conv_id").distinct()
    corpus_ids = corpus.select("conv_id").distinct()
    members = full.alias("m")
    min_corpus = (
        members.join(corpus_ids, "conv_id", "left_semi")
        .groupBy("rep_conv_id")
        .agg(F.min("conv_id").alias("min_corpus"))
    )
    min_delta = (
        members.join(delta_ids, "conv_id", "left_semi")
        .groupBy("rep_conv_id")
        .agg(F.min("conv_id").alias("min_delta"))
    )
    return (
        full.join(delta_ids, "conv_id", "left_semi")
        .join(min_corpus, "rep_conv_id", "left")
        .join(min_delta, "rep_conv_id", "left")
        .select(
            "conv_id",
            F.coalesce("min_corpus", "min_delta").alias("rep_conv_id"),
        )
    )


def test_exact_incremental_matches_full_rededup(spark):
    t = build_transcripts(spark, SF_DIR).cache()
    corpus, delta = split_corpus_delta(t)
    got = exact_incremental_assign(corpus, delta)
    expected = _expected_exact(spark, t, corpus, delta)
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0
    # every delta conv assigned exactly once
    n_delta = delta.select("conv_id").distinct().count()
    assert got.count() == n_delta


def test_exact_incremental_union_stays_deduped(spark):
    """Appending the batch survivors (rep == conv_id) to the corpus
    survivors leaves no two kept conversations with equal signatures —
    the property that makes daily batches composable."""
    t = build_transcripts(spark, SF_DIR).cache()
    corpus, delta = split_corpus_delta(t)
    assign = exact_incremental_assign(corpus, delta)
    batch_survivors = assign.where(F.col("conv_id") == F.col("rep_conv_id"))
    corpus_survivors = (
        exact_clusters(corpus)
        .where(F.col("conv_id") == F.col("rep_conv_id"))
        .select("conv_id")
    )
    kept = corpus_survivors.union(batch_survivors.select("conv_id"))
    kept_t = t.join(kept, "conv_id", "left_semi")
    dup_groups = (
        exact_clusters(kept_t)
        .groupBy("rep_conv_id")
        .count()
        .where(F.col("count") > 1)
    )
    assert dup_groups.count() == 0


def test_exact_incremental_shuffled_fallback_identical(spark):
    t = build_transcripts(spark, SF_DIR).cache()
    corpus, delta = split_corpus_delta(t)
    a = exact_incremental_assign(corpus, delta, broadcast_delta=True)
    b = exact_incremental_assign(corpus, delta, broadcast_delta=False)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_salted_cross_pairs_hot_bucket_full_recall(spark):
    """One hot key (60 big rows, max_bucket=10 -> 6 salts) + a cold key:
    every (big, probe) pair on the shared key must come back — probe
    replication across salts makes cross recall exactly 1.0, unlike the
    self-join policy's per-band sub-bucket coverage."""
    big = spark.createDataFrame(
        [("hot", f"b{i:03d}") for i in range(60)]
        + [("cold", "b900"), ("only_big", "b901")],
        "key string, conv_id string",
    )
    probes = spark.createDataFrame(
        [("hot", "p001"), ("hot", "p002"), ("cold", "p003"),
         ("only_probe", "p004")],
        "key string, conv_id string",
    )
    got = salted_cross_pairs(big, probes, ["key"], "conv_id", max_bucket=10)
    rows = {(r.conv_a, r.conv_b) for r in got.collect()}
    expected = {
        (min(f"b{i:03d}", p), max(f"b{i:03d}", p))
        for i in range(60)
        for p in ("p001", "p002")
    } | {("b900", "p003")}
    assert rows == expected


def test_salted_cross_pairs_shuffled_fallback_identical(spark):
    big = spark.createDataFrame(
        [(f"k{i % 5}", f"b{i:03d}") for i in range(40)],
        "key string, conv_id string",
    )
    probes = spark.createDataFrame(
        [(f"k{i % 7}", f"p{i:03d}") for i in range(14)],
        "key string, conv_id string",
    )
    a = salted_cross_pairs(
        big, probes, ["key"], "conv_id", max_bucket=8, broadcast_probes=True
    )
    b = salted_cross_pairs(
        big, probes, ["key"], "conv_id", max_bucket=8, broadcast_probes=False
    )
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}
    plan_a = a._jdf.queryExecution().executedPlan().toString()
    plan_b = b._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_a
    assert "ShuffledHashJoin" in plan_b


def test_minhash_incremental_matches_full_pass(spark):
    """The incremental LSH pass must recover exactly the delta-touching
    subset of the full-corpus minhash_pairs relation at the same config
    (32 bands x 4 rows: P(miss at J>=0.5) is negligible on this corpus,
    and both sides run the same exact-Jaccard verify)."""
    t = build_transcripts(spark, SF_DIR).cache()
    corpus, delta = split_corpus_delta(t)
    delta_ids = {r.conv_id for r in delta.select("conv_id").distinct().collect()}
    full = minhash_pairs(t, n=3, k=128, n_bands=32, threshold=0.5)
    expected = {
        (r.conv_a, r.conv_b)
        for r in full.collect()
        if r.conv_a in delta_ids or r.conv_b in delta_ids
    }
    got = minhash_incremental_pairs(
        corpus, delta, n=3, k=128, n_bands=32, threshold=0.5
    )
    assert {(r.conv_a, r.conv_b) for r in got.collect()} == expected


def test_incremental_cli_end_to_end(spark, tmp_path, capsys):
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).resolve().parent.parent / "jobs"))
    import run_incremental

    from fastq_dupaway_spark import corpus as corpus_mod

    convs = corpus_mod.generate_corpus(seed=13, n_conv=60, dup_rate=0.5)
    t = corpus_mod.conv_df(spark, convs)
    c, d = split_corpus_delta(t)
    corpus_path, delta_path = tmp_path / "corpus", tmp_path / "delta"
    c.write.parquet(str(corpus_path))
    d.write.parquet(str(delta_path))
    out = tmp_path / "out"
    run_incremental.main(
        [
            "--corpus", str(corpus_path),
            "--delta", str(delta_path),
            "--output", str(out),
            "--detectors", "exact,minhash",
            "--jaccard", "0.5",
            "--cpus", "4",
        ]
    )
    captured = capsys.readouterr().out
    assert "delta_convs=" in captured and "jaccard_pairs=" in captured
    assign = spark.read.parquet(str(out / "assignments"))
    surv = spark.read.parquet(str(out / "survivors"))
    assert assign.count() == d.select("conv_id").distinct().count()
    n_surv_ids = assign.where(
        F.col("conv_id") == F.col("rep_conv_id")
    ).count()
    assert surv.select("conv_id").distinct().count() == n_surv_ids
    # guards
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        run_incremental.parse_args(["--delta", "x", "--output", "o"])
    with _pytest.raises(SystemExit):
        run_incremental.parse_args(
            ["--delta", "x", "--output", "o", "--detectors", "minhash",
             "--corpus-signatures", "s"]
        )
    with _pytest.raises(SystemExit):
        run_incremental.parse_args(
            ["--corpus", "c", "--delta", "x", "--output", "o",
             "--minhash-k", "100", "--bands", "16"]
        )
