"""End-to-end pipeline + checkpoint/resume behavior."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from fastq_dupaway_spark import corpus
from fastq_dupaway_spark.checkpoints import CheckpointStore
from fastq_dupaway_spark.pipeline import DedupConfig, run_pipeline


def test_pipeline_multi_detector(spark, tmp_path):
    convs = corpus.generate_corpus(seed=9, n_conv=80, dup_rate=0.5)
    t = corpus.conv_df(spark, convs)
    cfg = DedupConfig(exact=True, hamming_exact=True, minhash=True)
    res = run_pipeline(t, cfg, checkpoint_root=str(tmp_path / "ck"))
    n_convs = t.select("conv_id").distinct().count()
    assert res.clusters.count() == n_convs
    n_reps = res.clusters.where(
        F.col("conv_id") == F.col("rep_conv_id")
    ).count()
    assert 0 < n_reps < n_convs  # some dedup happened
    # survivors carry verbatim rows for exactly the representatives
    assert res.survivors.select("conv_id").distinct().count() == n_reps
    # all stages ran fresh
    assert all(not s["resumed"] for s in res.stages)


def test_pipeline_resume_skips_completed_stages(spark, tmp_path):
    convs = corpus.generate_corpus(seed=9, n_conv=60, dup_rate=0.4)
    t = corpus.conv_df(spark, convs)
    cfg = DedupConfig(exact=True, minhash=True)
    root = str(tmp_path / "ck")
    first = run_pipeline(t, cfg, checkpoint_root=root)
    second = run_pipeline(t, cfg, checkpoint_root=root)
    assert all(s["resumed"] for s in second.stages), second.stages
    a = {(r["conv_id"], r["rep_conv_id"]) for r in first.clusters.collect()}
    b = {(r["conv_id"], r["rep_conv_id"]) for r in second.clusters.collect()}
    assert a == b


def test_pipeline_config_change_invalidates(spark, tmp_path):
    convs = corpus.generate_corpus(seed=9, n_conv=40, dup_rate=0.4)
    t = corpus.conv_df(spark, convs)
    root = str(tmp_path / "ck")
    run_pipeline(t, DedupConfig(exact=True), checkpoint_root=root)
    res = run_pipeline(
        t, DedupConfig(exact=True, jaccard_threshold=0.7), checkpoint_root=root
    )
    assert all(not s["resumed"] for s in res.stages)


def test_manifest_contents(spark, tmp_path):
    convs = corpus.generate_corpus(seed=2, n_conv=30, dup_rate=0.3)
    t = corpus.conv_df(spark, convs)
    root = str(tmp_path / "ck")
    run_pipeline(t, DedupConfig(exact=True), checkpoint_root=root)
    man_path = os.path.join(root, "exact_clusters", "_MANIFEST.json")
    with open(man_path) as f:
        man = json.load(f)
    assert man["complete"] is True
    assert man["rows"] > 0
    assert man["metrics"]["partitions"], "per-partition lineage missing"
    store = CheckpointStore(spark, root)
    assert {r["stage"] for r in store.report()} >= {
        "conversation_texts",
        "exact_clusters",
        "components",
    }


def test_parity_mode_pipeline(spark, tmp_path):
    t = corpus.conv_df(spark, corpus.FIXTURES["single_loose"])
    res = run_pipeline(t, DedupConfig(parity_mode="loose"))
    got = {
        r["conv_id"]: r["rep_conv_id"] for r in res.clusters.collect()
    }
    assert got == {
        "00001": "00001",
        "00002": "00001",
        "00003": "00003",
        "00004": "00001",
    }
