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


def test_pipeline_minhash_agg_path_same_clusters(spark, tmp_path):
    """minhash_path='agg' (min-aggregation signatures + candidate-scoped
    verify sets) yields the same cluster assignment as the set path, in
    both checkpointed and lazy modes, at a recall-saturated banding
    config; the checkpointed run exposes the same stage names."""
    convs = corpus.generate_corpus(seed=9, n_conv=80, dup_rate=0.5)
    t = corpus.conv_df(spark, convs)
    base = dict(exact=False, minhash=True, minhash_k=128, minhash_bands=32)
    ref = run_pipeline(t, DedupConfig(**base))
    expected = {
        r.conv_id: r.rep_conv_id for r in ref.clusters.collect()
    }
    for root in (None, str(tmp_path / "ck_agg")):
        res = run_pipeline(
            t, DedupConfig(**base, minhash_path="agg"), checkpoint_root=root
        )
        got = {r.conv_id: r.rep_conv_id for r in res.clusters.collect()}
        assert got == expected
    names = {s["stage"] for s in res.stages}
    assert {"minhash_signatures", "minhash_candidates", "minhash_pairs",
            "minhash_hot_buckets"} <= names


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

def test_quarantine_stage_routes_malformed_rows(spark, tmp_path):
    """P9: conversations with non-normalizable control chars or NULL text
    are quarantined whole; \\t/\\n/\\r are NORMALIZED to spaces instead
    (real transcripts contain them — ADVICE r2), and normalization makes
    whitespace-variant duplicates converge."""
    convs = [
        ("00001", ["good clean text", "more clean text"]),
        ("00002", ["good clean text", "more clean text"]),  # exact dup of 1
        ("00003", ["bad\x00byte here", "innocent sibling turn"]),
        ("00004", ["tab\tinside"]),  # normalized to 'tab inside', kept
        ("00005", ["another unique fine conversation"]),
        ("00006", ["good\nclean text", "more\tclean text"]),  # dup of 1 after normalization
    ]
    t = corpus.conv_df(spark, convs)
    res = run_pipeline(
        t, DedupConfig(exact=True), checkpoint_root=str(tmp_path / "ck")
    )
    quarantined = {
        (r["conv_id"], r["reason"]) for r in res.quarantined.collect()
    }
    # whole conversations quarantined; offending rows carry reasons,
    # innocent sibling rows carry NULL; the tab/newline rows do NOT appear
    assert quarantined == {
        ("00003", "control_chars"),
        ("00003", None),
    }
    clusters = {r["conv_id"]: r["rep_conv_id"] for r in res.clusters.collect()}
    assert clusters == {
        "00001": "00001",
        "00002": "00001",
        "00004": "00004",
        "00005": "00005",
        "00006": "00001",  # whitespace-normalized duplicate converges
    }
    # survivors carry the NORMALIZED text
    surv4 = {
        r["text"]
        for r in res.survivors.where(F.col("conv_id") == "00004").collect()
    }
    assert surv4 == {"tab inside"}
    # quarantined rows carry the ORIGINAL raw bytes (forensic fidelity —
    # ADVICE r3: the offending \x00 must not be rewritten)
    quar_texts = {r["text"] for r in res.quarantined.collect()}
    assert "bad\x00byte here" in quar_texts


def test_observed_counters_in_manifest(spark, tmp_path):
    """A4 verbose counters: the components manifest carries observed
    total/dup conversation counts + CC round stats, ridden on the write."""
    convs = corpus.generate_corpus(seed=3, n_conv=40, dup_rate=0.5)
    t = corpus.conv_df(spark, convs)
    root = str(tmp_path / "ck")
    res = run_pipeline(t, DedupConfig(exact=True), checkpoint_root=root)
    man = json.load(open(os.path.join(root, "components", "_MANIFEST.json")))
    m = man["metrics"]
    n_convs = t.select("conv_id").distinct().count()
    n_reps = res.clusters.where(
        F.col("conv_id") == F.col("rep_conv_id")
    ).count()
    assert m["total_convs"] == n_convs
    assert m["dup_convs"] == n_convs - n_reps > 0
    assert m["cc_rounds"] >= 1


def test_hot_bucket_quarantine_stage(spark, tmp_path):
    """Detector hot buckets land in the checkpoint store as quarantine
    tables with true sizes — never silently dropped."""
    convs = [
        (f"h{i:03d}", ["identical boilerplate greeting text here ok"])
        for i in range(40)
    ] + [
        (f"u{i:03d}", [f"unique text {i} with words number {i * 7}"])
        for i in range(10)
    ]
    t = corpus.conv_df(spark, convs)
    root = str(tmp_path / "ck")
    res = run_pipeline(
        t,
        DedupConfig(exact=False, minhash=True, max_bucket=10),
        checkpoint_root=root,
    )
    stage_rows = {s["stage"]: s["rows"] for s in res.stages}
    assert stage_rows.get("minhash_hot_buckets", 0) > 0
    hot = spark.read.parquet(
        os.path.join(root, "minhash_hot_buckets", "data")
    ).collect()
    assert all(r["bucket_n"] == 40 for r in hot)
    # and the hot cluster still fully recovered via salted bands + CC
    reps = {
        r["rep_conv_id"]
        for r in res.clusters.collect()
        if r["conv_id"].startswith("h")
    }
    assert reps == {"h000"}


def test_pipeline_broadcast_needle_keys_fallback_same_clusters(spark):
    """DedupConfig.broadcast_needle_keys=False (the --no-broadcast-needles
    beyond-envelope tier) must thread through run_pipeline to every
    containment path and leave the cluster relation unchanged."""
    convs = corpus.generate_corpus(seed=31, n_conv=70, dup_rate=0.5)
    t = corpus.conv_df(spark, convs).localCheckpoint()

    def clusters(broadcast):
        cfg = DedupConfig(
            exact=True,
            containment=True,
            char_containment=True,
            broadcast_needle_keys=broadcast,
        )
        res = run_pipeline(t, cfg)
        return {
            (r["conv_id"], r["rep_conv_id"]) for r in res.clusters.collect()
        }

    assert clusters(False) == clusters(True)
