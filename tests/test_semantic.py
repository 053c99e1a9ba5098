"""Semantic (embedding-cosine) detector: planted-pair recall, exact
verify precision, hot-bucket policy, pipeline + checkpoint integration."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fastq_dupaway_spark import corpus
from fastq_dupaway_spark.clustering import clusters_with_singletons
from fastq_dupaway_spark.detectors.semantic import (
    semantic_candidates,
    semantic_hot_buckets,
    semantic_pairs,
)
from fastq_dupaway_spark.pipeline import DedupConfig, run_pipeline

DIM = 16


def _emb_df(spark, vecs: dict[str, np.ndarray]):
    return spark.createDataFrame(
        [(k, [float(x) for x in v]) for k, v in sorted(vecs.items())],
        "conv_id string, embedding array<double>",
    )


def _planted(n_base=20, n_twins=5, eps=0.05, seed=7):
    rng = np.random.RandomState(seed)
    base = rng.standard_normal((n_base, DIM))
    vecs = {f"c{i:02d}": base[i] for i in range(n_base)}
    twins = []
    for i in range(n_twins):
        vecs[f"c{i:02d}x"] = base[i] + eps * rng.standard_normal(DIM)
        twins.append((f"c{i:02d}", f"c{i:02d}x"))
    return vecs, twins


def _cos(a, b):
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_semantic_pairs_match_brute_force(spark):
    """LSH + exact verify == numpy brute force at threshold 0.95 on the
    planted corpus (recall AND precision 1.0 for this config)."""
    vecs, twins = _planted()
    expected = {
        (a, b)
        for a in vecs
        for b in vecs
        if a < b and _cos(vecs[a], vecs[b]) >= 0.95
    }
    assert set(twins) <= expected  # the plant is real at this threshold
    got = {
        (r["conv_a"], r["conv_b"])
        for r in semantic_pairs(
            _emb_df(spark, vecs),
            threshold=0.95,
            n_planes=4,
            n_tables=8,
            dim=DIM,
            seed=1,
        ).collect()
    }
    assert got == expected


def test_semantic_verify_is_exact(spark):
    """Every emitted cos matches numpy to the rounded digit — the verify
    is JVM-exact, not approximate."""
    vecs, _ = _planted()
    for r in semantic_pairs(
        _emb_df(spark, vecs), threshold=0.9, n_planes=4, n_tables=8,
        dim=DIM, seed=1,
    ).collect():
        want = round(_cos(vecs[r["conv_a"]], vecs[r["conv_b"]]), 4)
        assert abs(r["cos"] - want) < 1e-9


def test_semantic_hot_bucket_salted_and_recovered(spark):
    """A boilerplate embedding (many identical vectors — e.g. what an
    encoder emits for empty text) overflows its bucket: candidates stay
    bounded, the hot key is surfaced, and connected components still
    recovers the full cluster from the orthogonal per-table salt cuts."""
    rng = np.random.RandomState(3)
    hot = rng.standard_normal(DIM)
    vecs = {f"h{i:03d}": hot for i in range(120)}
    for i in range(10):
        vecs[f"r{i:02d}"] = rng.standard_normal(DIM)
    emb = _emb_df(spark, vecs)
    kw = dict(n_planes=4, n_tables=4, dim=DIM, max_bucket=30, seed=2)

    hb = semantic_hot_buckets(emb, **kw)
    assert hb.count() >= 1  # surfaced, not silently dropped

    cands = semantic_candidates(emb, **kw)
    n = cands.count()
    # bounded: far below the unsalted 120*119/2 * 4 tables blowup
    assert 0 < n < 4 * 120 * 30

    cl = clusters_with_singletons(emb.select("conv_id"), cands)
    hot_reps = {
        r["rep_conv_id"]
        for r in cl.where(F.col("conv_id").startswith("h")).collect()
    }
    assert len(hot_reps) == 1  # orthogonal cuts + CC re-merge the cluster


def test_pipeline_semantic_detector_with_checkpoints(spark, tmp_path):
    """DedupConfig.semantic wires embedding pairs into the candidate
    union + CC; stage tables (hot surface, candidates, pairs) land in the
    checkpoint store."""
    convs = [
        ("p1", ["completely different words here"]),
        ("p2", ["nothing like the previous text"]),
        ("p3", ["third unrelated conversation"]),
    ]
    t = corpus.conv_df(spark, convs)
    rng = np.random.RandomState(11)
    v1 = rng.standard_normal(DIM)
    vecs = {"p1": v1, "p2": v1 + 0.01 * rng.standard_normal(DIM),
            "p3": rng.standard_normal(DIM)}
    emb = _emb_df(spark, vecs)

    cfg = DedupConfig(
        exact=True, semantic=True, semantic_threshold=0.95,
        semantic_planes=4, semantic_tables=8, semantic_dim=DIM,
        quarantine=False,
    )
    res = run_pipeline(t, cfg, checkpoint_root=str(tmp_path / "ck"),
                       embeddings=emb)
    cl = {r["conv_id"]: r["rep_conv_id"] for r in res.clusters.collect()}
    assert cl["p1"] == cl["p2"]  # paraphrase pair merged by embeddings
    assert cl["p3"] != cl["p1"]
    stage_names = {s["stage"] for s in res.stages}
    assert {"semantic_hot_buckets", "semantic_candidates",
            "semantic_pairs"} <= stage_names


def test_streaming_semantic_candidates_vs_batch(spark, tmp_path):
    """The embedding analog of the text streaming-LSH recall test: every
    pair the BATCH semantic detector verifies must appear among the
    stream's candidates (same hyperplane seed/planes), including a pair
    whose members arrive in different micro-batches."""
    from fastq_dupaway_spark.streaming import streaming_semantic_candidates

    vecs, twins = _planted()
    expected = {
        (a, b)
        for a in vecs
        for b in vecs
        if a < b and _cos(vecs[a], vecs[b]) >= 0.95
    }

    schema = "conv_id string, embedding array<double>"
    rows = [(k, [float(x) for x in v]) for k, v in sorted(vecs.items())]
    # c00's twin goes in file 2: its pair must cross the batch boundary
    f2 = [r for r in rows if r[0] == "c00x"]
    f1 = [r for r in rows if r[0] != "c00x"]
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(f1, schema).write.parquet(str(src / "f1.parquet"))
    spark.createDataFrame(f2, schema).write.parquet(str(src / "f2.parquet"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        streaming_semantic_candidates(
            stream, n_planes=4, n_tables=8, dim=DIM, seed=1
        )
        .writeStream.format("memory")
        .queryName("sem_cands")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(180)
    cands = {
        (r["conv_a"], r["conv_b"])
        for r in spark.sql("select * from sem_cands").collect()
    }
    missing = expected - cands
    assert not missing, f"stream candidates missed batch-verified pairs: {missing}"
    assert ("c00", "c00x") in cands  # crossed the micro-batch boundary


def test_pipeline_char_containment_detector(spark, tmp_path):
    """DedupConfig.char_containment merges mid-turn containment pairs
    into CC and surfaces the unindexed-short-needle quarantine stage."""
    convs = [
        ("m1", ["tiny txt"]),
        ("m2", ["ZZ tiny txt YY with more words in this turn"]),
        ("m3", ["a completely different conversation"]),
    ]
    t = corpus.conv_df(spark, convs)
    res = run_pipeline(
        t,
        DedupConfig(exact=True, char_containment=True, quarantine=False),
        checkpoint_root=str(tmp_path / "ck"),
    )
    cl = {r["conv_id"]: r["rep_conv_id"] for r in res.clusters.collect()}
    assert cl["m1"] == cl["m2"]  # mid-turn short needle merged
    assert cl["m3"] != cl["m1"]
    stage_names = {s["stage"] for s in res.stages}
    assert {"char_containment_pairs", "containment_unindexed_needles"} <= stage_names


def test_feature_hash_embeddings_similarity(spark):
    """Hashing-trick embedder: unit-norm vectors whose cosine tracks
    token-multiset overlap — near-identical texts ~1, unrelated ~0."""
    from fastq_dupaway_spark.canonicalize import conversation_texts
    from fastq_dupaway_spark.functions.embed import feature_hash_embeddings

    base = " ".join(f"tok{i}" for i in range(40))
    convs = [
        ("e1", [base]),
        ("e2", [base + " extra"]),  # one appended token
        ("e3", [" ".join(f"other{i}" for i in range(40))]),
        ("e4", [""]),  # empty text still tokenizes to one '' token
    ]
    ct = conversation_texts(corpus.conv_df(spark, convs))
    vecs = {
        r["conv_id"]: np.asarray(r["embedding"])
        for r in feature_hash_embeddings(ct, dim=DIM).collect()
    }
    assert abs(np.linalg.norm(vecs["e1"]) - 1.0) < 1e-9
    assert _cos(vecs["e1"], vecs["e2"]) > 0.9
    assert abs(_cos(vecs["e1"], vecs["e3"])) < 0.5
    # '' tokenizes to one empty token: unit vector, unrelated to e1
    assert abs(np.linalg.norm(vecs["e4"]) - 1.0) < 1e-9
    assert abs(_cos(vecs["e1"], vecs["e4"])) < 0.5


def test_pipeline_semantic_feature_hash_auto_embed(spark, tmp_path):
    """semantic_embedder='feature_hash': the pipeline derives its own
    embeddings — near-dup texts the exact detector cannot merge are
    merged by embedding cosine, with the embeddings stage checkpointed."""
    base = " ".join(f"w{i}" for i in range(40))
    convs = [
        ("f1", [base]),
        ("f2", [base + " tail"]),  # NOT an exact dup
        ("f3", [" ".join(f"z{i}" for i in range(40))]),
    ]
    t = corpus.conv_df(spark, convs)
    cfg = DedupConfig(
        exact=True, semantic=True, semantic_embedder="feature_hash",
        semantic_threshold=0.9, semantic_planes=4, semantic_tables=8,
        semantic_dim=DIM, quarantine=False,
    )
    res = run_pipeline(t, cfg, checkpoint_root=str(tmp_path / "ck"))
    cl = {r["conv_id"]: r["rep_conv_id"] for r in res.clusters.collect()}
    assert cl["f1"] == cl["f2"] and cl["f3"] != cl["f1"]
    assert "semantic_embeddings" in {s["stage"] for s in res.stages}


def test_pipeline_semantic_requires_embeddings(spark):
    t = corpus.conv_df(spark, [("x", ["hello"])])
    try:
        run_pipeline(t, DedupConfig(semantic=True))
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "embeddings" in str(e)


class TestExternalEncoderContract:
    """VERDICT r3 item 6: the 'swap in a learned encoder' claim
    (functions/embed.py) as an enforced contract — float32 vectors of a
    NON-default dim flow through run_pipeline(embeddings=...), with the
    documented edge semantics: dim inferred from the frame, NULL rows
    excluded from semantic pairing (but still visible to other
    detectors), zero vectors never pair (cosine NULL), empty frames and
    declared-dim mismatches fail loudly."""

    DIM8 = 8

    def _corpus(self, spark):
        convs = [
            ("e0", ["first distinct conversation text"]),
            ("e1", ["second distinct conversation text"]),   # e0's twin vector
            ("e2", ["third distinct conversation text"]),    # NULL embedding
            ("e3", ["fourth distinct conversation text"]),   # zero vector
            ("e4", ["fifth distinct conversation text"]),
            ("e5", ["sixth distinct conversation text"]),
        ]
        return corpus.conv_df(spark, convs)

    def _embeddings(self, spark):
        rng = np.random.RandomState(11)
        v0 = rng.standard_normal(self.DIM8)
        v4, v5 = rng.standard_normal(self.DIM8), rng.standard_normal(self.DIM8)
        rows = [
            ("e0", [float(x) for x in v0]),
            ("e1", [float(x) for x in v0 + 0.01 * rng.standard_normal(self.DIM8)]),
            ("e2", None),
            ("e3", [0.0] * self.DIM8),
            ("e4", [float(x) for x in v4]),
            ("e5", [float(x) for x in v5]),
        ]
        return spark.createDataFrame(rows, "conv_id string, embedding array<float>")

    def _cfg(self, **kw):
        return DedupConfig(
            exact=True,
            semantic=True,
            semantic_threshold=0.9,
            semantic_planes=2,
            semantic_tables=8,
            **kw,
        )

    def test_float32_external_vectors_roundtrip(self, spark):
        res = run_pipeline(
            self._corpus(spark), self._cfg(), embeddings=self._embeddings(spark)
        )
        reps = {
            r["conv_id"]: r["rep_conv_id"] for r in res.clusters.collect()
        }
        assert reps["e0"] == reps["e1"] == "e0"      # twin vectors pair
        # NULL-embedding and zero-vector conversations stay singletons
        for cid in ("e2", "e3", "e4", "e5"):
            assert reps[cid] == cid

    def test_empty_embeddings_frame_raises(self, spark):
        empty = spark.createDataFrame(
            [], "conv_id string, embedding array<float>"
        )
        with pytest.raises(ValueError, match="semantic_dim"):
            run_pipeline(self._corpus(spark), self._cfg(), embeddings=empty)

    def test_declared_dim_mismatch_fails_loudly(self, spark):
        with pytest.raises(Exception, match="dim mismatch"):
            run_pipeline(
                self._corpus(spark),
                self._cfg(semantic_dim=16),  # vectors are dim 8
                embeddings=self._embeddings(spark),
            ).clusters.collect()


def test_verify_cosine_null_and_dim_mismatch_degrade_to_null(spark):
    """Round-5 ADVICE: out-of-contract embeddings (NULL vector, wrong dim)
    passed to the public verify_cosine_pairs API drop the pair (NULL cos,
    never >= threshold) like the old SQL try_divide path — no executor
    crash from np.stack on ragged arrays."""
    from fastq_dupaway_spark.detectors.semantic import verify_cosine_pairs

    good = [1.0] + [0.0] * (DIM - 1)
    emb = spark.createDataFrame(
        [
            ("g1", good),
            ("g2", good),
            ("nul", None),
            ("short", [1.0, 2.0]),
            ("zero", [0.0] * DIM),
        ],
        "conv_id string, embedding array<double>",
    )
    cands = spark.createDataFrame(
        [("g1", "g2"), ("g1", "nul"), ("g1", "short"), ("g1", "zero")],
        "conv_a string, conv_b string",
    )
    rows = verify_cosine_pairs(emb, cands, threshold=0.5).collect()
    assert {(r["conv_a"], r["conv_b"]) for r in rows} == {("g1", "g2")}
    assert abs(rows[0]["cos"] - 1.0) < 1e-9


def test_pairwise_cosine_accumulates_in_float64(spark):
    """Round-5 ADVICE: float32 external embeddings are upcast before the
    einsum so the 4-digit-rounded cosine matches the double-precision SQL
    baseline at threshold boundaries. Construct a float32 pair whose
    float32-accumulated cosine would round differently than float64."""
    from fastq_dupaway_spark.detectors.semantic import verify_cosine_pairs

    rng = np.random.RandomState(11)
    dim = 512
    a64 = rng.standard_normal(dim)
    b64 = a64 + 0.03 * rng.standard_normal(dim)
    a32 = a64.astype(np.float32)
    b32 = b64.astype(np.float32)
    want = round(
        float(
            np.dot(a32.astype(np.float64), b32.astype(np.float64))
            / (
                np.linalg.norm(a32.astype(np.float64))
                * np.linalg.norm(b32.astype(np.float64))
            )
        ),
        4,
    )
    emb = spark.createDataFrame(
        [("a", [float(x) for x in a32]), ("b", [float(x) for x in b32])],
        "conv_id string, embedding array<float>",
    )
    cands = spark.createDataFrame([("a", "b")], "conv_a string, conv_b string")
    rows = verify_cosine_pairs(emb, cands, threshold=0.0).collect()
    assert len(rows) == 1
    assert abs(rows[0]["cos"] - want) < 1e-12
