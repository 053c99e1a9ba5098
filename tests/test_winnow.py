"""Winnowing fingerprint detector (detectors/winnow.py): kernel parity vs
a pure-Python reference, the paper's shared-substring guarantee, planted
near-dup recovery, boilerplate df-cap + quarantine surface, and pipeline
integration."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from fastq_dupaway_spark.detectors.winnow import (
    HASH_BASE,
    HASH_MOD,
    K_GRAM,
    W_WINDOW,
    _winnow_batch,
    winnow_dup_pairs,
    winnow_fingerprints,
    winnow_hot_fingerprints,
)


def winnow_ref(s: str | None, k: int = K_GRAM, w: int = W_WINDOW) -> set[int]:
    """Scalar reference implementation (independent of the numpy kernel)."""
    if s is None:
        s = ""
    n = len(s)
    if n == 0:
        return set()
    gl = min(k, n)
    m = max(n - k + 1, 1)
    grams = []
    for i in range(m):
        h = 0
        for ch in s[i : i + gl]:
            h = (h * HASH_BASE + ord(ch)) % HASH_MOD
        grams.append(h)
    if m >= w:
        return {min(grams[p : p + w]) for p in range(m - w + 1)}
    return {min(grams)}


class TestKernel:
    def test_matches_scalar_reference(self):
        rng = random.Random(11)
        cases = [
            None,
            "",
            "a",
            "x" * (K_GRAM - 1),
            "x" * K_GRAM,
            "x" * (K_GRAM + W_WINDOW - 2),  # m = w - 1 (min-over-all path)
            "x" * (K_GRAM + W_WINDOW - 1),  # m = w (first sliding window)
            "hello world " * 10,
            "日本語テキストのサンプル、これは混在 ascii です。" * 3,
        ]
        cases += [
            "".join(rng.choice("abcdef ") for _ in range(rng.randint(0, 60)))
            for _ in range(300)
        ]
        got = _winnow_batch(cases, K_GRAM, W_WINDOW)
        for s, fps in zip(cases, got):
            assert sorted(set(fps)) == sorted(fps), "kernel must emit sets"
            assert set(fps) == winnow_ref(s), repr(s)

    def test_short_gram_doc_followed_by_empty_doc(self):
        """Regression: a doc with 2..w-1 grams immediately followed by a
        zero-gram (empty/NULL) doc in the same batch. The original
        batch-wide reduceat clamped the empty doc's segment boundary to
        total_g - 1, silently dropping the short doc's LAST gram from its
        min — wrong whenever that gram was the minimum."""
        rng = random.Random(99)
        cases = []
        for ng in range(2, W_WINDOW):
            for _ in range(50):
                s = "".join(
                    rng.choice("abcdefghij")
                    for _ in range(K_GRAM + ng - 1)
                )
                cases += [s, ""]
        cases += [None]
        got = _winnow_batch(cases, K_GRAM, W_WINDOW)
        for s, fps in zip(cases, got):
            assert set(fps) == winnow_ref(s), repr(s)

    def test_shared_substring_guarantee(self):
        """The paper's guarantee: any shared substring of length
        >= w + k - 1 yields at least one shared fingerprint — regardless
        of what surrounds it in either document."""
        rng = random.Random(23)
        alphabet = "abcdefghijklmnopqrstuvwxyz "
        thresh = W_WINDOW + K_GRAM - 1
        for _ in range(50):
            shared = "".join(rng.choice(alphabet) for _ in range(thresh))
            a = (
                "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
                + shared
                + "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
            )
            b = (
                "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
                + shared
                + "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
            )
            fa, fb = _winnow_batch([a, b], K_GRAM, W_WINDOW)
            assert set(fa) & set(fb), (a, b)


@pytest.fixture(scope="module")
def winnow_docs(spark):
    """60 base docs + 10 near-dup variants (long shared substring) + 6
    exact copies; texts are long enough that every doc has > w grams."""
    rng = random.Random(7)
    words = [f"tok{i:03d}" for i in range(300)]
    rows = []
    for i in range(60):
        text = " ".join(rng.choice(words) for _ in range(40))
        rows.append((f"d{i:04d}", text))
    base = dict(rows)
    expected = set()
    for i in range(10):  # near-dups: same text plus a short suffix
        src = f"d{i:04d}"
        rows.append((f"n{i:04d}", base[src] + " extra tail words here"))
        expected.add((f"d{i:04d}", f"n{i:04d}"))
    for i in range(6):  # exact copies
        src = f"d{i + 20:04d}"
        rows.append((f"c{i:04d}", base[src]))
        expected.add((f"c{i:04d}", f"d{i + 20:04d}"))
    df = spark.createDataFrame(rows, "conv_id string, text string")
    return df, expected


class TestDetector:
    def test_planted_pairs_recovered_exactly(self, spark, winnow_docs):
        docs, expected = winnow_docs
        pairs = winnow_dup_pairs(
            docs, id_col="conv_id", min_shared=8
        ).collect()
        got = {(r.conv_a, r.conv_b) for r in pairs}
        assert got == expected
        # shared counts are large for true dups (most fingerprints common)
        assert min(r.n_shared for r in pairs) >= 8

    def test_fingerprints_distinct_per_doc(self, spark, winnow_docs):
        docs, _ = winnow_docs
        fps = winnow_fingerprints(docs, id_col="conv_id")
        n = fps.count()
        nd = fps.distinct().count()
        assert n == nd

    def test_max_df_excludes_and_surfaces_boilerplate(self, spark):
        """A license-header-style string shared by EVERY doc: with max_df,
        its fingerprints are excluded (no pair explosion) and reported via
        winnow_hot_fingerprints; unrelated docs then share nothing."""
        rng = random.Random(3)
        words = [f"w{i:03d}" for i in range(500)]
        header = "standard license header shared by every document verbatim"
        rows = [
            (
                f"d{i:03d}",
                header + " " + " ".join(rng.choice(words) for _ in range(30)),
            )
            for i in range(40)
        ]
        docs = spark.createDataFrame(rows, "conv_id string, text string")
        fps = winnow_fingerprints(docs, id_col="conv_id").persist()
        hot = winnow_hot_fingerprints(fps, max_df=20).collect()
        assert hot, "header fingerprints must be surfaced as hot"
        assert all(r.bucket_n > 20 for r in hot)
        capped = winnow_dup_pairs(
            docs, id_col="conv_id", min_shared=2, max_df=20
        ).collect()
        # the only shared content is the excluded header -> no pairs
        assert capped == []
        uncapped = winnow_dup_pairs(
            docs, id_col="conv_id", min_shared=2, max_df=None
        ).count()
        assert uncapped == 40 * 39 / 2  # header links everything


def test_streaming_winnow_candidates(spark, tmp_path):
    """Stateful winnow candidates over a file stream: a conversation
    sharing a long substring with an EARLIER micro-batch's conversation
    collides in its fingerprint buckets (state carries membership across
    the batch boundary); unrelated text emits nothing."""
    from datetime import datetime, timezone

    from fastq_dupaway_spark.streaming import streaming_winnow_candidates

    base = (
        "the quick brown fox jumps over the lazy dog near the river "
        "bank today at noon"
    )
    schema = "conv_id string, text string, ts timestamp"
    src = tmp_path / "stream_src"
    src.mkdir()
    ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    spark.createDataFrame([("a1", base, ts)], schema).write.parquet(
        str(src / "f1.parquet")
    )
    spark.createDataFrame(
        [
            ("a2", base + " with an extra tail", ts),
            ("zz", "completely different words about spark shuffles "
                   "and parquet file compaction strategies", ts),
        ],
        schema,
    ).write.parquet(str(src / "f2.parquet"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        streaming_winnow_candidates(stream)
        .writeStream.format("memory")
        .queryName("winnow_cands")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["conv_a"], r["conv_b"])
        for r in spark.sql("select * from winnow_cands").collect()
    }
    assert got == {("a1", "a2")}


class TestPipeline:
    def test_winnow_detector_clusters_planted_dups(
        self, spark, winnow_docs, tmp_path
    ):
        from fastq_dupaway_spark.pipeline import DedupConfig, run_pipeline

        docs, expected = winnow_docs
        transcripts = docs.select(
            "conv_id",
            F.lit(0).alias("turn_idx"),
            F.lit("user").alias("role"),
            "text",
            F.lit(None).cast("string").alias("tool"),
            F.current_timestamp().alias("ts"),
        )
        cfg = DedupConfig(exact=False, winnow=True)
        expected_clustered = {a for a, _ in expected} | {
            b for _, b in expected
        }
        for root in (None, str(tmp_path / "ckpt")):
            res = run_pipeline(transcripts, cfg, checkpoint_root=root)
            clusters = {
                r.conv_id: r.rep_conv_id for r in res.clusters.collect()
            }
            for a, b in expected:
                assert clusters[a] == clusters[b]
            singletons = {
                c for c, rep in clusters.items() if c == rep
            }
            # every non-planted doc is its own cluster
            assert (
                len(singletons)
                == len(clusters) - len(expected_clustered) / 2
            )
        # checkpointed run exposes the stage list incl. the fp stages
        names = {s["stage"] for s in res.stages}
        assert {"winnow_fingerprints", "winnow_hot_fingerprints",
                "winnow_pairs"} <= names
