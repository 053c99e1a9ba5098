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


class _FakeGroupState:
    """Minimal GroupState stand-in for unit-testing _bucket_update."""

    def __init__(self, exists=False, value=None, timed_out=False):
        self.exists = exists
        self.get = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.updated = None
        self.timeout_ms = None

    def remove(self):
        self.removed = True

    def update(self, v):
        self.updated = v

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def test_bucket_update_timeout_removes_state():
    """ProcessingTimeTimeout firing on an idle bucket must REMOVE the
    state, not re-arm it — the round-2 version called update() +
    setTimeoutDuration() unconditionally, resurrecting every idle bucket
    forever (unbounded state growth)."""
    from fastq_dupaway_spark.streaming import _bucket_update

    update = _bucket_update(max_state=4, timeout_minutes=1)
    st = _FakeGroupState(exists=True, value=(["a", "b"], 2), timed_out=True)
    assert list(update(("k",), iter([]), st)) == []
    assert st.removed
    assert st.updated is None and st.timeout_ms is None  # not re-armed


def test_bucket_update_pairs_and_state_bound():
    """Normal path: every arrival pairs against stored members; state is
    capped at max_state but over-cap arrivals still PAIR (cluster joins
    survive the cap), and each pair row carries the bucket's cumulative
    arrival count (the over-cap quarantine surface)."""
    import pandas as pd

    from fastq_dupaway_spark.streaming import _bucket_update

    update = _bucket_update(max_state=2, timeout_minutes=1)
    st = _FakeGroupState()
    batches = iter([pd.DataFrame({"conv_id": ["a", "b", "c", "d"]})])
    out = list(update(("k",), batches, st))
    pairs = set(zip(out[0]["conv_a"], out[0]["conv_b"]))
    assert pairs == {("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"), ("b", "d")}
    assert st.updated == (["a", "b"], 4)  # capped members + total arrivals
    assert st.timeout_ms == 60_000 and not st.removed
    # over-cap arrivals (c is #3, d is #4 against max_state=2) are marked
    by_pair = dict(
        zip(zip(out[0]["conv_a"], out[0]["conv_b"]), out[0]["bucket_n"])
    )
    assert by_pair[("a", "b")] == 2          # emitted within cap
    assert by_pair[("a", "d")] == 4 > 2      # emitted over cap: surfaced


def test_bucket_update_over_cap_counter_across_batches():
    """A planted hot stream key keeps counting across micro-batches: the
    resumed state carries n_seen, so later batches emit bucket_n above
    max_state — the cross-batch over-cap surface (round-3 verdict item 7)."""
    import pandas as pd

    from fastq_dupaway_spark.streaming import _bucket_update

    update = _bucket_update(max_state=2, timeout_minutes=1)
    # micro-batch 1 fills the bucket to the cap
    st1 = _FakeGroupState()
    list(update(("hot",), iter([pd.DataFrame({"conv_id": ["a", "b"]})]), st1))
    assert st1.updated == (["a", "b"], 2)
    # micro-batch 2 resumes that state; every new arrival is over-cap
    st2 = _FakeGroupState(exists=True, value=st1.updated)
    out = list(update(("hot",), iter([pd.DataFrame({"conv_id": ["x", "y"]})]), st2))
    assert st2.updated == (["a", "b"], 4)  # members still capped
    assert out[0]["bucket_n"].min() > 2    # all marked over-cap
    assert set(out[0]["conv_a"]) | set(out[0]["conv_b"]) == {"a", "b", "x", "y"}


def _near_dup_stream_corpus():
    """Deterministic single-turn corpus with planted near-dup twins:
    20 bases of 12 distinct tokens; even bases get a twin sharing all
    shingles plus a small tail (high Jaccard). Returns (rows, twin_pairs)
    with rows as (conv_id, text, ts)."""
    from datetime import datetime, timezone

    rows, twins = [], []
    ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    for i in range(20):
        text = " ".join(f"w{i}x{j}" for j in range(12))
        rows.append((f"c{i:02d}", text, ts))
        if i % 2 == 0:
            rows.append((f"c{i:02d}x", text + " tail", ts))
            twins.append((f"c{i:02d}", f"c{i:02d}x"))
    return rows, twins


def test_streaming_candidate_recall_vs_batch_and_restart(spark, tmp_path):
    """Scores the streaming LSH candidates against the BATCH minhash
    authority at the identical config (same permutations/banding via
    shared _perm_coeffs + xxhash64 band keys): every batch-VERIFIED pair
    must appear among the stream's candidates (candidate recall 1.0 on
    this corpus). Also kills the stream mid-corpus and restarts from its
    checkpoint: a pair whose members straddle the restart proves bucket
    state survived recovery."""
    from fastq_dupaway_spark.detectors.minhash import (
        lsh_candidates,
        minhash_signatures,
        shingle_hashes,
        verify_jaccard_pairs,
    )
    from fastq_dupaway_spark.streaming import streaming_lsh_candidates

    rows, twins = _near_dup_stream_corpus()
    schema = "conv_id string, text string, ts timestamp"

    # ---- batch authority at the same (n=3, k=32, bands=8, seed=42) ----
    t = spark.createDataFrame(
        [(cid, 0, "user", text, None) for cid, text, _ in rows],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    sh = shingle_hashes(t, n=3)
    batch_verified = {
        (r["conv_a"], r["conv_b"])
        for r in verify_jaccard_pairs(
            sh, lsh_candidates(minhash_signatures(sh, k=32), n_bands=8), 0.5
        ).collect()
    }
    assert set(twins) <= batch_verified  # planted twins are real near-dups

    # ---- stream phase 1: all but the last file, then terminate ---------
    src = tmp_path / "src"
    src.mkdir()
    # c00's twin goes in the LAST file: its pair must straddle the restart
    last = [r for r in rows if r[0] == "c00x"]
    first = [r for r in rows if r[0] != "c00x"]
    spark.createDataFrame(first[: len(first) // 2], schema).write.parquet(
        str(src / "f1.parquet")
    )
    spark.createDataFrame(first[len(first) // 2 :], schema).write.parquet(
        str(src / "f2.parquet")
    )

    out_dir = tmp_path / "out"

    def run_stream():
        # parquet sink: supports exactly-once checkpoint RECOVERY (the
        # memory sink does not) and accumulates output across restarts
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*")
        )
        q = (
            streaming_lsh_candidates(stream, n=3, k=32, n_bands=8)
            .writeStream.format("parquet")
            .option("path", str(out_dir))
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.awaitTermination(180)
        return {
            (r["conv_a"], r["conv_b"])
            for r in spark.read.schema("conv_a string, conv_b string")
            .parquet(str(out_dir))
            .collect()
        }

    run_stream()  # phase 1 (query terminates: kill point)

    # ---- phase 2: new file arrives, restart from the same checkpoint ---
    spark.createDataFrame(last, schema).write.parquet(str(src / "f3.parquet"))
    cands = run_stream()  # cumulative parquet output across both phases

    missing = batch_verified - cands
    assert not missing, f"stream candidates missed verified pairs: {missing}"
    # the pair straddling the kill/restart boundary specifically:
    assert ("c00", "c00x") in cands


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


def test_score_pairs_is_one_action(spark, monkeypatch):
    """Round-5 verdict item 8: score_pairs folds its three counts into a
    single full-outer-join aggregation — exactly one action (a collect of
    the one-row agg), zero DataFrame.count calls. (A raw job-count probe
    is unusable here: AQE legitimately splits the one collect into several
    stage-materialization jobs.)"""
    got = spark.createDataFrame(
        [("a", "b"), ("c", "d"), ("x", "y")], "conv_a string, conv_b string"
    )
    # patch the concrete runtime class (pyspark 4 classic/connect subclass
    # the public pyspark.sql.DataFrame and override its methods)
    DataFrame = type(got)
    want = spark.createDataFrame(
        [("b", "a"), ("e", "f")], "conv_a string, conv_b string"
    )
    actions = {"collect": 0}
    real_collect = DataFrame.collect

    def counting_collect(self):
        actions["collect"] += 1
        return real_collect(self)

    def no_count(self):
        raise AssertionError("score_pairs must not issue count() actions")

    monkeypatch.setattr(DataFrame, "collect", counting_collect)
    monkeypatch.setattr(DataFrame, "count", no_count)
    s = score_pairs(got, want)
    assert actions["collect"] == 1
    assert s.n_hit == 1 and s.n_got == 3 and s.n_expected == 2
    assert s.recall == 0.5 and abs(s.precision - 1 / 3) < 1e-12


def test_bucket_update_vectorized_matches_scalar_reference():
    """Differential: the vectorized _bucket_update kernel must reproduce
    the scalar sequential semantics exactly — arrival i pairs against
    stored state plus earlier-ADMITTED same-batch arrivals, duplicates
    never pair with themselves, admission is first-occurrence under cap —
    across random streams with duplicates, multi-chunk batches, and
    resumed state."""
    import random

    import pandas as pd

    from fastq_dupaway_spark.streaming import _bucket_update

    def scalar(seen0, n_seen0, chunks, max_state):
        seen, n_seen = list(seen0), n_seen0
        rows = []
        for chunk in chunks:
            for cid in chunk:
                n_seen += 1
                for other in seen:
                    if other != cid:
                        rows.append((min(other, cid), max(other, cid), n_seen))
                if len(seen) < max_state and cid not in seen:
                    seen.append(cid)
        return rows, (seen, n_seen)

    rng = random.Random(7)
    ids = [f"c{i}" for i in range(12)]
    for trial in range(40):
        max_state = rng.choice([1, 2, 3, 5, 8])
        seen0 = rng.sample(ids, rng.randint(0, min(max_state, 4)))
        n_seen0 = len(seen0) + rng.randint(0, 5)
        n_chunks = rng.randint(0, 3)
        chunks = [
            [rng.choice(ids) for _ in range(rng.randint(0, 8))]
            for _ in range(n_chunks)
        ]
        want_rows, want_state = scalar(seen0, n_seen0, chunks, max_state)

        update = _bucket_update(max_state=max_state, timeout_minutes=1)
        st = _FakeGroupState(exists=bool(seen0 or n_seen0), value=(seen0, n_seen0))
        out = list(
            update(("k",), iter([pd.DataFrame({"conv_id": c}) for c in chunks]), st)
        )
        got_rows = sorted(
            (a, b, int(n))
            for df in out
            for a, b, n in zip(df["conv_a"], df["conv_b"], df["bucket_n"])
        )
        assert got_rows == sorted(want_rows), (trial, got_rows, want_rows)
        assert st.updated == want_state, (trial, st.updated, want_state)
