"""The pure-Python oracle must reproduce every golden expectation from the
reference fixtures (FIXTURES.md F1-F8) before it is trusted to score the
Spark pipeline."""

from __future__ import annotations

from fastq_dupaway_spark import corpus, oracle


def test_f1_single_tight():
    r = oracle.seq_dedup(corpus.FIXTURES["single_tight"], "tight")
    assert r.survivor_set == {"00001", "00003"}
    assert r.clusters["00001"] == ["00002"]


def test_f2_single_loose():
    r = oracle.seq_dedup(corpus.FIXTURES["single_loose"], "loose")
    assert r.survivor_set == {"00001", "00003"}
    assert r.clusters["00001"] == ["00002", "00004"]


def test_f3_single_hamming_non_transitive():
    r = oracle.seq_dedup(corpus.FIXTURES["single_hamming"], "hamming", d=1)
    assert r.survivor_set == {"00001", "00003", "00004"}
    assert r.clusters["00001"] == ["00002"]
    # d(00001, 00004) == 1, but 00004 survives: non-adjacency at compare time
    assert oracle.hamming_distance("GGATAGA", "TGATAGA") == 1


def test_f4_single_fast_order():
    r = oracle.fast_dedup(corpus.FIXTURES["single_fast"])
    assert r.survivors == ["0001", "0002", "0003", "0005", "0007", "0009"]
    assert r.clusters["0001"] == ["0004"]
    assert r.clusters["0002"] == ["0006"]


def test_f5_paired_tight_sorted_order():
    r = oracle.seq_dedup(corpus.FIXTURES["paired_tight"], "tight")
    assert r.survivor_set == {"00001", "00003", "00004"}
    assert r.clusters["00001"] == ["00002"]
    # output order = composite (turn0, turn1) sort order: 00003 first
    assert r.survivors == ["00003", "00001", "00004"]


def test_f6_paired_fast():
    r = oracle.fast_dedup(corpus.FIXTURES["paired_fast"])
    assert r.survivors == ["0001", "0002", "0003", "0004", "0005", "0007", "0009"]


EXPECTED_UNORDERED = {
    "shuffled": ["0001", "0002", "0003", "0004", "0005", "0007", "0009"],
    "skewed": ["0004", "0005", "0006", "0007", "0008", "0009"],
    "deletion": ["0001", "0002", "0003", "0007", "0009", "0010"],
    "interleaved": ["0003"],
    "not_overlapped": [],
}


def test_f7_unordered_variants():
    for variant, expected in EXPECTED_UNORDERED.items():
        s0, s1 = corpus.UNORDERED_FIXTURES[variant]
        r = oracle.unordered_dedup(s0, s1)
        assert r.survivors == expected, variant


def test_f8_negative_control():
    tight = oracle.seq_dedup(corpus.FIXTURES["single_hamming"], "tight")
    ham = oracle.seq_dedup(corpus.FIXTURES["single_hamming"], "hamming", d=1)
    assert tight.survivor_set != ham.survivor_set


def test_dup_pairs_relation():
    r = oracle.seq_dedup(corpus.FIXTURES["single_loose"], "loose")
    assert r.dup_pairs() == {("00001", "00002"), ("00001", "00004"), ("00002", "00004")}
