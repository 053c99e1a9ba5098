"""Sorted-adjacency parity scan vs oracle: golden fixtures, generated
corpora, and multi-partition boundary stitching."""

from __future__ import annotations

import pytest

from fastq_dupaway_spark import corpus, oracle
from fastq_dupaway_spark.canonicalize import conversation_texts
from fastq_dupaway_spark.detectors import parity_scan


def _run(spark, convs, mode, d=2, num_partitions=None, head_cap=4096):
    df = corpus.conv_df(spark, convs)
    ct = conversation_texts(df)
    rows = parity_scan.parity_clusters(
        ct, mode, d=d, num_partitions=num_partitions, head_cap=head_cap
    ).collect()
    got: dict[str, set[str]] = {}
    for r in rows:
        got.setdefault(r["rep_conv_id"], set()).add(r["conv_id"])
    return got


def _want(convs, mode, d=2):
    r = oracle.seq_dedup(convs, mode, d=d)
    return {h: {h, *m} for h, m in r.clusters.items()}


CASES = [
    ("single_tight", "tight", 2),
    ("single_loose", "loose", 2),
    ("single_hamming", "hamming", 1),
    ("paired_tight", "tight", 2),
]


@pytest.mark.parametrize("name,mode,d", CASES)
def test_parity_fixtures(spark, name, mode, d):
    convs = corpus.FIXTURES[name]
    assert _run(spark, convs, mode, d) == _want(convs, mode, d)


@pytest.mark.parametrize("mode,d", [("tight", 0), ("loose", 0), ("hamming", 2)])
@pytest.mark.parametrize("nparts", [1, 4, 13])
def test_parity_generated_multi_partition(spark, mode, d, nparts):
    """Boundary stitching: identical clusters at 1, 4, 13 range partitions."""
    convs = corpus.generate_corpus(seed=11, n_conv=150, dup_rate=0.5)
    got = _run(spark, convs, mode, d=d, num_partitions=nparts)
    assert got == _want(convs, mode, d=d)


def test_parity_cross_boundary_dup_run(spark):
    """A long run of identical conversations spanning several range
    partitions must still collapse to one cluster."""
    convs = [(f"a{i:04d}", ["SAME TEXT EVERYWHERE"]) for i in range(40)]
    convs += [(f"b{i:04d}", [f"unique text number {i:04d}"]) for i in range(40)]
    got = _run(spark, convs, "tight", num_partitions=8)
    assert got == _want(convs, "tight")
    assert got["a0000"] == {f"a{i:04d}" for i in range(40)}


def test_parity_hamming_chain_across_boundary(spark):
    """Hamming run semantics (non-transitive) preserved across partitions."""
    base = "AAAAAAAAAA"
    convs = [("c%03d" % i, [base[: 10 - (i % 2)] + ("B" * (i % 2))]) for i in range(6)]
    convs += [(f"z{i:03d}", [f"tail {i:03d}"]) for i in range(20)]
    for nparts in (1, 3, 7):
        got = _run(spark, convs, "hamming", d=1, num_partitions=nparts)
        assert got == _want(convs, "hamming", d=1), nparts
