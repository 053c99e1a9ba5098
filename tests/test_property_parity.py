"""Property-based parity: the distributed sorted-adjacency scan must equal
the pure-Python reference oracle on ARBITRARY generated corpora, at any
partitioning — cheap insurance for the boundary-stitching replay
(VERDICT r1 next-round item 10).

hypothesis drives (seed, dup_rate, n_partitions, mode); each example is a
full corpus generation + Spark scan, so max_examples is kept small and
deadlines are disabled (Spark job latency is not the property under test).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fastq_dupaway_spark import corpus, oracle
from fastq_dupaway_spark.canonicalize import conversation_texts
from fastq_dupaway_spark.detectors.parity_scan import parity_clusters

_spark_holder = {}


@pytest.fixture(autouse=True)
def _capture_spark(spark):
    # hypothesis-wrapped tests cannot take function-scoped fixtures
    # directly alongside @given; stash the session-scoped spark
    _spark_holder["s"] = spark
    yield


def _oracle_assignment(convs, mode, d=2):
    res = oracle.seq_dedup(convs, mode, d)
    out = {}
    for head, members in res.clusters.items():
        out[head] = head
        for m in members:
            out[m] = head
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 10_000),
    dup_rate=st.floats(0.1, 0.8),
    n_parts=st.integers(1, 13),
    mode=st.sampled_from(["tight", "loose", "hamming"]),
)
def test_parity_scan_equals_oracle(seed, dup_rate, n_parts, mode):
    spark = _spark_holder["s"]
    convs = corpus.generate_corpus(
        seed=seed, n_conv=40, dup_rate=dup_rate, hamming_d=2
    )
    t = corpus.conv_df(spark, convs)
    ct = conversation_texts(t)
    got = {
        r["conv_id"]: r["rep_conv_id"]
        for r in parity_clusters(ct, mode, d=2, num_partitions=n_parts).collect()
    }
    want = _oracle_assignment(convs, mode)
    assert got == want
