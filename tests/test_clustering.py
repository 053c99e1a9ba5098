"""Connected components (large-star/small-star) sanity + parity with a
trivial union-find."""

from __future__ import annotations

import random

from fastq_dupaway_spark.clustering import clusters_with_singletons, connected_components


def _uf_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_cc_matches_union_find(spark):
    rng = random.Random(3)
    nodes = [f"n{i:04d}" for i in range(200)]
    edges = [tuple(rng.sample(nodes, 2)) for _ in range(150)]
    pairs = spark.createDataFrame(edges, "conv_a string, conv_b string")
    got = {
        r["conv_id"]: r["rep_conv_id"]
        for r in connected_components(pairs).collect()
    }
    touched = {n for e in edges for n in e}
    want = _uf_components(edges, nodes)
    assert got == {n: want[n] for n in touched}


def test_cc_chain_and_singletons(spark):
    # a long path graph is the worst case for label propagation
    edges = [(f"p{i:03d}", f"p{i + 1:03d}") for i in range(99)]
    pairs = spark.createDataFrame(edges, "conv_a string, conv_b string")
    all_ids = spark.createDataFrame(
        [(f"p{i:03d}",) for i in range(100)] + [("lonely",)], "conv_id string"
    )
    got = {
        r["conv_id"]: r["rep_conv_id"]
        for r in clusters_with_singletons(all_ids, pairs).collect()
    }
    assert all(got[f"p{i:03d}"] == "p000" for i in range(100))
    assert got["lonely"] == "lonely"
