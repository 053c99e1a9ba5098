"""Connected components over the candidate-pair graph.

The reference never needs this: its clusters are runs over a sorted file
(/root/reference/src/seq_dup_remover.hpp:78-105). The generalized detectors
(MinHash/SimHash/containment) emit an unordered edge list instead, so
clustering = connected components. Implemented as the alternating
large-star / small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) on DataFrames: O(log^2 n) rounds, each
round two shuffles, per-iteration localCheckpoint to truncate lineage
(SURVEY.md §4 custom-work item 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to the
    minimum of N(u) ∪ {u}. Output may carry duplicate edges — the next
    star's collect_set dedups them, so no distinct exchange here."""
    bidir = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    grouped = bidir.groupBy("src").agg(
        F.collect_set("dst").alias("nbrs"),
    )
    return (
        grouped.select(
            F.col("src").alias("u"),
            F.least(F.array_min("nbrs"), F.col("src")).alias("m"),
            F.explode(F.filter("nbrs", lambda v: v > F.col("src"))).alias("v"),
        )
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges (src > dst); for each node u: connect u and all its
    smaller neighbors to the minimum of that set. Output deduped by the
    caller's per-round distinct (one exchange per round, not three)."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).where(F.col("src") != F.col("dst"))
    grouped = oriented.groupBy("src").agg(F.collect_set("dst").alias("nbrs"))
    return (
        grouped.select(
            F.col("src").alias("u"),
            F.array_min("nbrs").alias("m"),
            F.explode(
                F.array_union("nbrs", F.array(F.col("src")))
            ).alias("v"),
        )
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
    )


def _observed_checkpoint(e: DataFrame, tag: str):
    """Materialize an edge set with its set-fingerprint piggybacked on the
    SAME job via df.observe (bit_xor is duplicate-cancelling, so it is only
    a valid set fingerprint downstream of the distinct). One Spark job per
    round — the driver-side serial fraction of the CC loop is the scaling
    bottleneck at small parallelism, so no separate fingerprint action."""
    obs = Observation(f"cc_fp_{tag}")
    observed = e.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "bit_xor(xxhash64(greatest(src, dst), least(src, dst)))"
        ).alias("h"),
    )
    ckpt = observed.localCheckpoint()
    m = obs.get
    return ckpt, (m["n"], m["h"])


def connected_components(
    pairs: DataFrame, max_iter: int = 50, stats: dict | None = None
) -> DataFrame:
    """pairs: (conv_a, conv_b) undirected edges. Returns (conv_id,
    rep_conv_id) for every node that appears in an edge, where rep is the
    component minimum (matching the exact detector's min-conv_id
    representative election).

    Driver-side loop, ONE job per round: distinct-edge fixed-point check
    rides the round's localCheckpoint via df.observe instead of a separate
    fingerprint action, and the stars themselves emit non-distinct edges
    (collect_set dedups) so each round is exactly three exchanges
    (large-star groupBy, small-star groupBy, distinct). localCheckpoint
    truncates lineage — without it the plan doubles per round.

    stats: optional dict; receives {"cc_rounds": r, "cc_edges": n}.
    """
    edges, prev = _observed_checkpoint(
        pairs.select(F.col("conv_a").alias("src"), F.col("conv_b").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct(),
        "init",
    )
    # Scale-adaptive shuffle sizing for the star rounds (guide §2.2): the
    # edge count is known exactly after the init checkpoint (it rode the
    # observe), and candidate-pair graphs are typically orders of
    # magnitude smaller than the corpus the session's shuffle.partitions
    # was sized for — at bench scale, 57k edges through 64-partition
    # exchanges spent more wall time on task scheduling than on edges
    # (measured 2.4-4.0 s at 64 parts vs 1.3-1.9 s at 8-16, identical
    # output). Derive partitions from the edge count (~250k edges per
    # partition, floor 8) and never RAISE above the session setting, so a
    # cluster-sized configuration is respected and a big graph keeps its
    # parallelism. Restored in finally — the conf is session-global.
    spark = pairs.sparkSession
    conf_key = "spark.sql.shuffle.partitions"
    saved_parts = spark.conf.get(conf_key)
    rounds = 0
    try:
        n_edges = prev[0]
        adaptive = min(
            int(saved_parts), max(8, -(-int(n_edges) // 250_000))
        )
        if adaptive < int(saved_parts):
            spark.conf.set(conf_key, str(adaptive))
        for i in range(max_iter):
            edges, cur = _observed_checkpoint(
                _small_star(_large_star(edges)).distinct(), str(i)
            )
            rounds += 1
            if cur == prev:
                break
            prev = cur
    finally:
        spark.conf.set(conf_key, saved_parts)
    if stats is not None:
        stats["cc_rounds"] = rounds
        stats["cc_edges"] = prev[0]

    # After convergence every edge is (node -> component min); nodes that
    # ARE the min appear only as dst. Emit both sides.
    members = edges.select(
        F.col("src").alias("conv_id"), F.col("dst").alias("rep_conv_id")
    )
    reps = edges.select(
        F.col("dst").alias("conv_id"), F.col("dst").alias("rep_conv_id")
    ).distinct()
    return members.union(reps)


def clusters_with_singletons(
    all_ids: DataFrame, pairs: DataFrame, stats: dict | None = None
) -> DataFrame:
    """Full (conv_id, rep_conv_id) assignment: components from `pairs`
    plus rep=self for conversations untouched by any edge. all_ids must
    have a `conv_id` column."""
    comp = connected_components(pairs, stats=stats)
    singles = all_ids.select("conv_id").join(
        comp.select("conv_id"), "conv_id", "left_anti"
    )
    return comp.union(
        singles.select("conv_id", F.col("conv_id").alias("rep_conv_id"))
    )
