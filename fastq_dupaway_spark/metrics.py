"""Scoring: dup-pair recall / precision vs the reference-semantics oracle.

BASELINE.json's headline correctness metric: dup-pair recall >= 0.99 vs
reference clusters at identical config. The pair relation is
"same cluster" expanded to unordered conv_id pairs — recall is measured on
pairs so that over-merging shows up as precision loss, never recall gain
(SURVEY.md §7.3.1).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cluster_pairs(
    clusters: DataFrame, max_cluster: int | None = None
) -> DataFrame:
    """(conv_id, rep_conv_id) -> unordered same-cluster pairs (a < b).
    Pairs within a cluster of size m expand to m*(m-1)/2 rows via a
    self-join on rep.

    max_cluster: at production scale a boilerplate cluster of 10^6
    members would expand to 5*10^11 pairs; passing a cap expands only the
    `max_cluster` smallest-id members of each cluster (deterministic
    sample, pairs per cluster bounded by max_cluster^2/2). Recall scored
    on the sampled expansion is an unbiased check of cluster AGREEMENT on
    the sampled members; parity-scoring corpora keep clusters small and
    use the exact default."""
    if max_cluster is not None:
        w = Window.partitionBy("rep_conv_id").orderBy("conv_id")
        clusters = (
            clusters.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_cluster)
            .drop("_rn")
        )
    a = clusters.select(F.col("rep_conv_id").alias("rep"), F.col("conv_id").alias("x"))
    b = clusters.select(F.col("rep_conv_id").alias("rep"), F.col("conv_id").alias("y"))
    return (
        a.join(b, "rep")
        .where(F.col("x") < F.col("y"))
        .select(F.col("x").alias("conv_a"), F.col("y").alias("conv_b"))
    )


@dataclass
class PairScore:
    recall: float
    precision: float
    n_expected: int
    n_got: int
    n_hit: int


def score_pairs(got: DataFrame, expected: DataFrame) -> PairScore:
    """Both inputs: (conv_a, conv_b) unordered pair sets.

    One Spark action: full outer join on the normalized pair keys, then a
    single aggregation counting got / expected / hit — instead of three
    separate count jobs (each of which would rescan and re-shuffle both
    inputs). Same shape as bench.py's one-action `_recall_counts`."""
    g = (
        got.select(
            F.least("conv_a", "conv_b").alias("conv_a"),
            F.greatest("conv_a", "conv_b").alias("conv_b"),
        )
        .distinct()
        .withColumn("_g", F.lit(1))
    )
    e = (
        expected.select(
            F.least("conv_a", "conv_b").alias("conv_a"),
            F.greatest("conv_a", "conv_b").alias("conv_b"),
        )
        .distinct()
        .withColumn("_e", F.lit(1))
    )
    row = (
        g.join(e, ["conv_a", "conv_b"], "full_outer")
        .agg(
            F.count("_g").alias("n_got"),
            F.count("_e").alias("n_exp"),
            F.count(F.when(F.col("_g").isNotNull() & F.col("_e").isNotNull(), 1)).alias(
                "n_hit"
            ),
        )
        .collect()[0]
    )
    n_got, n_exp, n_hit = row["n_got"], row["n_exp"], row["n_hit"]
    return PairScore(
        recall=n_hit / n_exp if n_exp else 1.0,
        precision=n_hit / n_got if n_got else 1.0,
        n_expected=n_exp,
        n_got=n_got,
        n_hit=n_hit,
    )


def score_vs_oracle(clusters: DataFrame, oracle_result) -> PairScore:
    """clusters: pipeline output (conv_id, rep_conv_id); oracle_result:
    oracle.DedupResult from the pure-Python reference scan."""
    spark = clusters.sparkSession
    exp_pairs = list(oracle_result.dup_pairs())
    expected = spark.createDataFrame(
        exp_pairs or [("", "")], "conv_a string, conv_b string"
    )
    if not exp_pairs:
        expected = expected.where(F.lit(False))
    return score_pairs(cluster_pairs(clusters), expected)
