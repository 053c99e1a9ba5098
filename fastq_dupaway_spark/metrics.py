"""Scoring: dup-pair recall / precision vs the reference-semantics oracle.

BASELINE.json's headline correctness metric: dup-pair recall >= 0.99 vs
reference clusters at identical config. The pair relation is
"same cluster" expanded to unordered conv_id pairs — recall is measured on
pairs so that over-merging shows up as precision loss, never recall gain
(SURVEY.md §7.3.1).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_pairs(clusters: DataFrame) -> DataFrame:
    """(conv_id, rep_conv_id) -> unordered same-cluster pairs (a < b).
    Pairs within a cluster of size m expand to m*(m-1)/2 rows via a
    self-join on rep — at production scale giant clusters should be
    sampled before expansion; parity scoring corpora keep clusters small.
    """
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
    """Both inputs: (conv_a, conv_b) unordered pair sets."""
    g = got.select(
        F.least("conv_a", "conv_b").alias("conv_a"),
        F.greatest("conv_a", "conv_b").alias("conv_b"),
    ).distinct()
    e = expected.select(
        F.least("conv_a", "conv_b").alias("conv_a"),
        F.greatest("conv_a", "conv_b").alias("conv_b"),
    ).distinct()
    n_got = g.count()
    n_exp = e.count()
    n_hit = g.join(e, ["conv_a", "conv_b"], "inner").count()
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
