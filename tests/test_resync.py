"""Unordered-mode resync join + exact dedup vs the five adversarial
reference fixtures (F7) and the oracle."""

from __future__ import annotations

import pytest

from fastq_dupaway_spark import corpus, oracle
from fastq_dupaway_spark.detectors import exact
from fastq_dupaway_spark.resync import resync_streams, unmatched_counts


@pytest.mark.parametrize("variant", list(corpus.UNORDERED_FIXTURES))
def test_unordered_variants(spark, variant):
    df0, df1 = corpus.unordered_conv_df(spark, variant)
    synced = resync_streams(df0, df1)
    survivors = {
        r["conv_id"] for r in exact.exact_survivor_ids(synced).collect()
    }
    s0, s1 = corpus.UNORDERED_FIXTURES[variant]
    want = oracle.unordered_dedup(s0, s1)
    assert survivors == want.survivor_set, variant


def test_resync_drops_unmatched_rows_entirely(spark):
    df0, df1 = corpus.unordered_conv_df(spark, "not_overlapped")
    assert resync_streams(df0, df1).count() == 0


def test_unmatched_counts(spark):
    df0, df1 = corpus.unordered_conv_df(spark, "skewed")
    counts = {r["side"]: r["n"] for r in unmatched_counts(df0, df1).collect()}
    assert counts.get("left_only", 0) == 3  # ids 0001-0003 missing from r2
    assert counts.get("right_only", 0) == 0
