"""At-scale shuffle elimination: several docstrings claim the conv_id
groupBy exchange disappears on a conv_id-bucketed table (the parquet
stand-in for Iceberg `bucket(N, conv_id)` partitioning). Prove it on the
plan, not by assertion-in-prose."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from fastq_dupaway_spark import corpus
from fastq_dupaway_spark.canonicalize import conversation_signatures


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_bucketed_table_eliminates_conv_exchange(spark, tmp_path):
    t = corpus.conv_df(spark, corpus.generate_corpus(seed=7, n_conv=60))
    (
        t.write.mode("overwrite")
        .bucketBy(4, "conv_id")
        .sortBy("conv_id", "turn_idx")
        .format("parquet")
        .option("path", str(tmp_path / "bucketed"))  # external table
        .saveAsTable("bucketed_transcripts")
    )
    try:
        bt = spark.table("bucketed_transcripts")

        plain_plan = _plan(conversation_signatures(t))
        bucketed_plan = _plan(conversation_signatures(bt))
        # unbucketed input shuffles on conv_id; the bucketed scan does not
        assert "Exchange hashpartitioning(conv_id" in plain_plan
        assert "Exchange hashpartitioning(conv_id" not in bucketed_plan

        # and results are identical
        a = {
            (r["conv_id"], r["conv_sig"], r["n_turns"])
            for r in conversation_signatures(t).collect()
        }
        b = {
            (r["conv_id"], r["conv_sig"], r["n_turns"])
            for r in conversation_signatures(bt).collect()
        }
        assert a == b

        # bucketed-to-bucketed co-located join: no exchange on either side
        sig = conversation_signatures(bt)
        j = bt.join(bt.select("conv_id").distinct(), "conv_id", "left_semi")
        jp = _plan(j)
        assert "Exchange hashpartitioning(conv_id" not in jp
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_transcripts")
