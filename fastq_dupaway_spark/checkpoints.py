"""Stage checkpoint store with manifests, per-partition lineage + metrics.

North-rule requirement: every pipeline stage (signatures, bands, candidate
pairs, components) is checkpointed with per-partition lineage and metrics
so a killed run resumes from the last completed stage.

Storage shim: the design target is an Iceberg table per stage
(`catalog.checkpoints.<run>_<stage>`, snapshot id recorded in the
manifest). This sandbox has no Iceberg runtime jar offline, so the shim
writes the identical layout to parquet-on-dir plus a JSON manifest; the
`CheckpointStore` interface is the only seam — swapping `_write_table` /
`_read_table` for `df.writeTo(...).createOrReplace()` / `spark.read.table`
turns it into the Iceberg path with no caller changes (SURVEY.md §7.3.5).

Reference analog: the temp-dir lifecycle + sorted intermediate files
(/root/reference/src/file_utils.cpp:116-130) — but durable and resumable
instead of ephemeral, because at 10^12 turns re-running a lost stage costs
hours.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


def config_hash(params: dict[str, Any]) -> str:
    """Stable digest of a stage's config — the resume key."""
    blob = json.dumps(params, sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


@dataclass
class StageResult:
    df: DataFrame
    stage: str
    resumed: bool
    rows: int
    metrics: dict[str, Any] = field(default_factory=dict)


class CheckpointStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        if self._local_root():
            os.makedirs(root, exist_ok=True)

    def _local_root(self) -> bool:
        """True when `root` is a plain local path. The parquet SHIM's
        driver-side metadata reads (_snapshot_id file-listing digest,
        _lineage parquet footers, manifest JSON files) assume a local
        filesystem; with a URI-schemed root (hdfs://, s3a://, ...) those
        return None and materialize falls back to its one-agg-pass
        lineage with snapshot_id null — resume still works off the
        manifest, but snapshot pinning needs the Iceberg override
        (IcebergCheckpointStore), whose snapshot ids come from the
        catalog, not the filesystem."""
        return "://" not in self.root

    # -- storage seam (parquet shim; Iceberg drop-in point) --------------
    def _data_path(self, stage: str) -> str:
        return os.path.join(self.root, stage, "data")

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.root, stage, "_MANIFEST.json")

    def _write_table(self, df: DataFrame, stage: str) -> None:
        df.write.mode("overwrite").parquet(self._data_path(stage))

    def _read_table(self, stage: str) -> DataFrame:
        # _schema_hint is set by materialize right after the write (the
        # just-written schema is known): skipping parquet schema inference
        # saves a 1-task metadata job per stage. Resume reads infer.
        hint = getattr(self, "_schema_hint", None)
        reader = self.spark.read.schema(hint) if hint else self.spark.read
        return reader.parquet(self._data_path(stage))

    def _snapshot_id(self, stage: str) -> str | None:
        """Storage seam: identifier pinning the exact table VERSION the
        manifest describes — Iceberg override returns the committed
        snapshot id (currentSnapshot().snapshotId()); the parquet shim
        digests the written file listing (name:size), which changes on
        every overwrite. Recorded in the manifest so a resume provably
        reads the same table version the completed stage wrote, and so
        the Iceberg swap's time-travel bookkeeping is already plumbed.
        Local-FS only (see _local_root): None on URI-schemed roots."""
        import glob
        import hashlib

        if not self._local_root():
            return None
        files = sorted(
            glob.glob(os.path.join(self._data_path(stage), "*.parquet"))
        )
        if not files:
            return None
        h = hashlib.sha256()
        for f in files:
            h.update(f"{os.path.basename(f)}:{os.path.getsize(f)};".encode())
        return h.hexdigest()[:16]

    def _lineage(self, stage: str) -> list[dict] | None:
        """Per-partition lineage rows for a just-written stage, METADATA-
        ONLY: parquet footer row counts read driver-side — no second Spark
        job over the data (round-2 ran a groupBy(spark_partition_id)
        re-scan here, doubling checkpoint read I/O per stage; at 100 TB
        that is hours of wasted scan for a metrics row). Part of the
        storage seam: an Iceberg override reads the same numbers from the
        snapshot's manifest files. Returns None if footers are not
        available (e.g. a subclass storage without local files), in which
        case materialize falls back to one aggregation pass.
        Local-FS only (see _local_root): None on URI-schemed roots."""
        import glob

        import pyarrow.parquet as pq

        if not self._local_root():
            return None
        files = sorted(glob.glob(os.path.join(self._data_path(stage), "*.parquet")))
        if not files:
            return None
        return [
            {
                "partition_id": i,
                "rows": pq.ParquetFile(f).metadata.num_rows,
                "file": os.path.basename(f),
            }
            for i, f in enumerate(files)
        ]

    # -- public API -------------------------------------------------------
    def manifest(self, stage: str) -> dict | None:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def complete(self, stage: str, chash: str) -> bool:
        m = self.manifest(stage)
        return bool(m and m.get("config_hash") == chash and m.get("complete"))

    def materialize(
        self,
        stage: str,
        df_fn,
        params: dict[str, Any],
        extra_metrics: dict[str, Any] | None = None,
        observe: dict[str, Column] | None = None,
    ) -> StageResult:
        """Run-or-resume: if a completed checkpoint with the same config
        hash exists, read it; else compute df_fn(), write data + manifest
        (row count, per-partition lineage rows, wall time), return the
        re-read DataFrame so downstream lineage starts at the checkpoint.

        observe: named aggregate Columns recorded into the manifest's
        metrics via df.observe riding the WRITE job — the reference's
        --verbose counters (/root/reference/src/hash_dup_remover.hpp:
        342-346) with zero extra passes over the data.
        """
        chash = config_hash(params)
        if self.complete(stage, chash):
            df = self._read_table(stage)
            m = self.manifest(stage)
            return StageResult(df, stage, True, m["rows"], m.get("metrics", {}))

        t0 = time.monotonic()
        df = df_fn()
        observed: dict[str, Any] = {}
        if observe:
            obs = Observation(f"ckpt_{stage}_{chash}")
            df = df.observe(obs, *[c.alias(k) for k, c in observe.items()])
        self._write_table(df, stage)
        if observe:
            observed = {k: v for k, v in obs.get.items()}
        self._schema_hint = df.schema
        try:
            out = self._read_table(stage)
        finally:
            self._schema_hint = None
        # ONE Spark job per materialize: the write IS the only pass
        # (observed counters ride it); lineage comes from storage metadata
        per_part = self._lineage(stage)
        if per_part is None:  # storage without footer metadata: one agg pass
            per_part = [
                {"partition_id": r["pid"], "rows": r["n"]}
                for r in out.groupBy(F.spark_partition_id().alias("pid"))
                .agg(F.count("*").alias("n"))
                .collect()
            ]
        rows = sum(p["rows"] for p in per_part)
        metrics = {
            "wall_sec": round(time.monotonic() - t0, 3),
            "partitions": per_part,
            **observed,
            **(extra_metrics or {}),
        }
        man = {
            "stage": stage,
            "config_hash": chash,
            "params": {k: str(v) for k, v in params.items()},
            "rows": rows,
            "complete": True,
            "created_unix": time.time(),
            "snapshot_id": self._snapshot_id(stage),
            "metrics": metrics,
        }
        tmp = self._manifest_path(stage) + ".tmp"
        os.makedirs(os.path.dirname(tmp), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1)
        os.replace(tmp, self._manifest_path(stage))  # atomic completion mark
        return StageResult(out, stage, False, rows, metrics)

    def invalidate(self, stage: str) -> None:
        path = os.path.join(self.root, stage)
        if os.path.exists(path):
            shutil.rmtree(path)

    def report(self) -> list[dict]:
        out = []
        for stage in sorted(os.listdir(self.root)):
            m = self.manifest(stage)
            if m:
                out.append(
                    {
                        "stage": stage,
                        "rows": m["rows"],
                        "wall_sec": m["metrics"].get("wall_sec"),
                        "n_partitions": len(m["metrics"].get("partitions", [])),
                    }
                )
        return out


class IcebergCheckpointStore(CheckpointStore):
    """Iceberg-backed override of the storage seam (SURVEY.md §7.3.5).

    Exactly four methods differ from the parquet shim — the swap the
    design promised is mechanical. Stage tables live at
    `<catalog>.<namespace>.<run>_<stage>`; JSON manifests stay on `root`
    (any POSIX/shared path — they are driver-side bookkeeping, tiny).

    To activate on a real cluster (requires the PUBLIC Iceberg Spark
    runtime jar, coordinates per iceberg.apache.org — this sandbox has no
    jar, which test_iceberg_contract works around by intercepting the
    writeTo/read.table/sql calls and asserting the exact identifiers):

      spark-submit \\
        --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \\
        --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.\\
IcebergSparkSessionExtensions \\
        --conf spark.sql.catalog.ckpt=org.apache.iceberg.spark.SparkCatalog \\
        --conf spark.sql.catalog.ckpt.type=hadoop \\
        --conf spark.sql.catalog.ckpt.warehouse=hdfs://.../warehouse \\
        ... jobs/run_dedup.py --checkpoint-iceberg ckpt.dedup.run1 ...

    Snapshot ids come from the table's `.snapshots` metadata view (the
    committed snapshot — real time travel via `VERSION AS OF <id>`);
    per-partition lineage from the `.files` metadata view (record_count
    per data file) — both metadata-only, no data pass, mirroring the
    parquet shim's footer reads.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        catalog: str = "ckpt",
        namespace: str = "checkpoints",
        run: str = "run",
    ):
        super().__init__(spark, root)
        self.catalog, self.namespace, self.run = catalog, namespace, run

    def table_name(self, stage: str) -> str:
        return f"{self.catalog}.{self.namespace}.{self.run}_{stage}"

    def _write_table(self, df: DataFrame, stage: str) -> None:
        df.writeTo(self.table_name(stage)).using("iceberg").createOrReplace()

    def _read_table(self, stage: str) -> DataFrame:
        return self.spark.read.table(self.table_name(stage))

    def _snapshot_id(self, stage: str) -> str | None:
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {self.table_name(stage)}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).first()
        return str(row["snapshot_id"]) if row else None

    def _lineage(self, stage: str) -> list[dict] | None:
        rows = self.spark.sql(
            f"SELECT file_path, record_count FROM {self.table_name(stage)}.files "
            "ORDER BY file_path"
        ).collect()
        if not rows:
            return None
        return [
            {
                "partition_id": i,
                "rows": r["record_count"],
                "file": r["file_path"].rsplit("/", 1)[-1],
            }
            for i, r in enumerate(rows)
        ]

    def read_snapshot(self, stage: str, snapshot_id: str) -> DataFrame:
        """Time travel: the stage table exactly as the manifest pinned it."""
        return (
            self.spark.read.option("snapshot-id", snapshot_id)
            .table(self.table_name(stage))
        )


