"""Local stand-in for the driver's correctness gate: run every
__spark_entry__ query AND its DuckDB oracle at a given sf dir, compare
row counts, column names, and order-insensitive values."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from fastq_dupaway_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return (
        df.sort_values(by=list(df.columns))
        .reset_index(drop=True)
    )


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None):
    spark = get_spark(parallelism=8, app_name="check-entry")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        if name not in osql:
            print(f"{name:28s} rows-only: {len(sdf)} rows  (no oracle)")
            continue
        odf = con.sql(osql[name]).df()
        ns, no = normalize(sdf), normalize(odf)
        status = "OK"
        if list(ns.columns) != list(no.columns):
            status = f"SCHEMA MISMATCH spark={list(ns.columns)} oracle={list(no.columns)}"
        elif len(ns) != len(no):
            status = f"ROWCOUNT MISMATCH spark={len(ns)} oracle={len(no)}"
        else:
            try:
                pd.testing.assert_frame_equal(
                    ns, no, check_dtype=False, check_exact=True
                )
            except AssertionError as e:
                status = "VALUE MISMATCH: " + str(e).split("\n")[0]
                diff = ns.compare(no) if ns.shape == no.shape else None
                if diff is not None and not diff.empty:
                    status += f" ({len(diff)} differing rows; first: {diff.head(3).to_dict()})"
        if status != "OK":
            failures += 1
        print(f"{name:28s} {len(sdf):6d} rows  {status}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01", only)
