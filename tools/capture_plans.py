"""Capture .explain('formatted') for declared queries into text files.

Usage: python tools/capture_plans.py <repo_dir> <out_dir> <suffix> [query ...]
e.g.   python tools/capture_plans.py /tmp/r5tree plans/r06 before hamming_pairs
Runs with the TARGET repo_dir first on sys.path so the captured plan is the
one that tree's library builds. Planning only — no job executes.
"""
from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path


def main() -> None:
    repo_dir, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    sys.path.insert(0, repo_dir)
    import __spark_entry__ as e
    from fastq_dupaway_spark.session import get_spark

    spark = get_spark(parallelism=8, app_name="plans", shuffle_partitions=8)
    qs = e.queries()
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for name in names or sorted(qs):
        df = qs[name](spark, "/root/testdata/sf0.001")
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
