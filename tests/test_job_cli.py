"""spark-submit job entrypoint: CLI guards + end-to-end run."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "jobs"))

import run_dedup  # noqa: E402

from fastq_dupaway_spark import corpus  # noqa: E402


def test_cli_guards():
    with pytest.raises(SystemExit):
        run_dedup.parse_args(
            ["--input", "x", "--output", "o", "--parity", "loose",
             "--detectors", "minhash"]
        )
    with pytest.raises(SystemExit):
        run_dedup.parse_args(["--input", "x", "--input2", "x", "--output", "o"])
    args = run_dedup.parse_args(["--input", "x", "--output", "o"])
    assert args.detectors == "exact"


def test_job_end_to_end(spark, tmp_path, capsys):
    convs = corpus.generate_corpus(seed=13, n_conv=50, dup_rate=0.5)
    src = tmp_path / "in"
    corpus.conv_df(spark, convs).write.parquet(str(src))
    out = tmp_path / "out"
    run_dedup.main(
        [
            "--input", str(src),
            "--output", str(out),
            "--detectors", "exact,hamming",
            "--write-clusters",
            "--checkpoint", str(tmp_path / "ck"),
            "--cpus", "4",
        ]
    )
    captured = capsys.readouterr().out
    assert "tot_convs=" in captured and "survivors=" in captured
    surv = spark.read.parquet(str(out / "survivors"))
    cl = spark.read.parquet(str(out / "clusters"))
    assert surv.count() > 0
    assert cl.count() == len(convs)
