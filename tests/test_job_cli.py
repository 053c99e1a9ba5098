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


import run_curation  # noqa: E402


def test_curation_cli_guards():
    with pytest.raises(SystemExit):
        run_curation.parse_args(
            ["--input", "x", "--output", "o", "--detectors", "nope"]
        )
    with pytest.raises(SystemExit):
        run_curation.parse_args(
            ["--input", "x", "--output", "o", "--min-quality", "20000"]
        )
    with pytest.raises(SystemExit):
        run_curation.parse_args(
            ["--input", "x", "--output", "o",
             "--min-tokens", "10", "--max-tokens", "5"]
        )
    args = run_curation.parse_args(["--input", "x", "--output", "o"])
    assert args.detectors == "exact" and args.min_quality == 0


def test_curation_end_to_end(spark, tmp_path, capsys):
    """Filters + dedup + exact accounting: every input conversation lands
    in exactly one bucket (kept-survivor / kept-dup / rejected_<reason> /
    quarantined), the rejected audit table carries reasons, and survivors
    exclude both rejected and duplicate conversations."""
    from pyspark.sql import functions as F

    convs = corpus.generate_corpus(seed=13, n_conv=60, dup_rate=0.5)
    df = corpus.conv_df(spark, convs)
    # plant: 3 too-short conversations and 2 French ones
    extra = spark.createDataFrame(
        [(f"short{i:02d}", 0, "user", "tiny text", None) for i in range(3)]
        + [(f"fr{i:02d}", 0, "user",
            "le chat et la souris dans le jardin aujourd'hui encore",
            None) for i in range(2)],
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.current_timestamp())
    df = df.unionByName(extra.select(*df.columns))
    src = tmp_path / "in"
    df.write.parquet(str(src))
    out = tmp_path / "out"
    run_curation.main(
        [
            "--input", str(src),
            "--output", str(out),
            "--min-tokens", "5",
            "--langs", "en",
            "--detectors", "exact",
            "--cpus", "4",
        ]
    )
    line = capsys.readouterr().out.strip().splitlines()[-1]
    stats = dict(kv.split("=") for kv in line.split())
    assert int(stats["rejected_too_short"]) == 3
    assert int(stats["rejected_lang"]) == 2
    n_in = df.select("conv_id").distinct().count()
    assert int(stats["tot_convs"]) == n_in
    assert int(stats["kept"]) == n_in - 5
    assert (
        int(stats["dedup_survivors"]) + int(stats["dup_convs"])
        == int(stats["kept"]) - int(stats["quarantined_convs"])
    )
    rejected = spark.read.parquet(str(out / "rejected"))
    assert rejected.count() == 5
    surv = spark.read.parquet(str(out / "survivors"))
    surv_ids = {r["conv_id"] for r in surv.select("conv_id").distinct().collect()}
    assert int(stats["dedup_survivors"]) == len(surv_ids)
    assert not any(s.startswith(("short", "fr")) for s in surv_ids)


def test_winnow_knobs_thread_through(spark, tmp_path, capsys):
    """--winnow-min-shared / --winnow-max-df reach DedupConfig: an
    unsatisfiable min_shared turns the winnow detector into a no-op
    (all singletons), proving the knob is not silently dropped."""
    args = run_dedup.parse_args(
        ["--input", "x", "--output", "o", "--detectors", "winnow",
         "--winnow-min-shared", "12", "--winnow-max-df", "100"]
    )
    assert (args.winnow_min_shared, args.winnow_max_df) == (12, 100)
    cargs = run_curation.parse_args(
        ["--input", "x", "--output", "o", "--winnow-min-shared", "7"]
    )
    assert cargs.winnow_min_shared == 7
    convs = corpus.generate_corpus(seed=13, n_conv=40, dup_rate=0.5)
    src = tmp_path / "in2"
    corpus.conv_df(spark, convs).write.parquet(str(src))
    run_dedup.main(
        [
            "--input", str(src),
            "--output", str(tmp_path / "out2"),
            "--detectors", "winnow",
            "--winnow-min-shared", "1000000",
            "--cpus", "4",
        ]
    )
    out = capsys.readouterr().out
    assert "dup_convs=0" in out  # nothing can share 10^6 fingerprints
