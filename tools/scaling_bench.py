"""Scaling-efficiency evidence: run the identical bench job at two
parallelism levels (local[N] vs local[4N]) on the same input and report
throughput at both plus efficiency = (T_N / T_4N) / 4.

This is the in-sandbox stand-in for the north rule's N vs 4N *executor*
scaling (no real multi-node cluster here — BASELINE.md documents the
mapping). Each level runs in a fresh subprocess so JVM/thread-pool state
cannot leak between levels.

Usage: python tools/scaling_bench.py [N] [SF_DIR] [REPLICAS]
Writes/updates BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_once(cpus: int, sf_dir: str, replicas: int) -> dict:
    """One taskset-confined bench subprocess — plain local[N] would let
    GC/JIT/python workers spill onto the other idle cores, making the
    small-N leg unfairly fast and understating the true N->4N scaling of
    an N-machine-slice executor."""
    env = os.environ.copy()
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        BENCH_REPLICAS=str(replicas),
    )
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, str(REPO / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    reps = int(os.environ.get("SCALING_REPS", "3"))

    # INTERLEAVED best-of-reps: this shared-host VM's 2-4x noise arrives
    # in multi-minute windows (a whole leg run inside one is uniformly
    # slow), so alternating low/high legs exposes both levels to similar
    # conditions and the per-level minimum dodges the bad windows.
    low = high = None
    rep_rows = []  # per-rep SAME-WINDOW pairs (verdict r3: report both)
    for i in range(reps):
        r_low = run_once(n, sf_dir, replicas)
        r_high = run_once(4 * n, sf_dir, replicas)
        rep_eff = round((r_low["value"] / r_high["value"]) / 4, 3)
        rep_rows.append(
            {
                "rep": i,
                "t_n_sec": r_low["value"],
                "t_4n_sec": r_high["value"],
                "efficiency": rep_eff,
                # per-leg noise legibility (bench.py probe brackets)
                "noise_ratio_n": r_low.get("probe_noise_ratio"),
                "noise_ratio_4n": r_high.get("probe_noise_ratio"),
                "noise_suspected": bool(
                    r_low.get("noise_window_suspected")
                    or r_high.get("noise_window_suspected")
                ),
            }
        )
        print(
            f"# rep {i}: T_{n}={r_low['value']}s T_{4 * n}={r_high['value']}s "
            f"same-window eff={rep_eff}",
            file=sys.stderr,
            flush=True,
        )
        if low is None or r_low["value"] < low["value"]:
            low = r_low
        if high is None or r_high["value"] < high["value"]:
            high = r_high
    t_low, t_high = low["value"], high["value"]
    efficiency = round((t_low / t_high) / 4, 3)
    best_same_window = max(r["efficiency"] for r in rep_rows)
    # The criterion-proper number: both legs from ONE uninterrupted
    # interleaved rep (same time window), neither leg probe-flagged.
    # The per-level-minimum composite above can pair legs from different
    # windows — exactly the compositing the round-4 verdict rejected.
    clean = [r for r in rep_rows if not r["noise_suspected"]]
    best_clean_same_window = max((r["efficiency"] for r in clean), default=None)
    result = {
        "metric": "scaling_efficiency_n_to_4n",
        "value": efficiency,
        "unit": "ratio",
        "n": n,
        "t_n_sec": t_low,
        "t_4n_sec": t_high,
        "best_same_window_efficiency": best_same_window,
        "best_clean_same_window_efficiency": best_clean_same_window,
        "reps": rep_rows,
        "throughput_n_turns_per_sec": low["turns_per_sec"],
        "throughput_4n_turns_per_sec": high["turns_per_sec"],
        "turns": low["turns"],
        "sf_dir": sf_dir,
        "replicas": replicas,
        "recall_planted": high.get("recall_planted"),
        "recall_vs_reference": high.get("recall_vs_reference"),
        "recall_semantic": high.get("recall_semantic"),
        "cc_rounds": high.get("cc_rounds"),
        "commit": subprocess.run(
            ["git", "-C", str(REPO), "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
        ).stdout.strip(),
        "queries_n": low["queries"],
        "queries_4n": high["queries"],
        "probes_n": low.get("probes"),
        "probes_4n": high.get("probes"),
    }
    print(json.dumps(result))

    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    # Always persist the full campaign record — a campaign is ~hours of
    # measurement and must never live only on stdout (one already did).
    (bench_dir / "scaling_last_campaign.json").write_text(
        json.dumps(result, indent=1) + "\n"
    )
    md = bench_dir / "BASELINE.md"
    # Preserve the hand-written narrative across overwrites: everything
    # from the first "## Evidence narrative" heading onward is carried
    # over verbatim (it documents protocol + history, not this run).
    narrative = ""
    if md.exists():
        prior = md.read_text()
        idx = prior.find("## Evidence narrative")
        if idx != -1:
            narrative = "\n" + prior[idx:]
    bcsw = best_clean_same_window
    lines = [
        "# BENCH/BASELINE — measured throughput + scaling efficiency",
        "",
        "Scaling criterion (BASELINE.json: efficiency >= 0.8 from N to 4N",
        "executors) evidenced in-sandbox by the same job at two local[N]",
        "parallelism levels on identical input (no real cluster available;",
        "per BASELINE.md this is the driver-mandated stand-in).",
        "",
        f"- measured at commit `{result['commit']}`",
        f"- input: transcripts derived from `{sf_dir}` documents, x{replicas}",
        f"  replicas = {low['turns']} turns / {low['convs']} conversations",
        f"- suite: {', '.join(low['queries'])}",
        "",
        "**Criterion measurement — best noise-clean SAME-WINDOW rep pair**",
        "(both legs from one uninterrupted interleaved rep, neither leg",
        "probe-flagged; see noise protocol below): "
        + (
            f"**{bcsw}**"
            + ("  (target >= 0.8: MET)" if bcsw >= 0.8 else "  (target >= 0.8: NOT met)")
            if bcsw is not None
            else "**n/a — every rep probe-flagged; re-run in a clean window**"
        ),
        "",
        "| rep | T_N (s) | T_4N (s) | same-window efficiency | probe ratios N/4N | noise flagged |",
        "|---|---|---|---|---|---|",
        *[
            f"| {r['rep']} | {r['t_n_sec']} | {r['t_4n_sec']} | {r['efficiency']} "
            f"| {r['noise_ratio_n']} / {r['noise_ratio_4n']} | {r['noise_suspected']} |"
            for r in rep_rows
        ],
        "",
        "Per-level minima (legs may come from DIFFERENT reps/windows —",
        "reference only, not criterion evidence):",
        "",
        "| parallelism | suite wall (s) | turns/sec |",
        "|---|---|---|",
        f"| local[{n}] | {t_low} | {low['turns_per_sec']} |",
        f"| local[{4 * n}] | {t_high} | {high['turns_per_sec']} |",
        "",
        f"Cross-window composite (T_N_min / T_4N_min) / 4 = {efficiency}",
        "",
        f"**Dup-pair recall at bench scale** (BASELINE.json headline, target >= 0.99):",
        f"- vs planted derivation relations: {high.get('recall_planted')}",
        f"- vs reference (parity-loose run) clusters: {high.get('recall_vs_reference')}",
        f"- semantic detector vs planted embedding near-pairs: {high.get('recall_semantic')}",
        f"- connected-components rounds: {high.get('cc_rounds')}",
        "",
        "Per-query seconds:",
        "",
        "| query | local[%d] | local[%d] |" % (n, 4 * n),
        "|---|---|---|",
    ]
    for q in low["queries"]:
        lines.append(f"| {q} | {low['queries'][q]} | {high['queries'][q]} |")
    md.write_text("\n".join(lines) + "\n" + narrative)


if __name__ == "__main__":
    main()
