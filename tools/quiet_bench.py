#!/usr/bin/env python3
"""Quiet-run bench companion: run graft.Bench N times back-to-back on an
otherwise idle machine and record the per-query MEDIAN (matching the driver
harness's estimator — min flatters, see round-4 ADVICE) plus the run count.

Usage: python3 tools/quiet_bench.py <sfDir> <outJson> [runs=3]

Dev tool only — not part of the shipped library. Do NOT run concurrently
with any other Spark JVM (tests, Verify, review tooling): contention
inflates numbers 3x (documented in PROGRESS/memory).
"""
import json, statistics, subprocess, sys


def one_run(sf_dir: str) -> dict:
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        env={**__import__("os").environ,
             "SPARK_GRAFT_SF_DIR": sf_dir, "SPARK_GRAFT_CPUS": "32"},
        capture_output=True, text=True, timeout=1200)
    for line in out.stdout.splitlines():
        if '"metric"' in line:
            return json.loads(line[line.index('{'):])
    sys.exit(f"no bench JSON in output:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main(sf_dir: str, out_json: str, runs: int = 3) -> None:
    all_runs = [one_run(sf_dir) for _ in range(runs)]
    keys = all_runs[0]["queries"].keys()
    med = {k: statistics.median(r["queries"][k] for r in all_runs) for k in keys}
    # harness keys re-execute their constituent operators by design — keep
    # the two group totals separate so regressions stay attributable
    hk = set(all_runs[0].get("harness_keys", []))
    result = {
        "metric": "total_quiet",
        "value": sum(med.values()),
        "unit": "sec",
        "estimator": f"per-query median of {runs} runs",
        "runs": runs,
        "total_harness": sum(v for k, v in med.items() if k in hk),
        "total_operators": sum(v for k, v in med.items() if k not in hk),
        "harness_keys": sorted(hk),
        "queries": med,
        "sf": sf_dir,
    }
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1)
    print(f"{out_json}: total {result['value']:.1f}s over {len(med)} queries "
          f"({runs} runs; harness {result['total_harness']:.1f}s / "
          f"operators {result['total_operators']:.1f}s)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
