#!/usr/bin/env python3
"""Quiet-run bench companion — CHUNKED fresh-JVM edition (round 11).

The round-10 judging showed a monolithic all-keys run inflates keys that
execute late in the fixed order through in-run JVM/cache contention
(e_kmeans_train read 3.39 s in-run vs 2.06 s isolated, code unchanged).
Keys therefore now run in chunks of CHUNK (default 20, global alphabetical
order preserved within and across chunks so per-key predecessors stay
stable across rounds), each chunk in a FRESH sbt/Spark JVM, repeated
`runs` times; the recorded value is the per-key MEDIAN across runs (each
run itself the median of graft.Bench's 3 in-JVM passes). `run_position`
records every key's (chunk, index) so any residual order effect is
auditable from the artifact.

Usage: python3 tools/quiet_bench.py <sfDir> <outJson> [runs=3] [chunk=20]

Dev tool only — not part of the shipped library. Do NOT run concurrently
with any other Spark JVM (tests, Verify, review tooling): contention
inflates numbers 3x (documented in memory). See tools/BENCH_PROTOCOL.md
for the per-round measurement protocol.
"""
import json
import os
import statistics
import subprocess
import sys


def sbt_bench(env_extra: dict) -> dict:
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        env={**os.environ, **env_extra},
        capture_output=True, text=True, timeout=2400)
    for line in out.stdout.splitlines():
        if '"metric"' in line:
            return json.loads(line[line.index('{'):])
    sys.exit(f"no bench JSON in output:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main(sf_dir: str, out_json: str, runs: int = 3, chunk: int = 20) -> None:
    listing = sbt_bench({"SPARK_GRAFT_LIST": "1"})
    keys = sorted(listing["keys"])
    hk = set(listing["harness_keys"])
    chunks = [keys[i:i + chunk] for i in range(0, len(keys), chunk)]
    med: dict = {}
    pos: dict = {}
    for ci, ck in enumerate(chunks):
        env = {"SPARK_GRAFT_SF_DIR": sf_dir, "SPARK_GRAFT_CPUS": "32",
               "SPARK_GRAFT_KEYS": ",".join(ck)}
        samples = [sbt_bench(env)["queries"] for _ in range(runs)]
        for j, k in enumerate(ck):
            med[k] = statistics.median(s[k] for s in samples)
            pos[k] = {"chunk": ci, "index": j}
        done = sum(len(c) for c in chunks[:ci + 1])
        print(f"chunk {ci + 1}/{len(chunks)}: {done}/{len(keys)} keys, "
              f"chunk total {sum(med[k] for k in ck):.1f}s", flush=True)
    result = {
        "metric": "total_quiet",
        "value": sum(med.values()),
        "unit": "sec",
        "estimator": f"per-key median of {runs} fresh-JVM chunk runs "
                     f"(chunk={chunk}; each run medians 3 in-JVM passes)",
        "runs": runs,
        "chunk_size": chunk,
        # harness keys re-execute their constituent operators by design —
        # keep the two group totals separate so regressions stay attributable
        "total_harness": sum(v for k, v in med.items() if k in hk),
        "total_operators": sum(v for k, v in med.items() if k not in hk),
        "harness_keys": sorted(hk),
        "queries": med,
        "run_position": pos,
        "sf": sf_dir,
    }
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1)
    print(f"{out_json}: total {result['value']:.1f}s over {len(med)} queries "
          f"({runs} runs x {len(chunks)} chunks; harness "
          f"{result['total_harness']:.1f}s / operators "
          f"{result['total_operators']:.1f}s)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 3,
         int(sys.argv[4]) if len(sys.argv) > 4 else 20)
