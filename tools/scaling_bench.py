"""Two-parallelism scaling evidence (BASELINE.md protocol).

No multi-node cluster exists in this sandbox, so the north rule's
N→4N-executor criterion is evidenced by running the SAME job on the
SAME input at local[8] and local[32] and reporting throughput at both
plus efficiency = (edges/sec @32) / (4 × edges/sec @8), target ≥ 0.8.

Each measurement runs in a fresh subprocess (one JVM per parallelism
level — no warm-cache contamination between levels).

Usage: python tools/scaling_bench.py [--sf-dir DIR] [--out BENCH_SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import os

WORKER_PATH = "/root/repo/tools/scaling_worker.py"


def run_one(master: str, sf_dir: str, kernel: str) -> dict:
    out = subprocess.run(
        [sys.executable, WORKER_PATH, master, sf_dir, kernel],
        capture_output=True, text=True, timeout=3600,
        env={**os.environ, "SPARK_GRAFT_DRIVER_MEM": "40g"},
    )
    if out.returncode != 0:
        raise RuntimeError(f"{kernel}@{master} failed:\n{out.stderr[-2000:]}")
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="BENCH_SCALING.json")
    ap.add_argument("--kernels", nargs="*", default=["pagerank", "cc", "fiedler", "triangles"])
    args = ap.parse_args()

    results = []
    for kernel in args.kernels:
        small = run_one("local[8]", args.sf_dir, kernel)
        large = run_one("local[32]", args.sf_dir, kernel)
        eff = round(large["edges_per_sec"] / (4 * small["edges_per_sec"]), 3)
        row = {
            "kernel": kernel,
            "edges": large["edges"],
            "local8_wall_s": small["wall_s"],
            "local8_edges_per_sec": small["edges_per_sec"],
            "local32_wall_s": large["wall_s"],
            "local32_edges_per_sec": large["edges_per_sec"],
            "scaling_efficiency": eff,
        }
        print(json.dumps(row), flush=True)
        results.append(row)
    with open(args.out, "w") as f:
        json.dump({"sf_dir": args.sf_dir, "protocol": "local[8] vs local[32], same input",
                   "results": results}, f, indent=2)


if __name__ == "__main__":
    main()
