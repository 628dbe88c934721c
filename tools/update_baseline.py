"""Fill BASELINE.md's scaling table + BENCH_SCALING.json from
.bench/scaling_results.jsonl (written by /tmp/run_scaling.sh or
tools/scaling_bench.py)."""

from __future__ import annotations

import json
import re

RESULTS = "/root/repo/.bench/scaling_results.jsonl"
LABELS = {
    "pagerank": "PageRank (6 iters)",
    "fiedler": "RSB Fiedler (10 Lanczos iters)",
    "cc": "Connected components",
    "triangles": "Triangle count",
}


def main():
    rows: dict[str, dict[str, dict]] = {}
    for line in open(RESULTS):
        line = line.strip()
        if not line.startswith("{"):
            continue
        r = json.loads(line)
        level = "N" if "[2," in r["master"] else "4N"
        rows.setdefault(r["kernel"], {})[level] = r

    out = []
    for kernel, label in LABELS.items():
        if kernel not in rows or {"N", "4N"} - set(rows[kernel]):
            continue
        small, large = rows[kernel]["N"], rows[kernel]["4N"]
        eff = round(large["edges_per_sec"] / (4 * small["edges_per_sec"]), 3)
        out.append(
            {
                "kernel": kernel,
                "edges": large["edges"],
                "N_master": small["master"],
                "N_wall_s": small["wall_s"],
                "N_edges_per_sec": small["edges_per_sec"],
                "x4N_master": large["master"],
                "x4N_wall_s": large["wall_s"],
                "x4N_edges_per_sec": large["edges_per_sec"],
                "scaling_efficiency": eff,
            }
        )
        # update the BASELINE.md table row
        md = open("/root/repo/BASELINE.md").read()
        pat = re.compile(rf"\| {re.escape(label)} \| 64M edges \|[^\n]*")
        newrow = (
            f"| {label} | 64M edges | {small['edges_per_sec']:,.0f} "
            f"({small['wall_s']:.0f}s) | {large['edges_per_sec']:,.0f} "
            f"({large['wall_s']:.0f}s) | **{eff}** |"
        )
        md = pat.sub(newrow.replace("\\", ""), md)
        open("/root/repo/BASELINE.md", "w").write(md)

    with open("/root/repo/BENCH_SCALING.json", "w") as f:
        json.dump(
            {
                "protocol": "local-cluster[2,4,6144] (N=2 executors) vs local-cluster[8,4,6144] (4N=8 executors), same 64M-edge input",
                "input": ".bench/powerlaw_4m_m16.parquet (synthgraph n=4M m=16 seed=42)",
                "results": out,
            },
            f,
            indent=2,
        )
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
