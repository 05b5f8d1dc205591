"""Scaling-efficiency evidence for the north rule (N vs 4N parallelism).

No multi-executor cluster exists in this sandbox, so per the driver's
instruction the same job runs at two local parallelism levels in fresh JVMs
(``local[N]`` vs ``local[4N]``) on identical input, and we report throughput
at both plus scaling efficiency::

    efficiency = (T_N / T_4N) / 4

Usage: python scripts/scaling_bench.py [N] [sf_dir]
Writes a markdown row set to stdout and the raw JSON to
``BENCH_SCALING.json`` at the repo root.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
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
    lo = run(n, sf_dir)
    hi = run(4 * n, sf_dir)

    report = {"N": n, "sf_dir": sf_dir, "low": lo, "high": hi, "per_query": {}}
    for q in lo["queries"]:
        t_lo, t_hi = lo["queries"][q], hi["queries"][q]
        report["per_query"][q] = {
            "t_N": t_lo,
            "t_4N": t_hi,
            "speedup": round(t_lo / t_hi, 3),
            "efficiency": round(t_lo / t_hi / 4, 3),
        }
    # headline: pagerank throughput scaling
    eff = report["per_query"]["pages_pagerank"]["efficiency"]
    report["pagerank_scaling_efficiency"] = eff
    report["pagerank_edges_per_sec_per_iter"] = {
        f"local[{n}]": lo["pagerank_edges_per_sec_per_iter"],
        f"local[{4 * n}]": hi["pagerank_edges_per_sec_per_iter"],
    }

    with open(os.path.join(ROOT, "BENCH_SCALING.json"), "w") as f:
        json.dump(report, f, indent=1)

    print(f"| query | local[{n}] sec | local[{4 * n}] sec | speedup | efficiency |")
    print("|---|---|---|---|---|")
    for q, r in report["per_query"].items():
        print(f"| {q} | {r['t_N']} | {r['t_4N']} | {r['speedup']}x | {r['efficiency']} |")
    print(f"\npagerank scaling efficiency: {eff}")


if __name__ == "__main__":
    main()
