"""Two-cluster-size scaling protocol (BASELINE.md): run bench.py at N and
4N cores (local[8] vs local[32] standing in for N vs 4N executors, per the
sandbox substitute protocol), compute scaling efficiency, write
BENCH/BASELINE.md.

Usage: python tools/scaling_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CORPUS=os.environ.get("SPARK_GRAFT_CORPUS", "synthetic:50000"),
               PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_small, n_big = 8, 32
    t0 = time.time()
    small = run_bench(n_small, sf_dir)
    big = run_bench(n_big, sf_dir)
    tput_s = small["index_files_per_sec"]
    tput_b = big["index_files_per_sec"]
    eff = tput_b / (4.0 * tput_s)
    report = {
        "sf": sf_dir,
        "cores_small": n_small,
        "cores_big": n_big,
        "throughput_small_files_per_sec": tput_s,
        "throughput_big_files_per_sec": tput_b,
        "scaling_efficiency": round(eff, 3),
        "wand_p50_small_sec": small["wand_p50_sec"],
        "wand_p50_big_sec": big["wand_p50_sec"],
        "bench_small": small,
        "bench_big": big,
        "wall_sec": round(time.time() - t0, 1),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(report, f, indent=1)
    md = f"""# BENCH/BASELINE — two-parallelism scaling run

Protocol (BASELINE.md): same job, same input ({sf_dir}), two local
parallelism levels standing in for N vs 4N executor clusters.

| metric | local[{n_small}] (N) | local[{n_big}] (4N) |
|---|---|---|
| index-build throughput (files/sec) | {tput_s} | {tput_b} |
| BM25 WAND top-10 p50, 10-query batch (sec) | {small['wand_p50_sec']} | {big['wand_p50_sec']} |
| index build wall (sec) | {small['queries']['index_build']} | {big['queries']['index_build']} |

**Scaling efficiency** = throughput_4N / (4 x throughput_N) =
**{eff:.3f}** (target >= 0.8 per BASELINE.json north_rule).

Note: local-mode "scaling" shares one JVM, one driver, and Spark-session
fixed costs (~constant seconds) that a real multi-executor cluster
amortizes differently; per-stage shuffle parallelism is set to the core
count in both runs. Raw JSON: BENCH/scaling.json.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
