"""Scaling-efficiency evidence (BASELINE.json north_rule).

No multi-node cluster exists in this sandbox, so the agreed substitute is
the identical pipeline job on the identical input at two parallelism
levels: local[8] (N) vs local[32] (4N). Each run is a fresh subprocess
(fresh JVM) so JIT/warmup and shuffle-partition settings are independent.

Writes BENCH/BASELINE.md with throughput at both levels + efficiency
= (T_32 / T_8) / 4.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_CPUS": str(cpus),
            "SPARK_GRAFT_SF_DIR": sf_dir,
            "BENCH_SKIP_QUERIES": "1",
        }
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    r8 = run_level(8, sf_dir)
    r32 = run_level(32, sf_dir)
    t8 = r8["value"]
    t32 = r32["value"]
    eff = (t32 / t8) / 4.0
    md = f"""# BENCH/BASELINE.md — measured scaling evidence

Target (BASELINE.json): throughput scaling efficiency >= 0.8 from N to 4N
executors. Sandbox proxy: identical pipeline job, identical deterministic
input ({r8["pipeline"]["parsed_events"]} parsed events, seed 42), run in
fresh subprocesses at local[8] (N) and local[32] (4N).

| parallelism | wall s | parsed events | events/sec |
|---|---|---|---|
| local[8]  (N)  | {r8["pipeline"]["elapsed_s"]} | {r8["pipeline"]["parsed_events"]} | {t8} |
| local[32] (4N) | {r32["pipeline"]["elapsed_s"]} | {r32["pipeline"]["parsed_events"]} | {t32} |

**speedup 8→32 cores: {t32 / t8:.2f}x; scaling efficiency: {eff:.3f}**

Notes:
- the pipeline is the full spine: scan → mapInPandas record split → JVM
  extraction → broadcast enrich → sink route/explode → partitioned parquet
  write → stats aggregations (see bench.py:bench_pipeline).
- single-machine caveat: at local[32] the two parallelism levels share
  memory bandwidth and the page cache, so this UNDERSTATES multi-node
  scaling (a real 4N-executor cluster adds bandwidth with nodes); the map
  side is exchange-free so the only cross-task data movement is the stats
  groupBys.
- raw JSON: see BENCH/scaling_raw.json
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    with open(os.path.join(REPO, "BENCH", "scaling_raw.json"), "w") as f:
        json.dump({"local8": r8, "local32": r32, "efficiency": eff}, f, indent=2)
    print(md)


if __name__ == "__main__":
    main()
