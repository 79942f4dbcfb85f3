"""Two-parallelism-level scaling evidence (BASELINE.json: "run at two
cluster sizes (N and 4N executors) with throughput scaling efficiency >=0.8").

This sandbox has no real cluster, so per the driver instruction the same job
runs at local[N] and local[4N] in fresh JVMs. The host is a shared VM with
visible steal time (up to ~25% in top), so each level runs `trials` times and
the MIN wall time per stage is used — min is the least-interfered sample.

Writes BENCH/BASELINE.md. Usage:
    python scripts/bench_scaling.py [N=4] [replicas=100] [trials=2]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_level(cores: int, replicas: int, trials: int, sf_dir: str) -> dict:
    """Pin the whole process tree to exactly `cores` CPUs (taskset): a
    local[N] session still spawns GC/Arrow/python-worker threads that would
    otherwise spill onto idle cores, silently inflating the low level's
    throughput. An N-core cluster executor has N cores TOTAL — so must the
    proxy."""
    best: dict | None = None
    for _ in range(trials):
        cmd = [
            "taskset",
            "-c",
            f"0-{cores - 1}",
            sys.executable,
            os.path.join(HERE, "_scaling_job.py"),
            str(cores),
            str(replicas),
            sf_dir,
        ]
        out = subprocess.run(
            cmd,
            capture_output=True,
            text=True,
            check=True,
            cwd=REPO,
        )
        line = [line for line in out.stdout.splitlines() if line.startswith("{")][-1]
        res = json.loads(line)
        if best is None:
            best = res
        else:
            for k in ("frontier_sec", "extract_sec"):
                if res[k] < best[k]:
                    best[k] = res[k]
            best["frontier_urls_per_sec"] = round(
                (best["pages"] + best["candidates"]) / best["frontier_sec"], 1
            )
            best["pages_extracted_per_sec"] = round(best["pages"] / best["extract_sec"], 1)
    assert best is not None
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    lo = run_level(n, replicas, trials, sf_dir)
    hi = run_level(n * 4, replicas, trials, sf_dir)

    def eff(key: str) -> float:
        return round(lo[key] / hi[key] / 4.0, 3)

    combined_lo = lo["frontier_sec"] + lo["extract_sec"]
    combined_hi = hi["frontier_sec"] + hi["extract_sec"]
    combined_eff = round(combined_lo / combined_hi / 4.0, 3)

    md = f"""# BENCH/BASELINE — measured throughput + scaling evidence

Input: corpus derived from `{sf_dir}/documents.parquet`, replicated x{replicas}
({lo['pages']:,} pages, {lo['candidates']:,} candidate links). Same job, two
parallelism levels (driver note: sandbox proxy for N vs 4N executors), fresh
JVM per level, min of {trials} trials per level (shared VM: top shows up to
~25% steal time, min is the least-interfered sample).

Methodology: each level is pinned to exactly its core budget with
`taskset -c 0-(N-1)` — a local[N] session otherwise spills GC/Arrow/
python-worker threads onto idle cores, inflating the low level's
throughput (an N-core cluster executor has N cores total, so must the
proxy). Partitioning is data-driven and identical at both levels, so
per-task Arrow batching does not vary with parallelism.

| Metric | local[{n}] | local[{n * 4}] | speedup | efficiency |
|---|---|---|---|---|
| Frontier scheduled+deduped URLs/sec | {lo['frontier_urls_per_sec']:,.0f} | {hi['frontier_urls_per_sec']:,.0f} | {lo['frontier_sec'] / hi['frontier_sec']:.2f}x | {eff('frontier_sec')} |
| Frontier stage wall (s) | {lo['frontier_sec']} | {hi['frontier_sec']} | | |
| Pages extracted/sec | {lo['pages_extracted_per_sec']:,.0f} | {hi['pages_extracted_per_sec']:,.0f} | {lo['extract_sec'] / hi['extract_sec']:.2f}x | {eff('extract_sec')} |
| Extraction stage wall (s) | {lo['extract_sec']} | {hi['extract_sec']} | | |
| **Combined headline job** | {combined_lo:.1f}s | {combined_hi:.1f}s | {combined_lo / combined_hi:.2f}x | **{combined_eff}** |

Scaling criterion (BASELINE.json): efficiency >= 0.8 between N and 4N.

Stage definitions (scripts/_scaling_job.py):
- *frontier*: found_links pandas UDF (tolerant HTML parse + canonicalize,
  per-batch href memo) -> posexplode candidates -> first-discovery-wins
  groupBy (map-side partial agg) — the scheduled+deduped metric's work;
- *extraction*: clean_html + extract_text pandas UDFs over every page.

Reference context (BASELINE.md): the reference itself is politeness-limited
to <= 2 pages/sec/VM (4 workers / 2000 ms delay) — throughput here measures
the Spark-side scheduling/dedup/extraction work, with the politeness budget
honored logically (per-host slots/caps, plans/politeness.py).
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"lo": lo, "hi": hi, "combined_efficiency": combined_eff}))
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
