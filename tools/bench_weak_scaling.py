"""Big-V shard-pool WEAK-scaling experiment (r4 verdict next-round #4).

The r4 strong-scaling point (2→8 shards, same 200M-row input) read 0.666
with a three-experiment cause analysis pinning the residual on single-box
memory-hierarchy coupling of the random-gather kernel across shard
processes. This adds the measured leg that claim was missing: CONSTANT
per-shard payload (25M rows/shard — 2 shards × 50M vs 8 shards × 200M).
On a real cluster each node owns its memory system, so weak-scaling
sec/iter stays flat; on one box, any growth is by definition the shared
memory-hierarchy coupling term — measured directly, not inferred.

Writes one JSON line to stdout and (if BENCH_OUT set) to that path.
"""
import json
import os
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench.py")


def worker(shards: int, edges: int, repeats: int = 2) -> dict:
    runs = []
    for _ in range(repeats):
        out = subprocess.run(
            [sys.executable, BENCH, "--bigv-scaling-worker", str(shards)],
            env=dict(os.environ, SCALING_EDGES=str(edges)),
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(BENCH))
        runs.append(json.loads(out.stdout.strip().splitlines()[-1]))
    best = min(runs, key=lambda r: r["sec_per_iter"])
    best["all_runs_sec_per_iter"] = sorted(r["sec_per_iter"] for r in runs)
    return best


def main() -> dict:
    per_shard = 25_000_000
    lo = worker(2, 2 * per_shard)
    hi = worker(8, 8 * per_shard)
    weak_eff = lo["sec_per_iter"] / hi["sec_per_iter"]
    return {
        "metric": ("big-V shard-pool WEAK scaling: constant 25M rows/shard,"
                   " 2 vs 8 shard processes (fresh processes, best-of-2)"),
        "why": ("isolates the single-box memory-hierarchy coupling the r4 "
                "strong-scaling cause analysis blamed: flat sec/iter = no "
                "coupling; growth = the coupling term, measured directly"),
        "sec_per_iter_2shards_50M": lo["sec_per_iter"],
        "sec_per_iter_8shards_200M": hi["sec_per_iter"],
        "weak_scaling_efficiency": round(weak_eff, 3),
        "per_shard_rows": per_shard,
        "detail": {"lo": lo, "hi": hi},
    }


if __name__ == "__main__":
    out = main()
    line = json.dumps(out)
    print(line)
    dest = os.environ.get("BENCH_OUT")
    if dest:
        with open(dest, "w") as f:
            f.write(line + "\n")
