"""Big-V BSP routing bench: hash (id % k) vs Cuttana-assignment shard
ownership on a 200M-row clustered graph — the measurement the whole
partitioner exists for (cut quality realized as fewer exchanged bytes
per superstep, /root/reference/src/partition.rs:88-100).

The input is a deterministic planted-community graph (C contiguous
clusters, p_intra within-cluster edge probability) — a RANDOM graph has
no structure for ANY partitioner to exploit, so the r4 scaling input
(uniform random 200M rows) cannot show a routing win by construction;
this one can, and its cluster mixing rate is the knob that sets the
ceiling. The assignment comes from the sharded restreaming partitioner
(seed_cap=1 → the beyond-any-task path, pipelines/bigv_sharded.py).

Runs as THREE fresh Ray processes (assignment+quality / hash pool /
cuttana pool) so each phase's object-store spill is reclaimed at exit —
one process peaks past the sandbox disk's spill budget.

Writes one JSON to stdout and (if BENCH_OUT is set) to that path.

Usage:
    PYTHONPATH=/root/repo python tools/bench_routing.py [--edges N]
        [--vertices N] [--clusters C] [--shards K] [--cpus N]
"""
import json
import logging
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _arg(flag: str, default: int) -> int:
    if flag in sys.argv:
        return int(sys.argv[sys.argv.index(flag) + 1])
    return default


N_EDGES = _arg("--edges", 200_000_000)
N_VERTICES = _arg("--vertices", 1 << 22)
N_CLUSTERS = _arg("--clusters", 64)
N_SHARDS = _arg("--shards", 8)
N_CPUS = _arg("--cpus", int(os.environ.get("RAY_GRAFT_CPUS", "32")))
P_INTRA = 0.9
ITERS = 7
WORK = f"/tmp/cuttana_bench/routing_{N_EDGES}_{N_VERTICES}"


def write_clustered_graph(path: str) -> str:
    """Deterministic planted-community edge table, both directions
    emitted, multi-file parquet (resumable via _SUCCESS marker)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker):
        return path
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(7)
    files = 32
    per = N_EDGES // 2 // files
    csize = N_VERTICES // N_CLUSTERS
    for i in range(files):
        src = rng.integers(0, N_VERTICES, per)
        intra = rng.random(per) < P_INTRA
        dst = np.where(
            intra,
            (src // csize) * csize + rng.integers(0, csize, per),
            rng.integers(0, N_VERTICES, per))
        keep = src != dst
        src, dst = src[keep], dst[keep]
        t = pa.table({
            "src": pa.array(np.concatenate([src, dst])),
            "dst": pa.array(np.concatenate([dst, src])),
            "weight": pa.array(np.ones(2 * len(src), dtype=np.int64)),
        })
        pq.write_table(t, os.path.join(path, f"part-{i:05d}.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return path


def _ray_init():
    import ray
    ray.init(address="local", num_cpus=N_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level=logging.ERROR,
             log_to_driver=False)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def _edges():
    import ray.data as rd
    path = write_clustered_graph(
        f"/tmp/cuttana_bench/clustered_{N_EDGES}_{N_VERTICES}")
    return rd.read_parquet(path, file_extensions=["parquet"]).materialize()


def phase_assign() -> dict:
    import ray
    _ray_init()
    try:
        from cuttana_ray.pipelines.bigv import partition_quality_join
        from cuttana_ray.pipelines.bigv_sharded import (
            bigv_cuttana_assignment_sharded,
        )
        from cuttana_ray.stages.metrics import cut_metrics_mod
        edges = _edges()
        n_rows = edges.count()
        t0 = time.perf_counter()
        assign, ainfo = bigv_cuttana_assignment_sharded(
            edges, k=N_SHARDS, num_ranges=16, passes=4, seed_cap=1)
        t_assign = time.perf_counter() - t0
        os.makedirs(WORK, exist_ok=True)
        assign.write_parquet(os.path.join(WORK, "assignment"))
        q_c = partition_quality_join(edges, assign, N_SHARDS,
                                     edge_count=n_rows)
        q_h = cut_metrics_mod(edges, N_SHARDS)
        return {
            "edge_rows": n_rows,
            "assignment": {
                "partitioner": "bigv_cuttana_assignment_sharded "
                               "(unseeded, 16 ranges, 4 passes)",
                "build_sec": round(t_assign, 2),
                "balance_factor": round(ainfo["balance_factor"], 4),
                "max_task_state_rows": max(
                    m["range_vertices"] + m["max_agg_entries"]
                    for m in ainfo["memory_stats"]),
            },
            "edge_cut_ratio": {
                "hash": round(q_h["edge_cut_ratio"], 4),
                "cuttana": round(q_c["edge_cut_ratio"], 4)},
        }
    finally:
        ray.shutdown()


def phase_pool(routing: str) -> dict:
    import ray
    _ray_init()
    try:
        import ray.data as rd
        from cuttana_ray.pipelines.bigv import HashShardPool
        edges = _edges()
        n_rows = edges.count()
        assignment = None
        if routing == "cuttana":
            assignment = rd.read_parquet(
                os.path.join(WORK, "assignment")).materialize()
        t0 = time.perf_counter()
        pool = HashShardPool(edges, N_SHARDS, assignment=assignment,
                             edge_count=n_rows)
        t_build = time.perf_counter() - t0
        try:
            res, _ = pool.pagerank(max_iters=ITERS, tol=0.0)
            st = pool.exchange_stats()
        finally:
            pool.shutdown()
        spi = float(np.mean(res.seconds_per_iter[2:]))
        return {"sec_per_iter": round(spi, 4),
                "edges_per_sec_per_iter": round(n_rows / spi),
                "pool_build_sec": round(t_build, 2),
                **st}
    finally:
        ray.shutdown()


def main() -> dict:
    me = os.path.abspath(__file__)
    base_args = [me, "--edges", str(N_EDGES), "--vertices",
                 str(N_VERTICES), "--clusters", str(N_CLUSTERS),
                 "--shards", str(N_SHARDS), "--cpus", str(N_CPUS)]

    def run_phase(flag: str) -> dict:
        out = subprocess.run([sys.executable] + base_args + [flag],
                             capture_output=True, text=True, check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    a = run_phase("--phase-assign")
    hash_run = run_phase("--phase-hash")
    cut_run = run_phase("--phase-cuttana")
    return {
        "metric": ("big-V BSP PageRank exchange bytes/round + "
                   "sec/iter, hash id%k vs Cuttana-assignment shard "
                   "routing (r4 verdict next-round #1)"),
        "input": (f"{a['edge_rows']}-row planted-community edge table "
                  f"(V={N_VERTICES}, {N_CLUSTERS} clusters, "
                  f"p_intra={P_INTRA}), {N_SHARDS} shards, "
                  f"{N_CPUS} cpus"),
        **a,
        "hash_routing": hash_run,
        "cuttana_routing": cut_run,
        "exchange_reduction_factor": round(
            hash_run["bytes_per_round"]
            / max(1, cut_run["bytes_per_round"]), 3),
        "sec_per_iter_ratio": round(
            hash_run["sec_per_iter"]
            / max(1e-9, cut_run["sec_per_iter"]), 3),
    }


if __name__ == "__main__":
    if "--phase-assign" in sys.argv:
        print(json.dumps(phase_assign()))
    elif "--phase-hash" in sys.argv:
        print(json.dumps(phase_pool("hash")))
    elif "--phase-cuttana" in sys.argv:
        print(json.dumps(phase_pool("cuttana")))
    else:
        out = main()
        line = json.dumps(out)
        print(line)
        dest = os.environ.get("BENCH_OUT")
        if dest:
            with open(dest, "w") as f:
                f.write(line + "\n")
