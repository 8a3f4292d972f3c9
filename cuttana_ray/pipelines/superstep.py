"""Storage-streaming PageRank supersteps over parquet fragments (raw Ray
tasks).

The 100-TB regime: the edge table is far larger than cluster RAM, so every
PageRank iteration re-streams the edge blocks from storage — decode +
gather-combine is the per-iteration compute, and iteration throughput
scales with CPUs (unlike a fully materialized in-memory kernel, which is
memory-bus-bound and cannot scale with cores on one box; see BASELINE.md).

This is the engine's one deliberate drop below the Dataset API (SURVEY.md
§2: "raw Ray tasks as a last resort"): the streaming executor costs
~0.2-0.5 s of launch/teardown per execution, which dominates an iteration
loop; a superstep here is just ``len(files)`` tasks + a tree-reduce, ~20 ms
of control overhead. Results match ``pipelines.pagerank`` (allclose 1e-6;
identical math, different summation order).
"""

from __future__ import annotations

import time

import numpy as np
import ray

from cuttana_ray.pipelines.pagerank import IterativeResult


@ray.remote
def _outw_task(path: str, num_vertices: int) -> np.ndarray:
    import pyarrow.parquet as pq
    # use_threads=False: a 1-CPU task must not fan out into Arrow's global
    # thread pool (that would bleed parallelism across the scheduler's
    # resource accounting)
    t = pq.read_table(path, columns=["src", "weight"], use_threads=False)
    src = t["src"].to_numpy(zero_copy_only=False)
    w = t["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
    return np.bincount(src, weights=w, minlength=num_vertices)


@ray.remote
def _contrib_task(path: str, ranks, outw, num_vertices: int) -> np.ndarray:
    """One fragment's dense contribution vector (float64, length V)."""
    import pyarrow.parquet as pq
    t = pq.read_table(path, columns=["src", "dst", "weight"],
                      use_threads=False)
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    w = t["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
    c = ranks[src] * w / outw[src]
    return np.bincount(dst, weights=c, minlength=num_vertices)


@ray.remote
def _merge_task(*vecs: np.ndarray) -> np.ndarray:
    out = vecs[0].copy()
    for v in vecs[1:]:
        out += v
    return out


def pagerank_files(files: list[str], num_vertices: int,
                   damping: float = 0.85, tol: float = 1e-6,
                   max_iters: int = 100,
                   fanin: int | None = None) -> IterativeResult:
    """PageRank over a symmetrized int edge table stored as parquet files,
    re-streamed from storage each superstep.

    Per-fragment partials come back as dense V-length vectors (assumes V·8B
    per fragment is small; for huge V the contrib task would emit sparse
    (dst, partial) pairs instead). ``fanin``: optional tree-reduce via merge
    tasks before the driver add — only worth it when ``len(files) × V`` is
    too big for one driver-side sum (the extra task wave otherwise adds a
    full task-latency level per iteration)."""
    V = num_vertices
    outw_parts = ray.get([_outw_task.remote(f, V) for f in files])
    outw = np.sum(outw_parts, axis=0)
    dangling = outw == 0.0
    outw_ref = ray.put(np.where(dangling, 1.0, outw))

    ranks = np.full(V, 1.0 / V)
    res = IterativeResult(ranks, 0, False)
    for it in range(max_iters):
        t0 = time.perf_counter()
        ranks_ref = ray.put(ranks)
        refs = [_contrib_task.remote(f, ranks_ref, outw_ref, V)
                for f in files]
        if fanin:
            while len(refs) > fanin:
                refs = [_merge_task.remote(*refs[i:i + fanin])
                        for i in range(0, len(refs), fanin)]
        gathered = np.sum(ray.get(refs), axis=0)
        new = (1 - damping) / V + damping * (
            gathered + ranks[dangling].sum() / V)
        delta = float(np.abs(new - ranks).sum())
        ranks = new
        res.deltas.append(delta)
        res.seconds_per_iter.append(time.perf_counter() - t0)
        if delta < tol:
            res.iterations, res.converged = it + 1, True
            break
    else:
        res.iterations = max_iters
    res.values = ranks
    return res
