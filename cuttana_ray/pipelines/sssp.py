"""Multi-source weighted shortest paths (Bellman-Ford relaxation) over the
link graph.

Per round, every edge out of a vertex whose distance improved last round
proposes ``dist[src] + weight`` to its destination — the same
frontier-pruned ``map_batches`` + min-combine discipline as
``pipelines/bfs.py`` (work per round is O(edges-out-of-changed), not
O(E)). Unlike BFS, a settled vertex can improve again, so the frontier is
"changed last round" rather than "newly reached". Converges in at most
(max shortest-path hop count) rounds; weights must be non-negative int64
(the edge table's weight column). Exact; layout/cluster-size invariant.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Min

from cuttana_ray.pipelines.graph import Graph
from cuttana_ray.pipelines.pagerank import (IterativeResult,
                                             grouped_min_exchange)
from cuttana_ray.util import resolve_combine

UNREACHED = np.iinfo(np.int64).max


def _relax_fn(state_ref):
    def fn(batch: pa.Table) -> pa.Table:
        dist, frontier = ray.get(state_ref)
        src = batch["src"].to_numpy(zero_copy_only=False)
        keep = frontier[src]
        if not keep.any():
            return pa.table({"dst": pa.array([], pa.int64()),
                             "partial": pa.array([], pa.int64())})
        dst = batch["dst"].to_numpy(zero_copy_only=False)[keep]
        w = batch["weight"].to_numpy(zero_copy_only=False)[keep]
        cand = dist[src[keep]] + w
        order = np.argsort(dst, kind="stable")
        dst_s, cand_s = dst[order], cand[order]
        starts = np.concatenate(
            [[0], np.nonzero(dst_s[1:] != dst_s[:-1])[0] + 1])
        mins = np.minimum.reduceat(cand_s, starts)
        return pa.table({"dst": pa.array(dst_s[starts], pa.int64()),
                         "partial": pa.array(mins, pa.int64())})
    return fn


def shortest_paths(graph: Graph, seeds: "np.ndarray | list[int]",
                   max_iters: int = 500,
                   combine: str = "auto") -> IterativeResult:
    """Minimum total edge weight from any seed per vertex;
    ``values[v] == -1`` when unreachable (sentinel translated from the
    internal int64-max so the output table is join-friendly)."""
    V = graph.num_vertices
    combine = resolve_combine(combine, V)
    dist = np.full(V, UNREACHED, dtype=np.int64)
    seeds = np.asarray(seeds, dtype=np.int64)
    dist[seeds] = 0
    frontier = np.zeros(V, dtype=bool)
    frontier[seeds] = True

    res = IterativeResult(dist, 0, False)
    for it in range(max_iters):
        t0 = time.perf_counter()
        if not frontier.any():
            res.iterations = it
            res.converged = True
            break
        state_ref = ray.put((dist, frontier))
        partial = graph.edges.map_batches(_relax_fn(state_ref),
                                          batch_format="pyarrow")
        if combine == "shuffle":
            # bucketed sort-exchange, not the native per-key aggregate —
            # ~13x at high key cardinality (see grouped_min_exchange)
            partial = grouped_min_exchange(partial, "dst", "partial") \
                .rename_columns({"m": "partial"})
        cand = np.full(V, UNREACHED, dtype=np.int64)
        for b in partial.iter_batches(batch_size=1 << 20,
                                      batch_format="pyarrow"):
            d = b["dst"].to_numpy(zero_copy_only=False)
            m = b["partial"].to_numpy(zero_copy_only=False)
            np.minimum.at(cand, d, m)
        improved = cand < dist
        dist = np.where(improved, cand, dist)
        frontier = improved
        changed = int(improved.sum())
        dt = time.perf_counter() - t0
        res.deltas.append(float(changed))
        res.seconds_per_iter.append(dt)
        if changed == 0:
            res.iterations = it + 1
            res.converged = True
            break
    else:
        res.iterations = max_iters
    out = np.where(dist == UNREACHED, -1, dist)
    res.values = out
    return res
