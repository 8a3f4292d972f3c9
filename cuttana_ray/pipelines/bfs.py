"""Multi-source BFS hop distances over the link graph.

Classic frontier-expansion BFS expressed Ray-Data-first, sharing the
iteration discipline of ``pipelines/components.py``: per round, a
``map_batches`` over the edge table emits per-batch (dst, min candidate
distance) partials FOR FRONTIER SOURCES ONLY — the frontier mask rides the
same ``ray.put`` broadcast as the distance vector, so settled regions of
the graph cost nothing after their wave passes (work per round is
O(edges-out-of-frontier), not O(E)). Partials are combined per
``resolve_combine``: small-V dense driver combine, or a
``groupby(dst).min`` shuffle beyond the driver-state cap.

Exact: distances are minimum hop counts; unreachable vertices keep the
sentinel ``-1``. Terminates after at most diameter+1 rounds (empty
frontier). Checkpointable per iteration like PageRank/CC.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Min

from cuttana_ray.pipelines import checkpoint as ckpt
from cuttana_ray.pipelines.graph import Graph
from cuttana_ray.pipelines.pagerank import (IterativeResult,
                                             grouped_min_exchange)
from cuttana_ray.util import resolve_combine

UNREACHED = -1


def _frontier_fn(state_ref):
    def fn(batch: pa.Table) -> pa.Table:
        dist, frontier = ray.get(state_ref)
        src = batch["src"].to_numpy(zero_copy_only=False)
        keep = frontier[src]
        if not keep.any():
            return pa.table({"dst": pa.array([], pa.int64()),
                             "partial": pa.array([], pa.int64())})
        dst = batch["dst"].to_numpy(zero_copy_only=False)[keep]
        cand = dist[src[keep]] + 1
        order = np.argsort(dst, kind="stable")
        dst_s, cand_s = dst[order], cand[order]
        starts = np.concatenate(
            [[0], np.nonzero(dst_s[1:] != dst_s[:-1])[0] + 1])
        mins = np.minimum.reduceat(cand_s, starts)
        return pa.table({"dst": pa.array(dst_s[starts], pa.int64()),
                         "partial": pa.array(mins, pa.int64())})
    return fn


def bfs_distances(graph: Graph, seeds: "np.ndarray | list[int]",
                  max_iters: int = 200, workdir: str | None = None,
                  resume: bool = False,
                  combine: str = "auto") -> IterativeResult:
    """Minimum hop distance from any seed; ``UNREACHED`` (-1) if no path."""
    V = graph.num_vertices
    combine = resolve_combine(combine, V)
    dist = np.full(V, UNREACHED, dtype=np.int64)
    seeds = np.asarray(seeds, dtype=np.int64)
    dist[seeds] = 0
    frontier = np.zeros(V, dtype=bool)
    frontier[seeds] = True
    start_iter = 0
    if resume and workdir:
        loaded = ckpt.load_latest_iteration(workdir, "bfs")
        if loaded is not None:
            start_iter, dist, meta = loaded
            dist = dist.astype(np.int64)
            # frontier = vertices settled exactly at the checkpoint depth
            frontier = dist == (start_iter + 1)
            start_iter += 1

    res = IterativeResult(dist, 0, False)
    for it in range(start_iter, max_iters):
        t0 = time.perf_counter()
        if not frontier.any():
            res.iterations = it
            res.converged = True
            break
        state_ref = ray.put((dist, frontier))
        partial = graph.edges.map_batches(_frontier_fn(state_ref),
                                          batch_format="pyarrow")
        if combine == "shuffle":
            # bucketed sort-exchange, not the native per-key aggregate —
            # ~13x at high key cardinality (see grouped_min_exchange)
            partial = grouped_min_exchange(partial, "dst", "partial") \
                .rename_columns({"m": "partial"})
        cand = np.full(V, np.iinfo(np.int64).max, dtype=np.int64)
        for b in partial.iter_batches(batch_size=1 << 20,
                                      batch_format="pyarrow"):
            d = b["dst"].to_numpy(zero_copy_only=False)
            m = b["partial"].to_numpy(zero_copy_only=False)
            np.minimum.at(cand, d, m)
        newly = (dist == UNREACHED) & (cand != np.iinfo(np.int64).max)
        dist = np.where(newly, cand, dist)
        frontier = newly
        changed = int(newly.sum())
        dt = time.perf_counter() - t0
        res.deltas.append(float(changed))
        res.seconds_per_iter.append(dt)
        if workdir:
            ckpt.save_iteration(workdir, "bfs", it, dist,
                                {"settled": changed, "seconds": dt})
        if changed == 0:
            res.iterations = it + 1
            res.converged = True
            break
    else:
        res.iterations = max_iters
    res.values = dist
    return res


def eccentricity(graph: Graph, seeds: "np.ndarray | list[int]",
                 max_iters: int = 200) -> pa.Table:
    """Per-seed eccentricity over the reachable set: one BFS per seed
    (frontier-bounded edge passes), reporting the max hop distance and the
    reachable-vertex count (seed included). With seeds = a hash-spaced
    sample this is the standard diameter/radius estimator; passes scale as
    |seeds| × depth, so size the sample accordingly."""
    out_seed, out_ecc, out_n = [], [], []
    for s in np.asarray(seeds, dtype=np.int64):
        d = bfs_distances(graph, [int(s)], max_iters=max_iters).values
        reached = d >= 0
        out_seed.append(int(s))
        out_ecc.append(int(d[reached].max()))
        out_n.append(int(reached.sum()))
    return pa.table({
        "seed": pa.array(out_seed, pa.int64()),
        "eccentricity": pa.array(out_ecc, pa.int64()),
        "n_reached": pa.array(out_n, pa.int64()),
    })


def harmonic_centrality(graph: Graph, seeds: "np.ndarray | list[int]",
                        max_iters: int = 200) -> pa.Table:
    """Per-seed harmonic centrality ``H(s) = Σ_{v≠s reachable} 1/d(s,v)``
    — the disconnected-graph-safe closeness variant (Boldi & Vigna 2014).
    One frontier-bounded BFS per seed, same pass structure and seed-sample
    sizing guidance as ``eccentricity``. Returns ``(seed, harmonic
    [6 dp], n_reached)`` with the seed itself excluded."""
    out_seed, out_h, out_n = [], [], []
    for s in np.asarray(seeds, dtype=np.int64):
        d = bfs_distances(graph, [int(s)], max_iters=max_iters).values
        mask = d > 0
        out_seed.append(int(s))
        out_h.append(float(np.round(np.sum(1.0 / d[mask]), 6)))
        out_n.append(int(mask.sum()))
    return pa.table({
        "seed": pa.array(out_seed, pa.int64()),
        "harmonic": pa.array(out_h, pa.float64()),
        "n_reached": pa.array(out_n, pa.int64())})


def closeness(graph: Graph, seeds: "np.ndarray | list[int]",
              max_iters: int = 200) -> pa.Table:
    """Per-seed closeness centrality restricted to the reachable set:
    ``C(s) = n_reached / Σ d(s,v)`` over ``v ≠ s`` (Bavelas form; the
    disconnected-safe alternative is ``harmonic_centrality``). Same
    frontier-bounded BFS per seed as ``eccentricity``. The ratio is ONE
    int/int division on both engine and oracle sides, so no rounding is
    needed for hash parity. Seeds reaching nothing are omitted (matching
    the SQL GROUP BY over d > 0 rows)."""
    out_seed, out_n, out_s, out_c = [], [], [], []
    for s in np.asarray(seeds, dtype=np.int64):
        d = bfs_distances(graph, [int(s)], max_iters=max_iters).values
        mask = d > 0
        n = int(mask.sum())
        if n == 0:
            continue
        sd = int(d[mask].sum())
        out_seed.append(int(s))
        out_n.append(n)
        out_s.append(sd)
        out_c.append(float(np.float64(n) / np.float64(sd)))
    return pa.table({
        "seed": pa.array(out_seed, pa.int64()),
        "n_reached": pa.array(out_n, pa.int64()),
        "sum_d": pa.array(out_s, pa.int64()),
        "closeness": pa.array(out_c, pa.float64())})
