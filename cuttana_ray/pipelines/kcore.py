"""k-core decomposition by iterative peeling over the link graph.

The k-core is the maximal subgraph in which every vertex has degree ≥ k
(degree = unique neighbors; the edge table is deduped + symmetrized, so
out-degree per ``src`` is exactly that). Peeling: repeatedly drop vertices
whose surviving degree < k until a fixpoint — the standard distributed
formulation (one degree-count round per peel, O(peel-depth) rounds, each a
``map_batches`` over edges with the alive mask broadcast via ``ray.put``;
per-batch partial counts collapse before any exchange, and the combine
obeys ``resolve_combine`` like PageRank/CC/BFS).

Exact and layout/cluster-size invariant: the alive fixpoint is unique
(peeling is confluent — order of removals never changes the final core).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from cuttana_ray.pipelines.graph import Graph
from cuttana_ray.pipelines.pagerank import IterativeResult
from cuttana_ray.util import resolve_combine


def _alive_degree_fn(alive_ref):
    def fn(batch: pa.Table) -> pa.Table:
        alive = ray.get(alive_ref)
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        keep = alive[src] & alive[dst]
        if not keep.any():
            return pa.table({"v": pa.array([], pa.int64()),
                             "partial": pa.array([], pa.int64())})
        uniq, cnt = np.unique(src[keep], return_counts=True)
        return pa.table({"v": pa.array(uniq, pa.int64()),
                         "partial": pa.array(cnt.astype(np.int64))})
    return fn


def kcore(graph: Graph, k: int, max_iters: int = 500,
          combine: str = "auto") -> IterativeResult:
    """Membership vector of the k-core: 1 if the vertex survives peeling,
    else 0 (``IterativeResult.values``, int64)."""
    V = graph.num_vertices
    combine = resolve_combine(combine, V)
    alive = np.ones(V, dtype=bool)

    res = IterativeResult(alive.astype(np.int64), 0, False)
    for it in range(max_iters):
        t0 = time.perf_counter()
        alive_ref = ray.put(alive)
        partial = graph.edges.map_batches(_alive_degree_fn(alive_ref),
                                          batch_format="pyarrow")
        if combine == "shuffle":
            partial = partial.groupby("v").aggregate(
                Sum("partial", alias_name="partial"))
        deg = np.zeros(V, dtype=np.int64)
        for b in partial.iter_batches(batch_size=1 << 20,
                                      batch_format="pyarrow"):
            v = b["v"].to_numpy(zero_copy_only=False)
            c = b["partial"].to_numpy(zero_copy_only=False)
            np.add.at(deg, v, c)
        new_alive = alive & (deg >= k)
        dropped = int((alive & ~new_alive).sum())
        alive = new_alive
        dt = time.perf_counter() - t0
        res.deltas.append(float(dropped))
        res.seconds_per_iter.append(dt)
        if dropped == 0:
            res.iterations = it + 1
            res.converged = True
            break
    else:
        res.iterations = max_iters
    res.values = alive.astype(np.int64)
    return res


def coreness(graph: Graph, max_k: int = 64,
             combine: str = "auto") -> np.ndarray:
    """Core number per vertex: the largest k whose k-core contains it.
    Computed by successive peels reusing each k's surviving core as the
    next k's starting point (the (k+1)-core is a subgraph of the k-core),
    so total work is one peel sequence, not max_k independent runs."""
    V = graph.num_vertices
    core = np.zeros(V, dtype=np.int64)
    alive = np.ones(V, dtype=bool)
    combine = resolve_combine(combine, V)
    for k in range(1, max_k + 1):
        sub = kcore(_masked(graph, alive), k, combine=combine)
        alive = alive & (sub.values.astype(bool))
        if not alive.any():
            break
        core[alive] = k
    return core


def _masked(graph: Graph, alive: np.ndarray) -> Graph:
    """View of the graph restricted to alive vertices (lazy filter — no
    re-encode; vertex ids keep their global meaning)."""
    alive_ref = ray.put(alive)

    def filt(batch: pa.Table) -> pa.Table:
        a = ray.get(alive_ref)
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(a[src] & a[dst]))

    return Graph(graph.edges.map_batches(filt, batch_format="pyarrow"),
                 graph.nodes, graph.num_vertices)
