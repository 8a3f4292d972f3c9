"""Katz centrality over the weighted link graph.

``x_{t+1}[v] = 1 + α · Σ_{(u→v) ∈ E} w_uv · x_t[u]`` from ``x_0 = 1`` —
the classic attenuated-walk-count centrality (Katz 1953). Unlike PageRank
there is no out-degree normalization, so the edge weights enter raw; with
α below ``1/λ_max`` the fixed point is the Neumann series
``Σ_k α^k (WᵀA)^k 1``. Exposed as a fixed ``k``-step iteration (exactly
replayable in an unrolled SQL oracle, like ``pagerank_k5``) rather than a
convergence loop.

Execution shape mirrors ``kcore``: the O(V) value vector (documented
small-V regime) is re-broadcast per round; each round streams the edge
table through ``map_batches`` emitting per-batch per-dst partial weighted
sums (≤ #distinct-dst rows), combined dense on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from cuttana_ray.pipelines.graph import Graph


def _partial_fn(x_ref):
    def fn(batch: pa.Table) -> pa.Table:
        x = ray.get(x_ref)
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        w = batch["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
        uniq, inv = np.unique(dst, return_inverse=True)
        sums = np.bincount(inv, weights=w * x[src])
        return pa.table({"v": pa.array(uniq, pa.int64()),
                         "s": pa.array(sums, pa.float64())})
    return fn


def katz(graph: Graph, alpha: float = 0.01, k: int = 6) -> np.ndarray:
    """``k`` Katz iterations; returns the float64 value vector."""
    V = graph.num_vertices
    x = np.ones(V, dtype=np.float64)
    for _ in range(k):
        x_ref = ray.put(x)
        part = graph.edges.map_batches(_partial_fn(x_ref),
                                       batch_format="pyarrow")
        nxt = np.zeros(V, dtype=np.float64)
        for b in part.iter_batches(batch_size=None, batch_format="pyarrow"):
            np.add.at(nxt, b["v"].to_numpy(zero_copy_only=False),
                      b["s"].to_numpy(zero_copy_only=False))
        x = 1.0 + alpha * nxt
    return x


def eigenvector(graph: Graph, k: int = 6) -> np.ndarray:
    """``k`` L2-normalized power-iteration steps ``x ← (Wᵀx)/‖Wᵀx‖₂``
    from ``x₀ = 1/√V`` — eigenvector centrality as a fixed-step iteration
    (same broadcast-vector small-V regime and per-round partial shape as
    ``katz``; the symmetric weighted adjacency makes the power iteration
    converge to the principal eigenvector)."""
    V = graph.num_vertices
    x = np.full(V, 1.0 / np.sqrt(V), dtype=np.float64)
    for _ in range(k):
        x_ref = ray.put(x)
        part = graph.edges.map_batches(_partial_fn(x_ref),
                                       batch_format="pyarrow")
        nxt = np.zeros(V, dtype=np.float64)
        for b in part.iter_batches(batch_size=None, batch_format="pyarrow"):
            np.add.at(nxt, b["v"].to_numpy(zero_copy_only=False),
                      b["s"].to_numpy(zero_copy_only=False))
        nrm = float(np.sqrt((nxt * nxt).sum()))
        x = nxt / nrm if nrm > 0 else nxt
    return x
