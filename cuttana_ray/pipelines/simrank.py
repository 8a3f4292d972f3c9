"""SimRank structural similarity (Jeh & Widom, KDD 2002), fixed-k.

``s(a,b) = C/(|N(a)||N(b)|) · Σ_{i∈N(a), j∈N(b)} s(i,j)`` with
``s(a,a) = 1``, iterated ``k`` times from ``s₀ = I`` — "two vertices are
similar if their neighbors are similar", the classic link-based
similarity behind related-query / related-item mining.

SimRank is inherently ALL-PAIRS: the state is a V×V matrix and no exact
formulation avoids it (the scalable literature — Kusumoto et al. VLDB'14,
pooled/single-source variants — approximates or restricts to query
vertices). This implementation is therefore the documented DENSE SMALL-V
REGIME, gated by ``max_vertices``: the iterate ``S`` broadcasts
(``ray.put``), and each iteration runs the identity
``S' = C·(A S Aᵀ) ⊘ (d dᵀ)`` as TWO streamed edge passes over the
distributed edge table — per block, ``M[src,:] += S[dst,:]`` (row
gather-scatter, vectorized ``np.add.at``), nonzero triplets return, the
driver folds dense. Off-diagonal entries divide by the exact
neighbor-count product; the diagonal pins to 1 each round. For V beyond
the gate, use the single-source / thresholded-sparse variants instead of
raising the gate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from cuttana_ray.pipelines.graph import Graph


def _pass_fn(s_ref, V: int):
    """One distributed half-matmul: per edge (src, dst), add S[dst, :]
    into row src of the partial — Σ over the block's edges, returned as
    nonzero triplets."""
    def fn(batch: pa.Table) -> pa.Table:
        sch = pa.schema([("i", pa.int64()), ("j", pa.int64()),
                         ("v", pa.float64())])
        if len(batch) == 0 or "src" not in batch.column_names:
            return sch.empty_table()
        S = ray.get(s_ref)
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        rows = np.unique(src)
        local = np.zeros((len(rows), V), dtype=np.float64)
        np.add.at(local, np.searchsorted(rows, src), S[dst])
        nz = np.nonzero(local)
        return pa.table({"i": pa.array(rows[nz[0]], pa.int64()),
                         "j": pa.array(nz[1].astype(np.int64)),
                         "v": pa.array(local[nz], pa.float64())}).cast(sch)
    return fn


def _half_matmul(graph: Graph, S: np.ndarray) -> np.ndarray:
    """Dense ``A @ S`` via one streamed edge pass (A is the unweighted
    symmetric adjacency, one row per directed edge)."""
    V = graph.num_vertices
    s_ref = ray.put(S)
    out = np.zeros((V, V), dtype=np.float64)
    part = graph.edges.map_batches(_pass_fn(s_ref, V),
                                   batch_format="pyarrow")
    for b in part.iter_batches(batch_size=None, batch_format="pyarrow"):
        i = b["i"].to_numpy(zero_copy_only=False)
        j = b["j"].to_numpy(zero_copy_only=False)
        np.add.at(out, (i, j), b["v"].to_numpy(zero_copy_only=False))
    return out


def simrank(graph: Graph, c: float = 0.8, k: int = 3,
            max_vertices: int = 8192) -> np.ndarray:
    """``k`` SimRank iterations; returns the dense V×V similarity matrix.

    Raises if ``V > max_vertices`` — the O(V²) state is the point of the
    gate, not an oversight (see module docstring for the scale path).
    """
    V = graph.num_vertices
    if V > max_vertices:
        raise ValueError(
            f"simrank: V={V} exceeds the dense-regime gate "
            f"({max_vertices}); use a single-source/thresholded variant "
            "for larger graphs")
    d = graph.degrees().astype(np.float64)
    dd = np.outer(d, d)
    safe = np.where(dd > 0, dd, 1.0)
    S = np.eye(V, dtype=np.float64)
    for _ in range(k):
        M = _half_matmul(graph, S)        # A @ S
        T = _half_matmul(graph, M.T)      # A @ (A S)ᵀ = (A S Aᵀ)ᵀ; symm.
        nxt = c * T / safe
        nxt[dd <= 0] = 0.0
        np.fill_diagonal(nxt, 1.0)
        S = nxt
    return S
