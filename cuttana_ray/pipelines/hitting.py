"""Truncated hitting time to a target vertex set over the weighted graph.

``h_k(v) = E[min(τ_T, k)]`` — the expected number of random-walk steps to
first reach the target set ``T``, truncated at horizon ``k`` (Sarkar &
Moore, UAI 2007: the truncation makes hitting time local, computable in
``k`` sparse passes, and robust to the long-tail walks that make the
un-truncated quantity degenerate on large graphs). Recurrence from
``h_0 ≡ 0``:

    h_{t}(v) = 0                                   if v ∈ T
    h_{t}(v) = 1 + Σ_u P(v, u) · h_{t-1}(u)        otherwise

with ``P(v, u) = w(v, u) / strength(v)`` the weighted random-walk kernel.
Induction gives exactly ``E[min(τ_T, t)]``, so values are bounded by ``k``
and need no normalization.

Execution shape mirrors ``pipelines/katz.py``: the O(V) value vector
(documented small-V regime; the sharded-BSP modes in ``pipelines/csr.py``
are the big-V alternative) re-broadcasts per round; each round streams the
edge table once through ``map_batches`` emitting per-batch per-src partial
weighted sums, combined dense on the driver. Exposed as a fixed ``k``-step
iteration so an unrolled SQL oracle replays it exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from cuttana_ray.pipelines.graph import Graph


def _partial_fn(h_ref):
    def fn(batch: pa.Table) -> pa.Table:
        h = ray.get(h_ref)
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        w = batch["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
        uniq, inv = np.unique(src, return_inverse=True)
        sums = np.bincount(inv, weights=w * h[dst])
        return pa.table({"v": pa.array(uniq, pa.int64()),
                         "s": pa.array(sums, pa.float64())})
    return fn


def truncated_hitting_time(graph: Graph, targets: np.ndarray,
                           k: int = 6) -> np.ndarray:
    """``k`` rounds of the truncated-hitting-time recurrence toward the
    boolean target mask ``targets`` (shape [V]); returns float64 h_k.

    Vertices with zero out-strength cannot move, so a walk from one never
    hits: after round ``t`` their value is exactly ``t`` (= E[min(τ, t)]),
    reaching the truncation value ``k`` at the horizon.
    """
    V = graph.num_vertices
    strength = graph.out_weights()
    stranded = (strength <= 0) & ~targets
    safe_strength = np.where(strength > 0, strength, 1.0)
    h = np.zeros(V, dtype=np.float64)
    for t in range(1, k + 1):
        h_ref = ray.put(h)
        part = graph.edges.map_batches(_partial_fn(h_ref),
                                       batch_format="pyarrow")
        acc = np.zeros(V, dtype=np.float64)
        for b in part.iter_batches(batch_size=None, batch_format="pyarrow"):
            np.add.at(acc, b["v"].to_numpy(zero_copy_only=False),
                      b["s"].to_numpy(zero_copy_only=False))
        h = np.where(targets, 0.0, 1.0 + acc / safe_strength)
        h[stranded] = float(t)
    return h
