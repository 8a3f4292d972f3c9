"""Second-eigenvalue (spectral-gap) estimation of the normalized adjacency.

``N = D^{-1/2} W D^{-1/2}`` over the symmetrized weighted graph has
principal eigenvalue 1 with eigenvector ``u ∝ √strength`` — known in
closed form, so no first power iteration is needed. The second eigenvalue
(whose gap from 1 bounds random-walk mixing time and conductance via
Cheeger) comes from ``k`` DEFLATED power-iteration steps:

    x ← N·x;  x ← x − (u·x)·u;  λ ← ‖x‖₂;  x ← x/λ

from the deterministic seed ``x₀[v] = (v mod 7) + 1`` (deflated +
normalized first). Exposed as a fixed-``k`` iteration so an unrolled SQL
oracle replays it exactly; the returned λ is the estimate after exactly
``k`` steps, not a convergence guarantee (on a disconnected graph the
true λ₂ is 1 and the iterate reports it correctly — a second
eigenvalue-1 vector survives deflation).

Execution shape mirrors ``pipelines/katz.py``: one streamed edge pass per
round with the O(V) iterate re-broadcast (documented small-V regime; the
sharded-BSP modes in ``pipelines/csr.py`` are the big-V alternative).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from cuttana_ray.pipelines.graph import Graph


def _partial_fn(xs_ref):
    def fn(batch: pa.Table) -> pa.Table:
        xs = ray.get(xs_ref)
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        w = batch["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
        uniq, inv = np.unique(src, return_inverse=True)
        sums = np.bincount(inv, weights=w * xs[dst])
        return pa.table({"v": pa.array(uniq, pa.int64()),
                         "s": pa.array(sums, pa.float64())})
    return fn


def spectral_gap(graph: Graph, k: int = 8) -> tuple[float, np.ndarray]:
    """``k`` deflated power-iteration steps on the normalized adjacency;
    returns ``(lambda2_estimate, final_unit_vector)``.

    Zero-strength (isolated) vertices contribute nothing to N (their rows
    and columns are zero) and keep value 0 throughout.
    """
    V = graph.num_vertices
    s = graph.out_weights()
    pos = s > 0
    rs = np.zeros(V, dtype=np.float64)
    rs[pos] = 1.0 / np.sqrt(s[pos])
    u = np.sqrt(np.maximum(s, 0.0))
    u = u / float(np.sqrt((u * u).sum()))

    x = ((np.arange(V, dtype=np.int64) % 7) + 1).astype(np.float64)
    x = x - float(u @ x) * u
    x = x / float(np.sqrt((x * x).sum()))
    lam = 0.0
    for _ in range(k):
        xs_ref = ray.put(x * rs)
        part = graph.edges.map_batches(_partial_fn(xs_ref),
                                       batch_format="pyarrow")
        acc = np.zeros(V, dtype=np.float64)
        for b in part.iter_batches(batch_size=None, batch_format="pyarrow"):
            np.add.at(acc, b["v"].to_numpy(zero_copy_only=False),
                      b["s"].to_numpy(zero_copy_only=False))
        y = acc * rs
        y = y - float(u @ y) * u
        lam = float(np.sqrt((y * y).sum()))
        x = y / lam if lam > 0 else y
    return lam, x
