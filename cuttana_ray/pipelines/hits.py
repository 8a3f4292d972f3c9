"""HITS (hubs & authorities) over a DIRECTED encoded edge table.

Kleinberg's iteration, weighted: per round

* authority step:  a(v) = Σ_{u→v} w(u,v) · h(u), then L2-normalize a;
* hub step:        h(u) = Σ_{u→v} w(u,v) · a(v), then L2-normalize h.

Unlike PageRank/LPA (which run on the symmetrized graph, where hubs and
authorities coincide by construction), HITS is only meaningful on the
directed edge table — the caller passes the pre-symmetrization edges
(``src``, ``dst``, ``weight`` int64-encoded).

Execution is the shuffle-mode discipline of ``pipelines/pagerank.py``:
broadcast the current vector once per half-step (``ray.put``),
``map_batches`` over the edge table emitting per-batch pre-aggregated
(vertex, partial) rows — hub skew ships weight, not multiplicity — and a
driver combine over the small partials (``combine="shuffle"`` is the
documented huge-V path, as everywhere else; see ``stages/vocab.py``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data

from cuttana_ray.pipelines.pagerank import _grouped_sum_to_dense
from cuttana_ray.util import resolve_combine


@dataclass
class HitsResult:
    authority: np.ndarray
    hub: np.ndarray
    iterations: int
    converged: bool
    deltas: list = field(default_factory=list)

    def table(self) -> pa.Table:
        n = len(self.authority)
        return pa.table({
            "vertex": pa.array(np.arange(n, dtype=np.int64)),
            "authority": pa.array(self.authority),
            "hub": pa.array(self.hub),
        })


def _weighted_gather_fn(vec_ref, src_col: str, dst_col: str):
    """Per-batch partials of ``out[dst_col] += w * vec[src_col]`` —
    pre-aggregated per destination inside the batch."""
    def fn(batch: pa.Table) -> pa.Table:
        vec = ray.get(vec_ref)
        a = batch[src_col].to_numpy(zero_copy_only=False)
        b = batch[dst_col].to_numpy(zero_copy_only=False)
        w = batch["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
        c = vec[a] * w
        uniq, inv = np.unique(b, return_inverse=True)
        sums = np.bincount(inv, weights=c)
        return pa.table({"dst": pa.array(uniq, pa.int64()),
                         "partial": pa.array(sums, pa.float64())})
    return fn


def _half_step(edges: "ray.data.Dataset", vec: np.ndarray, forward: bool,
               num_vertices: int, combine: str) -> np.ndarray:
    """forward=True: authority update (gather along src→dst);
    forward=False: hub update (gather along dst→src)."""
    ref = ray.put(vec)
    fn = _weighted_gather_fn(ref, "src" if forward else "dst",
                             "dst" if forward else "src")
    partial = edges.map_batches(fn, batch_format="pyarrow")
    out = _grouped_sum_to_dense(partial, num_vertices, combine=combine)
    norm = float(np.sqrt((out * out).sum()))
    return out / norm if norm > 0 else out


def hits(edges: "ray.data.Dataset", num_vertices: int, max_iters: int = 50,
         tol: float = 1e-8, combine: str = "auto") -> HitsResult:
    """Run weighted HITS to L1-convergence of the authority vector (or
    exactly ``max_iters`` rounds when ``tol=0`` — the SQL-oracle mode).
    h0 = uniform L2-normalized; returns L2-normalized (authority, hub)."""
    combine = resolve_combine(combine, num_vertices)
    h = np.full(num_vertices, 1.0 / np.sqrt(num_vertices), dtype=np.float64)
    a = np.zeros(num_vertices, dtype=np.float64)
    deltas: list[float] = []
    converged = False
    it = 0
    for it in range(1, max_iters + 1):
        a_new = _half_step(edges, h, True, num_vertices, combine)
        h = _half_step(edges, a_new, False, num_vertices, combine)
        delta = float(np.abs(a_new - a).sum())
        deltas.append(delta)
        a = a_new
        if tol > 0 and delta < tol:
            converged = True
            break
    return HitsResult(a, h, it, converged, deltas)
