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


def _norm_gather_fn(state_ref, src_col: str, dst_col: str):
    """Per-batch partials of ``out[dst_col] += (w / norm[src_col]) ·
    vec[src_col]`` — the SALSA random-walk step (weights normalized by
    the SOURCE side's total weight), pre-aggregated per destination."""
    def fn(batch: pa.Table) -> pa.Table:
        vec, norm = ray.get(state_ref)
        a = batch[src_col].to_numpy(zero_copy_only=False)
        b = batch[dst_col].to_numpy(zero_copy_only=False)
        w = batch["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
        c = vec[a] * (w / norm[a])
        uniq, inv = np.unique(b, return_inverse=True)
        sums = np.bincount(inv, weights=c)
        return pa.table({"dst": pa.array(uniq, pa.int64()),
                         "partial": pa.array(sums, pa.float64())})
    return fn


def salsa(edges: "ray.data.Dataset", num_vertices: int, max_iters: int = 4,
          tol: float = 0.0, combine: str = "auto") -> HitsResult:
    """SALSA (Lempel & Moran, WWW 2000; public algorithm): the
    degree-normalized cousin of HITS — hubs and authorities are the two
    sides of a random walk that alternates a forward step weighted by
    ``w/outw(u)`` and a backward step weighted by ``w/inw(v)``:

        a(v) = Σ_{u→v} (w(u,v) / outw(u)) · h(u),  then L1-normalize;
        h(u) = Σ_{u→v} (w(u,v) / inw(v))  · a(v),  then L1-normalize.

    ``h0`` uniform 1/V. Same shuffle-mode discipline as ``hits``: the
    out/in weight vectors are computed ONCE from per-batch partials and
    broadcast together with the current vector; every round is two
    streamed pre-combined edge passes. Vertices with no out-(in-)edges
    never appear as a normalized source, so the guard value 1.0 in the
    norm vectors is never dereferenced."""
    combine = resolve_combine(combine, num_vertices)

    def total_weight(src_col: str) -> np.ndarray:
        def fn(batch: pa.Table) -> pa.Table:
            s = batch[src_col].to_numpy(zero_copy_only=False)
            w = batch["weight"].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            uniq, inv = np.unique(s, return_inverse=True)
            return pa.table({"dst": pa.array(uniq, pa.int64()),
                             "partial": pa.array(np.bincount(inv,
                                                             weights=w))})
        part = edges.map_batches(fn, batch_format="pyarrow")
        return _grouped_sum_to_dense(part, num_vertices, combine=combine)

    outw = total_weight("src")
    inw = total_weight("dst")
    outw_safe = np.where(outw > 0, outw, 1.0)
    inw_safe = np.where(inw > 0, inw, 1.0)

    h = np.full(num_vertices, 1.0 / num_vertices, dtype=np.float64)
    a = np.zeros(num_vertices, dtype=np.float64)
    deltas: list[float] = []
    converged = False
    it = 0
    for it in range(1, max_iters + 1):
        ref = ray.put((h, outw_safe))
        part = edges.map_batches(_norm_gather_fn(ref, "src", "dst"),
                                 batch_format="pyarrow")
        a_new = _grouped_sum_to_dense(part, num_vertices, combine=combine)
        s = float(a_new.sum())
        if s > 0:
            a_new = a_new / s
        ref = ray.put((a_new, inw_safe))
        part = edges.map_batches(_norm_gather_fn(ref, "dst", "src"),
                                 batch_format="pyarrow")
        h = _grouped_sum_to_dense(part, num_vertices, combine=combine)
        s = float(h.sum())
        if s > 0:
            h = h / s
        delta = float(np.abs(a_new - a).sum())
        deltas.append(delta)
        a = a_new
        if tol > 0 and delta < tol:
            converged = True
            break
    return HitsResult(a, h, it, converged, deltas)
