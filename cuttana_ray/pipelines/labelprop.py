"""Synchronous weighted label propagation (north-star algorithm #3).

Deterministic semantics (identical in the engine and the NumPy oracle, which
is the exactness contract — the classic async LPA is order-dependent):

* labels start as vertex ids;
* each round, every vertex adopts the label with the maximum total incoming
  edge weight among its neighbors' current labels; ties break to the
  SMALLEST label id; isolated vertices keep their label;
* synchronous update, fixed ``max_iters`` rounds with early stop when no
  label changes.

Iteration: broadcast labels → ``map_batches`` emits per-batch partial
(dst, label, weight) sums → ``groupby(dst, label).sum`` → driver-side
vectorized argmax per dst (lexsort + reduceat over ≤E small rows).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from cuttana_ray.pipelines import checkpoint as ckpt
from cuttana_ray.pipelines.graph import Graph
from cuttana_ray.util import resolve_combine
from cuttana_ray.pipelines.pagerank import (IterativeResult,
                                             grouped_sum2_exchange)


def _label_weight_fn(labels_ref):
    def fn(batch: pa.Table) -> pa.Table:
        labels = ray.get(labels_ref)
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        w = batch["weight"].to_numpy(zero_copy_only=False)
        lab = labels[src]
        order = np.lexsort((lab, dst))
        d_s, l_s, w_s = dst[order], lab[order], w[order]
        change = np.nonzero((d_s[1:] != d_s[:-1]) | (l_s[1:] != l_s[:-1]))[0] + 1
        starts = np.concatenate([[0], change])
        sums = np.add.reduceat(w_s, starts)
        return pa.table({"dst": pa.array(d_s[starts], pa.int64()),
                         "label": pa.array(l_s[starts], pa.int64()),
                         "partial": pa.array(sums, pa.int64())})
    return fn


def argmax_labels(dst: np.ndarray, label: np.ndarray, weight: np.ndarray,
                  current: np.ndarray) -> np.ndarray:
    """Per-dst argmax over (weight, -label): max weight, ties → smallest
    label. Returns updated copy of ``current``."""
    # sort by (dst, weight desc, label asc) → first row per dst wins
    order = np.lexsort((label, -weight, dst))
    d_s = dst[order]
    first = np.concatenate([[0], np.nonzero(d_s[1:] != d_s[:-1])[0] + 1])
    new = current.copy()
    new[d_s[first]] = label[order][first]
    return new


def label_propagation(graph: Graph, max_iters: int = 10,
                      workdir: str | None = None, resume: bool = False,
                      combine: str = "auto") -> IterativeResult:
    V = graph.num_vertices
    combine = resolve_combine(combine, V)
    labels = np.arange(V, dtype=np.int64)
    start_iter = 0
    if resume and workdir:
        loaded = ckpt.load_latest_iteration(workdir, "labelprop")
        if loaded is not None:
            start_iter, labels, _ = loaded
            labels = labels.astype(np.int64)
            start_iter += 1

    res = IterativeResult(labels, 0, False)
    for it in range(start_iter, max_iters):
        t0 = time.perf_counter()
        labels_ref = ray.put(labels)
        partial = graph.edges.map_batches(_label_weight_fn(labels_ref),
                                          batch_format="pyarrow")
        if combine == "shuffle":
            # bucketed sort-exchange, not the native per-key aggregate —
            # ~96x at high key cardinality (see grouped_sum_exchange);
            # int64 weight sums are order-free, so this is exact
            partial = grouped_sum2_exchange(partial, "dst", "label",
                                            "partial", int_val=True)
        ds, ls, ws = [], [], []
        for b in partial.iter_batches(batch_size=1 << 20,
                                      batch_format="pyarrow"):
            ds.append(b["dst"].to_numpy(zero_copy_only=False))
            ls.append(b["label"].to_numpy(zero_copy_only=False))
            ws.append(b["partial"].to_numpy(zero_copy_only=False))
        if ds:
            d = np.concatenate(ds); l = np.concatenate(ls)
            w = np.concatenate(ws)
            # driver combine: merge per-batch partial (dst,label) sums first
            order = np.lexsort((l, d))
            d, l, w = d[order], l[order], w[order]
            change = np.nonzero((d[1:] != d[:-1]) | (l[1:] != l[:-1]))[0] + 1
            starts = np.concatenate([[0], change])
            d2, l2 = d[starts], l[starts]
            w2 = np.add.reduceat(w, starts)
            new = argmax_labels(d2, l2, w2, labels)
        else:
            new = labels.copy()
        changed = int((new != labels).sum())
        labels = new
        dt = time.perf_counter() - t0
        res.deltas.append(float(changed))
        res.seconds_per_iter.append(dt)
        if workdir:
            ckpt.save_iteration(workdir, "labelprop", it, labels,
                                {"changed": changed, "seconds": dt})
        if changed == 0:
            res.iterations = it + 1
            res.converged = True
            break
    else:
        res.iterations = max_iters
    res.values = labels
    return res
