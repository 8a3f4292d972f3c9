"""Connected components via distributed min-label propagation (north-star
algorithm #2; exact — labels converge to the minimum vertex id per
component).

Iteration: broadcast the label vector → ``map_batches`` over edges emits
per-batch (dst, min label over incoming srcs) partials → ``groupby(dst).min``
→ labels = min(labels, gathered). Terminates when no label changes
(O(diameter) rounds; the conv↔tool / role link graphs are shallow).
Checkpointable per iteration like PageRank.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import ray
import ray.data

from cuttana_ray.pipelines import checkpoint as ckpt
from cuttana_ray.pipelines.graph import Graph
from cuttana_ray.util import resolve_combine
from cuttana_ray.pipelines.pagerank import (IterativeResult,
                                             grouped_min_exchange)


def _minlabel_fn(labels_ref):
    def fn(batch: pa.Table) -> pa.Table:
        labels = ray.get(labels_ref)
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        lab = labels[src]
        order = np.argsort(dst, kind="stable")
        dst_s, lab_s = dst[order], lab[order]
        starts = np.concatenate([[0], np.nonzero(dst_s[1:] != dst_s[:-1])[0] + 1])
        mins = np.minimum.reduceat(lab_s, starts)
        return pa.table({"dst": pa.array(dst_s[starts], pa.int64()),
                         "partial": pa.array(mins, pa.int64())})
    return fn


def connected_components(graph: Graph, max_iters: int = 200,
                         workdir: str | None = None, resume: bool = False,
                         combine: str = "auto") -> IterativeResult:
    V = graph.num_vertices
    combine = resolve_combine(combine, V)
    labels = np.arange(V, dtype=np.int64)
    start_iter = 0
    if resume and workdir:
        loaded = ckpt.load_latest_iteration(workdir, "components")
        if loaded is not None:
            start_iter, labels, _ = loaded
            labels = labels.astype(np.int64)
            start_iter += 1

    res = IterativeResult(labels, 0, False)
    for it in range(start_iter, max_iters):
        t0 = time.perf_counter()
        labels_ref = ray.put(labels)
        partial = graph.edges.map_batches(_minlabel_fn(labels_ref),
                                          batch_format="pyarrow")
        if combine == "shuffle":
            # bucketed sort-exchange, not the native per-key aggregate —
            # ~13x at high key cardinality (see grouped_min_exchange)
            partial = grouped_min_exchange(partial, "dst", "partial") \
                .rename_columns({"m": "partial"})
        new = labels.copy()
        for b in partial.iter_batches(batch_size=1 << 20,
                                      batch_format="pyarrow"):
            d = b["dst"].to_numpy(zero_copy_only=False)
            m = b["partial"].to_numpy(zero_copy_only=False)
            np.minimum.at(new, d, m)
        changed = int((new != labels).sum())
        labels = new
        dt = time.perf_counter() - t0
        res.deltas.append(float(changed))
        res.seconds_per_iter.append(dt)
        if workdir:
            ckpt.save_iteration(workdir, "components", it, labels,
                                {"changed": changed, "seconds": dt})
        if changed == 0:
            res.iterations = it + 1
            res.converged = True
            break
    else:
        res.iterations = max_iters
    res.values = labels
    return res


def bipartiteness(graph: Graph) -> pa.Table:
    """Per-component bipartiteness test with odd-cycle witness counts —
    the 2-colorability primitive. Composition: connected components give
    each component's root (its min vertex id), ONE multi-seed BFS layers
    every vertex by distance from its own root, and a single streamed
    edge pass counts the edges joining SAME-parity endpoints (each such
    edge closes an odd cycle; a component is bipartite iff it has none —
    BFS layers alternate exactly when no odd cycle exists).

    Returns ``(component, n_vertices, odd_edges, is_bipartite)`` sorted
    by component. Labels/parity ship as ONE broadcast O(V) vector pair
    (the documented small-V driver regime shared by closeness /
    eccentricity; the sharded-BSP modes are the big-V alternative); edge
    parity partials pre-combine per batch so the driver merges O(#blocks
    · #components) rows."""
    from cuttana_ray.pipelines.bfs import bfs_distances

    labels = connected_components(graph).values
    roots = np.unique(labels)
    dist = bfs_distances(graph, roots).values
    parity = (dist % 2).astype(np.int8)
    state_ref = ray.put((labels, parity))

    def odd_partial(t: pa.Table) -> pa.Table:
        sch = pa.schema([("component", pa.int64()), ("odd", pa.int64())])
        if len(t) == 0 or "src" not in t.column_names:
            return sch.empty_table()
        lab, par = ray.get(state_ref)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        # symmetric edge table: src < dst visits each undirected edge once
        hit = (src < dst) & (par[src] == par[dst])
        comp, cnt = np.unique(lab[src[hit]], return_counts=True)
        return pa.table({"component": pa.array(comp, pa.int64()),
                         "odd": pa.array(cnt.astype(np.int64))}).cast(sch)

    comps, nv = np.unique(labels, return_counts=True)
    odd_by = dict.fromkeys(comps.tolist(), 0)
    partial = graph.edges.map_batches(odd_partial, batch_format="pyarrow")
    for b in partial.iter_batches(batch_size=None, batch_format="pyarrow"):
        for c, o in zip(b["component"].to_pylist(), b["odd"].to_pylist()):
            odd_by[c] += o
    odd = np.array([odd_by[c] for c in comps.tolist()], np.int64)
    return pa.table({
        "component": pa.array(comps, pa.int64()),
        "n_vertices": pa.array(nv.astype(np.int64)),
        "odd_edges": pa.array(odd),
        "is_bipartite": pa.array(odd == 0)})
