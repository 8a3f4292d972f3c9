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
from ray.data.aggregate import Min

from cuttana_ray.pipelines import checkpoint as ckpt
from cuttana_ray.pipelines.graph import Graph
from cuttana_ray.util import resolve_combine
from cuttana_ray.pipelines.pagerank import IterativeResult


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
            partial = partial.groupby("dst").aggregate(
                Min("partial", alias_name="partial"))
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
