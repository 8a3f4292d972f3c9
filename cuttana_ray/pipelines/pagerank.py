"""PageRank over the encoded link graph (north-star algorithm #1).

Two interchangeable executors with matching results (SURVEY.md §7 P4):

* **shuffle mode** (this module): one iteration = broadcast the rank vector
  (``ray.put`` once per iteration, zero-copy to every task) →
  ``map_batches`` over the edge table computing per-batch partial
  contribution sums per destination (pre-aggregated, so hub skew ships
  weight not multiplicity) → ``groupby("dst").sum`` over the small partials
  → dense new rank vector. Teleport + dangling mass via driver-side
  aggregates over the dense vectors.
* **CSR actor mode** (``cuttana_ray.pipelines.csr``): per-partition CSR
  blocks in a stateful actor pool do the gather-scatter inner loop.

Convergence: L1 delta ``sum(|r_new - r_old|) < tol`` (north star: per-vertex
``allclose(1e-6)`` against the NumPy oracle at convergence). Each iteration
can checkpoint its rank vector + lineage manifest; ``resume=True`` continues
from the last complete iteration.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from cuttana_ray.pipelines import checkpoint as ckpt
from cuttana_ray.pipelines.graph import Graph
from cuttana_ray.util import resolve_combine

# below this many edge rows the per-iteration gather runs on a locally
# held edge array (streaming-executor launch cost dominates otherwise)
_LOCAL_PR_MAX_EDGES = 1 << 21


@dataclass
class IterativeResult:
    values: np.ndarray
    iterations: int
    converged: bool
    deltas: list = field(default_factory=list)
    seconds_per_iter: list = field(default_factory=list)

    def table(self, value_name: str = "rank") -> pa.Table:
        return pa.table({
            "vertex": pa.array(np.arange(len(self.values), dtype=np.int64)),
            value_name: pa.array(self.values),
        })


def grouped_sum_exchange(ds: "ray.data.Dataset", key: str, val: str,
                         num_buckets: int = 64,
                         int_val: bool = False) -> "ray.data.Dataset":
    """Distributed per-key float sum over MOSTLY-DISTINCT int keys as one
    ``groupby(bucket).map_groups`` sort-exchange with the per-key reduce
    vectorized inside each bucket (lexsort + reduceat). NOT the native
    ``groupby(key).aggregate(Sum)``: with high-cardinality keys its
    per-key reduce measured 96× slower (68.0 s vs 0.71 s at 8M partial
    rows / 1M distinct keys, 16 cpus; first seen as 40.8 s vs 3.1 s in
    the ``bigv.discover_hubs`` rewrite, r5) — per superstep, that gap
    IS the iteration time in the huge-V shuffle-combine regime. Output:
    one ``(key, s)`` row per distinct key in ascending-key order per
    bucket (deterministic); ``int_val=True`` keeps exact int64 sums
    (order-free), default float64."""
    vt = pa.int64() if int_val else pa.float64()
    out_sch = pa.schema([(key, pa.int64()), ("s", vt)])

    def tag(t: pa.Table) -> pa.Table:
        sch = pa.schema([(key, pa.int64()), (val, vt),
                         ("bucket", pa.int64())])
        if len(t) == 0 or key not in t.column_names:
            return sch.empty_table()
        k = t[key].to_numpy(zero_copy_only=False)
        return pa.table({key: pc.cast(t[key], pa.int64()),
                         val: pc.cast(t[val], vt),
                         "bucket": pa.array(k % num_buckets)}).cast(sch)

    def reduce_bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0 or key not in t.column_names:
            return out_sch.empty_table()
        k = t[key].to_numpy(zero_copy_only=False)
        v = t[val].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        starts = np.concatenate([[0], np.nonzero(k[1:] != k[:-1])[0] + 1])
        return pa.table({key: pa.array(k[starts], pa.int64()),
                         "s": pa.array(np.add.reduceat(v, starts), vt)
                         }).cast(out_sch)

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(reduce_bucket,
                                      batch_format="pyarrow")


def grouped_sum2_exchange(ds: "ray.data.Dataset", key_a: str, key_b: str,
                          val: str, int_val: bool = True,
                          num_buckets: int = 64) -> "ray.data.Dataset":
    """Composite-key sibling of ``grouped_sum_exchange``: per-(key_a,
    key_b) sum via the bucketed sort-exchange (bucket on ``key_a`` so
    all of a key_a's rows co-locate — the argmax-per-dst consumers rely
    on that). ``int_val=True`` keeps exact int64 sums (order-free);
    False sums float64. Same measured reason as the single-key form."""
    vt = pa.int64() if int_val else pa.float64()
    out_sch = pa.schema([(key_a, pa.int64()), (key_b, pa.int64()),
                         (val, vt)])

    def tag(t: pa.Table) -> pa.Table:
        sch = pa.schema([(key_a, pa.int64()), (key_b, pa.int64()),
                         (val, vt), ("bucket", pa.int64())])
        if len(t) == 0 or key_a not in t.column_names:
            return sch.empty_table()
        ka = t[key_a].to_numpy(zero_copy_only=False)
        return pa.table({key_a: pc.cast(t[key_a], pa.int64()),
                         key_b: pc.cast(t[key_b], pa.int64()),
                         val: pc.cast(t[val], vt),
                         "bucket": pa.array(ka % num_buckets)}).cast(sch)

    def reduce_bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0 or key_a not in t.column_names:
            return out_sch.empty_table()
        a = t[key_a].to_numpy(zero_copy_only=False)
        b = t[key_b].to_numpy(zero_copy_only=False)
        v = t[val].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b, v = a[order], b[order], v[order]
        starts = np.concatenate(
            [[0], np.nonzero((a[1:] != a[:-1]) | (b[1:] != b[:-1]))[0] + 1])
        return pa.table({key_a: pa.array(a[starts], pa.int64()),
                         key_b: pa.array(b[starts], pa.int64()),
                         val: pa.array(np.add.reduceat(v, starts), vt)
                         }).cast(out_sch)

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(reduce_bucket,
                                      batch_format="pyarrow")


def grouped_min_exchange(ds: "ray.data.Dataset", key: str, val: str,
                         num_buckets: int = 64) -> "ray.data.Dataset":
    """Integer sibling of ``grouped_sum_exchange``: per-key int64 MIN via
    the same bucketed sort-exchange (exact and order-independent — min
    has no float summation-order caveat). The huge-V shuffle-combine
    path of the min-label loops (components / BFS / SSSP) uses this
    instead of the native per-key aggregate for the same measured
    reason. Output: one ``(key, m)`` row per distinct key."""
    out_sch = pa.schema([(key, pa.int64()), ("m", pa.int64())])

    def tag(t: pa.Table) -> pa.Table:
        sch = pa.schema([(key, pa.int64()), (val, pa.int64()),
                         ("bucket", pa.int64())])
        if len(t) == 0 or key not in t.column_names:
            return sch.empty_table()
        k = t[key].to_numpy(zero_copy_only=False)
        return pa.table({key: pc.cast(t[key], pa.int64()),
                         val: pc.cast(t[val], pa.int64()),
                         "bucket": pa.array(k % num_buckets)}).cast(sch)

    def reduce_bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0 or key not in t.column_names:
            return out_sch.empty_table()
        k = t[key].to_numpy(zero_copy_only=False)
        v = t[val].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        starts = np.concatenate([[0], np.nonzero(k[1:] != k[:-1])[0] + 1])
        return pa.table({key: pa.array(k[starts], pa.int64()),
                         "m": pa.array(np.minimum.reduceat(v, starts),
                                       pa.int64())}).cast(out_sch)

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(reduce_bucket,
                                      batch_format="pyarrow")


def _grouped_sum_to_dense(ds: "ray.data.Dataset", num_vertices: int,
                          key: str = "dst", val: str = "partial",
                          combine: str = "auto") -> np.ndarray:
    """Per-batch partials → dense float64 vector.

    ``combine="driver"`` (default): stream the already-per-batch-aggregated
    partials to the driver and ``np.add.at`` them — one pipeline stage, no
    shuffle; right whenever the vertex-state vector fits driver memory (the
    same regime in which the broadcast of that vector is valid at all).
    ``combine="shuffle"``: distributed per-key sum via the bucketed
    sort-exchange (``grouped_sum_exchange``) — the 100-TB path when
    per-batch partials are too numerous to stream to one node.
    """
    out = np.zeros(num_vertices, dtype=np.float64)
    if combine == "shuffle":
        agg = grouped_sum_exchange(ds, key, val)
        for b in agg.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            out[b[key].to_numpy(zero_copy_only=False)] = \
                b["s"].to_numpy(zero_copy_only=False)
    else:
        # batch_size=None: stream whole blocks zero-copy, no re-batching
        for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
            np.add.at(out, b[key].to_numpy(zero_copy_only=False),
                      b[val].to_numpy(zero_copy_only=False))
    return out


def _merge_partials(batch: pa.Table) -> pa.Table:
    """Tree-combine stage: merge several blocks' (dst, partial) rows into one
    aggregated table — parallel pre-reduction so the driver-side final
    combine touches far fewer rows on dense graphs."""
    d = batch["dst"].to_numpy(zero_copy_only=False)
    p = batch["partial"].to_numpy(zero_copy_only=False)
    order = np.argsort(d, kind="stable")
    d, p = d[order], p[order]
    starts = np.concatenate([[0], np.nonzero(d[1:] != d[:-1])[0] + 1])
    return pa.table({"dst": pa.array(d[starts], pa.int64()),
                     "partial": pa.array(np.add.reduceat(p, starts))})


def _contrib_fn(ranks_ref, outw_ref, num_vertices: int):
    def contrib(batch: pa.Table) -> pa.Table:
        ranks = ray.get(ranks_ref)
        outw = ray.get(outw_ref)
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        w = batch["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
        c = ranks[src] * w / outw[src]
        if num_vertices <= 4 * len(dst):
            # dense O(n + V) combine beats the O(n log n) sort-based unique
            dense = np.bincount(dst, weights=c, minlength=num_vertices)
            nz = dense.nonzero()[0]
            return pa.table({"dst": pa.array(nz, pa.int64()),
                             "partial": pa.array(dense[nz], pa.float64())})
        uniq, inv = np.unique(dst, return_inverse=True)
        sums = np.bincount(inv, weights=c)
        return pa.table({"dst": pa.array(uniq, pa.int64()),
                         "partial": pa.array(sums, pa.float64())})
    return contrib


def pagerank(graph: Graph, damping: float = 0.85, tol: float = 1e-6,
             max_iters: int = 100, workdir: str | None = None,
             resume: bool = False, combine: str = "auto",
             tree_combine: int | None = None,
             restart: "np.ndarray | None" = None) -> IterativeResult:
    """Weighted PageRank: ``r(v) = (1-d)/V + d * (Σ_{u→v} r(u)·w/outw(u)
    + dangling_mass/V)``; ranks sum to 1.

    ``restart``: optional personalization distribution p (dense float64
    summing to 1) — teleport AND dangling mass then land on p instead of
    the uniform vector (personalized PageRank); initial ranks = p. The
    default uniform path keeps its original arithmetic so existing
    bit-parity results are unchanged ((1-d)/V is not bit-equal to
    (1-d)·(1/V))."""
    V = graph.num_vertices
    combine = resolve_combine(combine, V)
    outw = graph.out_weights()
    dangling = outw == 0.0
    outw_safe = np.where(dangling, 1.0, outw)

    # Tiny graphs: the streaming executor's per-iteration launch cost
    # (~0.2 s) dwarfs the arithmetic (round-3 verdict #7). Below the gate
    # the SAME update runs on a locally-held edge array — identical
    # formula/deltas/tol/checkpoint logic, only the gather differs (float
    # summation order shifts at the last ulp, the noise block layout
    # already introduces; every consumer rounds to 8 dp).
    local = None
    n_edges = graph.edges.count()
    if n_edges <= _LOCAL_PR_MAX_EDGES:
        from cuttana_ray.util import local_table
        t = local_table(graph.edges)
        if t is not None:
            local = (t["src"].to_numpy(zero_copy_only=False),
                     t["dst"].to_numpy(zero_copy_only=False),
                     t["weight"].to_numpy(zero_copy_only=False)
                     .astype(np.float64))
    outw_ref = ray.put(outw_safe) if local is None else None

    start_iter = 0
    if restart is not None:
        restart = np.asarray(restart, dtype=np.float64)
        ranks = restart.copy()
    else:
        ranks = np.full(V, 1.0 / V, dtype=np.float64)
    if resume and workdir:
        loaded = ckpt.load_latest_iteration(workdir, "pagerank")
        if loaded is not None:
            start_iter, ranks, _ = loaded
            start_iter += 1

    res = IterativeResult(ranks, 0, False)
    for it in range(start_iter, max_iters):
        t0 = time.perf_counter()
        if local is not None:
            lsrc, ldst, lw = local
            gathered = np.zeros(V, dtype=np.float64)
            np.add.at(gathered, ldst,
                      ranks[lsrc] * lw / outw_safe[lsrc])
        else:
            ranks_ref = ray.put(ranks)
            contrib_ds = graph.edges.map_batches(
                _contrib_fn(ranks_ref, outw_ref, V),
                batch_format="pyarrow")
            if tree_combine:
                # parallel pre-reduction over ~tree_combine-row batches
                contrib_ds = contrib_ds.map_batches(
                    _merge_partials, batch_format="pyarrow",
                    batch_size=tree_combine)
            gathered = _grouped_sum_to_dense(contrib_ds, V,
                                             combine=combine)
        dangling_mass = float(ranks[dangling].sum())
        if restart is not None:
            new = (1.0 - damping) * restart + \
                damping * (gathered + dangling_mass * restart)
        else:
            new = (1.0 - damping) / V + \
                damping * (gathered + dangling_mass / V)
        delta = float(np.abs(new - ranks).sum())
        ranks = new
        dt = time.perf_counter() - t0
        res.deltas.append(delta)
        res.seconds_per_iter.append(dt)
        if workdir:
            ckpt.save_iteration(workdir, "pagerank", it, ranks,
                                {"delta": delta, "seconds": dt,
                                 "damping": damping, "tol": tol})
        if delta < tol:
            res.iterations = it + 1
            res.converged = True
            break
    else:
        res.iterations = max_iters
    res.values = ranks
    return res
