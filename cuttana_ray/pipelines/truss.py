"""k-truss decomposition by iterative edge peeling over the link graph.

The k-truss is the maximal subgraph in which every edge participates in at
least ``k - 2`` triangles *within the subgraph* (Cohen, "Trusses: cohesive
subgraphs for social network analysis", 2008). Peeling: compute per-edge
triangle support, drop edges below the threshold, recompute on the
survivors, repeat to a fixpoint. Like k-core peeling the fixpoint is
confluent — removal order never changes the surviving edge set — so the
result is exact and layout/cluster-size invariant.

Execution shape mirrors ``triangles.py``'s broadcast regime (gated by
``BROADCAST_MAX_EDGES``): the symmetrized adjacency CSR plus a per-slot
canonical-edge-id map ship ONCE via ``ray.put``; each peel round streams
the still-alive canonical edges through ``map_batches``, intersecting both
endpoints' alive-filtered neighbor runs in one vectorized searchsorted
pass, and only the O(#alive-edges) support vector returns to the driver.
The alive mask (1 bit per canonical edge) is re-broadcast per round.
Beyond the gate the right formulation is the wedge/closing-edge hash-join
of ``triangles._triangles_join`` with the alive mask joined in — the
support counts there are per-edge already; not implemented here because
every in-repo graph sits far below the gate (documented, loud error).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data

from cuttana_ray.pipelines.graph import Graph
from cuttana_ray.pipelines.triangles import BROADCAST_MAX_EDGES, _run_offsets


@dataclass
class TrussResult:
    """Surviving canonical edges (u < v) of the k-truss with their final
    support (triangle count inside the truss)."""

    edges: pa.Table               # u:int64, v:int64, support:int64
    rounds: int
    converged: bool
    deltas: list = field(default_factory=list)        # edges dropped/round
    seconds_per_iter: list = field(default_factory=list)


def _canonical_edges(graph: Graph) -> tuple[np.ndarray, np.ndarray]:
    """Each undirected edge once as (u < v), sorted by (u, v); the edge's
    index in the returned arrays is its canonical edge id."""
    def canon(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        keep = s < d
        return pa.table({"u": pa.array(s[keep], pa.int64()),
                         "v": pa.array(d[keep], pa.int64())})

    tabs = [t for t in ray.get(
        graph.edges.map_batches(canon, batch_format="pyarrow")
        .to_arrow_refs()) if len(t)]
    if not tabs:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    u = np.concatenate([t["u"].to_numpy(zero_copy_only=False) for t in tabs])
    v = np.concatenate([t["v"].to_numpy(zero_copy_only=False) for t in tabs])
    order = np.lexsort((v, u))
    return u[order], v[order]


def _support_fn(csr_ref, alive_ref, V: int):
    """Per-batch vectorized support counting: for each alive canonical edge
    (u, v), count common neighbors w reachable through two still-alive
    edges. Both endpoints' neighbor runs are alive-masked (masking a sorted
    run keeps it sorted, so the tagged-key searchsorted intersection of
    ``triangles._intersect_counts`` still applies verbatim)."""
    def fn(batch: pa.Table) -> pa.Table:
        ip, ix, slot_eid = ray.get(csr_ref)
        alive = ray.get(alive_ref)
        eid = batch["eid"].to_numpy(zero_copy_only=False)
        live = alive[eid]
        s = batch["u"].to_numpy(zero_copy_only=False)[live]
        d = batch["v"].to_numpy(zero_copy_only=False)[live]
        eid = eid[live]
        empty = pa.table({"eid": pa.array([], pa.int64()),
                          "support": pa.array([], pa.int64())})
        if len(s) == 0:
            return empty

        def masked_keys(ends: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            n = (ip[ends + 1] - ip[ends]).astype(np.int64)
            gather = np.repeat(ip[ends], n) + _run_offsets(n)
            keep = alive[slot_eid[gather]]
            idx = np.repeat(np.arange(len(ends), dtype=np.int64), n)[keep]
            return idx * V + ix[gather[keep]], idx

        keys_u, _ = masked_keys(s)
        keys_v, _ = masked_keys(d)
        if len(keys_u) == 0 or len(keys_v) == 0:
            return empty
        pos = np.searchsorted(keys_u, keys_v)
        pos[pos == len(keys_u)] = len(keys_u) - 1
        hits = keys_v[keys_u[pos] == keys_v]
        sup = np.bincount(hits // V, minlength=len(s)).astype(np.int64)
        return pa.table({"eid": pa.array(eid, pa.int64()),
                         "support": pa.array(sup)})
    return fn


def trussness(graph: Graph, max_k: int = 64,
              max_rounds: int = 500) -> pa.Table:
    """Truss number per canonical edge: the largest k with the edge inside
    the k-truss (every edge is trivially in the 2-truss). Successive peels
    reuse the previous level's survivors ((k+1)-truss ⊆ k-truss, exactly
    how ``kcore.coreness`` chains peels), so total work is ONE peel
    sequence over the shared broadcast CSR, not ``max_k`` independent
    runs. Output: ``(u, v, trussness)``, one row per canonical edge."""
    u, v = _canonical_edges(graph)
    E = len(u)
    V = graph.num_vertices
    if 2 * E > BROADCAST_MAX_EDGES:
        raise NotImplementedError(
            f"trussness broadcast regime is gated at {BROADCAST_MAX_EDGES} "
            f"symmetrized edges (got {2 * E})")
    out = np.full(E, 2, dtype=np.int64)
    if E == 0:
        return pa.table({"u": pa.array([], pa.int64()),
                         "v": pa.array([], pa.int64()),
                         "trussness": pa.array([], pa.int64())})
    eid = np.arange(E, dtype=np.int64)
    ss, tt = np.concatenate([u, v]), np.concatenate([v, u])
    ee = np.concatenate([eid, eid])
    order = np.lexsort((tt, ss))
    ss, tt, ee = ss[order], tt[order], ee[order]
    indptr = np.zeros(V + 1, dtype=np.int64)
    np.add.at(indptr, ss + 1, 1)
    np.cumsum(indptr, out=indptr)
    csr_ref = ray.put((indptr, tt, ee))
    ds = ray.data.from_arrow(pa.table({
        "u": pa.array(u), "v": pa.array(v),
        "eid": pa.array(eid)})).materialize()

    alive = np.ones(E, dtype=bool)
    support = np.zeros(E, dtype=np.int64)
    for k in range(3, max_k + 1):
        if not alive.any():
            break
        for _ in range(max_rounds):
            alive_ref = ray.put(alive)
            support[:] = 0
            part = ds.map_batches(_support_fn(csr_ref, alive_ref, V),
                                  batch_format="pyarrow", batch_size=65536)
            for b in part.iter_batches(batch_size=None,
                                       batch_format="pyarrow"):
                support[b["eid"].to_numpy(zero_copy_only=False)] = \
                    b["support"].to_numpy(zero_copy_only=False)
            new_alive = alive & (support >= k - 2)
            if (alive == new_alive).all():
                break
            alive = new_alive
        out[alive] = k          # survivors of level k are in the k-truss
    return pa.table({"u": pa.array(u, pa.int64()),
                     "v": pa.array(v, pa.int64()),
                     "trussness": pa.array(out, pa.int64())})


def ktruss(graph: Graph, k: int, max_rounds: int = 500) -> TrussResult:
    """Exact k-truss (k ≥ 3) of the symmetrized link graph."""
    if k < 3:
        raise ValueError(f"ktruss requires k >= 3, got {k}")
    u, v = _canonical_edges(graph)
    E = len(u)
    V = graph.num_vertices
    if 2 * E > BROADCAST_MAX_EDGES:
        raise NotImplementedError(
            f"ktruss broadcast regime is gated at {BROADCAST_MAX_EDGES} "
            f"symmetrized edges (got {2 * E}); the join formulation "
            "(module docstring) is the scale path")
    empty = pa.table({"u": pa.array([], pa.int64()),
                      "v": pa.array([], pa.int64()),
                      "support": pa.array([], pa.int64())})
    if E == 0:
        return TrussResult(empty, 0, True)

    # symmetrized CSR with per-slot canonical edge ids, shipped once
    eid = np.arange(E, dtype=np.int64)
    ss = np.concatenate([u, v])
    tt = np.concatenate([v, u])
    ee = np.concatenate([eid, eid])
    order = np.lexsort((tt, ss))
    ss, tt, ee = ss[order], tt[order], ee[order]
    indptr = np.zeros(V + 1, dtype=np.int64)
    np.add.at(indptr, ss + 1, 1)
    np.cumsum(indptr, out=indptr)
    csr_ref = ray.put((indptr, tt, ee))

    ds = ray.data.from_arrow(pa.table({
        "u": pa.array(u), "v": pa.array(v),
        "eid": pa.array(eid)})).materialize()

    alive = np.ones(E, dtype=bool)
    support = np.zeros(E, dtype=np.int64)
    res = TrussResult(empty, 0, False)
    for it in range(max_rounds):
        t0 = time.perf_counter()
        alive_ref = ray.put(alive)
        support[:] = 0
        part = ds.map_batches(_support_fn(csr_ref, alive_ref, V),
                              batch_format="pyarrow", batch_size=65536)
        for b in part.iter_batches(batch_size=None, batch_format="pyarrow"):
            support[b["eid"].to_numpy(zero_copy_only=False)] = \
                b["support"].to_numpy(zero_copy_only=False)
        new_alive = alive & (support >= k - 2)
        dropped = int((alive & ~new_alive).sum())
        alive = new_alive
        res.deltas.append(float(dropped))
        res.seconds_per_iter.append(time.perf_counter() - t0)
        if dropped == 0:
            res.rounds = it + 1
            res.converged = True
            break
    else:
        res.rounds = max_rounds
    res.edges = pa.table({
        "u": pa.array(u[alive], pa.int64()),
        "v": pa.array(v[alive], pa.int64()),
        "support": pa.array(support[alive], pa.int64()),
    })
    return res
