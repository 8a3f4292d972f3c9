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
Beyond the gate (or with ``mode="join"``) the wedge/closing-edge
hash-join formulation runs instead (``_peel_join``): triangles
materialize once as u < v < w through two hash joins, melt into their 3
member edges, one groupby sums per-edge support, and a left join drops
under-supported edges — no broadcast CSR and no O(E) driver vector at
any point. Confluence makes the two paths return identical edges
(parity pytest in tests/test_motifs.py).
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


def _support_join(canon: "ray.data.Dataset",
                  npart: int) -> "ray.data.Dataset | None":
    """Per-edge triangle support of a canonical (u < v) edge Dataset by
    hash joins only — the scale path (no broadcast CSR, no O(E) driver
    vector). Triangles materialize exactly once as u < v < w through the
    wedge join (a<b) ⋈_b (b<c) closed by the (a, c) edge join — the
    ``triangles._triangles_join`` shape with id ordering (canonical
    edges are id-oriented already); each triangle then melts into its 3
    member edges and one pre-combined groupby sums the support. Returns
    ``(u, v, support)`` rows for edges with support ≥ 1, or None when the
    edge set closes no triangle."""
    from ray.data.aggregate import Sum

    from cuttana_ray.util import safe_join

    wedges = safe_join(
        canon.rename_columns({"u": "a", "v": "b"}),
        canon.rename_columns({"u": "b2", "v": "c"}),
        join_type="inner", num_partitions=npart,
        on=("b",), right_on=("b2",)).materialize()
    if wedges.count() == 0:
        return None
    tri = safe_join(
        wedges, canon.rename_columns({"u": "ta", "v": "tc"}),
        join_type="inner", num_partitions=npart,
        on=("a", "c"), right_on=("ta", "tc"))

    def melt(t: pa.Table) -> pa.Table:
        sch = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                         ("n", pa.int64())])
        if len(t) == 0 or "a" not in t.column_names:
            return sch.empty_table()
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        uu = np.concatenate([a, b, a])
        vv = np.concatenate([b, c, c])
        # pre-combine within the batch before the exchange
        order = np.lexsort((vv, uu))
        uu, vv = uu[order], vv[order]
        starts = np.concatenate(
            [[0], np.nonzero((uu[1:] != uu[:-1]) |
                             (vv[1:] != vv[:-1]))[0] + 1])
        cnt = np.diff(np.concatenate([starts, [len(uu)]]))
        return pa.table({"u": pa.array(uu[starts], pa.int64()),
                         "v": pa.array(vv[starts], pa.int64()),
                         "n": pa.array(cnt.astype(np.int64))}).cast(sch)

    from cuttana_ray.pipelines.pagerank import grouped_sum2_exchange
    # bucketed sort-exchange, not the native per-key aggregate — ~96x at
    # E-cardinality (u, v) keys; int support counts are order-exact
    return grouped_sum2_exchange(
        tri.map_batches(melt, batch_format="pyarrow"),
        "u", "v", "n", int_val=True) \
        .rename_columns({"n": "support"})


def _canon_dataset(graph: Graph) -> "ray.data.Dataset":
    """Each undirected edge once as (u < v) rows — Dataset form."""
    def canon_batch(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        keep = s < d
        return pa.table({"u": pa.array(s[keep], pa.int64()),
                         "v": pa.array(d[keep], pa.int64())})

    return graph.edges.map_batches(
        canon_batch, batch_format="pyarrow").materialize()


def _peel_join(canon: "ray.data.Dataset", k: int, max_rounds: int):
    """Peel a canonical (u < v) edge Dataset to its k-truss with joins
    only — the regime past ``BROADCAST_MAX_EDGES``. Per round: one
    ``_support_join`` (2 hash joins + 1 groupby) and one left join to
    drop under-supported edges; the driver sees only the per-round edge
    count. Returns ``(survivors_ds_with_support, n_alive, rounds,
    converged, deltas, secs)``; confluent peeling ⇒ identical survivors
    to the broadcast path."""
    import pyarrow.compute as pc

    from cuttana_ray.util import drop_empty_blocks, pool_size, safe_join

    n_alive = canon.count()
    deltas: list = []
    secs: list = []
    survivors = None
    for it in range(max_rounds):
        t0 = time.perf_counter()
        if n_alive == 0:
            return None, 0, it + 1, True, deltas, secs
        npart = max(1, min(pool_size()[1], n_alive // 65536 + 1))
        sup = _support_join(canon, npart)
        if sup is None:
            deltas.append(float(n_alive))
            secs.append(time.perf_counter() - t0)
            return None, 0, it + 1, True, deltas, secs
        joined = safe_join(
            canon, sup.rename_columns({"u": "_su", "v": "_sv"}),
            join_type="left_outer", num_partitions=npart,
            on=("u", "v"), right_on=("_su", "_sv"))

        def keep_fn(t: pa.Table, _k=k) -> pa.Table:
            sch = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                             ("support", pa.int64())])
            if len(t) == 0 or "u" not in t.column_names:
                return sch.empty_table()
            s = pc.fill_null(pc.cast(t["support"], pa.int64()), 0) \
                .to_numpy(zero_copy_only=False)
            m = pa.array(s >= _k - 2)
            return pa.table({
                "u": pc.cast(t["u"], pa.int64()).filter(m),
                "v": pc.cast(t["v"], pa.int64()).filter(m),
                "support": pa.array(s[s >= _k - 2])}).cast(sch)

        survivors = drop_empty_blocks(
            joined.map_batches(keep_fn, batch_format="pyarrow"))
        n_new = survivors.count()
        dropped = n_alive - n_new
        deltas.append(float(dropped))
        secs.append(time.perf_counter() - t0)
        if dropped == 0:
            return survivors, n_new, it + 1, True, deltas, secs
        canon = survivors.select_columns(["u", "v"]).materialize()
        n_alive = n_new
    return survivors, n_alive, max_rounds, False, deltas, secs


def _ktruss_join(graph: Graph, k: int, max_rounds: int) -> TrussResult:
    """Join-formulation k-truss (scale path; see ``_peel_join``). The
    surviving edge table is collected to the driver only because
    ``TrussResult.edges`` is a pa.Table by contract — the truss is the
    cohesive core, orders of magnitude smaller than the input graph."""
    empty = pa.table({"u": pa.array([], pa.int64()),
                      "v": pa.array([], pa.int64()),
                      "support": pa.array([], pa.int64())})
    survivors, n, rounds, converged, deltas, secs = _peel_join(
        _canon_dataset(graph), k, max_rounds)
    res = TrussResult(empty, rounds, converged, deltas, secs)
    if survivors is not None and n:
        t = pa.concat_tables(
            [b for b in ray.get(survivors.to_arrow_refs())
             if len(b) and b.num_columns])
        order = np.lexsort((t["v"].to_numpy(zero_copy_only=False),
                            t["u"].to_numpy(zero_copy_only=False)))
        res.edges = t.take(pa.array(order))
    return res


def _trussness_join(graph: Graph, max_k: int, max_rounds: int) -> pa.Table:
    """Join-formulation trussness: chained ``_peel_join`` levels ((k+1)-
    truss ⊆ k-truss, so each level starts from the previous survivors),
    every level's survivor set tagged k, one final groupby(Max) over the
    union. No O(E) driver state during the peel; the final (u, v,
    trussness) table is the output contract."""
    from ray.data.aggregate import Max

    empty = pa.table({"u": pa.array([], pa.int64()),
                      "v": pa.array([], pa.int64()),
                      "trussness": pa.array([], pa.int64())})
    canon = _canon_dataset(graph)
    if canon.count() == 0:
        return empty

    def tag(k: int):
        def fn(t: pa.Table) -> pa.Table:
            sch = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                             ("trussness", pa.int64())])
            if len(t) == 0 or "u" not in t.column_names:
                return sch.empty_table()
            return pa.table({
                "u": t["u"], "v": t["v"],
                "trussness": pa.array(np.full(len(t), k, np.int64))
            }).cast(sch)
        return fn

    tagged = [canon.map_batches(tag(2), batch_format="pyarrow")]
    cur = canon
    for k in range(3, max_k + 1):
        survivors, n, _, _, _, _ = _peel_join(cur, k, max_rounds)
        if survivors is None or n == 0:
            break
        cur = survivors.select_columns(["u", "v"]).materialize()
        tagged.append(cur.map_batches(tag(k), batch_format="pyarrow"))
    uni = tagged[0]
    for t in tagged[1:]:
        uni = uni.union(t)
    out = uni.groupby(["u", "v"]).aggregate(
        Max("trussness", alias_name="trussness"))
    tabs = [b for b in ray.get(out.to_arrow_refs())
            if len(b) and b.num_columns]
    if not tabs:
        return empty
    t = pa.concat_tables(tabs)
    order = np.lexsort((t["v"].to_numpy(zero_copy_only=False),
                        t["u"].to_numpy(zero_copy_only=False)))
    return t.select(["u", "v", "trussness"]).take(pa.array(order))


def trussness(graph: Graph, max_k: int = 64,
              max_rounds: int = 500, mode: str = "auto") -> pa.Table:
    """Truss number per canonical edge: the largest k with the edge inside
    the k-truss (every edge is trivially in the 2-truss). Successive peels
    reuse the previous level's survivors ((k+1)-truss ⊆ k-truss, exactly
    how ``kcore.coreness`` chains peels), so total work is ONE peel
    sequence over the shared broadcast CSR, not ``max_k`` independent
    runs. Output: ``(u, v, trussness)``, one row per canonical edge.
    ``mode`` routes like ``ktruss``: broadcast below the gate,
    ``_trussness_join`` above (or forced)."""
    if mode == "join":
        return _trussness_join(graph, max_k, max_rounds)
    u, v = _canonical_edges(graph)
    E = len(u)
    V = graph.num_vertices
    if 2 * E > BROADCAST_MAX_EDGES:
        if mode == "broadcast":
            raise NotImplementedError(
                f"trussness broadcast regime is gated at "
                f"{BROADCAST_MAX_EDGES} symmetrized edges (got {2 * E}); "
                "use mode='join'")
        return _trussness_join(graph, max_k, max_rounds)
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


def ktruss(graph: Graph, k: int, max_rounds: int = 500,
           mode: str = "auto") -> TrussResult:
    """Exact k-truss (k ≥ 3) of the symmetrized link graph.

    ``mode``: "auto" routes on the ``BROADCAST_MAX_EDGES`` gate —
    broadcast-CSR below (one shipped CSR, O(E) driver vectors), the
    ``_peel_join`` hash-join formulation above (no O(E) driver state);
    "broadcast" / "join" force a path (parity pytest keeps them equal)."""
    if k < 3:
        raise ValueError(f"ktruss requires k >= 3, got {k}")
    if mode == "join":
        return _ktruss_join(graph, k, max_rounds)
    u, v = _canonical_edges(graph)
    E = len(u)
    V = graph.num_vertices
    if 2 * E > BROADCAST_MAX_EDGES:
        if mode == "broadcast":
            raise NotImplementedError(
                f"ktruss broadcast regime is gated at {BROADCAST_MAX_EDGES} "
                f"symmetrized edges (got {2 * E}); use mode='join'")
        return _ktruss_join(graph, k, max_rounds)
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
