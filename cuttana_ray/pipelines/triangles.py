"""Triangle counting (north-star algorithm #4; exact).

Degree orientation: orient every undirected edge from the endpoint with
smaller ``(degree, id)`` to the larger; each triangle then has exactly one
orientation ``u→v, u→w, v→w``, so counting closing edges over wedges counts
each triangle once, and the orientation bounds every out-neighborhood by
O(sqrt(E)) on skewed graphs (the hub-taming trick).

Two execution paths behind one ``triangle_count`` (mode="auto" gates on the
oriented edge count, ``BROADCAST_MAX_EDGES``):

* **broadcast** (small/medium graphs): the oriented CSR (≈|E_und| int64
  entries) is built once and shipped via ``ray.put``; a ``map_batches``
  stage intersects per-edge neighbor slices FULLY VECTORIZED — neighbor
  runs are tagged with their edge index and intersected with one
  ``searchsorted`` membership pass per batch (no per-edge Python loop).
* **join** (beyond the broadcast gate): wedges and closing edges are
  distributed hash joins (``Dataset.join``) — no driver materialization of
  the edge table, no whole-graph broadcast; wedge volume is bounded by
  E^1.5 via the orientation. This is the 100-TB shape.

Both paths share the distributed orientation stage (per-batch filter with a
broadcast O(V) degree vector computed from per-batch partials).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray
import ray.data

from cuttana_ray.pipelines.graph import Graph
from cuttana_ray.util import pool_size, safe_join

# 32M oriented edges ≈ 512 MB of (indptr, indices) — comfortable as one
# broadcast object; beyond this the join path avoids any driver/global copy
BROADCAST_MAX_EDGES = 32_000_000


@dataclass
class TriangleResult:
    per_vertex: np.ndarray
    total: int


def oriented_edges(graph: Graph) -> "ray.data.Dataset":
    """Each undirected edge once, oriented by ``(degree, id)``: keeps
    symmetrized rows where ``(deg[src], src) < (deg[dst], dst)``."""
    deg = graph.degrees()
    deg_ref = ray.put(deg)

    def orient(batch: pa.Table) -> pa.Table:
        d = ray.get(deg_ref)
        s = batch["src"].to_numpy(zero_copy_only=False)
        t = batch["dst"].to_numpy(zero_copy_only=False)
        keep = (d[s] < d[t]) | ((d[s] == d[t]) & (s < t))
        return pa.table({"u": pa.array(s[keep], pa.int64()),
                         "v": pa.array(t[keep], pa.int64())})

    return graph.edges.map_batches(orient, batch_format="pyarrow")


def _intersect_counts(ip: np.ndarray, ix: np.ndarray, src: np.ndarray,
                      dst: np.ndarray, V: int) -> np.ndarray:
    """Vectorized per-edge oriented-neighborhood intersection.

    Neighbor runs of both endpoints are tagged with their edge index
    (key = i·V + neighbor, sorted by construction since runs are sorted),
    so ONE searchsorted membership pass intersects every edge's pair of
    runs at once. Returns dense per-vertex partial triangle counts."""
    local = np.zeros(V, dtype=np.int64)
    if len(src) == 0:
        return local
    nu = (ip[src + 1] - ip[src]).astype(np.int64)
    nv = (ip[dst + 1] - ip[dst]).astype(np.int64)
    eidx_u = np.repeat(np.arange(len(src), dtype=np.int64), nu)
    eidx_v = np.repeat(np.arange(len(src), dtype=np.int64), nv)
    # gather neighbor runs: ranges ip[u]..ip[u+1] flattened
    gather_u = np.repeat(ip[src], nu) + _run_offsets(nu)
    gather_v = np.repeat(ip[dst], nv) + _run_offsets(nv)
    keys_u = eidx_u * V + ix[gather_u]
    keys_v = eidx_v * V + ix[gather_v]
    if len(keys_u) == 0 or len(keys_v) == 0:
        return local
    pos = np.searchsorted(keys_u, keys_v)
    pos[pos == len(keys_u)] = len(keys_u) - 1
    member = keys_u[pos] == keys_v
    hits = keys_v[member]
    if len(hits) == 0:
        return local
    w = hits % V                      # the closing third vertex
    i = hits // V                     # which (u,v) edge produced it
    per_edge = np.bincount(i, minlength=len(src)).astype(np.int64)
    np.add.at(local, w, 1)
    np.add.at(local, src, per_edge)
    np.add.at(local, dst, per_edge)
    return local


def _run_offsets(lengths: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... concatenated (vectorized ranges):
    global index minus its run's start."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
    return np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)


def _triangles_broadcast(o: "ray.data.Dataset", V: int) -> np.ndarray:
    """Oriented CSR shipped once via ray.put; vectorized intersection per
    batch. The driver-side CSR build is explicitly gated by
    BROADCAST_MAX_EDGES (callers beyond it take the join path)."""
    tabs = [t for t in ray.get(o.to_arrow_refs()) if len(t)]
    src = np.concatenate([t["u"].to_numpy(zero_copy_only=False)
                          for t in tabs])
    dst = np.concatenate([t["v"].to_numpy(zero_copy_only=False)
                          for t in tabs])
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    indptr = np.zeros(V + 1, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    np.cumsum(indptr, out=indptr)
    csr_ref = ray.put((indptr, dst))

    ds = ray.data.from_arrow(pa.table({"src": pa.array(src),
                                       "dst": pa.array(dst)}))

    def count_batch(batch: pa.Table) -> pa.Table:
        ip, ix = ray.get(csr_ref)
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        local = _intersect_counts(ip, ix, s, d, V)
        nz = np.nonzero(local)[0]
        return pa.table({"vertex": pa.array(nz, pa.int64()),
                         "partial": pa.array(local[nz], pa.int64())})

    per_vertex = np.zeros(V, dtype=np.int64)
    part = ds.map_batches(count_batch, batch_format="pyarrow",
                          batch_size=65536)
    for b in part.iter_batches(batch_size=None, batch_format="pyarrow"):
        np.add.at(per_vertex, b["vertex"].to_numpy(zero_copy_only=False),
                  b["partial"].to_numpy(zero_copy_only=False))
    return per_vertex


def _triangles_join(o: "ray.data.Dataset", V: int,
                    n_edges: int) -> np.ndarray:
    per_vertex = np.zeros(V, dtype=np.int64)
    # empty hash-join partitions come back schemaless and crash the next
    # join (Ray Data 2.49); keep partitions ≥~64k rows so none is empty
    npart = max(1, min(pool_size()[1], n_edges // 65536 + 1))
    # wedges u→v→w: (u,v) ⋈_{v} (v,w); materialized because a zero-row join
    # result yields schemaless empty blocks the next join can't key on
    wedges = safe_join(o, o.rename_columns({"u": "v2", "v": "w"}),
                    join_type="inner", num_partitions=npart,
                    on=("v",), right_on=("v2",)).materialize()
    if wedges.count() == 0:
        return per_vertex
    # close the triangle: wedge (u,v,w) survives iff u→w is an edge
    tri = safe_join(wedges, o.rename_columns({"u": "cu", "v": "cv"}),
                      join_type="inner", num_partitions=npart,
                      on=("u", "w"), right_on=("cu", "cv"))

    def per_vertex_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"vertex": pa.array([], pa.int64()),
                          "partial": pa.array([], pa.int64())})
        if len(batch) == 0 or "u" not in batch.column_names:
            return empty  # schemaless empty join partition
        ids = np.concatenate([
            batch["u"].to_numpy(zero_copy_only=False),
            batch["v"].to_numpy(zero_copy_only=False),
            batch["w"].to_numpy(zero_copy_only=False)])
        uniq, cnt = np.unique(ids, return_counts=True)
        return pa.table({"vertex": pa.array(uniq, pa.int64()),
                         "partial": pa.array(cnt.astype(np.int64))})

    # driver-combine of per-batch-aggregated partials (≤V rows each) — no
    # extra shuffle; the dense O(V) array is the documented small-V regime
    partial = tri.map_batches(per_vertex_partial, batch_format="pyarrow")
    for b in partial.iter_batches(batch_size=None, batch_format="pyarrow"):
        np.add.at(per_vertex, b["vertex"].to_numpy(zero_copy_only=False),
                  b["partial"].to_numpy(zero_copy_only=False))
    return per_vertex


def triangle_count(graph: Graph, mode: str = "auto") -> TriangleResult:
    """``mode``: "auto" (gate on oriented edge count), "broadcast", "join"."""
    V = graph.num_vertices
    o = oriented_edges(graph).materialize()  # consumed by both paths twice
    n_edges = o.count()
    if n_edges == 0:
        return TriangleResult(np.zeros(V, dtype=np.int64), 0)
    if mode == "auto":
        mode = "broadcast" if n_edges <= BROADCAST_MAX_EDGES else "join"
    if mode == "broadcast":
        per_vertex = _triangles_broadcast(o, V)
    elif mode == "join":
        per_vertex = _triangles_join(o, V, n_edges)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    total = int(per_vertex.sum()) // 3
    return TriangleResult(per_vertex, total)


def square_count(edges: "ray.data.Dataset") -> pa.Table:
    """Exact 4-cycle (square) census over a SYMMETRIC distinct edge table
    ``(src, dst, ...)`` — the next motif up from triangles (the reference
    engine counts no motifs at all; its closest shape is the neighbour-set
    scoring in ``/root/reference/src/core.rs``).

    Identity: every 4-cycle a-b-c-d has exactly two diagonal pairs
    ({a,c}, {b,d}), and a pair (u, w) with codegree c closes C(c, 2)
    cycles, so  squares = Σ_{u<w} C(codeg(u,w), 2) / 2  (the sum is always
    even). Codegrees come from the shared wedge plan
    (``stages/keyblocks._pairs_and_counts``): ONE sort by center vertex,
    per-block vectorized pair expansion pre-combined before the single
    (u, w) exchange — same machinery as item co-occurrence, so wedge
    volume Σ deg² is the inherent cost and hub-heavy graphs want the
    documented upstream hub bucketing (the events graph is hub-light).

    Returns a one-row table ``(squares, codeg_pairs)`` where
    ``codeg_pairs`` is the number of vertex pairs with ≥2 common
    neighbours (the candidate diagonals).
    """
    from cuttana_ray.stages.keyblocks import _pairs_and_counts

    pairs, _ = _pairs_and_counts(
        edges.select_columns(["src", "dst"]), "src", "dst")

    def partial(t: pa.Table) -> pa.Table:
        sch = pa.schema([("s2", pa.int64()), ("p2", pa.int64())])
        if len(t) == 0 or "co" not in t.column_names:
            return sch.empty_table()
        co = t["co"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "s2": pa.array([int((co * (co - 1) // 2).sum())], pa.int64()),
            "p2": pa.array([int((co >= 2).sum())], pa.int64())})

    # O(#blocks) scalar partials — driver combine is a constant-size sum
    agg = pairs.map_batches(partial, batch_format="pyarrow") \
        .sum(["s2", "p2"])
    s2 = int(agg["sum(s2)"] or 0) if agg else 0
    p2 = int(agg["sum(p2)"] or 0) if agg else 0
    return pa.table({"squares": pa.array([s2 // 2], pa.int64()),
                     "codeg_pairs": pa.array([p2], pa.int64())})


def weighted_clustering(graph: Graph) -> pa.Table:
    """Onnela weighted local clustering coefficient (Onnela et al., PRE
    2005; public formula): per vertex

        C_w(v) = 2/(k_v(k_v−1)) · Σ_{triangles ∋ v} (ŵ₁ŵ₂ŵ₃)^{1/3}

    with ŵ = w / max(w) and k = unweighted degree; 0 when k < 2. The
    triangle enumeration is the distributed oriented wedge-join shape of
    ``_triangles_join`` (each triangle materializes once, weights ride
    the joins under distinct column names); per-triangle geometric means
    scatter to all three corners as per-batch partials, combined on the
    driver in the documented small-V dense regime. Returns
    ``(vertex, wclustering)`` rounded to 6 dp."""
    from cuttana_ray.util import drop_empty_blocks

    V = graph.num_vertices
    deg = graph.degrees()
    deg_ref = ray.put(deg)
    wmax_agg = graph.edges.max("weight")
    wmax = float(wmax_agg if wmax_agg is not None else 1.0)

    def orient(batch: pa.Table) -> pa.Table:
        sch = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                         ("w1", pa.float64())])
        if len(batch) == 0 or "src" not in batch.column_names:
            return sch.empty_table()
        d = ray.get(deg_ref)
        s = batch["src"].to_numpy(zero_copy_only=False)
        t = batch["dst"].to_numpy(zero_copy_only=False)
        w = batch["weight"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        keep = (d[s] < d[t]) | ((d[s] == d[t]) & (s < t))
        return pa.table({"u": pa.array(s[keep], pa.int64()),
                         "v": pa.array(t[keep], pa.int64()),
                         "w1": pa.array(w[keep])}).cast(sch)

    o = drop_empty_blocks(
        graph.edges.map_batches(orient, batch_format="pyarrow")) \
        .materialize()
    sums = np.zeros(V, dtype=np.float64)
    n_edges = o.count()
    if n_edges > 0:
        npart = max(1, min(pool_size()[1], n_edges // 65536 + 1))
        wedges = safe_join(
            o, o.rename_columns({"u": "v2", "v": "w", "w1": "w2"}),
            join_type="inner", num_partitions=npart,
            on=("v",), right_on=("v2",)).materialize()
        if wedges.count() > 0:
            tri = safe_join(
                wedges,
                o.rename_columns({"u": "cu", "v": "cv", "w1": "w3"}),
                join_type="inner", num_partitions=npart,
                on=("u", "w"), right_on=("cu", "cv"))

            def partial(batch: pa.Table) -> pa.Table:
                sch = pa.schema([("vertex", pa.int64()),
                                 ("partial", pa.float64())])
                if len(batch) == 0 or "u" not in batch.column_names:
                    return sch.empty_table()
                w1 = batch["w1"].to_numpy(zero_copy_only=False)
                w2 = batch["w2"].to_numpy(zero_copy_only=False)
                w3 = batch["w3"].to_numpy(zero_copy_only=False)
                gm = np.cbrt(w1 * w2 * w3) / wmax
                ids = np.concatenate([
                    batch["u"].to_numpy(zero_copy_only=False),
                    batch["v"].to_numpy(zero_copy_only=False),
                    batch["w"].to_numpy(zero_copy_only=False)])
                uniq, inv = np.unique(ids, return_inverse=True)
                s = np.bincount(inv, weights=np.tile(gm, 3))
                return pa.table({"vertex": pa.array(uniq, pa.int64()),
                                 "partial": pa.array(s)}).cast(sch)

            part = tri.map_batches(partial, batch_format="pyarrow")
            for b in part.iter_batches(batch_size=None,
                                       batch_format="pyarrow"):
                np.add.at(sums,
                          b["vertex"].to_numpy(zero_copy_only=False),
                          b["partial"].to_numpy(zero_copy_only=False))
    denom = deg.astype(np.float64) * (deg - 1).astype(np.float64)
    wc = np.where(deg >= 2, 2.0 * sums / np.maximum(denom, 1.0), 0.0)
    return pa.table({"vertex": pa.array(np.arange(V, dtype=np.int64)),
                     "wclustering": pa.array(np.round(wc, 6))})


def edge_embeddedness(graph: Graph) -> "ray.data.Dataset":
    """Per-edge embeddedness: for every undirected edge (a, b), a < b, the
    number of common neighbors |N(a) ∩ N(b)| — the count of triangles the
    edge participates in (Granovetter's tie-strength proxy). Edges with
    embeddedness 0 are LOCAL BRIDGES (they sit in no triangle; removing
    one raises the endpoints' distance above 2).

    Plan: witness-pair expansion over sorted adjacency lists
    (``pipelines/linkpred._witness_pairs_fn`` — pairs come only from shared
    neighbors, never all pairs), then ONE tagged-union groupby exchange on
    the packed pair key joins pair counts with the edge list itself, so
    edges whose endpoints share nothing still appear (embeddedness 0)
    without a second anti-join pass. Returns (a, b, embeddedness) int64.
    """
    from ray.data.aggregate import Sum

    from cuttana_ray.pipelines.linkpred import _witness_pairs_fn
    from cuttana_ray.stages.edges import build_adjacency

    V = graph.num_vertices
    adj = build_adjacency(graph.edges)
    pairs = adj.map_batches(_witness_pairs_fn(None), batch_format="pyarrow")

    usch = pa.schema([("pk", pa.int64()), ("cn", pa.int64()),
                      ("is_edge", pa.int64())])

    def tag_pairs(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "a" not in t.column_names:
            return usch.empty_table()
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table({"pk": pa.array(a * V + b, pa.int64()),
                         "cn": t["cn"],
                         "is_edge": pa.array(np.zeros(len(t), np.int64))
                         }).cast(usch)

    def tag_edges(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "src" not in t.column_names:
            return usch.empty_table()
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        m = s < d  # canonical direction only (edges are symmetrized)
        z = np.zeros(int(m.sum()), np.int64)
        return pa.table({"pk": pa.array(s[m] * V + d[m], pa.int64()),
                         "cn": pa.array(z),
                         "is_edge": pa.array(z + 1)}).cast(usch)

    agg = pairs.map_batches(tag_pairs, batch_format="pyarrow") \
        .union(graph.edges.map_batches(tag_edges, batch_format="pyarrow")) \
        .groupby("pk") \
        .aggregate(Sum("cn", alias_name="cn"),
                   Sum("is_edge", alias_name="is_edge")) \
        .filter(expr="is_edge >= 1")

    def unpack(t: pa.Table) -> pa.Table:
        sch = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                         ("embeddedness", pa.int64())])
        if len(t) == 0 or "pk" not in t.column_names:
            return sch.empty_table()
        pk = t["pk"].to_numpy(zero_copy_only=False)
        return pa.table({"a": pa.array(pk // V, pa.int64()),
                         "b": pa.array(pk % V, pa.int64()),
                         "embeddedness": t["cn"]}).cast(sch)

    return agg.map_batches(unpack, batch_format="pyarrow")
