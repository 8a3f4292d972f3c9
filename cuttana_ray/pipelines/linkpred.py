"""Link prediction: common-neighbor counts and Jaccard similarity for
non-adjacent vertex pairs.

The classic two-hop scores: for a candidate pair (a, b),
``cn = |N(a) ∩ N(b)|`` and ``jaccard = cn / (|N(a)| + |N(b)| − cn)``.
Candidate pairs are generated from shared neighbors — never all pairs:

1. Adjacency rows (sorted neighbor lists, ``stages/edges.py
   build_adjacency``) expand to the pairs each vertex WITNESSES as a common
   neighbor: all (a, b), a < b, in its list. The expansion is vectorized
   over the whole batch with a gap loop (pairs at list distance g for
   g = 1..max-degree) — Python iterates over GAPS, never rows. Hub vertices
   witness O(deg²) pairs, so ``max_degree`` caps the expansion (standard in
   link prediction — a hub shared by everyone carries no signal; capped
   hubs are simply skipped as witnesses, documented skew discipline).
2. Within-batch partial counts (lexsort + run-length reduce) collapse the
   pair stream BEFORE the single ``groupby(a, b).sum`` exchange.
3. Already-adjacent pairs drop via ``anti_join`` on the packed pair key
   (a·V + b — exact while V < 2³¹; swap for a 128-bit pack beyond).
4. Degrees broadcast once (``ray.put``, dense int64 — the documented
   small-V driver regime; at conv-id scale join a degree table instead).

Jaccard is an int/int double division — bit-deterministic, no rounding
needed for oracle parity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from cuttana_ray.pipelines.graph import Graph
from cuttana_ray.stages.edges import build_adjacency
from cuttana_ray.stages.relational import anti_join


def _witness_pairs_fn(max_degree: int | None):
    """Unweighted witness-pair expansion: the weighted kernel with the
    Adamic-Adar column dropped (ONE vectorized gap-loop implementation —
    `_witness_weighted_fn` — is the single source of truth; the inv-log
    weight it also computes is a negligible per-batch vector op)."""
    weighted = _witness_weighted_fn(max_degree)

    def fn(batch: pa.Table) -> pa.Table:
        return weighted(batch).drop_columns(["aa", "ra"])
    return fn


def witness_pair_scores(graph: Graph, min_common: int = 2,
                        max_degree: int | None = None,
                        include_adjacent: bool = False
                        ) -> "ray.data.Dataset":
    """Shared candidate core for every local link-prediction index:
    ``(a, b, cn, aa, ra)`` for pairs sharing ≥ ``min_common`` neighbors,
    a < b — the common-neighbor count plus BOTH witness-weighted sums
    (Adamic-Adar ``Σ 1/ln(deg w)``, resource-allocation ``Σ 1/deg w``),
    adjacent pairs dropped via the packed-key anti-join unless
    ``include_adjacent``. One witness expansion + ONE ``groupby(a, b)``
    exchange feeds all three public indices (and the contract's three
    queries, which ``materialize()`` this table once per session instead
    of re-running the expansion per score)."""
    V = graph.num_vertices
    adj = build_adjacency(graph.edges)

    # ONE bucketed sort-exchange collapses the per-batch partials — not
    # the native groupby(a, b).aggregate (its per-key reduce measured
    # 96× slower at high pair cardinality; see
    # pipelines/pagerank.py grouped_sum_exchange). Bucket on `a`, reduce
    # (cn, aa, ra) per (a, b) with one lexsort + three reduceats, filter
    # min_common before anything leaves the bucket.
    cand_sch = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                          ("cn", pa.int64()), ("aa", pa.float64()),
                          ("ra", pa.float64())])
    _NB = 64

    def tag_bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "a" not in t.column_names:
            return pa.schema(list(cand_sch)
                             + [("bucket", pa.int64())]).empty_table()
        a = t["a"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array(a % _NB, pa.int64()))

    def reduce_bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "a" not in t.column_names:
            return cand_sch.empty_table()
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        cn = t["cn"].to_numpy(zero_copy_only=False)
        aa = t["aa"].to_numpy(zero_copy_only=False)
        ra = t["ra"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        cn, aa, ra = cn[order], aa[order], ra[order]
        starts = np.concatenate(
            [[0], np.nonzero((a[1:] != a[:-1]) | (b[1:] != b[:-1]))[0] + 1])
        cns = np.add.reduceat(cn, starts)
        keep = cns >= int(min_common)
        return pa.table({
            "a": pa.array(a[starts][keep], pa.int64()),
            "b": pa.array(b[starts][keep], pa.int64()),
            "cn": pa.array(cns[keep].astype(np.int64)),
            "aa": pa.array(np.add.reduceat(aa, starts)[keep], pa.float64()),
            "ra": pa.array(np.add.reduceat(ra, starts)[keep], pa.float64()),
        }).cast(cand_sch)

    cand = adj.map_batches(_witness_weighted_fn(max_degree),
                           batch_format="pyarrow") \
        .map_batches(tag_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(reduce_bucket,
                                      batch_format="pyarrow")
    if include_adjacent:
        return cand

    def pack_pair(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "a" not in t.column_names:
            return pa.schema([("a", pa.int64()), ("b", pa.int64()),
                              ("cn", pa.int64()), ("aa", pa.float64()),
                              ("ra", pa.float64()),
                              ("pk", pa.int64())]).empty_table()
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return t.append_column("pk", pa.array(a * V + b, pa.int64()))

    def pack_edge(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "src" not in t.column_names:
            return pa.schema([("pk", pa.int64())]).empty_table()
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        m = s < d  # canonical direction only (edges are symmetrized)
        return pa.table({"pk": pa.array(s[m] * V + d[m], pa.int64())})

    return anti_join(cand.map_batches(pack_pair, batch_format="pyarrow"),
                     graph.edges.map_batches(pack_edge,
                                             batch_format="pyarrow"),
                     "pk", "pk").drop_columns(["pk"])


def finish_jaccard(cand: "ray.data.Dataset",
                   graph: Graph) -> "ray.data.Dataset":
    """(a, b, common_neighbors, jaccard) from the shared candidate core;
    degrees broadcast once for the |N(a) ∪ N(b)| denominator."""
    deg_ref = ray.put(graph.degrees())

    def score(t: pa.Table) -> pa.Table:
        schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                            ("common_neighbors", pa.int64()),
                            ("jaccard", pa.float64())])
        if len(t) == 0 or "a" not in t.column_names:
            return schema.empty_table()
        deg = ray.get(deg_ref)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        c = t["cn"].to_numpy(zero_copy_only=False)
        j = c.astype(np.float64) / (deg[a] + deg[b] - c)
        return pa.table({"a": t["a"], "b": t["b"],
                         "common_neighbors": t["cn"],
                         "jaccard": pa.array(j, pa.float64())}).cast(schema)

    return cand.map_batches(score, batch_format="pyarrow")


def common_neighbor_pairs(graph: Graph, min_common: int = 2,
                          max_degree: int | None = None,
                          include_adjacent: bool = False
                          ) -> "ray.data.Dataset":
    """(a, b, common_neighbors, jaccard) for every pair sharing ≥
    ``min_common`` neighbors, a < b; existing edges excluded unless
    ``include_adjacent``."""
    return finish_jaccard(
        witness_pair_scores(graph, min_common, max_degree,
                            include_adjacent), graph)


def _witness_weighted_fn(max_degree: int | None):
    """Like ``_witness_pairs_fn`` but each witnessed pair also carries two
    weighted contributions of its witness ``w``: the Adamic-Adar weight
    ``1 / ln(deg w)`` (column ``aa``) and the resource-allocation weight
    ``1 / deg w`` (column ``ra``, Zhou-Lü-Zhang 2009).

    A witness needs deg ≥ 2 to witness anything, so ln(deg) ≥ ln 2 > 0 and
    both weights are always finite. Same gap-loop vectorization; the
    within-batch partial collapses the count and BOTH weight sums before
    the single ``groupby(a, b)`` exchange.
    """
    def fn(batch: pa.Table) -> pa.Table:
        schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                            ("cn", pa.int64()), ("aa", pa.float64()),
                            ("ra", pa.float64())])
        n = len(batch)
        if n == 0 or "nbrs" not in batch.column_names:
            return schema.empty_table()
        nbrs = batch["nbrs"].combine_chunks()
        flat = np.asarray(nbrs.values, dtype=np.int64)
        offs = np.asarray(nbrs.offsets, dtype=np.int64)
        deg = offs[1:] - offs[:-1]
        keep = deg >= 2
        if max_degree is not None:
            keep &= deg <= max_degree
        rows = np.nonzero(keep)[0]
        if len(rows) == 0:
            return schema.empty_table()
        inv_log = np.zeros(len(deg), dtype=np.float64)
        inv_log[rows] = 1.0 / np.log(deg[rows].astype(np.float64))
        inv_deg = np.zeros(len(deg), dtype=np.float64)
        inv_deg[rows] = 1.0 / deg[rows].astype(np.float64)
        a_parts, b_parts, w_parts, r_parts = [], [], [], []
        max_g = int(deg[rows].max())
        for g in range(1, max_g):
            r = rows[deg[rows] > g]
            if len(r) == 0:
                break
            cnt = (deg[r] - g).astype(np.int64)
            base = np.repeat(offs[r], cnt)
            local = np.arange(int(cnt.sum()), dtype=np.int64) - \
                np.repeat(np.cumsum(cnt) - cnt, cnt)
            i = base + local
            a_parts.append(flat[i])
            b_parts.append(flat[i + g])
            w_parts.append(np.repeat(inv_log[r], cnt))
            r_parts.append(np.repeat(inv_deg[r], cnt))
        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        w = np.concatenate(w_parts)
        rw = np.concatenate(r_parts)
        order = np.lexsort((b, a))
        a, b, w, rw = a[order], b[order], w[order], rw[order]
        new = np.concatenate(
            [[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        starts = np.nonzero(new)[0]
        cnt = np.diff(np.concatenate([starts, [len(a)]]))
        return pa.table({"a": pa.array(a[starts], pa.int64()),
                         "b": pa.array(b[starts], pa.int64()),
                         "cn": pa.array(cnt.astype(np.int64)),
                         "aa": pa.array(np.add.reduceat(w, starts),
                                        pa.float64()),
                         "ra": pa.array(np.add.reduceat(rw, starts),
                                        pa.float64())})
    return fn


def adamic_adar_pairs(graph: Graph, min_common: int = 2,
                      max_degree: int | None = None
                      ) -> "ray.data.Dataset":
    """Adamic-Adar link prediction: for non-adjacent pairs sharing ≥
    ``min_common`` neighbors, ``aa(a, b) = Σ_{w ∈ N(a)∩N(b)} 1/ln(deg w)``
    — the classic down-weighting of promiscuous witnesses.

    Same candidate discipline as ``common_neighbor_pairs``: pairs come from
    witness expansion over sorted adjacency lists (never all pairs), partial
    sums collapse within each batch before ONE ``groupby(a, b)`` exchange,
    existing edges drop via a distributed anti-join on the packed pair key.
    No O(V) driver state — the witness weight is computed from the list
    length inside the batch, so (unlike the Jaccard score) no degree vector
    is broadcast at all.
    """
    return finish_adamic_adar(
        witness_pair_scores(graph, min_common, max_degree))


def finish_adamic_adar(cand: "ray.data.Dataset") -> "ray.data.Dataset":
    """(a, b, common_neighbors, adamic_adar) from the shared core."""
    def finish(t: pa.Table) -> pa.Table:
        schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                            ("common_neighbors", pa.int64()),
                            ("adamic_adar", pa.float64())])
        if len(t) == 0 or "a" not in t.column_names:
            return schema.empty_table()
        aa = np.round(t["aa"].to_numpy(zero_copy_only=False), 6)
        return pa.table({"a": t["a"], "b": t["b"],
                         "common_neighbors": t["cn"],
                         "adamic_adar": pa.array(aa, pa.float64())
                         }).cast(schema)

    return cand.map_batches(finish, batch_format="pyarrow")


def resource_allocation_pairs(graph: Graph, min_common: int = 2,
                              max_degree: int | None = None
                              ) -> "ray.data.Dataset":
    """Resource-allocation + preferential-attachment link prediction for
    non-adjacent pairs sharing ≥ ``min_common`` neighbors, a < b:

    * ``resource_alloc(a, b) = Σ_{w ∈ N(a)∩N(b)} 1/deg(w)`` — the
      Zhou-Lü-Zhang index (harsher hub down-weighting than Adamic-Adar's
      1/ln deg; the best simple local index in their benchmark).
    * ``pref_attach(a, b) = deg(a)·deg(b)`` — the Barabási-Albert growth
      score, exact int64.

    Same candidate discipline as ``adamic_adar_pairs``: witness expansion
    over sorted adjacency lists (never all pairs), in-batch partial sums
    before ONE ``groupby(a, b)`` exchange, adjacent pairs dropped by a
    distributed anti-join on the packed pair key. The RA weight comes from
    the witness's in-batch list length; only preferential attachment needs
    endpoint degrees, broadcast once (``ray.put`` dense int64 — the
    documented small-V driver regime; at conv-id scale join the degree
    table instead, as ``pipelines/bigv.py`` does for its scores).
    """
    return finish_resource_allocation(
        witness_pair_scores(graph, min_common, max_degree), graph)


def finish_resource_allocation(cand: "ray.data.Dataset",
                               graph: Graph) -> "ray.data.Dataset":
    """(a, b, common_neighbors, resource_alloc, pref_attach) from the
    shared core; degrees broadcast once for preferential attachment."""
    deg_ref = ray.put(graph.degrees())

    def finish(t: pa.Table) -> pa.Table:
        schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                            ("common_neighbors", pa.int64()),
                            ("resource_alloc", pa.float64()),
                            ("pref_attach", pa.int64())])
        if len(t) == 0 or "a" not in t.column_names:
            return schema.empty_table()
        deg = ray.get(deg_ref)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        ra = np.round(t["ra"].to_numpy(zero_copy_only=False), 6)
        return pa.table({"a": t["a"], "b": t["b"],
                         "common_neighbors": t["cn"],
                         "resource_alloc": pa.array(ra, pa.float64()),
                         "pref_attach": pa.array(deg[a] * deg[b],
                                                 pa.int64())}).cast(schema)

    return cand.map_batches(finish, batch_format="pyarrow")
