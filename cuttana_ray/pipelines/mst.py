"""Minimum spanning forest via Boruvka rounds (distributed min-edge
selection, geometric component contraction).

Each round every component picks its minimum-weight incident cross edge
under the TOTAL order ``(weight, a, b)`` (canonical ``a < b``) — a total
order makes Boruvka cycle-free without the distinct-weights assumption and
makes the result deterministic, so the SQL oracle can replay the identical
rounds (``__ray_entry__._MST_SQL``: unrolled rounds, per-round recursive
closure for the contraction).

Scale shape: the hot path is ONE ``map_batches`` pass over the edge table
per round (O(log V) rounds) — each batch labels endpoints from the
broadcast component array and reduces to at most one candidate edge per
component it contains (vectorized lexsort + run-first), so the driver
gathers O(#components × #blocks) candidate rows, never edges. Component
labels are an O(V) driver array with union-find contraction — the same
documented small-V regime as ``pipelines/components.py`` (at conv-id
cardinality the labels move to the sharded-BSP machinery in
``pipelines/bigv.py``; the per-round selection pass is unchanged).

The reference engine has no MST operator; this is SURVEY.md §2.4
engine-designed graph-family coverage alongside components/k-core/truss.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from cuttana_ray.pipelines.graph import Graph


def _candidates_fn(comp_ref):
    """Per-batch: ≤ 1 candidate cross-edge per component present in the
    batch, minimal under (w, a, b)."""
    def fn(batch: pa.Table) -> pa.Table:
        schema = pa.schema([("c", pa.int64()), ("w", pa.int64()),
                            ("a", pa.int64()), ("b", pa.int64())])
        if len(batch) == 0 or "src" not in batch.column_names:
            return schema.empty_table()
        comp = ray.get(comp_ref)
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        w = batch["weight"].to_numpy(zero_copy_only=False).astype(np.int64)
        cs, cd = comp[src], comp[dst]
        m = cs != cd
        if not m.any():
            return schema.empty_table()
        src, dst, w, cs = src[m], dst[m], w[m], cs[m]
        a = np.minimum(src, dst)
        b = np.maximum(src, dst)
        # first row per component under (c, w, a, b) order — edges are
        # symmetrized upstream, so grouping by the SRC side alone still
        # sees every (component, incident edge) pair
        order = np.lexsort((b, a, w, cs))
        cs, w, a, b = cs[order], w[order], a[order], b[order]
        first = np.concatenate([[True], cs[1:] != cs[:-1]])
        return pa.table({"c": pa.array(cs[first], pa.int64()),
                         "w": pa.array(w[first], pa.int64()),
                         "a": pa.array(a[first], pa.int64()),
                         "b": pa.array(b[first], pa.int64())})
    return fn


def minimum_spanning_forest(graph: Graph, max_rounds: int = 16
                            ) -> tuple[pa.Table, int, bool]:
    """Boruvka minimum spanning forest of the (symmetrized, weighted)
    graph. Returns ``(edges, rounds, converged)`` where ``edges`` is the
    canonical ``(a, b, weight)`` table, a < b, one row per forest edge,
    sorted; ``converged`` is False only if ``max_rounds`` ran out before
    the cross-edge supply did (rounds needed ≤ ⌈log₂ V⌉)."""
    V = graph.num_vertices
    parent = np.arange(V, dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    mst_a: list[np.ndarray] = []
    mst_b: list[np.ndarray] = []
    mst_w: list[np.ndarray] = []
    rounds = 0
    converged = False
    for _ in range(max_rounds):
        # comp label = union-find root, path-compressed to an array
        comp = parent.copy()
        # pointer-jump the array to full compression (O(log V) passes)
        while True:
            nxt = comp[comp]
            if np.array_equal(nxt, comp):
                break
            comp = nxt
        comp_ref = ray.put(comp)
        partial = graph.edges.map_batches(_candidates_fn(comp_ref),
                                          batch_format="pyarrow")
        # gather per-block candidates; final argmin per component
        cs_l, w_l, a_l, b_l = [], [], [], []
        for t in partial.iter_batches(batch_size=1 << 20,
                                      batch_format="pyarrow"):
            cs_l.append(t["c"].to_numpy(zero_copy_only=False))
            w_l.append(t["w"].to_numpy(zero_copy_only=False))
            a_l.append(t["a"].to_numpy(zero_copy_only=False))
            b_l.append(t["b"].to_numpy(zero_copy_only=False))
        if not cs_l or sum(len(x) for x in cs_l) == 0:
            converged = True
            break
        cs = np.concatenate(cs_l)
        w = np.concatenate(w_l)
        a = np.concatenate(a_l)
        b = np.concatenate(b_l)
        order = np.lexsort((b, a, w, cs))
        cs, w, a, b = cs[order], w[order], a[order], b[order]
        first = np.concatenate([[True], cs[1:] != cs[:-1]])
        w, a, b = w[first], a[first], b[first]
        rounds += 1
        # dedup edges picked by both endpoints' components, then union
        key = a * V + b
        _, idx = np.unique(key, return_index=True)
        added = 0
        for i in idx:
            ra, rb = find(int(a[i])), find(int(b[i]))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
            # a total (w, a, b) order means both components of a selected
            # edge agree on it before either is contracted, so every
            # deduped selection is a real merge — but keep the guard
            if ra != rb:
                mst_a.append(a[i:i + 1])
                mst_b.append(b[i:i + 1])
                mst_w.append(w[i:i + 1])
                added += 1
        if added == 0:
            converged = True
            break

    if mst_a:
        a = np.concatenate(mst_a)
        b = np.concatenate(mst_b)
        w = np.concatenate(mst_w)
        order = np.lexsort((b, a))
        a, b, w = a[order], b[order], w[order]
    else:
        a = b = w = np.empty(0, np.int64)
    return pa.table({"a": pa.array(a, pa.int64()),
                     "b": pa.array(b, pa.int64()),
                     "weight": pa.array(w, pa.int64())}), rounds, converged
