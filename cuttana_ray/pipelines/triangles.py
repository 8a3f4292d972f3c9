"""Triangle counting (north-star algorithm #4; exact).

Edge-iterator algorithm with degree orientation: orient every undirected
edge from the endpoint with smaller ``(degree, id)`` to the larger; each
triangle then has exactly one "pivot" edge (u→v) whose oriented
out-neighborhoods intersect in its third vertex, so

    triangles = Σ_{oriented edges (u,v)} |N+(u) ∩ N+(v)|

counts each triangle exactly once, and the orientation bounds every
out-neighborhood by O(sqrt(E)) on skewed graphs (the hub-taming trick).

Distribution: the oriented CSR (≈|E_und| int64 entries) is broadcast once
via ``ray.put``; a ``map_batches`` stage over the oriented edge list
intersects sorted neighbor slices per edge (vectorized searchsorted) and
emits per-batch partial per-vertex triangle counts. At 100-TB scale the
broadcast CSR is replaced by a bucketed self-join on (u, v) key ranges —
documented, not needed at sandbox scale.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from cuttana_ray.pipelines.graph import Graph


@dataclass
class TriangleResult:
    per_vertex: np.ndarray
    total: int


def oriented_csr(graph: Graph) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(indptr, indices, degrees): oriented adjacency, neighbor lists sorted.

    Built from the symmetrized edge table by keeping only edges where
    ``(deg[src], src) < (deg[dst], dst)``.
    """
    deg = graph.degrees()
    srcs, dsts = [], []
    for b in graph.edges.iter_batches(batch_size=1 << 20,
                                      batch_format="pyarrow"):
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        keep = (deg[s] < deg[d]) | ((deg[s] == deg[d]) & (s < d))
        srcs.append(s[keep])
        dsts.append(d[keep])
    src = np.concatenate(srcs) if srcs else np.empty(0, np.int64)
    dst = np.concatenate(dsts) if dsts else np.empty(0, np.int64)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    indptr = np.zeros(graph.num_vertices + 1, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr, dst, deg


def _intersect_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elements of sorted-unique ``b`` also present in sorted-unique ``a``."""
    if len(a) == 0 or len(b) == 0:
        return b[:0]
    idx = np.searchsorted(a, b)
    idx[idx == len(a)] = len(a) - 1
    return b[a[idx] == b]


def triangle_count(graph: Graph) -> TriangleResult:
    indptr, indices, _ = oriented_csr(graph)
    V = graph.num_vertices
    csr_ref = ray.put((indptr, indices))

    oriented = pa.table({
        "src": pa.array(np.repeat(np.arange(V, dtype=np.int64),
                                  np.diff(indptr))),
        "dst": pa.array(indices),
    })
    ds = ray.data.from_arrow(oriented)
    if ds.count() == 0:
        return TriangleResult(np.zeros(V, dtype=np.int64), 0)

    def count_batch(batch: pa.Table) -> pa.Table:
        ip, ix = ray.get(csr_ref)
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        local = np.zeros(len(ip) - 1, dtype=np.int64)
        for u, v in zip(src.tolist(), dst.tolist()):
            nu = ix[ip[u]:ip[u + 1]]
            nv = ix[ip[v]:ip[v + 1]]
            ws = _intersect_sorted(nu, nv)
            if len(ws):
                local[u] += len(ws)
                local[v] += len(ws)
                np.add.at(local, ws, 1)
        nz = np.nonzero(local)[0]
        return pa.table({"vertex": pa.array(nz, pa.int64()),
                         "partial": pa.array(local[nz], pa.int64())})

    partial = ds.map_batches(count_batch, batch_format="pyarrow",
                             batch_size=16384)
    agg = partial.groupby("vertex").aggregate(Sum("partial", alias_name="s"))
    per_vertex = np.zeros(V, dtype=np.int64)
    for b in agg.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        per_vertex[b["vertex"].to_numpy(zero_copy_only=False)] = \
            b["s"].to_numpy(zero_copy_only=False)
    total = int(per_vertex.sum()) // 3
    return TriangleResult(per_vertex, total)
