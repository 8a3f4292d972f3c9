"""Deterministic uniform random walks over the link graph — the input
generator for graph-embedding training data (DeepWalk/node2vec style).

Every step is a pure function of (walk id, step index) through an exact
int64 Lehmer LCG, so walks are reproducible across runs, block layouts and
cluster sizes, AND SQL-expressible — the driver oracle replays the
identical arithmetic with DuckDB list indexing (``__ray_entry__
random_walks_events``). Neighbor lists come from ``build_adjacency``
sorted by neighbor id (stages/edges.py), which pins the meaning of
"pick the idx-th neighbor" on both sides.

Execution shape: the walk frontier is O(#walks) driver state (walks ≪
vertices by construction — they're a sample); each step broadcasts the
current positions once via ``ray.put`` and scans the adjacency dataset
with a vectorized ``map_batches`` probe — walks at a vertex gather their
next hop from the Arrow list offsets, no shuffle at all. At 100 TB the
same step runs inside the per-partition CSR actor pool
(``pipelines/csr.py``) with walks routed to their vertex's partition;
the broadcast-frontier variant here is the documented small-frontier
regime (SURVEY.md §2.4 rule (b)).

Dead ends (vertices with no outgoing edges — impossible in the
symmetrized graph but possible in arbitrary edge tables) make the walk
stay in place, mirrored by the oracle's COALESCE.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

_M = 2147483647  # 2^31 - 1 (Lehmer modulus; products stay < 2^63)
_A = 48271
_STEP_MIX = 9973
_OFFSET = 12345


def _choice(walk_ids: np.ndarray, step: int) -> np.ndarray:
    """Exact-int64 LCG draw per (walk, step); reduce mod degree later."""
    return ((walk_ids % _M) * _A + step * _STEP_MIX + _OFFSET) % _M


def random_walks(graph, walk_length: int = 8,
                 seed_mod: int = 17) -> pa.Table:
    """One walk per vertex with ``node_id % seed_mod == 0``; returns
    ``(walk: int64, step: int64, vertex: int64)`` rows for steps
    0..walk_length (step 0 = the seed itself)."""
    from cuttana_ray.pipelines.graph import graph_adjacency

    adj = graph_adjacency(graph).select_columns(["vertex", "nbrs"]) \
        .materialize()
    walks = np.arange(0, graph.num_vertices, dtype=np.int64)
    walks = walks[walks % seed_mod == 0]
    cur = walks.copy()
    out_w = [walks]
    out_s = [np.zeros(len(walks), np.int64)]
    out_v = [cur.copy()]

    for step in range(1, walk_length + 1):
        order = np.argsort(cur, kind="stable")
        ref = ray.put((cur[order], walks[order], step))

        def probe(t: pa.Table, ref=ref) -> pa.Table:
            cur_s, walk_s, stp = ray.get(ref)
            v = t["vertex"].to_numpy(zero_copy_only=False)
            lo = np.searchsorted(cur_s, v, side="left")
            hi = np.searchsorted(cur_s, v, side="right")
            counts = hi - lo
            rows = np.repeat(np.arange(len(v), dtype=np.int64), counts)
            if len(rows) == 0:
                return pa.table({"walk": pa.array([], pa.int64()),
                                 "vertex": pa.array([], pa.int64())})
            # walk slots grouped per adjacency row, in sorted-cur order
            slot = np.concatenate(
                [np.arange(a, b, dtype=np.int64)
                 for a, b in zip(lo[counts > 0], hi[counts > 0])])
            wids = walk_s[slot]
            col = t["nbrs"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            flat = col.flatten().to_numpy(zero_copy_only=False)
            # offsets reference the raw values buffer; rebase to flatten()
            offs = col.offsets.to_numpy(zero_copy_only=False)
            offs = (offs - offs[0]).astype(np.int64)
            deg = (offs[1:] - offs[:-1]).astype(np.int64)
            idx = _choice(wids, stp) % deg[rows]
            nxt = flat[offs[rows] + idx]
            return pa.table({"walk": pa.array(wids),
                             "vertex": pa.array(nxt, pa.int64())})

        wl, vl = [], []
        for b in adj.map_batches(probe, batch_format="pyarrow") \
                .iter_batches(batch_size=None, batch_format="pyarrow"):
            if len(b) == 0:
                continue
            wl.append(b["walk"].to_numpy(zero_copy_only=False))
            vl.append(b["vertex"].to_numpy(zero_copy_only=False))
        nxt = cur.copy()  # dead-end walks stay in place
        if wl:
            warr = np.concatenate(wl)
            # `walks` is sorted ascending by construction
            nxt[np.searchsorted(walks, warr)] = np.concatenate(vl)
        cur = nxt
        out_w.append(walks)
        out_s.append(np.full(len(walks), step, np.int64))
        out_v.append(cur.copy())

    return pa.table({"walk": pa.array(np.concatenate(out_w)),
                     "step": pa.array(np.concatenate(out_s)),
                     "vertex": pa.array(np.concatenate(out_v))})
