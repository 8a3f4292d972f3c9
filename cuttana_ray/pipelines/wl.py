"""1-dimensional Weisfeiler–Lehman color refinement (Weisfeiler & Leman
1968; the vertex-classification primitive behind graph canonization and
the expressivity ceiling of message-passing GNNs — public algorithm).

Each round refines vertex colors by the multiset of neighbor colors:

    sig_r(v)  = (c_r(v), Σ_{u∈N(v)} mix(c_r(u)) mod P)
    c_{r+1}   = dense rank of the distinct signatures under (c, m) order

with ``mix(c) = (c·48271) mod P`` (MINSTD) and ``P = 2^31 − 1`` — a
linear multiset hash instead of the classical sorted-tuple hash so every
step is EXACT int64 arithmetic replayable in SQL (terms < 2^46, partial
sums < 2^62; a hash collision between two distinct neighbor multisets is
possible in principle but deterministic and identical on both sides).
Initial colors are degrees, the classic seeding. Colors are re-labeled
to dense ranks every round, so they stay in [0, V) and the final
partition is canonical (layout- and id-shift-invariant up to the rank
order).

Iteration shape = label propagation's: broadcast the O(V) color vector
(documented small-V driver regime), one streamed edge pass emitting
per-block (dst, partial-sum) rows pre-combined per batch, one small
exchange-free driver combine, then an O(V log V) relabel. The reference
engine has no refinement operators; this extends the SURVEY.md §2.4
iterative family (cited shapes: ``labelprop.py``, ``components.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from cuttana_ray.pipelines.graph import Graph

WL_P = 2_147_483_647          # 2^31 − 1 (Mersenne31)
WL_MULT = 48_271              # MINSTD multiplier


def _partial_fn(colors_ref):
    def fn(batch: pa.Table) -> pa.Table:
        sch = pa.schema([("v", pa.int64()), ("m", pa.int64())])
        if len(batch) == 0 or "src" not in batch.column_names:
            return sch.empty_table()
        colors = ray.get(colors_ref)
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        mixed = (colors[src] * WL_MULT) % WL_P
        order = np.argsort(dst, kind="stable")
        d_s, m_s = dst[order], mixed[order]
        starts = np.concatenate(
            [[0], np.nonzero(d_s[1:] != d_s[:-1])[0] + 1])
        sums = np.add.reduceat(m_s, starts)
        return pa.table({"v": pa.array(d_s[starts], pa.int64()),
                         "m": pa.array(sums.astype(np.int64))}).cast(sch)
    return fn


def wl_refinement(graph: Graph, rounds: int = 3) -> pa.Table:
    """``rounds`` WL refinement rounds; returns ``(vertex, color)`` with
    canonical dense-rank colors. Exact: per-term products < 2^46 and the
    global per-vertex sum stays < 2^62 before the single driver-side
    ``mod P`` (total degree < 2^31 in the broadcast regime)."""
    V = graph.num_vertices
    colors = graph.degrees().astype(np.int64)
    for _ in range(rounds):
        colors_ref = ray.put(colors)
        partial = graph.edges.map_batches(_partial_fn(colors_ref),
                                          batch_format="pyarrow")
        msum = np.zeros(V, dtype=np.int64)
        for b in partial.iter_batches(batch_size=None,
                                      batch_format="pyarrow"):
            np.add.at(msum, b["v"].to_numpy(zero_copy_only=False),
                      b["m"].to_numpy(zero_copy_only=False))
        msum %= WL_P
        # dense-rank relabel under (c, m) order: key = c·P + m is
        # order-isomorphic to the pair and fits int64 (c < V ≤ P)
        key = colors * WL_P + msum
        uniq = np.unique(key)
        colors = np.searchsorted(uniq, key).astype(np.int64)
    return pa.table({"vertex": pa.array(np.arange(V, dtype=np.int64)),
                     "color": pa.array(colors)})
