"""Maximal independent set via static hash priorities (Luby-style).

Engine-designed graph operator (SURVEY.md §2.4 iterative-algorithm family;
the reference computes partitions only — no vertex-subset algorithms,
``/root/reference/src/lib.rs``). The classic distributed MIS round
(Luby 1986, deterministic static-priority variant): an undecided vertex
joins the MIS iff its priority is strictly below every undecided
neighbor's; neighbors of new MIS vertices are removed. With a fixed
priority function the fixpoint is the unique greedy MIS in priority
order, so the result is deterministic across layouts and cluster sizes.

Priorities are ``murmur64_int`` of the ORIGINAL int vertex id — bit-equal
to DuckDB's ``hash()`` — which is what lets a driver-side SQL oracle
replay every round exactly (see ``__ray_entry__.mis_users``).

Scale shape: per round two ``map_batches`` passes over the edge table
with the undecided/new-MIS masks broadcast via ``ray.put`` (read
zero-copy per task) and per-batch ``np.unique`` / ``np.minimum.at``
partials — only (vertex, min-priority) rows leave a batch. Vertex state
here is a dense driver array over the int-id domain, the same
small-state regime as ``pipelines/kcore.py``; string/sparse domains go
through ``stages/vocab.py`` encoding first, and the sharded-BSP state
path (``pipelines/superstep.py``) is the documented alternative above
``CUTTANA_MAX_DRIVER_STATE``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from cuttana_ray.functions.sketches import murmur64_int

UNDECIDED, IN_MIS, REMOVED = 0, 1, 2


def mis_rounds(edges: "ray.data.Dataset", num_ids: int,
               node_ids: np.ndarray, rounds: int = 4) -> np.ndarray:
    """Run ``rounds`` MIS rounds over a symmetrized int edge table
    (columns ``a``, ``b``; both directions present).

    ``node_ids``: the participating vertex ids (isolated ones included —
    they join the MIS in round 1). Returns a dense int64 status array of
    length ``num_ids`` (0 undecided / 1 MIS / 2 removed); ids outside
    ``node_ids`` stay 0.
    """
    present = np.zeros(num_ids, dtype=bool)
    present[node_ids] = True
    und = present.copy()
    status = np.zeros(num_ids, dtype=np.int64)
    prio = murmur64_int(np.arange(num_ids, dtype=np.int64))

    for _ in range(rounds):
        und_ref = ray.put(und)

        def min_nbr_prio(batch: pa.Table, _u=und_ref) -> pa.Table:
            u = ray.get(_u)
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            keep = u[a] & u[b]
            if not keep.any():
                return pa.table({"v": pa.array([], pa.int64()),
                                 "mn": pa.array([], pa.uint64())})
            a, b = a[keep], b[keep]
            uniq, inv = np.unique(a, return_inverse=True)
            mn = np.full(len(uniq), np.iinfo(np.uint64).max, np.uint64)
            np.minimum.at(mn, inv, prio[b])
            return pa.table({"v": pa.array(uniq, pa.int64()),
                             "mn": pa.array(mn, pa.uint64())})

        minp = np.full(num_ids, np.iinfo(np.uint64).max, np.uint64)
        for blk in edges.map_batches(min_nbr_prio, batch_format="pyarrow") \
                .iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            if len(blk) == 0 or "v" not in blk.column_names:
                continue  # schema-less empty passthrough blocks
            v = blk["v"].to_numpy(zero_copy_only=False)
            m = blk["mn"].to_numpy(zero_copy_only=False)
            np.minimum.at(minp, v, m)

        new_mis = und & (prio < minp)
        if not new_mis.any():
            break
        mis_ref = ray.put(new_mis)

        def nbrs_of_mis(batch: pa.Table, _m=mis_ref) -> pa.Table:
            m = ray.get(_m)
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            hit = m[a]
            return pa.table({"v": pa.array(np.unique(b[hit]), pa.int64())})

        removed = np.zeros(num_ids, dtype=bool)
        for blk in edges.map_batches(nbrs_of_mis, batch_format="pyarrow") \
                .iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            if len(blk) == 0 or "v" not in blk.column_names:
                continue
            removed[blk["v"].to_numpy(zero_copy_only=False)] = True
        removed &= und & ~new_mis

        status[new_mis] = IN_MIS
        status[removed] = REMOVED
        und &= ~(new_mis | removed)
        if not und.any():
            break
    return np.where(present, status, 0)
