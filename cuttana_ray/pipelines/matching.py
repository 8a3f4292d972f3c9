"""Deterministic parallel maximal matching over the link graph.

Local-max matching (Preis-style greedy, the standard distributed
formulation): every round, each still-unmatched vertex looks at its alive
incident edges and an edge is matched iff it carries the maximum priority
at BOTH endpoints; its endpoints then leave the graph. Repeats until no
alive edge remains — the result is a maximal matching (no augmenting edge
left), and with priorities that behave randomly the expected round count
is O(log E).

Determinism / SQL-checkability: the priority is not RNG state but the
repo's sampling Lehmer hash of the canonical edge key ``u·V + v``
(``functions/sampling.py`` arithmetic), disambiguated into a UNIQUE
comparable ``pri·E + eid`` (eid = rank of (u, v) in canonical sort order)
so ties are impossible and the fixpoint is bit-reproducible across runs,
layouts, and cluster sizes. The identical integer arithmetic unrolls into
the DuckDB oracle (``__ray_entry__._matching_sql``). Requires
``V² < 2^63`` and ``pri·E < 2^63`` (pri < 2^31, so E < 2^32) — loudly
asserted, holds for any graph this broadcast-regime path accepts.

Execution shape mirrors ``kcore``: the matched-vertex mask (O(V) bool,
documented small-V regime) is re-broadcast per round; each round streams
the canonical edge table through ``map_batches`` emitting per-batch
per-vertex max-priority partials (≤ #distinct endpoints rows, not raw
edges), and only those partials return to the driver.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data

from cuttana_ray.pipelines.graph import Graph
from cuttana_ray.pipelines.truss import _canonical_edges

_MUL = 48271                  # functions/sampling.py Lehmer constants
_MOD = 2_147_483_647


@dataclass
class MatchingResult:
    """Matched canonical edges (u < v) with the round each was matched in
    (rounds are 1-based)."""

    edges: pa.Table               # u:int64, v:int64, round:int64
    rounds: int
    converged: bool
    deltas: list = field(default_factory=list)     # edges matched per round
    seconds_per_iter: list = field(default_factory=list)


def _vmax_fn(matched_ref, comb_ref):
    """Per-batch per-vertex max of alive incident-edge priorities."""
    def fn(batch: pa.Table) -> pa.Table:
        matched = ray.get(matched_ref)
        comb = ray.get(comb_ref)
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        eid = batch["eid"].to_numpy(zero_copy_only=False)
        live = ~matched[u] & ~matched[v]
        if not live.any():
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "vmax": pa.array([], pa.int64())})
        ends = np.concatenate([u[live], v[live]])
        pri = np.concatenate([comb[eid[live]]] * 2)
        uniq, inv = np.unique(ends, return_inverse=True)
        vmax = np.full(len(uniq), -1, dtype=np.int64)
        np.maximum.at(vmax, inv, pri)
        return pa.table({"vertex": pa.array(uniq, pa.int64()),
                         "vmax": pa.array(vmax)})
    return fn


def maximal_matching(graph: Graph, seed: int = 0,
                     max_rounds: int = 500) -> MatchingResult:
    """Exact local-max maximal matching of the symmetrized link graph."""
    u, v = _canonical_edges(graph)
    E = len(u)
    V = graph.num_vertices
    empty = pa.table({"u": pa.array([], pa.int64()),
                      "v": pa.array([], pa.int64()),
                      "round": pa.array([], pa.int64())})
    if E == 0:
        return MatchingResult(empty, 0, True)
    assert V * V < 2 ** 63 and E < 2 ** 32, \
        "matching priority arithmetic requires V^2 and pri*E within int64"

    eid = np.arange(E, dtype=np.int64)
    pri = ((u * V + v) * _MUL + seed) % _MOD
    comb = pri * E + eid              # unique, orders by (pri, eid)
    comb_ref = ray.put(comb)

    ds = ray.data.from_arrow(pa.table({
        "u": pa.array(u), "v": pa.array(v),
        "eid": pa.array(eid)})).materialize()

    matched = np.zeros(V, dtype=bool)
    match_round = np.zeros(E, dtype=np.int64)      # 0 = unmatched
    res = MatchingResult(empty, 0, False)
    for it in range(1, max_rounds + 1):
        t0 = time.perf_counter()
        alive = ~matched[u] & ~matched[v]
        if not alive.any():
            res.rounds = it - 1
            res.converged = True
            break
        matched_ref = ray.put(matched)
        vmax = np.full(V, -1, dtype=np.int64)
        part = ds.map_batches(_vmax_fn(matched_ref, comb_ref),
                              batch_format="pyarrow", batch_size=65536)
        for b in part.iter_batches(batch_size=None, batch_format="pyarrow"):
            np.maximum.at(vmax,
                          b["vertex"].to_numpy(zero_copy_only=False),
                          b["vmax"].to_numpy(zero_copy_only=False))
        sel = alive & (comb == vmax[u]) & (comb == vmax[v])
        match_round[sel] = it
        matched[u[sel]] = True
        matched[v[sel]] = True
        res.deltas.append(float(sel.sum()))
        res.seconds_per_iter.append(time.perf_counter() - t0)
    else:
        res.rounds = max_rounds
    got = match_round > 0
    res.edges = pa.table({
        "u": pa.array(u[got], pa.int64()),
        "v": pa.array(v[got], pa.int64()),
        "round": pa.array(match_round[got], pa.int64()),
    })
    return res
