"""Deterministic parallel greedy graph coloring (Jones-Plassmann).

Per round, every still-uncolored vertex whose priority exceeds that of all
its uncolored neighbors colors itself with the smallest color absent from
its already-colored neighborhood (the greedy mex). Independent-priority
rounds are exactly the Jones-Plassmann schedule (Jones & Plassmann, "A
parallel graph coloring heuristic", SIAM J. Sci. Comput. 1993): the result
is a proper coloring with at most maxdeg+1 colors in O(log V / log log V)
expected rounds.

Determinism / SQL-checkability: priorities are not RNG state but the
sampling Lehmer hash ``(v·48271 + seed) % (2^31-1)`` disambiguated into the
unique comparable ``pri·V + v`` — the exact arithmetic the DuckDB oracle
replays (``__ray_entry__._coloring_sql``), so the whole fixpoint is
bit-reproducible across runs, layouts, and cluster sizes.

Execution shape mirrors ``kcore``/``matching``: the color vector (O(V),
documented small-V regime) is re-broadcast per round; each round makes two
streamed passes over the symmetrized edge table — (1) per-vertex max
uncolored-neighbor priority (per-batch partials, ≤ #distinct-src rows),
(2) distinct (selected vertex, neighbor color) pairs for the mex — and
only those bounded partials return to the driver.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data

from cuttana_ray.pipelines.graph import Graph

_MUL = 48271                  # functions/sampling.py Lehmer constants
_MOD = 2_147_483_647


@dataclass
class ColoringResult:
    colors: np.ndarray            # int64 per vertex, ≥ 0
    num_colors: int
    rounds: int
    converged: bool
    seconds_per_iter: list = field(default_factory=list)


def _maxpri_fn(color_ref, pri_ref):
    """Per-batch per-src max priority over uncolored neighbors (edges with
    BOTH endpoints uncolored)."""
    def fn(batch: pa.Table) -> pa.Table:
        color = ray.get(color_ref)
        pri = ray.get(pri_ref)
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        m = (color[s] < 0) & (color[d] < 0)
        if not m.any():
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "vmax": pa.array([], pa.int64())})
        uniq, inv = np.unique(s[m], return_inverse=True)
        vmax = np.full(len(uniq), -1, dtype=np.int64)
        np.maximum.at(vmax, inv, pri[d[m]])
        return pa.table({"vertex": pa.array(uniq, pa.int64()),
                         "vmax": pa.array(vmax)})
    return fn


def _neighbor_color_fn(sel_ref, color_ref):
    """Per-batch DISTINCT (selected src, colored-neighbor color) pairs."""
    def fn(batch: pa.Table) -> pa.Table:
        sel = ray.get(sel_ref)
        color = ray.get(color_ref)
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        m = sel[s] & (color[d] >= 0)
        if not m.any():
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        pairs = np.unique(np.stack([s[m], color[d[m]]], axis=1), axis=0)
        return pa.table({"vertex": pa.array(pairs[:, 0], pa.int64()),
                         "c": pa.array(pairs[:, 1], pa.int64())})
    return fn


def _mex_per_vertex(verts: np.ndarray, cols: np.ndarray,
                    sel_ids: np.ndarray) -> np.ndarray:
    """Smallest color ≥ 0 missing from each selected vertex's distinct
    neighbor-color list. ``(verts, cols)`` are distinct pairs; vectorized:
    sort by (vertex, color), compare each run against 0,1,2,…, take the
    first mismatch (or the run length)."""
    mex = np.zeros(len(sel_ids), dtype=np.int64)
    if len(verts) == 0:
        return mex
    order = np.lexsort((cols, verts))
    verts, cols = verts[order], cols[order]
    uniq, start = np.unique(verts, return_index=True)
    runlen = np.diff(np.append(start, len(verts)))
    pos = np.arange(len(verts)) - np.repeat(start, runlen)
    big = len(verts) + 1
    first_bad = np.minimum.reduceat(
        np.where(cols == pos, big, pos), start)
    got = np.minimum(first_bad, runlen)
    lookup = np.searchsorted(uniq, sel_ids)
    has = (lookup < len(uniq))
    has[has] = uniq[lookup[has]] == sel_ids[has]
    mex[has] = got[lookup[has]]
    return mex


def greedy_coloring(graph: Graph, seed: int = 0,
                    max_rounds: int = 500) -> ColoringResult:
    """Proper coloring of the symmetrized link graph; isolated vertices get
    color 0 in round 1."""
    V = graph.num_vertices
    assert V * (_MOD - 1) + V < 2 ** 63, \
        "coloring priority arithmetic requires pri*V within int64"
    ids = np.arange(V, dtype=np.int64)
    pri = ((ids * _MUL + seed) % _MOD) * V + ids        # unique
    pri_ref = ray.put(pri)
    color = np.full(V, -1, dtype=np.int64)

    res = ColoringResult(color, 0, 0, False)
    for it in range(1, max_rounds + 1):
        t0 = time.perf_counter()
        if (color >= 0).all():
            res.rounds = it - 1
            res.converged = True
            break
        color_ref = ray.put(color)
        vmaxn = np.full(V, -1, dtype=np.int64)
        part = graph.edges.map_batches(_maxpri_fn(color_ref, pri_ref),
                                       batch_format="pyarrow")
        for b in part.iter_batches(batch_size=None, batch_format="pyarrow"):
            np.maximum.at(vmaxn,
                          b["vertex"].to_numpy(zero_copy_only=False),
                          b["vmax"].to_numpy(zero_copy_only=False))
        sel = (color < 0) & (pri > vmaxn)
        sel_ids = np.nonzero(sel)[0]
        sel_ref = ray.put(sel)
        nc = graph.edges.map_batches(_neighbor_color_fn(sel_ref, color_ref),
                                     batch_format="pyarrow")
        vs, cs = [], []
        for b in nc.iter_batches(batch_size=None, batch_format="pyarrow"):
            vs.append(b["vertex"].to_numpy(zero_copy_only=False))
            cs.append(b["c"].to_numpy(zero_copy_only=False))
        verts = np.concatenate(vs) if vs else np.empty(0, np.int64)
        cols = np.concatenate(cs) if cs else np.empty(0, np.int64)
        # partials from different blocks may repeat a pair — re-distinct
        if len(verts):
            pairs = np.unique(np.stack([verts, cols], axis=1), axis=0)
            verts, cols = pairs[:, 0], pairs[:, 1]
        color[sel_ids] = _mex_per_vertex(verts, cols, sel_ids)
        res.seconds_per_iter.append(time.perf_counter() - t0)
    else:
        res.rounds = max_rounds
    res.colors = color
    res.num_colors = int(color.max()) + 1 if V else 0
    return res
