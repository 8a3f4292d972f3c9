"""Strongly connected components over a DIRECTED encoded edge table.

Forward-backward min-label rounds (the classic distributed SCC scheme,
e.g. Slota et al.'s FW-BW coloring): per round, over the still-unassigned
subgraph,

* F(v) = min vertex id forward-reachable from v (including v),
* B(v) = min vertex id backward-reachable from v (including v);

vertices with ``F(v) == B(v) == m`` are mutually reachable with ``m`` and
settle into the SCC labeled ``m`` (the minimum id of the component —
proof: F(v)=m means v reaches m, B(v)=m means m reaches v). Settled
vertices drop out and the round repeats. Each round settles at least the
SCC of the smallest unassigned id, so rounds ≤ #SCCs (typically 2-3 on
link graphs whose giant SCC absorbs most vertices; worst case a directed
chain — document the trade-off when using this on pathological DAGs).

Each min-label fixpoint is a sequence of frontier-bounded edge passes in
the ``pipelines/bfs.py`` discipline: only labels that improved last pass
propagate, per-batch partials are pre-aggregated mins (sorted-run
``np.minimum.reduceat``), and the driver combines the small partials
(O(V) driver state — the same documented regime as the other iterative
pipelines; ``combine="shuffle"`` via groupby-min is the huge-V path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from cuttana_ray.pipelines.pagerank import IterativeResult


def _min_partials_fn(state_ref, forward: bool):
    """Edge pass: for edges whose source end is in the changed frontier and
    whose BOTH ends are active, emit per-batch (v, min label) partials."""
    def fn(batch: pa.Table) -> pa.Table:
        active, changed, labels = ray.get(state_ref)
        a = batch["src" if forward else "dst"] \
            .to_numpy(zero_copy_only=False)
        b = batch["dst" if forward else "src"] \
            .to_numpy(zero_copy_only=False)
        keep = changed[a] & active[b]
        empty = pa.table({"v": pa.array([], pa.int64()),
                          "m": pa.array([], pa.int64())})
        if not keep.any():
            return empty
        tgt, lab = b[keep], labels[a[keep]]
        order = np.argsort(tgt, kind="stable")
        tgt_s, lab_s = tgt[order], lab[order]
        starts = np.concatenate(
            [[0], np.nonzero(tgt_s[1:] != tgt_s[:-1])[0] + 1])
        mins = np.minimum.reduceat(lab_s, starts)
        return pa.table({"v": pa.array(tgt_s[starts], pa.int64()),
                         "m": pa.array(mins, pa.int64())})
    return fn


def _min_label_fixpoint(edges: "ray.data.Dataset", active: np.ndarray,
                        forward: bool, max_iters: int) -> np.ndarray:
    """Min reachable-id labels over the active subgraph, one direction."""
    V = len(active)
    labels = np.arange(V, dtype=np.int64)
    changed = active.copy()
    for _ in range(max_iters):
        ref = ray.put((active, changed, labels))
        parts = edges.map_batches(_min_partials_fn(ref, forward),
                                  batch_format="pyarrow")
        best = np.full(V, np.iinfo(np.int64).max, dtype=np.int64)
        for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
            np.minimum.at(best, b["v"].to_numpy(zero_copy_only=False),
                          b["m"].to_numpy(zero_copy_only=False))
        improved = best < labels
        if not improved.any():
            break
        labels[improved] = best[improved]
        changed = improved
    return labels


def strongly_connected_components(edges: "ray.data.Dataset",
                                  num_vertices: int,
                                  max_rounds: int = 64,
                                  max_iters: int = 200) -> IterativeResult:
    """SCC labels (= min vertex id of each component) for every vertex."""
    V = num_vertices
    scc = np.full(V, -1, dtype=np.int64)
    rounds = 0
    while (scc < 0).any() and rounds < max_rounds:
        rounds += 1
        active = scc < 0
        f = _min_label_fixpoint(edges, active, True, max_iters)
        bwd = _min_label_fixpoint(edges, active, False, max_iters)
        settle = active & (f == bwd)
        scc[settle] = f[settle]
    res = IterativeResult(scc, rounds, bool((scc >= 0).all()))
    return res
