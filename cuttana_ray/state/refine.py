"""Sub-partition refinement with real move scoring.

Structure mirrors ``/root/reference/src/refine.rs`` (capacities at
``refine.rs:40-57``; ``fix_balance`` at ``:59-65,78-105``; ``refine`` loop at
``:67-76,107-152``; ``move_sub_partition`` at ``:184-237``), but the
reference's plan *scoring* is stubbed — placeholders ``(u64::MAX, 0)`` /
``(0, 0)`` at ``refine.rs:91,118,136`` ("placeholder for real scoring"),
with the consequence that its ``refine()`` with the default
``gain_threshold=0`` breaks immediately and its eviction arithmetic
overflows ``u64::MAX + w``. We implement the scoring those stubs stand in
for, per the CUTTANA paper's refinement objective:

    cost(move sub s: from -> to) = edge_cuts[s][to] - edge_cuts[s][from]

where ``edge_cuts[s][p]`` is the total weight of s's coarse-graph edges that
would be cut if s lived in partition p (``state.rs:169-189``). Moves are
applied greedily, lowest cost first:

* ``fix_balance``: while some partition exceeds ``max_parent``, move the
  cheapest non-empty sub out of it into any partition with vertex room, sub
  room, and fit — or stop if no legal move exists.
* ``refine``: apply the globally cheapest legal direct move while its cost
  ``< -info_gain_threshold`` (strict improvement ⇒ total cut strictly
  decreases ⇒ termination; ``max_refine_moves`` is a backstop). Direct moves
  use the relaxed ``refine_capacity = 1.1 * max_parent``; the reference's
  move-with-eviction plans (``refine.rs:131-149``, stub-scored and
  overflowing there) are subsumed by this relaxed capacity plus the trailing
  ``fix_balance`` pass (``cuttana.rs:53-56`` runs fix → refine → fix).

Also divergent by necessity: we track subs by **global sub id** with an
explicit ``sub_parent`` array — the reference recomputes a sub's global id
from ``(parent, local)`` after moves (``refine.rs:190``), which is stale
arithmetic once a sub has moved; the paper's intent (stable sub identity) is
what we implement. ``cut_count`` stays frozen at stream time exactly like
the reference (no ``refine.rs`` path touches ``metrics.cut_count``); the
engine recomputes post-refinement cut metrics from the labeled edge table
(``cuttana_ray.stages.metrics``).
"""

from __future__ import annotations

import numpy as np

from cuttana_ray.state.core import CuttanaState


def compute_edge_cuts(state: CuttanaState) -> np.ndarray:
    """(total_subs, k) int64: cost of each sub living in each partition.

    Mirrors ``/root/reference/src/state.rs:169-189``: for each sub,
    ``edge_cuts[p] = total_adjacent_weight - weight_to_subs_parented_at_p``
    (signed arithmetic here; the reference's u64 subtract-then-add wraps).
    """
    k = state.num_partitions
    cuts = np.zeros((state.total_subs, k), dtype=np.int64)
    parent = state.sub_parent
    for s, edges in state.sub_edges.items():
        nbrs = np.fromiter(edges.keys(), dtype=np.int64, count=len(edges))
        ws = np.fromiter(edges.values(), dtype=np.int64, count=len(edges))
        total = int(ws.sum())
        row = cuts[s]
        row += total
        np.subtract.at(row, parent[nbrs], ws)
    return cuts


class Refiner:
    """Greedy sub-partition move loop; capacities per ``refine.rs:40-57``."""

    def __init__(self, state: CuttanaState, balance_slack: float,
                 gain_threshold: int, max_moves: int = 200_000) -> None:
        self.edge_cuts = compute_edge_cuts(state)
        v = float(state.vertex_count)
        k = float(state.num_partitions)
        self.max_parent = int(v / k * (1.0 + balance_slack)) + 1
        self.max_sub = int(state.total_subs / k * 1.5) + 1
        self.refine_capacity = int(self.max_parent * 1.1)
        self.gain_threshold = gain_threshold
        self.max_moves = max_moves
        self.moves_applied = 0

    # -- move application (refine.rs:184-237) -----------------------------
    def _move(self, state: CuttanaState, s: int, frm: int, to: int) -> None:
        # When s moves into `to`, each neighbor gains weight-w co-location
        # with partition `to` (its cut-if-in-`to` DROPS by w) and loses it
        # with `frm` (cut-if-in-`frm` RISES by w). NOTE: the reference's
        # incremental update has these signs inverted (refine.rs:199-204:
        # ``edge_cuts[to] += w; edge_cuts[from] -= w``), contradicting its
        # own definition at state.rs:169-189 — unobservable there because
        # plan scoring is stubbed; with real scoring the inverted signs make
        # the loop chase its own tail, so we use the definition-consistent
        # signs.
        edges = state.sub_edges.get(s, {})
        for nbr, w in edges.items():
            self.edge_cuts[nbr, to] -= w
            self.edge_cuts[nbr, frm] += w
        sz = state.sub_sizes[s]
        state.partition_sizes[frm] -= sz
        state.partition_sizes[to] += sz
        state.sub_parent[s] = to
        state.num_sub_in[frm] -= 1
        state.num_sub_in[to] += 1
        self.moves_applied += 1

    # -- balance repair (refine.rs:59-65, 78-105) -------------------------
    def fix_balance(self, state: CuttanaState) -> None:
        k = state.num_partitions
        while self.moves_applied < self.max_moves:
            over = np.nonzero(state.partition_sizes > self.max_parent)[0]
            if not over.size:
                return
            best = None  # (cost, s, frm, to)
            for frm in over.tolist():
                subs = np.nonzero((state.sub_parent == frm)
                                  & (state.sub_sizes > 0))[0]
                if not subs.size:
                    continue
                ok_to = np.nonzero(
                    (state.partition_sizes < self.max_parent)
                    & (state.num_sub_in < self.max_sub))[0]
                ok_to = ok_to[ok_to != frm]
                if not ok_to.size:
                    continue
                # fit: to_size + sub_size <= max_parent (refine.rs:170-182)
                fits = (state.partition_sizes[ok_to][None, :]
                        + state.sub_sizes[subs][:, None]) <= self.max_parent
                cost = (self.edge_cuts[np.ix_(subs, ok_to)]
                        - self.edge_cuts[subs, state.sub_parent[subs]][:, None]
                        ).astype(np.float64)
                cost[~fits] = np.inf
                i, j = np.unravel_index(np.argmin(cost), cost.shape)
                if np.isfinite(cost[i, j]) and (
                        best is None or cost[i, j] < best[0]):
                    best = (cost[i, j], int(subs[i]), frm, int(ok_to[j]))
            if best is None:
                return  # no legal rebalancing move
            _, s, frm, to = best
            self._move(state, s, frm, to)

    # -- cut-reduction loop (refine.rs:67-76, 107-152) --------------------
    def refine(self, state: CuttanaState) -> None:
        k = state.num_partitions
        active = np.fromiter(state.sub_edges.keys(), dtype=np.int64,
                             count=len(state.sub_edges))
        active = active[state.sub_sizes[active] > 0]
        if not active.size:
            return
        while self.moves_applied < self.max_moves:
            par = state.sub_parent[active]
            delta = (self.edge_cuts[active]
                     - self.edge_cuts[active, par][:, None]).astype(np.float64)
            # illegal targets: own partition; sub-count capacity; vertex fit
            delta[np.arange(len(active)), par] = np.inf
            full_subs = state.num_sub_in >= self.max_sub
            if full_subs.any():
                delta[:, full_subs] = np.inf
            fits = (state.partition_sizes[None, :]
                    + state.sub_sizes[active][:, None]) <= self.refine_capacity
            delta[~fits] = np.inf
            i, to = np.unravel_index(np.argmin(delta), delta.shape)
            best_cost = delta[i, to]
            if not np.isfinite(best_cost) or best_cost >= -self.gain_threshold:
                return
            self._move(state, int(active[i]), int(par[i]), int(to))
