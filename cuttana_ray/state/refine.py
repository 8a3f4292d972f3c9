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
    def _drain_partition(self, state: CuttanaState, frm: int) -> bool:
        """Move cheapest subs out of over-capacity ``frm`` until it fits or
        no legal move exists. Incremental: the cost matrix for frm's subs is
        built once; after each move only the moved row and the moved sub's
        coarse-graph neighbors are rescored, with target-capacity masks
        applied at pick time. Returns True if any move was applied."""
        SENT = np.int64(1) << 60
        subs = np.nonzero((state.sub_parent == frm)
                          & (state.sub_sizes > 0))[0]
        if not subs.size:
            return False
        pos = {int(s): i for i, s in enumerate(subs)}
        sizes = state.partition_sizes
        sub_sz = state.sub_sizes[subs]
        cost = self.edge_cuts[subs] - self.edge_cuts[subs, frm][:, None]
        cost = cost.astype(np.int64)
        cost[:, frm] = SENT
        alive = np.ones(len(subs), dtype=bool)
        progress = False
        while (sizes[frm] > self.max_parent
               and self.moves_applied < self.max_moves):
            valid_to = ((sizes < self.max_parent)
                        & (state.num_sub_in < self.max_sub))
            masked = np.where(
                valid_to[None, :]
                & ((sizes[None, :] + sub_sz[:, None]) <= self.max_parent),
                cost, SENT)
            i, to = np.unravel_index(masked.argmin(), masked.shape)
            if masked[i, to] >= SENT:
                return progress
            s = int(subs[i])
            self._move(state, s, frm, int(to))
            progress = True
            alive[i] = False
            cost[i, :] = SENT  # row left the partition
            for g in state.sub_edges.get(s, {}):
                r = pos.get(int(g))
                if r is not None and alive[r]:
                    row = (self.edge_cuts[subs[r]]
                           - self.edge_cuts[subs[r], frm]).astype(np.int64)
                    row[frm] = SENT
                    cost[r] = row
        return progress

    def fix_balance(self, state: CuttanaState) -> None:
        """Repeatedly drain over-capacity partitions (one at a time, an
        equivalent reordering of the reference's global-best-move loop whose
        scoring is stubbed there) until all fit or no legal move exists."""
        while self.moves_applied < self.max_moves:
            over = np.nonzero(state.partition_sizes > self.max_parent)[0]
            if not over.size:
                return
            if not any(self._drain_partition(state, int(f))
                       for f in over.tolist()):
                return  # no legal rebalancing move anywhere

    # -- literal move-with-eviction plans (refine.rs:107-152) -------------
    def refine_with_eviction(self, state: CuttanaState) -> None:
        """The reference's literal plan enumeration with REAL scoring — the
        strict-parity experiment behind ``CuttanaConfig.refine_eviction``.

        Per round, for every partition pair (frm, to): score frm's best
        direct sub ``s`` by ``cuts[s][to] - cuts[s][frm]``; if it fits
        under ``refine_capacity`` it is a 1-move plan, otherwise pair it
        with `to`'s best outgoing sub ``s2`` toward every evict target —
        a 2-move plan scored

            sc(s, frm→to) + sc(s2, to→evict) + w(s,s2)·(1 + [frm==evict])

        which is exactly ``refine.rs:136-139``'s ``effective_score`` with
        the stub ``(u64::MAX, 0)`` / ``(0, 0)`` scores replaced by the
        paper's objective and the ``u64`` overflow gone; the coupling term
        (their ``get_sub_partition_edge(..., from == evict)``) is the
        mutual-edge correction so the plan score equals the TRUE total-cut
        delta of applying both moves in order. The global best plan is
        applied while its score ``< -gain_threshold`` (strict decrease of
        the total cut ⇒ termination; ``max_moves`` backstop).

        Documented divergence: eviction plans here must also FIT —
        ``to + sz(s) − sz(s2) ≤ refine_capacity`` and the evict target must
        absorb ``s2`` — which ``refine.rs`` omits (unobservable there: with
        stub scores its loop never runs); without the check a plan can
        break the invariant ``fix_balance`` just repaired."""
        k = state.num_partitions
        sizes = state.partition_sizes           # live view
        SENT = np.int64(1) << 60
        while self.moves_applied < self.max_moves:
            # eviction plans spend TWO moves; with one move of budget left
            # only direct plans are admissible
            allow_evict = self.moves_applied + 1 < self.max_moves
            best_cost = SENT
            best_moves: list[tuple[int, int, int]] = []
            for frm in range(k):
                subs = np.nonzero((state.sub_parent == frm)
                                  & (state.sub_sizes > 0))[0]
                if not subs.size:
                    continue
                d_frm = (self.edge_cuts[subs]
                         - self.edge_cuts[subs, frm][:, None])
                for to in range(k):
                    if to == frm or state.num_sub_in[to] >= self.max_sub:
                        continue
                    i = int(d_frm[:, to].argmin())
                    s = int(subs[i])
                    sc = int(d_frm[i, to])
                    sz_s = int(state.sub_sizes[s])
                    if sizes[to] + sz_s <= self.refine_capacity:
                        if sc < best_cost:
                            best_cost = sc
                            best_moves = [(s, frm, to)]
                        continue
                    # case 2: evict one of `to`'s subs to make room
                    if not allow_evict:
                        continue
                    subs2 = np.nonzero((state.sub_parent == to)
                                       & (state.sub_sizes > 0))[0]
                    if not subs2.size:
                        continue
                    d_to = (self.edge_cuts[subs2]
                            - self.edge_cuts[subs2, to][:, None])
                    sz2 = state.sub_sizes[subs2]
                    se = state.sub_edges.get(s, {})
                    w_vec = np.fromiter((se.get(int(g), 0) for g in subs2),
                                        dtype=np.int64, count=len(subs2))
                    to_fits = (sizes[to] + sz_s - sz2) <= self.refine_capacity
                    for evict in range(k):
                        if evict == to or \
                                state.num_sub_in[evict] >= self.max_sub:
                            continue
                        ev_base = sizes[evict] - (sz_s if evict == frm else 0)
                        ev_fits = (ev_base + sz2) <= self.refine_capacity
                        couple = w_vec * (2 if evict == frm else 1)
                        eff = np.where(to_fits & ev_fits,
                                       sc + d_to[:, evict] + couple, SENT)
                        j = int(eff.argmin())
                        if eff[j] < best_cost:
                            best_cost = int(eff[j])
                            best_moves = [(s, frm, to),
                                          (int(subs2[j]), to, evict)]
            if best_cost >= -self.gain_threshold or not best_moves:
                return
            for s, a, b in best_moves:
                self._move(state, s, a, b)

    # -- cut-reduction loop (refine.rs:67-76, 107-152) --------------------
    def refine(self, state: CuttanaState) -> None:
        """Greedy best-move loop with incremental best tracking: a move
        (s: frm→to) can change other subs' best moves only via (a) s's
        coarse-graph neighbors' edge_cuts at columns frm/to, (b) capacity /
        fit of frm and to, (c) s's own parent. So per move we fully rescore
        just the dirty rows (neighbors + rows whose stored best pointed at
        frm/to + s) and run a vectorized two-column challenge over the rest —
        O(active·2 + dirty·k) instead of O(active·k)."""
        # ascending sub id: a deterministic row order shared with the native
        # C core so argmin tie-breaks (first-min) pick the same move there
        active = np.sort(np.fromiter(state.sub_edges.keys(), dtype=np.int64,
                                     count=len(state.sub_edges)))
        active = active[state.sub_sizes[active] > 0]
        if not active.size:
            return
        n = len(active)
        pos = {int(s): i for i, s in enumerate(active)}
        sub_sz = state.sub_sizes[active]
        sizes = state.partition_sizes          # live view
        SENT = np.int64(1) << 60               # "illegal move" sentinel
        best_to = np.zeros(n, dtype=np.int64)
        best_cost = np.full(n, SENT, dtype=np.int64)

        def rescore(rows: np.ndarray) -> None:
            m = len(rows)
            if not m:
                return
            par = state.sub_parent[active[rows]]
            cuts = self.edge_cuts[active[rows]]
            r = np.arange(m)
            delta = cuts - cuts[r, par][:, None]
            delta[r, par] = SENT
            full = state.num_sub_in >= self.max_sub
            if full.any():
                delta[:, full] = SENT
            fits = (sizes[None, :] + sub_sz[rows][:, None]) \
                <= self.refine_capacity
            delta[~fits] = SENT
            j = delta.argmin(axis=1)
            best_to[rows] = j
            best_cost[rows] = delta[r, j]

        rescore(np.arange(n))
        while self.moves_applied < self.max_moves:
            i = int(best_cost.argmin())
            c = int(best_cost[i])
            if c >= -self.gain_threshold:
                return
            s = int(active[i])
            frm = int(state.sub_parent[s])
            to = int(best_to[i])
            self._move(state, s, frm, to)

            # dirty = rows whose stored best may now be wrong:
            #  * s itself (parent changed) and s's coarse-graph neighbors
            #    (their edge_cuts at frm/to changed);
            #  * rows whose stored best pointed at `to` and `to` no longer
            #    fits/has sub room (grew). Bests pointing at `frm` stay valid
            #    (frm only shrank), with unchanged cost.
            dirty = {i}
            for g in state.sub_edges.get(s, {}):
                r = pos.get(int(g))
                if r is not None:
                    dirty.add(r)
            viol = (best_to == to) & (
                (sizes[to] + sub_sz > self.refine_capacity)
                | (state.num_sub_in[to] >= self.max_sub))
            dirty.update(np.nonzero(viol)[0].tolist())
            rescore(np.fromiter(dirty, dtype=np.int64, count=len(dirty)))
            # one-column challenge: frm freed room → it may now beat stored
            # bests (its cost to non-neighbors is unchanged, only fit eased)
            if state.num_sub_in[frm] < self.max_sub:
                par_all = state.sub_parent[active]
                cost = (self.edge_cuts[active, frm]
                        - self.edge_cuts[active, par_all])
                ok = ((par_all != frm)
                      & ((sizes[frm] + sub_sz) <= self.refine_capacity)
                      & (cost < best_cost))
                best_cost[ok] = cost[ok]
                best_to[ok] = frm
