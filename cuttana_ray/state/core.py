"""Two-level Cuttana partitioning state + the FENNEL-style greedy scorer.

Semantics mirror ``/root/reference/src/state.rs`` and
``/root/reference/src/partition.rs``, re-expressed over dense int vertex ids
and NumPy arrays (the engine dictionary-encodes node names to ``0..V-1``
before partitioning, so per-vertex state is flat arrays, not hash maps):

* Two-level hierarchy: ``k`` partitions × ``num_sub_partitions`` sub-partitions
  each; global sub id = ``partition * num_sub + local`` (``state.rs:107-113``).
* Phase-1 slack is widened to ``min(2*slack, slack + 0.5)`` (``state.rs:60-66``,
  mirroring upstream ``ogpart_single_thread.cpp:167``).
* ``update_metrics``: per adjacency row ``vertex_count += 1``,
  ``edge_count += degree``; the sub level sees *effective* counts ``V // k``,
  ``E // k`` (``state.rs:155-167``).
* ``partition()``: panic→``CapacityError`` when no partition has room
  (``partition.rs:29-32``); pick best global partition, assign, count newly
  cut edges once per later-placed endpoint (``partition.rs:38-44``); pick best
  sub-partition with the ``sub_gamma`` scorer, assign; record symmetric
  sub↔sub intra-partition edge weights (``partition.rs:50-62``,
  ``state.rs:124-135``).
* FENNEL marginal score (``partition.rs:88-100``): candidate score for
  partition ``p`` = ``|nbrs already in p| - alpha * gamma * size(p)^(gamma-1)``
  with ``alpha = k^(gamma-1) * V / E^gamma`` over the *running* V, E; first
  candidate is the globally smallest partition scored with no neighbors
  (``partition.rs:110-112``); only partitions with room compete
  (``partition.rs:128-134``).

Divergences (documented in SURVEY.md §4):

* Tie-breaks use a **seeded** RNG, uniform among max-score ties — the
  reference reservoir-samples with an unseeded ``ThreadRng``
  (``partition.rs:83-86,115-124``), which is non-deterministic run-to-run.
* ``E == 0`` yields a zero balance penalty instead of the reference's
  ``inf * 0 = NaN`` score arithmetic.
"""

from __future__ import annotations

import numpy as np

from cuttana_ray.config import CuttanaConfig


class CapacityError(RuntimeError):
    """Raised when every partition is at capacity (reference panics,
    ``/root/reference/src/partition.rs:29-32``)."""


def widened_slack(balance_slack: float) -> float:
    """Phase-1 slack widening, ``/root/reference/src/state.rs:60-66``."""
    return min(balance_slack * 2.0, balance_slack + 0.5)


class CuttanaState:
    """Flat-array state for ``num_vertices`` dense-int vertices."""

    def __init__(self, num_vertices: int, num_partitions: int,
                 config: CuttanaConfig) -> None:
        if num_partitions <= 0:
            raise ValueError("Number of partitions must be > 0")
        k = num_partitions
        ns = config.num_sub_partitions
        self.num_partitions = k
        self.num_sub = ns
        self.total_subs = k * ns
        self.slack = widened_slack(config.balance_slack)

        # per-vertex streaming assignment (global partition, local sub id);
        # int64 so gsub arithmetic needs no casts in the hot loop
        self.part_of = np.full(num_vertices, -1, dtype=np.int64)
        self.sub_of = np.full(num_vertices, -1, dtype=np.int64)

        # level sizes
        self.partition_sizes = np.zeros(k, dtype=np.int64)
        self.sub_sizes = np.zeros(self.total_subs, dtype=np.int64)  # by gsub

        # refinement bookkeeping (``state.rs:10-46``)
        self.sub_parent = (np.arange(self.total_subs, dtype=np.int64) // ns).astype(np.int32)
        self.num_sub_in = np.full(k, ns, dtype=np.int64)
        self.sub_edges: dict[int, dict[int, int]] = {}  # gsub -> {gsub: weight}

        # running metrics (``assignment.rs:68-100``, ``state.rs:155-167``)
        self.vertex_count = 0
        self.edge_count = 0
        self.cut_count = 0
        self.v_eff = 0  # V // k, the sub level's effective vertex count
        self.e_eff = 0

    # -- metrics ----------------------------------------------------------
    def update_metrics(self, degree: int) -> None:
        self.vertex_count += 1
        self.edge_count += degree
        self.v_eff = self.vertex_count // self.num_partitions
        self.e_eff = self.edge_count // self.num_partitions

    def edge_cut_ratio(self) -> float:
        return self.cut_count / self.edge_count if self.edge_count else 0.0

    def communication_volume(self) -> float:
        if self.vertex_count == 0:
            return 0.0
        return self.cut_count / (self.num_partitions * self.vertex_count)

    # -- sub-partition coarse graph --------------------------------------
    def gsub(self, partition: int, local_sub: int) -> int:
        return partition * self.num_sub + local_sub

    def add_sub_edge(self, gs_a: int, gs_b: int, weight: int = 1) -> None:
        """Symmetric +weight both directions (``state.rs:124-135``)."""
        self.sub_edges.setdefault(gs_a, {})[gs_b] = (
            self.sub_edges.get(gs_a, {}).get(gs_b, 0) + weight)
        self.sub_edges.setdefault(gs_b, {})[gs_a] = (
            self.sub_edges.get(gs_b, {}).get(gs_a, 0) + weight)

    # -- final projection --------------------------------------------------
    def final_partition_of_assigned(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(vertices, final_partition, gsub) for all streamed vertices.

        A vertex's partition after refinement is the current parent of the
        sub-partition it was streamed into (refinement moves whole subs).
        """
        vs = np.nonzero(self.part_of >= 0)[0]
        gsubs = self.part_of[vs].astype(np.int64) * self.num_sub + self.sub_of[vs]
        return vs, self.sub_parent[gsubs], gsubs


_MASK64 = (1 << 64) - 1


class TieRng:
    """Seeded splitmix64 stream for scorer tie-breaks.

    Replaces the numpy ``Generator`` used through round 1 so the native C
    core (``_native.c``) and this Python reference path draw the *same*
    sequence from the same seed — splitmix64 is trivially portable, a numpy
    PCG64 bounded draw is not. Semantics are unchanged: uniform choice among
    max-score ties, seeded (the reference uses an unseeded ``ThreadRng``,
    ``/root/reference/src/partition.rs:83-86,115-124``; determinism is a
    documented engine divergence, ``cuttana_ray/config.py``)."""

    __slots__ = ("state",)

    def __init__(self, seed: int) -> None:
        self.state = seed & _MASK64

    def integers(self, low: int, high: int) -> int:
        """Drop-in for ``Generator.integers(0, n)``: uniform in [low, high)."""
        s = (self.state + 0x9E3779B97F4A7C15) & _MASK64
        self.state = s
        z = s
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK64
        z ^= z >> 31
        return low + z % (high - low)


class FennelScorer:
    """Greedy marginal-gain scorer shared by the global (``gamma=1.5``) and
    sub (``sub_gamma=1.0``) levels; ``/root/reference/src/partition.rs:75-140``."""

    def __init__(self, gamma: float, rng) -> None:
        """``rng``: any object with ``integers(low, high) -> int`` —
        ``TieRng`` (the default; shared with the native core) or a numpy
        ``Generator``."""
        self.gamma = gamma
        self.rng = rng

    def _alpha(self, num_partitions: int, vertex_count: int,
               edge_count: int) -> float:
        if edge_count == 0:
            return 0.0
        return (num_partitions ** (self.gamma - 1.0)) * vertex_count / (
            edge_count ** self.gamma)

    def find_best(self, nbr_partitions: np.ndarray, sizes: np.ndarray,
                  num_partitions: int, vertex_count: int, edge_count: int,
                  slack: float) -> int:
        """Pick the partition maximizing ``count_in_p - penalty(p)`` with
        ``penalty(p) = alpha * gamma * size(p)^(gamma-1)``.

        ``nbr_partitions``: this vertex's neighbors' current partitions at
        this level (-1 = unplaced / other parent). Initial candidate is the
        smallest partition with a no-neighbor score; neighbor-partition
        candidates must have room. Ties: seeded uniform choice.
        """
        import math
        nbr_list = nbr_partitions.tolist() \
            if isinstance(nbr_partitions, np.ndarray) else nbr_partitions
        n_placed = 0
        counts_d: dict[int, int] = {}
        for p in nbr_list:
            if p >= 0:
                n_placed += 1
                counts_d[p] = counts_d.get(p, 0) + 1
        smallest = int(sizes.argmin())
        if not n_placed:
            return smallest
        if num_partitions <= 64:
            # python-list size lookups: one tolist beats repeated numpy
            # scalar indexing at small k (the global level, k ~ 8..64)
            sizes = sizes.tolist()
        # room constraint: size < (1+slack) * V / k   (assignment.rs:38-41)
        threshold = (1.0 + slack) * (vertex_count / num_partitions)
        # candidate iteration order: first-occurrence order for the dict
        # path (n_placed <= 32), ascending partition id beyond — preserved
        # exactly from the previous array implementation so the seeded
        # tie-break sequence (and therefore every assignment) is unchanged
        if n_placed <= 32:
            cand_iter = [p for p in counts_d if sizes[p] < threshold]
        else:
            cand_iter = sorted(p for p in counts_d if sizes[p] < threshold)
        if not cand_iter:
            return smallest

        if self.gamma == 1.0:
            # penalty is constant across partitions: any candidate
            # (count ≥ 1 - c) beats the smallest-partition score (0 - c);
            # winner = max count, ties uniform.
            if len(cand_iter) == 1:
                return cand_iter[0]
            top = -1
            ties: list[int] = []
            for p in cand_iter:
                c = counts_d[p]
                if c > top:
                    top = c
                    ties = [p]
                elif c == top:
                    ties.append(p)
        else:
            alpha_g = self._alpha(num_partitions, vertex_count,
                                  edge_count) * self.gamma
            exp = self.gamma - 1.0
            sqrt = math.sqrt
            is_sqrt = exp == 0.5
            top = None
            ties = []
            for p in cand_iter:
                sz = sizes[p]
                pen = alpha_g * sqrt(sz) if is_sqrt \
                    else alpha_g * float(sz) ** exp
                s = counts_d[p] - pen
                if top is None or s > top:
                    top = s
                    ties = [p]
                elif s == top:
                    ties.append(p)
            sz_s = sizes[smallest]
            pen_s = alpha_g * sqrt(sz_s) if is_sqrt \
                else alpha_g * float(sz_s) ** exp
            if -pen_s > top:
                return smallest
            if -pen_s == top and smallest not in ties:
                ties.append(smallest)
        if len(ties) == 1:
            return ties[0]
        return ties[self.rng.integers(0, len(ties))]


class Partitioner:
    """One-vertex-at-a-time placement; ``/root/reference/src/partition.rs:23-63``.

    Extension surface (↔ the reference's ``PartitionScorer`` trait,
    ``partition.rs:66-73``): pass custom ``scorer`` / ``sub_scorer`` objects
    implementing ``find_best(nbr_partitions, sizes, num_partitions,
    vertex_count, edge_count, slack) -> int`` to replace the FENNEL greedy at
    either level.
    """

    def __init__(self, config: CuttanaConfig, state: CuttanaState,
                 scorer=None, sub_scorer=None) -> None:
        rng = TieRng(config.seed)
        self.scorer = scorer or FennelScorer(config.gamma, rng)
        self.sub_scorer = sub_scorer or FennelScorer(config.sub_gamma, rng)
        self.state = state

    def partition(self, v: int, nbrs: np.ndarray) -> None:
        st = self.state
        k = st.num_partitions
        num_sub = st.num_sub
        threshold = (1.0 + st.slack) * (st.vertex_count / k)
        if not np.any(st.partition_sizes < threshold):
            raise CapacityError(
                "Partition capacity exceeded. Increase balance_slack or "
                "num_partitions.")

        n = len(nbrs)
        if n:
            nbr_parts = st.part_of[nbrs]
            nbr_parts_l = nbr_parts.tolist()
        else:
            nbr_parts = np.empty(0, dtype=np.int64)
            nbr_parts_l = []
        best = self.scorer.find_best(
            nbr_parts_l, st.partition_sizes, k, st.vertex_count,
            st.edge_count, st.slack)
        st.part_of[v] = best
        st.partition_sizes[best] += 1

        # newly cut edges: later-placed endpoint counts each once
        # (partition.rs:38-44); v itself is placed now, so >= 0 includes v
        # only if v in nbrs (self-loop) — the engine drops self-loops upstream.
        # Sub level within `best`: neighbors' subs only count when the
        # neighbor lives in the same parent partition (partition.rs:46-48).
        # One fancy-index per vertex; all masks in plain Python (degrees
        # are small for the vast majority of vertices).
        nbr_subs_l: list[int] = []
        if n:
            nbr_subs_all = st.sub_of[nbrs].tolist()
            cut = 0
            for p in nbr_parts_l:
                if p >= 0 and p != best:
                    cut += 1
            st.cut_count += cut
            for p, s in zip(nbr_parts_l, nbr_subs_all):
                if p == best:
                    nbr_subs_l.append(s)
        sub_sizes_row = st.sub_sizes[best * num_sub:(best + 1) * num_sub]
        best_sub = self.sub_scorer.find_best(
            nbr_subs_l, sub_sizes_row, num_sub, st.v_eff, st.e_eff, st.slack)
        st.sub_of[v] = best_sub
        g = best * num_sub + best_sub
        st.sub_sizes[g] += 1

        # sub↔sub coarse-graph edge weights for ALL placed neighbors.
        # Divergence from the port: partition.rs:50-62 records only
        # same-partition pairs, so its coarse graph never sees
        # cross-partition adjacency and refinement gains computed on it do
        # not track the true cut (unobservable there — scoring is stubbed).
        # The paper's refinement objective needs the full coarsened graph:
        # with every placed neighbor recorded, a sub-move's scored gain
        # equals its true cut delta exactly.
        if n:
            counts: dict[int, int] = {}
            for p, s in zip(nbr_parts_l, nbr_subs_all):
                if p >= 0:
                    gs = p * num_sub + s
                    if gs != g:
                        counts[gs] = counts.get(gs, 0) + 1
            if counts:
                # symmetric +weight both directions (state.rs:124-135),
                # inlined: one row-dict fetch for g, one per neighbor
                edges = st.sub_edges
                row_g = edges.get(g)
                if row_g is None:
                    row_g = edges[g] = {}
                for s, c in counts.items():
                    row_g[s] = row_g.get(s, 0) + c
                    row_s = edges.get(s)
                    if row_s is None:
                        row_s = edges[s] = {}
                    row_s[g] = row_s.get(g, 0) + c
