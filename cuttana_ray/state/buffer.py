"""Bounded priority buffer of not-yet-placed vertices.

Semantics mirror ``/root/reference/src/buffer.rs``:

* Ordered structure keyed by ``(score, vertex)`` with max-eviction —
  the reference uses a ``BTreeMap<BufferKey, nbrs>`` and evicts
  ``last_key_value`` (``buffer.rs:46-61``). We use a LAZY-DELETION HEAP:
  a ``heapq`` of ``(-score, -vertex)`` entries plus an authoritative
  ``vertex -> score`` dict; rescoring pushes a new entry and eviction
  pops until the entry matches the authoritative score. Total order is
  identical to the reference's BTreeMap (score first, vertex id breaks
  ties, ``buffer.rs:113-118``) — max score, then max vertex — so the
  eviction sequence is bit-for-bit the same as the previous
  ``SortedList`` implementation, at O(log n) pushes with C-implemented
  heap ops instead of O(n) list deletions.
* ``is_at_capacity``: ``len >= capacity`` (``buffer.rs:32-34``).
* ``update_score``: rescore dict + lazy push (``buffer.rs:63-89``).

Scoring (``CuttanaBufferScorer``, ``buffer.rs:135-169``):

* initial:  ``theta * (frac of nbrs already partitioned) + degree / degree_threshold``
* incremental (one more neighbor placed): ``old + theta / degree``

Divergence from the reference: a zero-degree vertex would score ``0/0 = NaN``
there (BufferKey treats NaN as equal-to-everything, ``buffer.rs:113-118``);
we score it ``0.0`` so ordering stays total. Vertices are dense ints.
"""

from __future__ import annotations

import heapq

import numpy as np


class CuttanaBufferScorer:
    """Eviction-priority scorer; formulas from ``/root/reference/src/buffer.rs:150-168``."""

    __slots__ = ("theta", "degree_threshold")

    def __init__(self, theta: float, degree_threshold: int) -> None:
        self.theta = theta
        self.degree_threshold = float(degree_threshold)

    def score(self, nbrs: np.ndarray, part_of: np.ndarray) -> float:
        """``part_of``: dense vertex→partition array, -1 = unplaced (the
        reference checks ``partition_of(nbr).is_some()``, ``buffer.rs:152-156``)."""
        degree = len(nbrs)
        if degree == 0:
            return 0.0
        num_placed = int(np.count_nonzero(part_of[nbrs] >= 0))
        return self.theta * (num_placed / degree) + degree / self.degree_threshold

    def update_score(self, old_score: float, nbrs: np.ndarray) -> float:
        # degree 0 (possible only with asymmetric adjacency input): keep the
        # 0.0 score rather than the reference's theta/0 = inf, consistent
        # with the NaN-avoidance divergence documented in the module header
        degree = len(nbrs)
        if degree == 0:
            return old_score
        return old_score + self.theta / degree


class BufferManager:
    """Bounded max-priority buffer (``/root/reference/src/buffer.rs:7-90``)."""

    __slots__ = ("_heap", "_score", "_nbrs", "capacity", "scorer")

    def __init__(self, capacity: int, scorer: CuttanaBufferScorer) -> None:
        self._heap: list[tuple[float, int]] = []  # (-score, -vertex), lazy
        self._score: dict[int, float] = {}        # vertex -> current score
        self._nbrs: dict[int, np.ndarray] = {}    # vertex -> neighbor ids
        self.capacity = capacity
        self.scorer = scorer

    def __len__(self) -> int:
        return len(self._score)

    def is_at_capacity(self) -> bool:
        return len(self._score) >= self.capacity

    def insert(self, v: int, nbrs: np.ndarray, part_of: np.ndarray) -> None:
        score = self.scorer.score(nbrs, part_of)
        self._score[v] = score
        self._nbrs[v] = nbrs
        heapq.heappush(self._heap, (-score, -v))

    def bulk_insert(self, vertices: list[int], scores: list[float]) -> None:
        """Heap entries for pre-scored vertices (the vectorized stream
        path); callers fill ``_score``/``_nbrs`` themselves."""
        self._heap.extend(zip((-s for s in scores), (-v for v in vertices)))
        heapq.heapify(self._heap)

    def evict(self) -> tuple[int, np.ndarray] | None:
        """Pop the max-(score, vertex) entry, like BTreeMap ``last_key_value``.

        Lazy deletion: entries whose score no longer matches the
        authoritative dict (rescored or already evicted) are skipped."""
        heap = self._heap
        score = self._score
        while heap:
            negs, negv = heapq.heappop(heap)
            v = -negv
            cur = score.get(v)
            if cur is not None and cur == -negs:
                del score[v]
                return v, self._nbrs.pop(v)
        return None

    def update_scores(self, nbrs: np.ndarray) -> None:
        score = self._score
        scorer = self.scorer
        nbrs_map = self._nbrs
        heap = self._heap
        for n in nbrs.tolist():
            old = score.get(n)
            if old is None:
                continue
            new = scorer.update_score(old, nbrs_map[n])
            score[n] = new
            heapq.heappush(heap, (-new, -n))

    def update_score(self, v: int) -> None:
        old = self._score.get(v)
        if old is None:
            return
        new = self.scorer.update_score(old, self._nbrs[v])
        self._score[v] = new
        heapq.heappush(self._heap, (-new, -v))
