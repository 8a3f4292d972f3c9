"""Bounded priority buffer of not-yet-placed vertices.

Semantics mirror ``/root/reference/src/buffer.rs``:

* Ordered structure keyed by ``(score, vertex)`` with max-eviction —
  the reference uses a ``BTreeMap<BufferKey, nbrs>`` and evicts
  ``last_key_value`` (``buffer.rs:46-61``); we use a
  ``sortedcontainers.SortedList`` of ``(score, vertex)`` tuples (same total
  order: score first, vertex id breaks ties, ``buffer.rs:113-118``).
* ``is_at_capacity``: ``len >= capacity`` (``buffer.rs:32-34``).
* ``update_score``: remove old key, rescore, reinsert (``buffer.rs:63-89``).

Scoring (``CuttanaBufferScorer``, ``buffer.rs:135-169``):

* initial:  ``theta * (frac of nbrs already partitioned) + degree / degree_threshold``
* incremental (one more neighbor placed): ``old + theta / degree``

Divergence from the reference: a zero-degree vertex would score ``0/0 = NaN``
there (BufferKey treats NaN as equal-to-everything, ``buffer.rs:113-118``);
we score it ``0.0`` so ordering stays total. Vertices are dense ints.
"""

from __future__ import annotations

from sortedcontainers import SortedList

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
        return old_score + self.theta / len(nbrs)


class BufferManager:
    """Bounded max-priority buffer (``/root/reference/src/buffer.rs:7-90``)."""

    __slots__ = ("_order", "_score", "_nbrs", "capacity", "scorer")

    def __init__(self, capacity: int, scorer: CuttanaBufferScorer) -> None:
        self._order: SortedList = SortedList()   # (score, vertex) tuples
        self._score: dict[int, float] = {}       # vertex -> score
        self._nbrs: dict[int, np.ndarray] = {}   # vertex -> neighbor ids
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
        self._order.add((score, v))

    def evict(self) -> tuple[int, np.ndarray] | None:
        """Pop the max-(score, vertex) entry, like BTreeMap ``last_key_value``."""
        if not self._order:
            return None
        score, v = self._order.pop(-1)
        del self._score[v]
        return v, self._nbrs.pop(v)

    def update_scores(self, nbrs: np.ndarray) -> None:
        for n in nbrs:
            self.update_score(int(n))

    def update_score(self, v: int) -> None:
        old = self._score.get(v)
        if old is None:
            return
        self._order.remove((old, v))
        new = self.scorer.update_score(old, self._nbrs[v])
        self._order.add((new, v))
        self._score[v] = new
