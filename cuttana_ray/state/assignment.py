"""Vertex → partition assignment bookkeeping.

Semantics mirror ``/root/reference/src/assignment.rs:5-100``:

* ``assign`` inserts into the vertex→partition map and bumps the size counter
  (``assignment.rs:28-32``).
* ``has_room_in_partition(p)``: ``size(p) < (1+slack) * vertex_count / k``
  (``assignment.rs:38-41``) — note ``vertex_count`` is the *running* metric,
  so the constraint tightens as the stream progresses.
* ``smallest_partition``: argmin over sizes, first index on ties
  (``assignment.rs:54-63``).
* Metrics: ``edge_cut_ratio = cut_count / edge_count`` (``assignment.rs:87-92``;
  with each undirected edge appearing twice in the adjacency stream this is
  cut-edges / (2·|E_undirected|)) and
  ``communication_volume = cut_count / (k · vertex_count)``
  (``assignment.rs:94-99``).

Vertices here are dense ``int`` ids (the engine dictionary-encodes string
node names first); partition sizes live in a NumPy int64 array so the FENNEL
scorer can vectorize over them.
"""

from __future__ import annotations

import numpy as np


class PartitionMetrics:
    """Running counters, mirroring ``/root/reference/src/assignment.rs:68-100``."""

    __slots__ = ("vertex_count", "edge_count", "cut_count", "num_partitions")

    def __init__(self, num_partitions: int) -> None:
        if num_partitions <= 0:
            raise ValueError("Number of partitions must be > 0")
        self.vertex_count = 0
        self.edge_count = 0
        self.cut_count = 0
        self.num_partitions = num_partitions

    def edge_cut_ratio(self) -> float:
        if self.edge_count == 0:
            return 0.0
        return self.cut_count / self.edge_count

    def communication_volume(self) -> float:
        if self.vertex_count == 0:
            return 0.0
        return self.cut_count / (self.num_partitions * self.vertex_count)


class PartitionAssignment:
    """Mutable assignment state for one level (global partitions or the
    sub-partitions of one parent partition)."""

    __slots__ = ("assignments", "partition_sizes", "num_partitions", "metrics",
                 "balance_slack")

    def __init__(self, num_partitions: int, balance_slack: float) -> None:
        self.assignments: dict[int, int] = {}
        self.partition_sizes = np.zeros(num_partitions, dtype=np.int64)
        self.num_partitions = num_partitions
        self.balance_slack = balance_slack
        self.metrics = PartitionMetrics(num_partitions)

    def assign(self, v: int, p: int) -> None:
        self.assignments[v] = p
        self.partition_sizes[p] += 1

    def partition_of(self, v: int) -> int | None:
        return self.assignments.get(v)

    def _room_threshold(self) -> float:
        return (1.0 + self.balance_slack) * (
            self.metrics.vertex_count / self.num_partitions
        )

    def has_room_in_partition(self, p: int) -> bool:
        return float(self.partition_sizes[p]) < self._room_threshold()

    def has_room(self) -> bool:
        return bool(np.any(self.partition_sizes < self._room_threshold()))

    def smallest_partition(self) -> int:
        return int(np.argmin(self.partition_sizes))
