"""Cuttana partitioner state: buffer, scorers, two-level state, refinement.

Single-process sequential core (the reference algorithm is one streaming
pass, ``/root/reference/src/cuttana.rs:30-56``); the Ray Data integration
that feeds it lives in ``cuttana_ray.stages.partition_stage``.
"""

from cuttana_ray.state.buffer import BufferManager, CuttanaBufferScorer
from cuttana_ray.state.core import CapacityError, CuttanaState, FennelScorer, Partitioner
from cuttana_ray.state.partitioner import (
    PartitionResultData,
    StreamingPartitioner,
    cuttana_partition,
)
from cuttana_ray.state.refine import Refiner, compute_edge_cuts

__all__ = [
    "BufferManager",
    "CapacityError",
    "CuttanaBufferScorer",
    "CuttanaState",
    "FennelScorer",
    "Partitioner",
    "PartitionResultData",
    "Refiner",
    "StreamingPartitioner",
    "compute_edge_cuts",
    "cuttana_partition",
]
