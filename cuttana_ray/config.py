"""Configuration for the Cuttana streaming partitioner.

Semantics mirror the reference hyper-parameter bag
(``/root/reference/src/config.rs:1-57``): same eight scalars, same defaults,
same ``balance_slack >= 0`` validation. Two additions that the reference
lacks (it is non-deterministic, ``/root/reference/src/partition.rs:83-86``):

* ``seed`` — tie-breaks in the partition scorer use a seeded RNG so results
  are reproducible run-to-run and across cluster sizes.
* ``max_refine_moves`` — safety bound on the refinement loop (the reference's
  refinement scoring is stubbed, ``/root/reference/src/refine.rs:91,118,136``;
  we implement the real scoring, which needs a termination backstop).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class CuttanaConfig:
    """Hyper-parameters; defaults match ``/root/reference/src/config.rs:42-57``."""

    num_sub_partitions: int = 4096
    balance_slack: float = 0.05
    max_buffer_size: int = 1_000_000
    buffer_degree_threshold: int = 100
    gamma: float = 1.5
    sub_gamma: float = 1.0
    theta: float = 2.0
    info_gain_threshold: int = 0
    seed: int = 42
    max_refine_moves: int = 200_000
    # strict-parity experiment flag: use the literal move-with-eviction
    # refine plan (refine.rs:107-152 shape, real scoring, overflow fixed)
    # instead of the default relaxed-capacity greedy loop — see
    # state/refine.py::Refiner.refine_with_eviction
    refine_eviction: bool = False

    def __post_init__(self) -> None:
        if self.balance_slack < 0.0:
            raise ValueError("balance_slack must be >= 0")
        if self.num_sub_partitions <= 0:
            raise ValueError("num_sub_partitions must be > 0")
        if self.max_buffer_size <= 0:
            raise ValueError("max_buffer_size must be > 0")
