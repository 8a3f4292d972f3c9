"""Single-process Cuttana streaming-partitioner core.

This is the stream loop of ``/root/reference/src/cuttana.rs:10-59``, consumed
batch-by-batch so a Ray actor/task can feed it pipelined Arrow batches
(``cuttana_ray.stages.partition_stage``). Per adjacency row ``(v, nbrs)``:

1. ``update_metrics`` (``cuttana.rs:31``).
2. degree >= ``buffer_degree_threshold`` → place immediately and bump
   buffered neighbors' scores (``cuttana.rs:33-35``); else buffer
   (``cuttana.rs:36-38``).
3. buffer at capacity → evict the max-score vertex and place it
   (``cuttana.rs:40-45``).

``finalize()`` drains the buffer (``cuttana.rs:48-51``) then runs
``fix_balance -> refine -> fix_balance`` (``cuttana.rs:53-56``) and projects
the result (``/root/reference/src/result.rs:15-24``).

The core is deliberately sequential — every placement reads all previous
placements — which is why the Ray stage wraps it in ONE actor/task fed by a
stream, with all parallelism before (edge build) and after (metrics,
iterative algorithms) it.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from cuttana_ray.config import CuttanaConfig
from cuttana_ray.state.assignment import PartitionMetrics  # noqa: F401  (re-export)
from cuttana_ray.state.buffer import BufferManager, CuttanaBufferScorer
from cuttana_ray.state.core import CuttanaState, Partitioner
from cuttana_ray.state.refine import Refiner


@dataclass
class PartitionResultData:
    """Final output; mirrors ``/root/reference/src/result.rs:5-12`` plus the
    sub-partition column the engine needs for per-partition lineage."""

    vertices: np.ndarray          # int64 vertex ids (streamed vertices only)
    partitions: np.ndarray        # int32 final partition per vertex
    sub_partitions: np.ndarray    # int64 global sub-partition id per vertex
    partition_sizes: np.ndarray   # int64, len k
    vertex_count: int
    edge_count: int               # directed endpoints, i.e. 2·|E_und| (state.rs:159)
    edge_cut_ratio: float         # stream-time, cut/(2E) (assignment.rs:87-92)
    communication_volume: float   # stream-time, cut/(k·V) (assignment.rs:94-99)
    refine_moves: int

    def assignments(self) -> dict[int, int]:
        return dict(zip(self.vertices.tolist(), self.partitions.tolist()))


class StreamingPartitioner:
    """Batch-feedable wrapper around the sequential core."""

    def __init__(self, num_vertices: int, num_partitions: int,
                 config: CuttanaConfig | None = None,
                 scorer=None, sub_scorer=None, buffer_scorer=None,
                 use_native: bool | None = None) -> None:
        """``scorer`` / ``sub_scorer`` / ``buffer_scorer``: optional custom
        scoring objects (↔ the reference's ``PartitionScorer`` /
        ``BufferScorer`` traits, ``partition.rs:66-73`` /
        ``buffer.rs:121-133``) — the engine's user-extension surface.

        ``use_native``: None (default) auto-selects the compiled C core
        (``state/_native.c``) when all scorers are the defaults and a C
        compiler is available — bit-identical results
        (``tests/test_native_parity.py``), ~30x faster on the sequential
        Amdahl stage. False forces the pure-Python path; True raises if the
        kernel can't be built. Custom scorers always take the Python path."""
        if num_partitions <= 0:
            raise ValueError("Number of partitions must be > 0")
        self.config = config or CuttanaConfig()
        self.state = CuttanaState(num_vertices, num_partitions, self.config)
        self.partitioner = Partitioner(self.config, self.state,
                                       scorer=scorer, sub_scorer=sub_scorer)
        self.buffer = BufferManager(
            self.config.max_buffer_size,
            buffer_scorer or CuttanaBufferScorer(
                self.config.theta, self.config.buffer_degree_threshold))
        self._finalized = False

        self._native = None
        # the C core implements the default relaxed-capacity refine only;
        # the literal move-with-eviction experiment runs the Python path
        defaults = (scorer is None and sub_scorer is None
                    and buffer_scorer is None
                    and not self.config.refine_eviction)
        if use_native is not False and defaults:
            from cuttana_ray.state import native as _nat
            lib = _nat.get_lib()
            if lib is not None:
                self._native = _nat.NativeCore(
                    lib, num_vertices, num_partitions, self.config,
                    self.state.slack)
            elif use_native is True:
                raise RuntimeError(
                    "use_native=True but no C compiler available")
        elif use_native is True and not defaults:
            why = ("the refine_eviction experiment"
                   if self.config.refine_eviction else "custom scorers")
            raise RuntimeError(f"native core does not support {why}; "
                               "use the Python path (use_native=False)")

    # -- streaming --------------------------------------------------------
    def consume(self, v: int, nbrs: np.ndarray) -> None:
        """One adjacency row; the ``cuttana.rs:30-46`` loop body."""
        if self._native is not None:
            nbrs = np.ascontiguousarray(nbrs, dtype=np.int64)
            self._native.consume_batch(
                np.asarray([v], dtype=np.int64),
                np.asarray([0, len(nbrs)], dtype=np.int64), nbrs)
            return
        st = self.state
        st.update_metrics(len(nbrs))

        if len(nbrs) >= self.config.buffer_degree_threshold:
            self.partitioner.partition(v, nbrs)
            self.buffer.update_scores(nbrs)
        else:
            self.buffer.insert(v, nbrs, st.part_of)

        if self.buffer.is_at_capacity():
            ev = self.buffer.evict()
            if ev is not None:
                ev_v, ev_nbrs = ev
                self.partitioner.partition(ev_v, ev_nbrs)
                self.buffer.update_scores(ev_nbrs)

    def consume_batch(self, vertices: np.ndarray, offsets: np.ndarray,
                      flat_nbrs: np.ndarray) -> None:
        """Adjacency batch in CSR-ish layout: row i's neighbors are
        ``flat_nbrs[offsets[i]:offsets[i+1]]`` (zero-copy from an Arrow
        ``list<int64>`` column's offsets/values buffers).

        Runs of consecutive low-degree rows are bulk-inserted into the
        buffer with vectorized scoring — exactly equivalent to the per-row
        loop as long as the buffer stays under capacity for the whole run
        (no eviction could have interleaved, and no placement happens that
        could change scores mid-run); otherwise falls back to per-row
        ``consume`` which preserves the reference's insert/evict
        interleaving (``cuttana.rs:30-46``)."""
        if self._native is not None:
            self._native.consume_batch(vertices, offsets, flat_nbrs)
            return
        st = self.state
        buf = self.buffer
        # the vectorized bulk-insert path hardcodes the CuttanaBufferScorer
        # formula; a custom buffer_scorer (the documented extension surface)
        # must take the exact per-row path instead
        if type(buf.scorer) is not CuttanaBufferScorer:
            for r in range(len(vertices)):
                self.consume(int(vertices[r]),
                             flat_nbrs[offsets[r]:offsets[r + 1]])
            return
        thresh = self.config.buffer_degree_threshold
        degrees = np.diff(offsets)
        n = len(vertices)
        i = 0
        while i < n:
            if degrees[i] >= thresh:
                self.consume(int(vertices[i]),
                             flat_nbrs[offsets[i]:offsets[i + 1]])
                i += 1
                continue
            j = i
            while j < n and degrees[j] < thresh:
                j += 1
            m = j - i
            if len(buf) + m >= buf.capacity:
                for r in range(i, j):
                    self.consume(int(vertices[r]),
                                 flat_nbrs[offsets[r]:offsets[r + 1]])
                i = j
                continue
            # bulk path
            seg_deg = degrees[i:j]
            st.vertex_count += m
            st.edge_count += int(seg_deg.sum())
            st.v_eff = st.vertex_count // st.num_partitions
            st.e_eff = st.edge_count // st.num_partitions
            flat = flat_nbrs[offsets[i]:offsets[j]]
            if flat.size:
                cs = np.concatenate(
                    [[0], np.cumsum(st.part_of[flat] >= 0)])
                starts = (offsets[i:j] - offsets[i]).astype(np.int64)
                ends = (offsets[i + 1:j + 1] - offsets[i]).astype(np.int64)
                placed_counts = cs[ends] - cs[starts]
            else:
                placed_counts = np.zeros(m, dtype=np.int64)
            safe_deg = np.maximum(seg_deg, 1)
            scores = np.where(
                seg_deg > 0,
                buf.scorer.theta * placed_counts / safe_deg
                + seg_deg / buf.scorer.degree_threshold,
                0.0)
            vs = vertices[i:j].tolist()
            sc = scores.tolist()
            buf._score.update(zip(vs, sc))
            for r, v in enumerate(vs):
                buf._nbrs[v] = flat_nbrs[offsets[i + r]:offsets[i + r + 1]]
            buf.bulk_insert(vs, sc)
            i = j

    # -- finalize ---------------------------------------------------------
    def finalize(self) -> PartitionResultData:
        if self._finalized:
            raise RuntimeError("finalize() called twice")
        self._finalized = True

        if self._native is not None:
            res = self._native.finalize()
            self._native.close()
            k = self.state.num_partitions
            ns = self.state.num_sub
            part_of, sub_of = res["part_of"], res["sub_of"]
            vs = np.nonzero(part_of >= 0)[0]
            gsubs = part_of[vs] * ns + sub_of[vs]
            parts = res["sub_parent"][gsubs]
            sizes = np.bincount(parts, minlength=k).astype(np.int64)
            ec, vc = res["edge_count"], res["vertex_count"]
            return PartitionResultData(
                vertices=vs.astype(np.int64),
                partitions=parts.astype(np.int32),
                sub_partitions=gsubs.astype(np.int64),
                partition_sizes=sizes,
                vertex_count=vc,
                edge_count=ec,
                edge_cut_ratio=res["cut_count"] / ec if ec else 0.0,
                communication_volume=(res["cut_count"] / (k * vc)
                                      if vc else 0.0),
                refine_moves=res["refine_moves"],
            )

        while True:  # drain (cuttana.rs:48-51)
            ev = self.buffer.evict()
            if ev is None:
                break
            v, nbrs = ev
            self.partitioner.partition(v, nbrs)
            self.buffer.update_scores(nbrs)

        st = self.state
        refiner = Refiner(st, self.config.balance_slack,
                          self.config.info_gain_threshold,
                          self.config.max_refine_moves)
        refiner.fix_balance(st)
        if self.config.refine_eviction:
            refiner.refine_with_eviction(st)
        else:
            refiner.refine(st)
        refiner.fix_balance(st)

        vs, parts, gsubs = st.final_partition_of_assigned()
        sizes = np.bincount(parts, minlength=st.num_partitions).astype(np.int64)
        return PartitionResultData(
            vertices=vs.astype(np.int64),
            partitions=parts.astype(np.int32),
            sub_partitions=gsubs.astype(np.int64),
            partition_sizes=sizes,
            vertex_count=st.vertex_count,
            edge_count=st.edge_count,
            edge_cut_ratio=st.edge_cut_ratio(),
            communication_volume=st.communication_volume(),
            refine_moves=refiner.moves_applied,
        )


def cuttana_partition(adjacency: list[tuple[int, list[int]]],
                      num_partitions: int,
                      config: CuttanaConfig | None = None) -> PartitionResultData:
    """In-memory convenience API mirroring ``cuttana_partition``
    (``/root/reference/src/cuttana.rs:10-59``) for tests and small graphs."""
    max_v = -1
    for v, nbrs in adjacency:
        max_v = max(max_v, v, max(nbrs, default=-1))
    sp = StreamingPartitioner(max_v + 1, num_partitions, config)
    for v, nbrs in adjacency:
        sp.consume(int(v), np.asarray(nbrs, dtype=np.int64))
    return sp.finalize()
