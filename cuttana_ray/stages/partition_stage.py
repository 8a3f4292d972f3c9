"""Ray Data integration of the Cuttana streaming partitioner.

The Cuttana pass is inherently sequential — each placement reads all prior
placements (``/root/reference/src/cuttana.rs:30-46``) — so it runs as ONE
Ray task consuming the adjacency Dataset through ``streaming_split(1)``:
blocks stream from the object store into the task with backpressure, the
driver never touches the data, and all parallelism lives in the stages
before (edge build, sort) and after (metrics, iterative algorithms). This is
the "stateful actor fed by pipelined Arrow batches" design from SURVEY.md
§2.3 / §4; the single sequential stage is the Amdahl term and is O(V+E)
dict/array ops.

Feed order: adjacency sorted by vertex id, consumed with
``preserve_order=True`` — Cuttana's output depends on stream order
(``cuttana.rs:30``), so the engine pins a canonical deterministic order to
make results reproducible across runs and cluster sizes (the reference
inherits arbitrary file order and an unseeded RNG instead).

Also here: the mod-k hash baseline the Cuttana partitioner must beat on
edge-cut (SURVEY.md §7 P2).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pyarrow as pa
import ray
import ray.data

from cuttana_ray.config import CuttanaConfig
from cuttana_ray.sources.adjacency import csr_batch
from cuttana_ray.state.partitioner import StreamingPartitioner

ASSIGNMENT_SCHEMA = pa.schema([
    ("vertex", pa.int64()), ("partition", pa.int32()),
    ("sub_partition", pa.int64()),
])


@ray.remote
def _consume_stream(split, num_vertices: int, num_partitions: int,
                    config: CuttanaConfig):
    import time
    t0 = time.perf_counter()
    sp = StreamingPartitioner(num_vertices, num_partitions, config)
    for batch in split.iter_batches(batch_format="pyarrow", batch_size=8192):
        vertices, offsets, flat = csr_batch(batch)
        sp.consume_batch(vertices, offsets, flat)
    t_stream = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = sp.finalize()
    t_finalize = time.perf_counter() - t0
    table = pa.table({
        "vertex": pa.array(res.vertices, pa.int64()),
        "partition": pa.array(res.partitions, pa.int32()),
        "sub_partition": pa.array(res.sub_partitions, pa.int64()),
    })
    info = {
        "vertex_count": res.vertex_count,
        "edge_count": res.edge_count,
        "edge_cut_ratio_stream": res.edge_cut_ratio,
        "communication_volume_stream": res.communication_volume,
        "partition_sizes": res.partition_sizes.tolist(),
        "refine_moves": res.refine_moves,
        "stream_seconds": round(t_stream, 3),
        "finalize_seconds": round(t_finalize, 3),
        "num_partitions": num_partitions,
        "config": dataclasses.asdict(config),
    }
    return table, info


def run_cuttana_partition(
        adjacency: "ray.data.Dataset", num_vertices: int, num_partitions: int,
        config: CuttanaConfig | None = None,
) -> tuple["ray.data.Dataset", dict]:
    """Adjacency Dataset → (assignments Dataset, stream-time metrics).

    ``assignments``: ``vertex:int64, partition:int32, sub_partition:int64``
    (↔ ``PartitionResult``, ``/root/reference/src/result.rs:5-12``, plus the
    global sub-partition id for lineage). Stream-time cut metrics are frozen
    at stream time exactly like the reference (refinement never updates
    ``cut_count`` there); post-refinement metrics come from
    ``cuttana_ray.stages.metrics.partition_quality`` over the labeled edges.
    """
    config = config or CuttanaConfig()
    ctx = ray.data.DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        feed = adjacency.sort("vertex")
        split = feed.streaming_split(1, equal=False)[0]
        table, info = ray.get(_consume_stream.remote(
            split, num_vertices, num_partitions, config))
    finally:
        ctx.execution_options.preserve_order = prev
    return ray.data.from_arrow(table), info


def hash_partition_baseline(num_vertices: int,
                            num_partitions: int) -> "ray.data.Dataset":
    """The comparator baseline: ``partition = vertex mod k`` (deterministic
    and SQL-expressible so the DuckDB oracle can reproduce cut metrics)."""
    vs = np.arange(num_vertices, dtype=np.int64)
    return ray.data.from_arrow(pa.table({
        "vertex": pa.array(vs),
        "partition": pa.array((vs % num_partitions).astype(np.int32)),
        "sub_partition": pa.array(vs % num_partitions, pa.int64()),
    }))
