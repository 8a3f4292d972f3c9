"""Adjacency-list sources mirroring the reference's vertex stream.

* ``read_adjacency_text`` ↔ ``VertexStream::from_csv``
  (``/root/reference/src/stream.rs:23-55``): one vertex + neighbor list per
  line, space or comma delimited; blank lines dropped; parse errors raise.
  Re-expressed as ``ray.data.read_text`` → vectorized parse in
  ``map_batches`` (no per-row Python in the reader itself beyond the split —
  adjacency text is a test-compat format, Parquet is the engine-native one).
* ``from_adjacency_list`` ↔ ``VertexStream::from_adjacency_list``
  (``/root/reference/src/stream.rs:57-61``): in-memory test seam.

Adjacency table schema: ``vertex: int64, nbrs: list<int64>, degree: int64``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

ADJACENCY_SCHEMA = pa.schema([
    ("vertex", pa.int64()),
    ("nbrs", pa.large_list(pa.int64())),
    ("degree", pa.int64()),
])


def adjacency_table(rows: list[tuple[int, list[int]]]) -> pa.Table:
    vertices = pa.array([int(v) for v, _ in rows], type=pa.int64())
    nbrs = pa.array([[int(n) for n in ns] for _, ns in rows],
                    type=pa.large_list(pa.int64()))
    degree = pa.array([len(ns) for _, ns in rows], type=pa.int64())
    return pa.table({"vertex": vertices, "nbrs": nbrs, "degree": degree})


def from_adjacency_list(rows: list[tuple[int, list[int]]]) -> "ray.data.Dataset":
    """In-memory adjacency rows → Dataset (test seam, ``stream.rs:57-61``)."""
    return ray.data.from_arrow(adjacency_table(rows))


def _parse_lines(batch: pa.Table, delimiter: str | None) -> pa.Table:
    out_v, out_nbrs = [], []
    for line in batch["text"].to_pylist():
        line = line.strip()
        if not line:
            continue  # stream.rs:28-32 drops empty lines
        items = line.split(delimiter)
        if delimiter is not None:
            items = [s.strip() for s in items]
            items = [s for s in items if s]
        if not items:
            continue
        out_v.append(int(items[0]))  # parse failure raises, like stream.rs:43-47
        out_nbrs.append([int(s) for s in items[1:]])
    return pa.table({
        "vertex": pa.array(out_v, type=pa.int64()),
        "nbrs": pa.array(out_nbrs, type=pa.large_list(pa.int64())),
        "degree": pa.array([len(n) for n in out_nbrs], type=pa.int64()),
    })


def read_adjacency_text(path: str, delimiter: str = "space") -> "ray.data.Dataset":
    """Adjacency text file → adjacency Dataset. ``delimiter``: "space"|"comma"
    (``/root/reference/src/stream.rs:5-8``)."""
    delim = None if delimiter == "space" else ","
    ds = ray.data.read_text(path)
    return ds.map_batches(lambda b: _parse_lines(b, delim),
                          batch_format="pyarrow")


def csr_batch(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Zero-copy view of one adjacency batch as (vertices, offsets, flat_nbrs)
    for ``StreamingPartitioner.consume_batch``."""
    vertices = batch["vertex"].to_numpy(zero_copy_only=False)
    nbrs = batch["nbrs"].combine_chunks()
    if isinstance(nbrs, pa.ChunkedArray):
        nbrs = nbrs.combine_chunks()
    offsets = nbrs.offsets.to_numpy(zero_copy_only=False)
    values = nbrs.values.to_numpy(zero_copy_only=False) if len(nbrs.values) \
        else np.empty(0, dtype=np.int64)
    return vertices, offsets, values
