"""Benchmark decontamination: flag training documents sharing any n-token
shingle with a (small) benchmark/eval set — the standard contamination
check run before training on web-scale corpora.

Shape: the benchmark side is SMALL by definition (eval sets are a few
thousand docs), so its distinct shingles are collected once and broadcast
(``ray.put``, zero-copy to every task) — never a shuffle join. The
training side streams: per batch, shingles are built vectorized from the
token-list offsets (no Python loop over rows or tokens) and membership is
one Arrow ``is_in`` kernel against the broadcast value set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _batch_shingles(batch: pa.Table, text_col: str,
                    n: int) -> "tuple[np.ndarray, pa.Array]":
    """(row index per shingle, shingle string) for every n-token window.
    Tokens are whitespace splits; shingles join tokens with one space —
    byte-identical to ``w1 || ' ' || w2 …`` in SQL."""
    text = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
    arr = pc.split_pattern(text, " ")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten()
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.maximum(np.diff(offsets) - (n - 1), 0)
    total = int(counts.sum())
    if total == 0:
        return np.array([], dtype=np.int64), pa.array([], pa.string())
    base = np.repeat(offsets[:-1], counts)
    within = np.arange(total, dtype=np.int64) - \
        np.repeat(np.cumsum(counts) - counts, counts)
    idx = base + within
    parts = [flat.take(pa.array(idx + j)) for j in range(n)]
    shingles = pc.binary_join_element_wise(*parts, " ")
    rows = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    return rows, shingles


def benchmark_shingles(bench: "ray.data.Dataset", text_col: str = "text",
                       n: int = 5) -> pa.Array:
    """Distinct n-token shingles of the benchmark set (small side; the
    per-batch partials are already deduped, so the driver union touches
    distinct strings only)."""
    def distinct(batch: pa.Table) -> pa.Table:
        _, sh = _batch_shingles(batch, text_col, n)
        return pa.table({"s": pc.unique(sh)})

    parts = bench.map_batches(distinct, batch_format="pyarrow")
    seen: set = set()
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        seen.update(b["s"].to_pylist())
    return pa.array(sorted(seen), pa.string())


def decontaminate(ds: "ray.data.Dataset", bench_set: pa.Array,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 5) -> "ray.data.Dataset":
    """Per-document contamination counts against the broadcast benchmark
    shingle set: (id, n_hits = matching shingle POSITIONS, contaminated).
    Every input document appears exactly once (zero-hit docs included)."""
    set_ref = ray.put(bench_set)

    # plain tasks: the broadcast shingle set is a zero-copy node-local
    # ``ray.get`` per task, no per-worker prep — no actor-pool spin-up
    # (see stages/vocab.py encode_edges for the measurement)
    def check(batch: pa.Table) -> pa.Table:
        schema = pa.schema([(id_col, pa.int64()),
                            ("n_hits", pa.int64()),
                            ("contaminated", pa.bool_())])
        if len(batch) == 0 or text_col not in batch.column_names:
            return schema.empty_table()
        value_set = ray.get(set_ref)
        rows, sh = _batch_shingles(batch, text_col, n)
        hits = np.zeros(len(batch), dtype=np.int64)
        if len(rows):
            isin = pc.is_in(sh, value_set=value_set) \
                .to_numpy(zero_copy_only=False)
            np.add.at(hits, rows, isin.astype(np.int64))
        return pa.table({
            id_col: pc.cast(batch[id_col], pa.int64()),
            "n_hits": pa.array(hits, pa.int64()),
            "contaminated": pa.array(hits > 0, pa.bool_()),
        }).cast(schema)

    return ds.map_batches(check, batch_format="pyarrow")
