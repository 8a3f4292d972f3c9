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


def split_shingle_overlap(ds: "ray.data.Dataset", text_col: str = "text",
                          id_col: str = "doc_id",
                          n: int = 5) -> pa.Table:
    """Cross-split contamination matrix: for the deterministic
    train/val/test hash split (murmur64(doc_id) % 10 — the same
    assignment as ``docs_train_val_test``), count the DISTINCT n-token
    shingles shared by each split pair, plus the shingle-set Jaccard.
    A non-trivial train∩test overlap means the random split leaks
    near-verbatim text across the boundary — the check run before
    trusting any held-out perplexity number.

    Fully distributed: per-batch (split, shingle) pairs are built
    vectorized and deduped in-batch, ONE ``groupby(shingle)`` exchange
    co-locates each shingle's splits and emits its split-pair incidences
    (≤ 6 rows per shingle), and a tiny ``groupby(pair)`` sum finishes.
    Counts are exact ints; only the final Jaccard divides.
    """
    from ray.data.aggregate import Sum

    from cuttana_ray.functions.sketches import murmur64_int

    def tag(batch: pa.Table) -> pa.Table:
        sch = pa.schema([("split", pa.string()), ("s", pa.string())])
        if len(batch) == 0 or text_col not in batch.column_names:
            return sch.empty_table()
        rows, sh = _batch_shingles(batch, text_col, n)
        if len(rows) == 0:
            return sch.empty_table()
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = (murmur64_int(ids) % np.uint64(10)).astype(np.int64)
        split = np.where(b < 8, "train", np.where(b == 8, "val", "test"))
        t = pa.table({"split": pa.array(split[rows].astype(object),
                                        pa.string()),
                      "s": sh})
        return t.group_by(["split", "s"]).aggregate([]).cast(sch)

    from ray.data.aggregate import Count
    pairs = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby(["split", "s"]).aggregate(Count(on="s", alias_name="_c"))

    def cross(t: pa.Table) -> pa.Table:
        sch = pa.schema([("sa", pa.string()), ("sb", pa.string()),
                         ("c", pa.int64())])
        if len(t) == 0:
            return sch.empty_table()
        g = np.sort(np.asarray(t["split"].to_pylist()))
        m = len(g)
        iu, ju = np.triu_indices(m, k=0)
        return pa.table({"sa": pa.array(g[iu], pa.string()),
                         "sb": pa.array(g[ju], pa.string()),
                         "c": pa.array(np.ones(len(iu), np.int64))
                         }).cast(sch)

    agg = pairs.groupby("s").map_groups(cross, batch_format="pyarrow") \
        .groupby(["sa", "sb"]).aggregate(Sum("c", alias_name="shared")) \
        .to_pandas()                       # ≤ 6 rows
    diag = {r["sa"]: int(r["shared"]) for _, r in agg.iterrows()
            if r["sa"] == r["sb"]}
    out = agg[agg["sa"] < agg["sb"]].sort_values(["sa", "sb"])
    jac = [round(int(c) / float(diag[a] + diag[b] - int(c)), 6)
           for a, b, c in zip(out["sa"], out["sb"], out["shared"])]
    return pa.table({
        "split_a": pa.array(out["sa"].tolist(), pa.string()),
        "split_b": pa.array(out["sb"].tolist(), pa.string()),
        "shared_shingles": pa.array([int(v) for v in out["shared"]],
                                    pa.int64()),
        "jaccard": pa.array(jac, pa.float64()),
    })
