"""DSIR-style importance weights for data selection.

Implements the hashed-n-gram importance-resampling estimator of Xie et
al., "Data Selection for Language Models via Importance Resampling"
(NeurIPS 2023): tokens hash into a fixed number of buckets, a target
corpus and the raw corpus each induce a multinomial over buckets, and a
document's importance weight is the log-likelihood ratio of its bucket
counts under the two (add-1-smoothed) models. Documents scoring high look
like the target distribution and are preferred when resampling training
data.

Scale shape: the bucket distributions are O(n_buckets) — a fixed small
constant — so one ``map_batches`` pass emits per-block ``(bucket, raw_n,
tgt_n)`` partials and the driver folds them into two length-B arrays (the
same bounded-partials regime as ``embeddings.kmeans``). The per-document
scoring pass broadcasts the B log-ratios via ``ray.put`` and is one
vectorized Arrow/NumPy pass: regex tokenization across the whole batch,
the corpus-standard vectorized FNV-1a (``dedup._hash_strings``) for
bucketing, and a segment sum over list-parent indices for the per-doc
rollup. The raw text never keys an exchange; in fact nothing shuffles at
all — both passes are embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cuttana_ray.functions.dedup import _hash_strings


def _tokens(batch: pa.Table, text_col: str):
    """Lowercased ``\\w+`` tokens across the whole batch: flat token array
    plus the parent doc index per token (empties removed)."""
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(batch[text_col], "")), pattern=r"\W+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(
        zero_copy_only=False)
    return flat.filter(pa.array(keep)), parents[keep]


def dsir_weights(ds: "ray.data.Dataset", n_buckets: int = 256,
                 target_mod: int = 17, text_col: str = "text",
                 id_col: str = "doc_id") -> "ray.data.Dataset":
    """Per-document DSIR importance weight against a deterministic target.

    The "target" corpus is the subset with ``id_col % target_mod == 0`` —
    a stand-in for the small curated eval/target set the real method
    takes as input (deterministic so tests and the SQL oracle can replay
    it; pass the real target distribution at the call site in production
    by swapping the predicate).

    weight(doc) = Σ_tokens [ log p_target(bucket) − log p_raw(bucket) ]
    with add-1 smoothing over ``n_buckets`` buckets; bucket =
    FNV-1a(token) mod ``n_buckets``.

    Output: ``(doc_id, n_tokens:int64, weight:float64)`` for every input
    row, weight rounded to 6 decimals (0.0 for token-free docs).
    """
    import ray

    part_schema = pa.schema([("bucket", pa.int64()), ("raw_n", pa.int64()),
                             ("tgt_n", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return part_schema.empty_table()
        flat, parents = _tokens(batch, text_col)
        if len(flat) == 0:
            return part_schema.empty_table()
        b = (_hash_strings(flat) % np.uint64(n_buckets)).astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        is_tgt = (ids[parents] % target_mod) == 0
        raw = np.bincount(b, minlength=n_buckets)
        tgt = np.bincount(b[is_tgt], minlength=n_buckets)
        nz = raw > 0
        return pa.table({
            "bucket": pa.array(np.nonzero(nz)[0], pa.int64()),
            "raw_n": pa.array(raw[nz], pa.int64()),
            "tgt_n": pa.array(tgt[nz], pa.int64())})

    raw = np.zeros(n_buckets, np.int64)
    tgt = np.zeros(n_buckets, np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(b) == 0:
            continue
        bk = b["bucket"].to_numpy(zero_copy_only=False)
        np.add.at(raw, bk, b["raw_n"].to_numpy(zero_copy_only=False))
        np.add.at(tgt, bk, b["tgt_n"].to_numpy(zero_copy_only=False))

    lam = (np.log((tgt + 1.0) / (tgt.sum() + n_buckets))
           - np.log((raw + 1.0) / (raw.sum() + n_buckets)))
    lref = ray.put(lam)

    out_schema = pa.schema([(id_col, pa.int64()), ("n_tokens", pa.int64()),
                            ("weight", pa.float64())])

    def score(batch: pa.Table, _lref=lref) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        lam = ray.get(_lref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, parents = _tokens(batch, text_col)
        n_tok = np.bincount(parents, minlength=len(batch)).astype(np.int64)
        w = np.zeros(len(batch), np.float64)
        if len(flat):
            b = (_hash_strings(flat)
                 % np.uint64(n_buckets)).astype(np.int64)
            np.add.at(w, parents, lam[b])
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_tokens": pa.array(n_tok, pa.int64()),
                         "weight": pa.array(np.round(w, 6), pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow")
