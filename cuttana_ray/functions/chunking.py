"""Context-window document chunking — the step between cleaned documents
and a token-budgeted training set (the sliding-window sibling of
``functions/packing.py``'s concatenate-and-chunk).

``chunk_documents`` splits each document's whitespace tokens into
fixed-size windows with a configurable overlap (stride = size - overlap)
and re-materializes each window's text. Everything is one ``map_batches``
pass of pure Arrow/NumPy kernels — regex split in C++, window expansion
via the repeat/cumsum gather (the same gap-loop vectorization as
``pipelines/linkpred.py``), token re-join via ``pc.binary_join`` — no
Python rows, no shuffle, output streams. Chunk text is defined as the
window's tokens joined by a single space, which makes the operator exactly
SQL-expressible (DuckDB ``string_split_regex`` + list slicing replays it
byte-for-byte; see ``chunk_docs`` in ``__ray_entry__.py``).

Reference scope note: the reference engine has no text operators at all
(SURVEY.md §2.4) — this belongs to the engine-designed LLM-training-data
family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_SCHEMA_COLS = [("chunk_idx", pa.int64()), ("tok_start", pa.int64()),
                ("tok_end", pa.int64()), ("n_chunk_tokens", pa.int64()),
                ("chunk_text", pa.string())]


def chunk_documents(ds: "ray.data.Dataset", chunk_size: int = 64,
                    overlap: int = 16, text_col: str = "text",
                    id_col: str = "doc_id") -> "ray.data.Dataset":
    """``(doc_id, chunk_idx, tok_start, tok_end, n_chunk_tokens,
    chunk_text)`` — one row per sliding window of ``chunk_size``
    whitespace tokens advancing by ``chunk_size - overlap``. The final
    window is truncated at the document end; documents with zero tokens
    emit nothing. Token indices are 0-based half-open."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap

    def chunks(t: pa.Table) -> pa.Table:
        id_type = t.schema.field(id_col).type if id_col in t.column_names \
            else pa.int64()
        if len(t) == 0:
            return pa.table(
                {id_col: pa.array([], id_type),
                 **{n: pa.array([], typ) for n, typ in _SCHEMA_COLS}})
        text = pc.cast(t[text_col], pa.string())
        toks = pc.split_pattern_regex(text, pattern=r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        vals = toks.flatten()
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(vals, "")
        keep_np = keep.to_numpy(zero_copy_only=False)
        nrows = len(t)
        # per-doc non-empty token count + compacted token value array
        n = np.bincount(parent[keep_np], minlength=nrows).astype(np.int64)
        vals_kept = vals.filter(keep)
        doc_start = np.concatenate(([0], np.cumsum(n)[:-1]))

        n_chunks = np.where(
            n == 0, 0,
            np.where(n <= chunk_size, 1,
                     1 + (n - chunk_size + stride - 1) // stride))
        total_chunks = int(n_chunks.sum())
        row_idx = np.repeat(np.arange(nrows), n_chunks)
        cum_excl = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
        chunk_idx = np.arange(total_chunks) - np.repeat(cum_excl, n_chunks)
        tok_start = chunk_idx * stride
        tok_end = np.minimum(tok_start + chunk_size, n[row_idx])
        counts = tok_end - tok_start

        # gather each window's tokens out of the compacted value array
        abs_start = doc_start[row_idx] + tok_start
        total_toks = int(counts.sum())
        gcum = np.concatenate(([0], np.cumsum(counts)[:-1]))
        gidx = (np.arange(total_toks) - np.repeat(gcum, counts)
                + np.repeat(abs_start, counts))
        gathered = vals_kept.take(pa.array(gidx, pa.int64()))
        if isinstance(gathered, pa.ChunkedArray):
            gathered = gathered.combine_chunks()
        # int32 offsets are safe: this is per-batch token count, not global
        offsets = pa.array(np.concatenate(([0], np.cumsum(counts))),
                           pa.int32())
        windows = pa.ListArray.from_arrays(offsets,
                                           pc.cast(gathered, pa.string()))
        chunk_text = pc.binary_join(windows, " ")

        return pa.table({
            id_col: t[id_col].take(pa.array(row_idx, pa.int64())),
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "tok_start": pa.array(tok_start, pa.int64()),
            "tok_end": pa.array(tok_end, pa.int64()),
            "n_chunk_tokens": pa.array(counts, pa.int64()),
            "chunk_text": pc.cast(chunk_text, pa.string()),
        })

    return ds.map_batches(chunks, batch_format="pyarrow")
