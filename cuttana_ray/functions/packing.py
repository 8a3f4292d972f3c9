"""Training-sequence packing (SURVEY.md §2.4 engine-designed category:
LLM pretraining concatenates documents into one token stream and cuts it
into fixed-length sequences; every doc needs to know which sequences it
lands in — absent from the reference, whose records are graph edges).

``sequence_pack`` is the deterministic concatenate-and-chunk formulation
(GPT-style packing): documents ordered by id form one virtual token
stream; sequence ``s`` covers tokens ``[s·L, (s+1)·L)``. The whole op is
a per-doc token count (one vectorized regex kernel per batch) plus ONE
global running sum — reusing ``stages/running.py``'s single-sort +
O(#blocks) carry chain — and a final vectorized projection. No
materialization, no driver-side token state; exactly one exchange (the
sort) at any scale. All outputs are exact int64, so the DuckDB
``SUM() OVER`` oracle matches bit for bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from cuttana_ray.functions.textstats import token_stats
from cuttana_ray.stages.running import running_agg


def sequence_pack(ds: "ray.data.Dataset", seq_len: int,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> "ray.data.Dataset":
    """Pack documents (in ``id_col`` order) into ``seq_len``-token
    sequences.

    Output per doc: ``n_tokens``, ``tok_start`` (global stream offset),
    ``seq_first`` / ``seq_last`` (ids of the first/last sequence the doc
    touches), ``seq_offset`` (position within ``seq_first``), ``n_seqs``
    (sequences spanned). Tokenization is the whitespace split of
    ``token_stats`` (oracle-compatible).
    """
    toks = token_stats(ds, text_col=text_col, id_col=id_col) \
        .select_columns([id_col, "n_tokens"])
    keyed = toks.map_batches(
        lambda t: t.append_column("k", pa.array(np.zeros(len(t), np.int64))),
        batch_format="pyarrow")
    run = running_agg(keyed, "k", [id_col], "n_tokens",
                      keep=[id_col, "n_tokens"])

    def project(t: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            (id_col, pa.int64()), ("n_tokens", pa.int64()),
            ("tok_start", pa.int64()), ("seq_first", pa.int64()),
            ("seq_last", pa.int64()), ("seq_offset", pa.int64()),
            ("n_seqs", pa.int64())])
        if len(t) == 0:
            return out_schema.empty_table()
        n = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        run_sum = t["running_sum"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        start = run_sum - n
        first = start // seq_len
        last = (run_sum - 1) // seq_len
        return pa.table({
            id_col: t[id_col], "n_tokens": pa.array(n),
            "tok_start": pa.array(start), "seq_first": pa.array(first),
            "seq_last": pa.array(last),
            "seq_offset": pa.array(start % seq_len),
            "n_seqs": pa.array(last - first + 1)}).cast(out_schema)

    return run.map_batches(project, batch_format="pyarrow")
