"""Nested-type operators: explode (SQL UNNEST) for ``list<T>`` columns.

The reference has no nested types at all (its data model is scalar rows —
SURVEY.md §1.1), but a transcript/embedding pipeline constantly flattens
list columns (token lists, embedding vectors, shingle sets). This is the
§2.4 flat_map primitive done zero-copy: everything derives from the Arrow
list offsets — parent-row replication via ``pc.list_parent_indices`` and
per-element position via one vectorized arange-minus-offset — so a block
explodes with no Python per-row work and no shuffle at all (the operator
is embarrassingly parallel; memory is bounded by ``batch_size`` × mean
list length, which the caller sizes like any wide-row stage).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _explode_table(t: pa.Table, list_col: str, keep: list[str],
                   value_name: str, pos_name: str | None) -> pa.Table:
    col = t[list_col]
    parents = pc.list_parent_indices(col)
    values = pc.list_flatten(col)
    cols = {c: t[c].take(parents) for c in keep}
    cols[value_name] = values
    if pos_name is not None:
        # 1-based position within each list (SQL WITH ORDINALITY /
        # generate_subscripts): global arange minus each element's own
        # list-start, where starts repeat per element. Null lists have
        # null length but contribute zero flattened elements, so filling
        # with 0 keeps the repeat aligned. Slice/offset-safe: only logical
        # lengths are used, never raw offset buffers.
        lengths = pc.fill_null(pc.list_value_length(col), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.repeat(np.cumsum(lengths) - lengths, lengths)
        pos = np.arange(len(values), dtype=np.int64) - starts + 1
        cols[pos_name] = pa.array(pos, pa.int64())
    return pa.table(cols)


def explode_list(ds: "ray.data.Dataset", list_col: str,
                 keep_cols: list[str] | None = None,
                 value_name: str = "value",
                 pos_name: str | None = "pos") -> "ray.data.Dataset":
    """Flatten a ``list<T>`` column to one row per element (SQL ``UNNEST
    ... WITH ORDINALITY``): ``keep_cols`` replicate from the parent row,
    ``value_name`` holds the element, ``pos_name`` its 1-based position
    (pass ``None`` to skip). Empty and null lists produce no rows, like
    SQL UNNEST."""
    if keep_cols is None:
        keep_cols = [c for c in ds.schema().names if c != list_col]
    return ds.map_batches(
        lambda t: _explode_table(t, list_col, keep_cols, value_name,
                                 pos_name),
        batch_format="pyarrow")
