"""As-of join — the classic time-series join Ray Data lacks.

``asof_join(left, right, ...)``: each left row picks up the right row with
the greatest ``right.ts <= left.ts`` for the same key (DuckDB ``ASOF JOIN``
semantics, which is also the driver oracle for ``events_asof_value``).

Plan (SURVEY.md §2.4 custom-operator rule (b)/(c): composition first, raw
tasks only for what the Dataset API can't express):

1. Tag both sides and union into one table
   ``(k, t_us, side 0=right/1=left, payload...)``; ONE global range sort on
   ``(k, t_us, side)`` — right before left at equal t makes the match
   inclusive. This is the only all-to-all exchange.
2. Per sorted block, a vectorized forward-fill resolves every left row from
   the latest in-block right row of its key run (``np.maximum.accumulate``
   over right positions, validated against key-run starts — no Python
   rows).
3. Rows whose key run straddles block boundaries need the PREVIOUS block's
   right state. Per block we emit one tiny summary (first key, last key,
   last right values of the trailing key run); the driver chain-scans these
   O(#blocks) summaries into per-block carry-in states and a second pass
   patches only the unresolved prefix rows. Driver state is per-BLOCK, not
   per-row — the same bounded-fix-up discipline as ``dedup_weighted`` /
   ``consecutive_pairs`` (stages/edges.py), so the operator holds at any
   row count.

The two passes must see the same block boundaries, so the sorted union is
materialized once and both passes run as raw Ray tasks over its ordered
``to_arrow_refs()`` blocks (a per-block *index* is what ``map_batches``
cannot express).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from cuttana_ray.stages.windows import ts_to_us


def _block_summary(t: pa.Table, rcols: list[str]) -> dict:
    """(first_key, last_key, last right-row values of the trailing key run,
    or None) — the O(1) carry information of one sorted block."""
    n = len(t)
    if n == 0 or "k" not in t.column_names:
        return {"empty": True}
    k = t["k"].to_numpy(zero_copy_only=False)
    side = t["side"].to_numpy(zero_copy_only=False)
    last_key = k[-1]
    run = np.nonzero(k != last_key)[0]
    start = (run[-1] + 1) if len(run) else 0
    rmask = side[start:] == 0
    out = {"empty": False, "first_key": k[0], "last_key": last_key,
           "right_vals": None}
    if rmask.any():
        pos = start + int(np.nonzero(rmask)[0][-1])
        out["right_vals"] = tuple(t[c][pos].as_py() for c in rcols)
    return out


@ray.remote
def _summary_task(t: pa.Table, rcols: list[str]) -> dict:
    return _block_summary(t, rcols)


@ray.remote
def _resolve_task(t: pa.Table, rcols: list[str], lcols: list[str],
                  rtypes: list, carry: "tuple | None") -> pa.Table:
    """Forward-fill right values onto this block's left rows; ``carry`` is
    the (key, right_values) state active at the block's first row."""
    out_fields = [(c, t.schema.field(c).type) for c in lcols] + \
        [(f"r_{c}", rt) for c, rt in zip(rcols, rtypes)]
    if len(t) == 0 or "k" not in t.column_names:
        return pa.schema(out_fields).empty_table()
    k = t["k"].to_numpy(zero_copy_only=False)
    side = t["side"].to_numpy(zero_copy_only=False)
    n = len(t)
    idx = np.arange(n, dtype=np.int64)
    # last right position at-or-before each row (block-local)
    rpos = np.where(side == 0, idx, -1)
    np.maximum.accumulate(rpos, out=rpos)
    # key-run starts: a match is valid only within the same key run
    run_start = np.zeros(n, dtype=np.int64)
    changes = np.nonzero(k[1:] != k[:-1])[0] + 1
    run_start[changes] = changes
    np.maximum.accumulate(run_start, out=run_start)
    valid = rpos >= run_start
    lidx = np.nonzero(side == 1)[0]
    lmask_arr = pa.array(side == 1)
    valid_l = valid[lidx]
    take_l = pa.array(np.where(valid_l, rpos[lidx], 0))

    cols = {}
    for c in lcols:
        cols[c] = t[c].filter(lmask_arr)
    patch = None
    if carry is not None:
        patch = (~valid_l) & (k[lidx] == carry[0])
        if not patch.any():
            patch = None
    for j, c in enumerate(rcols):
        matched = t[c].take(take_l)
        res = pc.if_else(pa.array(valid_l), matched,
                         pa.nulls(len(lidx), rtypes[j]))
        if patch is not None:
            res = pc.if_else(pa.array(patch),
                             pa.scalar(carry[1][j], rtypes[j]), res)
        cols[f"r_{c}"] = res
    return pa.table(cols).cast(pa.schema(out_fields))


def asof_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              key: str, ts: str, right_vals: list[str],
              left_cols: list[str] | None = None) -> "ray.data.Dataset":
    """Backward as-of join (greatest ``right.ts <= left.ts`` per key).

    Returns the left rows (``left_cols``, default all left columns) plus
    ``r_<col>`` for each of ``right_vals`` (null when no right row
    precedes). Right must be unique per (key, ts) for a deterministic
    result — pre-aggregate if not.
    """
    left_cols = left_cols or [c for c in left.schema().names]

    # resolve column types once (schema() is metadata-only; the ray.data
    # Schema wrapper exposes parallel .names/.types lists)
    rschema = right.schema()
    rtypes = [rschema.types[rschema.names.index(c)] for c in right_vals]

    def _rtype(c):
        return rtypes[right_vals.index(c)]

    lschema = left.schema()
    ltypes = {c: lschema.types[lschema.names.index(c)] for c in left_cols}

    def tag(t: pa.Table, is_left: bool) -> pa.Table:
        fields = [("k", pa.int64()), ("t_us", pa.int64()),
                  ("side", pa.int8())] + \
            [(f"l_{c}", ltypes[c]) for c in left_cols] + \
            [(c, _rtype(c)) for c in right_vals]
        schema = pa.schema(fields)
        if len(t) == 0 or key not in t.column_names:
            return schema.empty_table()
        n = len(t)
        cols = {"k": pc.cast(t[key], pa.int64()),
                "t_us": pc.cast(ts_to_us(t[ts]), pa.int64()),
                "side": pa.array(np.full(n, 1 if is_left else 0, np.int8))}
        for c in left_cols:
            cols[f"l_{c}"] = t[c] if is_left else pa.nulls(n, ltypes[c])
        for c in right_vals:
            cols[c] = pa.nulls(n, _rtype(c)) if is_left else t[c]
        return pa.table(cols).cast(schema)

    lt = left.map_batches(lambda t: tag(t, True), batch_format="pyarrow")
    rt = right.map_batches(lambda t: tag(t, False), batch_format="pyarrow")
    merged = lt.union(rt).sort(["k", "t_us", "side"]).materialize()

    refs = merged.to_arrow_refs()
    rcols = list(right_vals)
    lcols_full = [f"l_{c}" for c in left_cols]
    summaries = ray.get([_summary_task.remote(r, rcols) for r in refs])

    # chain-scan: state entering each block = latest right values if the
    # block's first key continues an earlier run
    carries: list[tuple | None] = []
    state: tuple | None = None  # (key, values)
    for s in summaries:
        carries.append(state)
        if s.get("empty"):
            continue
        if s["right_vals"] is not None:
            state = (s["last_key"], s["right_vals"])
        elif state is not None and state[0] == s["last_key"]:
            pass  # key continues with no new right rows
        else:
            state = None

    out_refs = [_resolve_task.remote(r, rcols, lcols_full, rtypes, c)
                for r, c in zip(refs, carries)]
    out = ray.data.from_arrow_refs(out_refs)

    def strip_prefix(t: pa.Table) -> pa.Table:
        if len(t.column_names) == 0:
            return t
        return t.rename_columns(
            [c[2:] if c.startswith("l_") else c for c in t.column_names])

    return out.map_batches(strip_prefix, batch_format="pyarrow",
                           zero_copy_batch=True)
