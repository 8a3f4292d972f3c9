"""Running (cumulative) per-key window aggregates — ``SUM(...) OVER
(PARTITION BY key ORDER BY ...)`` re-expressed Ray-Data-first.

SURVEY.md §2.4 "windows" family. Ray Data has no analytic window functions;
the classic shape is one global range sort followed by an order-dependent
scan. The scan is made exact across block boundaries with the same bounded
carry-chain discipline as ``stages/joins.py::asof_join``: each sorted block
emits ONE O(1) summary (first key, last key, trailing-run totals); the
driver chain-scans #blocks summaries into per-block carry-in states; a
second pass over the same materialized blocks patches only each block's
leading key run. Driver state is per-BLOCK, never per-row, so the operator
holds at any row count; the single sort is the only all-to-all exchange.

Numeric determinism: the running value is accumulated in exact int64 units
(callers pre-scale doubles, e.g. ``floor(value*100)`` cents), so the result
is bit-identical across block layouts, cluster sizes, and vs a SQL oracle —
no float-summation-order hazard.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from cuttana_ray.util import safe_join


def _run_starts(k: np.ndarray) -> np.ndarray:
    """Index of the start of each row's key run (k sorted by key)."""
    n = len(k)
    run_start = np.zeros(n, dtype=np.int64)
    if n > 1:
        changes = np.nonzero(k[1:] != k[:-1])[0] + 1
        run_start[changes] = changes
        np.maximum.accumulate(run_start, out=run_start)
    return run_start


@ray.remote
def _summary_task(t: pa.Table) -> dict:
    """O(1) carry info: first/last key plus the trailing key run's
    (sum, count) of the int64 value column ``v``."""
    n = len(t)
    if n == 0 or "k" not in t.column_names:
        return {"empty": True}
    k = t["k"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    last = k[-1]
    brk = np.nonzero(k != last)[0]
    start = (brk[-1] + 1) if len(brk) else 0
    return {"empty": False, "first_key": int(k[0]), "last_key": int(last),
            "tail_sum": int(v[start:].sum()), "tail_n": int(n - start)}


@ray.remote
def _scan_task(t: pa.Table, carry: "tuple | None",
               out_cols: list[str]) -> pa.Table:
    """Per-block vectorized prefix scan within key runs; ``carry`` is the
    (key, sum, count) state entering the block's first row."""
    n = len(t)
    if n == 0 or "k" not in t.column_names:
        # zero-column empties bypass upstream map_batches; keep them inert
        return pa.schema([]).empty_table()
    schema = pa.schema([(c, t.schema.field(c).type) for c in out_cols] +
                       [("running_sum", pa.int64()), ("rn", pa.int64())])
    k = t["k"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    run_start = _run_starts(k)
    cs = np.cumsum(v)
    base = np.where(run_start > 0, cs[run_start - 1], 0)
    running = cs - base  # cumsum includes v[i]; base ends before the run
    rn = np.arange(n, dtype=np.int64) - run_start + 1
    if carry is not None and k[0] == carry[0]:
        lead = run_start == 0
        running = running + np.where(lead, carry[1], 0)
        rn = rn + np.where(lead, carry[2], 0)
    cols = {c: t[c] for c in out_cols}
    cols["running_sum"] = pa.array(running, pa.int64())
    cols["rn"] = pa.array(rn, pa.int64())
    return pa.table(cols).cast(schema)


def running_agg(ds: "ray.data.Dataset", key: str, order: list[str],
                value: str,
                keep: list[str] | None = None) -> "ray.data.Dataset":
    """Cumulative SUM and ROW_NUMBER per ``key`` ordered by ``order``.

    ``value`` must be an integer-valued column (pre-scale doubles upstream —
    see module docstring); output carries ``keep`` (default: key + order
    columns) plus ``running_sum`` (cumulative int64 sum, current row
    inclusive) and ``rn`` (1-based rank within the key).

    Ordering within a key must be unique under ``order`` for a
    deterministic result — same contract as DuckDB's
    ``SUM() OVER (PARTITION BY key ORDER BY order ROWS UNBOUNDED
    PRECEDING)``.
    """
    keep = keep if keep is not None else [key, *order]

    schema = ds.schema()
    ktypes = {c: schema.types[schema.names.index(c)] for c in keep}

    def tag(t: pa.Table) -> pa.Table:
        fields = [("k", pa.int64()), ("v", pa.int64())] + \
            [(f"o_{c}", t.schema.field(c).type if c in t.column_names
              else pa.int64()) for c in order] + \
            [(f"c_{c}", ktypes[c]) for c in keep]
        sch = pa.schema(fields)
        if len(t) == 0 or key not in t.column_names:
            return sch.empty_table()
        cols = {"k": pc.cast(t[key], pa.int64()),
                "v": pc.cast(t[value], pa.int64())}
        for c in order:
            cols[f"o_{c}"] = t[c]
        for c in keep:
            cols[f"c_{c}"] = t[c]
        return pa.table(cols).cast(sch)

    sort_keys = ["k"] + [f"o_{c}" for c in order]
    merged = ds.map_batches(tag, batch_format="pyarrow") \
        .sort(sort_keys).materialize()

    refs = merged.to_arrow_refs()
    summaries = ray.get([_summary_task.remote(r) for r in refs])

    carries: list[tuple | None] = []
    state: tuple | None = None  # (key, cum_sum, cum_count)
    for s in summaries:
        carries.append(state)
        if s.get("empty"):
            continue
        if state is not None and state[0] == s["first_key"] \
                and s["first_key"] == s["last_key"]:
            state = (s["last_key"], state[1] + s["tail_sum"],
                     state[2] + s["tail_n"])
        else:
            state = (s["last_key"], s["tail_sum"], s["tail_n"])

    ccols = [f"c_{c}" for c in keep]
    out_refs = [_scan_task.remote(r, c, ccols)
                for r, c in zip(refs, carries)]
    out = ray.data.from_arrow_refs(out_refs)

    def strip(t: pa.Table) -> pa.Table:
        if len(t.column_names) == 0:
            return t
        return t.rename_columns(
            [c[2:] if c.startswith("c_") else c for c in t.column_names])

    return out.map_batches(strip, batch_format="pyarrow",
                           zero_copy_batch=True)


@ray.remote
def _msummary_task(t: pa.Table, frame: int) -> dict:
    """O(frame) carry info: first/last key plus the trailing key run's last
    ``frame-1`` values (everything a bounded frame can see across the
    boundary)."""
    n = len(t)
    if n == 0 or "k" not in t.column_names:
        return {"empty": True}
    k = t["k"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    last = k[-1]
    brk = np.nonzero(k != last)[0]
    start = (brk[-1] + 1) if len(brk) else 0
    tail = v[max(start, n - (frame - 1)):] if frame > 1 \
        else np.array([], dtype=np.int64)
    return {"empty": False, "first_key": int(k[0]), "last_key": int(last),
            "tail_vals": tail.astype(np.int64)}


@ray.remote
def _mscan_task(t: pa.Table, carry: "tuple | None", frame: int,
                out_cols: list[str]) -> pa.Table:
    """Per-block moving-frame scan: ``window_sum`` / ``window_n`` over the
    last ``frame`` rows of the key run (current row inclusive); ``carry``
    is (key, tail values) entering the block's first row."""
    n = len(t)
    if n == 0 or "k" not in t.column_names:
        return pa.schema([]).empty_table()
    schema = pa.schema([(c, t.schema.field(c).type) for c in out_cols] +
                       [("window_sum", pa.int64()), ("window_n", pa.int64())])
    k = t["k"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    run_start = _run_starts(k)
    cs = np.cumsum(v)
    pos = np.arange(n, dtype=np.int64)
    start = np.maximum(run_start, pos - frame + 1)
    base = np.where(start > 0, cs[start - 1], 0)
    wsum = cs - base
    wn = pos - start + 1
    if carry is not None and k[0] == carry[0] and len(carry[1]):
        cv = carry[1]
        # suffix sums: sfx[j] = sum of the last j carried values
        sfx = np.concatenate([[0], np.cumsum(cv[::-1])])
        lead = run_start == 0
        need = np.minimum(np.maximum(frame - 1 - pos, 0), len(cv))
        wsum = wsum + np.where(lead, sfx[need], 0)
        wn = wn + np.where(lead, need, 0)
    cols = {c: t[c] for c in out_cols}
    cols["window_sum"] = pa.array(wsum, pa.int64())
    cols["window_n"] = pa.array(wn, pa.int64())
    return pa.table(cols).cast(schema)


def moving_agg(ds: "ray.data.Dataset", key: str, order: list[str],
               value: str, frame: int,
               keep: list[str] | None = None) -> "ray.data.Dataset":
    """Bounded-frame window aggregate: ``SUM/COUNT(...) OVER (PARTITION BY
    key ORDER BY order ROWS BETWEEN frame-1 PRECEDING AND CURRENT ROW)``.

    Same single-sort + O(#blocks) carry-chain discipline as
    ``running_agg``, except each block's carry is the trailing key run's
    last ``frame-1`` int64 values (O(frame) per block, still never
    per-row). Same contracts: integer-valued ``value`` column and a total
    ``order`` within each key."""
    keep = keep if keep is not None else [key, *order]
    schema = ds.schema()
    ktypes = {c: schema.types[schema.names.index(c)] for c in keep}

    def tag(t: pa.Table) -> pa.Table:
        fields = [("k", pa.int64()), ("v", pa.int64())] + \
            [(f"o_{c}", t.schema.field(c).type if c in t.column_names
              else pa.int64()) for c in order] + \
            [(f"c_{c}", ktypes[c]) for c in keep]
        sch = pa.schema(fields)
        if len(t) == 0 or key not in t.column_names:
            return sch.empty_table()
        cols = {"k": pc.cast(t[key], pa.int64()),
                "v": pc.cast(t[value], pa.int64())}
        for c in order:
            cols[f"o_{c}"] = t[c]
        for c in keep:
            cols[f"c_{c}"] = t[c]
        return pa.table(cols).cast(sch)

    sort_keys = ["k"] + [f"o_{c}" for c in order]
    merged = ds.map_batches(tag, batch_format="pyarrow") \
        .sort(sort_keys).materialize()

    refs = merged.to_arrow_refs()
    summaries = ray.get([_msummary_task.remote(r, frame) for r in refs])

    carries: list[tuple | None] = []
    state: tuple | None = None  # (key, trailing values ≤ frame-1)
    for s in summaries:
        carries.append(state)
        if s.get("empty"):
            continue
        tail = s["tail_vals"]
        if state is not None and state[0] == s["first_key"] \
                and s["first_key"] == s["last_key"]:
            tail = np.concatenate([state[1], tail])
        state = (s["last_key"],
                 tail[max(0, len(tail) - (frame - 1)):] if frame > 1
                 else tail[:0])

    ccols = [f"c_{c}" for c in keep]
    out_refs = [_mscan_task.remote(r, c, frame, ccols)
                for r, c in zip(refs, carries)]
    out = ray.data.from_arrow_refs(out_refs)

    def strip(t: pa.Table) -> pa.Table:
        if len(t.column_names) == 0:
            return t
        return t.rename_columns(
            [c[2:] if c.startswith("c_") else c for c in t.column_names])

    return out.map_batches(strip, batch_format="pyarrow",
                           zero_copy_batch=True)


def rank_windows(ds: "ray.data.Dataset", key: str, order: list[str],
                 tiles: int = 4,
                 keep: list[str] | None = None) -> "ray.data.Dataset":
    """``NTILE(tiles)`` and ``PERCENT_RANK()`` per ``key`` ordered by
    ``order`` (which must be a total order within each key — no peers, the
    same contract as ``running_agg``).

    Composition: ``running_agg`` over a ones column yields the exact
    row number per key (one sort + O(#blocks) carry chain); a tiny
    groupby-count supplies per-key sizes; a distributed hash join lines
    them up; the tile/rank arithmetic is a vectorized exact-integer map.
    NTILE uses the SQL rule (first ``n % tiles`` buckets get one extra
    row); PERCENT_RANK is the single exact division (rn-1)/(n-1), so both
    hash-match a SQL oracle bit-for-bit.
    """
    from ray.data.aggregate import Count

    keep = keep if keep is not None else [key, *order]

    def add_one(t: pa.Table) -> pa.Table:
        return t.append_column("_one", pa.array(
            np.ones(len(t), np.int64)))

    from cuttana_ray.util import drop_empty_blocks

    rn_ds = drop_empty_blocks(
        running_agg(ds.map_batches(add_one, batch_format="pyarrow"),
                    key, order, "_one", keep=keep)
        .drop_columns(["running_sum"]))
    counts = drop_empty_blocks(
        ds.groupby(key).aggregate(Count(alias_name="_nk")))
    joined = safe_join(rn_ds, counts, join_type="inner", num_partitions=8,
                        on=(key,))

    def finish(t: pa.Table) -> pa.Table:
        rn = t["rn"].to_numpy(zero_copy_only=False)
        n = t["_nk"].to_numpy(zero_copy_only=False).astype(np.int64)
        q, r = n // tiles, n % tiles
        head = rn <= r * (q + 1)
        tile = np.where(head, (rn - 1) // np.maximum(q + 1, 1),
                        r + (rn - 1 - r * (q + 1)) // np.maximum(q, 1)) + 1
        prank = np.where(n > 1, (rn - 1) / np.maximum(n - 1, 1), 0.0)
        out = t.drop_columns(["_nk", "rn"])
        out = out.append_column("ntile", pa.array(tile.astype(np.int64)))
        return out.append_column("prank", pa.array(prank, pa.float64()))

    return joined.map_batches(finish, batch_format="pyarrow")


@ray.remote
def _lag_summary_task(t: pa.Table, lcols: list[str]) -> dict:
    """O(1) carry info for LAG: the block's last key and last row's
    lag-column values (a 1-row table)."""
    n = len(t)
    if n == 0 or "k" not in t.column_names:
        return {"empty": True}
    k = t["k"].to_numpy(zero_copy_only=False)
    return {"empty": False, "first_key": int(k[0]), "last_key": int(k[-1]),
            "tail_row": t.select(lcols).slice(n - 1, 1)}


@ray.remote
def _lag_scan_task(t: pa.Table, carry: "tuple | None", lcols: list[str],
                   ccols: list[str]) -> pa.Table:
    """Per-block vectorized LAG within key runs; ``carry`` holds the
    previous block's (key, last-row table) entering this block."""
    n = len(t)
    if n == 0 or "k" not in t.column_names:
        return pa.schema([]).empty_table()
    out_fields = [(c, t.schema.field(c).type) for c in ccols] + \
        [(f"prev_{c[2:]}", t.schema.field(c).type) for c in lcols]
    schema = pa.schema(out_fields)
    k = t["k"].to_numpy(zero_copy_only=False)
    run_start = _run_starts(k)
    is_start = run_start == np.arange(n)
    # take index i-1 everywhere; run starts take themselves, then null out
    idx = np.arange(n, dtype=np.int64) - 1
    idx[is_start] = np.nonzero(is_start)[0]
    valid = pa.array(~is_start)
    cols = {c: t[c] for c in ccols}
    carry_match = carry is not None and carry[0] == int(k[0]) \
        and is_start[0]
    for c in lcols:
        col = t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray) \
            else t[c]
        prev = pc.if_else(valid, col.take(pa.array(idx)),
                          pa.nulls(1, col.type)[0])
        if carry_match:
            head = carry[1][c]
            head = head.combine_chunks() if isinstance(head,
                                                       pa.ChunkedArray) \
                else head
            prev = pa.concat_arrays(
                [head.cast(col.type), prev.slice(1)])
        cols[f"prev_{c[2:]}"] = prev
    return pa.table(cols).cast(schema)


def lag_columns(ds: "ray.data.Dataset", key: str, order: list[str],
                cols: list[str],
                keep: list[str] | None = None) -> "ray.data.Dataset":
    """General per-key LAG: for every row, the PREVIOUS row's values of
    ``cols`` under ``(key, *order)`` ordering — SQL ``LAG(col) OVER
    (PARTITION BY key ORDER BY order)``, null at each partition head.

    Same plan as ``running_agg``: one global sort, O(1)-sized per-block
    summaries (the last row only), a driver carry chain over #blocks
    entries, then a fully vectorized per-block shift — no per-group
    Python, no second exchange. Values are COPIED, not computed, so the
    output is hash-exact with no float hazards. Output columns:
    ``keep`` (default key + order) plus ``prev_<col>`` per lag column.
    """
    keep = keep if keep is not None else [key, *order]
    schema = ds.schema()
    ktypes = {c: schema.types[schema.names.index(c)] for c in keep}
    ltypes = {c: schema.types[schema.names.index(c)] for c in cols}

    def tag(t: pa.Table) -> pa.Table:
        fields = [("k", pa.int64())] + \
            [(f"o_{c}", t.schema.field(c).type if c in t.column_names
              else pa.int64()) for c in order] + \
            [(f"c_{c}", ktypes[c]) for c in keep] + \
            [(f"l_{c}", ltypes[c]) for c in cols]
        sch = pa.schema(fields)
        if len(t) == 0 or key not in t.column_names:
            return sch.empty_table()
        out = {"k": pc.cast(t[key], pa.int64())}
        for c in order:
            out[f"o_{c}"] = t[c]
        for c in keep:
            out[f"c_{c}"] = t[c]
        for c in cols:
            out[f"l_{c}"] = t[c]
        return pa.table(out).cast(sch)

    sort_keys = ["k"] + [f"o_{c}" for c in order]
    merged = ds.map_batches(tag, batch_format="pyarrow") \
        .sort(sort_keys).materialize()
    refs = merged.to_arrow_refs()
    lcols = [f"l_{c}" for c in cols]
    summaries = ray.get([_lag_summary_task.remote(r, lcols) for r in refs])

    carries: list[tuple | None] = []
    state: tuple | None = None           # (key, 1-row table of lcols)
    for s in summaries:
        carries.append(state)
        if s.get("empty"):
            continue
        state = (s["last_key"], s["tail_row"])

    ccols = [f"c_{c}" for c in keep]
    out_refs = [_lag_scan_task.remote(r, c, lcols, ccols)
                for r, c in zip(refs, carries)]
    out = ray.data.from_arrow_refs(out_refs)

    def strip(t: pa.Table) -> pa.Table:
        if len(t.column_names) == 0:
            return t
        return t.rename_columns(
            [c[2:] if c.startswith("c_") else c for c in t.column_names])

    return out.map_batches(strip, batch_format="pyarrow",
                           zero_copy_batch=True)


@ray.remote
def _max_summary_task(t: pa.Table) -> dict:
    """O(1) carry info for a prefix max: last key + the trailing key
    run's max of ``v``."""
    n = len(t)
    if n == 0 or "k" not in t.column_names:
        return {"empty": True}
    k = t["k"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    last = k[-1]
    brk = np.nonzero(k != last)[0]
    start = (brk[-1] + 1) if len(brk) else 0
    return {"empty": False, "first_key": int(k[0]), "last_key": int(last),
            "tail_max": int(v[start:].max())}


@ray.remote
def _max_scan_task(t: pa.Table, carry: "tuple | None",
                   out_cols: list[str]) -> pa.Table:
    """Per-block EXCLUSIVE prefix max within key runs (value of the max
    over all STRICTLY EARLIER rows of the key; null at run heads with no
    carry)."""
    n = len(t)
    if n == 0 or "k" not in t.column_names:
        return pa.schema([]).empty_table()
    schema = pa.schema([(c, t.schema.field(c).type) for c in out_cols] +
                       [("prev_max", pa.int64())])
    k = t["k"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    run_start = _run_starts(k)
    # inclusive prefix max per key run (pandas grouped cummax: C kernel,
    # value-range safe — an offset trick would overflow int64 on epoch-µs
    # data), then shift right by one for the exclusive form
    import pandas as pd
    seg = np.zeros(n, np.int64)
    seg[run_start] = 1
    run_id = np.cumsum(seg) - 1
    incl = pd.Series(v).groupby(run_id).cummax().to_numpy()
    is_start = run_start == np.arange(n)
    prev = np.empty(n, np.int64)
    prev[1:] = incl[:-1]
    prev[0] = 0
    valid = ~is_start
    if carry is not None and n and carry[0] == int(k[0]):
        # the carry max applies to EVERY row of the block's leading key
        # run, not just the first row (same leading-run patch as the
        # running-sum scan)
        lead = run_start == 0
        prev = np.where(lead, np.maximum(prev, carry[1]), prev)
        if is_start[0]:
            prev[0] = carry[1]
            valid[0] = True
    cols = {c: t[c] for c in out_cols}
    cols["prev_max"] = pa.array(
        np.where(valid, prev, 0), pa.int64())
    out = pa.table(cols).cast(schema)
    # null out run heads without carry
    return out.set_column(
        out.schema.get_field_index("prev_max"), "prev_max",
        pc.if_else(pa.array(valid), out["prev_max"],
                   pa.nulls(1, pa.int64())[0]))


def coalesce_intervals(ds: "ray.data.Dataset", key: str, start: str,
                       end: str) -> "ray.data.Dataset":
    """Merge overlapping/touching intervals per key — SQL's
    gaps-and-islands: an interval starts a new island iff its start
    exceeds the max end of every earlier interval of the key.

    Plan: one sort by (key, start, end); the block-carry chain computes
    the EXCLUSIVE prefix max of ``end`` (a prefix max is carry-friendly —
    unlike island ids it never depends on break decisions); break flags
    then feed the existing ``running_agg`` sum chain for island ids; one
    final ``groupby(key, island)`` aggregate emits (island_start,
    island_end, n_intervals). Values must be int64 (timestamps via
    ``ts_to_us`` upstream).
    """
    from ray.data.aggregate import Count, Max, Min

    schema = ds.schema()

    def tag(t: pa.Table) -> pa.Table:
        sch = pa.schema([("k", pa.int64()), ("v", pa.int64()),
                         ("s_", pa.int64()), ("e_", pa.int64())])
        if len(t) == 0 or key not in t.column_names:
            return sch.empty_table()
        return pa.table({
            "k": pc.cast(t[key], pa.int64()),
            "v": pc.cast(t[end], pa.int64()),
            "s_": pc.cast(t[start], pa.int64()),
            "e_": pc.cast(t[end], pa.int64()),
        }).cast(sch)

    merged = ds.map_batches(tag, batch_format="pyarrow") \
        .sort(["k", "s_", "e_"]).materialize()
    refs = merged.to_arrow_refs()
    summaries = ray.get([_max_summary_task.remote(r) for r in refs])
    carries: list[tuple | None] = []
    state: tuple | None = None               # (key, running max)
    for s in summaries:
        carries.append(state)
        if s.get("empty"):
            continue
        if state is not None and state[0] == s["first_key"] \
                and s["first_key"] == s["last_key"]:
            state = (s["last_key"], max(state[1], s["tail_max"]))
        else:
            state = (s["last_key"], s["tail_max"])
    out_refs = [_max_scan_task.remote(r, c, ["k", "s_", "e_"])
                for r, c in zip(refs, carries)]
    with_max = ray.data.from_arrow_refs(out_refs)

    def brk(t: pa.Table) -> pa.Table:
        sch = pa.schema([("k", pa.int64()), ("s_", pa.int64()),
                         ("e_", pa.int64()), ("brk", pa.int64())])
        if len(t) == 0:
            return sch.empty_table()
        pm = t["prev_max"]
        new_island = pc.or_kleene(
            pc.is_null(pm), pc.greater(t["s_"], pm))
        return pa.table({
            "k": t["k"], "s_": t["s_"], "e_": t["e_"],
            "brk": pc.cast(pc.fill_null(new_island, True), pa.int64()),
        }).cast(sch)

    islands = running_agg(with_max.map_batches(brk, batch_format="pyarrow"),
                          "k", ["s_", "e_"], "brk",
                          keep=["k", "s_", "e_"])

    agg = islands.groupby(["k", "running_sum"]).aggregate(
        Min("s_", alias_name="island_start"),
        Max("e_", alias_name="island_end"),
        Count(alias_name="n_intervals"))

    def finish(t: pa.Table) -> pa.Table:
        sch = pa.schema([(key, pa.int64()), ("island", pa.int64()),
                         ("island_start", pa.int64()),
                         ("island_end", pa.int64()),
                         ("n_intervals", pa.int64())])
        if len(t) == 0:
            return sch.empty_table()
        return pa.table({
            key: t["k"], "island": t["running_sum"],
            "island_start": t["island_start"],
            "island_end": t["island_end"],
            "n_intervals": pc.cast(t["n_intervals"], pa.int64()),
        }).cast(sch)

    return agg.map_batches(finish, batch_format="pyarrow")


def running_max_agg(ds: "ray.data.Dataset", key: str, order: list[str],
                    value: str,
                    keep: list[str] | None = None) -> "ray.data.Dataset":
    """Cumulative MAX per key (SQL ``MAX(value) OVER (PARTITION BY key
    ORDER BY order ROWS UNBOUNDED PRECEDING)``, current row inclusive) —
    the MAX sibling of ``running_agg``, on the same one-sort +
    O(#blocks) carry chain. ``value`` must be int64-castable."""
    keep = keep if keep is not None else [key, *order]
    schema = ds.schema()
    ktypes = {c: schema.types[schema.names.index(c)] for c in keep}

    def tag(t: pa.Table) -> pa.Table:
        fields = [("k", pa.int64()), ("v", pa.int64())] + \
            [(f"o_{c}", t.schema.field(c).type if c in t.column_names
              else pa.int64()) for c in order] + \
            [(f"c_{c}", ktypes[c]) for c in keep]
        sch = pa.schema(fields)
        if len(t) == 0 or key not in t.column_names:
            return sch.empty_table()
        cols = {"k": pc.cast(t[key], pa.int64()),
                "v": pc.cast(t[value], pa.int64())}
        for c in order:
            cols[f"o_{c}"] = t[c]
        for c in keep:
            cols[f"c_{c}"] = t[c]
        return pa.table(cols).cast(sch)

    sort_keys = ["k"] + [f"o_{c}" for c in order]
    merged = ds.map_batches(tag, batch_format="pyarrow") \
        .sort(sort_keys).materialize()
    refs = merged.to_arrow_refs()
    summaries = ray.get([_max_summary_task.remote(r) for r in refs])
    carries: list[tuple | None] = []
    state: tuple | None = None
    for s in summaries:
        carries.append(state)
        if s.get("empty"):
            continue
        if state is not None and state[0] == s["first_key"] \
                and s["first_key"] == s["last_key"]:
            state = (s["last_key"], max(state[1], s["tail_max"]))
        else:
            state = (s["last_key"], s["tail_max"])
    ccols = [f"c_{c}" for c in keep]
    out_refs = [_max_scan_task.remote(r, c, ccols)
                for r, c in zip(refs, carries)]
    out = ray.data.from_arrow_refs(out_refs)

    def finish(t: pa.Table) -> pa.Table:
        if len(t.column_names) == 0:
            return t
        # inclusive running max = max(exclusive prev_max, own value);
        # _max_scan_task keeps the tagged v? it does not — recompute from
        # the carried copy of the value column, which callers must include
        # in keep; enforced below.
        return t.rename_columns(
            [c[2:] if c.startswith("c_") else c for c in t.column_names])

    stripped = out.map_batches(finish, batch_format="pyarrow",
                               zero_copy_batch=True)

    def inclusive(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("running_max",
                                   pa.array([], pa.int64()))
        v = pc.cast(t[value], pa.int64())
        rm = pc.max_element_wise(pc.fill_null(t["prev_max"],
                                              np.iinfo(np.int64).min), v)
        return t.drop_columns(["prev_max"]) \
            .append_column("running_max", pc.cast(rm, pa.int64()))
    if value not in keep:
        raise ValueError("include the value column in keep")
    return stripped.map_batches(inclusive, batch_format="pyarrow")


def grouped_holt(ds: "ray.data.Dataset", key: str, order: str, value: str,
                 alpha: float = 0.5, beta: float = 0.25
                 ) -> "ray.data.Dataset":
    """Holt double-exponential smoothing (level + linear trend) per key
    over the series ordered by ``order``:

        l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1},    l_1 = x_1, b_1 = 0

    Returns one row per key: ``(key, n_points, level, trend, forecast1)``
    with ``forecast1 = level + trend`` (the one-step-ahead forecast),
    rounded 6 dp. The scan is inherently sequential WITHIN a key (each
    state depends on the previous), so execution is ``groupby(key)
    .map_groups`` — keys parallelize across the cluster, the per-key loop
    is O(#points) scalar work. Use dyadic α/β (0.5, 0.25, …) when an SQL
    replay must match bit-for-bit: ``1−β`` is then exact in binary.
    """
    def smooth(t: pa.Table) -> pa.Table:
        ktype = t.schema.field(key).type if len(t) else pa.int64()
        sch = pa.schema([(key, ktype), ("n_points", pa.int64()),
                         ("level", pa.float64()), ("trend", pa.float64()),
                         ("forecast1", pa.float64())])
        if len(t) == 0:
            return sch.empty_table()
        idx = pc.sort_indices(t, sort_keys=[(order, "ascending")])
        t = t.take(idx)
        x = t[value].to_numpy(zero_copy_only=False).astype(np.float64)
        lvl = x[0]
        b = 0.0
        for xt in x[1:]:
            prev = lvl
            lvl = alpha * xt + (1.0 - alpha) * (lvl + b)
            b = beta * (lvl - prev) + (1.0 - beta) * b
        return pa.table({key: t[key][:1],
                         "n_points": pa.array([len(x)], pa.int64()),
                         "level": pa.array([round(lvl, 6)], pa.float64()),
                         "trend": pa.array([round(b, 6)], pa.float64()),
                         "forecast1": pa.array([round(lvl + b, 6)],
                                               pa.float64())}).cast(sch)

    return ds.groupby(key).map_groups(smooth, batch_format="pyarrow")
