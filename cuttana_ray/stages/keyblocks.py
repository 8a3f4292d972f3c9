"""Key-aligned block layout + order-dependent scans that need WHOLE key
runs (exponentially-weighted moving average, within-group pair expansion).

The carry-chain scans in ``stages/running.py`` handle operators whose
cross-block patch is associative (sum, max, lag). An EWMA is different: its
recurrence ``s_i = a*x_i + (1-a)*s_{i-1}`` is affine, and re-expressing the
boundary patch as ``A*s_in + B`` changes the floating-point rounding order,
so the result would no longer be bit-identical to a row-at-a-time oracle.
The fix used here is layout, not algebra: after the one global sort, blocks
are REALIGNED so every key's run lives wholly inside one block — each block
donates its leading run to the block that first saw the key (an O(#blocks)
driver plan over O(1) per-block metadata; the moved bytes are only the
straddling runs). Inside an aligned block the scan is then "jagged
transposed": one vectorized step per position-within-run, updating ALL runs
of the block simultaneously, so the per-element arithmetic is the literal
recurrence (bit-identical to a sequential evaluation and to a SQL recursive
CTE) while the Python-level loop count is max-run-length, not rows.

Scale note: a single hot key becomes a single block; that is inherent to
"whole run in one place" semantics (same contract as SQL's PARTITION BY).
Callers with adversarial key skew should pre-split hot keys upstream.

The reference engine has no window/scan operators at all (its state is the
partitioner's counters, ``/root/reference/src/state.rs``); this module is
part of the SURVEY.md §2.4 windows family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


@ray.remote
def _key_meta(t: pa.Table) -> dict:
    """O(1) metadata: first/last value of the int64 ``k`` column."""
    if len(t) == 0 or "k" not in t.column_names:
        return {"empty": True}
    k = t["k"]
    return {"empty": False, "first": int(k[0].as_py()),
            "last": int(k[-1].as_py())}


@ray.remote
def _assemble_block(t: pa.Table, drop_leading_key: "int | None",
                    take_key: "int | None", *cont: pa.Table) -> pa.Table:
    """Own rows minus the donated leading run, plus the leading runs of
    the continuation blocks (each sliced to ``take_key``)."""
    parts: list[pa.Table] = []
    if len(t):
        if drop_leading_key is not None:
            k = t["k"].to_numpy(zero_copy_only=False)
            cut = int(np.searchsorted(k, drop_leading_key, side="right"))
            t = t.slice(cut)
        if len(t):
            parts.append(t)
    for c in cont:
        if len(c) == 0:
            continue
        k = c["k"].to_numpy(zero_copy_only=False)
        cut = int(np.searchsorted(k, take_key, side="right"))
        if cut:
            parts.append(c.slice(0, cut))
    if not parts:
        return t.schema.empty_table()
    return pa.concat_tables(parts).combine_chunks()


def key_aligned_refs(sorted_refs: list) -> list:
    """Given the arrow refs of a dataset already sorted with leading int64
    column ``k``, return refs of the same rows re-blocked so no key run
    straddles a block boundary (runs claimed by the first block that saw
    the key). Pure plan: O(1) metadata per block on the driver, block
    payloads never leave the object store."""
    metas = ray.get([_key_meta.remote(r) for r in sorted_refs])
    n = len(sorted_refs)
    out = []
    prev_last: "int | None" = None
    for i, m in enumerate(metas):
        if m.get("empty"):
            out.append(_assemble_block.remote(sorted_refs[i], None, None))
            continue
        drop = m["first"] if prev_last == m["first"] else None
        # a block whose entire content is a continuation of an earlier
        # owner does not own its last run either — it must not also grab
        # the continuation blocks the true owner already claimed
        owns_last = not (drop is not None and m["first"] == m["last"])
        conts = []
        j = i + 1
        while owns_last and j < n:
            mj = metas[j]
            if mj.get("empty"):
                j += 1
                continue
            if mj["first"] != m["last"]:
                break
            conts.append(sorted_refs[j])
            if mj["last"] != mj["first"]:
                break           # run ends inside block j
            j += 1
        out.append(_assemble_block.remote(
            sorted_refs[i], drop, m["last"] if conts else None, *conts))
        prev_last = m["last"]
    return out


def _runs(k: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts, lengths) of equal-value runs in sorted ``k``."""
    n = len(k)
    if n == 0:
        return (np.zeros(0, np.int64),) * 2
    brk = np.nonzero(k[1:] != k[:-1])[0] + 1
    starts = np.concatenate([[0], brk]).astype(np.int64)
    lens = np.diff(np.concatenate([starts, [n]])).astype(np.int64)
    return starts, lens


@ray.remote
def _ewma_scan(t: pa.Table, alpha: float, out_cols: list[str]) -> pa.Table:
    """Jagged-transposed EWMA over an aligned block: vectorized across all
    runs, sequential only in position-within-run; per-element arithmetic is
    exactly ``alpha*x + (1-alpha)*s`` (same three IEEE roundings as the SQL
    recursive-CTE oracle), with ``s_head = x_head``."""
    n = len(t)
    if n == 0 or "k" not in t.column_names:
        return pa.schema([]).empty_table()
    schema = pa.schema([(c, t.schema.field(c).type) for c in out_cols] +
                       [("ewma", pa.float64())])
    k = t["k"].to_numpy(zero_copy_only=False)
    x = t["v"].to_numpy(zero_copy_only=False).astype(np.float64)
    starts, lens = _runs(k)
    out = np.empty(n, np.float64)
    state = x[starts].copy()
    out[starts] = state
    beta = 1.0 - alpha          # exact for dyadic alpha (0.25, 0.5, ...)
    r = 1
    alive = lens > r
    while alive.any():
        idx = starts[alive] + r
        st = alpha * x[idx] + beta * state[alive]
        state[alive] = st
        out[idx] = st
        r += 1
        alive = lens > r
    cols = {c: t[c] for c in out_cols}
    cols["ewma"] = pa.array(out, pa.float64())
    return pa.table(cols).cast(schema)


def grouped_ewma(ds: "ray.data.Dataset", key: str, order: list[str],
                 value: str, alpha: float = 0.25,
                 keep: list[str] | None = None) -> "ray.data.Dataset":
    """Per-key exponentially-weighted moving average under ``(key,
    *order)`` ordering: ``s_1 = x_1``, ``s_i = alpha*x_i +
    (1-alpha)*s_{i-1}`` — the pandas ``ewm(adjust=False)`` recurrence,
    distributed. One global sort, a key-aligned re-block (O(1) metadata
    per block on the driver), then a fully in-block vectorized scan; the
    result is BIT-identical to evaluating the recurrence row-at-a-time, so
    it hash-matches a SQL recursive-CTE oracle with no rounding. Use a
    dyadic ``alpha`` (k/2^m) so ``1-alpha`` is exact.

    Output: ``keep`` (default key + order) plus float64 ``ewma``.
    """
    keep = keep if keep is not None else [key, *order]
    schema = ds.schema()
    ktypes = {c: schema.types[schema.names.index(c)] for c in keep}

    def tag(t: pa.Table) -> pa.Table:
        fields = [("k", pa.int64()), ("v", pa.float64())] + \
            [(f"o_{c}", t.schema.field(c).type if c in t.column_names
              else pa.int64()) for c in order] + \
            [(f"c_{c}", ktypes[c]) for c in keep]
        sch = pa.schema(fields)
        if len(t) == 0 or key not in t.column_names:
            return sch.empty_table()
        cols = {"k": pc.cast(t[key], pa.int64()),
                "v": pc.cast(t[value], pa.float64())}
        for c in order:
            cols[f"o_{c}"] = t[c]
        for c in keep:
            cols[f"c_{c}"] = t[c]
        return pa.table(cols).cast(sch)

    sort_keys = ["k"] + [f"o_{c}" for c in order]
    merged = ds.map_batches(tag, batch_format="pyarrow") \
        .sort(sort_keys).materialize()
    aligned = key_aligned_refs(merged.to_arrow_refs())
    ccols = [f"c_{c}" for c in keep]
    out_refs = [_ewma_scan.remote(r, float(alpha), ccols) for r in aligned]
    out = ray.data.from_arrow_refs(out_refs)

    def strip(t: pa.Table) -> pa.Table:
        if len(t.column_names) == 0:
            return t
        return t.rename_columns(
            [c[2:] if c.startswith("c_") else c for c in t.column_names])

    return out.map_batches(strip, batch_format="pyarrow",
                           zero_copy_batch=True)


@ray.remote
def _locf_scan(t: pa.Table, fill_col: str, out_cols: list[str]) -> pa.Table:
    """Forward-fill ``fill_col`` within each key run of an aligned block
    (SQL ``LAST_VALUE(col IGNORE NULLS) OVER (PARTITION BY key ORDER BY
    order ROWS UNBOUNDED PRECEDING)``). Fully vectorized: the fill index
    is a ``maximum.accumulate`` of valid positions, and a filled value is
    accepted only when that index falls inside the row's own run."""
    n = len(t)
    if n == 0 or "k" not in t.column_names:
        return pa.schema([]).empty_table()
    ftype = t.schema.field(fill_col).type
    schema = pa.schema([(c, t.schema.field(c).type) for c in out_cols] +
                       [("filled", ftype)])
    k = t["k"].to_numpy(zero_copy_only=False)
    starts, lens = _runs(k)
    run_start = np.repeat(starts, lens)
    col = t[fill_col].combine_chunks() if \
        isinstance(t[fill_col], pa.ChunkedArray) else t[fill_col]
    valid = np.asarray(pc.is_valid(col))
    pos = np.arange(n, dtype=np.int64)
    fidx = np.where(valid, pos, -1)
    np.maximum.accumulate(fidx, out=fidx)
    in_run = fidx >= run_start
    take = np.where(in_run, fidx, 0)
    filled = pc.if_else(pa.array(in_run), col.take(pa.array(take)),
                        pa.nulls(1, col.type)[0])
    cols = {c: t[c] for c in out_cols}
    cols["filled"] = filled
    return pa.table(cols).cast(schema)


def locf_fill(ds: "ray.data.Dataset", key: str, order: list[str],
              col: str, keep: list[str] | None = None
              ) -> "ray.data.Dataset":
    """Last-observation-carried-forward per key: each row's ``filled`` is
    the most recent non-null ``col`` at or before it under ``(key,
    *order)`` ordering (null until the key's first observation). One
    global sort + the key-aligned re-block, then a fully vectorized
    in-block fill — values are COPIED, so the result is hash-exact."""
    keep = keep if keep is not None else [key, *order]
    schema = ds.schema()
    ktypes = {c: schema.types[schema.names.index(c)] for c in keep}
    ftype = schema.types[schema.names.index(col)]

    def tag(t: pa.Table) -> pa.Table:
        fields = [("k", pa.int64())] + \
            [(f"o_{c}", t.schema.field(c).type if c in t.column_names
              else pa.int64()) for c in order] + \
            [(f"c_{c}", ktypes[c]) for c in keep] + [("f_", ftype)]
        sch = pa.schema(fields)
        if len(t) == 0 or key not in t.column_names:
            return sch.empty_table()
        cols = {"k": pc.cast(t[key], pa.int64())}
        for c in order:
            cols[f"o_{c}"] = t[c]
        for c in keep:
            cols[f"c_{c}"] = t[c]
        cols["f_"] = t[col]
        return pa.table(cols).cast(sch)

    sort_keys = ["k"] + [f"o_{c}" for c in order]
    merged = ds.map_batches(tag, batch_format="pyarrow") \
        .sort(sort_keys).materialize()
    aligned = key_aligned_refs(merged.to_arrow_refs())
    ccols = [f"c_{c}" for c in keep]
    out_refs = [_locf_scan.remote(r, "f_", ccols) for r in aligned]
    out = ray.data.from_arrow_refs(out_refs)

    def strip(t: pa.Table) -> pa.Table:
        if len(t.column_names) == 0:
            return t
        return t.rename_columns(
            [c[2:] if c.startswith("c_") else c for c in t.column_names])

    return out.map_batches(strip, batch_format="pyarrow",
                           zero_copy_batch=True)


@ray.remote
def _range_scan(t: pa.Table, width: int, out_cols: list[str]) -> pa.Table:
    """Trailing time-RANGE sum over an aligned block: for each row, the
    sum of ``v`` over rows of its key with ``t ∈ [t_i − width, t_i]``
    (peers at equal t included, SQL RANGE semantics). Fully vectorized:
    both window boundaries come from ONE ``searchsorted`` over a composite
    ``run_id·R + (t − t_min)`` key that makes every run's time axis
    disjoint, and the sum is a prefix-sum difference."""
    n = len(t)
    if n == 0 or "k" not in t.column_names:
        return pa.schema([]).empty_table()
    schema = pa.schema([(c, t.schema.field(c).type) for c in out_cols] +
                       [("range_sum", pa.int64()), ("range_n", pa.int64())])
    k = t["k"].to_numpy(zero_copy_only=False)
    tv = t["t_"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    starts, lens = _runs(k)
    run_id = np.repeat(np.arange(len(starts), dtype=np.int64), lens)
    tmin = int(tv.min())
    tn = tv - tmin
    R = int(tn.max()) + int(width) + 2
    if R * len(starts) > (1 << 62):        # composite would overflow —
        # fall back to a per-run loop (rare: astronomic spans × many runs)
        wsum = np.empty(n, np.int64)
        wn = np.empty(n, np.int64)
        for s, ln in zip(starts, lens):
            tt = tv[s:s + ln]
            cs = np.cumsum(v[s:s + ln])
            lo = np.searchsorted(tt, tt - width, side="left")
            hi = np.searchsorted(tt, tt, side="right")
            wsum[s:s + ln] = cs[hi - 1] - np.where(lo > 0, cs[lo - 1], 0)
            wn[s:s + ln] = hi - lo
    else:
        comp = run_id * R + tn
        cs = np.cumsum(v)
        lo = np.searchsorted(comp,
                             run_id * R + np.maximum(tn - width, 0),
                             side="left")
        hi = np.searchsorted(comp, comp, side="right")
        wsum = cs[hi - 1] - np.where(lo > 0, cs[np.maximum(lo - 1, 0)], 0)
        wn = hi - lo
    cols = {c: t[c] for c in out_cols}
    cols["range_sum"] = pa.array(wsum.astype(np.int64))
    cols["range_n"] = pa.array(wn.astype(np.int64))
    return pa.table(cols).cast(schema)


def trailing_range_agg(ds: "ray.data.Dataset", key: str, time_col: str,
                       value: str, width: int,
                       keep: list[str] | None = None) -> "ray.data.Dataset":
    """SQL ``SUM/COUNT(value) OVER (PARTITION BY key ORDER BY time RANGE
    BETWEEN width PRECEDING AND CURRENT ROW)`` — the time-based sibling of
    ``stages/running.py moving_agg`` (which is ROWS-based). ``time_col``
    and ``value`` must be int64-castable (µs timestamps / pre-scaled
    cents); peers at equal time are included exactly as SQL RANGE does.
    One sort + key-aligned re-block + a searchsorted prefix-sum scan."""
    keep = keep if keep is not None else [key, time_col]
    schema = ds.schema()
    ktypes = {c: schema.types[schema.names.index(c)] for c in keep}

    def tag(t: pa.Table) -> pa.Table:
        fields = [("k", pa.int64()), ("t_", pa.int64()),
                  ("v", pa.int64())] + \
            [(f"c_{c}", ktypes[c]) for c in keep]
        sch = pa.schema(fields)
        if len(t) == 0 or key not in t.column_names:
            return sch.empty_table()
        cols = {"k": pc.cast(t[key], pa.int64()),
                "t_": pc.cast(t[time_col], pa.int64()),
                "v": pc.cast(t[value], pa.int64())}
        for c in keep:
            cols[f"c_{c}"] = t[c]
        return pa.table(cols).cast(sch)

    merged = ds.map_batches(tag, batch_format="pyarrow") \
        .sort(["k", "t_"]).materialize()
    aligned = key_aligned_refs(merged.to_arrow_refs())
    ccols = [f"c_{c}" for c in keep]
    out_refs = [_range_scan.remote(r, int(width), ccols) for r in aligned]
    out = ray.data.from_arrow_refs(out_refs)

    def strip(t: pa.Table) -> pa.Table:
        if len(t.column_names) == 0:
            return t
        return t.rename_columns(
            [c[2:] if c.startswith("c_") else c for c in t.column_names])

    return out.map_batches(strip, batch_format="pyarrow",
                           zero_copy_batch=True)


@ray.remote
def _clamped_scan(t: pa.Table, floor: int, out_cols: list[str]
                  ) -> pa.Table:
    """Jagged-transposed clamped running sum over an aligned block:
    ``s_i = max(s_{i-1} + x_i, floor)`` with ``s_0 = floor`` — the
    inventory/queue-depth recurrence. Like EWMA it is NON-associative
    (the clamp destroys the sum's mergeability), so it needs whole runs;
    arithmetic is exact int64, bit-identical to a SQL recursive CTE."""
    n = len(t)
    if n == 0 or "k" not in t.column_names:
        return pa.schema([]).empty_table()
    schema = pa.schema([(c, t.schema.field(c).type) for c in out_cols] +
                       [("balance", pa.int64())])
    k = t["k"].to_numpy(zero_copy_only=False)
    x = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    starts, lens = _runs(k)
    out = np.empty(n, np.int64)
    state = np.maximum(x[starts] + floor, floor)
    out[starts] = state
    r = 1
    alive = lens > r
    while alive.any():
        idx = starts[alive] + r
        st = np.maximum(state[alive] + x[idx], floor)
        state[alive] = st
        out[idx] = st
        r += 1
        alive = lens > r
    cols = {c: t[c] for c in out_cols}
    cols["balance"] = pa.array(out)
    return pa.table(cols).cast(schema)


def clamped_running_sum(ds: "ray.data.Dataset", key: str,
                        order: list[str], value: str, floor: int = 0,
                        keep: list[str] | None = None
                        ) -> "ray.data.Dataset":
    """Per-key running balance clamped below at ``floor``: ``s_0 =
    floor``, ``s_i = max(s_{i-1} + x_i, floor)`` under ``(key, *order)``
    ordering — inventory level / queue depth / drawdown-reset semantics.
    The clamp makes the scan non-associative (no carry algebra exists),
    so it runs on the key-aligned layout with the jagged-transposed
    int64 recurrence — bit-identical to a SQL recursive-CTE oracle."""
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
    aligned = key_aligned_refs(merged.to_arrow_refs())
    ccols = [f"c_{c}" for c in keep]
    out_refs = [_clamped_scan.remote(r, int(floor), ccols)
                for r in aligned]
    out = ray.data.from_arrow_refs(out_refs)

    def strip(t: pa.Table) -> pa.Table:
        if len(t.column_names) == 0:
            return t
        return t.rename_columns(
            [c[2:] if c.startswith("c_") else c for c in t.column_names])

    return out.map_batches(strip, batch_format="pyarrow",
                           zero_copy_batch=True)


@ray.remote(num_returns=2)
def _pair_expand(t: pa.Table, item_col: str) -> tuple:
    """All within-run unordered pairs (p1 < p2 by run order) over an
    aligned block, fully vectorized: element q of a k-run is 'first' in
    (k-1-q) pairs; the flat pair index arithmetic below builds every
    (first, second) index with no Python loop. Duplicate (k, item) rows
    are dropped first (the block is sorted, so dedup is one comparison
    mask) — callers need NOT pre-distinct. Returns (pairs, item-count
    partials); pairs are block-combined as (src, dst, weight) rows ready
    for the sort-based ``dedup_weighted`` exchange."""
    pair_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                             ("weight", pa.int64())])
    cnt_schema = pa.schema([("i", pa.int64()), ("c", pa.int64())])
    n = len(t)
    if n == 0 or "k" not in t.column_names:
        return pair_schema.empty_table(), cnt_schema.empty_table()
    k = t["k"].to_numpy(zero_copy_only=False)
    p = t[item_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if n > 1:   # sorted → duplicates are consecutive
        keep = np.concatenate([[True],
                               (k[1:] != k[:-1]) | (p[1:] != p[:-1])])
        if not keep.all():
            k, p = k[keep], p[keep]
            n = len(k)
    starts, lens = _runs(k)
    cnt = pa.table({"i": p}).group_by(["i"]) \
        .aggregate([([], "count_all")]).rename_columns(["i", "c"]) \
        .cast(cnt_schema)
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
    rep = np.repeat(lens, lens) - 1 - pos      # pairs each element leads
    total = int(rep.sum())
    if total == 0:
        return pair_schema.empty_table(), cnt
    first = np.repeat(np.arange(n, dtype=np.int64), rep)
    off = np.arange(total, dtype=np.int64) - \
        np.repeat(np.concatenate([[0], np.cumsum(rep)[:-1]]), rep) + 1
    second = first + off
    p1, p2 = p[first], p[second]
    lo = np.minimum(p1, p2)
    hi = np.maximum(p1, p2)
    # block-local combine before the pair exchange
    out = pa.table({"src": lo, "dst": hi}).group_by(["src", "dst"]) \
        .aggregate([([], "count_all")]) \
        .rename_columns(["src", "dst", "weight"])
    return out.cast(pair_schema), cnt


def _pairs_and_counts(ds: "ray.data.Dataset", group: str, item: str
                      ) -> tuple:
    """Shared plan: ONE sort by (group, item) + key-aligned re-block;
    each block dedups its rows, expands pairs and emits per-item count
    partials. Pair counts combine through the sort-based
    ``dedup_weighted`` exchange (Ray's hash aggregate is ~30× slower when
    most keys are distinct — measured 120 s+ vs seconds on 12M pair
    rows); item counts are a small groupby over per-block partials."""
    from ray.data.aggregate import Sum

    from cuttana_ray.stages.edges import dedup_weighted

    def tag(t: pa.Table) -> pa.Table:
        sch = pa.schema([("k", pa.int64()), ("i_", pa.int64())])
        if len(t) == 0 or group not in t.column_names:
            return sch.empty_table()
        out = pa.table({"k": pc.cast(t[group], pa.int64()),
                        "i_": pc.cast(t[item], pa.int64())})
        # local distinct: cheap, shrinks the sort
        return out.group_by(["k", "i_"]).aggregate([]).cast(sch)

    merged = ds.map_batches(tag, batch_format="pyarrow") \
        .sort(["k", "i_"]).materialize()
    aligned = key_aligned_refs(merged.to_arrow_refs())
    outs = [_pair_expand.remote(r, "i_") for r in aligned]
    pair_refs = [o[0] for o in outs]
    cnt_refs = [o[1] for o in outs]
    pairs = dedup_weighted(ray.data.from_arrow_refs(pair_refs))

    def rename(t: pa.Table) -> pa.Table:
        sch = pa.schema([("p1", pa.int64()), ("p2", pa.int64()),
                         ("co", pa.int64())])
        if len(t) == 0 or "src" not in t.column_names:
            return sch.empty_table()
        return t.rename_columns(["p1", "p2", "co"]).cast(sch)

    pairs = pairs.map_batches(rename, batch_format="pyarrow")
    counts = ray.data.from_arrow_refs(cnt_refs) \
        .groupby("i").aggregate(Sum("c", alias_name="n_g"))
    return pairs, counts


def within_group_pairs(ds: "ray.data.Dataset", group: str, item: str
                       ) -> "ray.data.Dataset":
    """Co-occurrence pair counts: for every unordered item pair, the
    number of groups containing both. Duplicate (group, item) rows are
    deduped inside the plan (one sort, no hash-distinct needed
    upstream)."""
    pairs, _ = _pairs_and_counts(ds, group, item)
    return pairs
