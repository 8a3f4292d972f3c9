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


# ---------------------------------------------------------------------------
# Range (interval) join


def range_join(left: "ray.data.Dataset", right: "ray.data.Dataset", *,
               left_t: str, right_start: str, right_end: str,
               key: str | None = None,
               left_cols: list[str] | None = None,
               right_cols: list[str] | None = None,
               bucket_width: int | None = None) -> "ray.data.Dataset":
    """Interval containment join: every (left, right) pair with
    ``right.start <= left.t <= right.end`` (and equal ``key`` if given).

    Ray-Data-first plan (SURVEY.md §2.4 custom-operator rule (a):
    composition of map_batches + groupby().map_groups):

    1. Pick a bucket width ``W >= max(end - start)`` (computed with one
       small aggregate over the right side when not supplied). Each right
       interval is replicated into every W-bucket it overlaps — at most 2
       by construction — with a vectorized ``np.repeat`` expansion; each
       left point lands in exactly ONE bucket, so no output dedup is ever
       needed.
    2. One ``groupby(bucket[, key]).map_groups`` shuffle co-locates every
       candidate pair; within a group the containment test is a dense
       vectorized mask (no Python rows).

    Partitioning assumption (documented per the §2.4 rule): intervals per
    (bucket, key) group stay bounded — true whenever interval length is
    bounded by W and interval density per key is bounded. Heavily skewed
    interval sets should pre-split hot keys (same salting discipline as the
    hopping-window expansion in stages/windows.py).

    Timestamps of any unit are normalised to epoch-µs int64 (``ts_to_us``);
    plain int columns join on their raw values. Output: ``left_cols``
    (default all) plus ``r_<col>`` for each of ``right_cols`` (default all
    non-bound right columns). Inner join: unmatched left rows are dropped.
    """
    lschema = left.schema()
    rschema = right.schema()
    left_cols = left_cols or list(lschema.names)
    right_cols = right_cols or [c for c in rschema.names
                                if c not in (right_start, right_end)]
    ltypes = {c: lschema.types[lschema.names.index(c)] for c in left_cols}
    rtypes = {c: rschema.types[rschema.names.index(c)] for c in right_cols}
    ktype = (lschema.types[lschema.names.index(key)] if key else None)

    if bucket_width is None:
        from ray.data.aggregate import Max

        def span(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table({"span": pa.array([], pa.int64())})
            s = pc.cast(ts_to_us(t[right_start]), pa.int64())
            e = pc.cast(ts_to_us(t[right_end]), pa.int64())
            return pa.table({"span": pc.subtract(e, s)})
        agg = right.map_batches(span, batch_format="pyarrow") \
            .aggregate(Max("span", alias_name="mx"))
        bucket_width = max(int(agg["mx"] or 1), 1)
    w = int(bucket_width)

    fields = [("b", pa.int64()), ("side", pa.int8()), ("t", pa.int64()),
              ("s", pa.int64()), ("e", pa.int64())] + \
        ([("k", ktype)] if key else []) + \
        [(f"l_{c}", ltypes[c]) for c in left_cols] + \
        [(f"r_{c}", rtypes[c]) for c in right_cols]
    tag_schema = pa.schema(fields)

    def tag_left(t: pa.Table) -> pa.Table:
        if len(t) == 0 or left_t not in t.column_names:
            return tag_schema.empty_table()
        n = len(t)
        tv = pc.cast(ts_to_us(t[left_t]), pa.int64())
        cols = {"b": pa.array(tv.to_numpy(zero_copy_only=False) // w),
                "side": pa.array(np.full(n, 1, np.int8)),
                "t": tv,
                "s": pa.nulls(n, pa.int64()),
                "e": pa.nulls(n, pa.int64())}
        if key:
            cols["k"] = t[key]
        for c in left_cols:
            cols[f"l_{c}"] = t[c]
        for c in right_cols:
            cols[f"r_{c}"] = pa.nulls(n, rtypes[c])
        return pa.table(cols).cast(tag_schema)

    def tag_right(t: pa.Table) -> pa.Table:
        """Replicate each interval into every bucket it overlaps
        (vectorized expansion, ≤ ceil(span/W)+1 ≤ 2 copies by the W
        choice)."""
        if len(t) == 0 or right_start not in t.column_names:
            return tag_schema.empty_table()
        s = pc.cast(ts_to_us(t[right_start]), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        e = pc.cast(ts_to_us(t[right_end]), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        b0 = s // w
        nb = (e // w) - b0 + 1
        nb = np.maximum(nb, 1)
        idx = np.repeat(np.arange(len(t), dtype=np.int64), nb)
        # within-row offset 0..nb-1 via cumulative trick
        off = np.arange(len(idx), dtype=np.int64) - \
            np.repeat(np.cumsum(nb) - nb, nb)
        take = pa.array(idx)
        m = len(idx)
        cols = {"b": pa.array(b0[idx] + off),
                "side": pa.array(np.zeros(m, np.int8)),
                "t": pa.nulls(m, pa.int64()),
                "s": pa.array(s[idx]),
                "e": pa.array(e[idx])}
        if key:
            cols["k"] = t[key].take(take)
        for c in left_cols:
            cols[f"l_{c}"] = pa.nulls(m, ltypes[c])
        for c in right_cols:
            cols[f"r_{c}"] = t[c].take(take)
        return pa.table(cols).cast(tag_schema)

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")
    both = lt.union(rt)

    out_fields = [(c, ltypes[c]) for c in left_cols] + \
        [(f"r_{c}", rtypes[c]) for c in right_cols]
    out_schema = pa.schema(out_fields)

    def match_group(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "side" not in t.column_names:
            return out_schema.empty_table()
        side = t["side"].to_numpy(zero_copy_only=False)
        lpos = np.nonzero(side == 1)[0]
        rpos = np.nonzero(side == 0)[0]
        if len(lpos) == 0 or len(rpos) == 0:
            return out_schema.empty_table()
        tv = t["t"].to_numpy(zero_copy_only=False)[lpos]
        s = t["s"].to_numpy(zero_copy_only=False)[rpos]
        e = t["e"].to_numpy(zero_copy_only=False)[rpos]
        mask = (tv[:, None] >= s[None, :]) & (tv[:, None] <= e[None, :])
        li, ri = np.nonzero(mask)
        ltake = pa.array(lpos[li])
        rtake = pa.array(rpos[ri])
        cols = {}
        for c in left_cols:
            cols[c] = t[f"l_{c}"].take(ltake)
        for c in right_cols:
            cols[f"r_{c}"] = t[f"r_{c}"].take(rtake)
        return pa.table(cols).cast(out_schema)

    gkeys = ["b"] + (["k"] if key else [])
    return both.groupby(gkeys).map_groups(match_group,
                                          batch_format="pyarrow")


# -- Bloom-filter semi-join reduction ----------------------------------------

_BLOOM_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_BLOOM_MIX2 = np.uint64(0x94D049BB133111EB)


def _bloom_hashes(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit splitmix64-style hashes in exact uint64
    arithmetic (double hashing generates all probe positions)."""
    x = keys.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * _BLOOM_MIX1
        x = (x ^ (x >> np.uint64(27))) * _BLOOM_MIX2
        h1 = x ^ (x >> np.uint64(31))
        y = (h1 ^ (h1 >> np.uint64(33))) * _BLOOM_MIX1
        h2 = y ^ (y >> np.uint64(29))
    return h1, h2 | np.uint64(1)  # odd step → full period


def bloom_filter_build(small: "ray.data.Dataset", key: str,
                       num_bits: int = 1 << 22,
                       num_hashes: int = 4) -> np.ndarray:
    """Build a Bloom filter (packed uint64 words) of the small side's
    int64 keys: each block emits only its NON-ZERO (word-index, word)
    pairs, the driver OR-merges them — fixed O(num_bits/8) driver state,
    exactly the mergeable-register discipline of the HLL sketch
    (functions/sketches.py). No false negatives ever."""
    words = num_bits // 64

    def block_bits(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False)
        bits = np.zeros(words, np.uint64)
        h1, h2 = _bloom_hashes(k)
        for i in range(num_hashes):
            with np.errstate(over="ignore"):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(num_bits)
            np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))
        nz = np.nonzero(bits)[0]
        return pa.table({"w": pa.array(nz, pa.int64()),
                         "bits": pa.array(bits[nz].astype(np.int64))})

    merged = np.zeros(words, np.uint64)
    for b in small.map_batches(block_bits, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(b) == 0:
            continue
        w = b["w"].to_numpy(zero_copy_only=False)
        v = b["bits"].to_numpy(zero_copy_only=False).view(np.uint64)
        np.bitwise_or.at(merged, w, v)
    return merged


def bloom_prune(big: "ray.data.Dataset", bloom_bits: np.ndarray, key: str,
                num_hashes: int = 4) -> "ray.data.Dataset":
    """Drop big-side rows whose key is DEFINITELY absent from the filter
    (possible false positives, never false negatives — follow with an
    exact join/semi-join). The filter ships once via ``ray.put`` and every
    block probes it vectorized; at 100 TB this is the semi-join reduction
    that keeps non-matching rows out of the join exchange entirely."""
    import ray as _ray
    num_bits = len(bloom_bits) * 64
    ref = _ray.put(bloom_bits)

    def probe(t: pa.Table) -> pa.Table:
        bits = _ray.get(ref)
        k = t[key].to_numpy(zero_copy_only=False)
        h1, h2 = _bloom_hashes(k)
        hit = np.ones(len(k), bool)
        for i in range(num_hashes):
            with np.errstate(over="ignore"):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(num_bits)
            word = bits[(pos >> np.uint64(6)).astype(np.int64)]
            hit &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
        return t.filter(pa.array(hit))

    return big.map_batches(probe, batch_format="pyarrow")


def cross_join_broadcast(left: "ray.data.Dataset",
                         right_table: pa.Table) -> "ray.data.Dataset":
    """Cartesian product with a SMALL broadcast right side — the only
    shape in which a cross join is ever sane at scale: the right table
    goes to the object store ONCE (``ray.put``), every task reads it
    zero-copy, and each batch expands by vectorized repeat/tile take
    kernels. Output size is |left|·|right| rows; no shuffle at all.
    Column-name collisions get a ``_r`` suffix on the right."""
    import ray

    ref = ray.put(right_table)

    def fn(batch: pa.Table, _r=ref) -> pa.Table:
        r = ray.get(_r)
        rnames = [c + "_r" if c in batch.column_names else c
                  for c in r.column_names]
        out_schema = pa.schema(
            list(zip(batch.schema.names, batch.schema.types))
            + list(zip(rnames, r.schema.types)))
        n, m = len(batch), len(r)
        if n == 0 or m == 0:
            return out_schema.empty_table()
        lt = batch.take(pa.array(np.repeat(np.arange(n, dtype=np.int64), m)))
        rt = r.take(pa.array(np.tile(np.arange(m, dtype=np.int64), n)))
        cols = list(lt.columns) + list(rt.columns)
        return pa.table(cols, schema=out_schema)

    return left.map_batches(fn, batch_format="pyarrow")


def interval_overlap_join(left: "ray.data.Dataset",
                          right: "ray.data.Dataset",
                          left_start: str, left_end: str,
                          right_start: str, right_end: str,
                          key: str | None = None,
                          left_cols: list[str] | None = None,
                          right_cols: list[str] | None = None,
                          bucket_width: int | None = None
                          ) -> "ray.data.Dataset":
    """Interval OVERLAP join: every (left, right) pair whose closed
    intervals intersect — ``l.start <= r.end AND r.start <= l.end`` (and
    equal ``key`` if given). The two-sided sibling of ``range_join``
    (point-in-interval); together they cover SQL's interval-predicate
    join family.

    Plan (SURVEY.md §2.4 custom-operator rule (a)): both sides replicate
    each interval into every W-bucket it spans (≤ 2 copies when
    ``W >= max span``, vectorized np.repeat expansion), then ONE
    ``groupby(bucket[, key]).map_groups`` shuffle co-locates candidates
    and a dense vectorized mask tests overlap. A pair that shares several
    buckets is emitted exactly once, with no global dedup pass: the
    overlap start ``max(l.start, r.start)`` lies inside BOTH intervals,
    so both copies exist in its bucket, and the group keeps only pairs
    whose overlap start falls in the group's own bucket.

    Partitioning assumption: intervals per (bucket, key) group stay
    bounded (true when span is bounded by W and per-key interval density
    is bounded); pre-split hot keys as in ``range_join``.

    Bounds are normalised to int64 via ``ts_to_us`` (timestamps) or raw
    ints. Output: ``left_cols`` plus ``r_<col>`` for right columns.
    """
    lschema = left.schema()
    rschema = right.schema()
    left_cols = left_cols or [c for c in lschema.names
                              if c not in (left_start, left_end)]
    right_cols = right_cols or [c for c in rschema.names
                                if c not in (right_start, right_end)]
    ltypes = {c: lschema.types[lschema.names.index(c)] for c in left_cols}
    rtypes = {c: rschema.types[rschema.names.index(c)] for c in right_cols}
    ktype = (lschema.types[lschema.names.index(key)] if key else None)

    if bucket_width is None:
        from ray.data.aggregate import Max

        def span(scol: str, ecol: str):
            def fn(t: pa.Table) -> pa.Table:
                if len(t) == 0 or scol not in t.column_names:
                    return pa.table({"span": pa.array([], pa.int64())})
                s = pc.cast(ts_to_us(t[scol]), pa.int64())
                e = pc.cast(ts_to_us(t[ecol]), pa.int64())
                return pa.table({"span": pc.subtract(e, s)})
            return fn
        spans = left.map_batches(span(left_start, left_end),
                                 batch_format="pyarrow").union(
            right.map_batches(span(right_start, right_end),
                              batch_format="pyarrow"))
        agg = spans.aggregate(Max("span", alias_name="mx"))
        bucket_width = max(int(agg["mx"] or 1), 1)
    w = int(bucket_width)

    fields = [("b", pa.int64()), ("side", pa.int8()), ("s", pa.int64()),
              ("e", pa.int64())] + \
        ([("k", ktype)] if key else []) + \
        [(f"l_{c}", ltypes[c]) for c in left_cols] + \
        [(f"r_{c}", rtypes[c]) for c in right_cols]
    tag_schema = pa.schema(fields)

    def tagger(is_left: bool, scol: str, ecol: str, cols_: list[str]):
        def tag(t: pa.Table) -> pa.Table:
            if len(t) == 0 or scol not in t.column_names:
                return tag_schema.empty_table()
            s = pc.cast(ts_to_us(t[scol]), pa.int64()) \
                .to_numpy(zero_copy_only=False)
            e = pc.cast(ts_to_us(t[ecol]), pa.int64()) \
                .to_numpy(zero_copy_only=False)
            b0 = s // w
            nb = np.maximum((e // w) - b0 + 1, 1)
            idx = np.repeat(np.arange(len(t), dtype=np.int64), nb)
            off = np.arange(len(idx), dtype=np.int64) - \
                np.repeat(np.cumsum(nb) - nb, nb)
            take = pa.array(idx)
            m = len(idx)
            cols = {"b": pa.array(b0[idx] + off),
                    "side": pa.array(np.full(m, 1 if is_left else 0,
                                             np.int8)),
                    "s": pa.array(s[idx]), "e": pa.array(e[idx])}
            if key:
                cols["k"] = t[key].take(take)
            for c in left_cols:
                cols[f"l_{c}"] = (t[c].take(take) if is_left
                                  else pa.nulls(m, ltypes[c]))
            for c in right_cols:
                cols[f"r_{c}"] = (t[c].take(take) if not is_left
                                  else pa.nulls(m, rtypes[c]))
            return pa.table(cols).cast(tag_schema)
        return tag

    both = left.map_batches(tagger(True, left_start, left_end, left_cols),
                            batch_format="pyarrow").union(
        right.map_batches(tagger(False, right_start, right_end, right_cols),
                          batch_format="pyarrow"))

    out_fields = [(c, ltypes[c]) for c in left_cols] + \
        [(f"r_{c}", rtypes[c]) for c in right_cols]
    out_schema = pa.schema(out_fields)

    def match_group(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "side" not in t.column_names:
            return out_schema.empty_table()
        bucket = int(t["b"][0].as_py())
        side = t["side"].to_numpy(zero_copy_only=False)
        lpos = np.nonzero(side == 1)[0]
        rpos = np.nonzero(side == 0)[0]
        if len(lpos) == 0 or len(rpos) == 0:
            return out_schema.empty_table()
        ls = t["s"].to_numpy(zero_copy_only=False)[lpos]
        le = t["e"].to_numpy(zero_copy_only=False)[lpos]
        rs = t["s"].to_numpy(zero_copy_only=False)[rpos]
        re_ = t["e"].to_numpy(zero_copy_only=False)[rpos]
        overlap = (ls[:, None] <= re_[None, :]) & \
            (rs[None, :] <= le[:, None])
        # claim each pair in exactly one bucket: the one holding the
        # overlap start max(ls, rs)
        ostart = np.maximum(ls[:, None], rs[None, :])
        mask = overlap & ((ostart // w) == bucket)
        li, ri = np.nonzero(mask)
        ltake = pa.array(lpos[li])
        rtake = pa.array(rpos[ri])
        cols = {}
        for c in left_cols:
            cols[c] = t[f"l_{c}"].take(ltake)
        for c in right_cols:
            cols[f"r_{c}"] = t[f"r_{c}"].take(rtake)
        return pa.table(cols).cast(out_schema)

    gkeys = ["b"] + (["k"] if key else [])
    return both.groupby(gkeys).map_groups(match_group,
                                          batch_format="pyarrow")


def skew_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              left_key: str, right_key: str,
              heavy_min_count: int = 100_000,
              num_partitions: int = 8) -> "ray.data.Dataset":
    """Skew-aware inner equi-join: EXACT results with hot keys routed
    around the shuffle.

    A plain hash join sends every row of a hot key to one partition —
    the classic straggler at web scale (one conv-id with 10^8 turns melts
    its reducer). Plan here:

    1. Detect heavy LEFT keys with the Count-Min-pruned exact counter
       (``functions/sketches.py heavy_hitters`` — fixed-size sketch per
       block, never under-counts, so no heavy key is missed).
    2. Broadcast the right-side rows of those keys once (``ray.put``);
       heavy left rows join against them INSIDE ``map_batches`` — a
       vectorized searchsorted-range expansion, no exchange at all.
    3. Everything else takes one tagged-union cogroup exchange (the
       repo's join discipline that tolerates the empty blocks the heavy
       filter leaves behind — Ray 2.49's native hash join does not), now
       free of stragglers.
    4. Union of the two outputs; columns ordered identically on both
       paths.

    Partitioning assumption (SURVEY.md §2.4): the RIGHT side is the
    dimension-like side — its rows for the heavy keys fit in the object
    store (heavy keys are few by definition; right rows per key bounded).
    Output schema: all left columns plus right columns except
    ``right_key`` (its values equal ``left_key``'s).
    """
    from cuttana_ray.functions.sketches import heavy_hitters

    lschema = left.schema()
    rschema = right.schema()
    rcols = [c for c in rschema.names if c != right_key]
    out_names = list(lschema.names) + rcols

    hh_parts = [b for b in heavy_hitters(left, left_key,
                                         min_count=heavy_min_count)
                .iter_batches(batch_format="pyarrow")]
    heavy_keys = np.sort(pa.concat_tables(hh_parts)["key"]
                         .to_numpy(zero_copy_only=False)) \
        if hh_parts else np.array([], np.int64)

    def part_filter(key_col: str, keep_heavy: bool):
        def fn(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return t
            k = t[key_col].to_numpy(zero_copy_only=False)
            m = np.isin(k, heavy_keys)
            return t.filter(pa.array(m if keep_heavy else ~m))
        return fn

    # light path: one tagged-union cogroup exchange (NOT Dataset.join —
    # Ray 2.49's hash-shuffle join breaks on the empty blocks the heavy
    # filter leaves behind: an empty shuffle partition loses its schema
    # and Acero then can't resolve the key FieldRef; same hazard as
    # documented at the degree_assortativity query)
    tag_fields = [("k", lschema.types[lschema.names.index(left_key)]),
                  ("side", pa.int8())] + \
        [(f"l_{c}", lschema.types[lschema.names.index(c)])
         for c in lschema.names] + \
        [(f"r_{c}", rschema.types[rschema.names.index(c)]) for c in rcols]
    tag_schema = pa.schema(tag_fields)

    def tag(is_left: bool, key_col: str):
        def fn(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return tag_schema.empty_table()
            n = len(t)
            cols = {"k": t[key_col],
                    "side": pa.array(np.full(n, 1 if is_left else 0,
                                             np.int8))}
            for c in lschema.names:
                cols[f"l_{c}"] = t[c] if is_left \
                    else pa.nulls(n, lschema.types[lschema.names.index(c)])
            for c in rcols:
                cols[f"r_{c}"] = t[c] if not is_left \
                    else pa.nulls(n, rschema.types[rschema.names.index(c)])
            return pa.table(cols).cast(tag_schema)
        return fn

    out_schema = pa.schema(
        [(c, lschema.types[lschema.names.index(c)])
         for c in lschema.names] +
        [(c, rschema.types[rschema.names.index(c)]) for c in rcols])

    def join_group(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "side" not in t.column_names:
            return out_schema.empty_table()
        side = t["side"].to_numpy(zero_copy_only=False)
        lpos = np.nonzero(side == 1)[0]
        rpos = np.nonzero(side == 0)[0]
        if len(lpos) == 0 or len(rpos) == 0:
            return out_schema.empty_table()
        li = np.repeat(lpos, len(rpos))
        ri = np.tile(rpos, len(lpos))
        cols = {}
        for c in lschema.names:
            cols[c] = t[f"l_{c}"].take(pa.array(li))
        for c in rcols:
            cols[c] = t[f"r_{c}"].take(pa.array(ri))
        return pa.table(cols).cast(out_schema)

    lt = left.map_batches(part_filter(left_key, False),
                          batch_format="pyarrow") \
        .map_batches(tag(True, left_key), batch_format="pyarrow")
    rt = right.map_batches(part_filter(right_key, False),
                           batch_format="pyarrow") \
        .map_batches(tag(False, right_key), batch_format="pyarrow")
    light = lt.union(rt).groupby("k").map_groups(join_group,
                                                 batch_format="pyarrow")
    if len(heavy_keys) == 0:
        return light

    # heavy path: broadcast right rows for the hot keys, join per batch
    rh_parts = [b for b in right.map_batches(part_filter(right_key, True),
                                             batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow")]
    if not rh_parts:
        return light        # heavy keys have no right-side match
    rh = pa.concat_tables(rh_parts)
    order = np.argsort(rh[right_key].to_numpy(zero_copy_only=False),
                       kind="stable")
    rh = rh.take(pa.array(order))
    rh_ref = ray.put(rh)

    def bcast_join(t: pa.Table) -> pa.Table:
        rt = ray.get(rh_ref)
        rk = rt[right_key].to_numpy(zero_copy_only=False)
        if len(t) == 0:
            lo = hi = np.array([], np.int64)
            lidx = np.array([], np.int64)
        else:
            k = t[left_key].to_numpy(zero_copy_only=False)
            lo = np.searchsorted(rk, k, side="left")
            hi = np.searchsorted(rk, k, side="right")
            cnt = hi - lo
            lidx = np.repeat(np.arange(len(t), dtype=np.int64), cnt)
            cum = np.cumsum(cnt) - cnt
            ridx = (np.arange(int(cnt.sum()), dtype=np.int64)
                    - np.repeat(cum, cnt) + np.repeat(lo, cnt))
        cols = {}
        ltake = pa.array(lidx)
        rtake = pa.array(ridx if len(t) else np.array([], np.int64))
        for c in lschema.names:
            cols[c] = t[c].take(ltake)
        for c in rcols:
            cols[c] = rt[c].take(rtake)
        return pa.table(cols).select(out_names)

    heavy = left.map_batches(part_filter(left_key, True),
                             batch_format="pyarrow") \
        .map_batches(bcast_join, batch_format="pyarrow")
    return light.union(heavy)
