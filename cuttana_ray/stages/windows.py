"""Windowed operators over an ordered, keyed event log (SURVEY.md §2.4
"windows" row — absent from the reference; engine-designed per the Ray Data
streaming-shaped-workload pattern: treat the table as a partitioned log,
window within keys).

* ``tumbling_window_agg`` — fixed-size event-time windows per key
  (``floor(epoch / width)``), pure groupby with per-batch pre-aggregation.
* ``session_counts`` — gap-based sessionization: a new session starts when
  the gap to the previous event of the same key exceeds ``gap``. Exact
  across block boundaries: each block emits ONE "bound" row carrying both
  its first and last (key, ts); block adjacency is recovered PER KEY on
  the driver (head / interior / tail decomposition, interiors ordered by
  their int timestamp intervals — ties are point-intervals whose boundary
  gap is 0, so the join count is invariant to their order). This replaces
  the earlier interleaved first/last marker scan, which missed
  continuations when the straddling rows shared a timestamp, and never
  compares stringified keys across keys (numeric keys sort differently as
  strings).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum


def ts_to_us(arr: "pa.ChunkedArray | pa.Array") -> "pa.ChunkedArray | pa.Array":
    """Epoch microseconds as int64 from a timestamp column of ANY unit
    (s/ms/us/ns); int64 input is passed through (assumed µs)."""
    t = arr.type
    if pa.types.is_timestamp(t):
        scale = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": None}[t.unit]
        raw = pc.cast(arr, pa.int64())
        if scale is None:  # ns → µs
            return pc.divide(raw, 1_000)
        if scale != 1:
            return pc.multiply(raw, scale)
        return raw
    return pc.cast(arr, pa.int64())


def tumbling_window_agg(ds: "ray.data.Dataset", key: str, ts: str,
                        value: str, width_s: int) -> "ray.data.Dataset":
    """Per (key, window) event counts and value sums; ``window_start`` is
    the epoch-second start of the window."""
    def bucket(batch: pa.Table) -> pa.Table:
        epoch = pc.cast(ts_to_us(batch[ts]), pa.float64())
        win = pc.multiply(
            pc.floor(pc.divide(epoch, float(width_s * 1_000_000))),
            float(width_s))
        t = pa.table({
            key: batch[key],
            "window_start": pc.cast(win, pa.int64()),
            value: batch[value],
        })
        g = t.group_by([key, "window_start"]).aggregate(
            [(value, "sum"), ([], "count_all")])
        return g.rename_columns([key, "window_start", "value_sum", "n"])

    partial = ds.map_batches(bucket, batch_format="pyarrow")
    agg = partial.groupby([key, "window_start"]).aggregate(
        Sum("value_sum", alias_name="value_sum"),
        Sum("n", alias_name="n_events"))

    def round_col(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("value_sum"), "value_sum",
            pc.round(batch["value_sum"], 2))
    return agg.map_batches(round_col, batch_format="pyarrow")


def session_counts(ds: "ray.data.Dataset", key: str, ts: str,
                   order: list[str] | None = None,
                   gap_s: float = 1800.0) -> "ray.data.Dataset":
    """Number of sessions per key (session break = gap > ``gap_s`` between
    consecutive events of the key, ordered by ``(ts, *order)``).

    Output: ``(key, n_sessions)``. Exact for any block layout, including
    blocks whose straddling rows share a timestamp (see module docstring).
    """
    order = order or []
    cols = [key, ts, *order]
    sorted_ds = ds.select_columns(cols).sort([key, ts, *order])
    gap_us = int(gap_s * 1_000_000)

    def block_fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        schema = pa.schema([("kind", pa.string()), ("k", pa.string()),
                            ("breaks", pa.int64()), ("t_us", pa.int64()),
                            ("k2", pa.string()), ("t2_us", pa.int64())])
        if n == 0:
            return schema.empty_table()
        k = pc.cast(batch[key], pa.string())
        t_us = ts_to_us(batch[ts])
        t_us = pc.cast(t_us, pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        kn = k.combine_chunks().to_numpy(zero_copy_only=False)
        parts = []
        if n > 1:
            same = kn[1:] == kn[:-1]
            brk = same & ((t_us[1:] - t_us[:-1]) > gap_us)
            if brk.any():
                ks, cnt = np.unique(kn[1:][brk], return_counts=True)
                parts.append(pa.table({
                    "kind": pa.array(["breaks"] * len(ks)),
                    "k": pa.array(ks, pa.string()),
                    "breaks": pa.array(cnt.astype(np.int64)),
                    "t_us": pa.array(np.zeros(len(ks), np.int64)),
                    "k2": pa.array([""] * len(ks), pa.string()),
                    "t2_us": pa.array(np.zeros(len(ks), np.int64)),
                }))
        # every distinct key present contributes one base session row
        ks = np.unique(kn)
        parts.append(pa.table({
            "kind": pa.array(["seen"] * len(ks)),
            "k": pa.array(ks, pa.string()),
            "breaks": pa.array(np.zeros(len(ks), np.int64)),
            "t_us": pa.array(np.zeros(len(ks), np.int64)),
            "k2": pa.array([""] * len(ks), pa.string()),
            "t2_us": pa.array(np.zeros(len(ks), np.int64)),
        }))
        # ONE bound row per block: (first key, first ts, last key, last ts)
        parts.append(pa.table({
            "kind": pa.array(["bound"]),
            "k": pa.array([str(kn[0])]),
            "breaks": pa.array([0], pa.int64()),
            "t_us": pa.array([int(t_us[0])]),
            "k2": pa.array([str(kn[n - 1])]),
            "t2_us": pa.array([int(t_us[n - 1])]),
        }))
        return pa.concat_tables([p.cast(schema) for p in parts])

    mixed = sorted_ds.map_batches(block_fn, batch_format="pyarrow",
                                  batch_size=None).materialize()
    # sessions(k) = Σ_blocks-containing-k 1  (each block run starts a session)
    #             + Σ intra-block gap breaks
    #             − #block-boundary continuations (gap ≤ G merges the runs)
    bounds = mixed.filter(expr="kind == 'bound'").to_pandas()
    joins: dict[str, int] = {}
    if len(bounds):
        # Recover block adjacency PER KEY (marker keys are stringified, so
        # a global sort would misorder numeric keys — "12" < "2"): for key
        # K, its run of blocks is contiguous, consisting of ≤1 head (block
        # ending with K, started on an earlier key), interiors (start AND
        # end with K, ordered by their int (t1, t2) interval — ties are
        # point-intervals with boundary gap 0, join-count invariant), and
        # ≤1 tail (block starting with K, ending on a later key). Only
        # int timestamps are compared, never key strings.
        from collections import defaultdict
        heads: dict[str, int] = {}
        tails: dict[str, int] = {}
        interiors: dict[str, list] = defaultdict(list)
        for k1, t1, k2, t2 in zip(bounds["k"], bounds["t_us"],
                                  bounds["k2"], bounds["t2_us"]):
            if k1 == k2:
                interiors[k1].append((int(t1), int(t2)))
            else:
                tails[k1] = int(t1)   # this block is key k1's tail
                heads[k2] = int(t2)   # and key k2's head
        for key in set(heads) | set(tails) | set(interiors):
            seq: list[tuple[int, int]] = []  # (start_ts, end_ts) per block
            if key in heads:
                seq.append((None, heads[key]))
            seq.extend(sorted(interiors.get(key, ())))
            if key in tails:
                seq.append((tails[key], None))
            for prev, nxt in zip(seq, seq[1:]):
                if nxt[0] - prev[1] <= gap_us:
                    joins[key] = joins.get(key, 0) + 1

    from ray.data.aggregate import Sum as _Sum

    body = mixed.filter(expr="kind == 'breaks' or kind == 'seen'") \
        .map_batches(lambda b: pa.table({
            "k": b["k"],
            "breaks": b["breaks"],
            "seen": pc.cast(pc.equal(b["kind"], "seen"), pa.int64()),
        }), batch_format="pyarrow") \
        .groupby("k").aggregate(_Sum("breaks", alias_name="breaks"),
                                _Sum("seen", alias_name="blocks"))
    # distributed finish: the boundary-joins dict is O(#blocks) — at most
    # one entry per block boundary — so it broadcasts (ray.put once, read
    # per actor), and the per-key correction runs inside map_batches; the
    # driver never materializes the O(#keys) grouped table.
    from cuttana_ray.util import drop_empty_blocks
    joins_ref = ray.put(joins)

    # plain tasks: the broadcast dict is a node-local ``ray.get`` per task
    # with no per-worker prep (no actor-pool spin-up; see stages/vocab.py)
    def finish(t: pa.Table) -> pa.Table:
        schema = pa.schema([("k", pa.string()),
                            ("n_sessions", pa.int64())])
        if len(t) == 0 or "k" not in t.column_names:
            return schema.empty_table()
        jmap = ray.get(joins_ref)
        j = np.fromiter((jmap.get(x, 0)
                         for x in t["k"].to_pylist()),
                        np.int64, len(t))
        n = (t["breaks"].to_numpy(zero_copy_only=False)
             + t["blocks"].to_numpy(zero_copy_only=False) - j)
        return pa.table({"k": t["k"],
                         "n_sessions": pa.array(n)}).cast(schema)

    return drop_empty_blocks(body).map_batches(
        finish, batch_format="pyarrow").sort("k")


def hopping_window_agg(ds: "ray.data.Dataset", key: str, ts: str,
                       value: str, width_s: int,
                       hop_s: int) -> "ray.data.Dataset":
    """Hopping (sliding) windows: per (key, window) counts and value sums
    for windows of ``width_s`` seconds starting every ``hop_s`` seconds.

    Each event expands to the ``ceil(width/hop)`` windows containing it —
    vectorized repeat, no Python rows — and is partially aggregated per
    batch BEFORE the (key, window_start) shuffle, so the exchange carries
    at most distinct-(key, window) rows per block, not raw expanded events.
    ``window_start`` is the epoch-second window start (a multiple of
    ``hop_s``); tumbling is the ``hop_s == width_s`` special case."""
    width_us = int(width_s) * 1_000_000
    hop_us = int(hop_s) * 1_000_000

    def expand(batch: pa.Table) -> pa.Table:
        n = len(batch)
        out_schema = pa.schema([
            (key, batch.schema.field(key).type if n or key in
             batch.column_names else pa.int64()),
            ("window_start", pa.int64()),
            ("value_sum", pa.float64()), ("n", pa.int64())])
        if n == 0:
            return out_schema.empty_table()
        t = np.asarray(ts_to_us(batch[ts]))
        # windows j*hop with j in (t-width, t] / hop (floor division)
        j_max = t // hop_us
        j_min = (t - width_us) // hop_us + 1
        counts = (j_max - j_min + 1).astype(np.int64)
        total = int(counts.sum())
        row = np.repeat(np.arange(n, dtype=np.int64), counts)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
        j = j_min[row] + offs
        expanded = pa.table({
            key: batch[key].take(pa.array(row)),
            "window_start": pa.array(j * hop_s, pa.int64()),
            value: batch[value].take(pa.array(row)),
        })
        g = expanded.group_by([key, "window_start"]).aggregate(
            [(value, "sum"), ([], "count_all")])
        return g.rename_columns([key, "window_start", "value_sum", "n"])

    partial = ds.map_batches(expand, batch_format="pyarrow")
    agg = partial.groupby([key, "window_start"]).aggregate(
        Sum("value_sum", alias_name="value_sum"),
        Sum("n", alias_name="n_events"))

    def round_col(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("value_sum"), "value_sum",
            pc.round(batch["value_sum"], 2))
    return agg.map_batches(round_col, batch_format="pyarrow")


def funnel_counts(ds: "ray.data.Dataset", key: str, ts: str,
                  type_col: str, steps: list[str],
                  num_keys: int | None = None) -> "pa.Table":
    """Ordered funnel over a keyed event log: a key reaches step k when an
    event of type ``steps[k]`` occurs at ``ts >= t_{k-1}`` (the earliest
    time step k-1 was reached; step 0 needs only any matching event).
    Returns one row per step: ``(step, event_type, n_users)``.

    Fully vectorized, no per-group Python: one pass per step, each a
    per-batch masked ``np.minimum.at`` partial against the PREVIOUS
    step's reach-time array (broadcast via ``ray.put``, read zero-copy),
    merged on the driver — the same bounded dense-state regime as
    ``pipelines/kcore.py``. Reads prune to the funnel's event types and
    three columns before anything moves.
    """
    import ray

    sub = ds.select_columns([key, ts, type_col])
    sub = sub.map_batches(
        lambda t: t.filter(pc.is_in(t[type_col],
                                    value_set=pa.array(steps))),
        batch_format="pyarrow")

    if num_keys is None:
        mx = 0
        for b in sub.map_batches(
                lambda t: pa.table({"m": pa.array(
                    [int(pc.max(t[key]).as_py() or 0) if len(t) else 0],
                    pa.int64())}), batch_format="pyarrow") \
                .iter_batches(batch_size=None, batch_format="pyarrow"):
            if len(b) and "m" in b.column_names:
                mx = max(mx, int(b["m"][0].as_py()))
        num_keys = mx + 1

    NONE = np.iinfo(np.int64).max
    reach = np.zeros(0, dtype=np.int64)  # t_{k-1} per key
    out_rows = []
    for si, step in enumerate(steps):
        prev_ref = ray.put(reach if si else None)

        def step_min(batch: pa.Table, _p=prev_ref, _s=step,
                     _first=(si == 0)) -> pa.Table:
            t_us = np.asarray(ts_to_us(batch[ts]), dtype=np.int64)
            k = batch[key].to_numpy(zero_copy_only=False)
            m = pc.equal(batch[type_col], _s).to_numpy(zero_copy_only=False)
            if not _first:
                prev = ray.get(_p)
                m = m & (t_us >= prev[k])
            if not m.any():
                return pa.table({"k": pa.array([], pa.int64()),
                                 "t": pa.array([], pa.int64())})
            uniq, inv = np.unique(k[m], return_inverse=True)
            mn = np.full(len(uniq), NONE, np.int64)
            np.minimum.at(mn, inv, t_us[m])
            return pa.table({"k": pa.array(uniq, pa.int64()),
                             "t": pa.array(mn, pa.int64())})

        cur = np.full(num_keys, NONE, dtype=np.int64)
        for b in sub.map_batches(step_min, batch_format="pyarrow") \
                .iter_batches(batch_size=None, batch_format="pyarrow"):
            if len(b) == 0 or "k" not in b.column_names:
                continue
            np.minimum.at(cur, b["k"].to_numpy(zero_copy_only=False),
                          b["t"].to_numpy(zero_copy_only=False))
        reach = cur
        out_rows.append((si + 1, step, int((cur != NONE).sum())))

    return pa.table({
        "step": pa.array([r[0] for r in out_rows], pa.int64()),
        "event_type": pa.array([r[1] for r in out_rows], pa.string()),
        "n_users": pa.array([r[2] for r in out_rows], pa.int64())})
