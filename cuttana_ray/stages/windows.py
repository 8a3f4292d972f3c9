"""Windowed operators over an ordered, keyed event log (SURVEY.md §2.4
"windows" row — absent from the reference; engine-designed per the Ray Data
streaming-shaped-workload pattern: treat the table as a partitioned log,
window within keys).

* ``tumbling_window_agg`` — fixed-size event-time windows per key
  (``floor(epoch / width)``), pure groupby with per-batch pre-aggregation.
* ``session_counts`` — gap-based sessionization: a new session starts when
  the gap to the previous event of the same key exceeds ``gap``. Exact
  across block boundaries with the same marker fix-up technique as
  ``consecutive_pairs`` (sort → per-block counts + 2 boundary rows → tiny
  driver-side straddle pass).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum


def tumbling_window_agg(ds: "ray.data.Dataset", key: str, ts: str,
                        value: str, width_s: int) -> "ray.data.Dataset":
    """Per (key, window) event counts and value sums; ``window_start`` is
    the epoch-second start of the window."""
    def bucket(batch: pa.Table) -> pa.Table:
        epoch = pc.cast(pc.cast(batch[ts], pa.int64()), pa.float64())
        # timestamps are µs since epoch
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

    Output: ``(key, n_sessions)``. Exact for any block layout.
    """
    order = order or []
    cols = [key, ts, *order]
    sorted_ds = ds.select_columns(cols).sort([key, ts, *order])
    gap_us = int(gap_s * 1_000_000)

    def block_fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        schema = pa.schema([("kind", pa.string()), ("k", pa.string()),
                            ("breaks", pa.int64()), ("t_us", pa.int64())])
        if n == 0:
            return schema.empty_table()
        k = pc.cast(batch[key], pa.string())
        t_us = pc.cast(batch[ts], pa.int64()).combine_chunks() \
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
                }))
        # every distinct key present contributes one base session row
        ks = np.unique(kn)
        parts.append(pa.table({
            "kind": pa.array(["seen"] * len(ks)),
            "k": pa.array(ks, pa.string()),
            "breaks": pa.array(np.zeros(len(ks), np.int64)),
            "t_us": pa.array(np.zeros(len(ks), np.int64)),
        }))
        for kind, idx in (("first", 0), ("last", n - 1)):
            parts.append(pa.table({
                "kind": pa.array([kind]),
                "k": pa.array([str(kn[idx])]),
                "breaks": pa.array([0], pa.int64()),
                "t_us": pa.array([int(t_us[idx])]),
            }))
        return pa.concat_tables([p.cast(schema) for p in parts])

    mixed = sorted_ds.map_batches(block_fn, batch_format="pyarrow",
                                  batch_size=None).materialize()
    # sessions(k) = Σ_blocks-containing-k 1  (each block run starts a session)
    #             + Σ intra-block gap breaks
    #             − #block-boundary continuations (gap ≤ G merges the runs)
    markers = mixed.filter(expr="kind == 'first' or kind == 'last'") \
        .to_pandas()
    joins: dict[str, int] = {}
    if len(markers):
        markers = markers.sort_values(
            ["k", "t_us", "kind"],
            key=lambda s: s.map({"first": 0, "last": 1})
            if s.name == "kind" else s)
        kinds = markers["kind"].to_numpy()
        keys = markers["k"].to_numpy()
        tss = markers["t_us"].to_numpy()
        for i in range(len(markers) - 1):
            if kinds[i] == "last" and kinds[i + 1] == "first" \
                    and keys[i] == keys[i + 1] \
                    and tss[i + 1] - tss[i] <= gap_us:
                joins[keys[i]] = joins.get(keys[i], 0) + 1

    from ray.data.aggregate import Sum as _Sum

    body = mixed.filter(expr="kind == 'breaks' or kind == 'seen'") \
        .map_batches(lambda b: pa.table({
            "k": b["k"],
            "breaks": b["breaks"],
            "seen": pc.cast(pc.equal(b["kind"], "seen"), pa.int64()),
        }), batch_format="pyarrow") \
        .groupby("k").aggregate(_Sum("breaks", alias_name="breaks"),
                                _Sum("seen", alias_name="blocks"))
    pdf = body.to_pandas()
    pdf["n_sessions"] = (pdf["breaks"] + pdf["blocks"]
                         - pdf["k"].map(joins).fillna(0).astype(int))
    pdf = pdf.sort_values("k").reset_index(drop=True)
    return ray.data.from_arrow(pa.table({
        "k": pa.array(pdf["k"], pa.string()),
        "n_sessions": pa.array(pdf["n_sessions"].to_numpy(), pa.int64()),
    }))
