"""Dataset profiling — the data-quality summary every large-scale ingest
runs before training: per column, row/null counts, min/max, and (numeric
columns) the mean.

One streaming ``map_batches`` pass emits a fixed-size partial row per
(block, column) — counts, extrema, block sums — and the driver folds the
O(#blocks × #columns) partials. No shuffle, no materialization; the
profile of a 100 TB table costs one read.

Numeric means fold per-block sums with ``math.fsum``, so the result is
deterministic for a given block layout and within ~1 ulp across layouts
(the query layer rounds). Extrema are exact: strings compare
lexicographically (UTF-8 byte order — same as SQL binary collation),
numerics fold with min/max, reported both as strings (ints) and as
float64 (``min_num``/``max_num``) so float extrema avoid
rendering-format mismatches entirely.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _is_numeric(t: pa.DataType) -> bool:
    return pa.types.is_integer(t) or pa.types.is_floating(t)


def profile(ds: "ray.data.Dataset",
            columns: "list[str] | None" = None) -> pa.Table:
    """Per-column summary table with one row per profiled column:

    ``column, n_rows, n_nulls, min_str, max_str, min_num, max_num, mean``

    ``min_str``/``max_str`` hold integer/string extrema rendered as text
    (null for floats); ``min_num``/``max_num``/``mean`` hold numeric
    extrema/mean as float64 (null for non-numeric columns). Nulls (and
    float NaNs) are excluded from extrema and mean, matching SQL
    aggregate semantics."""
    schema = ds.schema()
    names = columns if columns is not None else list(schema.names)
    types = {c: schema.types[schema.names.index(c)] for c in names}

    def partial(t: pa.Table) -> pa.Table:
        rows = []
        for c in names:
            n = len(t)
            col = t[c] if c in t.column_names else None
            if col is None or n == 0:
                rows.append((c, n, 0, None, None, 0.0, 0))
                continue
            nulls = col.null_count
            mn = mx = None
            s, valid = 0.0, n - nulls
            if valid:
                if _is_numeric(types[c]):
                    v = pc.cast(col, pa.float64()) \
                        .to_numpy(zero_copy_only=False)
                    s = float(np.nansum(v))
                    mn, mx = float(np.nanmin(v)), float(np.nanmax(v))
                    valid = int(np.count_nonzero(~np.isnan(v)))
                else:
                    mm = pc.min_max(col)
                    mn, mx = str(mm["min"].as_py()), str(mm["max"].as_py())
            rows.append((c, n, nulls, mn, mx, s, valid))
        numeric = [_is_numeric(types[r[0]]) for r in rows]
        return pa.table({
            "column": pa.array([r[0] for r in rows]),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "nulls": pa.array([r[2] for r in rows], pa.int64()),
            "mn_s": pa.array([None if nu else r[3]
                              for r, nu in zip(rows, numeric)], pa.string()),
            "mx_s": pa.array([None if nu else r[4]
                              for r, nu in zip(rows, numeric)], pa.string()),
            "mn_f": pa.array([r[3] if nu else None
                              for r, nu in zip(rows, numeric)], pa.float64()),
            "mx_f": pa.array([r[4] if nu else None
                              for r, nu in zip(rows, numeric)], pa.float64()),
            "s": pa.array([r[5] for r in rows], pa.float64()),
            "valid": pa.array([r[6] for r in rows], pa.int64()),
        })

    acc = {c: {"n": 0, "nulls": 0, "sums": [], "valid": 0,
               "mn_s": None, "mx_s": None, "mn_f": None, "mx_f": None}
           for c in names}

    def fold(cur, cand, is_min):
        if cand is None:
            return cur
        if cur is None:
            return cand
        return min(cur, cand) if is_min else max(cur, cand)

    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        for i in range(len(b)):
            a = acc[b["column"][i].as_py()]
            a["n"] += b["n"][i].as_py()
            a["nulls"] += b["nulls"][i].as_py()
            a["valid"] += b["valid"][i].as_py()
            a["sums"].append(b["s"][i].as_py())
            a["mn_s"] = fold(a["mn_s"], b["mn_s"][i].as_py(), True)
            a["mx_s"] = fold(a["mx_s"], b["mx_s"][i].as_py(), False)
            a["mn_f"] = fold(a["mn_f"], b["mn_f"][i].as_py(), True)
            a["mx_f"] = fold(a["mx_f"], b["mx_f"][i].as_py(), False)

    def int_str(x):
        return str(int(x)) if x is not None else None

    cols = {"column": [], "n_rows": [], "n_nulls": [], "min_str": [],
            "max_str": [], "min_num": [], "max_num": [], "mean": []}
    for c in names:
        a = acc[c]
        ty = types[c]
        cols["column"].append(c)
        cols["n_rows"].append(a["n"])
        cols["n_nulls"].append(a["nulls"])
        if pa.types.is_integer(ty):
            cols["min_str"].append(int_str(a["mn_f"]))
            cols["max_str"].append(int_str(a["mx_f"]))
        else:
            cols["min_str"].append(a["mn_s"])
            cols["max_str"].append(a["mx_s"])
        cols["min_num"].append(a["mn_f"])
        cols["max_num"].append(a["mx_f"])
        cols["mean"].append(math.fsum(a["sums"]) / a["valid"]
                            if _is_numeric(ty) and a["valid"] else None)
    return pa.table({
        "column": pa.array(cols["column"]),
        "n_rows": pa.array(cols["n_rows"], pa.int64()),
        "n_nulls": pa.array(cols["n_nulls"], pa.int64()),
        "min_str": pa.array(cols["min_str"], pa.string()),
        "max_str": pa.array(cols["max_str"], pa.string()),
        "min_num": pa.array(cols["min_num"], pa.float64()),
        "max_num": pa.array(cols["max_num"], pa.float64()),
        "mean": pa.array(cols["mean"], pa.float64()),
    })
