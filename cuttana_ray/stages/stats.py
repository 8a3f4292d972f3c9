"""Distributed one-pass second-moment statistics: per-group count / mean /
sample stddev / sample covariance / Pearson correlation.

The reference engine has only scalar counters (`src/assignment.rs:68-99`);
this widens the SURVEY.md §2.4 aggregation family with the moments DuckDB
exposes as ``STDDEV_SAMP`` / ``COVAR_SAMP`` / ``CORR``.

Scale plan (same combiner discipline as the rest of ``stages/``): each
input block reduces to ONE partial row per key it contains — ``(n, mean_x,
M2_x, mean_y, M2_y, C_xy)`` computed vectorized around the block-local
group means — so the single groupby exchange moves O(#blocks × #keys)
rows, never O(rows). Partials merge with Chan's parallel update formula
(numerically stable; no raw sum-of-squares is ever formed), sorted by a
canonical key inside each group so the merge order — and therefore the
float result — is a pure function of the block layout, not of shuffle
arrival order. Across different layouts results agree to ~1e-12 relative
(the usual reassociation noise), which the query-layer rounding absorbs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from cuttana_ray.util import safe_join

_PARTIAL_COLS = ["n", "mean_x", "m2_x", "mean_y", "m2_y", "c_xy"]


def _partial_schema(keys: list[str], key_types: list[pa.DataType]
                    ) -> pa.Schema:
    return pa.schema(
        [(k, t) for k, t in zip(keys, key_types)]
        + [("n", pa.int64())]
        + [(c, pa.float64()) for c in _PARTIAL_COLS[1:]])


def _block_partials(t: pa.Table, keys: list[str], x: str, y: str
                    ) -> pa.Table:
    """One (n, means, M2s, co-moment) row per key present in the block."""
    schema = _partial_schema(keys, [t.schema.field(k).type for k in keys])
    if len(t) == 0:
        return schema.empty_table()
    df = t.select(keys + [x, y]).to_pandas()
    g = df.groupby(keys, sort=False)
    mx = g[x].transform("mean")
    my = g[y].transform("mean")
    dx = df[x].astype(np.float64) - mx
    dy = df[y].astype(np.float64) - my
    df["_m2x"] = dx * dx
    df["_m2y"] = dy * dy
    df["_cxy"] = dx * dy
    agg = df.groupby(keys, sort=False, as_index=False).agg(
        n=(x, "size"), mean_x=(x, "mean"), m2_x=("_m2x", "sum"),
        mean_y=(y, "mean"), m2_y=("_m2y", "sum"), c_xy=("_cxy", "sum"))
    return pa.Table.from_pandas(agg, preserve_index=False).cast(schema)


def _merge_partials(df: pd.DataFrame) -> pd.DataFrame:
    """Chan's parallel merge over one key group's partial rows.

    Rows are first sorted by (n desc, mean_x) so the merge order is a pure
    function of the partials themselves, not of shuffle arrival order.
    """
    df = df.sort_values(
        ["n", "mean_x"], ascending=[False, True], kind="mergesort")
    rows = df[_PARTIAL_COLS].to_numpy()
    n, mx, m2x, my, m2y, cxy = rows[0]
    for nb, mxb, m2xb, myb, m2yb, cxyb in rows[1:]:
        tot = n + nb
        dx = mxb - mx
        dy = myb - my
        f = n * nb / tot
        m2x += m2xb + dx * dx * f
        m2y += m2yb + dy * dy * f
        cxy += cxyb + dx * dy * f
        mx += dx * nb / tot
        my += dy * nb / tot
        n = tot
    out = df.iloc[:1].drop(columns=_PARTIAL_COLS).copy()
    out["n"] = np.int64(n)
    if n > 1:
        sd_x = float(np.sqrt(m2x / (n - 1)))
        sd_y = float(np.sqrt(m2y / (n - 1)))
        covar = float(cxy / (n - 1))
        denom = float(np.sqrt(m2x * m2y))
        corr = float(cxy / denom) if denom > 0 else np.nan
    else:
        sd_x = sd_y = covar = corr = np.nan
    out["mean_x"], out["sd_x"] = float(mx), sd_x
    out["mean_y"], out["sd_y"] = float(my), sd_y
    out["covar"], out["corr"] = covar, corr
    return out


def grouped_moments(ds: "ray.data.Dataset", keys: list[str], x: str,
                    y: str) -> "ray.data.Dataset":
    """Per-``keys`` group: ``n, mean_x, sd_x, mean_y, sd_y, covar, corr``
    (sample stddev/covariance, ddof=1; Pearson correlation). Groups of one
    row get null moments, matching SQL semantics."""
    partial = ds.map_batches(
        lambda t: _block_partials(t, keys, x, y), batch_format="pyarrow")
    return partial.groupby(keys).map_groups(
        _merge_partials, batch_format="pandas")


def grouped_linreg(ds: "ray.data.Dataset", keys: list[str], x: str, y: str,
                   round_to: int = 6) -> "ray.data.Dataset":
    """Per-group ordinary least squares of ``y`` on ``x``: ``slope =
    cov(x,y)/var(x)``, ``intercept = mean_y − slope·mean_x``, ``r2 =
    corr²`` — SQL's ``REGR_SLOPE / REGR_INTERCEPT / REGR_R2``. A pure
    finisher over ``grouped_moments`` (same one-exchange partial-moment
    plan); rounded so Chan-merge reassociation noise (~1e-12 relative)
    can't flip the last digit vs a single-pass SQL oracle."""
    out = grouped_moments(ds, keys, x, y)

    def finish(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [(k, t.schema.field(k).type) for k in keys] +
            [("n", pa.int64()), ("slope", pa.float64()),
             ("intercept", pa.float64()), ("r2", pa.float64())])
        if len(t) == 0:
            return schema.empty_table()
        sd_x = t["sd_x"].to_numpy(zero_copy_only=False)
        mean_x = t["mean_x"].to_numpy(zero_copy_only=False)
        mean_y = t["mean_y"].to_numpy(zero_copy_only=False)
        covar = t["covar"].to_numpy(zero_copy_only=False)
        corr = t["corr"].to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = covar / (sd_x * sd_x)
            intercept = mean_y - slope * mean_x
            r2 = corr * corr
        cols = {k: t[k] for k in keys}
        cols["n"] = pc.cast(t["n"], pa.int64())
        cols["slope"] = pa.array(np.round(slope, round_to))
        cols["intercept"] = pa.array(np.round(intercept, round_to))
        cols["r2"] = pa.array(np.round(r2, round_to))
        return pa.table(cols).cast(schema)

    return out.map_batches(finish, batch_format="pyarrow")


def grouped_outliers(ds: "ray.data.Dataset", key: str, value: str,
                     keep: list[str], z: float = 3.0) -> "ray.data.Dataset":
    """Rows whose ``value`` exceeds their group's ``mean + z·stddev``
    (sample stddev; groups of one row never flag). Two passes, no
    materialization: the one-exchange ``grouped_moments`` plan computes
    per-key thresholds, a distributed hash join carries them back onto the
    rows, and the filter is a vectorized comparison. Output columns are
    copied input values (``keep``), so the result is hash-exact — the only
    float in play is the threshold itself, and a row flips only if it sits
    within merge-order noise (~1e-12 relative) of it."""
    def dup(t: pa.Table) -> pa.Table:
        sch = pa.schema([(key, t.schema.field(key).type if len(t)
                          else pa.int64()), (value, pa.float64()),
                         ("_y2", pa.float64())])
        if len(t) == 0:
            return sch.empty_table()
        v = pc.cast(t[value], pa.float64())
        return pa.table({key: t[key], value: v, "_y2": v}).cast(sch)

    stats = grouped_moments(
        ds.select_columns([key, value]).map_batches(
            dup, batch_format="pyarrow"),
        [key], value, "_y2")

    def thr(t: pa.Table) -> pa.Table:
        schema = pa.schema([(key, t.schema.field(key).type if len(t)
                             else pa.int64()), ("_thr", pa.float64())])
        if len(t) == 0:
            return schema.empty_table()
        m = t["mean_x"].to_numpy(zero_copy_only=False)
        s = t["sd_x"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        lim = np.where(n > 1, m + z * s, np.inf)
        return pa.table({key: t[key], "_thr": pa.array(lim)}).cast(schema)

    from cuttana_ray.util import drop_empty_blocks
    limits = drop_empty_blocks(
        stats.map_batches(thr, batch_format="pyarrow"))
    joined = safe_join(ds.select_columns(sorted(set(keep) | {key, value})), limits, join_type="inner", num_partitions=8, on=(key,))

    def pick(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.select(keep)
        mask = pc.greater(pc.cast(t[value], pa.float64()), t["_thr"])
        return t.filter(pc.fill_null(mask, False)).select(keep)

    return joined.map_batches(pick, batch_format="pyarrow")


def grouped_entropy(ds: "ray.data.Dataset", key: str, value: str,
                    round_to: int = 6) -> "ray.data.Dataset":
    """Shannon entropy (bits) of ``value``'s distribution within each
    ``key`` group: ``H = log2(T) − (Σ_v c_v·log2(c_v)) / T``.

    That identity makes the non-linear aggregate mergeable: stage 1 is an
    exact (key, value) count (per-batch ``group_by`` combiner before the
    one exchange), stage 2 folds each count into the two mergeable sums
    ``T`` and ``Σ c·log2 c`` per key — so no group's full distribution is
    ever held in one place. Output: ``(key, n_events, n_distinct,
    entropy)``.
    """
    from ray.data.aggregate import Count, Sum

    def precount(t: pa.Table) -> pa.Table:
        g = t.select([key, value]).group_by([key, value]) \
            .aggregate([([], "count_all")])
        return g.rename_columns([key, value, "c"])

    counts = ds.map_batches(precount, batch_format="pyarrow") \
        .groupby([key, value]).aggregate(Sum("c", alias_name="c"))

    def fold(t: pa.Table) -> pa.Table:
        schema = pa.schema([(key, t.schema.field(key).type if len(t) else
                             pa.int64()), ("c", pa.int64()),
                            ("clog", pa.float64()), ("one", pa.int64())])
        if len(t) == 0:
            return schema.empty_table()
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({key: t[key],
                         "c": pc.cast(t["c"], pa.int64()),
                         "clog": pa.array(c * np.log2(c)),
                         "one": pa.array(np.ones(len(t), np.int64))}) \
            .cast(schema)

    agg = counts.map_batches(fold, batch_format="pyarrow") \
        .groupby(key).aggregate(Sum("c", alias_name="n_events"),
                                Sum("clog", alias_name="s_clog"),
                                Sum("one", alias_name="n_distinct"))

    def finish(t: pa.Table) -> pa.Table:
        schema = pa.schema([(key, t.schema.field(key).type if len(t) else
                             pa.int64()), ("n_events", pa.int64()),
                            ("n_distinct", pa.int64()),
                            ("entropy", pa.float64())])
        if len(t) == 0:
            return schema.empty_table()
        T = t["n_events"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = t["s_clog"].to_numpy(zero_copy_only=False)
        h = np.round(np.log2(T) - s / T, round_to)
        return pa.table({key: t[key],
                         "n_events": pc.cast(t["n_events"], pa.int64()),
                         "n_distinct": pc.cast(t["n_distinct"], pa.int64()),
                         "entropy": pa.array(h)}).cast(schema)

    return agg.map_batches(finish, batch_format="pyarrow")


def grouped_ratio_means(ds: "ray.data.Dataset", keys: list[str], x: str,
                        round_to: int = 6) -> "ray.data.Dataset":
    """Per-group harmonic and geometric means of a positive column —
    ``n / Σ(1/x)`` and ``exp(Σ ln x / n)``. Both are mergeable once
    re-expressed through their reciprocal/log sums, so the plan is the
    usual combiner discipline: one partial row per (block, key) before a
    single groupby exchange. Rounded against summation-order noise."""
    partial_schema_tail = [("n", pa.int64()), ("s_inv", pa.float64()),
                           ("s_ln", pa.float64())]

    def partials(t: pa.Table) -> pa.Table:
        schema = pa.schema([(k, t.schema.field(k).type if len(t)
                             else pa.int64()) for k in keys] +
                           partial_schema_tail)
        if len(t) == 0:
            return schema.empty_table()
        df = t.select(keys + [x]).to_pandas()
        v = df[x].to_numpy().astype(np.float64)
        df["_inv"] = 1.0 / v
        df["_ln"] = np.log(v)
        agg = df.groupby(keys, sort=False, as_index=False).agg(
            n=(x, "size"), s_inv=("_inv", "sum"), s_ln=("_ln", "sum"))
        return pa.Table.from_pandas(agg, preserve_index=False).cast(schema)

    from ray.data.aggregate import Sum

    merged = ds.map_batches(partials, batch_format="pyarrow") \
        .groupby(keys).aggregate(Sum("n", alias_name="n"),
                                 Sum("s_inv", alias_name="s_inv"),
                                 Sum("s_ln", alias_name="s_ln"))

    def finish(t: pa.Table) -> pa.Table:
        schema = pa.schema([(k, t.schema.field(k).type) for k in keys] +
                           [("n", pa.int64()), ("harmonic", pa.float64()),
                            ("geometric", pa.float64())])
        if len(t) == 0:
            return schema.empty_table()
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        si = t["s_inv"].to_numpy(zero_copy_only=False)
        sl = t["s_ln"].to_numpy(zero_copy_only=False)
        cols = {k: t[k] for k in keys}
        cols["n"] = pc.cast(t["n"], pa.int64())
        cols["harmonic"] = pa.array(np.round(n / si, round_to))
        cols["geometric"] = pa.array(np.round(np.exp(sl / n), round_to))
        return pa.table(cols).cast(schema)

    return merged.map_batches(finish, batch_format="pyarrow")
