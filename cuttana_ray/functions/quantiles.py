"""Exact continuous quantiles (SQL ``quantile_cont`` / linear
interpolation) over a float column WITHOUT a global sort.

Distributed selection by histogram refinement: a first streaming pass
gets (count, min, max); each refinement round histograms every still-open
order-statistic interval into B buckets per batch (vectorized
``np.searchsorted``) and the driver merges the fixed-size bucket counts —
like the HLL registers in ``functions/sketches.py``, the merged state is
O(K·B) no matter the row count, and no round shuffles anything. When an
interval's candidate bucket is small enough, one final filtered pass
collects just those values and ``np.partition`` selects exactly.

At 100 TB: each round is one full streaming read (2-3 rounds cover any
float64 spread), versus a sort-based quantile moving every block through
an all-to-all exchange. The reference has no quantile operator at all
(scalar counters only, ``src/assignment.rs:68-99``); this widens the
§2.4 aggregation family next to ``int_quantiles``
(functions/textstats.py), which handles the discrete/`quantile_disc`
case.

NaNs are not handled (SQL NULL-skipping applies upstream via a filter);
infinities are fine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from cuttana_ray.util import safe_join

_BUCKETS = 4096
_COLLECT_CAP = 1 << 20  # max values pulled for the final exact selection


def _stats_pass(ds: "ray.data.Dataset", col: str):
    def partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False)
        if len(v) == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        return pa.table({"n": pa.array([len(v)], pa.int64()),
                         "mn": pa.array([float(v.min())]),
                         "mx": pa.array([float(v.max())])})
    n, mn, mx = 0, np.inf, -np.inf
    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(b) == 0:
            continue
        n += int(np.sum(b["n"].to_numpy(zero_copy_only=False)))
        mn = min(mn, float(np.min(b["mn"].to_numpy(zero_copy_only=False))))
        mx = max(mx, float(np.max(b["mx"].to_numpy(zero_copy_only=False))))
    return n, mn, mx


def _select_kth(ds: "ray.data.Dataset", col: str, ks: list[int],
                n: int, mn: float, mx: float,
                max_rounds: int = 4) -> dict[int, float]:
    """Exact k-th smallest (0-based) for every k in ``ks``."""
    # state per k: (lo, hi, rank_below_lo) — the k-th value lies in
    # [lo, hi] and exactly rank_below values are < lo
    state = {k: (mn, mx, 0, n) for k in ks}  # lo, hi, below, inside
    answers: dict[int, float] = {}

    for _ in range(max_rounds):
        open_ks = [k for k in ks if k not in answers
                   and state[k][3] > _COLLECT_CAP and state[k][0] < state[k][1]]
        if not open_ks:
            break
        edges = {k: np.linspace(state[k][0], state[k][1], _BUCKETS + 1)
                 for k in open_ks}

        def hist_pass(t: pa.Table, edges=edges, open_ks=open_ks
                      ) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            kk, bb, cc = [], [], []
            for k in open_ks:
                e = edges[k]
                sel = v[(v >= e[0]) & (v <= e[-1])]
                if len(sel) == 0:
                    continue
                # bucket i covers [e[i], e[i+1]); last bucket closed
                idx = np.clip(np.searchsorted(e, sel, side="right") - 1,
                              0, _BUCKETS - 1)
                counts = np.bincount(idx, minlength=_BUCKETS)
                nz = np.nonzero(counts)[0]
                kk.append(np.full(len(nz), k, np.int64))
                bb.append(nz.astype(np.int64))
                cc.append(counts[nz].astype(np.int64))
            if not kk:
                return pa.table({"k": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64()),
                                 "c": pa.array([], pa.int64())})
            return pa.table({"k": pa.array(np.concatenate(kk)),
                             "b": pa.array(np.concatenate(bb)),
                             "c": pa.array(np.concatenate(cc))})

        merged = {k: np.zeros(_BUCKETS, np.int64) for k in open_ks}
        for b in ds.map_batches(hist_pass, batch_format="pyarrow") \
                .iter_batches(batch_size=None, batch_format="pyarrow"):
            if len(b) == 0:
                continue
            karr = b["k"].to_numpy(zero_copy_only=False)
            barr = b["b"].to_numpy(zero_copy_only=False)
            carr = b["c"].to_numpy(zero_copy_only=False)
            for k in open_ks:
                m = karr == k
                np.add.at(merged[k], barr[m], carr[m])
        for k in open_ks:
            lo, hi, below, _ = state[k]
            cum = np.cumsum(merged[k])
            local_rank = k - below
            bidx = int(np.searchsorted(cum, local_rank + 1, side="left"))
            e = edges[k]
            new_below = below + (int(cum[bidx - 1]) if bidx > 0 else 0)
            inside = int(merged[k][bidx])
            new_lo, new_hi = float(e[bidx]), float(e[bidx + 1])
            if new_lo == new_hi or inside == 0:
                answers[k] = new_lo
            else:
                state[k] = (new_lo, new_hi, new_below, inside)

    # final exact selection for the remaining ks: collect each candidate
    # interval (≤ _COLLECT_CAP values unless duplicates defeated
    # refinement, in which case the interval is one tight value range)
    rest = [k for k in ks if k not in answers]
    if rest:
        ivals = {k: state[k] for k in rest}

        def collect(t: pa.Table, ivals=ivals) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            kk, vv = [], []
            for k, (lo, hi, _, _) in ivals.items():
                sel = v[(v >= lo) & (v <= hi)]
                kk.append(np.full(len(sel), k, np.int64))
                vv.append(sel)
            return pa.table({"k": pa.array(np.concatenate(kk)),
                             "v": pa.array(np.concatenate(vv))})

        buf: dict[int, list] = {k: [] for k in rest}
        for b in ds.map_batches(collect, batch_format="pyarrow") \
                .iter_batches(batch_size=None, batch_format="pyarrow"):
            if len(b) == 0:
                continue
            karr = b["k"].to_numpy(zero_copy_only=False)
            varr = b["v"].to_numpy(zero_copy_only=False)
            for k in rest:
                buf[k].append(varr[karr == k])
        for k in rest:
            vals = np.concatenate(buf[k]) if buf[k] else np.array([])
            local = k - state[k][2]
            answers[k] = float(np.partition(vals, local)[local])
    return answers


def float_quantiles(ds: "ray.data.Dataset", col: str,
                    qs: tuple = (0.25, 0.5, 0.75, 0.9)) -> pa.Table:
    """Exact ``quantile_cont`` values: for each q, interpolate linearly
    between order statistics floor(q·(n-1)) and ceil(q·(n-1)). Returns
    ``(q: float64, value: float64)``."""
    n, mn, mx = _stats_pass(ds, col)
    if n == 0:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    ks = set()
    ranks = {}
    for q in qs:
        r = q * (n - 1)
        k0, k1 = int(np.floor(r)), int(np.ceil(r))
        ranks[q] = (r, k0, k1)
        ks.update((k0, k1))
    kth = _select_kth(ds, col, sorted(ks), n, mn, mx)
    out = []
    for q in qs:
        r, k0, k1 = ranks[q]
        v0, v1 = kth[k0], kth[k1]
        out.append(v0 + (r - k0) * (v1 - v0))
    return pa.table({"q": pa.array([float(q) for q in qs], pa.float64()),
                     "value": pa.array(out, pa.float64())})


def grouped_float_quantiles(ds: "ray.data.Dataset", key: str, col: str,
                            qs: "list[float]" = (0.5, 0.9, 0.95)
                            ) -> "ray.data.Dataset":
    """Exact per-key continuous quantiles (SQL ``quantile_cont(col, q)
    GROUP BY key``): one ``groupby(key).map_groups`` exchange, in-group
    NumPy sort + the same linear interpolation DuckDB uses
    (``v[lo] + (v[hi]-v[lo])*(pos-lo)`` at ``pos = q*(n-1)``).

    Partitioning assumption (SURVEY.md §2.4): rows per key stay bounded —
    the right plan for dimension-like keys (priority, language, ...).
    An unbounded-key-cardinality-with-hot-keys input should use the
    global histogram-refinement path (``float_quantiles``) per key of
    interest instead; this is the grouped/cont sibling of
    ``grouped_int_quantiles`` (functions/textstats.py)."""
    qs = [float(q) for q in qs]
    kt = ds.schema().types[ds.schema().names.index(key)]
    out_schema = pa.schema([(key, kt), ("q", pa.float64()),
                            ("value", pa.float64())])

    def per_group(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        v = np.sort(t[col].to_numpy(zero_copy_only=False)
                    .astype(np.float64))
        vals = []
        for q in qs:
            pos = q * (len(v) - 1)
            lo = int(np.floor(pos))
            hi = int(np.ceil(pos))
            vals.append(v[lo] + (v[hi] - v[lo]) * (pos - lo))
        return pa.table({key: pa.array([t[key][0].as_py()] * len(qs), kt),
                         "q": pa.array(qs, pa.float64()),
                         "value": pa.array(vals, pa.float64())})

    return ds.select_columns([key, col]).groupby(key) \
        .map_groups(per_group, batch_format="pyarrow")


def grouped_mad(ds: "ray.data.Dataset", key: str, col: str,
                round_to: int = 6,
                broadcast_keys_max: int = 65536) -> "ray.data.Dataset":
    """Per-key median absolute deviation — the robust-statistics sibling
    of ``grouped_moments``' stddev: ``mad = median(|x − median(x)|)``.

    Two chained ``grouped_float_quantiles`` passes (exact quantile_cont
    interpolation, identical to DuckDB's MEDIAN) with each key's median
    carried back onto its rows in between. The carry is a BROADCAST
    lookup while the key set fits ``broadcast_keys_max`` (the per-key
    median table is O(#keys) by construction — for dimension-like keys
    a hash join there is pure aggregator fixed cost, the measured
    ~1-2.5 s/join); past the gate it is the distributed hash join.
    Output: ``(key, med, mad)``, rounded so join/merge order can't
    wiggle the last bit. Same bounded-rows-per-key partitioning
    assumption as ``grouped_float_quantiles`` — and the same NULL
    contract as the module (filter null keys/values upstream; the
    quantile kernel itself cannot sort None)."""
    import pyarrow.compute as pc
    import ray

    from cuttana_ray.util import drop_empty_blocks, local_table

    med = drop_empty_blocks(
        grouped_float_quantiles(ds.select_columns([key, col]), key, col,
                                [0.5]).drop_columns(["q"])
        .rename_columns({"value": "_med"}))
    # O(#keys) by construction — pin it so count() + the downstream
    # consumer (local_table or safe_join) don't re-run the full per-key
    # median exchange over the input twice.
    med = med.materialize()
    n_keys = med.count()
    if n_keys == 0:      # empty input: no key ever reaches either path
        sch = ds.schema()
        ktype = sch.types[sch.names.index(key)]
        return ray.data.from_arrow(pa.table({
            key: pa.array([], ktype),
            "med": pa.array([], pa.float64()),
            "mad": pa.array([], pa.float64())}))
    mt = local_table(med) \
        if broadcast_keys_max and n_keys <= broadcast_keys_max else None
    if mt is not None:
        med_keys = mt[key].combine_chunks()
        med_vals = mt["_med"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ref = ray.put((med_keys, med_vals))

        def dev_b(t: pa.Table) -> pa.Table:
            # key type from the schema even for empty batches (an empty
            # upstream block must not flip a string key to int64 and
            # poison the downstream groupby); med_keys.type is the
            # authoritative fallback when the column is missing.
            ktype = (t.schema.field(key).type
                     if key in t.column_names else med_keys.type)
            sch = pa.schema([(key, ktype), ("_dev", pa.float64())])
            if len(t) == 0 or key not in t.column_names:
                return sch.empty_table()
            ka, mv = ray.get(ref)
            # Arrow-native key lookup; a null/unknown key gets a null
            # index and is dropped — exactly the rows the join path's
            # inner hash join dropped
            idx = pc.index_in(t[key].combine_chunks(), value_set=ka)
            ok = pc.is_valid(idx)
            t = t.filter(ok)
            if len(t) == 0:
                return sch.empty_table()
            m = mv[idx.filter(ok).to_numpy(zero_copy_only=False)]
            x = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.table({key: t[key],
                             "_dev": pa.array(np.abs(x - m))}).cast(sch)

        devs = ds.select_columns([key, col]) \
            .map_batches(dev_b, batch_format="pyarrow")
        madt = local_table(drop_empty_blocks(
            grouped_float_quantiles(devs, key, "_dev", [0.5])
            .drop_columns(["q"]).rename_columns({"value": "_mad"})))
        if madt is None:
            return ray.data.from_arrow(pa.table({
                key: pa.array([], med_keys.type),
                "med": pa.array([], pa.float64()),
                "mad": pa.array([], pa.float64())}))
        idx = pc.index_in(madt[key].combine_chunks(), value_set=med_keys)
        meds = med_vals[idx.to_numpy(zero_copy_only=False)]
        return ray.data.from_arrow(pa.table({
            key: madt[key],
            "med": pc.round(pa.array(meds, pa.float64()), round_to),
            "mad": pc.round(madt["_mad"], round_to)}))

    joined = safe_join(ds.select_columns([key, col]), med, join_type="inner", num_partitions=8, on=(key,))

    def dev(t: pa.Table) -> pa.Table:
        sch = pa.schema([(key, t.schema.field(key).type
                          if key in t.column_names else pa.int64()),
                         ("_dev", pa.float64()),
                         ("_med", pa.float64())])
        if len(t) == 0:
            return sch.empty_table()
        x = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        m = t["_med"].to_numpy(zero_copy_only=False)
        return pa.table({key: t[key], "_dev": pa.array(np.abs(x - m)),
                         "_med": t["_med"]}).cast(sch)

    devs = joined.map_batches(dev, batch_format="pyarrow")
    from ray.data.aggregate import Min
    meds = devs.groupby(key).aggregate(Min("_med", alias_name="_med"))
    mad = drop_empty_blocks(
        grouped_float_quantiles(devs, key, "_dev", [0.5])
        .drop_columns(["q"]).rename_columns({"value": "_mad"}))
    out = safe_join(drop_empty_blocks(meds), mad, join_type="inner",
                                       num_partitions=8, on=(key,))

    def finish(t: pa.Table) -> pa.Table:
        sch = pa.schema([(key, t.schema.field(key).type
                          if key in t.column_names else pa.int64()),
                         ("med", pa.float64()),
                         ("mad", pa.float64())])
        if len(t) == 0:
            return sch.empty_table()
        return pa.table({
            key: t[key],
            "med": pc.round(t["_med"], round_to),
            "mad": pc.round(t["_mad"], round_to)}).cast(sch)

    return out.map_batches(finish, batch_format="pyarrow")


def grouped_weighted_median(ds: "ray.data.Dataset", key: str, value: str,
                            weight: str, tiebreak: "list[str]"
                            ) -> "ray.data.Dataset":
    """Per-key weighted (lower) median: the smallest ``value`` whose
    cumulative integer ``weight`` (ordered by value, then ``tiebreak`` —
    which must complete a total order) reaches half the key's total.

    Plan: the one-sort block-carry running sum (``stages/running.py
    running_agg``) computes cumulative weights; a tiny per-key total rides
    a groupby; a hash join + vectorized filter + grouped MIN select the
    crossing value. Everything that decides is exact int64 arithmetic and
    the output value is a copied input, so the result is hash-exact vs a
    SQL window oracle."""
    import pyarrow.compute as pc

    from cuttana_ray.stages.running import running_agg
    from ray.data.aggregate import Min, Sum

    # the carry chain keys runs on int64; non-integer keys ride a
    # collision-guarded 62-bit hash (util.ensure_int64_key raises on the
    # ~2^-62-per-pair collision instead of silently interleaving two
    # keys' cumulative weights); the raw key rides ``keep`` to the output
    from cuttana_ray.util import drop_empty_blocks, ensure_int64_key

    keyed, keycol = ensure_int64_key(ds, key)
    run = drop_empty_blocks(
        running_agg(keyed, keycol, [value, *tiebreak], weight,
                    keep=[key, value]))
    totals = drop_empty_blocks(
        ds.groupby(key).aggregate(Sum(weight, alias_name="_tot")))
    joined = safe_join(run, totals, join_type="inner", num_partitions=8,
                      on=(key,))

    def crossing(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        run_w = pc.multiply(pc.cast(t["running_sum"], pa.int64()), 2)
        return t.filter(pc.greater_equal(
            run_w, pc.cast(t["_tot"], pa.int64())))

    return joined.map_batches(crossing, batch_format="pyarrow") \
        .groupby(key).aggregate(Min(value, alias_name="wmedian"))
