"""Relational operators Ray Data lacks natively: grouped top-k, ROLLUP
aggregates, and anti-join — each a shuffle-minimal composition per the
SURVEY.md §2.4 custom-operator rule (a).

All three follow the same scale discipline as the graph-build stages
(stages/edges.py): a vectorized per-batch combiner bounds what enters the
single all-to-all exchange, and no stage materializes the dataset on the
driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from cuttana_ray.util import safe_join


def _topk_in_table(t: pa.Table, keys: list[str],
                   order_by: list[tuple[str, str]], k: int) -> pa.Table:
    """Vectorized top-k rows per key group inside one table: one lexsort,
    then a run-length rank filter — no Python per-group loops."""
    if len(t) == 0:
        return t
    sort_keys = [(c, "ascending") for c in keys] + list(order_by)
    idx = pc.sort_indices(t, sort_keys=sort_keys)
    t = t.take(idx)
    # rank within each key run
    arrs = [t[c].to_numpy(zero_copy_only=False) for c in keys]
    n = len(t)
    new_run = np.zeros(n, dtype=bool)
    new_run[0] = True
    for a in arrs:
        new_run[1:] |= a[1:] != a[:-1]
    pos = np.arange(n, dtype=np.int64)
    run_start = np.zeros(n, dtype=np.int64)
    starts = np.nonzero(new_run)[0]
    run_start[starts] = starts
    np.maximum.accumulate(run_start, out=run_start)
    rank = pos - run_start
    return t.filter(pa.array(rank < k))


def grouped_topk(ds: "ray.data.Dataset", keys: list[str],
                 order_by: list[tuple[str, str]], k: int
                 ) -> "ray.data.Dataset":
    """Top-``k`` rows per key group under the ``order_by`` spec (list of
    ``(column, "ascending"|"descending")``). Make the ordering total —
    e.g. end with a unique id column — for a deterministic result.

    Combiner discipline: each input block first reduces to ≤k rows per key
    it contains (vectorized lexsort + run-rank filter), so the single
    groupby exchange moves at most ``k × #blocks`` rows per key no matter
    how many rows a hot key has.
    """
    partial = ds.map_batches(
        lambda t: _topk_in_table(t, keys, order_by, k),
        batch_format="pyarrow")
    return partial.groupby(keys).map_groups(
        lambda t: _topk_in_table(t, keys, order_by, k),
        batch_format="pyarrow")


def grouping_sets_agg(ds: "ray.data.Dataset", keys: list[str],
                      value_col: str, sets: list[tuple[int, ...]],
                      sentinel: int = -(2 ** 62)) -> "ray.data.Dataset":
    """``GROUP BY GROUPING SETS`` with SUM(value)/COUNT(*): one aggregate
    per key subset in ``sets`` (each a tuple of indices into ``keys``),
    nulled-out dead key columns marking the set — DuckDB semantics.
    ``rollup_agg`` (prefix sets) and ``cube_agg`` (all subsets) are the
    two standard instantiations.

    Plan: each row expands vectorized into ``len(sets)`` copies whose dead
    keys are replaced by ``sentinel`` (group keys must stay non-null for
    the hash exchange), a per-batch partial aggregation collapses the
    expansion before the ONE groupby shuffle, and a final projection turns
    sentinels back into nulls. Shuffle volume is therefore bounded by the
    number of distinct (set, live-key) groups per block, not by
    ``len(sets) × rows``.

    Key columns must be integer-typed (cast dates/strings to codes first);
    ``sentinel`` must not collide with real values.
    """

    def expand_partial(t: pa.Table) -> pa.Table:
        fields = [(c, pa.int64()) for c in keys] + \
            [("lvl", pa.int64()), ("value_sum", pa.float64()),
             ("n", pa.int64())]
        schema = pa.schema(fields)
        if len(t) == 0:
            return schema.empty_table()
        import pandas as pd
        n = len(t)
        karrs = [pc.cast(t[c], pa.int64()).to_numpy(zero_copy_only=False)
                 for c in keys]
        vals = pc.cast(t[value_col], pa.float64()) \
            .to_numpy(zero_copy_only=False)
        frames = []
        for lvl, live in enumerate(sets):
            cols = {}
            for j, c in enumerate(keys):
                cols[c] = karrs[j] if j in live else \
                    np.full(n, sentinel, np.int64)
            cols["lvl"] = np.full(n, lvl, np.int64)
            cols["value_sum"] = vals
            frames.append(pd.DataFrame(cols))
        df = pd.concat(frames, ignore_index=True)
        agg = df.groupby(keys + ["lvl"], as_index=False, sort=False).agg(
            value_sum=("value_sum", "sum"), n=("value_sum", "size"))
        return pa.Table.from_pandas(agg, preserve_index=False).cast(schema)

    from ray.data.aggregate import Sum
    partial = ds.map_batches(expand_partial, batch_format="pyarrow")
    final = partial.groupby(keys + ["lvl"]).aggregate(
        Sum("value_sum", alias_name="value_sum"),
        Sum("n", alias_name="n"))

    def project(t: pa.Table) -> pa.Table:
        cols = {}
        for c in keys:
            a = t[c]
            cols[c] = pc.if_else(pc.equal(a, sentinel),
                                 pa.nulls(len(t), pa.int64()),
                                 pc.cast(a, pa.int64()))
        cols["value_sum"] = t["value_sum"]
        cols["n"] = t["n"]
        return pa.table(cols)

    return final.map_batches(project, batch_format="pyarrow")


def rollup_agg(ds: "ray.data.Dataset", keys: list[str], value_col: str,
               sentinel: int = -(2 ** 62)) -> "ray.data.Dataset":
    """``GROUP BY ROLLUP(keys...)``: every prefix level of ``keys``, grand
    total included (see ``grouping_sets_agg``)."""
    sets = [tuple(range(lvl)) for lvl in range(len(keys) + 1)]
    return grouping_sets_agg(ds, keys, value_col, sets, sentinel)


def cube_agg(ds: "ray.data.Dataset", keys: list[str], value_col: str,
             sentinel: int = -(2 ** 62)) -> "ray.data.Dataset":
    """``GROUP BY CUBE(keys...)``: all ``2^len(keys)`` key subsets (see
    ``grouping_sets_agg``)."""
    from itertools import combinations
    sets = [tuple(c) for r in range(len(keys) + 1)
            for c in combinations(range(len(keys)), r)]
    return grouping_sets_agg(ds, keys, value_col, sets, sentinel)


def _membership_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
                     left_key: str, right_key: str,
                     keep_present: bool) -> "ray.data.Dataset":
    """Shared cogroup core of ``anti_join`` / ``semi_join``: one
    tagged-union groupby shuffle, no driver-side key set — right reduces
    to distinct keys per block first, and each key group emits its left
    rows based on whether a right marker is present. The same
    cogroup-by-union shape as ``range_join`` (stages/joins.py), so it
    holds at any right-side cardinality (a broadcast IN/NOT-IN would
    not)."""
    lschema = left.schema()
    if lschema is None:  # fully-empty left (e.g. all rows filtered): the
        return left      # join is a no-op either way
    ltypes = {c: lschema.types[lschema.names.index(c)]
              for c in lschema.names}
    lcols = list(lschema.names)
    fields = [("k", ltypes[left_key]), ("side", pa.int8())] + \
        [(f"l_{c}", ltypes[c]) for c in lcols]
    tag_schema = pa.schema(fields)

    def tag_left(t: pa.Table) -> pa.Table:
        if len(t) == 0 or left_key not in t.column_names:
            return tag_schema.empty_table()
        cols = {"k": t[left_key],
                "side": pa.array(np.ones(len(t), np.int8))}
        for c in lcols:
            cols[f"l_{c}"] = t[c]
        return pa.table(cols).cast(tag_schema)

    def tag_right(t: pa.Table) -> pa.Table:
        if len(t) == 0 or right_key not in t.column_names:
            return tag_schema.empty_table()
        ks = pc.unique(pc.cast(t[right_key], ltypes[left_key]))
        m = len(ks)
        cols = {"k": ks, "side": pa.array(np.zeros(m, np.int8))}
        for c in lcols:
            cols[f"l_{c}"] = pa.nulls(m, ltypes[c])
        return pa.table(cols).cast(tag_schema)

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")
    out_schema = pa.schema([(c, ltypes[c]) for c in lcols])

    def emit(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "side" not in t.column_names:
            return out_schema.empty_table()
        side = t["side"].to_numpy(zero_copy_only=False)
        if bool((side == 0).any()) != keep_present:
            return out_schema.empty_table()
        keep = pa.array(side == 1)
        return pa.table({c: t[f"l_{c}"].filter(keep)
                         for c in lcols}).cast(out_schema)

    return lt.union(rt).groupby("k").map_groups(emit,
                                                batch_format="pyarrow")


def anti_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              left_key: str, right_key: str) -> "ray.data.Dataset":
    """Rows of ``left`` whose key never appears in ``right`` (NOT IN /
    ANTI JOIN); see ``_membership_join`` for the plan."""
    return _membership_join(left, right, left_key, right_key,
                            keep_present=False)


def semi_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              left_key: str, right_key: str) -> "ray.data.Dataset":
    """Rows of ``left`` whose key appears at least once in ``right``
    (IN / SEMI JOIN — left rows never duplicated by right multiplicity);
    see ``_membership_join`` for the plan."""
    return _membership_join(left, right, left_key, right_key,
                            keep_present=True)


def mode_agg(ds: "ray.data.Dataset", keys: list[str], col: str
             ) -> "ray.data.Dataset":
    """Most frequent ``col`` value per ``keys`` group (SQL ``mode()``),
    with a deterministic tie-break: highest count first, then smallest
    value. Output columns: keys + ``col`` + ``n`` (the winning count).

    Plan: one groupby counts (keys, col) pairs — per-batch partial
    aggregation applies as in every Ray groupby — then ``grouped_topk``
    k=1 picks the winner per key with its ≤1-row-per-key-per-block
    combiner, so neither exchange carries more than the distinct pair
    count."""
    from ray.data.aggregate import Count
    counts = ds.groupby(keys + [col]).aggregate(Count(alias_name="n"))
    return grouped_topk(counts, keys,
                        [("n", "descending"), (col, "ascending")], 1)


def distinct_count_agg(ds: "ray.data.Dataset", keys: list[str], col: str,
                       alias: str = "n_distinct") -> "ray.data.Dataset":
    """Exact grouped ``COUNT(DISTINCT col)`` (nulls ignored, SQL semantics).

    Plan: each block first collapses to its distinct (keys, col) rows
    (pyarrow hash group_by — vectorized), so the ONE groupby exchange moves
    at most the per-block distinct pair count regardless of row
    multiplicity; ``map_groups`` then counts unique values per key with a
    single ``pc.count_distinct`` kernel. No driver-side value set at any
    cardinality — a hot key's distinct values stream through its group
    block only.
    """
    cols = list(keys) + [col]

    def local_distinct(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.select(cols)
        return t.select(cols).group_by(cols).aggregate([])

    def per_group(t: pa.Table) -> pa.Table:
        head = t.select(list(keys)).slice(0, 1)
        n = pc.count_distinct(t[col], mode="only_valid").as_py()
        return head.append_column(alias, pa.array([n], pa.int64()))

    partial = ds.map_batches(local_distinct, batch_format="pyarrow")
    return partial.groupby(list(keys)).map_groups(
        per_group, batch_format="pyarrow")


def string_agg_ordered(ds: "ray.data.Dataset", keys: list[str], col: str,
                       order_by: list[str], sep: str = ",",
                       alias: str = "agg") -> "ray.data.Dataset":
    """SQL ``STRING_AGG(col, sep ORDER BY order_by)`` per key group.
    Make ``order_by`` a total order (end with a unique id) so the
    concatenation is deterministic across block layouts.

    Plan: project to keys+order+col at the read, ONE groupby exchange,
    then per group a vectorized ``sort_indices`` take and a single
    C-level ``str.join`` over the value buffer — no Python per-row work
    beyond the final join of that group's strings, which is the output
    payload itself."""
    cols = list(keys) + list(order_by) + [col]

    def per_group(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[(c, "ascending")
                                            for c in order_by])
        vals = t[col].take(idx).to_pylist()
        head = t.select(list(keys)).slice(0, 1)
        joined = sep.join("" if v is None else v for v in vals)
        return head.append_column(alias, pa.array([joined], pa.string()))

    proj = ds.map_batches(lambda t: t.select(cols), batch_format="pyarrow")
    return proj.groupby(list(keys)).map_groups(
        per_group, batch_format="pyarrow")


def unpivot(ds: "ray.data.Dataset", id_cols: list[str],
            value_cols: list[str], name_col: str = "measure",
            value_col: str = "value") -> "ray.data.Dataset":
    """``UNPIVOT`` / melt: turn ``value_cols`` (same Arrow type) into
    (``name_col``, ``value_col``) rows, replicating ``id_cols``.

    Embarrassingly parallel — a pure per-batch concat of column slices
    (zero-copy takes, no shuffle, no Python rows); output is
    ``len(value_cols) ×`` the input row count, streamed block by block."""
    def melt(t: pa.Table) -> pa.Table:
        parts = []
        for vc in value_cols:
            part = t.select(list(id_cols))
            part = part.append_column(
                name_col, pa.array([vc] * len(t), pa.string()))
            part = part.append_column(value_col, t[vc])
            parts.append(part)
        if not parts:
            return t.select(list(id_cols))
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow")


def _set_op(left: "ray.data.Dataset", right: "ray.data.Dataset",
            op: str) -> "ray.data.Dataset":
    """SQL set operations with DISTINCT semantics over whole rows
    (``INTERSECT`` / ``EXCEPT`` / ``UNION``). Both inputs must share a
    schema; the row itself is the group key.

    Plan: each block first collapses to its distinct rows tagged with
    per-side presence flags (pyarrow group_by — vectorized, no Python
    rows), so the ONE groupby exchange moves at most the per-block
    distinct count; a Sum aggregate then turns the flags into global
    presence and a vectorized filter applies the operator. No driver-side
    row set at any cardinality.
    """
    schema = left.schema()
    cols = list(schema.names)
    tag_schema = pa.schema(
        [(c, t) for c, t in zip(schema.names, schema.types)]
        + [("_l", pa.int64()), ("_r", pa.int64())])

    def tag(is_left: bool):
        def fn(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return tag_schema.empty_table()
            d = t.select(cols).group_by(cols).aggregate([])
            n = len(d)
            one = np.ones(n, np.int64)
            zero = np.zeros(n, np.int64)
            return d.append_column("_l", pa.array(one if is_left else zero)) \
                    .append_column("_r", pa.array(zero if is_left else one)) \
                    .cast(tag_schema)
        return fn

    from ray.data.aggregate import Sum
    tagged = left.map_batches(tag(True), batch_format="pyarrow").union(
        right.map_batches(tag(False), batch_format="pyarrow"))
    counts = tagged.groupby(cols).aggregate(
        Sum("_l", alias_name="_l"), Sum("_r", alias_name="_r"))

    def emit(t: pa.Table) -> pa.Table:
        lf = pc.greater(t["_l"], 0)
        rf = pc.greater(t["_r"], 0)
        if op == "intersect":
            keep = pc.and_(lf, rf)
        elif op == "except":
            keep = pc.and_(lf, pc.invert(rf))
        else:  # union
            keep = pc.or_(lf, rf)
        return t.filter(keep).select(cols)

    return counts.map_batches(emit, batch_format="pyarrow")


def intersect_distinct(left: "ray.data.Dataset", right: "ray.data.Dataset"
                       ) -> "ray.data.Dataset":
    """SQL ``INTERSECT``: distinct rows present in both inputs."""
    return _set_op(left, right, "intersect")


def except_distinct(left: "ray.data.Dataset", right: "ray.data.Dataset"
                    ) -> "ray.data.Dataset":
    """SQL ``EXCEPT``: distinct left rows absent from the right input."""
    return _set_op(left, right, "except")


def union_distinct(left: "ray.data.Dataset", right: "ray.data.Dataset"
                   ) -> "ray.data.Dataset":
    """SQL ``UNION`` (distinct): distinct rows present in either input."""
    return _set_op(left, right, "union")


def pivot_agg(ds: "ray.data.Dataset", key: str, col: str, val: str,
              values: list[str] | None = None,
              max_values: int = 1000) -> "ray.data.Dataset":
    """Pivot ``col``'s values into SUM(``val``) columns per ``key`` row
    (``SUM(CASE WHEN col = v THEN val ELSE 0 END)`` per value ``v``).

    When ``values`` is not given, the pivot columns are discovered with a
    small distinct aggregate first (the only extra pass; its result is a
    driver-side list of column NAMES, never row data). The pivot itself is
    a per-batch conditional projection — already partially aggregated per
    (block, key) — followed by ONE groupby(key) exchange, so shuffle volume
    is #distinct-keys × #values regardless of input rows.
    """
    from ray.data.aggregate import Sum

    if values is None:
        from ray.data.aggregate import Count
        distinct = ds.groupby(col).aggregate(Count(alias_name="_n"))
        # guard: a pivot fabricates one Arrow column per distinct value
        # AND collects the value list on the driver — a high-cardinality
        # pivot column must fail loudly, not OOM (take(limit+1) bounds the
        # driver materialization regardless of the true cardinality)
        rows = distinct.take(max_values + 1)
        if len(rows) > max_values:
            raise ValueError(
                f"pivot_agg: column {col!r} has more than {max_values} "
                "distinct values; pass an explicit `values` list or raise "
                "`max_values` if you really want that many pivot columns")
        values = sorted(r[col] for r in rows)

    colnames = [f"{val}_{v}" for v in values]

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        fields = [(key, pa.int64())] + \
            [(c, pa.float64()) for c in colnames]
        schema = pa.schema(fields)
        if len(t) == 0:
            return schema.empty_table()
        cats = t[col].to_pandas().to_numpy()
        v = pc.cast(t[val], pa.float64()).to_numpy(zero_copy_only=False)
        cols = {key: pc.cast(t[key], pa.int64())
                .to_numpy(zero_copy_only=False)}
        for value, name in zip(values, colnames):
            cols[name] = np.where(cats == value, v, 0.0)
        df = pd.DataFrame(cols).groupby(key, as_index=False,
                                        sort=False).sum()
        return pa.Table.from_pandas(df, preserve_index=False).cast(schema)

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(key).aggregate(*[Sum(c, alias_name=c) for c in colnames])
    return agg


def table_diff(left: "ray.data.Dataset", right: "ray.data.Dataset",
               key: str, value: str) -> "ray.data.Dataset":
    """Snapshot diff between two tables with unique ``key`` per side:
    emits ``(key, change)`` for every key that was ``'added'`` (right
    only), ``'removed'`` (left only), or ``'changed'`` (present in both
    with different ``value``); unchanged keys are dropped.

    The dataset-versioning primitive for incremental pipeline runs. No
    join and no per-group Python: both sides melt into one tagged union
    whose per-key presence counts and side values fold through ONE
    groupby as indicator sums (unique keys make ``Sum(v·tag)`` recover
    the side's value exactly), then a vectorized CASE projection.
    """
    from ray.data.aggregate import Sum

    def tag_side(is_right: int):
        def fn(t: pa.Table) -> pa.Table:
            schema = pa.schema([
                ("k", t.schema.field(key).type if len(t) else pa.int64()),
                ("l_n", pa.int64()), ("r_n", pa.int64()),
                ("l_v", pa.float64()), ("r_v", pa.float64())])
            if len(t) == 0:
                return schema.empty_table()
            n = len(t)
            v = pc.cast(t[value], pa.float64())
            zero_i = pa.array(np.zeros(n, np.int64))
            one_i = pa.array(np.ones(n, np.int64))
            zero_f = pa.array(np.zeros(n, np.float64))
            return pa.table({
                "k": t[key],
                "l_n": zero_i if is_right else one_i,
                "r_n": one_i if is_right else zero_i,
                "l_v": zero_f if is_right else v,
                "r_v": v if is_right else zero_f}).cast(schema)
        return fn

    both = left.map_batches(tag_side(0), batch_format="pyarrow").union(
        right.map_batches(tag_side(1), batch_format="pyarrow"))
    agg = both.groupby("k").aggregate(
        Sum("l_n", alias_name="l_n"), Sum("r_n", alias_name="r_n"),
        Sum("l_v", alias_name="l_v"), Sum("r_v", alias_name="r_v"))

    def project(t: pa.Table) -> pa.Table:
        schema = pa.schema([
            ("k", t.schema.field("k").type if len(t) else pa.int64()),
            ("change", pa.string())])
        if len(t) == 0:
            return schema.empty_table()
        l_n = t["l_n"].to_numpy(zero_copy_only=False)
        r_n = t["r_n"].to_numpy(zero_copy_only=False)
        l_v = t["l_v"].to_numpy(zero_copy_only=False)
        r_v = t["r_v"].to_numpy(zero_copy_only=False)
        change = np.where(l_n == 0, "added",
                          np.where(r_n == 0, "removed",
                                   np.where(l_v != r_v, "changed", "")))
        keep = change != ""
        return pa.table({"k": t["k"].filter(pa.array(keep)),
                         "change": pa.array(change[keep], pa.string())}) \
            .cast(schema)

    return agg.map_batches(project, batch_format="pyarrow")


def grouped_dense_rank(ds: "ray.data.Dataset", key: str, col: str
                       ) -> "ray.data.Dataset":
    """``DENSE_RANK() OVER (PARTITION BY key ORDER BY col)`` — re-expressed
    as: distinct (key, col) pairs (one pre-combined exchange) ranked by the
    block-carry running count (``stages/running.py running_agg`` over a
    ones column, the same one-sort plan as ROW_NUMBER — on the DISTINCT
    pairs row number IS the dense rank), then a distributed hash join maps
    the rank back onto every input row. Output: input columns + ``drank``.
    Ranks are exact int64, so the result is hash-exact."""
    from ray.data.aggregate import Count

    from cuttana_ray.stages.running import running_agg
    from cuttana_ray.util import drop_empty_blocks

    def local_distinct(t: pa.Table) -> pa.Table:
        # derive key/col types from the live schema (running.py ktypes
        # pattern) — hardcoding int64 broke string keys. An EMPTY batch
        # that still carries the schema keeps its true types (a zero-row
        # int64 / string placeholder next to string-keyed blocks would
        # poison ds.schema() for ensure_int64_key's type dispatch); only a
        # genuinely schema-less block gets placeholders.
        has_schema = key in t.column_names and col in t.column_names
        sch = pa.schema([
            (key, t.schema.field(key).type if has_schema else pa.int64()),
            (col, t.schema.field(col).type if has_schema else pa.string())])
        if len(t) == 0 or not has_schema:
            return sch.empty_table()
        return t.select([key, col]).group_by([key, col]).aggregate([]) \
            .cast(sch)

    distinct = ds.map_batches(local_distinct, batch_format="pyarrow") \
        .groupby([key, col]).aggregate(Count(alias_name="_c")) \
        .drop_columns(["_c"])

    def ones(t: pa.Table) -> pa.Table:
        return t.append_column("_one",
                               pa.array(np.ones(len(t), np.int64)))

    # the carry chain keys runs on int64: non-integer keys ride a
    # collision-guarded 62-bit hash (the raw key stays in `keep` and is
    # what the final join uses, so the hash never reaches the output)
    from cuttana_ray.util import ensure_int64_key
    keyed, keycol = ensure_int64_key(distinct, key)
    ranks = drop_empty_blocks(
        running_agg(keyed.map_batches(ones, batch_format="pyarrow"),
                    keycol, [col], "_one", keep=[key, col])
        .drop_columns(["running_sum"])
        .rename_columns({"rn": "drank"}))
    return safe_join(ds, ranks, join_type="inner", num_partitions=8,
                   on=(key, col))
