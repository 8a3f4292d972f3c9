"""Edge-table builders: the transcript → link-graph front end.

All stages are ``map_batches`` over zero-copy Arrow with per-batch partial
aggregation before any shuffle, so hot keys (popular tools, the 4 role
vertices) carry *weight*, not row multiplicity — the skew-handling strategy
from SURVEY.md §4.

Operators:

* ``bipartite_edges`` — (src_col → dst_col) weighted edges, e.g. conv→tool
  from turns with non-null ``tool`` (no reference analog; SURVEY.md §2.2 M5).
* ``consecutive_pairs`` — distributed ``lead()`` over a sorted stream:
  (value_i → value_{i+1}) links within each key ordered by ``order`` columns,
  e.g. role→role turn adjacency. Exact across block boundaries via
  boundary-marker rows (2 per block) merged in a tiny driver-side pass —
  the pairs themselves never leave the cluster.
* ``dedup_weighted`` — collapse parallel edges: ``groupby(src,dst).sum(w)``
  after per-batch combining.
* ``symmetrize`` — emit both directions + drop self-loops (the reference's
  stream is an undirected graph in doubled adjacency form,
  ``/root/reference/src/stream.rs:11``, fixture semantics
  ``/root/reference/tests/partition_tests.rs:8-16``).
* ``build_adjacency`` — edges → one row per vertex with sorted unique
  neighbor + weight lists, vectorized via sort + run-end offsets (no
  per-group Python); block-straddling vertices are merged in a small
  fix-up pass bounded by the straddling rows only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

EDGE_SCHEMA = pa.schema([
    ("src", pa.string()), ("dst", pa.string()), ("weight", pa.int64()),
])


def _partial_pair_counts(batch: pa.Table, src: str, dst: str) -> pa.Table:
    """Per-batch combiner: (src, dst) occurrence counts."""
    t = batch.select([src, dst]).rename_columns(["src", "dst"])
    return t.group_by(["src", "dst"]).aggregate([([], "count_all")]) \
        .rename_columns(["src", "dst", "weight"])


def bipartite_edges(ds: "ray.data.Dataset", src_col: str, dst_col: str,
                    src_prefix: str = "", dst_prefix: str = "",
                    drop_null_dst: bool = True,
                    dedup: bool = True) -> "ray.data.Dataset":
    """Weighted src→dst edges from two columns (e.g. conv_id→tool).

    Per-batch ``group_by`` combiner, then a global ``groupby().sum`` over the
    much smaller partials — the pre-aggregation pattern for skewed keys.

    ``dedup=False`` returns the per-batch partials uncombined (parallel
    rows whose weights sum to the same totals) for callers that run their
    own downstream ``dedup_weighted`` anyway — skipping one sort exchange.
    """
    def extract(batch: pa.Table) -> pa.Table:
        if drop_null_dst:
            batch = batch.filter(pc.is_valid(batch[dst_col]))
        t = _partial_pair_counts(batch, src_col, dst_col)
        # prefixes force string node names; without prefixes the native
        # column types pass through (int-keyed graphs stay int64)
        src = t["src"]
        dst = t["dst"]
        if src_prefix:
            src = pc.binary_join_element_wise(
                pa.array([src_prefix] * len(t)), pc.cast(src, pa.string()), "")
        if dst_prefix:
            dst = pc.binary_join_element_wise(
                pa.array([dst_prefix] * len(t)), pc.cast(dst, pa.string()), "")
        return pa.table({"src": src, "dst": dst, "weight": t["weight"]})

    partial = ds.map_batches(extract, batch_format="pyarrow")
    return dedup_weighted(partial) if dedup else partial


def dedup_weighted(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Collapse parallel edges to one weighted edge (SURVEY.md §2.4 set-ops
    row).

    Sort-based: Ray's range-partitioned sort is ~30× faster than its hash
    groupby when most (src, dst) keys are distinct (measured: 0.2 s vs
    7 s on 527k rows), so the exchange is a sort on (src, dst) followed by
    a vectorized run combine per whole block; the ≤2 boundary runs per
    block are merged in a driver-side fix-up bounded by the block count,
    exactly like ``build_adjacency``."""
    sorted_edges = edges.sort(["src", "dst"])

    def combine(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if "src" not in batch.column_names:
            return pa.table({})  # schemaless empty sort partition
        if n == 0:
            # dtype-preserving empty (src/dst may be string OR int64)
            return batch.select(["src", "dst", "weight"]).append_column(
                "partial", pa.array([], pa.bool_()))
        src = batch["src"].combine_chunks()
        dst = batch["dst"].combine_chunks()
        w = batch["weight"].combine_chunks().to_numpy(zero_copy_only=False)
        if n > 1:
            same = pc.and_(pc.equal(src.slice(1, n), src.slice(0, n - 1)),
                           pc.equal(dst.slice(1, n), dst.slice(0, n - 1))) \
                .to_numpy(zero_copy_only=False)
            starts = np.concatenate([[0], np.nonzero(~same)[0] + 1]) \
                .astype(np.int64)
        else:
            starts = np.zeros(1, dtype=np.int64)
        sums = np.add.reduceat(w, starts)
        m = len(starts)
        partial = np.zeros(m, dtype=bool)
        partial[0] = True
        partial[-1] = True
        idx = pa.array(starts)
        return pa.table({
            "src": src.take(idx),
            "dst": dst.take(idx),
            "weight": pa.array(sums.astype(np.int64)),
            "partial": pa.array(partial),
        })

    combined = sorted_edges.map_batches(
        combine, batch_format="pyarrow", batch_size=None).materialize()

    def keep_complete(b: pa.Table) -> pa.Table:
        if "partial" not in b.column_names:
            return b  # schemaless empty passthrough
        return b.filter(pc.equal(b["partial"], False)) \
            .select(["src", "dst", "weight"])

    complete = combined.map_batches(keep_complete, batch_format="pyarrow",
                                    zero_copy_batch=True)
    # boundary runs (≤2 per block) merged driver-side — extracted by a
    # remote task per block so only those rows move, never whole blocks
    import ray as _ray

    @_ray.remote
    def _partials(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "partial" not in t.column_names:
            return pa.table({})
        return t.filter(pc.equal(t["partial"], True))

    ptabs = _ray.get([_partials.remote(r)
                      for r in combined.to_arrow_refs()])
    ptabs = [t for t in ptabs if len(t)]
    if not ptabs:
        return complete
    pt = pa.concat_tables([t.select(["src", "dst", "weight"])
                           for t in ptabs])
    fix = pt.group_by(["src", "dst"]).aggregate([("weight", "sum")]) \
        .rename_columns(["src", "dst", "weight"])
    return complete.union(ray.data.from_arrow(fix))


def canonicalize_undirected(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Map each directed row to its unordered form ``(min(src,dst),
    max(src,dst), weight)`` — a pure per-batch kernel, no shuffle.

    Run BEFORE a ``dedup_weighted`` so that single exchange merges the two
    directions of every pair; ``symmetrize(..., assume_canonical=True)``
    then doubles the table with a flat map instead of a second full
    sort-dedup over 2N rows (which profiling showed was the single largest
    avoidable stage of the graph build)."""
    def canon(batch: pa.Table) -> pa.Table:
        if "src" not in batch.column_names or len(batch) == 0:
            return batch
        s, d = batch["src"], batch["dst"]
        swap = pc.greater(s, d)
        return pa.table({
            "src": pc.if_else(swap, d, s),
            "dst": pc.if_else(swap, s, d),
            "weight": batch["weight"],
        })

    return edges.map_batches(canon, batch_format="pyarrow")


def symmetrize(edges: "ray.data.Dataset", drop_self_loops: bool = True,
               assume_canonical: bool = False) -> "ray.data.Dataset":
    """Undirected doubling: each {u,v} appears as u→v and v→u, merged
    weights. Output edge_count (= row count) is 2·|E_undirected|, matching
    the reference's metric basis (``/root/reference/src/state.rs:159``).

    ``assume_canonical=True``: the input is already one row per unordered
    pair (see ``canonicalize_undirected``), so doubling is a pure flat map
    — no merge shuffle. With False the flipped table is re-deduped to merge
    (a,b)/(b,a) weight splits (one extra sort over 2N rows)."""
    def flip(batch: pa.Table) -> pa.Table:
        fwd = batch
        rev = pa.table({"src": batch["dst"], "dst": batch["src"],
                        "weight": batch["weight"]})
        both = pa.concat_tables([fwd, rev])
        if drop_self_loops:
            both = both.filter(pc.invert(pc.equal(both["src"], both["dst"])))
        return both

    doubled = edges.map_batches(flip, batch_format="pyarrow")
    if assume_canonical:
        return doubled
    return dedup_weighted(doubled)


# ---------------------------------------------------------------------------
# consecutive_pairs: distributed lead() with exact block-boundary fix-up
# ---------------------------------------------------------------------------

def consecutive_pairs(ds: "ray.data.Dataset", key: str, order: list[str],
                      value: str, src_prefix: str = "",
                      dst_prefix: str = "",
                      dedup: bool = True) -> "ray.data.Dataset":
    """Weighted (value_i → value_{i+1}) edges between consecutive rows of the
    same ``key``, ordered by ``order`` (SQL: ``lead(value) OVER (PARTITION BY
    key ORDER BY order)``).

    Strategy: global sort on (key, *order); each whole block (batch_size=None)
    emits its internal pairs plus two boundary-marker rows (its first and
    last row). Marker rows are globally ordered, so a block straddle is
    exactly a marker sequence "last(block i) → first(block i+1)" with equal
    keys; those pairs are reconstructed from the tiny marker table (2 rows
    per block) and unioned in. Exact for any block layout.
    """
    cols = [key, *order, value]
    sorted_ds = ds.select_columns(cols).sort([key, *order])

    def block_pairs(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table({"kind": pa.array([], pa.string()),
                             "key": pa.array([], pa.string()),
                             "src": pa.array([], pa.string()),
                             "dst": pa.array([], pa.string()),
                             "weight": pa.array([], pa.int64())})
        k = pc.cast(batch[key], pa.string())
        v = pc.cast(batch[value], pa.string())
        same = pc.equal(k.slice(0, n - 1), k.slice(1, n)) if n > 1 else None
        rows = {"kind": [], "key": [], "src": [], "dst": [], "weight": []}
        if n > 1:
            src = v.slice(0, n - 1).filter(same)
            dst = v.slice(1, n).filter(same)
            pairs = pa.table({"src": src, "dst": dst}) \
                .group_by(["src", "dst"]).aggregate([([], "count_all")])
            rows["kind"].extend(["pair"] * len(pairs))
            rows["key"].extend([""] * len(pairs))
            rows["src"].extend(pairs["src"].to_pylist())
            rows["dst"].extend(pairs["dst"].to_pylist())
            rows["weight"].extend(pairs["count_all"].to_pylist())
        # boundary markers: first and last row of the block
        for kind, idx in (("first", 0), ("last", n - 1)):
            rows["kind"].append(kind)
            rows["key"].append(k[idx].as_py())
            rows["src"].append(v[idx].as_py())
            rows["dst"].append("")
            rows["weight"].append(0)
        t = pa.table({name: pa.array(vals, pa.string() if name in
                      ("kind", "key", "src", "dst") else pa.int64())
                      for name, vals in rows.items()})
        # carry the order columns of the boundary rows for global re-sorting
        order_cols = {}
        for oc in order:
            arr = batch[oc]
            n_pairs = len(t) - 2
            order_cols[f"__o_{oc}"] = pa.concat_arrays([
                pa.nulls(n_pairs, arr.type),
                arr.slice(0, 1).combine_chunks(),
                arr.slice(n - 1, 1).combine_chunks(),
            ])
        for name, arr in order_cols.items():
            t = t.append_column(name, arr)
        return t

    # `mixed` is consumed twice (pairs branch + marker branch); it is already
    # per-block aggregated (distinct pairs per block + 2 markers), so pinning
    # it is cheap relative to re-running the sort.
    mixed = sorted_ds.map_batches(block_pairs, batch_format="pyarrow",
                                  batch_size=None).materialize()
    pair_part = mixed.filter(expr="kind == 'pair'") \
        .select_columns(["src", "dst", "weight"])

    # boundary fix-up: tiny table (2 rows per block) → driver
    markers = mixed.filter(expr="kind != 'pair'").to_pandas()
    extra_rows: dict[tuple[str, str], int] = {}
    if len(markers):
        ocols = [f"__o_{c}" for c in order]
        markers = markers.sort_values(
            ["key", *ocols, "kind"],
            key=lambda s: s.map({"first": 0, "last": 1}) if s.name == "kind" else s)
        kinds = markers["kind"].to_numpy()
        keys = markers["key"].to_numpy()
        vals = markers["src"].to_numpy()
        for i in range(len(markers) - 1):
            if kinds[i] == "last" and kinds[i + 1] == "first" \
                    and keys[i] == keys[i + 1]:
                p = (vals[i], vals[i + 1])
                extra_rows[p] = extra_rows.get(p, 0) + 1

    parts = [pair_part]
    if extra_rows:
        parts.append(ray.data.from_arrow(pa.table({
            "src": pa.array([p[0] for p in extra_rows], pa.string()),
            "dst": pa.array([p[1] for p in extra_rows], pa.string()),
            "weight": pa.array(list(extra_rows.values()), pa.int64()),
        })))
    unioned = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])

    if src_prefix or dst_prefix:
        def add_prefix(batch: pa.Table) -> pa.Table:
            return pa.table({
                "src": pc.binary_join_element_wise(
                    pa.array([src_prefix] * len(batch)), batch["src"], ""),
                "dst": pc.binary_join_element_wise(
                    pa.array([dst_prefix] * len(batch)), batch["dst"], ""),
                "weight": batch["weight"],
            })
        unioned = unioned.map_batches(add_prefix, batch_format="pyarrow")
    # dedup=False: per-block partials + boundary extras (weights sum to the
    # same totals) for callers running their own downstream dedup_weighted
    return dedup_weighted(unioned) if dedup else unioned


# ---------------------------------------------------------------------------
# combined single-pass transcript extraction
# ---------------------------------------------------------------------------

def transcript_edges(transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Both flagship edge types in ONE pass over the sorted transcripts:

    * conv→tool (``conv:<id> → tool:<name>`` for non-null ``tool``)
    * role→role turn adjacency (consecutive ``turn_idx`` per conversation,
      same boundary-marker fix-up as ``consecutive_pairs``)

    One global sort on (conv_id, turn_idx), one block-level partial
    aggregation, one weighted-dedup groupby for everything — minimizing
    stage/shuffle count versus composing the two extractors separately.
    """
    cols = ["conv_id", "turn_idx", "role", "tool"]
    sorted_ds = transcripts.select_columns(cols).sort(["conv_id", "turn_idx"])

    def block_fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        schema = pa.schema([("kind", pa.string()), ("key", pa.string()),
                            ("src", pa.string()), ("dst", pa.string()),
                            ("weight", pa.int64()),
                            ("__o_turn", pa.int32())])
        if n == 0:
            return schema.empty_table()
        conv = batch["conv_id"].combine_chunks()
        role = batch["role"].combine_chunks()
        parts = []
        # conv→tool partial counts
        with_tool = batch.filter(pc.is_valid(batch["tool"]))
        if len(with_tool):
            ct = pa.table({
                "src": pc.binary_join_element_wise(
                    pa.array(["conv:"] * len(with_tool)),
                    with_tool["conv_id"].combine_chunks(), ""),
                "dst": pc.binary_join_element_wise(
                    pa.array(["tool:"] * len(with_tool)),
                    with_tool["tool"].combine_chunks(), ""),
            }).group_by(["src", "dst"]).aggregate([([], "count_all")])
            parts.append(pa.table({
                "kind": pa.array(["pair"] * len(ct)),
                "key": pa.array([""] * len(ct)),
                "src": ct["src"], "dst": ct["dst"],
                "weight": ct["count_all"],
                "__o_turn": pa.nulls(len(ct), pa.int32()),
            }))
        # role→role pairs within the block
        if n > 1:
            same = pc.equal(conv.slice(0, n - 1), conv.slice(1, n))
            rr = pa.table({
                "src": pc.binary_join_element_wise(
                    pa.array(["role:"] * (n - 1)), role.slice(0, n - 1), ""
                ).filter(same),
                "dst": pc.binary_join_element_wise(
                    pa.array(["role:"] * (n - 1)), role.slice(1, n), ""
                ).filter(same),
            }).group_by(["src", "dst"]).aggregate([([], "count_all")])
            parts.append(pa.table({
                "kind": pa.array(["pair"] * len(rr)),
                "key": pa.array([""] * len(rr)),
                "src": rr["src"], "dst": rr["dst"],
                "weight": rr["count_all"],
                "__o_turn": pa.nulls(len(rr), pa.int32()),
            }))
        # boundary markers (first/last row of the block)
        for kind, idx in (("first", 0), ("last", n - 1)):
            parts.append(pa.table({
                "kind": pa.array([kind]),
                "key": pa.array([conv[idx].as_py()]),
                "src": pa.array(["role:" + role[idx].as_py()]),
                "dst": pa.array([""]),
                "weight": pa.array([0], pa.int64()),
                "__o_turn": batch["turn_idx"].slice(idx, 1).combine_chunks(),
            }))
        return pa.concat_tables([p.cast(schema) for p in parts])

    mixed = sorted_ds.map_batches(block_fn, batch_format="pyarrow",
                                  batch_size=None).materialize()
    pair_part = mixed.filter(expr="kind == 'pair'") \
        .select_columns(["src", "dst", "weight"])
    markers = mixed.filter(expr="kind != 'pair'").to_pandas()
    extra: dict[tuple[str, str], int] = {}
    if len(markers):
        markers = markers.sort_values(
            ["key", "__o_turn", "kind"],
            key=lambda s: s.map({"first": 0, "last": 1})
            if s.name == "kind" else s)
        kinds = markers["kind"].to_numpy()
        keys = markers["key"].to_numpy()
        vals = markers["src"].to_numpy()
        for i in range(len(markers) - 1):
            if kinds[i] == "last" and kinds[i + 1] == "first" \
                    and keys[i] == keys[i + 1]:
                p = (vals[i], vals[i + 1])
                extra[p] = extra.get(p, 0) + 1
    parts = [pair_part]
    if extra:
        parts.append(ray.data.from_arrow(pa.table({
            "src": pa.array([p[0] for p in extra], pa.string()),
            "dst": pa.array([p[1] for p in extra], pa.string()),
            "weight": pa.array(list(extra.values()), pa.int64()),
        })))
    unioned = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    # canonicalize (min,max) BEFORE the dedup exchange: the one sort merges
    # both directions of every pair, so symmetrize needs no second shuffle
    return dedup_weighted(canonicalize_undirected(unioned))


# ---------------------------------------------------------------------------
# adjacency build: edges (int-encoded) → one row per vertex
# ---------------------------------------------------------------------------

def _runs_to_adjacency(batch: pa.Table) -> pa.Table:
    """One sorted-(src,dst) block → adjacency rows; first/last vertex in the
    block flagged partial (they may continue in neighboring blocks)."""
    n = len(batch)
    empty = pa.table({
        "vertex": pa.array([], pa.int64()),
        "nbrs": pa.array([], pa.large_list(pa.int64())),
        "nbr_weights": pa.array([], pa.large_list(pa.int64())),
        "degree": pa.array([], pa.int64()),
        "partial": pa.array([], pa.bool_()),
    })
    if n == 0:
        return empty
    src = batch["src"].combine_chunks().to_numpy(zero_copy_only=False)
    dst = batch["dst"].combine_chunks().to_numpy(zero_copy_only=False)
    w = batch["weight"].combine_chunks().to_numpy(zero_copy_only=False)
    # run-end offsets over sorted src
    change = np.nonzero(src[1:] != src[:-1])[0] + 1
    offsets = np.concatenate([[0], change, [n]]).astype(np.int64)
    vertices = src[offsets[:-1]]
    nbrs = pa.LargeListArray.from_arrays(offsets, pa.array(dst, pa.int64()))
    ws = pa.LargeListArray.from_arrays(offsets, pa.array(w, pa.int64()))
    degree = np.diff(offsets)
    partial = np.zeros(len(vertices), dtype=bool)
    partial[0] = True
    partial[-1] = True
    return pa.table({
        "vertex": pa.array(vertices, pa.int64()),
        "nbrs": nbrs,
        "nbr_weights": ws,
        "degree": pa.array(degree, pa.int64()),
        "partial": pa.array(partial),
    })


def build_adjacency(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Int-encoded edge table → adjacency table
    (``vertex, nbrs: list<int64>, nbr_weights: list<int64>, degree``), the
    layout the streaming partitioner consumes
    (↔ ``VertexStreamEntry``, ``/root/reference/src/stream.rs:11``).

    Vectorized: sort by (src, dst) then run-end offsets per whole block; the
    ≤2 boundary vertices per block are merged in a fix-up pass whose size is
    bounded by the straddling rows, not the dataset. Deterministic: neighbor
    lists come out sorted by neighbor id.
    """
    sorted_edges = edges.sort(["src", "dst"])
    # pinned because both the complete branch and the boundary fix-up read it;
    # this is also the natural checkpoint/restart point for the partitioner
    # feed (adjacency is more compact than the edge table it derives from).
    adj = sorted_edges.map_batches(_runs_to_adjacency, batch_format="pyarrow",
                                   batch_size=None).materialize()
    complete = adj.filter(expr="partial == False") \
        .select_columns(["vertex", "nbrs", "nbr_weights", "degree"])

    partials = adj.filter(expr="partial == True").to_arrow_refs()
    import ray as _ray
    ptabs = [t for t in _ray.get(partials) if len(t)]
    merged_rows = []
    if ptabs:
        pt = pa.concat_tables(ptabs)
        order = pc.sort_indices(pt, sort_keys=[("vertex", "ascending")])
        pt = pt.take(order)
        vs = pt["vertex"].to_numpy(zero_copy_only=False)
        uniq = np.unique(vs)
        for v in uniq.tolist():
            idx = np.nonzero(vs == v)[0]
            nb = np.concatenate([np.asarray(pt["nbrs"][int(i)].as_py(),
                                            dtype=np.int64) for i in idx])
            ww = np.concatenate([np.asarray(pt["nbr_weights"][int(i)].as_py(),
                                            dtype=np.int64) for i in idx])
            o = np.argsort(nb, kind="stable")
            merged_rows.append((int(v), nb[o], ww[o]))
    if not merged_rows:
        return complete
    fix = pa.table({
        "vertex": pa.array([r[0] for r in merged_rows], pa.int64()),
        "nbrs": pa.array([r[1].tolist() for r in merged_rows],
                         pa.large_list(pa.int64())),
        "nbr_weights": pa.array([r[2].tolist() for r in merged_rows],
                                pa.large_list(pa.int64())),
        "degree": pa.array([len(r[1]) for r in merged_rows], pa.int64()),
    })
    return complete.union(ray.data.from_arrow(fix))
