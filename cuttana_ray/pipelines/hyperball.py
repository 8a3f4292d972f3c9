"""HyperBall: distributed per-vertex neighborhood-function estimation.

``ball(v, t) = |{w : dist(v, w) <= t}|`` for EVERY vertex simultaneously,
estimated with one HyperLogLog counter per vertex and iterated as a
register-wise max over out-neighbors (Boldi, Rosa & Vigna, "HyperANF:
approximating the neighbourhood function of very large graphs on a
budget", WWW 2011; the register-max recursion is Palmer et al.'s ANF with
HLL in place of Flajolet-Martin bitmasks). This is the web-scale distance
primitive: exact all-sources BFS is O(V·E), HyperBall is ``t`` rounds of
one hash join + one grouped register-max with m = 2^p BYTES of state per
vertex (p=6 → 64 B), and underlies effective-diameter / centrality
estimates on graphs where exact distances are unpayable.

Ray-Data shape per round — no O(V) object on the driver at any point,
state lives in the object store as a (v, regs) Dataset:

    state(v, regs) ⋈ edges(src, dst) on v = dst    -- pull neighbor regs
      ∪ state                                       -- keep own regs
      → per-batch same-key pre-combine (sort + np.maximum.reduceat)
      → groupby(v) register-wise max                -- ONE exchange

Registers are ``fixed_size_binary(m)`` — packed/unpacked zero-copy as an
(n, m) uint8 matrix per batch, so every combine is a vectorized NumPy
max, never a per-row Python loop. The vertex hash is
``sketches.murmur64_int`` — bit-identical to DuckDB's ``hash()`` for
BIGINT — so registers, estimate and small-range correction can all be
replayed exactly in SQL (``__ray_entry__`` ``hyperball3_events`` oracle).

The reference engine has no distance sketches; this is an
engine-designed operator (SURVEY.md §2.4 sketch family).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from cuttana_ray.functions.sketches import (
    _hll_alpha,
    hll_idx_rank,
    murmur64_int,
)
from cuttana_ray.util import safe_join


def _pack(v: np.ndarray, regs: np.ndarray) -> pa.Table:
    """(v, (n, m) uint8 register matrix) → (v, fixed_size_binary(m))."""
    n, m = regs.shape
    data = pa.py_buffer(np.ascontiguousarray(regs).tobytes())
    arr = pa.Array.from_buffers(pa.binary(m), n, [None, data])
    return pa.table({"v": pa.array(v, pa.int64()), "regs": arr})


def _unpack(col: "pa.ChunkedArray | pa.Array", m: int) -> np.ndarray:
    """fixed_size_binary(m) column → (n, m) uint8 matrix (zero-copy)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, m), np.uint8)
    buf = col.buffers()[1]
    return np.frombuffer(buf, np.uint8, count=n * m,
                         offset=col.offset * m).reshape(n, m)


def _state_schema(m: int) -> pa.Schema:
    return pa.schema([("v", pa.int64()), ("regs", pa.binary(m))])


def _combine_same_key(t: pa.Table, m: int) -> pa.Table:
    """Register-wise max over rows sharing a key (vectorized reduceat)."""
    sch = _state_schema(m)
    if len(t) == 0 or "v" not in t.column_names:
        return sch.empty_table()
    v = t["v"].to_numpy(zero_copy_only=False)
    regs = _unpack(t["regs"], m)
    order = np.argsort(v, kind="stable")
    v = v[order]
    regs = regs[order]
    starts = np.concatenate([[0], np.nonzero(v[1:] != v[:-1])[0] + 1])
    return _pack(v[starts], np.maximum.reduceat(regs, starts, axis=0))


def hll_estimate_rows(regs: np.ndarray) -> np.ndarray:
    """Row-wise HLL estimate over an (n, m) register matrix, with the
    standard small-range (linear counting) correction — float64 math in
    the same shape the SQL replay uses. Returned UNROUNDED."""
    n, m = regs.shape
    est = _hll_alpha(m) * m * m / np.exp2(-regs.astype(np.float64)) \
        .sum(axis=1)
    zeros = (regs == 0).sum(axis=1)
    small = (est <= 2.5 * m) & (zeros > 0)
    if small.any():
        est[small] = m * np.log(m / zeros[small])
    return est


def _init_state(edges: "ray.data.Dataset", p: int) -> "ray.data.Dataset":
    """Materialized (v, regs) state with each vertex's own hash set —
    vertex universe = distinct src (edges are symmetrized, so every
    vertex appears as a source)."""
    from ray.data.aggregate import Count

    m = 1 << p
    verts = edges.groupby("src").aggregate(Count(alias_name="_c")) \
        .select_columns(["src"])

    def init(tbl: pa.Table) -> pa.Table:
        sch = _state_schema(m)
        if len(tbl) == 0 or "src" not in tbl.column_names:
            return sch.empty_table()
        v = tbl["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx, rank = hll_idx_rank(murmur64_int(v), p)
        regs = np.zeros((len(v), m), np.uint8)
        regs[np.arange(len(v)), idx] = rank
        return _pack(v, regs)

    return verts.map_batches(init, batch_format="pyarrow").materialize()


def _grouped_register_max(ds: "ray.data.Dataset", m: int
                          ) -> "ray.data.Dataset":
    """Register-wise max per key over a (v, regs) Dataset with ONE sort
    exchange and NO per-group Python call: each sorted block combines its
    keys vectorized (reduceat); only the block-edge keys — the ≤2 rows per
    block whose runs may continue in a neighbor block — ship to a driver
    merge and re-enter as one tiny block (the boundary-carry pattern of
    ``stages/edges.py``). A groupby().map_groups() here would pay one
    Python call per VERTEX per round — the classic V-dominated cost this
    file exists to avoid."""
    sch = pa.schema([("v", pa.int64()), ("regs", pa.binary(m)),
                     ("partial", pa.bool_())])

    def combine_flag(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "v" not in t.column_names:
            return sch.empty_table()
        c = _combine_same_key(t, m)
        v = c["v"].to_numpy(zero_copy_only=False)
        part = (v == v[0]) | (v == v[-1])
        return c.append_column("partial", pa.array(part))

    combined = ds.sort("v") \
        .map_batches(combine_flag, batch_format="pyarrow",
                     batch_size=None).materialize()
    complete = combined.filter(expr="partial == False") \
        .select_columns(["v", "regs"])

    @ray.remote
    def _edges_of(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "partial" not in t.column_names:
            return _state_schema(m).empty_table()
        return t.filter(t["partial"]).select(["v", "regs"])

    ptabs = [t for t in ray.get([_edges_of.remote(r)
                                 for r in combined.to_arrow_refs()])
             if len(t)]
    if not ptabs:
        return complete
    fixed = _combine_same_key(pa.concat_tables(ptabs), m)
    return complete.union(ray.data.from_arrow(fixed))


def _round(state: "ray.data.Dataset", e2: "ray.data.Dataset", m: int,
           num_partitions: int) -> "ray.data.Dataset":
    """One HyperBall round: pull neighbor registers through the edge
    join, keep own registers, register-wise max per vertex."""
    def combine(tbl: pa.Table) -> pa.Table:
        return _combine_same_key(tbl, m)

    nb = safe_join(e2, state, join_type="inner",
                   num_partitions=num_partitions,
                   on=("dst",), right_on=("v",)) \
        .select_columns(["src", "regs"]) \
        .rename_columns({"src": "v"})
    merged = nb.union(state) \
        .map_batches(combine, batch_format="pyarrow")
    return _grouped_register_max(merged, m).materialize()


def _ball_table(state: "ray.data.Dataset", m: int) -> "ray.data.Dataset":
    def finish(tbl: pa.Table) -> pa.Table:
        sch = pa.schema([("node_id", pa.int64()), ("ball", pa.int64())])
        if len(tbl) == 0 or "v" not in tbl.column_names:
            return sch.empty_table()
        est = hll_estimate_rows(_unpack(tbl["regs"], m))
        return pa.table({
            "node_id": tbl["v"].cast(pa.int64()),
            # floor(x + 0.5): ROUND-half-away-from-zero for positives
            # (np.round is half-to-even and would diverge from DuckDB)
            "ball": pa.array(np.floor(est + 0.5).astype(np.int64)),
        })

    return state.map_batches(finish, batch_format="pyarrow")


def _default_partitions(edges: "ray.data.Dataset") -> int:
    from cuttana_ray.util import pool_size
    return max(1, min(pool_size()[1], edges.count() // 65536 + 1))


_LOCAL_HB_MAX_EDGES = 1 << 21


def _local_ball_series(t: pa.Table, t_max: int, p: int):
    """Size-gated local twin of the round loop: same register init
    (``murmur64_int`` + ``hll_idx_rank``), same register-max recursion
    (segment ``np.maximum.reduceat`` over src-sorted edges — one sort,
    no per-round Python loop), same rounded ``hll_estimate_rows``
    readout — so the (ids, ball_t) series is bit-identical to the
    distributed path (parity pytest). Returns ``(ids, [ball_0..ball_t])``.
    """
    m = 1 << p
    src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    ids = np.unique(src)  # symmetrized: every vertex appears as a src
    s = np.searchsorted(ids, src)
    d = np.searchsorted(ids, dst)
    idx, rank = hll_idx_rank(murmur64_int(ids), p)
    regs = np.zeros((len(ids), m), np.uint8)
    regs[np.arange(len(ids)), idx] = rank

    order = np.argsort(s, kind="stable")
    s_s, d_s = s[order], d[order]
    starts = np.concatenate([[0], np.nonzero(s_s[1:] != s_s[:-1])[0] + 1])
    tgt = s_s[starts]

    def ball(r: np.ndarray) -> np.ndarray:
        return np.floor(hll_estimate_rows(r) + 0.5).astype(np.int64)

    balls = [ball(regs)]
    for _ in range(t_max):
        seg = np.maximum.reduceat(regs[d_s], starts, axis=0)
        new = regs.copy()
        new[tgt] = np.maximum(new[tgt], seg)
        regs = new
        balls.append(ball(regs))
    return ids, balls


def _local_edges_or_none(edges: "ray.data.Dataset",
                         local_max_edges: int | None) -> "pa.Table | None":
    from cuttana_ray.util import local_table
    cap = _LOCAL_HB_MAX_EDGES if local_max_edges is None else local_max_edges
    if cap and edges.count() <= cap:
        return local_table(edges)
    return None


def hyperball(edges: "ray.data.Dataset", t: int, p: int = 6,
              num_partitions: int | None = None,
              local_max_edges: int | None = None) -> "ray.data.Dataset":
    """Per-vertex t-hop ball-size estimates over a symmetrized int64
    (src, dst) edge Dataset. Returns a Dataset ``(node_id: int64,
    ball: int64)`` — ball = ROUND(HLL estimate of |{w : dist ≤ t}|),
    half away from zero, matching DuckDB's ROUND for the SQL replay."""
    m = 1 << p
    lt = _local_edges_or_none(edges, local_max_edges)
    if lt is not None:
        ids, balls = _local_ball_series(lt, t, p)
        return ray.data.from_arrow(pa.table({
            "node_id": pa.array(ids, pa.int64()),
            "ball": pa.array(balls[t], pa.int64())}))
    if num_partitions is None:
        num_partitions = _default_partitions(edges)
    state = _init_state(edges, p)
    e2 = edges.select_columns(["src", "dst"])
    for _ in range(t):
        state = _round(state, e2, m, num_partitions)
    return _ball_table(state, m)


def hyperball_harmonic(edges: "ray.data.Dataset", t_max: int, p: int = 6,
                       num_partitions: int | None = None,
                       local_max_edges: int | None = None
                       ) -> "ray.data.Dataset":
    """Approximate harmonic centrality from the HyperBall series (Boldi &
    Vigna, "In-core computation of geometric centralities with
    HyperBall", ICDMW 2013): H(v) = Σ_w 1/dist(v,w) ≈ Σ_{t≥1}
    (|ball(v,t)| - |ball(v,t-1)|) / t — the number of NEW vertices at
    distance t, weighted 1/t, read off the rounded per-round ball
    estimates. The scale-path sibling of the exact ``harmonic_events``
    (O(V·E) BFS): t_max rounds of join + grouped register max + one
    linear ball join per round, no O(V) driver object. Returns
    ``(node_id: int64, hharm: float64 rounded to 8 dp)``."""
    m = 1 << p
    lt = _local_edges_or_none(edges, local_max_edges)
    if lt is not None:
        ids, balls = _local_ball_series(lt, t_max, p)
        acc_l = np.zeros(len(ids), np.float64)
        for t in range(1, t_max + 1):
            acc_l += (balls[t] - balls[t - 1]) / float(t)
        return ray.data.from_arrow(pa.table({
            "node_id": pa.array(ids, pa.int64()),
            # pc.round, not np.round: exactly the distributed finish
            "hharm": pc.round(pa.array(acc_l), 8)}))
    if num_partitions is None:
        num_partitions = _default_partitions(edges)
    state = _init_state(edges, p)
    e2 = edges.select_columns(["src", "dst"])

    def start(tbl: pa.Table) -> pa.Table:
        sch = pa.schema([("node_id", pa.int64()), ("prev", pa.int64()),
                         ("acc", pa.float64())])
        if len(tbl) == 0 or "node_id" not in tbl.column_names:
            return sch.empty_table()
        return pa.table({
            "node_id": tbl["node_id"],
            "prev": tbl["ball"],
            "acc": pa.array(np.zeros(len(tbl), np.float64))})

    acc = _ball_table(state, m) \
        .map_batches(start, batch_format="pyarrow").materialize()

    for t in range(1, t_max + 1):
        state = _round(state, e2, m, num_partitions)
        balls = _ball_table(state, m) \
            .rename_columns({"node_id": "_nid", "ball": "_ball"})
        joined = safe_join(acc, balls, join_type="inner",
                           num_partitions=num_partitions,
                           on=("node_id",), right_on=("_nid",))

        def step(tbl: pa.Table, _t=t) -> pa.Table:
            sch = pa.schema([("node_id", pa.int64()),
                             ("prev", pa.int64()), ("acc", pa.float64())])
            if len(tbl) == 0 or "node_id" not in tbl.column_names:
                return sch.empty_table()
            prev = tbl["prev"].to_numpy(zero_copy_only=False)
            ball = tbl["_ball"].to_numpy(zero_copy_only=False)
            a = tbl["acc"].to_numpy(zero_copy_only=False)
            return pa.table({
                "node_id": tbl["node_id"],
                "prev": tbl["_ball"],
                "acc": pa.array(a + (ball - prev) / float(_t))})

        acc = joined.map_batches(step, batch_format="pyarrow") \
            .materialize()

    def finish(tbl: pa.Table) -> pa.Table:
        sch = pa.schema([("node_id", pa.int64()), ("hharm", pa.float64())])
        if len(tbl) == 0 or "node_id" not in tbl.column_names:
            return sch.empty_table()
        return pa.table({
            "node_id": tbl["node_id"],
            "hharm": pc.round(tbl["acc"], 8)})

    return acc.map_batches(finish, batch_format="pyarrow")


def hyperball_nf(edges: "ray.data.Dataset", t_max: int, p: int = 6,
                 eff_frac: float = 0.9,
                 num_partitions: int | None = None,
                 local_max_edges: int | None = None) -> pa.Table:
    """HyperANF: the neighborhood function NF(t) = Σ_v ball(v, t) for
    t = 0..t_max from ONE register iteration (each round adds a single
    streamed estimate pass over the per-vertex state — the driver sees
    t_max+1 scalars, never the state). Returns a small table
    ``(t, nf, is_effective_diameter)`` where the flagged row is the
    smallest t with NF(t) ≥ eff_frac · NF(t_max) — the standard
    effective-diameter readout of the neighborhood function."""
    m = 1 << p
    lt = _local_edges_or_none(edges, local_max_edges)
    if lt is not None:
        _, balls = _local_ball_series(lt, t_max, p)
        nf = [int(b.sum()) for b in balls]
    else:
        if num_partitions is None:
            num_partitions = _default_partitions(edges)
        state = _init_state(edges, p)
        e2 = edges.select_columns(["src", "dst"])
        nf = [int(_ball_table(state, m).sum("ball"))]
        for _ in range(t_max):
            state = _round(state, e2, m, num_partitions)
            nf.append(int(_ball_table(state, m).sum("ball")))
    thresh = eff_frac * nf[-1]
    eff = next(i for i, x in enumerate(nf) if x >= thresh)
    return pa.table({
        "t": pa.array(np.arange(t_max + 1, dtype=np.int64)),
        "nf": pa.array(nf, pa.int64()),
        "is_effective_diameter": pa.array(
            [i == eff for i in range(t_max + 1)], pa.bool_()),
    })
