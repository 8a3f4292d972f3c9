"""Synchronous Louvain-style local-moving community detection.

Modularity-gain community assignment over the symmetrized integer-weighted
edge table (the engine's standard graph form: both directions present, no
self-loops — ``pipelines/graph.py``). This is the local-moving phase of
Louvain (Blondel et al. 2008) made DETERMINISTIC and SQL-replayable:

* communities start as singletons (``c(v) = v``);
* each round, every vertex v considers the communities of its neighbors.
  The modularity gain of v joining community c — with v first removed from
  its own community — is, up to the positive factor ``1/(2m²)``,

      score(v, c) = 2m·k_{v→c} − k_v·(tot(c) − k_v·[c = c(v)])

  where ``k_{v→c}`` is the total edge weight from v into c, ``k_v`` v's
  weighted degree, ``tot(c)`` the summed weighted degree of c's members
  and ``2m`` the total weight of the symmetrized table. All quantities are
  int64, so scores are EXACT — the classic float ΔQ comparison becomes a
  pure integer comparison that DuckDB replays bit-for-bit;
* v moves to the best non-current community by ``(score DESC, c ASC)``
  iff that score STRICTLY exceeds its stay score (classic Louvain moves
  only on positive gain). Updates are synchronous; a round with zero moves
  is a fixed point (early stop ≡ running the remaining rounds).

The synchronous variant can oscillate on swap-symmetric structures instead
of converging — fine here: we run a FIXED number of rounds and the oracle
replays the identical dynamics. (The classic sequential sweep is
order-dependent and therefore not reproducible across partitionings.)

Iteration shape = ``labelprop.py``: broadcast labels (``ray.put`` once per
round) → ``map_batches`` emits per-batch partial ``(v, community, weight)``
sums → optional shuffle combine → driver-side vectorized argmax over ≤E
small rows. The dense O(V) label/degree arrays are the documented small-V
regime; the raw edge table never streams to the driver.

Scale note: integer scores need ``2m·k_v < 2^63`` — i.e. total graph weight
below ~3·10⁹ per the ``2m² < 2^63`` guard. Beyond that (the 10^12-turn
regime) pass ``exact=False`` to score in float64: comparisons then carry
~2^-52 relative tolerance, which only reorders near-exact ties.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from cuttana_ray.pipelines import checkpoint as ckpt
from cuttana_ray.pipelines.graph import Graph
from cuttana_ray.pipelines.pagerank import (IterativeResult,
                                             grouped_sum_exchange,
                                             grouped_sum2_exchange)
from cuttana_ray.util import resolve_combine


def _comm_weight_fn(labels_ref):
    """Per-batch partial k_{v→c}: sum edge weight by (src, label[dst])."""
    schema = pa.schema([("v", pa.int64()), ("c", pa.int64()),
                        ("kin", pa.int64())])

    def fn(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return schema.empty_table()
        labels = ray.get(labels_ref)
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        w = batch["weight"].to_numpy(zero_copy_only=False)
        c = labels[dst]
        order = np.lexsort((c, src))
        v_s, c_s, w_s = src[order], c[order], w[order]
        change = np.nonzero((v_s[1:] != v_s[:-1]) | (c_s[1:] != c_s[:-1]))[0] + 1
        starts = np.concatenate([[0], change])
        sums = np.add.reduceat(w_s, starts)
        return pa.table({"v": pa.array(v_s[starts], pa.int64()),
                         "c": pa.array(c_s[starts], pa.int64()),
                         "kin": pa.array(sums, pa.int64())})
    return fn


def move_step(v: np.ndarray, c: np.ndarray, kin: np.ndarray,
              labels: np.ndarray, kv: np.ndarray, w2: int,
              exact: bool = True) -> np.ndarray:
    """One synchronous move round given combined (v, c, kin) rows (unique
    per pair). Pure NumPy — shared by the engine loop and the pytest
    oracle so the rule has one implementation to diverge from."""
    dt = np.int64 if exact else np.float64
    V = len(labels)
    own = labels[v]
    tot = np.zeros(V, dtype=dt)
    np.add.at(tot, labels, kv.astype(dt))
    tot_adj = tot[c] - np.where(c == own, kv[v], 0).astype(dt)
    score = dt(w2) * kin.astype(dt) - kv[v].astype(dt) * tot_adj

    # stay score per vertex: kin into own community (0 if no such row)
    kin_own = np.zeros(V, dtype=dt)
    mask_own = c == own
    kin_own[v[mask_own]] = kin[mask_own].astype(dt)
    stay = dt(w2) * kin_own - kv.astype(dt) * (tot[labels] - kv.astype(dt))

    # best non-own candidate per vertex: (score desc, c asc)
    cand = ~mask_own
    if not cand.any():
        return labels.copy()
    vc, cc, sc = v[cand], c[cand], score[cand]
    order = np.lexsort((cc, -sc, vc))
    v_s = vc[order]
    first = np.concatenate([[0], np.nonzero(v_s[1:] != v_s[:-1])[0] + 1])
    bv, bc, bs = v_s[first], cc[order][first], sc[order][first]
    new = labels.copy()
    movers = bs > stay[bv]
    new[bv[movers]] = bc[movers]
    return new


def _check_weight_budget(w2: int, exact: bool) -> None:
    if exact and w2 > 3_000_000_000:  # 2m^2 must stay below 2^63
        raise ValueError(
            f"total weight 2m={w2} too large for exact int64 scores "
            "(needs 2m^2 < 2^63); pass exact=False for float scoring")


def _run_rounds(edges: "ray.data.Dataset", V: int, kv: np.ndarray, w2: int,
                max_rounds: int, combine: str, exact: bool,
                workdir: str | None = None, resume: bool = False,
                tag: str = "louvain") -> IterativeResult:
    """The synchronous move loop over an arbitrary symmetrized edge table
    (parallel edges allowed — the per-pair combine merges them) with an
    explicit degree vector; shared by both Louvain levels."""
    labels = np.arange(V, dtype=np.int64)
    start_round = 0
    if resume and workdir:
        loaded = ckpt.load_latest_iteration(workdir, tag)
        if loaded is not None:
            start_round, labels, _ = loaded
            labels = labels.astype(np.int64)
            start_round += 1

    res = IterativeResult(labels, 0, False)
    for it in range(start_round, max_rounds):
        t0 = time.perf_counter()
        labels_ref = ray.put(labels)
        partial = edges.map_batches(_comm_weight_fn(labels_ref),
                                    batch_format="pyarrow")
        if combine == "shuffle":
            # bucketed sort-exchange, not the native per-key aggregate —
            # ~96x at high key cardinality; int64 sums are order-exact
            partial = grouped_sum2_exchange(partial, "v", "c", "kin",
                                            int_val=True)
        vs, cs, ks = [], [], []
        for b in partial.iter_batches(batch_size=1 << 20,
                                      batch_format="pyarrow"):
            vs.append(b["v"].to_numpy(zero_copy_only=False))
            cs.append(b["c"].to_numpy(zero_copy_only=False))
            ks.append(b["kin"].to_numpy(zero_copy_only=False))
        if vs:
            v = np.concatenate(vs); c = np.concatenate(cs)
            k = np.concatenate(ks)
            # merge per-batch partials into unique (v, c) rows
            order = np.lexsort((c, v))
            v, c, k = v[order], c[order], k[order]
            change = np.nonzero((v[1:] != v[:-1]) | (c[1:] != c[:-1]))[0] + 1
            starts = np.concatenate([[0], change])
            new = move_step(v[starts], c[starts],
                            np.add.reduceat(k, starts),
                            labels, kv, w2, exact=exact)
        else:
            new = labels.copy()
        changed = int((new != labels).sum())
        labels = new
        dt = time.perf_counter() - t0
        res.deltas.append(float(changed))
        res.seconds_per_iter.append(dt)
        if workdir:
            ckpt.save_iteration(workdir, tag, it, labels,
                                {"changed": changed, "seconds": dt})
        if changed == 0:
            res.iterations = it + 1
            res.converged = True
            break
    else:
        res.iterations = max_rounds
    res.values = labels
    return res


def _int_degrees(graph: Graph) -> np.ndarray:
    kv_f = graph.out_weights()
    kv = np.rint(kv_f).astype(np.int64)
    if not np.array_equal(kv.astype(np.float64), kv_f):
        raise ValueError("louvain requires integer edge weights")
    return kv


def louvain_local_moving(graph: Graph, max_rounds: int = 10,
                         workdir: str | None = None, resume: bool = False,
                         combine: str = "auto",
                         exact: bool = True) -> IterativeResult:
    """Run the synchronous local-moving rounds; returns per-vertex
    community labels in ``.values`` (int64, V-length)."""
    V = graph.num_vertices
    combine = resolve_combine(combine, V)
    kv = _int_degrees(graph)
    w2 = int(kv.sum())
    _check_weight_budget(w2, exact)
    return _run_rounds(graph.edges, V, kv, w2, max_rounds, combine, exact,
                       workdir=workdir, resume=resume)


def _project_fn(labels_ref):
    """Contract an edge batch by the phase-1 labels: endpoints become
    community ids, intra-community rows (super-loops) drop. Parallel edges
    stay — ``_run_rounds``'s per-pair combine merges them, so the quotient
    needs NO groupby exchange of its own."""
    def fn(batch: pa.Table) -> pa.Table:
        labels = ray.get(labels_ref)
        src = labels[batch["src"].to_numpy(zero_copy_only=False)]
        dst = labels[batch["dst"].to_numpy(zero_copy_only=False)]
        w = batch["weight"].to_numpy(zero_copy_only=False)
        keep = src != dst
        return pa.table({"src": pa.array(src[keep], pa.int64()),
                         "dst": pa.array(dst[keep], pa.int64()),
                         "weight": pa.array(w[keep], pa.int64())})
    return fn


def louvain_two_level(graph: Graph, rounds1: int = 6, rounds2: int = 6,
                      combine: str = "auto",
                      exact: bool = True) -> IterativeResult:
    """Full two-level Louvain: local moving → contract communities into
    super-vertices → local moving on the quotient → project back.

    Degree is CONSERVED under contraction (a super-vertex's weighted degree
    is the sum of its members' degrees — internal edges land in the members'
    degrees exactly like a doubled self-loop would), so phase 2 needs no
    self-loop bookkeeping: ``kv₂ = Σ_{v∈C} kv(v)`` and the contracted edge
    table simply drops intra-community rows. 2m is likewise conserved.
    Phase-2 vertex ids are the phase-1 community labels (a sparse subset of
    [0, V)); non-community ids are inert zero-degree rows in the dense
    small-V arrays. Returns per-ORIGINAL-vertex final labels."""
    V = graph.num_vertices
    combine = resolve_combine(combine, V)
    kv = _int_degrees(graph)
    w2 = int(kv.sum())
    _check_weight_budget(w2, exact)
    res1 = _run_rounds(graph.edges, V, kv, w2, rounds1, combine, exact)
    lab1 = res1.values
    kv2 = np.zeros(V, dtype=np.int64)
    np.add.at(kv2, lab1, kv)
    edges2 = graph.edges.map_batches(_project_fn(ray.put(lab1)),
                                     batch_format="pyarrow")
    res2 = _run_rounds(edges2, V, kv2, w2, rounds2, combine, exact,
                       tag="louvain2")
    final = res2.values[lab1]
    out = IterativeResult(final, res1.iterations + res2.iterations,
                          res1.converged and res2.converged)
    out.deltas = res1.deltas + res2.deltas
    out.seconds_per_iter = res1.seconds_per_iter + res2.seconds_per_iter
    out.values = final
    return out


def _block_pair_sum(t: pa.Table, ka: str, kb: str, val: str,
                    out: str) -> pa.Table:
    """Per-block combiner: sum ``val`` over (ka, kb) runs — the partial
    that keeps every exchange pre-aggregated."""
    schema = pa.schema([(ka, pa.int64()), (kb, pa.int64()),
                        (out, pa.int64())])
    if len(t) == 0:
        return schema.empty_table()
    a = t[ka].to_numpy(zero_copy_only=False)
    b = t[kb].to_numpy(zero_copy_only=False)
    w = t[val].to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a))
    a_s, b_s, w_s = a[order], b[order], w[order]
    change = np.nonzero((a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1]))[0] + 1
    starts = np.concatenate([[0], change])
    return pa.table({ka: pa.array(a_s[starts], pa.int64()),
                     kb: pa.array(b_s[starts], pa.int64()),
                     out: pa.array(np.add.reduceat(w_s, starts),
                                   pa.int64())}).cast(schema)


def modularity_numpy(src: np.ndarray, dst: np.ndarray, w: np.ndarray,
                     labels: np.ndarray) -> float:
    """Newman modularity Q over a symmetrized edge table (both directions
    present, no self-loops): Q = Σ_c [in(c)/2m − (tot(c)/2m)²]. Test
    helper; the distributed quality metric lives in ``stages/metrics``."""
    w = w.astype(np.float64)
    w2 = w.sum()
    V = len(labels)
    kv = np.zeros(V)
    np.add.at(kv, src, w)
    tot = np.zeros(V)
    np.add.at(tot, labels, kv)
    intra = w[labels[src] == labels[dst]].sum()
    return float(intra / w2 - ((tot / w2) ** 2).sum())




_LOCAL_LOUVAIN_MAX_EDGES = 1 << 21


def _louvain_local_edges(t: pa.Table, max_rounds: int, exact: bool,
                         w2: int) -> pa.Table:
    """Size-gated local twin of the ``louvain_shuffle`` round loop: dense-
    ify the (sorted-unique) ids, run ``move_step`` — the ONE shared
    implementation of the move rule — per round, map labels back. The
    id→dense mapping is monotonic, so the rule's (score DESC, c ASC)
    tie-break orders identically over dense indices and sparse 63-bit ids:
    outputs are bit-identical to the distributed path (parity pytest)."""
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    w = t["weight"].to_numpy(zero_copy_only=False).astype(np.int64)
    ids, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    s, d = inv[: len(src)].astype(np.int64), inv[len(src):].astype(np.int64)
    V = len(ids)
    kv = np.zeros(V, np.int64)
    np.add.at(kv, s, w)
    labels = np.arange(V, dtype=np.int64)
    for _ in range(max_rounds):
        c = labels[d]
        key = s * V + c
        order = np.argsort(key, kind="stable")
        ks, ws = key[order], w[order]
        starts = np.concatenate([[0], np.nonzero(ks[1:] != ks[:-1])[0] + 1])
        kin = np.add.reduceat(ws, starts)
        kpair = ks[starts]
        new = move_step(kpair // V, kpair % V, kin, labels, kv, w2, exact)
        if np.array_equal(new, labels):
            break
        labels = new
    return pa.table({"node_id": pa.array(ids, pa.int64()),
                     "community": pa.array(ids[labels], pa.int64())})


def louvain_shuffle(edges: "ray.data.Dataset", max_rounds: int = 6,
                    exact: bool = True,
                    num_partitions: int | None = None,
                    local_max_edges: int | None = None) -> "ray.data.Dataset":
    """Big-V Louvain local moving: EVERY piece of per-vertex state —
    labels, degrees, community totals, gain scores — lives in Datasets and
    moves through hash-join / pre-combined-groupby exchanges; no O(V)
    object ever materializes on the driver (the only driver scalars are 2m
    and the per-round move count). Vertex ids are arbitrary sparse int64
    (e.g. the big-V 63-bit hash ids); the move rule is identical to
    ``louvain_local_moving`` — exact int64 scores, (score DESC, c ASC),
    strict improvement only — so results agree through the id mapping.

    Cost shape per round: one tot groupby over the carried (v, c, kv)
    state (labels and degrees ride ONE dataset, so attaching them costs
    one join, not two, and tot needs no join at all), one pre-combined kin
    exchange, three hash joins (neighbor labels; own-state + tot-of-own in
    one; tot-of-candidate), and ONE decision exchange — a
    ``groupby(v).map_groups`` whose callback resolves stay-vs-best
    vectorized across all complete groups in its block (no per-group
    Python) and carries kv through so the next round's state needs no
    re-attach. The per-round state Dataset re-materializes to cut lineage.
    This is the documented scale regime; the broadcast path is ~an order
    of magnitude cheaper per round on graphs whose dense vertex state fits
    one node.

    ``num_partitions`` defaults to edge-count-scaled (≥64k rows per
    partition, capped by the pool bound) — every exchange here carries a
    per-partition aggregator-pool fixed cost (~1-2.5 s warm on this box),
    so a small graph on a wide host must not fan each join out 8 ways.

    Input: symmetrized ``(src, dst, weight:int64)`` with no self-loops.
    Returns a Dataset ``(node_id, community)``.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from cuttana_ray.util import drop_empty_blocks, pool_size, safe_join

    ndt = np.int64 if exact else np.float64

    agg = edges.aggregate(Sum("weight"), Count(alias_name="_n"))
    w2 = int(agg["sum(weight)"])
    n_edges = int(agg["_n"])
    _check_weight_budget(w2, exact)
    local_max = _LOCAL_LOUVAIN_MAX_EDGES if local_max_edges is None \
        else local_max_edges
    if n_edges <= local_max:
        # ~7 exchanges/round × 6 rounds is all fixed cost on a graph this
        # size; the local twin runs the identical rule (see
        # _louvain_local_edges) in one task's worth of numpy. ≤2M edge
        # rows ≈ 48 MB — far below a worker heap.
        from cuttana_ray.util import local_table
        t = local_table(edges)
        return ray.data.from_arrow(
            _louvain_local_edges(t, max_rounds, exact, w2))
    npart = num_partitions if num_partitions is not None \
        else max(1, min(pool_size()[1], n_edges // 65536 + 1))

    def kv_partial(t: pa.Table) -> pa.Table:
        schema = pa.schema([("src", pa.int64()), ("kv", pa.int64())])
        if len(t) == 0:
            return schema.empty_table()
        s = t["src"].to_numpy(zero_copy_only=False)
        w = t["weight"].to_numpy(zero_copy_only=False)
        order = np.argsort(s, kind="stable")
        s_s, w_s = s[order], w[order]
        starts = np.concatenate(
            [[0], np.nonzero(s_s[1:] != s_s[:-1])[0] + 1])
        return pa.table({"src": pa.array(s_s[starts], pa.int64()),
                         "kv": pa.array(np.add.reduceat(w_s, starts),
                                        pa.int64())}).cast(schema)

    # carried per-vertex state: (v, c, kv) in ONE dataset — singleton init
    state = grouped_sum_exchange(
        edges.map_batches(kv_partial, batch_format="pyarrow"),
        "src", "kv", int_val=True).rename_columns({"s": "kv"}) \
        .map_batches(
        lambda t: pa.table({"v": t["src"],
                            "c": pc.cast(t["src"], pa.int64()),
                            "kv": t["kv"]}),
        batch_format="pyarrow").materialize()

    def decide_groups(t: pa.Table) -> pa.Table:
        """One decision row per vertex, vectorized across every complete
        group in the block: stay score = the own-community row's score if
        present else ``−k_v·(tot(own) − k_v)`` (kin_own = 0); best
        candidate by (score DESC, c ASC) among non-own rows; move iff
        strictly better. ``map_groups`` guarantees group completeness but
        packs several groups per block — everything here keys on the
        per-row group id, never on block identity."""
        schema = pa.schema([("v", pa.int64()), ("c", pa.int64()),
                            ("kv", pa.int64()), ("chg", pa.int64())])
        if len(t) == 0:
            return schema.empty_table()
        v = t["v"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        own = t["own"].to_numpy(zero_copy_only=False)
        kvi = t["kv"].to_numpy(zero_copy_only=False)
        deg = kvi.astype(ndt)
        kin = t["kin"].to_numpy(zero_copy_only=False).astype(ndt)
        tt = t["tot"].to_numpy(zero_copy_only=False).astype(ndt)
        tto = t["tot_own"].to_numpy(zero_copy_only=False).astype(ndt)
        is_own = c == own
        s = ndt(w2) * kin - deg * (tt - np.where(is_own, deg, 0)
                                   .astype(ndt))
        uniq, gid = np.unique(v, return_inverse=True)
        G = len(uniq)
        # first occurrence per group (v not necessarily sorted pre-unique)
        first = np.full(G, len(v), dtype=np.int64)
        np.minimum.at(first, gid, np.arange(len(v), dtype=np.int64))
        stay = (-deg[first] * (tto[first] - deg[first])).astype(ndt)
        stay[gid[is_own]] = s[is_own]
        own_g = own[first]
        cand = ~is_own
        newc = own_g.copy()
        chg = np.zeros(G, dtype=np.int64)
        if cand.any():
            gc, cc, sc_ = gid[cand], c[cand], s[cand]
            order = np.lexsort((cc, -sc_, gc))
            g_s = gc[order]
            head = np.concatenate(
                [[0], np.nonzero(g_s[1:] != g_s[:-1])[0] + 1])
            bg, bc, bs = g_s[head], cc[order][head], sc_[order][head]
            movers = bs > stay[bg]
            newc[bg[movers]] = bc[movers]
            chg[bg[movers]] = 1
        return pa.table({"v": pa.array(uniq, pa.int64()),
                         "c": pa.array(newc, pa.int64()),
                         "kv": pa.array(kvi[first], pa.int64()),
                         "chg": pa.array(chg, pa.int64())}).cast(schema)

    for _ in range(max_rounds):
        tot = state.groupby("c").aggregate(
            Sum("kv", alias_name="tot")).materialize()
        # own-community totals attach onto the state rows ONCE per round;
        # the same joined table then serves both the kin attach (own, kv,
        # tot_own in one join) — the old shape paid three separate joins
        # for labels, kv and tot_own
        st2 = safe_join(state, tot.rename_columns({"c": "_tc",
                                                   "tot": "tot_own"}),
                        join_type="inner", num_partitions=npart,
                        on=("c",), right_on=("_tc",))
        cdst = safe_join(edges,
                         state.select_columns(["v", "c"]).rename_columns(
                             {"v": "_dv", "c": "cdst"}),
                         join_type="inner", num_partitions=npart,
                         on=("dst",), right_on=("_dv",))
        kin = cdst.map_batches(
            lambda t: _block_pair_sum(t, "src", "cdst", "weight", "kin"),
            batch_format="pyarrow").groupby(["src", "cdst"]).aggregate(
                Sum("kin", alias_name="kin"))
        sc = safe_join(kin.rename_columns({"src": "v", "cdst": "c"}),
                       st2.rename_columns({"v": "_sv", "c": "own"}),
                       join_type="inner", num_partitions=npart,
                       on=("v",), right_on=("_sv",))
        sc = safe_join(sc, tot, join_type="inner", num_partitions=npart,
                       on=("c",), right_on=("c",))
        decided = sc.groupby("v").map_groups(
            decide_groups, batch_format="pyarrow").materialize()
        changed = int(decided.aggregate(Sum("chg"))["sum(chg)"] or 0)
        state = drop_empty_blocks(decided.select_columns(["v", "c", "kv"]))
        if changed == 0:
            break

    return state.map_batches(
        lambda t: pa.table({"node_id": t["v"], "community": t["c"]}),
        batch_format="pyarrow")
