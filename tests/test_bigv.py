"""Big-V mode (pipelines/bigv.py): hash-id encode + shard-resident BSP —
the no-O(V)-on-the-driver regime.

The parity oracle is the DENSE path on the same string edge table: scores
must agree per vertex (allclose 1e-6 through convergence) after mapping
dense vocab names → hash ids. The dense path holds O(V) arrays; the big-V
path's contract is that it never does (ownership is ``id % k``; out-weights
and ranks live in the shards; the driver sees scalars and refs)."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd


def _transcript_edges_fixture(n_convs: int = 60, seed: int = 7):
    """Synthetic transcript table (input_hint schema) → string edge table
    via the flagship extractor."""
    from cuttana_ray.stages.edges import transcript_edges
    rng = np.random.default_rng(seed)
    convs, turn_idx, roles, texts, tools, ts = [], [], [], [], [], []
    tool_names = [f"tool{i}" for i in range(9)]
    for c in range(n_convs):
        n_turns = int(rng.integers(2, 9))
        for t in range(n_turns):
            convs.append(f"conv{c:04d}")
            turn_idx.append(t)
            roles.append(["user", "assistant", "system", "tool"]
                         [int(rng.integers(0, 4))])
            texts.append(f"text {c} {t}")
            tools.append(tool_names[int(rng.integers(0, 9))]
                         if rng.random() < 0.5 else None)
            ts.append(1_700_000_000_000_000 + c * 1000 + t)
    tbl = pa.table({
        "conv_id": pa.array(convs, pa.string()),
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tools, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })
    return transcript_edges(rd.from_arrow(tbl).repartition(5))


def _symmetrized_string_edges():
    """Doubled-adjacency string edge table (both directions, no loops) —
    the form both the dense and big-V paths consume.
    transcript_edges output is canonical (one row per unordered pair)."""
    from cuttana_ray.pipelines.bigv import symmetrize_string_edges
    return symmetrize_string_edges(_transcript_edges_fixture())


def test_hash_ids_deterministic_and_distinct():
    from cuttana_ray.pipelines.bigv import hash_name_ids
    names = [f"conv{i:04d}" for i in range(2000)] + \
        ["tool:a", "role:user", "role:assistant"]
    ids = hash_name_ids(pa.array(names, pa.string()))
    assert (ids >= 0).all()
    assert len(np.unique(ids)) == len(names)
    again = hash_name_ids(pa.array(names, pa.string()))
    assert (ids == again).all()


def test_collision_check_clean_and_dirty(ray_session):
    from cuttana_ray.pipelines.bigv import (
        _collision_block,
        check_hash_collisions,
    )
    edges = _symmetrized_string_edges()
    assert check_hash_collisions(edges) == 0
    # dirty: two names forced onto one hash (checker unit level — FNV
    # collisions are unconstructable by hand, so feed the block scanner
    # a crafted sorted (h, name) table directly)
    t = pa.table({"h": pa.array([1, 1, 2], pa.int64()),
                  "name": pa.array(["a", "b", "c"])})
    meta = ray.get(_collision_block.remote(t))
    assert meta["collisions"] == 1
    # and the boundary path: block1 ends with (5,"x"), block2 starts (5,"y")
    b1 = pa.table({"h": pa.array([5], pa.int64()), "name": pa.array(["x"])})
    b2 = pa.table({"h": pa.array([5], pa.int64()), "name": pa.array(["y"])})
    m1, m2 = ray.get([_collision_block.remote(b1), _collision_block.remote(b2)])
    assert m1["collisions"] == 0 and m2["collisions"] == 0
    assert m1["last"][0] == m2["first"][0] and m1["last"][1] != m2["first"][1]


def test_bigv_pagerank_matches_dense_path(ray_session):
    """End-to-end: string edges → big-V sharded PageRank (no O(V) driver
    array) vs the dense vocab-encoded CSR-pool PageRank on the SAME graph;
    per-vertex allclose(1e-6)-at-convergence parity."""
    from cuttana_ray.pipelines.bigv import hash_name_ids, pagerank_bigv
    from cuttana_ray.pipelines.csr import CSRPool
    from cuttana_ray.pipelines.graph import _build

    edges_str = _symmetrized_string_edges().materialize()

    # dense oracle: vocab-encoded graph, CSR broadcast mode
    g = _build(_transcript_edges_fixture(), None, deduped=True,
               canonical=True)
    pool = CSRPool(g, (np.arange(g.num_vertices) % 4).astype(np.int32), 4)
    dense = pool.pagerank(tol=1e-9, max_iters=200)
    pool.shutdown()
    name_to_rank = dict(zip(
        g.nodes["name"].to_pylist(),
        dense.values[g.nodes["node_id"].to_numpy(zero_copy_only=False)]))

    res, ds = pagerank_bigv(edges_str, num_shards=4, tol=1e-9,
                            max_iters=200)
    assert res.converged
    got = ds.to_pandas()  # small test graph — collection is test-only
    assert len(got) == g.num_vertices
    ids = hash_name_ids(pa.array(list(name_to_rank), pa.string()))
    want = dict(zip(ids.tolist(), name_to_rank.values()))
    g_ids = got["node_id"].to_numpy()
    g_rank = got["rank"].to_numpy()
    expect = np.array([want[i] for i in g_ids])
    np.testing.assert_allclose(g_rank, expect, atol=1e-6)
    # ranks sum to 1 (stochastic sanity)
    assert abs(g_rank.sum() - 1.0) < 1e-6


def test_bigv_components_match_union_find(ray_session):
    from cuttana_ray.pipelines.bigv import (
        HashShardPool,
        hash_encode_edges,
        hash_name_ids,
    )
    edges_str = _symmetrized_string_edges().materialize()
    enc = hash_encode_edges(edges_str).materialize()
    pool = HashShardPool(enc, 4)
    res, ds = pool.connected_components()
    pool.shutdown()
    assert res.converged
    got = ds.to_pandas()
    # union-find oracle over the raw pairs
    pairs = edges_str.to_pandas()
    sids = hash_name_ids(pa.array(pairs["src"], pa.string()))
    dids = hash_name_ids(pa.array(pairs["dst"], pa.string()))
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(sids.tolist(), dids.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label should be the min member id in both
    want = {v: find(v) for v in parent}
    got_map = dict(zip(got["node_id"], got["label"]))
    assert len(got_map) == len(want)
    for v, lbl in want.items():
        assert got_map[v] == lbl


def test_bigv_label_propagation_matches_numpy_oracle(ray_session):
    """Sharded-BSP LPA over hash ids vs a local NumPy oracle replaying the
    engine's exact semantics (per-(dst,label) weight sums → argmax, ties
    to smallest label) on the compacted hashed edge list."""
    from cuttana_ray.pipelines.bigv import HashShardPool, hash_encode_edges
    from cuttana_ray.pipelines.labelprop import argmax_labels

    edges_str = _symmetrized_string_edges().materialize()
    enc = hash_encode_edges(edges_str).materialize()
    pool = HashShardPool(enc, 4)
    res, ds = pool.label_propagation(max_iters=10)
    pool.shutdown()
    pdf = ds.to_pandas()
    got = dict(zip(pdf["node_id"], pdf["label"]))

    epdf = enc.to_pandas()
    src = epdf["src"].to_numpy()
    dst = epdf["dst"].to_numpy()
    w = epdf["weight"].to_numpy().astype(np.int64)
    ids = np.unique(np.concatenate([src, dst]))
    sidx = np.searchsorted(ids, src)
    didx = np.searchsorted(ids, dst)
    labels = ids.copy()                 # compact index → hash-id label
    for _ in range(10):
        lab = labels[sidx]
        order = np.lexsort((lab, didx))
        d2, l2, w2 = didx[order], lab[order], w[order]
        starts = np.concatenate(
            [[0], np.nonzero((d2[1:] != d2[:-1])
                             | (l2[1:] != l2[:-1]))[0] + 1])
        new = argmax_labels(d2[starts], l2[starts],
                            np.add.reduceat(w2, starts), labels)
        changed = int((new != labels).sum())
        labels = new
        if changed == 0:
            break
    want = dict(zip(ids.tolist(), labels.tolist()))
    assert got == want


def test_bigv_layout_invariance(ray_session):
    """Same scores regardless of block layout and shard count."""
    from cuttana_ray.pipelines.bigv import pagerank_bigv
    edges_str = _symmetrized_string_edges().materialize()
    _, ds1 = pagerank_bigv(edges_str, num_shards=3, tol=1e-10)
    _, ds2 = pagerank_bigv(edges_str.repartition(11), num_shards=5,
                           tol=1e-10, check_collisions=False)
    a = ds1.to_pandas().sort_values("node_id").reset_index(drop=True)
    b = ds2.to_pandas().sort_values("node_id").reset_index(drop=True)
    assert (a["node_id"] == b["node_id"]).all()
    np.testing.assert_allclose(a["rank"], b["rank"], atol=1e-9)


def test_flagship_bigv_end_to_end(tiny_transcripts, tmp_path):
    """The north-star-regime flagship: transcripts → hashed edges →
    HashShardPool PR/CC/LPA → per-shard parquet + lineage, resumable —
    and per-vertex parity with the DENSE flagship path (names → hash ids)."""
    from cuttana_ray import oracle
    from cuttana_ray.pipelines import checkpoint as ckpt
    from cuttana_ray.pipelines.bigv import hash_name_ids
    from cuttana_ray.pipelines.flagship import run_flagship_bigv
    from cuttana_ray.pipelines.graph import build_graph_from_transcripts

    workdir = str(tmp_path / "bigv_flagship")
    ds = rd.from_arrow(tiny_transcripts).repartition(5)
    lineage = run_flagship_bigv(ds, workdir, num_shards=4, lpa_iters=4)

    for stage in ("edges_hashed", "rank_bigv", "component_bigv",
                  "label_bigv", "tri_bigv"):
        assert ckpt.is_complete(f"{workdir}/{stage}"), stage
    assert lineage["edges_stage"]["collision_checked"] is True
    assert 0.0 < lineage["quality_hash_mod"]["cut_ratio"] <= 1.0
    assert lineage["pagerank"]["converged"]

    # dense-path oracle on the SAME transcripts, mapped through hash ids
    g = build_graph_from_transcripts(ds)
    et = g.edges.to_pandas()
    want = oracle.pagerank_oracle(et["src"].to_numpy(),
                                  et["dst"].to_numpy(),
                                  et["weight"].to_numpy(), g.num_vertices)
    comp_dense = oracle.components_oracle(et["src"].to_numpy(),
                                          et["dst"].to_numpy(),
                                          g.num_vertices)
    names = g.nodes.column("name")
    hids = hash_name_ids(names)

    got = ckpt.read_table(f"{workdir}/rank_bigv").to_pandas()
    assert lineage["num_vertices"] == g.num_vertices == len(got)
    by_id = dict(zip(got["node_id"], got["rank"]))
    dense_ids = g.nodes.column("node_id").to_numpy(zero_copy_only=False)
    got_vec = np.array([by_id[h] for h in hids])
    assert np.allclose(got_vec, want[dense_ids], atol=1e-6)

    # components: same partition structure (bijection between label sets)
    import pandas as pd
    gotc = ckpt.read_table(f"{workdir}/component_bigv").to_pandas()
    m = pd.DataFrame({"node_id": hids, "dense_comp": comp_dense[dense_ids]}) \
        .merge(gotc, on="node_id", validate="one_to_one")
    assert lineage["components"]["n_components"] \
        == m["dense_comp"].nunique() == m["component"].nunique()
    assert (m.groupby("dense_comp")["component"].nunique() == 1).all()
    assert (m.groupby("component")["dense_comp"].nunique() == 1).all()

    # triangles: per-vertex parity with the dense oracle through hash ids
    tri_pv = oracle.triangles_oracle(et["src"].to_numpy(),
                                     et["dst"].to_numpy(), g.num_vertices)[0]
    gott = ckpt.read_table(f"{workdir}/tri_bigv").to_pandas()
    tri_by_id = dict(zip(gott["node_id"], gott["tri_count"]))
    assert len(gott) == g.num_vertices
    assert all(tri_by_id[h] == tri_pv[i]
               for h, i in zip(hids, dense_ids))
    assert lineage["triangles"]["total"] == int(tri_pv.sum()) // 3

    # resume: rerun skips completed stages, lineage metrics identical
    lineage2 = run_flagship_bigv(ds, workdir, num_shards=4, lpa_iters=4)
    assert lineage2["num_vertices"] == lineage["num_vertices"]
    assert lineage2["quality_hash_mod"] == lineage["quality_hash_mod"]
    assert lineage2["components"]["n_components"] \
        == lineage["components"]["n_components"]


def test_hash_mod_quality_matches_local(ray_session):
    """Distributed id%k quality vs a local recount on the same table."""
    from cuttana_ray.pipelines.bigv import hash_encode_edges, hash_mod_quality
    enc = hash_encode_edges(_symmetrized_string_edges()).materialize()
    q = hash_mod_quality(enc, 4)
    pdf = enc.to_pandas()
    sp, dp = pdf["src"].to_numpy() % 4, pdf["dst"].to_numpy() % 4
    assert q["cut_count"] == int((sp != dp).sum()) // 2
    assert q["edge_count"] == len(pdf)  # directed-rows (2E) convention
    load = np.bincount(dp, minlength=4)
    assert q["edge_load_max"] == int(load.max())
    assert np.isclose(q["edge_balance"], load.max() / load.mean())


@pytest.mark.parametrize("threshold", [2, 10**9])
def test_hub_split_parity_all_algorithms(ray_session, threshold):
    """Vertex-cut hub path vs the plain dst-partitioned path: with
    threshold=2 almost every vertex is a 'hub' (all traffic flows through
    per-shard combiners); with threshold=1e9 none is. Both must agree with
    each other and with the dense oracles bit-for-bit / 1e-9."""
    from cuttana_ray.pipelines.bigv import HashShardPool, hash_encode_edges

    enc = hash_encode_edges(_symmetrized_string_edges()).materialize()

    def run(thr, k):
        # one pool at a time: two pools' CPU reservations would exceed the
        # 4-CPU test session and deadlock actor creation
        pool = HashShardPool(enc, k, hub_degree_threshold=thr)
        n_hubs = len(pool.hubs)
        try:
            _, pr = pool.pagerank(tol=1e-10, max_iters=60)
            pr = pr.to_pandas().sort_values("node_id").reset_index(drop=True)
            _, cc = pool.connected_components()
            cc = cc.to_pandas().sort_values("node_id").reset_index(drop=True)
            _, lp = pool.label_propagation(10)
            lp = lp.to_pandas().sort_values("node_id").reset_index(drop=True)
        finally:
            pool.shutdown()
        return n_hubs, pr, cc, lp

    n_hubs, p1, c1, l1 = run(threshold, 4)
    if threshold == 2:
        assert n_hubs > 50          # the split path is really exercised
    _, p0, c0, l0 = run(10**18, 3)  # no hubs: plain dst-partitioned path
    assert (p1["node_id"] == p0["node_id"]).all()
    assert np.allclose(p1["rank"], p0["rank"], atol=1e-9)
    assert (c1["label"].to_numpy() == c0["label"].to_numpy()).all()
    assert (l1["label"].to_numpy() == l0["label"].to_numpy()).all()


def test_discover_hubs_sorted_and_thresholded(ray_session):
    """Hub discovery: empty at an impossible threshold, sorted distinct
    ids at a tiny one, exact membership vs a local degree recount."""
    import cuttana_ray.pipelines.bigv as bigv
    enc = bigv.hash_encode_edges(_symmetrized_string_edges()).materialize()
    assert len(bigv.discover_hubs(enc, threshold=10**18)) == 0
    hubs = bigv.discover_hubs(enc, threshold=4)
    assert len(hubs) > 0 and (np.diff(hubs) > 0).all()
    pdf = enc.to_pandas()
    want = pdf.groupby("dst").size()
    want = np.sort(want[want >= 4].index.to_numpy())
    assert (hubs == want).all()


def test_bigv_pagerank_checkpoint_resume_bitexact(ray_session, tmp_path):
    """Interrupted big-V PageRank (per-SHARD checkpoints every 3 iters)
    resumed in a FRESH pool equals the uninterrupted run bit-for-bit, and
    a shard-count mismatch is rejected."""
    from cuttana_ray.pipelines.bigv import HashShardPool, hash_encode_edges

    enc = hash_encode_edges(_symmetrized_string_edges()).materialize()
    wd = str(tmp_path / "bsp")

    pool = HashShardPool(enc, 4)
    full, fds = pool.pagerank(tol=0.0, max_iters=9)
    fpdf = fds.to_pandas().sort_values("node_id").reset_index(drop=True)
    pool.shutdown()

    pool = HashShardPool(enc, 4)
    pool.pagerank(tol=0.0, max_iters=5, workdir=wd, checkpoint_every=3)
    pool.shutdown()
    # checkpoints land where (it+1) % 3 == 0; with max_iters=5 (it ≤ 4)
    # that is exactly iter_0002
    import os
    assert os.path.exists(f"{wd}/pagerank_bigv/iter_0002/MANIFEST.json")

    pool = HashShardPool(enc, 4)
    res, rds = pool.pagerank(tol=0.0, max_iters=9, workdir=wd, resume=True)
    rpdf = rds.to_pandas().sort_values("node_id").reset_index(drop=True)
    assert res.iterations == 9          # global count incl. pre-resume
    assert len(res.deltas) == 6         # only iters 3..8 re-ran
    pool.shutdown()

    assert (rpdf["node_id"] == fpdf["node_id"]).all()
    assert (rpdf["rank"].to_numpy() == fpdf["rank"].to_numpy()).all()

    pool = HashShardPool(enc, 3)
    try:
        with pytest.raises(ValueError, match="shards"):
            pool.pagerank(tol=0.0, max_iters=2, workdir=wd, resume=True)
    finally:
        pool.shutdown()


def test_ship_unship_roundtrip(ray_session):
    """Inline-vs-object-store message transport: small payloads pass
    through untouched, large ones round-trip via the object store, and
    _unship restores both shapes in order."""
    from cuttana_ray.pipelines.csr import (
        _INLINE_MAX_BYTES,
        _ship,
        _unship,
    )
    small = np.arange(10, dtype=np.float64)
    big = np.zeros(_INLINE_MAX_BYTES // 8 + 16, dtype=np.float64)
    tup = (small, None)
    assert _ship(small) is small
    assert _ship(tup) is tup
    shipped_big = _ship(big)
    assert isinstance(shipped_big, ray.ObjectRef)
    shipped_bigtup = _ship((big, small))
    assert isinstance(shipped_bigtup, ray.ObjectRef)
    out = _unship([(0, small), (1, shipped_big), (2, (None, small)),
                   (3, shipped_bigtup)])
    assert out[0][1] is small
    assert (out[1][1] == big).all()
    assert out[2][1][0] is None
    assert (out[3][1][0] == big).all() and (out[3][1][1] == small).all()


def test_bigv_label_loops_checkpoint_resume(ray_session, tmp_path):
    """CC and LPA per-shard checkpoint/resume: interrupted-then-resumed
    equals uninterrupted exactly (labels are integers — bit-exact)."""
    from cuttana_ray.pipelines.bigv import HashShardPool, hash_encode_edges

    enc = hash_encode_edges(_symmetrized_string_edges()).materialize()
    wd = str(tmp_path / "lbl")

    pool = HashShardPool(enc, 4)
    _, full_cc = pool.connected_components()
    fc = full_cc.to_pandas().sort_values("node_id").reset_index(drop=True)
    _, full_lp = pool.label_propagation(10)
    fl = full_lp.to_pandas().sort_values("node_id").reset_index(drop=True)
    # interrupted: 2 iterations with checkpoints every iteration
    pool.connected_components(max_iters=2, workdir=wd, checkpoint_every=1)
    pool.label_propagation(max_iters=2, workdir=wd, checkpoint_every=1)
    pool.shutdown()

    pool = HashShardPool(enc, 4)
    res_cc, r_cc = pool.connected_components(workdir=wd, resume=True)
    rc = r_cc.to_pandas().sort_values("node_id").reset_index(drop=True)
    res_lp, r_lp = pool.label_propagation(10, workdir=wd, resume=True)
    rl = r_lp.to_pandas().sort_values("node_id").reset_index(drop=True)
    pool.shutdown()

    assert (rc["label"].to_numpy() == fc["label"].to_numpy()).all()
    assert (rl["label"].to_numpy() == fl["label"].to_numpy()).all()
    assert res_cc.converged
    # resumed runs continued from iteration 2 rather than restarting
    assert len(res_cc.deltas) < 10


def test_pre_route_parity_and_single_copy(ray_session):
    """pre_route=True (one exchange, each shard sees only its rows) must
    equal pre_route=False (every shard scans the full table) exactly."""
    from cuttana_ray.pipelines.bigv import (
        HashShardPool,
        hash_encode_edges,
        route_edge_blocks,
    )
    enc = hash_encode_edges(_symmetrized_string_edges()).materialize()

    def run(pre_route):
        pool = HashShardPool(enc, 4, hub_degree_threshold=3,
                             pre_route=pre_route)
        try:
            _, pr = pool.pagerank(tol=1e-10, max_iters=40)
            pr = pr.to_pandas().sort_values("node_id").reset_index(drop=True)
            _, lp = pool.label_propagation(8)
            lp = lp.to_pandas().sort_values("node_id").reset_index(drop=True)
            return pool.V, pr, lp
        finally:
            pool.shutdown()

    v1, pr1, lp1 = run(True)
    v0, pr0, lp0 = run(False)
    assert v1 == v0
    assert (pr1["node_id"] == pr0["node_id"]).all()
    assert np.allclose(pr1["rank"], pr0["rank"], atol=1e-12)
    assert (lp1["label"].to_numpy() == lp0["label"].to_numpy()).all()

    # routing invariant: non-hub rows duplicated (roles 0+1), hub rows once
    from cuttana_ray.pipelines.bigv import discover_hubs
    hubs = discover_hubs(enc, 3)
    buckets = route_edge_blocks(enc, 4, hubs)
    routed_rows = sum(len(ray.get(r)) for b in buckets for r in b)
    pdf = enc.to_pandas()
    n_hub_rows = int(pdf["dst"].isin(hubs).sum())
    assert routed_rows == 2 * (len(pdf) - n_hub_rows) + n_hub_rows

def test_split_block_handles_mixed_part_blocks(ray_session):
    """groupby().map_groups gives NO one-group-per-block guarantee: the
    sort-shuffle's range partitioning can pack several parts into one
    output block (observed flakily as an IndexError inside sharded_iter
    when whole mixed blocks were routed by their first row's part).
    _block_parts + _split_block must split such a block exactly."""
    from cuttana_ray.pipelines.bigv import _block_parts, _split_block
    t = pa.table({
        "src": pa.array([10, 11, 12, 13, 14, 15], pa.int64()),
        "dst": pa.array([1, 2, 3, 1, 2, 3], pa.int64()),
        "weight": pa.array([1] * 6, pa.int64()),
        "part": pa.array([1, 2, 3, 1, 2, 3], pa.int64()),
        "role": pa.array([0] * 6, pa.int8()),
    })
    parts = ray.get(_block_parts.remote(t))
    assert parts.tolist() == [1, 2, 3]
    subs = [ray.get(r) for r in ray.get(_split_block.remote(t))]
    assert len(subs) == 3
    for p, sub in zip(parts, subs):
        assert (sub["part"].to_numpy(zero_copy_only=False) == p).all()
    assert sum(len(s) for s in subs) == len(t)
    # empty block → no parts
    assert len(ray.get(_block_parts.remote(t.slice(0, 0)))) == 0


@pytest.mark.parametrize("nblocks", [1, 2, 7, 40])
def test_route_edge_blocks_exact_per_shard_rows(ray_session, nblocks):
    """Per-shard EXACT row-multiset parity with the filter semantics the
    HashShard constructor implements, for several input block layouts
    (the mixed-part failure is layout-dependent): every shard p must
    receive precisely its non-hub in-edges (role 0, dst%k==p, dst not a
    hub) and its owned-src rows (role 1, src%k==p) — no more, no less."""
    from cuttana_ray.pipelines.bigv import (
        discover_hubs,
        hash_encode_edges,
        route_edge_blocks,
    )
    k = 4
    enc = hash_encode_edges(_symmetrized_string_edges()) \
        .repartition(nblocks).materialize()
    hubs = discover_hubs(enc, 3)
    pdf = enc.to_pandas()
    is_hub = pdf["dst"].isin(hubs).to_numpy()
    buckets = route_edge_blocks(enc, k, hubs)

    def multiset(df):
        return sorted(map(tuple, df[["src", "dst", "weight"]]
                          .to_numpy().tolist()))

    for p in range(k):
        got = [ray.get(r) for r in buckets[p]]
        got_t = pa.concat_tables(got) if got else None
        gdf = got_t.to_pandas() if got_t is not None else None
        want0 = pdf[(pdf["dst"] % k == p) & ~is_hub]
        want1 = pdf[pdf["src"] % k == p]
        if gdf is None:
            assert len(want0) + len(want1) == 0
            continue
        assert multiset(gdf[gdf["role"] == 0]) == multiset(want0)
        assert multiset(gdf[gdf["role"] == 1]) == multiset(want1)


def test_bigv_cuttana_assignment_quality_beats_hash(ray_session):
    """Round-3 verdict 'What's missing #2': big-V mode used to forfeit cut
    quality (hash mod only). On a planted 4-cluster graph whose locality
    the 63-bit id hashing destroys, the distributed-assignment Cuttana
    partition must recover cluster structure (cut far below the hash
    baseline) with the documented balance bound — and the driver never
    holds a dense partition vector (the assignment is consumed by join)."""
    import ray.data as rd

    from cuttana_ray.pipelines.bigv import (
        bigv_cuttana_assignment,
        hash_encode_edges,
        partition_quality_join,
        symmetrize_string_edges,
    )
    from cuttana_ray.stages.metrics import cut_metrics_mod

    rng = np.random.default_rng(31)
    k, per = 4, 50
    src, dst = [], []
    for c in range(k):
        names = [f"n{c}_{i}" for i in range(per)]
        # dense intra-cluster ring + chords
        for i in range(per):
            src.append(names[i]); dst.append(names[(i + 1) % per])
            src.append(names[i]); dst.append(names[(i + 7) % per])
            src.append(names[i]); dst.append(names[(i + 13) % per])
    # sparse inter-cluster edges
    for _ in range(20):
        a, b = rng.integers(0, k, 2)
        if a == b:
            b = (b + 1) % k
        src.append(f"n{a}_{rng.integers(0, per)}")
        dst.append(f"n{b}_{rng.integers(0, per)}")
    canon = rd.from_arrow(pa.table({
        "src": pa.array(src, pa.string()),
        "dst": pa.array(dst, pa.string()),
        "weight": pa.array(np.ones(len(src), np.int64))}))
    enc = hash_encode_edges(
        symmetrize_string_edges(canon)).materialize()

    assign, info = bigv_cuttana_assignment(enc, k=k)
    q = partition_quality_join(enc, assign, k)
    hq = cut_metrics_mod(enc, k)

    assert info["vertex_count"] == k * per
    # reference normalization: cut counts each undirected edge once over
    # DIRECTED endpoints (2E), so random ids sit near (1-1/k)/2 = 0.375
    assert hq["edge_cut_ratio"] > 0.3        # hashing destroyed locality
    assert q["edge_cut_ratio"] < 0.5 * hq["edge_cut_ratio"]
    assert q["balance_factor"] <= 1.3
    # every vertex assigned exactly once, via Dataset ops only
    assert assign.count() == k * per


def test_bigv_cuttana_routed_pool_parity_and_exchange(ray_session):
    """Round-4 verdict next-round #1: the Cuttana assignment ROUTES the
    BSP shards (HashShardPool(assignment=...)) — same per-vertex results
    as id%k routing for all three algorithms, while the planted-cluster
    cut quality shows up as strictly fewer boundary bytes per superstep
    (the reference's cut-quality-reduces-communication purpose,
    /root/reference/src/partition.rs:88-100, measured)."""
    import ray.data as rd

    from cuttana_ray.pipelines.bigv import (
        HashShardPool,
        bigv_cuttana_assignment,
        hash_encode_edges,
        symmetrize_string_edges,
    )

    rng = np.random.default_rng(11)
    k, per = 4, 60
    src, dst = [], []
    for c in range(k):
        names = [f"m{c}_{i}" for i in range(per)]
        for i in range(per):
            src.append(names[i]); dst.append(names[(i + 1) % per])
            src.append(names[i]); dst.append(names[(i + 11) % per])
            src.append(names[i]); dst.append(names[(i + 23) % per])
    for _ in range(25):
        a, b = rng.integers(0, k, 2)
        if a == b:
            b = (b + 1) % k
        src.append(f"m{a}_{rng.integers(0, per)}")
        dst.append(f"m{b}_{rng.integers(0, per)}")
    canon = rd.from_arrow(pa.table({
        "src": pa.array(src, pa.string()),
        "dst": pa.array(dst, pa.string()),
        "weight": pa.array(np.ones(len(src), np.int64))}))
    enc = hash_encode_edges(symmetrize_string_edges(canon)).materialize()
    assign, _ = bigv_cuttana_assignment(enc, k=k)
    assign = assign.materialize()

    def run(assignment):
        # low hub threshold so the hub vertex-cut path is exercised in
        # BOTH routings (hub ownership must follow the assignment too)
        pool = HashShardPool(enc, k, hub_degree_threshold=10,
                             assignment=assignment)
        try:
            _, pr_ds = pool.pagerank(tol=1e-12, max_iters=50)
            st = pool.exchange_stats()
            _, cc_ds = pool.connected_components()
            _, lp_ds = pool.label_propagation(max_iters=5)
            pr = pr_ds.to_pandas().sort_values("node_id")
            cc = cc_ds.to_pandas().sort_values("node_id")
            lp = lp_ds.to_pandas().sort_values("node_id")
        finally:
            pool.shutdown()
        return pr, cc, lp, st

    pr_h, cc_h, lp_h, st_h = run(None)
    pr_c, cc_c, lp_c, st_c = run(assign)
    assert st_h["routing"] == "hash_mod" and st_c["routing"] == "cuttana"
    assert (pr_h["node_id"].values == pr_c["node_id"].values).all()
    # per-dst in-edge sums are src-ordered in both routings; only the hub
    # partial fold order differs → allclose at float-epsilon scale
    np.testing.assert_allclose(pr_h["rank"].values, pr_c["rank"].values,
                               rtol=0, atol=1e-12)
    assert (cc_h["label"].values == cc_c["label"].values).all()
    assert (lp_h["label"].values == lp_c["label"].values).all()
    # the planted-cluster cut must materialize as less BSP communication
    assert st_c["bytes_per_round"] < st_h["bytes_per_round"]


def test_attach_edge_partitions_paths_agree_and_raise(ray_session):
    """Broadcast and join attach paths produce identical carried
    partitions; a missing endpoint raises (broadcast path) instead of
    silently defaulting an owner."""
    import ray.data as rd

    from cuttana_ray.pipelines.bigv import attach_edge_partitions

    enc = rd.from_arrow(pa.table({
        "src": pa.array([1, 2, 3, 4], pa.int64()),
        "dst": pa.array([2, 3, 4, 1], pa.int64()),
        "weight": pa.array([1, 1, 1, 1], pa.int64())}))
    assign = rd.from_arrow(pa.table({
        "node_id": pa.array([1, 2, 3, 4], pa.int64()),
        "partition": pa.array([0, 0, 1, 1], pa.int32())}))
    a = attach_edge_partitions(enc, assign).to_pandas() \
        .sort_values(["src", "dst"]).reset_index(drop=True)
    b = attach_edge_partitions(enc, assign, broadcast_max=0).to_pandas() \
        .sort_values(["src", "dst"]).reset_index(drop=True)
    assert (a["src_part"].values == b["src_part"].values).all()
    assert (a["dst_part"].values == b["dst_part"].values).all()
    assert list(a["src_part"]) == [0, 0, 1, 1]
    assert list(a["dst_part"]) == [0, 1, 1, 0]

    missing = rd.from_arrow(pa.table({
        "node_id": pa.array([1, 2, 3], pa.int64()),
        "partition": pa.array([0, 0, 1], pa.int32())}))
    with pytest.raises(Exception, match="missing from the assignment"):
        attach_edge_partitions(enc, missing).materialize()


def test_flagship_bigv_cuttana_routing_checkpoint_resume(tiny_transcripts,
                                                         tmp_path):
    """Round-4 verdict next-round #8: with routing='cuttana' the
    assignment lands as a manifest-gated stage (assignments_bigv) and a
    resumed run SKIPS the sequential streaming pass (file mtimes
    untouched) while reproducing identical quality/exchange lineage; the
    routed results match the hash-routing flagship per vertex."""
    import os

    from cuttana_ray.pipelines import checkpoint as ckpt
    from cuttana_ray.pipelines.flagship import run_flagship_bigv

    ds = rd.from_arrow(tiny_transcripts).repartition(5)
    wd_c = str(tmp_path / "bigv_cuttana")
    lin1 = run_flagship_bigv(ds, wd_c, num_shards=4, lpa_iters=4,
                             routing="cuttana")
    assert lin1["routing"] == "cuttana"
    assert lin1["exchange_stats"]["routing"] == "cuttana"
    assert lin1["quality_cuttana"]["edge_cut_ratio"] <= 1.0
    adir = f"{wd_c}/assignments_bigv"
    assert ckpt.is_complete(adir)
    mtimes = {f: os.path.getmtime(os.path.join(adir, f))
              for f in os.listdir(adir)}

    # force a re-run of the lifecycle (not the full-resume short-circuit)
    os.remove(f"{wd_c}/lineage.json")
    lin2 = run_flagship_bigv(ds, wd_c, num_shards=4, lpa_iters=4,
                             routing="cuttana")
    assert {f: os.path.getmtime(os.path.join(adir, f))
            for f in os.listdir(adir)} == mtimes   # stage skipped
    assert lin2["quality_cuttana"] == lin1["quality_cuttana"]
    assert lin2["exchange_stats"] == lin1["exchange_stats"]

    # hash-routing flagship on the same input: per-vertex rank parity
    wd_h = str(tmp_path / "bigv_hash")
    run_flagship_bigv(ds, wd_h, num_shards=4, lpa_iters=4)
    rc = ckpt.read_table(f"{wd_c}/rank_bigv").to_pandas() \
        .sort_values("node_id").reset_index(drop=True)
    rh = ckpt.read_table(f"{wd_h}/rank_bigv").to_pandas() \
        .sort_values("node_id").reset_index(drop=True)
    assert (rc["node_id"].values == rh["node_id"].values).all()
    np.testing.assert_allclose(rc["rank"].values, rh["rank"].values,
                               rtol=0, atol=1e-12)
