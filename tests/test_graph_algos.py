"""Graph-algorithm parity: distributed (shuffle + CSR actor modes) vs NumPy
oracles; known-answer micro-graphs (FIXTURES.md §B.4)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from cuttana_ray import oracle
from cuttana_ray.pipelines.components import connected_components
from cuttana_ray.pipelines.csr import CSRPool
from cuttana_ray.pipelines.graph import Graph
from cuttana_ray.pipelines.labelprop import label_propagation
from cuttana_ray.pipelines.pagerank import pagerank
from cuttana_ray.pipelines.triangles import triangle_count


def graph_from_edges(und_edges: list[tuple[int, int]], n: int,
                     num_blocks: int = 3) -> Graph:
    """Undirected edge list → symmetrized Graph (weight 1 each direction)."""
    src = [a for a, b in und_edges] + [b for a, b in und_edges]
    dst = [b for a, b in und_edges] + [a for a, b in und_edges]
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64()),
                  "weight": pa.array([1] * len(src), pa.int64())})
    nodes = pa.table({"node_id": pa.array(np.arange(n, dtype=np.int64)),
                      "name": pa.array([f"v{i}" for i in range(n)]),
                      "kind": pa.array(["v"] * n)})
    return Graph(rd.from_arrow(t).repartition(num_blocks).materialize(),
                 nodes, n)


def arrays(g: Graph):
    et = g.edges.to_pandas()
    return (et["src"].to_numpy(), et["dst"].to_numpy(),
            et["weight"].to_numpy())


# -- known-answer micro-graphs ---------------------------------------------

K3 = [(0, 1), (1, 2), (0, 2)]
TWO_TRIANGLES = K3 + [(3, 4), (4, 5), (3, 5)]
K4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
STAR10 = [(0, i) for i in range(1, 11)]


@pytest.mark.parametrize("edges,n,total", [
    (K3, 3, 1), (TWO_TRIANGLES, 6, 2), (K4, 4, 4), (STAR10, 11, 0)])
def test_triangles_known_answers(edges, n, total):
    g = graph_from_edges(edges, n)
    res = triangle_count(g)
    assert res.total == total
    pv, tot = oracle.triangles_oracle(*arrays(g)[:2], n)
    assert tot == total
    assert (res.per_vertex == pv).all()


@pytest.mark.parametrize("edges,n", [
    (K3, 3), (TWO_TRIANGLES, 6), (K4, 4), (STAR10, 11)])
def test_triangles_join_mode_matches_broadcast(edges, n):
    """The distributed-join path (the 100-TB shape) and the vectorized
    broadcast-CSR path must agree exactly."""
    g = graph_from_edges(edges, n)
    rb = triangle_count(g, mode="broadcast")
    rj = triangle_count(g, mode="join")
    assert rb.total == rj.total
    assert (rb.per_vertex == rj.per_vertex).all()


def test_components_two_triangles():
    g = graph_from_edges(TWO_TRIANGLES, 6)
    res = connected_components(g)
    assert res.converged
    assert res.values.tolist() == [0, 0, 0, 3, 3, 3]


def test_pagerank_star_closed_form():
    """Star S10: closed-form stationary ranks (d=0.85)."""
    n = 11
    g = graph_from_edges(STAR10, n)
    res = pagerank(g, tol=1e-12)
    # center: r_c = (1-d)/n + 10·d·r_l, leaf: r_l = (1-d)/n + d·r_c/10
    # → r_c = (1+10d)/(n(1+d))
    d = 0.85
    rc = (1 + 10 * d) / (n * (1 + d))
    rl = (1 - d) / n + d * rc / 10
    assert res.values[0] == pytest.approx(rc, abs=1e-7)
    assert np.allclose(res.values[1:], rl, atol=1e-7)
    assert res.values.sum() == pytest.approx(1.0)


# -- random-graph parity: shuffle mode, oracle, CSR mode -------------------

@pytest.fixture(scope="module")
def er_graph():
    rng = np.random.default_rng(7)
    n = 200
    pairs = set()
    for _ in range(1000):
        a, b = rng.integers(0, n, 2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    return graph_from_edges(sorted(pairs), n), n


def test_pagerank_er_vs_oracle(er_graph, tiny_graph, tiny_graph_pandas):
    g, n = er_graph
    src, dst, w = arrays(g)
    res = pagerank(g)
    assert res.converged
    assert np.allclose(res.values,
                       oracle.pagerank_oracle(src, dst, w, n), atol=1e-6)
    # transcript-derived graph too (skewed weights)
    tsrc, tdst, tw = tiny_graph_pandas
    tres = pagerank(tiny_graph)
    assert np.allclose(
        tres.values,
        oracle.pagerank_oracle(tsrc, tdst, tw, tiny_graph.num_vertices),
        atol=1e-6)


def test_components_er_vs_oracle(er_graph):
    g, n = er_graph
    src, dst, _ = arrays(g)
    res = connected_components(g)
    assert (res.values == oracle.components_oracle(src, dst, n)).all()


def test_lpa_er_vs_oracle(er_graph):
    g, n = er_graph
    src, dst, w = arrays(g)
    res = label_propagation(g, max_iters=6)
    assert (res.values == oracle.lpa_oracle(src, dst, w, n, max_iters=6)).all()


def test_csr_mode_matches_shuffle_mode(er_graph):
    g, n = er_graph
    src, dst, w = arrays(g)
    part = (np.arange(n) % 4).astype(np.int32)
    pool = CSRPool(g, part, 4)
    try:
        pr = pool.pagerank()
        assert np.allclose(pr.values,
                           oracle.pagerank_oracle(src, dst, w, n), atol=1e-6)
        cc = pool.connected_components()
        assert (cc.values == oracle.components_oracle(src, dst, n)).all()
        lp = pool.label_propagation(max_iters=6)
        assert (lp.values
                == oracle.lpa_oracle(src, dst, w, n, max_iters=6)).all()
    finally:
        pool.shutdown()


def test_sharded_pagerank_matches_broadcast_and_oracle(er_graph):
    """BSP mode (rank state resident in shards, cut-edge-only exchange)
    must match the broadcast CSR mode and the NumPy oracle; vertices with
    no in-edges and multi-partition layouts included."""
    g, n = er_graph
    src, dst, w = arrays(g)
    part = (np.arange(n) % 4).astype(np.int32)
    pool = CSRPool(g, part, 4)
    try:
        shard = pool.pagerank_sharded()
        bcast = pool.pagerank()
        assert shard.converged
        assert np.allclose(shard.values, bcast.values, atol=1e-12)
        assert np.allclose(shard.values,
                           oracle.pagerank_oracle(src, dst, w, n), atol=1e-6)
        assert shard.values.sum() == pytest.approx(1.0, abs=1e-9)
    finally:
        pool.shutdown()
    # skewed ownership: one partition owns almost everything
    part2 = np.zeros(n, dtype=np.int32)
    part2[: n // 8] = 1
    pool2 = CSRPool(g, part2, 2)
    try:
        shard2 = pool2.pagerank_sharded()
        assert np.allclose(shard2.values,
                           oracle.pagerank_oracle(src, dst, w, n), atol=1e-6)
    finally:
        pool2.shutdown()


def test_sharded_components_and_lpa_match_broadcast(er_graph):
    g, n = er_graph
    src, dst, w = arrays(g)
    part = (np.arange(n) % 4).astype(np.int32)
    pool = CSRPool(g, part, 4)
    try:
        sh = pool.connected_components_sharded()
        bc = pool.connected_components()
        assert sh.converged
        assert (sh.values == bc.values).all()
        assert (sh.values == oracle.components_oracle(src, dst, n)).all()
        lp_sh = pool.label_propagation_sharded(max_iters=6)
        lp_bc = pool.label_propagation(max_iters=6)
        assert (lp_sh.values == lp_bc.values).all()
        assert (lp_sh.values
                == oracle.lpa_oracle(src, dst, w, n, max_iters=6)).all()
    finally:
        pool.shutdown()


def test_results_invariant_to_block_count(er_graph):
    """Per-vertex results must not depend on data layout (FIXTURES.md §B.3)."""
    g, n = er_graph
    src, dst, w = arrays(g)
    g2 = graph_from_edges(
        sorted({(min(a, b), max(a, b)) for a, b in zip(src, dst)}), n,
        num_blocks=11)
    assert np.allclose(pagerank(g).values, pagerank(g2).values, atol=1e-12)
    assert (connected_components(g).values
            == connected_components(g2).values).all()


def test_shuffle_combine_matches_driver_combine(er_graph):
    """Both combine strategies must agree (the shuffle groupby is the
    100-TB path, driver combine the small-V fast path)."""
    g, n = er_graph
    assert np.allclose(pagerank(g, combine="shuffle", max_iters=20).values,
                       pagerank(g, max_iters=20).values, atol=1e-9)
    assert (connected_components(g, combine="shuffle").values
            == connected_components(g).values).all()
    assert (label_propagation(g, combine="shuffle", max_iters=4).values
            == label_propagation(g, max_iters=4).values).all()


def test_auto_combine_respects_driver_state_cap(er_graph, monkeypatch):
    """combine="auto" must switch to the sharded shuffle path when V
    exceeds CUTTANA_MAX_DRIVER_STATE, with identical results."""
    from cuttana_ray.util import resolve_combine
    g, n = er_graph
    default = pagerank(g, max_iters=15).values
    cc_default = connected_components(g).values
    monkeypatch.setenv("CUTTANA_MAX_DRIVER_STATE", "1")
    assert resolve_combine("auto", n) == "shuffle"
    capped = pagerank(g, max_iters=15).values
    assert np.allclose(capped, default, atol=1e-12)
    assert (connected_components(g).values == cc_default).all()


# -- multi-source BFS ------------------------------------------------------

def _bfs_oracle(src, dst, n, seeds):
    import collections
    adj = collections.defaultdict(list)
    for a, b in zip(src, dst):
        adj[int(a)].append(int(b))
    dist = np.full(n, -1, dtype=np.int64)
    q = collections.deque()
    for s in seeds:
        dist[s] = 0
        q.append(int(s))
    while q:
        v = q.popleft()
        for w in adj[v]:
            if dist[w] == -1:
                dist[w] = dist[v] + 1
                q.append(w)
    return dist


def test_bfs_er_vs_oracle_both_combines(er_graph):
    from cuttana_ray.pipelines.bfs import bfs_distances
    g, n = er_graph
    src, dst, _ = arrays(g)
    seeds = np.array([0, 17, 101], dtype=np.int64)
    exp = _bfs_oracle(src, dst, n, seeds)
    for combine in ("driver", "shuffle"):
        res = bfs_distances(g, seeds, combine=combine)
        assert res.converged
        assert (res.values == exp).all()


def test_bfs_unreachable_component_stays_minus_one():
    from cuttana_ray.pipelines.bfs import bfs_distances
    g = graph_from_edges(TWO_TRIANGLES, 6)
    res = bfs_distances(g, [0])
    assert res.values.tolist() == [0, 1, 1, -1, -1, -1]


# -- weighted shortest paths -----------------------------------------------

def _dijkstra_oracle(src, dst, w, n, seeds):
    import heapq
    adj = [[] for _ in range(n)]
    for a, b, ww in zip(src, dst, w):
        adj[int(a)].append((int(b), int(ww)))
    dist = np.full(n, -1, dtype=np.int64)
    h = [(0, int(s)) for s in seeds]
    for _, s in h:
        dist[s] = 0
    heapq.heapify(h)
    while h:
        d, v = heapq.heappop(h)
        if d > dist[v]:
            continue
        for u, ww in adj[v]:
            nd = d + ww
            if dist[u] == -1 or nd < dist[u]:
                dist[u] = nd
                heapq.heappush(h, (nd, u))
    return dist


@pytest.fixture(scope="module")
def weighted_er_graph():
    """ER graph with random int64 weights 1..9, symmetrized."""
    rng = np.random.default_rng(11)
    n = 150
    pairs = {}
    for _ in range(700):
        a, b = rng.integers(0, n, 2)
        if a != b:
            pairs[(min(a, b), max(a, b))] = int(rng.integers(1, 10))
    src = [a for a, b in pairs] + [b for a, b in pairs]
    dst = [b for a, b in pairs] + [a for a, b in pairs]
    w = list(pairs.values()) * 2
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64()),
                  "weight": pa.array(w, pa.int64())})
    nodes = pa.table({"node_id": pa.array(np.arange(n, dtype=np.int64)),
                      "name": pa.array([f"v{i}" for i in range(n)]),
                      "kind": pa.array(["v"] * n)})
    return Graph(rd.from_arrow(t).repartition(4).materialize(), nodes, n), n


def test_sssp_er_vs_dijkstra_both_combines(weighted_er_graph):
    from cuttana_ray.pipelines.sssp import shortest_paths
    g, n = weighted_er_graph
    src, dst, w = arrays(g)
    seeds = np.array([0, 42, 99], dtype=np.int64)
    exp = _dijkstra_oracle(src, dst, w, n, seeds)
    for combine in ("driver", "shuffle"):
        res = shortest_paths(g, seeds, combine=combine)
        assert res.converged
        assert (res.values == exp).all(), combine


def test_sssp_unreachable_and_weighted_detour():
    """Path 0-1-2 with weights (5,5) plus a direct 0-2 edge of weight 20:
    the two-hop route (10) must beat the one-hop route (20); the isolated
    triangle stays -1."""
    from cuttana_ray.pipelines.sssp import shortest_paths
    und = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]
    wmap = {(0, 1): 5, (1, 2): 5, (0, 2): 20,
            (3, 4): 1, (4, 5): 1, (3, 5): 1}
    src = [a for a, b in und] + [b for a, b in und]
    dst = [b for a, b in und] + [a for a, b in und]
    w = [wmap[e] for e in und] * 2
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64()),
                  "weight": pa.array(w, pa.int64())})
    nodes = pa.table({"node_id": pa.array(np.arange(6, dtype=np.int64)),
                      "name": pa.array([f"v{i}" for i in range(6)]),
                      "kind": pa.array(["v"] * 6)})
    g = Graph(rd.from_arrow(t).repartition(3).materialize(), nodes, 6)
    res = shortest_paths(g, [0])
    assert res.values.tolist() == [0, 5, 10, -1, -1, -1]


# -- k-core ----------------------------------------------------------------

def _kcore_oracle(src, dst, n, k):
    alive = np.ones(n, dtype=bool)
    while True:
        deg = np.zeros(n, dtype=np.int64)
        m = alive[src] & alive[dst]
        np.add.at(deg, src[m], 1)
        new = alive & (deg >= k)
        if (new == alive).all():
            return alive
        alive = new


def test_kcore_er_vs_oracle_both_combines(er_graph):
    from cuttana_ray.pipelines.kcore import kcore
    g, n = er_graph
    src, dst, _ = arrays(g)
    for k in (2, 4, 7):
        exp = _kcore_oracle(src, dst, n, k).astype(np.int64)
        for combine in ("driver", "shuffle"):
            res = kcore(g, k, combine=combine)
            assert res.converged
            assert (res.values == exp).all(), (k, combine)


def test_kcore_known_answer_and_coreness():
    from cuttana_ray.pipelines.kcore import coreness, kcore
    # K4 with a pendant path: 4-clique is the 3-core; path peels away
    edges = K4 + [(3, 4), (4, 5)]
    g = graph_from_edges(edges, 6)
    assert kcore(g, 3).values.tolist() == [1, 1, 1, 1, 0, 0]
    assert coreness(g).tolist() == [3, 3, 3, 3, 1, 1]


# -- link prediction -------------------------------------------------------

def test_linkpred_er_vs_bruteforce(er_graph):
    from cuttana_ray.pipelines.linkpred import common_neighbor_pairs
    g, n = er_graph
    src, dst, _ = arrays(g)
    nbrs = [set() for _ in range(n)]
    for a, b in zip(src, dst):
        nbrs[a].add(int(b))
    exp = {}
    for a in range(n):
        for b in range(a + 1, n):
            cn = len(nbrs[a] & nbrs[b])
            if cn >= 2 and b not in nbrs[a]:
                exp[(a, b)] = (cn, cn / (len(nbrs[a]) + len(nbrs[b]) - cn))
    got = common_neighbor_pairs(g, min_common=2).to_pandas()
    got_map = {(int(r.a), int(r.b)): (int(r.common_neighbors), r.jaccard)
               for r in got.itertuples()}
    assert set(got_map) == set(exp)
    for k, (cn, j) in exp.items():
        assert got_map[k][0] == cn
        assert got_map[k][1] == j  # int/int double division, bit-exact


def test_linkpred_max_degree_skips_hub_witness():
    from cuttana_ray.pipelines.linkpred import common_neighbor_pairs
    # star: center witnesses all leaf pairs; capping below its degree
    # removes every candidate
    g = graph_from_edges(STAR10, 11)
    assert common_neighbor_pairs(g, min_common=1).count() == 45
    assert common_neighbor_pairs(g, min_common=1,
                                 max_degree=5).count() == 0


# -- personalized PageRank -------------------------------------------------

def _ppr_oracle(src, dst, w, n, p, d=0.85, iters=50):
    outw = np.zeros(n)
    np.add.at(outw, src, w.astype(np.float64))
    dang = outw == 0
    outw_safe = np.where(dang, 1.0, outw)
    r = p.copy()
    for _ in range(iters):
        g = np.zeros(n)
        np.add.at(g, dst, r[src] * w / outw_safe[src])
        r = (1 - d) * p + d * (g + r[dang].sum() * p)
    return r


def test_personalized_pagerank_vs_oracle(er_graph):
    from cuttana_ray.pipelines.pagerank import pagerank
    g, n = er_graph
    src, dst, w = arrays(g)
    p = np.zeros(n)
    seeds = np.array([3, 50, 120])
    p[seeds] = 1.0 / len(seeds)
    res = pagerank(g, tol=1e-12, max_iters=200, restart=p)
    exp = _ppr_oracle(src, dst, w.astype(np.float64), n, p, iters=300)
    assert res.converged
    assert np.allclose(res.values, exp, atol=1e-8)
    assert res.values.sum() == pytest.approx(1.0)
    # teleport localizes mass: seeds hold more rank than uniform PageRank
    uni = pagerank(g, tol=1e-12, max_iters=200)
    assert res.values[seeds].sum() > uni.values[seeds].sum()


# -- deterministic random walks ----------------------------------------------

def test_random_walks_match_local_replay(er_graph):
    from cuttana_ray.pipelines.randomwalk import (_M, _A, _OFFSET,
                                                  _STEP_MIX, random_walks)
    g, n = er_graph
    src, dst, _ = arrays(g)
    nbrs = [[] for _ in range(n)]
    for a, b in zip(src, dst):
        nbrs[a].append(int(b))
    nbrs = [sorted(x) for x in nbrs]

    L, MOD = 6, 13
    got = random_walks(g, walk_length=L, seed_mod=MOD).to_pandas() \
        .sort_values(["walk", "step"]).reset_index(drop=True)

    exp = []
    for w in range(0, n, MOD):
        cur = w
        exp.append((w, 0, cur))
        for t in range(1, L + 1):
            if nbrs[cur]:
                idx = ((w % _M) * _A + t * _STEP_MIX + _OFFSET) % _M \
                    % len(nbrs[cur])
                cur = nbrs[cur][idx]
            exp.append((w, t, cur))
    exp = sorted(exp)
    assert list(map(tuple, got[["walk", "step", "vertex"]].to_numpy())) \
        == exp


def test_random_walks_dead_end_stays_in_place():
    from cuttana_ray.pipelines.randomwalk import random_walks
    # directed edge table: 0 -> 1, and 1 has no outgoing edges
    t = pa.table({"src": pa.array([0], pa.int64()),
                  "dst": pa.array([1], pa.int64()),
                  "weight": pa.array([1], pa.int64())})
    nodes = pa.table({"node_id": pa.array([0, 1], pa.int64()),
                      "name": pa.array(["a", "b"]),
                      "kind": pa.array(["v", "v"])})
    g = Graph(rd.from_arrow(t).materialize(), nodes, 2)
    out = random_walks(g, walk_length=3, seed_mod=1).to_pandas() \
        .sort_values(["walk", "step"])
    w0 = out[out["walk"] == 0]["vertex"].tolist()
    assert w0 == [0, 1, 1, 1]  # walks into the dead end, then stays


# -- betweenness (sampled Brandes) ---------------------------------------------

def _brandes_oracle(src, dst, n, seeds):
    import collections
    adj = collections.defaultdict(list)
    for a, b in zip(src, dst):
        adj[int(a)].append(int(b))
    bc = np.zeros(n, dtype=np.float64)
    for s in seeds:
        S, P = [], collections.defaultdict(list)
        sigma = np.zeros(n); sigma[s] = 1.0
        dist = np.full(n, -1); dist[s] = 0
        q = collections.deque([int(s)])
        while q:
            v = q.popleft(); S.append(v)
            for w in adj[v]:
                if dist[w] == -1:
                    dist[w] = dist[v] + 1; q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]; P[w].append(v)
        delta = np.zeros(n)
        for w in reversed(S):
            for v in P[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
        delta[s] = 0.0
        bc += delta
    return bc


def test_betweenness_er_vs_brandes(er_graph):
    from cuttana_ray.pipelines.betweenness import betweenness
    g, n = er_graph
    src, dst, _ = arrays(g)
    seeds = np.array([0, 3, 101, 150], dtype=np.int64)
    got = betweenness(g, seeds)
    exp = _brandes_oracle(src, dst, n, seeds)
    assert np.allclose(got, exp, atol=1e-9)


def test_betweenness_chunking_matches_per_seed(er_graph, monkeypatch):
    """Multi-source chunking is a pure batching change: forcing tiny
    chunks (S=1 per-seed path and S=2) reproduces the one-chunk run to
    ~1 ulp — rows outside a column's frontier contribute exact 0.0 and
    the final accumulation stays sequential in seed order, so the only
    residual fp difference is the driver-combine's block ARRIVAL order
    (nondeterministic for any chunk size, including two identical runs)."""
    import importlib
    bw = importlib.import_module("cuttana_ray.pipelines.betweenness")
    g, n = er_graph
    seeds = np.array([0, 3, 101, 150], dtype=np.int64)
    full = bw.betweenness(g, seeds)
    for cells in (1, 2 * n):  # chunk size 1 and 2
        monkeypatch.setattr(bw, "_MAX_STATE_CELLS", cells)
        chunked = bw.betweenness(g, seeds)
        assert np.allclose(full, chunked, rtol=1e-12, atol=1e-12)


def _hits_oracle(src, dst, w, n, k):
    h = np.full(n, 1.0 / np.sqrt(n))
    a = np.zeros(n)
    for _ in range(k):
        a = np.zeros(n)
        np.add.at(a, dst, w * h[src])
        a /= np.sqrt((a * a).sum())
        h = np.zeros(n)
        np.add.at(h, src, w * a[dst])
        h /= np.sqrt((h * h).sum())
    return a, h


def test_hits_directed_er_vs_oracle():
    from cuttana_ray.pipelines.hits import hits
    rng = np.random.default_rng(13)
    n = 120
    pairs = {}
    for _ in range(600):
        a, b = rng.integers(0, n, 2)
        if a != b:
            pairs[(int(a), int(b))] = int(rng.integers(1, 6))
    src = np.array([p[0] for p in pairs], dtype=np.int64)
    dst = np.array([p[1] for p in pairs], dtype=np.int64)
    w = np.array(list(pairs.values()), dtype=np.int64)
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst),
                  "weight": pa.array(w)})
    edges = rd.from_arrow(t).repartition(4).materialize()
    res = hits(edges, n, max_iters=7, tol=0.0)
    ea, eh = _hits_oracle(src, dst, w.astype(np.float64), n, 7)
    assert res.iterations == 7
    assert np.allclose(res.authority, ea, atol=1e-12)
    assert np.allclose(res.hub, eh, atol=1e-12)
    # shuffle-combine parity (the huge-V path)
    res2 = hits(edges, n, max_iters=7, tol=0.0, combine="shuffle")
    assert np.allclose(res2.authority, res.authority, atol=1e-12)


def test_hits_star_known_answer():
    """Directed star u→{1..4}: u is the only hub, leaves equal authorities."""
    from cuttana_ray.pipelines.hits import hits
    t = pa.table({"src": pa.array([0, 0, 0, 0], pa.int64()),
                  "dst": pa.array([1, 2, 3, 4], pa.int64()),
                  "weight": pa.array([1, 1, 1, 1], pa.int64())})
    res = hits(rd.from_arrow(t).materialize(), 5, max_iters=10)
    assert res.converged
    assert np.isclose(res.hub[0], 1.0)
    assert np.allclose(res.hub[1:], 0.0)
    assert np.allclose(res.authority[1:], 0.5)
    assert np.isclose(res.authority[0], 0.0)


def test_betweenness_path_graph_exact():
    """Path 0-1-2-3, all seeds: center vertices carry the crossings."""
    from cuttana_ray.pipelines.betweenness import betweenness
    g = graph_from_edges([(0, 1), (1, 2), (2, 3)], 4)
    got = betweenness(g, [0, 1, 2, 3])
    # directed-pair dependencies: δ totals per vertex = 2·(pairs through it)
    assert np.allclose(got, [0.0, 4.0, 4.0, 0.0])


def test_eccentricity_known_answers():
    from cuttana_ray.pipelines.bfs import eccentricity
    # path 0-1-2-3 plus isolated-ish extra component {4,5}
    g = graph_from_edges([(0, 1), (1, 2), (2, 3), (4, 5)], 6)
    t = eccentricity(g, [0, 1, 4]).to_pandas()
    assert t["seed"].tolist() == [0, 1, 4]
    assert t["eccentricity"].tolist() == [3, 2, 1]
    assert t["n_reached"].tolist() == [4, 4, 2]


# -- strongly connected components ------------------------------------------

def _tarjan_oracle(src, dst, n):
    """Iterative Tarjan; labels = min vertex id per SCC."""
    import collections
    adj = collections.defaultdict(list)
    for a, b in zip(src, dst):
        adj[int(a)].append(int(b))
    index = np.full(n, -1); low = np.zeros(n, dtype=np.int64)
    on = np.zeros(n, dtype=bool); comp = np.full(n, -1, dtype=np.int64)
    stack, counter = [], [0]
    for root in range(n):
        if index[root] != -1:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]; counter[0] += 1
                stack.append(v); on[v] = True
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if index[w] == -1:
                    work[-1] = (v, i + 1)
                    work.append((w, 0)); recurse = True
                    break
                if on[w]:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop(); on[w] = False; members.append(w)
                    if w == v:
                        break
                m = min(members)
                for w in members:
                    comp[w] = m
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
    return comp


def _directed_ds(edge_list):
    src = pa.array([a for a, b in edge_list], pa.int64())
    dst = pa.array([b for a, b in edge_list], pa.int64())
    w = pa.array([1] * len(edge_list), pa.int64())
    return rd.from_arrow(pa.table({"src": src, "dst": dst, "weight": w})) \
        .repartition(3).materialize()


def test_scc_known_answer_cycle_plus_tail():
    from cuttana_ray.pipelines.scc import strongly_connected_components
    # cycle 0->1->2->0, tail 2->3->4, back-edge 4->3 makes {3,4} a SCC
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3)]
    res = strongly_connected_components(_directed_ds(edges), 5)
    assert res.converged
    assert res.values.tolist() == [0, 0, 0, 3, 3]


def test_scc_random_vs_tarjan():
    from cuttana_ray.pipelines.scc import strongly_connected_components
    rng = np.random.default_rng(41)
    n = 120
    edges = sorted({(int(a), int(b))
                    for a, b in rng.integers(0, n, (500, 2)) if a != b})
    src = np.array([a for a, b in edges]); dst = np.array([b for a, b in edges])
    res = strongly_connected_components(_directed_ds(edges), n)
    assert res.converged
    assert (res.values == _tarjan_oracle(src, dst, n)).all()


def test_mis_rounds_valid_maximal_and_layout_invariant():
    """MIS over a random graph: independence, maximality (no undecided
    after enough rounds, every removed vertex has an MIS neighbor), and
    bit-identical status across block layouts and duplicate edges."""
    import ray.data as rd

    from cuttana_ray.pipelines.mis import IN_MIS, REMOVED, mis_rounds

    rng = np.random.default_rng(13)
    n = 200
    a = rng.integers(0, n, 600)
    b = rng.integers(0, n, 600)
    keep = a != b
    a, b = a[keep], b[keep]
    sym_a = np.concatenate([a, b]).astype(np.int64)
    sym_b = np.concatenate([b, a]).astype(np.int64)
    nodes = np.arange(n, dtype=np.int64)   # include isolated vertices
    adj: dict[int, set] = {i: set() for i in range(n)}
    for x, y in zip(sym_a, sym_b):
        adj[int(x)].add(int(y))

    results = []
    for nblocks, dup in ((1, 1), (9, 1), (4, 3)):
        t = pa.table({"a": pa.array(np.tile(sym_a, dup)),
                      "b": pa.array(np.tile(sym_b, dup))})
        st = mis_rounds(rd.from_arrow(t).repartition(nblocks), n, nodes,
                        rounds=30)
        results.append(st)
    assert all((r == results[0]).all() for r in results[1:])

    st = results[0]
    assert (st != 0).all()                       # converged: all decided
    mis = set(np.flatnonzero(st == IN_MIS).tolist())
    for v in mis:
        assert not (adj[v] & mis)                # independent
    for v in np.flatnonzero(st == REMOVED):
        assert adj[int(v)] & mis                 # removal is justified


def test_csr_pool_save_load_identical_results(er_graph, tmp_path):
    """Persisted CSR index: load skips the edge shuffle AND the
    out-weight pass yet reproduces bit-identical PageRank (both modes)
    and min-label results."""
    g, n = er_graph
    part = (np.arange(n) % 4).astype(np.int32)
    pool = CSRPool(g, part, 4)
    d = str(tmp_path / "csr_index")
    try:
        pr0 = pool.pagerank()
        pool.save(d)
    finally:
        pool.shutdown()
    loaded = CSRPool.load(d)
    try:
        assert loaded.graph is None          # no Graph / shuffle involved
        pr1 = loaded.pagerank()
        assert pr1.iterations == pr0.iterations
        assert np.array_equal(pr1.values, pr0.values)
        src, dst, w = arrays(g)
        cc = loaded.connected_components()
        assert (cc.values == oracle.components_oracle(src, dst, n)).all()
        prs = loaded.pagerank_sharded()
        assert np.allclose(prs.values, pr0.values, atol=1e-9)
    finally:
        loaded.shutdown()


def test_quotient_graph_matches_pandas(ray_session):
    """quotient_graph (two label joins + groupby-sum) vs a local pandas
    contraction, including self-loop drop/keep and weight merging."""
    import pandas as pd

    from cuttana_ray.pipelines.graph import quotient_graph

    rng = np.random.default_rng(9)
    n, V = 4000, 60
    src = rng.integers(0, V, n)
    dst = rng.integers(0, V, n)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.integers(1, 5, len(src))
    edges = rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64()),
        "weight": pa.array(w, pa.int64())})).repartition(5)
    lbl = rng.integers(0, 7, V)
    labels = rd.from_arrow(pa.table({
        "vertex": pa.array(np.arange(V, dtype=np.int64)),
        "label": pa.array(lbl, pa.int64())})).repartition(3)

    pdf = pd.DataFrame({"lsrc": lbl[src], "ldst": lbl[dst], "weight": w})
    for drop in (True, False):
        got = quotient_graph(edges, labels, drop_self_loops=drop) \
            .to_pandas().sort_values(["lsrc", "ldst"]).reset_index(drop=True)
        want = pdf[pdf.lsrc != pdf.ldst] if drop else pdf
        want = want.groupby(["lsrc", "ldst"], as_index=False)["weight"] \
            .sum().sort_values(["lsrc", "ldst"]).reset_index(drop=True)
        assert len(got) == len(want)
        assert (got["lsrc"].to_numpy() == want["lsrc"].to_numpy()).all()
        assert (got["ldst"].to_numpy() == want["ldst"].to_numpy()).all()
        assert (got["weight"].to_numpy() == want["weight"].to_numpy()).all()


# -- k-truss ---------------------------------------------------------------

def _brute_ktruss(und_edges: list[tuple[int, int]], k: int
                  ) -> dict[tuple[int, int], int]:
    """Reference peel: surviving canonical edges -> final support."""
    es = {tuple(sorted(e)) for e in und_edges}
    while True:
        verts = {x for e in es for x in e}
        sup = {}
        for a, b in es:
            sup[(a, b)] = sum(
                1 for w in verts
                if w != a and w != b
                and tuple(sorted((a, w))) in es
                and tuple(sorted((b, w))) in es)
        drop = {e for e in es if sup[e] < k - 2}
        if not drop:
            return sup
        es -= drop


def _truss_dict(res) -> dict[tuple[int, int], int]:
    t = res.edges
    return {(int(a), int(b)): int(s) for a, b, s in
            zip(t["u"].to_pylist(), t["v"].to_pylist(),
                t["support"].to_pylist())}


def test_ktruss_known_answers():
    from cuttana_ray.pipelines.truss import ktruss

    # K4: every edge closes 2 triangles -> 4-truss is K4, 5-truss empty
    g = graph_from_edges(K4, 4)
    r4 = ktruss(g, 4)
    assert r4.converged
    assert _truss_dict(r4) == {e: 2 for e in K4}
    assert len(ktruss(g, 5).edges) == 0

    # two triangles sharing edge (1,2): the shared edge has support 2 but
    # peeling at k=4 cascades to empty (its triangles die in round 1)
    shared = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    g2 = graph_from_edges(shared, 4)
    r = ktruss(g2, 4)
    assert r.converged and len(r.edges) == 0 and r.rounds == 3

    # K4 + pendant edge: 3-truss drops only the pendant
    g3 = graph_from_edges(K4 + [(3, 4)], 5)
    assert set(_truss_dict(ktruss(g3, 3))) == set(K4)

    with pytest.raises(ValueError):
        ktruss(g, 2)


def test_ktruss_matches_brute_force_and_layout_invariant():
    from cuttana_ray.pipelines.truss import ktruss

    rng = np.random.default_rng(17)
    n = 40
    edges = sorted({tuple(sorted((int(a), int(b))))
                    for a, b in rng.integers(0, n, (220, 2)) if a != b})
    want = _brute_ktruss(edges, 4)
    got = [_truss_dict(ktruss(graph_from_edges(edges, n, num_blocks=nb), 4))
           for nb in (1, 5)]
    assert got[0] == want
    assert got[1] == want


# -- maximal matching ------------------------------------------------------

def _brute_matching(und_edges: list[tuple[int, int]], V: int,
                    seed: int = 0) -> set[tuple[int, int]]:
    """Independent oracle: with UNIQUE priorities, local-max parallel
    matching equals sequential greedy in descending priority order."""
    canon = sorted({tuple(sorted(e)) for e in und_edges})
    E = len(canon)
    pri = [(((a * V + b) * 48271 + seed) % 2147483647) * E + i
           for i, (a, b) in enumerate(canon)]
    taken: set[int] = set()
    out = set()
    for _, (a, b) in sorted(zip(pri, canon), reverse=True):
        if a not in taken and b not in taken:
            taken |= {a, b}
            out.add((a, b))
    return out


def test_maximal_matching_vs_greedy_and_properties():
    from cuttana_ray.pipelines.matching import maximal_matching

    rng = np.random.default_rng(23)
    n = 50
    edges = sorted({tuple(sorted((int(a), int(b))))
                    for a, b in rng.integers(0, n, (300, 2)) if a != b})
    want = _brute_matching(edges, n)
    per_layout = []
    for nb in (1, 4):
        res = maximal_matching(graph_from_edges(edges, n, num_blocks=nb))
        assert res.converged
        got = {(int(a), int(b)) for a, b in
               zip(res.edges["u"].to_pylist(), res.edges["v"].to_pylist())}
        per_layout.append((got, res.edges.to_pylist()))
        assert got == want
        # a matching: no vertex appears twice
        flat = [x for e in got for x in e]
        assert len(flat) == len(set(flat))
        # maximal: every input edge touches a matched vertex
        assert all(a in set(flat) or b in set(flat) for a, b in edges)
    assert per_layout[0][1] == per_layout[1][1]   # rounds identical too


def test_maximal_matching_micro():
    from cuttana_ray.pipelines.matching import maximal_matching

    # star: exactly one edge can match
    res = maximal_matching(graph_from_edges(STAR10, 11))
    assert len(res.edges) == 1 and res.converged
    # empty graph
    r0 = maximal_matching(graph_from_edges([], 3))
    assert len(r0.edges) == 0 and r0.converged


# -- Jones-Plassmann coloring ----------------------------------------------

def _brute_coloring(und_edges: list[tuple[int, int]], V: int,
                    seed: int = 0) -> np.ndarray:
    """Independent round-by-round JP replay (pure python sets)."""
    adj = {v: set() for v in range(V)}
    for a, b in und_edges:
        adj[a].add(b)
        adj[b].add(a)
    pri = [((v * 48271 + seed) % 2147483647) * V + v for v in range(V)]
    color = [-1] * V
    while any(c < 0 for c in color):
        sel = [v for v in range(V) if color[v] < 0
               and all(color[u] >= 0 or pri[u] < pri[v] for u in adj[v])]
        for v in sel:
            used = {color[u] for u in adj[v] if color[u] >= 0}
            c = 0
            while c in used:
                c += 1
            color[v] = c
    return np.array(color, dtype=np.int64)


def test_coloring_vs_brute_and_proper():
    from cuttana_ray.pipelines.coloring import greedy_coloring

    rng = np.random.default_rng(31)
    n = 60
    edges = sorted({tuple(sorted((int(a), int(b))))
                    for a, b in rng.integers(0, n, (400, 2)) if a != b})
    want = _brute_coloring(edges, n)
    for nb in (1, 4):
        res = greedy_coloring(graph_from_edges(edges, n, num_blocks=nb))
        assert res.converged
        assert (res.colors == want).all()
        assert all(res.colors[a] != res.colors[b] for a, b in edges)
    # isolated vertex (id n) gets color 0 in round 1
    res = greedy_coloring(graph_from_edges(edges, n + 1))
    assert res.colors[n] == 0


def test_coloring_micro():
    from cuttana_ray.pipelines.coloring import greedy_coloring

    rk3 = greedy_coloring(graph_from_edges(K3, 3))
    assert rk3.num_colors == 3 and sorted(rk3.colors.tolist()) == [0, 1, 2]
    rstar = greedy_coloring(graph_from_edges(STAR10, 11))
    assert rstar.num_colors == 2
    assert rstar.converged and rstar.rounds <= 3


# -- Katz centrality -------------------------------------------------------

def test_katz_matches_dense_numpy():
    from cuttana_ray.pipelines.katz import katz

    rng = np.random.default_rng(41)
    n = 30
    edges = sorted({tuple(sorted((int(a), int(b))))
                    for a, b in rng.integers(0, n, (120, 2)) if a != b})
    g = graph_from_edges(edges, n, num_blocks=3)
    # dense oracle over the symmetrized weighted adjacency
    et = g.edges.to_pandas()
    A = np.zeros((n, n))
    A[et["dst"], et["src"]] = et["weight"]   # x' = 1 + a * W^T-gather
    x = np.ones(n)
    for _ in range(6):
        x = 1.0 + 0.01 * (A @ x)
    got = katz(g, alpha=0.01, k=6)
    assert np.allclose(got, x, rtol=1e-12, atol=1e-12)
    got1 = katz(graph_from_edges(edges, n, num_blocks=1), alpha=0.01, k=6)
    assert np.allclose(got, got1, rtol=1e-12, atol=1e-12)


def test_trussness_vs_successive_brute_peels():
    from cuttana_ray.pipelines.truss import trussness

    rng = np.random.default_rng(53)
    n = 30
    edges = sorted({tuple(sorted((int(a), int(b))))
                    for a, b in rng.integers(0, n, (180, 2)) if a != b})
    want = {}
    for k in range(3, 20):
        surv = _brute_ktruss(edges, k)
        if not surv:
            break
        for e in surv:
            want[e] = k
    got = trussness(graph_from_edges(edges, n, num_blocks=3))
    gd = {(int(a), int(b)): int(t) for a, b, t in
          zip(got["u"].to_pylist(), got["v"].to_pylist(),
              got["trussness"].to_pylist())}
    assert len(gd) == len(edges)
    for e in edges:
        assert gd[e] == want.get(e, 2)
    # K4: every edge has trussness 4
    g4 = trussness(graph_from_edges(K4, 4))
    assert set(g4["trussness"].to_pylist()) == {4}


# -- minimum spanning forest (Boruvka) ---------------------------------------

def _kruskal(und_edges, n):
    """Independent oracle: Kruskal under the same (w, a, b) total order."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for w, a, b in sorted((w, min(a, b), max(a, b))
                          for a, b, w in und_edges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            out.append((a, b, w))
    return sorted(out)


def test_mst_matches_kruskal_weighted():
    from cuttana_ray.pipelines.mst import minimum_spanning_forest
    rng = np.random.default_rng(7)
    n = 60
    # random weighted graph w/ duplicate weights to exercise tie-breaks,
    # plus an isolated pair so the result is a forest
    pairs = set()
    while len(pairs) < 150:
        a, b = rng.integers(0, n - 2, size=2)
        if a != b:
            pairs.add((min(int(a), int(b)), max(int(a), int(b))))
    und = [(a, b, int(rng.integers(1, 6))) for a, b in sorted(pairs)]
    und.append((n - 2, n - 1, 3))
    src = [a for a, b, w in und] + [b for a, b, w in und]
    dst = [b for a, b, w in und] + [a for a, b, w in und]
    wgt = [w for a, b, w in und] * 2
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64()),
                  "weight": pa.array(wgt, pa.int64())})
    nodes = pa.table({"node_id": pa.array(np.arange(n, dtype=np.int64)),
                      "name": pa.array([f"v{i}" for i in range(n)]),
                      "kind": pa.array(["v"] * n)})
    g = Graph(rd.from_arrow(t).repartition(4).materialize(), nodes, n)
    got, rounds, converged = minimum_spanning_forest(g)
    assert converged and rounds <= 8
    exp = _kruskal(und, n)
    got_list = sorted(zip(got["a"].to_pylist(), got["b"].to_pylist(),
                          got["weight"].to_pylist()))
    assert got_list == exp


def test_mst_forest_on_disconnected_graph():
    from cuttana_ray.pipelines.mst import minimum_spanning_forest
    und = [(0, 1, 1), (1, 2, 1), (0, 2, 2), (3, 4, 5)]
    src = [a for a, b, w in und] + [b for a, b, w in und]
    dst = [b for a, b, w in und] + [a for a, b, w in und]
    wgt = [w for a, b, w in und] * 2
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64()),
                  "weight": pa.array(wgt, pa.int64())})
    nodes = pa.table({"node_id": pa.array(np.arange(5, dtype=np.int64)),
                      "name": pa.array([f"v{i}" for i in range(5)]),
                      "kind": pa.array(["v"] * 5)})
    g = Graph(rd.from_arrow(t).repartition(2).materialize(), nodes, 5)
    got, rounds, converged = minimum_spanning_forest(g)
    assert converged
    got_list = sorted(zip(got["a"].to_pylist(), got["b"].to_pylist(),
                          got["weight"].to_pylist()))
    assert got_list == [(0, 1, 1), (1, 2, 1), (3, 4, 5)]


def test_truncated_hitting_time_matches_dense_numpy():
    from cuttana_ray.pipelines.hitting import truncated_hitting_time

    rng = np.random.default_rng(47)
    n = 30
    edges = sorted({tuple(sorted((int(a), int(b))))
                    for a, b in rng.integers(0, n - 1, (100, 2)) if a != b})
    # vertex n-1 is deliberately isolated (stranded: h after round t = t)
    g = graph_from_edges(edges, n, num_blocks=3)
    targets = (np.arange(n) % 7) == 0
    k = 6
    # dense oracle: h = 0 on T, else 1 + P @ h, P = W / rowsum(W)
    et = g.edges.to_pandas()
    W = np.zeros((n, n))
    W[et["src"], et["dst"]] = et["weight"]
    s = W.sum(axis=1)
    h = np.zeros(n)
    for t in range(1, k + 1):
        nxt = 1.0 + (W @ h) / np.where(s > 0, s, 1.0)
        nxt[targets] = 0.0
        nxt[(s <= 0) & ~targets] = float(t)
        h = nxt
    got = truncated_hitting_time(g, targets, k=k)
    assert np.allclose(got, h, rtol=1e-12, atol=1e-12)
    assert got[n - 1] == float(k)
    assert np.all(got <= k + 1e-12) and np.all(got >= 0)
    got1 = truncated_hitting_time(graph_from_edges(edges, n, num_blocks=1),
                                  targets, k=k)
    assert np.allclose(got, got1, rtol=1e-12, atol=1e-12)


def test_truncated_hitting_time_unweighted_path():
    # path 0-1-2, target {0}: h(0)=0; k=4
    # h(1) = E[min(tau,4)]: from 1 -> 0 w.p. .5 (tau=1) or ->2 (then back)
    from cuttana_ray.pipelines.hitting import truncated_hitting_time

    g = graph_from_edges([(0, 1), (1, 2)], 3, num_blocks=1)
    targets = np.array([True, False, False])
    h = truncated_hitting_time(g, targets, k=4)
    # dense replay: h1=(0,1,1); h2=(0, 1+.5*1, 2); h3=(0, 1+.5*2, 1+1.5)
    # h4=(0, 1+.5*2.5, 1+2)
    assert np.allclose(h, [0.0, 2.25, 3.0])


def test_spectral_gap_matches_dense_numpy():
    from cuttana_ray.pipelines.spectral import spectral_gap

    rng = np.random.default_rng(61)
    n = 24
    edges = sorted({tuple(sorted((int(a), int(b))))
                    for a, b in rng.integers(0, n, (80, 2)) if a != b})
    g = graph_from_edges(edges, n, num_blocks=3)
    et = g.edges.to_pandas()
    W = np.zeros((n, n))
    W[et["src"], et["dst"]] = et["weight"]
    s = W.sum(axis=1)
    rs = np.where(s > 0, 1.0 / np.sqrt(np.where(s > 0, s, 1.0)), 0.0)
    N = rs[:, None] * W * rs[None, :]
    u = np.sqrt(np.maximum(s, 0.0))
    u = u / np.sqrt((u * u).sum())
    x = ((np.arange(n) % 7) + 1).astype(float)
    x = x - (u @ x) * u
    x = x / np.sqrt((x * x).sum())
    lam = 0.0
    for _ in range(8):
        y = N @ x
        y = y - (u @ y) * u
        lam = float(np.sqrt((y * y).sum()))
        x = y / lam
    got, _ = spectral_gap(g, k=8)
    assert abs(got - lam) < 1e-9
    # against the true spectrum: after 8 steps the estimate must lie
    # within the eigenvalue range (|λ2_true| >= estimate up to iteration
    # error; assert the loose bracket)
    ev = np.sort(np.abs(np.linalg.eigvalsh(N)))[::-1]
    assert got <= ev[0] + 1e-9
    got1, _ = spectral_gap(graph_from_edges(edges, n, num_blocks=1), k=8)
    assert abs(got - got1) < 1e-9


def test_simrank_matches_dense_numpy():
    from cuttana_ray.pipelines.simrank import simrank

    rng = np.random.default_rng(71)
    n = 18
    edges = sorted({tuple(sorted((int(a), int(b))))
                    for a, b in rng.integers(0, n, (50, 2)) if a != b})
    g = graph_from_edges(edges, n, num_blocks=3)
    A = np.zeros((n, n))
    for a, b in edges:
        A[a, b] = A[b, a] = 1.0
    d = A.sum(axis=1)
    dd = np.outer(d, d)
    safe = np.where(dd > 0, dd, 1.0)
    S = np.eye(n)
    for _ in range(3):
        nxt = 0.8 * (A @ S @ A.T) / safe
        nxt[dd <= 0] = 0.0
        np.fill_diagonal(nxt, 1.0)
        S = nxt
    got = simrank(g, c=0.8, k=3)
    assert np.allclose(got, S, rtol=1e-10, atol=1e-12)
    # diagonal pinned, symmetric, bounded
    assert np.allclose(np.diag(got), 1.0)
    assert np.allclose(got, got.T)
    assert got.min() >= 0 and got.max() <= 1 + 1e-12
    got1 = simrank(graph_from_edges(edges, n, num_blocks=1), c=0.8, k=3)
    assert np.allclose(got, got1, rtol=1e-12, atol=1e-12)


def test_simrank_gate_raises():
    import pytest as _pytest

    from cuttana_ray.pipelines.simrank import simrank
    g = graph_from_edges([(0, 1)], 3, num_blocks=1)
    with _pytest.raises(ValueError, match="dense-regime gate"):
        simrank(g, max_vertices=2)


def test_sweep_cut_matches_bruteforce():
    from cuttana_ray.pipelines.spectral import sweep_cut

    rng = np.random.default_rng(83)
    n = 20
    edges = sorted({tuple(sorted((int(a), int(b))))
                    for a, b in rng.integers(0, n, (60, 2)) if a != b})
    # ensure no isolated vertices (sweep assumes deg >= 1)
    touched = {v for e in edges for v in e}
    for v in range(n):
        if v not in touched:
            edges.append((v, (v + 1) % n))
    edges = sorted(set(edges))
    g = graph_from_edges(edges, n, num_blocks=3)
    score = rng.random(n)
    size, cut, vol, phi = sweep_cut(g, score)
    # brute force: for every prefix of the same ordering, recount
    deg = np.zeros(n, dtype=int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    order = np.lexsort((np.arange(n), -(score / deg)))
    tot = int(deg.sum())
    best = None
    for t in range(n - 1):
        S = set(order[:t + 1].tolist())
        c = sum(1 for a, b in edges if (a in S) != (b in S))
        v = int(deg[order[:t + 1]].sum())
        p = c / min(v, tot - v)
        if best is None or p < best[3] - 1e-15:
            best = (t + 1, c, v, p)
    assert (size, cut, vol) == best[:3]
    assert abs(phi - best[3]) < 1e-12


def test_ktruss_join_mode_matches_broadcast():
    """Round-3 verdict weak #2: the join formulation (the regime past
    BROADCAST_MAX_EDGES) must return exactly the broadcast path's edges
    and supports — peeling is confluent, so any divergence is a bug."""
    from cuttana_ray.pipelines.truss import ktruss

    rng = np.random.default_rng(23)
    n = 40
    edges = sorted({tuple(sorted((int(a), int(b))))
                    for a, b in rng.integers(0, n, (260, 2)) if a != b})
    g = graph_from_edges(edges, n, num_blocks=4)
    for k in (3, 4, 5):
        b = ktruss(g, k, mode="broadcast")
        j = ktruss(g, k, mode="join")
        assert b.converged and j.converged
        assert b.edges.to_pydict() == j.edges.to_pydict()
    # K4 fixture: known answer through the join path
    gk = graph_from_edges(K4, 4)
    rj = ktruss(gk, 4, mode="join")
    assert rj.converged and _truss_dict(rj) == {e: 2 for e in K4}
    assert len(ktruss(gk, 5, mode="join").edges) == 0


def test_trussness_join_mode_matches_broadcast():
    from cuttana_ray.pipelines.truss import trussness

    rng = np.random.default_rng(29)
    n = 30
    edges = sorted({tuple(sorted((int(a), int(b))))
                    for a, b in rng.integers(0, n, (180, 2)) if a != b})
    g = graph_from_edges(edges, n, num_blocks=3)
    b = trussness(g, max_k=8, mode="broadcast")
    j = trussness(g, max_k=8, mode="join")
    assert b.to_pydict() == j.to_pydict()
