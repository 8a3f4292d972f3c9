"""Louvain-style synchronous local-moving: engine parity vs an independent
per-vertex Python-loop oracle, planted-community recovery, modularity gain,
fixed-point/early-stop semantics, and the exact-int overflow guard."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from cuttana_ray.pipelines.graph import Graph
from cuttana_ray.pipelines.louvain import (
    louvain_local_moving,
    modularity_numpy,
    move_step,
)
from tests.test_graph_algos import arrays, graph_from_edges


def louvain_rounds_loop(src, dst, w, n, rounds):
    """Independent textbook implementation: per-vertex Python loop with
    dicts, integer scores — deliberately shares no code with the engine."""
    labels = list(range(n))
    kv = [0] * n
    for s, weight in zip(src, w):
        kv[s] += int(weight)
    w2 = sum(kv)
    adj = {}
    for s, d, weight in zip(src, dst, w):
        adj.setdefault(int(s), []).append((int(d), int(weight)))
    for _ in range(rounds):
        tot = [0] * n
        for v in range(n):
            tot[labels[v]] += kv[v]
        new = list(labels)
        moved = False
        for v in range(n):
            kin = {}
            for u, weight in adj.get(v, []):
                kin[labels[u]] = kin.get(labels[u], 0) + weight
            own = labels[v]
            stay = w2 * kin.get(own, 0) - kv[v] * (tot[own] - kv[v])
            best_c, best_s = None, None
            for c, k in sorted(kin.items()):
                if c == own:
                    continue
                s = w2 * k - kv[v] * tot[c]
                if best_s is None or s > best_s:
                    best_c, best_s = c, s
            if best_s is not None and best_s > stay:
                new[v] = best_c
                moved = True
        labels = new
        if not moved:
            break
    return np.array(labels, dtype=np.int64)


TWO_CLIQUES = (
    [(a, b) for a in range(8) for b in range(a + 1, 8)]
    + [(a, b) for a in range(8, 17) for b in range(a + 1, 17)]
    + [(0, 8), (3, 12)]
)


def test_planted_communities_recovered():
    g = graph_from_edges(TWO_CLIQUES, 17)
    res = louvain_local_moving(g, max_rounds=15)
    lab = res.values
    # each clique lands in one community, and the two differ
    assert len(set(lab[:8].tolist())) == 1
    assert len(set(lab[8:].tolist())) == 1
    assert lab[0] != lab[8]
    src, dst, w = arrays(g)
    q = modularity_numpy(src, dst, w, lab)
    q0 = modularity_numpy(src, dst, w, np.arange(17))
    assert q > q0 and q > 0.3


@pytest.mark.parametrize("blocks", [1, 5])
@pytest.mark.parametrize("rounds", [1, 3, 8])
def test_parity_vs_loop_oracle(blocks, rounds):
    rng = np.random.default_rng(7)
    n = 40
    pairs = sorted({(int(a), int(b)) for a, b in
                    rng.integers(0, n, size=(120, 2)) if a != b})
    und = [(min(a, b), max(a, b)) for a, b in pairs]
    und = sorted(set(und))
    weights = rng.integers(1, 6, size=len(und))
    src = [a for a, b in und] + [b for a, b in und]
    dst = [b for a, b in und] + [a for a, b in und]
    w = list(weights) + list(weights)
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64()),
                  "weight": pa.array(w, pa.int64())})
    nodes = pa.table({"node_id": np.arange(n, dtype=np.int64),
                      "name": [f"v{i}" for i in range(n)],
                      "kind": ["v"] * n})
    g = Graph(rd.from_arrow(t).repartition(blocks).materialize(), nodes, n)
    res = louvain_local_moving(g, max_rounds=rounds)
    expect = louvain_rounds_loop(src, dst, w, n, rounds)
    assert (res.values == expect).all()


def test_fixed_point_and_early_stop():
    g = graph_from_edges(TWO_CLIQUES, 17)
    res = louvain_local_moving(g, max_rounds=50)
    assert res.converged
    # a converged labeling is a fixed point of one more move_step
    src, dst, w = arrays(g)
    kv = np.zeros(17, dtype=np.int64)
    np.add.at(kv, src, w.astype(np.int64))
    order = np.lexsort((dst, src))
    lab = res.values
    again = move_step(src[order], lab[dst[order]], w[order].astype(np.int64),
                      lab, kv, int(kv.sum()))
    # move_step needs unique (v,c) rows; collapse duplicates first
    v2, c2 = src[order], lab[dst[order]]
    key = v2 * 1000 + c2
    uk, inv = np.unique(key, return_inverse=True)
    kin = np.zeros(len(uk), dtype=np.int64)
    np.add.at(kin, inv, w[order].astype(np.int64))
    again = move_step(uk // 1000, uk % 1000, kin, lab, kv, int(kv.sum()))
    assert (again == lab).all()


def test_shuffle_combine_parity():
    g = graph_from_edges(TWO_CLIQUES, 17, num_blocks=4)
    a = louvain_local_moving(g, max_rounds=6, combine="driver")
    b = louvain_local_moving(g, max_rounds=6, combine="shuffle")
    assert (a.values == b.values).all()


def test_float_path_matches_exact_far_from_ties():
    g = graph_from_edges(TWO_CLIQUES, 17)
    a = louvain_local_moving(g, max_rounds=8, exact=True)
    b = louvain_local_moving(g, max_rounds=8, exact=False)
    assert (a.values == b.values).all()


def test_overflow_guard():
    t = pa.table({"src": pa.array([0, 1], pa.int64()),
                  "dst": pa.array([1, 0], pa.int64()),
                  "weight": pa.array([2_000_000_000] * 2, pa.int64())})
    nodes = pa.table({"node_id": np.arange(2, dtype=np.int64),
                      "name": ["a", "b"], "kind": ["v", "v"]})
    g = Graph(rd.from_arrow(t).materialize(), nodes, 2)
    with pytest.raises(ValueError, match="too large"):
        louvain_local_moving(g, max_rounds=1)
    # float path accepts the same graph
    res = louvain_local_moving(g, max_rounds=2, exact=False)
    assert len(res.values) == 2


def two_level_loop(src, dst, w, n, r1, r2):
    """Independent two-level replay: loop phase 1, contract with plain
    dicts, loop phase 2 over the quotient, project back."""
    lab1 = louvain_rounds_loop(src, dst, w, n, r1)
    kv = [0] * n
    for s, weight in zip(src, w):
        kv[s] += int(weight)
    kv2 = [0] * n
    for v in range(n):
        kv2[lab1[v]] += kv[v]
    src2, dst2, w2l = [], [], []
    for s, d, weight in zip(src, dst, w):
        a, b = int(lab1[s]), int(lab1[d])
        if a != b:
            src2.append(a); dst2.append(b); w2l.append(int(weight))
    # phase 2 via the same loop but with explicit degrees: rebuild by
    # emitting kv2 through a degree-preserving trick — reimplement inline
    labels = list(range(n))
    w2 = sum(kv)
    adj = {}
    for s, d, weight in zip(src2, dst2, w2l):
        adj.setdefault(s, []).append((d, weight))
    for _ in range(r2):
        tot = [0] * n
        for v in range(n):
            tot[labels[v]] += kv2[v]
        new = list(labels)
        moved = False
        for v in range(n):
            kin = {}
            for u, weight in adj.get(v, []):
                kin[labels[u]] = kin.get(labels[u], 0) + weight
            own = labels[v]
            stay = w2 * kin.get(own, 0) - kv2[v] * (tot[own] - kv2[v])
            best_c, best_s = None, None
            for c, k in sorted(kin.items()):
                if c == own:
                    continue
                s = w2 * k - kv2[v] * tot[c]
                if best_s is None or s > best_s:
                    best_c, best_s = c, s
            if best_s is not None and best_s > stay:
                new[v] = best_c
                moved = True
        labels = new
        if not moved:
            break
    return np.array([labels[lab1[v]] for v in range(n)], dtype=np.int64)


# four 6-cliques; cliques (0,1) and (2,3) are pair-bridged densely,
# one weak edge across the pairs
def _clique(lo):
    return [(a, b) for a in range(lo, lo + 6) for b in range(a + 1, lo + 6)]


HIER = (_clique(0) + _clique(6) + _clique(12) + _clique(18)
        + [(0, 6), (1, 7), (2, 8), (3, 9)]
        + [(12, 18), (13, 19), (14, 20), (15, 21)]
        + [(5, 17)])


def test_two_level_merges_hierarchy():
    from cuttana_ray.pipelines.louvain import louvain_two_level
    g = graph_from_edges(HIER, 24)
    res1 = louvain_local_moving(g, max_rounds=8)
    res2 = louvain_two_level(g, rounds1=8, rounds2=8)
    src, dst, w = arrays(g)
    q1 = modularity_numpy(src, dst, w, res1.values)
    q2 = modularity_numpy(src, dst, w, res2.values)
    assert q2 >= q1 - 1e-12
    # the two pair-bridged halves end in internally-consistent communities
    lab = res2.values
    assert len(set(lab[:12].tolist())) <= 2
    assert len(set(lab[12:].tolist())) <= 2
    assert set(lab[:12].tolist()).isdisjoint(set(lab[12:].tolist()))


@pytest.mark.parametrize("blocks", [1, 4])
def test_two_level_parity_vs_loop(blocks):
    from cuttana_ray.pipelines.louvain import louvain_two_level
    rng = np.random.default_rng(11)
    n = 36
    pairs = sorted({(int(a), int(b)) for a, b in
                    rng.integers(0, n, size=(100, 2)) if a != b})
    und = sorted({(min(a, b), max(a, b)) for a, b in pairs})
    weights = rng.integers(1, 5, size=len(und))
    src = [a for a, b in und] + [b for a, b in und]
    dst = [b for a, b in und] + [a for a, b in und]
    w = list(weights) + list(weights)
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64()),
                  "weight": pa.array(w, pa.int64())})
    nodes = pa.table({"node_id": np.arange(n, dtype=np.int64),
                      "name": [f"v{i}" for i in range(n)],
                      "kind": ["v"] * n})
    g = Graph(rd.from_arrow(t).repartition(blocks).materialize(), nodes, n)
    res = louvain_two_level(g, rounds1=4, rounds2=4)
    expect = two_level_loop(src, dst, w, n, 4, 4)
    assert (res.values == expect).all()


@pytest.mark.parametrize("blocks", [4])
def test_shuffle_regime_parity(blocks):
    """louvain_shuffle (all-Dataset state, sparse ids) equals the
    broadcast path through an id mapping: run both on the same random
    graph, shuffle over ids offset by a large sparse stride."""
    from cuttana_ray.pipelines.louvain import louvain_shuffle
    rng = np.random.default_rng(23)
    n = 30
    und = sorted({(min(int(a), int(b)), max(int(a), int(b)))
                  for a, b in rng.integers(0, n, size=(80, 2)) if a != b})
    weights = rng.integers(1, 5, size=len(und))
    src = [a for a, b in und] + [b for a, b in und]
    dst = [b for a, b in und] + [a for a, b in und]
    w = list(weights) + list(weights)
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64()),
                  "weight": pa.array(w, pa.int64())})
    nodes = pa.table({"node_id": np.arange(n, dtype=np.int64),
                      "name": [f"v{i}" for i in range(n)],
                      "kind": ["v"] * n})
    g = Graph(rd.from_arrow(t).repartition(blocks).materialize(), nodes, n)
    dense = louvain_local_moving(g, max_rounds=4)

    # identical ids → labels must match row for row; the shuffle path's
    # vertex set IS the edge table's (isolated vertices don't exist in a
    # graph built from edges — the Graph fixture can still pad V)
    touched = sorted(set(src))
    out = louvain_shuffle(g.edges, max_rounds=4).to_pandas()
    got = out.set_index("node_id")["community"].to_dict()
    assert got == {v: int(dense.values[v]) for v in touched}

    # sparse non-dense ids (big-V shape): same partition up to relabeling,
    # and the move rule's tie-breaks track the NEW ids — so map ids, rerun
    # dense on remapped ids via the loop oracle, compare exactly
    stride = 10_000_019
    sp = pa.table({"src": pa.array([s * stride + 7 for s in src], pa.int64()),
                   "dst": pa.array([d * stride + 7 for d in dst], pa.int64()),
                   "weight": pa.array(w, pa.int64())})
    out2 = louvain_shuffle(rd.from_arrow(sp).repartition(blocks).materialize(),
                           max_rounds=4).to_pandas()
    # replay with the loop oracle over the mapped ids: ranks of sparse ids
    # preserve order (monotonic map), so tie-breaks agree with dense ids
    expect = louvain_rounds_loop(src, dst, w, n, 4)
    got2 = {int(r.node_id): int(r.community)
            for r in out2.itertuples(index=False)}
    assert got2 == {v * stride + 7: int(expect[v]) * stride + 7
                    for v in touched}
