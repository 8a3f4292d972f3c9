"""HyperBall (pipelines/hyperball.py): per-vertex approximate t-hop ball
sizes via per-vertex HLL counters iterated as register-wise max.

Oracle: exact t-hop reachable sets by brute-force BFS, then the IDENTICAL
HLL construction (same hash, same registers, same estimate math) — the
engine must be REGISTER-exact, not merely approximately right, because
the driver-contract SQL oracle replays the same construction."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def _random_sym_edges(V=80, E=240, seed=3):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, V, E).astype(np.int64)
    dst = rng.integers(0, V, E).astype(np.int64)
    keep = src != dst
    pairs = set(zip(src[keep].tolist(), dst[keep].tolist()))
    pairs |= {(b, a) for a, b in pairs}
    s = np.array([a for a, _ in sorted(pairs)], np.int64)
    d = np.array([b for _, b in sorted(pairs)], np.int64)
    return s, d


def _oracle_balls(src, dst, t, p):
    from cuttana_ray.functions.sketches import hll_idx_rank, murmur64_int
    from cuttana_ray.pipelines.hyperball import hll_estimate_rows
    verts = np.unique(np.concatenate([src, dst]))
    adj = {}
    for a, b in zip(src, dst):
        adj.setdefault(a, set()).add(b)
    m = 1 << p
    regs = np.zeros((len(verts), m), np.uint8)
    exact = np.zeros(len(verts), np.int64)
    for i, v in enumerate(verts):
        seen = {v}
        cur = {v}
        for _ in range(t):
            nxt = set()
            for u in cur:
                nxt |= adj.get(u, set())
            cur = nxt - seen
            seen |= nxt
        members = np.array(sorted(seen), np.int64)
        idx, rank = hll_idx_rank(murmur64_int(members), p)
        np.maximum.at(regs[i], idx, rank)
        exact[i] = len(seen)
    est = hll_estimate_rows(regs)
    return verts, np.floor(est + 0.5).astype(np.int64), exact


@pytest.mark.parametrize("t,p", [(1, 6), (3, 6), (2, 4)])
def test_hyperball_register_exact_vs_bruteforce(ray_session, t, p):
    from cuttana_ray.pipelines.hyperball import hyperball
    src, dst = _random_sym_edges()
    verts, want, exact = _oracle_balls(src, dst, t, p)
    edges = rd.from_arrow(pa.table({
        "src": pa.array(src), "dst": pa.array(dst)})).repartition(6)
    out = hyperball(edges, t, p).to_pandas().sort_values("node_id") \
        .reset_index(drop=True)
    assert (out["node_id"].to_numpy() == verts).all()
    assert (out["ball"].to_numpy() == want).all()
    # the sketch tracks the exact ball sizes (sanity on usefulness, not
    # only on replay-consistency): p=6 keeps mean rel err well under 15%
    if p == 6:
        err = np.abs(out["ball"].to_numpy() - exact) / np.maximum(exact, 1)
        assert err.mean() < 0.15


def test_hyperball_layout_invariance(ray_session):
    from cuttana_ray.pipelines.hyperball import hyperball
    src, dst = _random_sym_edges(V=50, E=150, seed=11)
    tbl = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    outs = []
    for nblocks in (1, 4, 13):
        ds = rd.from_arrow(tbl).repartition(nblocks)
        outs.append(hyperball(ds, 2, 6).to_pandas()
                    .sort_values("node_id").reset_index(drop=True))
    for other in outs[1:]:
        assert (outs[0]["node_id"] == other["node_id"]).all()
        assert (outs[0]["ball"] == other["ball"]).all()


def test_hyperball_t_monotone_and_saturating(ray_session):
    """Balls grow with t and saturate at the component size estimate."""
    from cuttana_ray.pipelines.hyperball import hyperball
    # path graph 0-1-2-...-9 (symmetrized)
    a = np.arange(9, dtype=np.int64)
    src = np.concatenate([a, a + 1])
    dst = np.concatenate([a + 1, a])
    edges = rd.from_arrow(pa.table({"src": pa.array(src),
                                    "dst": pa.array(dst)}))
    prev = None
    for t in (1, 2, 9):
        out = hyperball(edges, t, 6).to_pandas() \
            .sort_values("node_id").reset_index(drop=True)
        if prev is not None:
            assert (out["ball"].to_numpy() >= prev).all()
        prev = out["ball"].to_numpy()
    # at t=9 every vertex reaches the whole 10-vertex path; p=6 HLL on 10
    # elements lands in the linear-counting regime and is near-exact
    assert (np.abs(prev - 10) <= 1).all()


def test_hyperball_harmonic_matches_per_round_fold(ray_session):
    """hyperball_harmonic == the numpy fold of the per-round ball tables
    (same t_max, p) — pins the incremental join/accumulate logic to the
    independently-tested per-round estimates."""
    import pandas as pd

    from cuttana_ray.pipelines.hyperball import (
        hyperball,
        hyperball_harmonic,
    )
    src, dst = _random_sym_edges(V=60, E=180, seed=5)
    tbl = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    edges = rd.from_arrow(tbl).repartition(4)
    T, P = 3, 6
    balls = {}
    for t in range(T + 1):
        out = hyperball(rd.from_arrow(tbl).repartition(4), t, P) \
            .to_pandas().set_index("node_id")["ball"]
        balls[t] = out
    want = sum((balls[t] - balls[t - 1]) / t for t in range(1, T + 1))
    got = hyperball_harmonic(edges, T, P).to_pandas() \
        .set_index("node_id")["hharm"]
    got, want = got.sort_index(), want.sort_index().round(8)
    assert (got.index == want.index).all()
    assert np.allclose(got.to_numpy(), want.to_numpy(), atol=1e-8)
