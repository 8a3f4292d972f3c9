"""Local fast-path parity: several iterative operators route small inputs
(≤ a documented edge-count gate) to a vectorized driver-side twin of their
distributed round loop — ~6 Ray exchanges per round is pure fixed cost on a
graph that fits one numpy array. These tests pin the ONLY thing that makes
the gates safe: on the same input, local (default at this size) and
distributed (forced via ``local_max_edges=0``) paths return IDENTICAL rows.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _sym_edges(V=60, E=200, seed=11, weighted=False):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, V, E).astype(np.int64)
    dst = rng.integers(0, V, E).astype(np.int64)
    keep = src != dst
    pairs = sorted({(a, b) for a, b in zip(src[keep], dst[keep])}
                   | {(b, a) for a, b in zip(src[keep], dst[keep])})
    s = np.array([a for a, _ in pairs], np.int64)
    d = np.array([b for _, b in pairs], np.int64)
    cols = {"src": pa.array(s), "dst": pa.array(d)}
    if weighted:
        cols["weight"] = pa.array(np.ones(len(s), np.int64))
    return pa.table(cols)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_louvain_shuffle_local_vs_distributed(ray_session):
    from cuttana_ray.pipelines.louvain import louvain_shuffle
    t = _sym_edges(weighted=True)
    # sparse 63-bit-ish ids: the exact regime the bigv query runs in
    off = np.int64(3) << 40
    t = pa.table({"src": pa.array(t["src"].to_numpy() * 977 + off),
                  "dst": pa.array(t["dst"].to_numpy() * 977 + off),
                  "weight": t["weight"]})
    ds = rd.from_arrow(t).repartition(5).materialize()
    local = _norm(louvain_shuffle(ds, max_rounds=4).to_pandas())
    dist = _norm(louvain_shuffle(ds, max_rounds=4,
                                 local_max_edges=0).to_pandas())
    pd.testing.assert_frame_equal(local, dist)


def test_pair_components_local_vs_distributed(ray_session):
    from cuttana_ray.functions.dedup import pair_components
    rng = np.random.default_rng(5)
    a = rng.integers(0, 200, 150).astype(np.int64)
    b = rng.integers(0, 200, 150).astype(np.int64)
    keep = a != b
    pairs = rd.from_arrow(pa.table({
        "doc_a": pa.array(np.minimum(a, b)[keep]),
        "doc_b": pa.array(np.maximum(a, b)[keep])})).repartition(4)
    local = _norm(pair_components(pairs).to_pandas())
    dist = _norm(pair_components(pairs, local_max_edges=0).to_pandas())
    pd.testing.assert_frame_equal(local, dist)


@pytest.mark.parametrize("t,p", [(1, 6), (3, 4)])
def test_hyperball_local_vs_distributed(ray_session, t, p):
    from cuttana_ray.pipelines.hyperball import hyperball
    ds = rd.from_arrow(_sym_edges(seed=7)).repartition(6).materialize()
    local = _norm(hyperball(ds, t, p).to_pandas())
    dist = _norm(hyperball(ds, t, p, local_max_edges=0).to_pandas())
    pd.testing.assert_frame_equal(local, dist)


def test_hyperball_harmonic_local_vs_distributed(ray_session):
    from cuttana_ray.pipelines.hyperball import hyperball_harmonic
    ds = rd.from_arrow(_sym_edges(seed=9)).repartition(4).materialize()
    local = _norm(hyperball_harmonic(ds, t_max=4, p=5).to_pandas())
    dist = _norm(hyperball_harmonic(ds, t_max=4, p=5,
                                    local_max_edges=0).to_pandas())
    pd.testing.assert_frame_equal(local, dist)


def test_hyperball_nf_local_vs_distributed(ray_session):
    from cuttana_ray.pipelines.hyperball import hyperball_nf
    ds = rd.from_arrow(_sym_edges(seed=13)).repartition(4).materialize()
    local = hyperball_nf(ds, t_max=4, p=5).to_pandas()
    dist = hyperball_nf(ds, t_max=4, p=5, local_max_edges=0).to_pandas()
    pd.testing.assert_frame_equal(local, dist)


def test_triangles_bigv_local_vs_distributed(ray_session):
    from cuttana_ray.pipelines.bigv import triangles_bigv
    t = _sym_edges(V=50, E=400, seed=17)
    # sparse hash-like ids, including a hub (vertex 0 gets extra edges)
    off = np.int64(5) << 40
    s = t["src"].to_numpy() * 1313 + off
    d = t["dst"].to_numpy() * 1313 + off
    ds = rd.from_arrow(pa.table({"src": pa.array(s), "dst": pa.array(d)})) \
        .repartition(5).materialize()
    lt_total, lt_ds = triangles_bigv(ds)
    dt_total, dt_ds = triangles_bigv(ds, local_max_edges=0)
    assert lt_total == dt_total
    pd.testing.assert_frame_equal(_norm(lt_ds.to_pandas()),
                                  _norm(dt_ds.to_pandas()))
    assert lt_total > 0  # fixture actually has triangles


def test_triangles_bigv_duplicate_edges_parity(ray_session):
    """A duplicated edge row multiplies the distributed hash join's
    triangle instances; the local twin must weigh identically."""
    from cuttana_ray.pipelines.bigv import triangles_bigv
    # triangle 1-2-3 with the (1,3) pair duplicated, plus pendants
    pairs = [(1, 2), (2, 1), (1, 3), (3, 1), (1, 3), (3, 1),
             (2, 3), (3, 2), (2, 4), (4, 2), (3, 5), (5, 3)]
    ds = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in pairs], pa.int64()),
        "dst": pa.array([b for _, b in pairs], pa.int64())})) \
        .repartition(3).materialize()
    lt_total, lt_ds = triangles_bigv(ds)
    dt_total, dt_ds = triangles_bigv(ds, local_max_edges=0)
    assert lt_total == dt_total == 2
    pd.testing.assert_frame_equal(_norm(lt_ds.to_pandas()),
                                  _norm(dt_ds.to_pandas()))


def test_triangles_bigv_chunked_parity(ray_session, monkeypatch):
    """Forcing a tiny wedge chunk must not change any count."""
    import cuttana_ray.pipelines.bigv as bigv
    t = _sym_edges(V=40, E=300, seed=23)
    ds = rd.from_arrow(t).repartition(4).materialize()
    base_total, base_ds = bigv.triangles_bigv(ds)
    base = _norm(base_ds.to_pandas())
    monkeypatch.setattr(bigv, "_TRI_CHUNK_WEDGES", 7)
    ch_total, ch_ds = bigv.triangles_bigv(ds)
    assert ch_total == base_total
    pd.testing.assert_frame_equal(_norm(ch_ds.to_pandas()), base)


def test_triangles_bigv_wedge_cap_falls_back(ray_session, monkeypatch):
    """Over the wedge ceiling the gate must route to the distributed
    join pipeline (and still agree)."""
    import cuttana_ray.pipelines.bigv as bigv
    ds = rd.from_arrow(_sym_edges(V=30, E=150, seed=29)) \
        .repartition(3).materialize()
    base_total, base_ds = bigv.triangles_bigv(ds, local_max_edges=0)
    monkeypatch.setattr(bigv, "_LOCAL_TRI_MAX_WEDGES", 1)
    capped_total, capped_ds = bigv.triangles_bigv(ds)
    assert capped_total == base_total
    pd.testing.assert_frame_equal(_norm(capped_ds.to_pandas()),
                                  _norm(base_ds.to_pandas()))
