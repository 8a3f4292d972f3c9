"""Key-aligned block layout + EWMA + within-group pair expansion
(cuttana_ray/stages/keyblocks.py) against pure-Python references, across
adversarial block layouts (runs straddling many blocks, empty blocks,
single-key inputs)."""

from __future__ import annotations

import itertools
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from cuttana_ray.util import safe_join


def _split_refs(k: np.ndarray, v: np.ndarray, cuts: list[int]):
    """Handcrafted sorted blocks with explicit boundaries (may be empty)."""
    import ray
    bounds = [0] + sorted(cuts) + [len(k)]
    tables = [pa.table({"k": k[a:b], "v": v[a:b]})
              for a, b in zip(bounds[:-1], bounds[1:])]
    return [ray.put(t) for t in tables]


LAYOUTS = [
    # (keys, cut points) — runs straddle 2, 3 and 4 blocks; empty blocks
    ([1, 1, 1, 1, 2, 2, 3], [2, 4, 4, 6]),
    ([5] * 10, [1, 2, 3, 3, 7]),                 # one key over 6 blocks
    ([1, 2, 3, 4, 5, 6], [1, 2, 3, 4, 5]),        # one row per block
    ([1, 1, 2, 2, 2, 3, 3, 9], [0, 2, 5, 5, 8]),  # empty head/tail blocks
    ([7], [0, 0, 1, 1]),
]


@pytest.mark.parametrize("keys,cuts", LAYOUTS)
def test_key_aligned_refs_rows_preserved_and_runs_whole(keys, cuts):
    import ray

    from cuttana_ray.stages.keyblocks import key_aligned_refs

    k = np.asarray(keys, dtype=np.int64)
    v = np.arange(len(k), dtype=np.int64) * 10
    refs = _split_refs(k, v, cuts)
    out = ray.get(key_aligned_refs(refs))
    rows = [(int(a), int(b)) for t in out
            for a, b in zip(t["k"].to_pylist(), t["v"].to_pylist())]
    assert Counter(rows) == Counter(zip(keys, v.tolist()))
    # every key's rows land wholly inside ONE output block
    owner = {}
    for i, t in enumerate(out):
        for kk in set(t["k"].to_pylist()):
            assert owner.setdefault(kk, i) == i, (kk, owner[kk], i)
    # and in-block order is still sorted by (k, v)
    for t in out:
        kk = np.asarray(t["k"].to_pylist())
        vv = np.asarray(t["v"].to_pylist())
        if len(kk) > 1:
            assert ((kk[1:] > kk[:-1]) |
                    ((kk[1:] == kk[:-1]) & (vv[1:] > vv[:-1]))).all()


def _ewma_ref(groups: dict[int, list[float]], alpha: float
              ) -> dict[int, list[float]]:
    out = {}
    for g, xs in groups.items():
        s = xs[0]
        acc = [s]
        for x in xs[1:]:
            s = alpha * x + (1.0 - alpha) * s
            acc.append(s)
        out[g] = acc
    return out


@pytest.mark.parametrize("nblocks", [1, 4, 17])
def test_grouped_ewma_bitwise_vs_sequential_reference(nblocks):
    import ray.data as rd

    from cuttana_ray.stages.keyblocks import grouped_ewma

    rng = np.random.default_rng(7)
    n = 600
    key = rng.integers(0, 12, n).astype(np.int64)
    order = np.arange(n, dtype=np.int64)
    rng.shuffle(order)
    val = np.round(rng.uniform(0.01, 500.0, n), 2)
    ds = rd.from_arrow(pa.table({"g": key, "o": order, "x": val})) \
        .repartition(nblocks)
    got = grouped_ewma(ds, "g", ["o"], "x", alpha=0.25,
                       keep=["g", "o"]).to_pandas() \
        .sort_values(["g", "o"]).reset_index(drop=True)
    idx = np.lexsort((order, key))
    groups: dict[int, list[float]] = {}
    for i in idx:
        groups.setdefault(int(key[i]), []).append(float(val[i]))
    ref = _ewma_ref(groups, 0.25)
    exp = np.concatenate([ref[g] for g in sorted(ref)])
    np.testing.assert_array_equal(got["ewma"].to_numpy(), exp)


def test_within_group_pairs_matches_itertools():
    import ray.data as rd

    from cuttana_ray.stages.keyblocks import within_group_pairs

    rng = np.random.default_rng(3)
    rows = {(int(g), int(i))
            for g, i in zip(rng.integers(0, 40, 500),
                            rng.integers(0, 25, 500))}
    g = np.array([r[0] for r in rows], np.int64)
    i = np.array([r[1] for r in rows], np.int64)
    ds = rd.from_arrow(pa.table({"g": g, "i": i})).repartition(9)
    got = within_group_pairs(ds, "g", "i").to_pandas()
    exp: Counter = Counter()
    by_g: dict[int, list[int]] = {}
    for gg, ii in rows:
        by_g.setdefault(gg, []).append(ii)
    for items in by_g.values():
        for a, b in itertools.combinations(sorted(items), 2):
            exp[(a, b)] += 1
    assert {(int(r.p1), int(r.p2)): int(r.co)
            for r in got.itertuples()} == dict(exp)


def test_drop_empty_blocks_unblocks_join_after_map_groups():
    import ray.data as rd

    from cuttana_ray.util import drop_empty_blocks

    ds = rd.from_items([{"k": i % 3, "v": i} for i in range(30)]) \
        .repartition(8)
    import pandas as pd

    def head(df: pd.DataFrame) -> pd.DataFrame:
        return df.iloc[:1][["k"]].assign(tag=1)

    right = drop_empty_blocks(
        ds.groupby("k").map_groups(head, batch_format="pandas"))
    j = safe_join(ds, right, join_type="inner", num_partitions=4, on=("k",))
    assert j.count() == 30


def _lev_ref(a: str, b: str) -> int:
    """Textbook O(len a × len b) DP."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_kernel_matches_textbook_dp():
    from cuttana_ray.functions.editdist import _codes, _lev

    rng = np.random.default_rng(11)
    cases = [("", ""), ("", "abc"), ("abc", ""), ("abc", "abc"),
             ("kitten", "sitting"), ("flaw", "lawn")]
    alpha = "abcde"
    for _ in range(60):
        la, lb = rng.integers(0, 20, 2)
        a = "".join(rng.choice(list(alpha), la))
        b = "".join(rng.choice(list(alpha), lb))
        cases.append((a, b))
    for a, b in cases:
        assert _lev(_codes(a), _codes(b)) == _lev_ref(a, b), (a, b)


@pytest.mark.parametrize("nblocks", [1, 5, 13])
def test_locf_fill_matches_pandas_ffill(nblocks):
    import pandas as pd
    import ray.data as rd

    from cuttana_ray.stages.keyblocks import locf_fill

    rng = np.random.default_rng(23)
    n = 400
    key = rng.integers(0, 9, n).astype(np.int64)
    order = np.arange(n, dtype=np.int64)
    rng.shuffle(order)
    val = rng.uniform(0, 100, n)
    val[rng.random(n) < 0.4] = np.nan
    t = pa.table({"g": key, "o": order,
                  "x": pa.array(val, pa.float64(), from_pandas=True)})
    ds = rd.from_arrow(t).repartition(nblocks)
    got = locf_fill(ds, "g", ["o"], "x", keep=["g", "o"]).to_pandas() \
        .sort_values(["g", "o"]).reset_index(drop=True)
    df = pd.DataFrame({"g": key, "o": order, "x": val}) \
        .sort_values(["g", "o"])
    exp = df.groupby("g")["x"].ffill().to_numpy()
    exp_sorted = df.assign(f=exp).sort_values(["g", "o"])["f"].to_numpy()
    np.testing.assert_array_equal(got["filled"].to_numpy(), exp_sorted)


@pytest.mark.parametrize("nblocks", [1, 7])
def test_trailing_range_agg_matches_bruteforce(nblocks):
    import ray.data as rd

    from cuttana_ray.stages.keyblocks import trailing_range_agg

    rng = np.random.default_rng(5)
    n = 500
    key = rng.integers(0, 8, n).astype(np.int64)
    # coarse times force plenty of equal-timestamp peers
    tt = rng.integers(0, 40, n).astype(np.int64) * 10
    val = rng.integers(-50, 100, n).astype(np.int64)
    rid = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"g": key, "t": tt, "x": val,
                                 "rid": rid})).repartition(nblocks)
    W = 35
    got = trailing_range_agg(ds, "g", "t", "x", width=W,
                             keep=["rid"]).to_pandas() \
        .sort_values("rid").reset_index(drop=True)
    exp_sum = np.empty(n, np.int64)
    exp_n = np.empty(n, np.int64)
    for i in range(n):
        m = (key == key[i]) & (tt >= tt[i] - W) & (tt <= tt[i])
        exp_sum[i] = val[m].sum()
        exp_n[i] = m.sum()
    np.testing.assert_array_equal(got["range_sum"].to_numpy(), exp_sum)
    np.testing.assert_array_equal(got["range_n"].to_numpy(), exp_n)


@pytest.mark.parametrize("nblocks", [1, 6])
def test_clamped_running_sum_matches_sequential(nblocks):
    import ray.data as rd

    from cuttana_ray.stages.keyblocks import clamped_running_sum

    rng = np.random.default_rng(17)
    n = 400
    key = rng.integers(0, 7, n).astype(np.int64)
    order = np.arange(n, dtype=np.int64)
    rng.shuffle(order)
    val = rng.integers(-80, 60, n).astype(np.int64)
    ds = rd.from_arrow(pa.table({"g": key, "o": order, "x": val})) \
        .repartition(nblocks)
    got = clamped_running_sum(ds, "g", ["o"], "x", floor=0,
                              keep=["g", "o"]).to_pandas() \
        .sort_values(["g", "o"]).reset_index(drop=True)
    idx = np.lexsort((order, key))
    exp = []
    state = {}
    for i in idx:
        g = int(key[i])
        s = max(state.get(g, 0) + int(val[i]), 0)
        state[g] = s
        exp.append(s)
    # exp is in (g, o) order already via lexsort
    np.testing.assert_array_equal(got["balance"].to_numpy(),
                                  np.array(exp, np.int64))


@pytest.mark.parametrize("nblocks", [1, 6])
def test_grouped_outliers_matches_numpy(nblocks):
    import ray.data as rd

    from cuttana_ray.stages.stats import grouped_outliers

    rng = np.random.default_rng(31)
    n = 500
    key = rng.integers(0, 10, n).astype(np.int64)
    rid = np.arange(n, dtype=np.int64)
    val = rng.uniform(0, 100, n)
    # plant obvious outliers
    val[rng.choice(n, 8, replace=False)] += 500
    ds = rd.from_arrow(pa.table({"g": key, "rid": rid, "x": val})) \
        .repartition(nblocks)
    got = grouped_outliers(ds, "g", "x", keep=["rid"]).to_pandas()
    exp = set()
    for g in np.unique(key):
        m = key == g
        if m.sum() < 2:
            continue
        mu, sd = val[m].mean(), val[m].std(ddof=1)
        exp.update(rid[m][val[m] > mu + 3 * sd].tolist())
    assert set(got["rid"].tolist()) == exp
    assert exp, "fixture should plant at least one outlier"


def test_grouped_ratio_means_matches_numpy():
    import ray.data as rd

    from cuttana_ray.stages.stats import grouped_ratio_means

    rng = np.random.default_rng(13)
    n = 400
    key = rng.integers(0, 5, n).astype(np.int64)
    val = rng.uniform(1.0, 50.0, n)
    ds = rd.from_arrow(pa.table({"g": key, "x": val})).repartition(7)
    got = grouped_ratio_means(ds, ["g"], "x").to_pandas() \
        .sort_values("g").reset_index(drop=True)
    for i, g in enumerate(np.unique(key)):
        m = key == g
        h = m.sum() / np.sum(1.0 / val[m])
        geo = np.exp(np.log(val[m]).sum() / m.sum())
        assert abs(got["harmonic"][i] - round(h, 6)) < 2e-6
        assert abs(got["geometric"][i] - round(geo, 6)) < 2e-6


@pytest.mark.parametrize("nblocks", [1, 5])
def test_grouped_linreg_matches_numpy(nblocks):
    import ray.data as rd

    from cuttana_ray.stages.stats import grouped_linreg

    rng = np.random.default_rng(19)
    n = 600
    key = rng.integers(0, 4, n).astype(np.int64)
    x = rng.uniform(0, 10, n)
    y = 3.0 * x + rng.normal(0, 1, n) + key
    ds = rd.from_arrow(pa.table({"g": key, "x": x, "y": y})) \
        .repartition(nblocks)
    got = grouped_linreg(ds, ["g"], "x", "y").to_pandas() \
        .sort_values("g").reset_index(drop=True)
    for i, g in enumerate(np.unique(key)):
        m = key == g
        slope, intercept = np.polyfit(x[m], y[m], 1)
        assert abs(got["slope"][i] - slope) < 1e-4
        assert abs(got["intercept"][i] - intercept) < 1e-4
        r = np.corrcoef(x[m], y[m])[0, 1]
        assert abs(got["r2"][i] - r * r) < 1e-4
