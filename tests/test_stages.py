"""Stage tests: edge extraction vs pandas ground truth, consecutive_pairs
block-boundary exactness, adjacency build, vocab determinism, sources."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from cuttana_ray.sources.adjacency import (
    adjacency_table,
    csr_batch,
    from_adjacency_list,
    read_adjacency_text,
)
from cuttana_ray.stages.edges import (
    bipartite_edges,
    build_adjacency,
    consecutive_pairs,
    dedup_weighted,
    symmetrize,
)
from cuttana_ray.stages.vocab import build_vocab, decode_column, encode_edges


def test_bipartite_edges_vs_pandas(tiny_transcripts):
    ds = rd.from_arrow(tiny_transcripts).repartition(7)
    got = bipartite_edges(ds, "conv_id", "tool", "conv:", "tool:").to_pandas()
    pdf = tiny_transcripts.to_pandas()
    exp = pdf.dropna(subset=["tool"]).groupby(["conv_id", "tool"]).size()
    exp = {("conv:" + c, "tool:" + t): n for (c, t), n in exp.items()}
    assert {(r.src, r.dst): r.weight for r in got.itertuples()} == exp


@pytest.mark.parametrize("num_blocks", [1, 3, 17])
def test_extractor_partials_sum_to_deduped(tiny_transcripts, num_blocks):
    """dedup=False partials must reproduce the deduped output exactly
    under one downstream dedup_weighted, at any block layout — the
    contract build_graph_from_events relies on to fuse its exchanges."""
    ds = rd.from_arrow(tiny_transcripts).repartition(num_blocks)
    for make in (
        lambda d, dd: bipartite_edges(d, "conv_id", "tool", "conv:",
                                      "tool:", dedup=dd),
        lambda d, dd: consecutive_pairs(d, "conv_id", ["turn_idx"], "role",
                                        dedup=dd),
    ):
        exp = make(ds, True).to_pandas()
        got = dedup_weighted(make(ds, False)).to_pandas()
        key = lambda df: {(r.src, r.dst): r.weight for r in df.itertuples()}
        assert key(got) == key(exp)


@pytest.mark.parametrize("num_blocks", [1, 3, 17])
def test_consecutive_pairs_exact_across_block_layouts(tiny_transcripts,
                                                      num_blocks):
    """lead() must be exact no matter how rows split into blocks."""
    ds = rd.from_arrow(tiny_transcripts).repartition(num_blocks)
    got = consecutive_pairs(ds, "conv_id", ["turn_idx"], "role").to_pandas()
    pdf = tiny_transcripts.to_pandas().sort_values(["conv_id", "turn_idx"])
    nxt = pdf.groupby("conv_id")["role"].shift(-1)
    exp = pdf.assign(nxt=nxt).dropna(subset=["nxt"]) \
        .groupby(["role", "nxt"]).size()
    assert {(r.src, r.dst): r.weight for r in got.itertuples()} \
        == {(a, b): n for (a, b), n in exp.items()}


def test_symmetrize_doubles_and_drops_self_loops():
    e = rd.from_arrow(pa.table({
        "src": ["a", "b", "c", "c"],
        "dst": ["b", "a", "c", "a"],
        "weight": [2, 3, 7, 1],
    }))
    got = symmetrize(e).to_pandas()
    d = {(r.src, r.dst): r.weight for r in got.itertuples()}
    # a-b merged to weight 5 both directions; self-loop c-c dropped
    assert d == {("a", "b"): 5, ("b", "a"): 5, ("a", "c"): 1, ("c", "a"): 1}


def test_dedup_weighted():
    e = rd.from_arrow(pa.table({
        "src": ["x", "x", "y"], "dst": ["y", "y", "x"],
        "weight": [1, 4, 2]}))
    got = dedup_weighted(e).to_pandas()
    assert {(r.src, r.dst): r.weight for r in got.itertuples()} \
        == {("x", "y"): 5, ("y", "x"): 2}


def test_vocab_deterministic_and_encode_roundtrip():
    e = rd.from_arrow(pa.table({
        "src": ["role:b", "conv:a"], "dst": ["tool:z", "role:b"],
        "weight": [1, 1]}))
    vocab = build_vocab(e)
    names = vocab["name"].to_pylist()
    assert names == sorted(names)           # id = sorted-name order
    assert vocab["kind"].to_pylist() == ["conv", "role", "tool"]
    enc = encode_edges(e, vocab).to_pandas()
    name_of = dict(zip(vocab["node_id"].to_pylist(), names))
    dec = {(name_of[r.src], name_of[r.dst]) for r in enc.itertuples()}
    assert dec == {("role:b", "tool:z"), ("conv:a", "role:b")}
    # decode_column attaches names
    back = decode_column(encode_edges(e, vocab), vocab, "src").to_pandas()
    assert set(back["src_name"]) == {"role:b", "conv:a"}


@pytest.mark.parametrize("num_blocks", [1, 5])
def test_build_adjacency_matches_edges(num_blocks):
    rng = np.random.default_rng(3)
    n = 60
    src = rng.integers(0, n, 500)
    dst = rng.integers(0, n, 500)
    keep = src != dst
    e = rd.from_arrow(pa.table({
        "src": pa.array(src[keep], pa.int64()),
        "dst": pa.array(dst[keep], pa.int64()),
        "weight": pa.array(np.ones(keep.sum(), dtype=np.int64)),
    })).repartition(num_blocks)
    sym = symmetrize(e)
    adj = build_adjacency(sym).to_pandas()
    sym_pdf = sym.to_pandas()
    exp = sym_pdf.groupby("src")["dst"].apply(lambda s: sorted(s))
    got = {r.vertex: list(r.nbrs) for r in adj.itertuples()}
    assert got == exp.to_dict()
    # weights aligned with neighbors
    w_exp = sym_pdf.sort_values(["src", "dst"]).groupby("src")["weight"] \
        .apply(list).to_dict()
    assert {r.vertex: list(r.nbr_weights) for r in adj.itertuples()} == w_exp
    assert (adj["degree"] == adj["nbrs"].map(len)).all()


def test_adjacency_text_source_roundtrip(tmp_path):
    p = tmp_path / "g.txt"
    p.write_text("0 1 2\n\n1 0\n2 0\n")
    ds = read_adjacency_text(str(p))
    rows = {r["vertex"]: list(r["nbrs"]) for r in ds.take_all()}
    assert rows == {0: [1, 2], 1: [0], 2: [0]}
    # comma delimiter
    p2 = tmp_path / "g.csv"
    p2.write_text("5, 6 ,7\n6,5\n7,5\n")
    ds2 = read_adjacency_text(str(p2), delimiter="comma")
    assert {r["vertex"]: list(r["nbrs"]) for r in ds2.take_all()} \
        == {5: [6, 7], 6: [5], 7: [5]}


def test_from_adjacency_list_roundtrip_and_empty():
    # mirrors /root/reference/tests/stream_tests.rs:4-19
    rows = [(0, [1, 2]), (1, [0]), (2, [0])]
    ds = from_adjacency_list(rows)
    got = [(r["vertex"], list(r["nbrs"])) for r in ds.take_all()]
    assert got == rows
    empty = from_adjacency_list([])
    assert empty.count() == 0


def test_csr_batch_zero_copy_layout():
    t = adjacency_table([(4, [1, 2, 3]), (5, []), (6, [9])])
    v, off, flat = csr_batch(t)
    assert v.tolist() == [4, 5, 6]
    assert off.tolist() == [0, 3, 3, 4]
    assert flat.tolist() == [1, 2, 3, 9]


@pytest.mark.parametrize("num_blocks", [1, 9])
def test_session_counts_exact_across_layouts(num_blocks):
    import ray.data as rd
    from cuttana_ray.stages.windows import session_counts
    ev = rd.read_parquet("/root/testdata/sf0.001/events.parquet") \
        .repartition(num_blocks)
    got = session_counts(ev, "user_id", "ts", ["event_id"],
                         gap_s=3600).to_pandas()
    pdf = rd.read_parquet("/root/testdata/sf0.001/events.parquet") \
        .to_pandas().sort_values(["user_id", "ts", "event_id"])
    exp = pdf.groupby("user_id")["ts"].apply(
        lambda s: 1 + (s.diff().dt.total_seconds() > 3600).sum())
    assert dict(zip(got["k"].astype(int), got["n_sessions"])) \
        == {int(k): int(v) for k, v in exp.items()}


def test_session_counts_equal_ts_across_blocks():
    """Regression: straddling rows sharing a timestamp must still merge —
    one key, all-equal timestamps, 8 blocks => exactly 1 session."""
    import ray.data as rd
    from cuttana_ray.stages.windows import session_counts
    n = 4000
    t = pa.table({
        "user_id": pa.array([7] * n, pa.int64()),
        "ts": pa.array([1_700_000_000_000_000] * n,
                       pa.timestamp("us")),
        "event_id": pa.array(list(range(n)), pa.int64()),
    })
    ds = rd.from_arrow(t).repartition(8)
    got = session_counts(ds, "user_id", "ts", ["event_id"],
                         gap_s=3600).to_pandas()
    assert len(got) == 1 and int(got["n_sessions"].iloc[0]) == 1
    # mixed: two keys, equal-ts runs plus one genuine gap for key 9
    base = 1_700_000_000_000_000
    t2 = pa.table({
        "user_id": pa.array([7] * 6 + [9] * 6, pa.int64()),
        "ts": pa.array([base] * 6 + [base] * 3
                       + [base + 10**13] * 3, pa.timestamp("us")),
        "event_id": pa.array(list(range(12)), pa.int64()),
    })
    got2 = session_counts(rd.from_arrow(t2).repartition(6), "user_id",
                          "ts", ["event_id"], gap_s=3600).to_pandas()
    assert dict(zip(got2["k"].astype(int), got2["n_sessions"])) \
        == {7: 1, 9: 2}


@pytest.mark.parametrize("num_blocks", [3, 7, 13])
def test_session_counts_numeric_keys_string_order_trap(num_blocks):
    """Regression: marker keys are stringified and "12" < "2" as strings —
    block pairing must never rely on cross-key string order. Keys 2 and 12
    with boundary-spanning runs and equal timestamps."""
    import ray.data as rd
    from cuttana_ray.stages.windows import session_counts
    base = 1_700_000_000_000_000
    rows = []
    # key 2: 40 events in two sessions; key 12: 40 events in one session
    for i in range(20):
        rows.append((2, base + i))
    for i in range(20):
        rows.append((2, base + 10**13 + i))
    for i in range(40):
        rows.append((12, base + i))
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
    })
    got = session_counts(rd.from_arrow(t).repartition(num_blocks),
                         "user_id", "ts", ["event_id"],
                         gap_s=3600).to_pandas()
    assert dict(zip(got["k"].astype(int), got["n_sessions"])) \
        == {2: 2, 12: 1}


def test_window_ops_handle_any_timestamp_unit():
    """Regression: timestamp[s]/[ms]/[ns] inputs must give the same windows
    and sessions as timestamp[us] (previously silently off by 1000x)."""
    import ray.data as rd
    from cuttana_ray.stages.windows import session_counts, tumbling_window_agg
    rng = np.random.default_rng(5)
    # ms-aligned so the ms representation is lossless
    us = (1_700_000_000_000_000
          + np.sort(rng.integers(0, 10**7, 200)) * 1000).astype("int64")
    base = pa.table({
        "user_id": pa.array(rng.integers(0, 5, 200), pa.int64()),
        "value": pa.array(rng.random(200)),
        "event_id": pa.array(np.arange(200), pa.int64()),
    })
    results_w, results_s = [], []
    for unit, scale in (("us", 1), ("ms", 1000), ("s", 10**6), ("ns", None)):
        vals = us * 1000 if scale is None else us // scale
        t = base.append_column("ts", pa.array(vals).cast(
            pa.timestamp(unit)))
        ds = rd.from_arrow(t)
        w = tumbling_window_agg(ds, "user_id", "ts", "value", 3600) \
            .to_pandas().sort_values(["user_id", "window_start"]) \
            .reset_index(drop=True)
        s = session_counts(ds, "user_id", "ts", ["event_id"],
                           gap_s=3600).to_pandas()
        results_w.append(w)
        results_s.append(s)
    for w in results_w[1:]:
        # s/ms truncation can move an event across a window edge only if
        # sub-second precision mattered; our fixture is second-aligned? No —
        # compare against the us result computed from the truncated values
        assert set(w.columns) == set(results_w[0].columns)
    # exact equality for ms and ns (no sub-ms info in fixture ts)
    pd_w_us = results_w[0]
    for idx in (1, 3):  # ms, ns
        assert results_w[idx].equals(pd_w_us)
        assert results_s[idx].equals(results_s[0])


def test_tumbling_window_agg_matches_pandas():
    import ray.data as rd
    from cuttana_ray.stages.windows import tumbling_window_agg
    ev = rd.read_parquet("/root/testdata/sf0.001/events.parquet")
    got = tumbling_window_agg(ev, "user_id", "ts", "value", 3600) \
        .to_pandas().sort_values(["user_id", "window_start"]) \
        .reset_index(drop=True)
    pdf = ev.to_pandas()
    pdf["window_start"] = pdf["ts"].astype("int64") // 10 ** 6 // 3600 * 3600
    exp = pdf.groupby(["user_id", "window_start"]) \
        .agg(value_sum=("value", "sum"), n_events=("value", "size")) \
        .reset_index().sort_values(["user_id", "window_start"]) \
        .reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["n_events"].to_numpy() == exp["n_events"].to_numpy()).all()
    assert np.allclose(got["value_sum"], exp["value_sum"].round(2),
                       atol=0.011)


def test_hopping_window_agg_matches_pandas():
    # oracle: explicit per-event window expansion in pandas
    import pandas as pd

    from cuttana_ray.stages.windows import hopping_window_agg

    rng = np.random.default_rng(6)
    n = 3000
    base = 1_700_000_000_000_000  # epoch µs
    df = pd.DataFrame({
        "k": rng.integers(0, 5, n),
        "ts": base + rng.integers(0, 6 * 3600 * 1_000_000, n),
        "v": rng.random(n).round(3),
    })
    width, hop = 3600, 900
    rows = []
    for _, r in df.iterrows():
        t = int(r["ts"])
        j_max = t // (hop * 1_000_000)
        j_min = (t - width * 1_000_000) // (hop * 1_000_000) + 1
        for j in range(j_min, j_max + 1):
            rows.append((r["k"], j * hop, r["v"]))
    exp = pd.DataFrame(rows, columns=["k", "window_start", "v"]) \
        .groupby(["k", "window_start"]) \
        .agg(value_sum=("v", "sum"), n_events=("v", "size")).reset_index()
    exp["value_sum"] = exp["value_sum"].round(2)

    t = pa.table({"k": pa.array(df["k"], pa.int64()),
                  "ts": pa.array(df["ts"], pa.int64()),
                  "v": pa.array(df["v"], pa.float64())})
    got = hopping_window_agg(rd.from_arrow(t).repartition(4),
                             "k", "ts", "v", width, hop).to_pandas()
    key = ["k", "window_start"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True).astype(
        {"k": "int64", "window_start": "int64", "n_events": "int64"})
    assert got[key].values.tolist() == exp[key].values.tolist()
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    # value_sum: partial-per-batch summation order can flip a value sitting
    # exactly on the x.xx5 rounding boundary by one cent vs the single-pass
    # pandas sum — allow that half-ulp-of-rounding difference
    assert np.allclose(got["value_sum"], exp["value_sum"], atol=0.011)
    # every event lands in exactly width/hop windows
    assert got["n_events"].sum() == n * (width // hop)


def test_asof_join_matches_duckdb():
    import duckdb
    import pandas as pd

    from cuttana_ray.stages.joins import asof_join

    rng = np.random.default_rng(13)
    nL, nR = 3000, 900
    L = pd.DataFrame({"k": rng.integers(0, 25, nL),
                      "ts": rng.integers(0, 10 ** 6, nL) * 1_000_000,
                      "lid": np.arange(nL, dtype=np.int64)})
    R = pd.DataFrame({"k": rng.integers(0, 25, nR),
                      "ts": rng.integers(0, 10 ** 6, nR) * 1_000_000,
                      "rv": rng.random(nR).round(4)}) \
        .drop_duplicates(["k", "ts"])
    lt = rd.from_arrow(pa.table({c: pa.array(L[c], pa.int64() if c != "rv"
                                             else pa.float64())
                                 for c in L})).repartition(6)
    rt = rd.from_arrow(pa.table({"k": pa.array(R.k, pa.int64()),
                                 "ts": pa.array(R.ts, pa.int64()),
                                 "rv": pa.array(R.rv, pa.float64())})) \
        .repartition(4)
    got = asof_join(lt, rt, "k", "ts", ["rv"],
                    left_cols=["k", "ts", "lid"]).to_pandas()
    con = duckdb.connect()
    con.register("L", L)
    con.register("R", R)
    exp = con.execute("""
        SELECT l.k, l.ts, l.lid, r.rv AS r_rv
        FROM L l ASOF LEFT JOIN R r ON l.k = r.k AND l.ts >= r.ts
    """).df()
    got = got.sort_values("lid").reset_index(drop=True)[sorted(got.columns)]
    exp = exp.sort_values("lid").reset_index(drop=True)[sorted(exp.columns)]
    pd.testing.assert_frame_equal(got.astype({"ts": "int64"}),
                                  exp.astype({"ts": "int64"}))


def test_asof_join_empty_right_all_null():
    import pandas as pd  # noqa: F401

    from cuttana_ray.stages.joins import asof_join

    lt = rd.from_arrow(pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                                 "ts": pa.array([10, 20, 30], pa.int64()),
                                 "lid": pa.array([0, 1, 2], pa.int64())}))
    rt = rd.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                 "ts": pa.array([], pa.int64()),
                                 "rv": pa.array([], pa.float64())}))
    out = asof_join(lt, rt, "k", "ts", ["rv"]).to_pandas()
    assert len(out) == 3 and out["r_rv"].isna().all()


def test_range_join_matches_brute_force():
    from cuttana_ray.stages.joins import range_join

    rng = np.random.default_rng(7)
    n_l, n_r = 5000, 300
    lt = pa.table({"id": np.arange(n_l),
                   "t": rng.integers(0, 100_000, n_l),
                   "k": rng.integers(0, 5, n_l)})
    s = rng.integers(0, 100_000, n_r)
    span = rng.integers(0, 5_000, n_r)
    rt = pa.table({"iv": np.arange(n_r), "s": s, "e": s + span,
                   "k": rng.integers(0, 5, n_r)})
    t = lt["t"].to_numpy()
    k = lt["k"].to_numpy()
    S, E, K = rt["s"].to_numpy(), rt["e"].to_numpy(), rt["k"].to_numpy()

    # keyed
    mask = (t[:, None] >= S[None, :]) & (t[:, None] <= E[None, :]) \
        & (k[:, None] == K[None, :])
    li, ri = np.nonzero(mask)
    out = range_join(rd.from_arrow(lt).repartition(6),
                     rd.from_arrow(rt).repartition(3),
                     left_t="t", right_start="s", right_end="e", key="k",
                     left_cols=["id"], right_cols=["iv"]).to_pandas()
    got = sorted(zip(out["id"].tolist(), out["r_iv"].tolist()))
    assert got == sorted(zip(li.tolist(), ri.tolist()))

    # unkeyed, and intervals spanning many buckets via a small forced width
    mask2 = (t[:, None] >= S[None, :]) & (t[:, None] <= E[None, :])
    li2, ri2 = np.nonzero(mask2)
    out2 = range_join(rd.from_arrow(lt).repartition(4), rd.from_arrow(rt),
                      left_t="t", right_start="s", right_end="e",
                      left_cols=["id"], right_cols=["iv"],
                      bucket_width=700).to_pandas()
    got2 = sorted(zip(out2["id"].tolist(), out2["r_iv"].tolist()))
    assert got2 == sorted(zip(li2.tolist(), ri2.tolist()))


def test_range_join_empty_sides():
    from cuttana_ray.stages.joins import range_join

    lt = rd.from_arrow(pa.table({"id": pa.array([1, 2], pa.int64()),
                                 "t": pa.array([5, 15], pa.int64())}))
    rt_empty = rd.from_arrow(pa.table({"iv": pa.array([], pa.int64()),
                                       "s": pa.array([], pa.int64()),
                                       "e": pa.array([], pa.int64())}))
    out = range_join(lt, rt_empty, left_t="t", right_start="s",
                     right_end="e", left_cols=["id"],
                     right_cols=["iv"]).to_pandas()
    assert len(out) == 0


def test_grouped_topk_and_anti_join_match_brute_force():
    import pandas as pd

    from cuttana_ray.stages.relational import anti_join, grouped_topk

    rng = np.random.default_rng(11)
    n = 8000
    df = pd.DataFrame({"g": rng.integers(0, 30, n),
                       "v": rng.integers(0, 200, n).astype(float),
                       "id": np.arange(n, dtype=np.int64)})
    ds = rd.from_pandas(df).repartition(7)

    got = grouped_topk(ds, ["g"], [("v", "descending"), ("id", "ascending")],
                       3).to_pandas()
    exp = df.sort_values(["g", "v", "id"],
                         ascending=[True, False, True]) \
        .groupby("g").head(3)
    key = lambda d: sorted(map(tuple, d[["g", "v", "id"]].values.tolist()))
    assert key(got) == key(exp)

    right = pd.DataFrame({"rk": np.arange(0, 30, 2, dtype=np.int64)})
    got2 = anti_join(ds, rd.from_pandas(right).repartition(3),
                     "g", "rk").to_pandas()
    exp2 = df[~df.g.isin(right.rk)]
    assert key(got2) == key(exp2)

    from cuttana_ray.stages.relational import semi_join
    got3 = semi_join(ds, rd.from_pandas(right).repartition(3),
                     "g", "rk").to_pandas()
    exp3 = df[df.g.isin(right.rk)]
    assert key(got3) == key(exp3)


def test_rollup_agg_matches_duckdb():
    import duckdb
    import pandas as pd

    from cuttana_ray.stages.relational import rollup_agg

    rng = np.random.default_rng(5)
    n = 6000
    df = pd.DataFrame({"a": rng.integers(0, 4, n),
                       "b": rng.integers(0, 9, n),
                       "v": rng.random(n)})
    got = rollup_agg(rd.from_pandas(df).repartition(5), ["a", "b"], "v") \
        .to_pandas()
    con = duckdb.connect()
    con.register("t", df)
    exp = con.sql("""SELECT a, b, SUM(v) AS value_sum, COUNT(*) AS n
                     FROM t GROUP BY ROLLUP(a, b)""").df()
    g = got.sort_values(["a", "b"]).reset_index(drop=True)[
        ["a", "b", "value_sum", "n"]]
    e = exp.sort_values(["a", "b"]).reset_index(drop=True)[
        ["a", "b", "value_sum", "n"]]
    assert len(g) == len(e)
    pd.testing.assert_frame_equal(g, e, check_dtype=False, atol=1e-9)

    from cuttana_ray.stages.relational import cube_agg
    got_c = cube_agg(rd.from_pandas(df).repartition(5), ["a", "b"], "v") \
        .to_pandas()
    exp_c = con.sql("""SELECT a, b, SUM(v) AS value_sum, COUNT(*) AS n
                       FROM t GROUP BY CUBE(a, b)""").df()
    gc = got_c.sort_values(["a", "b"]).reset_index(drop=True)[
        ["a", "b", "value_sum", "n"]]
    ec = exp_c.sort_values(["a", "b"]).reset_index(drop=True)[
        ["a", "b", "value_sum", "n"]]
    assert len(gc) == len(ec)
    pd.testing.assert_frame_equal(gc, ec, check_dtype=False, atol=1e-9)


def test_running_agg_matches_pandas_across_layouts():
    from cuttana_ray.stages.running import running_agg

    rng = np.random.default_rng(23)
    n = 5000
    df = pd.DataFrame({"k": rng.integers(0, 40, n),
                       "t": rng.permutation(n).astype(np.int64),
                       "v": rng.integers(-50, 100, n)})
    exp = df.sort_values(["k", "t"]).copy()
    exp["running_sum"] = exp.groupby("k")["v"].cumsum()
    exp["rn"] = exp.groupby("k").cumcount() + 1
    exp = exp[["k", "t", "running_sum", "rn"]] \
        .sort_values(["k", "t"]).reset_index(drop=True)

    t = pa.table({c: pa.array(df[c], pa.int64()) for c in df})
    for nblocks in (1, 3, 17):
        got = running_agg(rd.from_arrow(t).repartition(nblocks),
                          "k", ["t"], "v", keep=["k", "t"]).to_pandas()
        got = got.sort_values(["k", "t"]).reset_index(drop=True) \
            .astype({"running_sum": "int64", "rn": "int64"})
        pd.testing.assert_frame_equal(
            got, exp.astype({"running_sum": "int64", "rn": "int64"}))


def test_running_agg_single_key_many_blocks_carry_chain():
    """One key spanning every block: the carry chain must accumulate
    through every block summary (head/interior/tail), not just adjacent
    pairs."""
    from cuttana_ray.stages.running import running_agg

    n = 4000
    t = pa.table({"k": pa.array(np.zeros(n, np.int64)),
                  "t": pa.array(np.arange(n, dtype=np.int64)),
                  "v": pa.array(np.ones(n, np.int64))})
    got = running_agg(rd.from_arrow(t).repartition(16),
                      "k", ["t"], "v", keep=["t"]).to_pandas() \
        .sort_values("t").reset_index(drop=True)
    assert got["running_sum"].tolist() == list(range(1, n + 1))
    assert got["rn"].tolist() == list(range(1, n + 1))


# -- grouped second-moment statistics ---------------------------------------

def test_grouped_moments_vs_numpy():
    from cuttana_ray.stages.stats import grouped_moments
    rng = np.random.default_rng(3)
    n = 5000
    keys = rng.integers(0, 4, n)
    x = rng.normal(10, 3, n)
    y = 2.5 * x + rng.normal(0, 5, n)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "x": pa.array(x), "y": pa.array(y)})).repartition(7)
    got = grouped_moments(ds, ["k"], "x", "y").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    for i, k in enumerate(sorted(set(keys.tolist()))):
        m = keys == k
        xs, ys = x[m], y[m]
        row = got.iloc[i]
        assert row["k"] == k and row["n"] == m.sum()
        assert np.isclose(row["mean_x"], xs.mean(), rtol=1e-12)
        assert np.isclose(row["sd_x"], xs.std(ddof=1), rtol=1e-9)
        assert np.isclose(row["sd_y"], ys.std(ddof=1), rtol=1e-9)
        assert np.isclose(row["covar"], np.cov(xs, ys, ddof=1)[0, 1],
                          rtol=1e-9)
        assert np.isclose(row["corr"], np.corrcoef(xs, ys)[0, 1],
                          rtol=1e-9)


def test_grouped_moments_singleton_group_null_moments():
    from cuttana_ray.stages.stats import grouped_moments
    ds = rd.from_arrow(pa.table({
        "k": pa.array([0, 1, 1], pa.int64()),
        "x": pa.array([1.0, 2.0, 4.0]),
        "y": pa.array([5.0, 6.0, 2.0])}))
    got = grouped_moments(ds, ["k"], "x", "y").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert got.loc[0, "n"] == 1 and np.isnan(got.loc[0, "sd_x"])
    assert got.loc[1, "n"] == 2
    assert np.isclose(got.loc[1, "corr"], -1.0)


# -- whole-row set operations ------------------------------------------------

def test_set_ops_vs_python_sets():
    from cuttana_ray.stages.relational import (except_distinct,
                                               intersect_distinct,
                                               union_distinct)
    rng = np.random.default_rng(5)
    mk = lambda n, seed_off: pa.table({
        "a": pa.array(rng.integers(0, 20, n), pa.int64()),
        "b": pa.array([f"s{v}" for v in rng.integers(0, 5, n)])})
    lt, rt = mk(400, 0), mk(300, 1)
    left = rd.from_arrow(lt).repartition(5)
    right = rd.from_arrow(rt).repartition(3)
    lset = set(zip(lt["a"].to_pylist(), lt["b"].to_pylist()))
    rset = set(zip(rt["a"].to_pylist(), rt["b"].to_pylist()))
    for fn, exp in ((intersect_distinct, lset & rset),
                    (except_distinct, lset - rset),
                    (union_distinct, lset | rset)):
        out = fn(left, right).to_pandas()
        got = set(zip(out["a"], out["b"]))
        assert got == exp, fn.__name__
        assert len(out) == len(got)  # distinct — no duplicate rows


# -- explode / unnest ---------------------------------------------------------

def test_explode_list_values_positions_and_empties():
    from cuttana_ray.stages.nested import explode_list
    t = pa.table({
        "id": pa.array([10, 20, 30, 40], pa.int64()),
        "xs": pa.array([[1.5, 2.5], [], None, [7.0, 8.0, 9.0]],
                       pa.list_(pa.float32()))})
    out = explode_list(rd.from_arrow(t).repartition(2), "xs",
                       value_name="v", pos_name="pos").to_pandas() \
        .sort_values(["id", "pos"]).reset_index(drop=True)
    assert out["id"].tolist() == [10, 10, 40, 40, 40]
    assert out["pos"].tolist() == [1, 2, 1, 2, 3]
    assert out["v"].tolist() == [1.5, 2.5, 7.0, 8.0, 9.0]


def test_explode_list_matches_pandas_explode_random():
    from cuttana_ray.stages.nested import explode_list
    rng = np.random.default_rng(9)
    lists = [rng.integers(0, 100, rng.integers(0, 6)).tolist()
             for _ in range(300)]
    t = pa.table({"id": pa.array(range(300), pa.int64()),
                  "xs": pa.array(lists, pa.list_(pa.int64()))})
    got = explode_list(rd.from_arrow(t).repartition(7), "xs",
                       value_name="v", pos_name=None).to_pandas() \
        .sort_values(["id", "v"]).reset_index(drop=True)
    exp = t.to_pandas().explode("xs").dropna(subset=["xs"])
    exp = exp.rename(columns={"xs": "v"}).astype({"v": np.int64}) \
        .sort_values(["id", "v"]).reset_index(drop=True)
    assert got.equals(exp[["id", "v"]])


# -- grouped mode -------------------------------------------------------------

def test_mode_agg_deterministic_tie_break():
    from cuttana_ray.stages.relational import mode_agg
    t = pa.table({
        "k": pa.array([0, 0, 0, 1, 1, 1, 1], pa.int64()),
        "v": pa.array(["b", "a", "b", "z", "y", "z", "y"])})
    out = mode_agg(rd.from_arrow(t).repartition(3), ["k"], "v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert out["v"].tolist() == ["b", "y"]  # k=1 ties 2-2 -> smallest value
    assert out["n"].tolist() == [2, 2]


# -- grouped exact COUNT(DISTINCT) --------------------------------------------

def test_distinct_count_agg_vs_bruteforce():
    from cuttana_ray.stages.relational import distinct_count_agg
    rng = np.random.default_rng(23)
    n = 2000
    k = rng.integers(0, 5, n)
    v = rng.integers(0, 40, n)
    null_mask = rng.random(n) < 0.1
    t = pa.table({"k": pa.array(k, pa.int64()),
                  "v": pa.array(np.where(null_mask, None, v),
                                pa.int64(), from_pandas=True)})
    got = distinct_count_agg(rd.from_arrow(t).repartition(7), ["k"], "v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    df = t.to_pandas()
    exp = df.groupby("k")["v"].nunique()  # pandas nunique drops NaN
    assert got["k"].tolist() == sorted(exp.index.tolist())
    assert got["n_distinct"].tolist() == [int(exp[kk]) for kk in got["k"]]


# -- ordered STRING_AGG / UNPIVOT ---------------------------------------------

def test_string_agg_ordered_vs_bruteforce():
    from cuttana_ray.stages.relational import string_agg_ordered
    rng = np.random.default_rng(31)
    n = 500
    k = rng.integers(0, 4, n)
    o = rng.permutation(n)
    v = np.array([f"v{i % 7}" for i in range(n)])
    t = pa.table({"k": pa.array(k, pa.int64()),
                  "o": pa.array(o, pa.int64()), "v": pa.array(v)})
    got = string_agg_ordered(rd.from_arrow(t).repartition(6), ["k"], "v",
                             ["o"], sep="|", alias="s") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    df = t.to_pandas().sort_values(["k", "o"])
    exp = df.groupby("k")["v"].agg("|".join)
    assert got["s"].tolist() == [exp[kk] for kk in got["k"]]


def test_unpivot_roundtrip():
    from cuttana_ray.stages.relational import unpivot
    t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "a": pa.array([1.0, 2.0, 3.0]),
                  "b": pa.array([10.0, 20.0, 30.0])})
    got = unpivot(rd.from_arrow(t).repartition(2), ["id"], ["a", "b"]) \
        .to_pandas().sort_values(["id", "measure"]).reset_index(drop=True)
    assert len(got) == 6
    assert got.loc[(got["id"] == 2) & (got["measure"] == "b"),
                   "value"].iloc[0] == 20.0
    assert set(got["measure"]) == {"a", "b"}


# -- rank windows (NTILE / PERCENT_RANK) --------------------------------------

def test_rank_windows_vs_bruteforce():
    from cuttana_ray.stages.running import rank_windows
    rng = np.random.default_rng(17)
    n = 1200
    k = rng.integers(0, 7, n)
    t = pa.table({"k": pa.array(k, pa.int64()),
                  "o": pa.array(rng.permutation(n), pa.int64())})
    got = rank_windows(rd.from_arrow(t).repartition(5), "k", ["o"],
                       tiles=4).to_pandas() \
        .sort_values(["k", "o"]).reset_index(drop=True)

    def ntile_sql(rn, nn, tiles):
        q, r = divmod(nn, tiles)
        if rn <= r * (q + 1):
            return (rn - 1) // (q + 1) + 1
        return r + (rn - 1 - r * (q + 1)) // q + 1

    df = t.to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    exp_tile, exp_prank = [], []
    for key, grp in df.groupby("k", sort=True):
        nn = len(grp)
        for rn in range(1, nn + 1):
            exp_tile.append(ntile_sql(rn, nn, 4))
            exp_prank.append((rn - 1) / (nn - 1) if nn > 1 else 0.0)
    assert got["ntile"].tolist() == exp_tile
    assert got["prank"].tolist() == exp_prank


def test_rank_windows_tiny_groups_and_n_less_than_tiles():
    from cuttana_ray.stages.running import rank_windows
    t = pa.table({"k": pa.array([0, 1, 1, 2, 2, 2], pa.int64()),
                  "o": pa.array([1, 1, 2, 1, 2, 3], pa.int64())})
    got = rank_windows(rd.from_arrow(t).repartition(3), "k", ["o"],
                       tiles=4).to_pandas() \
        .sort_values(["k", "o"]).reset_index(drop=True)
    assert got["ntile"].tolist() == [1, 1, 2, 1, 2, 3]
    assert got["prank"].tolist() == [0.0, 0.0, 1.0, 0.0, 0.5, 1.0]


# -- Bloom-filter semi-join reduction -----------------------------------------

def test_bloom_prune_no_false_negatives_and_exact_composition():
    from cuttana_ray.stages.joins import bloom_filter_build, bloom_prune
    from cuttana_ray.stages.relational import semi_join
    rng = np.random.default_rng(29)
    small_keys = np.unique(rng.integers(0, 10_000, 150))
    big_keys = rng.integers(0, 10_000, 5000)
    small = rd.from_arrow(pa.table({"k": pa.array(small_keys, pa.int64())})) \
        .repartition(3)
    big = rd.from_arrow(pa.table({
        "k": pa.array(big_keys, pa.int64()),
        "rowid": pa.array(np.arange(5000), pa.int64())})).repartition(6)
    bits = bloom_filter_build(small, "k", num_bits=1 << 16)
    pruned = bloom_prune(big, bits, "k").to_pandas()
    in_small = np.isin(big_keys, small_keys)
    # no false negatives: every true match survives pruning
    assert set(np.nonzero(in_small)[0]) <= set(pruned["rowid"])
    # composed with the exact semi-join the result is exact
    final = semi_join(bloom_prune(big, bits, "k"), small, "k", "k") \
        .to_pandas()
    assert sorted(final["rowid"]) == sorted(np.nonzero(in_small)[0])
    # and with 64 Kib the pruning actually prunes (fp rate ~0)
    assert len(pruned) < 5000


# -- dataset profiling ---------------------------------------------------------

def test_profile_counts_extrema_means_with_nulls():
    from cuttana_ray.stages.profile import profile
    t = pa.table({
        "i": pa.array([3, None, 1, 7, None], pa.int64()),
        "s": pa.array(["b", "a", None, "z", "m"]),
        "f": pa.array([1.5, 2.5, None, -4.0, 10.0], pa.float64())})
    got = profile(rd.from_arrow(t).repartition(3)).to_pandas() \
        .set_index("column")
    assert got.loc["i", "n_rows"] == 5 and got.loc["i", "n_nulls"] == 2
    assert got.loc["i", "min_str"] == "1" and got.loc["i", "max_str"] == "7"
    assert got.loc["i", "mean"] == (3 + 1 + 7) / 3
    assert got.loc["s", "min_str"] == "a" and got.loc["s", "max_str"] == "z"
    assert np.isnan(got.loc["s", "mean"])
    assert got.loc["f", "min_num"] == -4.0 and got.loc["f", "max_num"] == 10.0
    assert got.loc["f", "mean"] == (1.5 + 2.5 - 4.0 + 10.0) / 4
    assert pd.isna(got.loc["f", "min_str"])  # float extrema numeric-only


def test_jsonl_transcript_roundtrip(tmp_path):
    """JSONL source parity: byte-equal text per (conv_id, turn_idx) and an
    identical schema to the Parquet source (input_hint per-row invariant)."""
    import pandas as pd
    from cuttana_ray.sources.transcripts import (
        TRANSCRIPT_SCHEMA, read_transcripts_jsonl, synth_transcripts_table,
        write_transcripts_jsonl)
    table = synth_transcripts_table(40, seed=9)
    d = write_transcripts_jsonl(table, str(tmp_path / "jl"), num_files=3)
    ds = read_transcripts_jsonl(d)
    got = ds.to_pandas().sort_values(["conv_id", "turn_idx"]) \
        .reset_index(drop=True)
    exp = table.to_pandas().sort_values(["conv_id", "turn_idx"]) \
        .reset_index(drop=True)
    assert pa.Table.from_pandas(got, preserve_index=False).schema \
        .equals(TRANSCRIPT_SCHEMA)
    pd.testing.assert_frame_equal(got, exp)


def test_moving_agg_matches_pandas_across_layouts():
    from cuttana_ray.stages.running import moving_agg

    rng = np.random.default_rng(29)
    n = 5000
    df = pd.DataFrame({"k": rng.integers(0, 40, n),
                       "t": rng.permutation(n).astype(np.int64),
                       "v": rng.integers(-50, 100, n)})
    exp = df.sort_values(["k", "t"]).copy()
    g = exp.groupby("k")["v"]
    exp["window_sum"] = g.rolling(4, min_periods=1).sum() \
        .reset_index(level=0, drop=True)
    exp["window_n"] = g.rolling(4, min_periods=1).count() \
        .reset_index(level=0, drop=True)
    exp = exp[["k", "t", "window_sum", "window_n"]] \
        .sort_values(["k", "t"]).reset_index(drop=True) \
        .astype({"window_sum": "int64", "window_n": "int64"})

    t = pa.table({c: pa.array(df[c], pa.int64()) for c in df})
    for nblocks in (1, 3, 17):
        got = moving_agg(rd.from_arrow(t).repartition(nblocks),
                         "k", ["t"], "v", frame=4,
                         keep=["k", "t"]).to_pandas()
        got = got.sort_values(["k", "t"]).reset_index(drop=True) \
            .astype({"window_sum": "int64", "window_n": "int64"})
        pd.testing.assert_frame_equal(got, exp)


def test_moving_agg_single_key_tiny_blocks_frame_straddle():
    """One key, frame wider than every block: the carried tail must chain
    across MULTIPLE consecutive block summaries, not just one hop."""
    from cuttana_ray.stages.running import moving_agg

    n = 60
    t = pa.table({"k": pa.array(np.zeros(n, np.int64)),
                  "t": pa.array(np.arange(n, dtype=np.int64)),
                  "v": pa.array(np.arange(1, n + 1, dtype=np.int64))})
    got = moving_agg(rd.from_arrow(t).repartition(30), "k", ["t"], "v",
                     frame=7, keep=["t"]).to_pandas() \
        .sort_values("t").reset_index(drop=True)
    v = np.arange(1, n + 1, dtype=np.int64)
    exp_sum = [int(v[max(0, i - 6):i + 1].sum()) for i in range(n)]
    exp_n = [min(i + 1, 7) for i in range(n)]
    assert got["window_sum"].tolist() == exp_sum
    assert got["window_n"].tolist() == exp_n


def test_json_extract_scalars():
    """Typed multi-field extraction: nulls, missing keys, extra keys,
    escaped-newline string values, empty strings — all row-aligned."""
    from cuttana_ray.stages.jsoncol import json_extract_scalars

    rows = [
        '{"k": 7, "name": "a", "extra": true}',
        '{"name": "line\\nbreak"}',          # escaped newline inside JSON
        None,
        '',
        '{"k": -3}',
    ]
    t = pa.table({"id": pa.array(np.arange(5, dtype=np.int64)),
                  "props": pa.array(rows, pa.string())})
    out = json_extract_scalars(
        rd.from_arrow(t).repartition(3), "props",
        {"k": pa.int64(), "name": pa.string()}, keep=["id"]) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    assert out.columns.tolist() == ["id", "k", "name"]
    assert out["k"].tolist()[0] == 7 and out["k"].tolist()[4] == -3
    assert out["k"].isna().tolist() == [False, True, True, True, False]
    assert out["name"].tolist()[0] == "a"
    assert out["name"].tolist()[1] == "line\nbreak"
    assert out["name"].isna().tolist() == [False, False, True, True, True]


def test_funnel_counts_ordering_semantics():
    """Out-of-order steps must not count; equal timestamps DO satisfy
    ts >= t_prev; missing steps break the chain."""
    from cuttana_ray.stages.windows import funnel_counts

    rows = [
        # u1: clean view(1) → click(2) → purchase(3): reaches all
        (1, 1, "view"), (1, 2, "click"), (1, 3, "purchase"),
        # u2: purchase BEFORE click: view(1) → click(5), purchase at 2 only
        (2, 1, "view"), (2, 5, "click"), (2, 2, "purchase"),
        # u3: equal ts everywhere: ties count (>= semantics)
        (3, 7, "view"), (3, 7, "click"), (3, 7, "purchase"),
        # u4: no view at all, later steps present: reaches nothing
        (4, 1, "click"), (4, 2, "purchase"),
        # u5: view only
        (5, 9, "view"),
        # u6: second click AFTER purchase-time rescues nothing; but a
        # second purchase after the click does: view(1) click(4)
        # purchase(2 and 6) → purchase at 6 counts
        (6, 1, "view"), (6, 4, "click"), (6, 2, "purchase"),
        (6, 6, "purchase"),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * 1_000_000 for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string())})
    out = funnel_counts(rd.from_arrow(t).repartition(4), "user_id", "ts",
                        "event_type", ["view", "click", "purchase"]) \
        .to_pandas()
    assert out["n_users"].tolist() == [5, 4, 3]
    # reached sets: view {1,2,3,5,6}; click {1,2,3,6}; purchase {1,3,6}


def test_grouped_entropy_known_answers():
    from cuttana_ray.stages.stats import grouped_entropy

    rows = (
        [(1, "a")] * 4 + [(1, "b")] * 4            # uniform 2 → H=1
        + [(2, "a")] * 2 + [(2, "b")] * 2
        + [(2, "c")] * 2 + [(2, "d")] * 2          # uniform 4 → H=2
        + [(3, "a")] * 7                           # single type → H=0
        + [(4, "a")] * 3 + [(4, "b")] * 1          # 3:1 → 2-0.75*log2(3)
    )
    t = pa.table({"k": pa.array([r[0] for r in rows], pa.int64()),
                  "v": pa.array([r[1] for r in rows], pa.string())})
    out = grouped_entropy(rd.from_arrow(t).repartition(5), "k", "v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert out["n_events"].tolist() == [8, 8, 7, 4]
    assert out["n_distinct"].tolist() == [2, 4, 1, 2]
    exp = [1.0, 2.0, 0.0, round(2 - 0.75 * np.log2(3), 6)]
    assert out["entropy"].tolist() == pytest.approx(exp, abs=1e-9)


def test_table_diff_all_change_classes():
    from cuttana_ray.stages.relational import table_diff

    left = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                     "v": pa.array([10.0, 20.0, 30.0, 40.0])})
    right = pa.table({"k": pa.array([2, 3, 4, 5], pa.int64()),
                      "v": pa.array([20.0, 31.0, 40.0, 50.0])})
    out = table_diff(rd.from_arrow(left).repartition(3),
                     rd.from_arrow(right).repartition(2), "k", "v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert list(zip(out["k"], out["change"])) == [
        (1, "removed"), (3, "changed"), (5, "added")]


def test_session_ids_consistent_with_session_counts():
    """Cross-operator invariant: max session_id per user from the
    assignment query equals n_sessions from session_counts on the same
    events (sf0.001 testdata), under the same 3600 s gap rule."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_sess", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sf = "/root/testdata/sf0.001"
    ids = mod.queries()["event_session_ids"](sf).to_pandas()
    counts = mod.queries()["user_session_counts"](sf)
    counts = counts.to_pandas() if hasattr(counts, "to_pandas") else counts
    got = ids.groupby("user_id")["session_id"].max()
    exp = counts.set_index(counts.columns[0])[counts.columns[1]]
    exp.index = exp.index.astype(got.index.dtype)
    assert got.sort_index().tolist() == exp.sort_index().tolist()


def test_cohort_retention_multi_month():
    import importlib.util
    import pandas as pd

    spec = importlib.util.spec_from_file_location(
        "entry_cohort", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # synthetic: u1 active m0,m1,m3; u2 active m1; u3 active m0,m0 (dup)
    ts = (pd.to_datetime(["2024-01-05", "2024-02-10", "2024-04-01",
                          "2024-02-20", "2024-01-07", "2024-01-30"])
          .tz_localize(None))
    t = pa.table({"user_id": pa.array([1, 1, 1, 2, 3, 3], pa.int64()),
                  "ts": pa.array(ts, pa.timestamp("us"))})
    import os, tempfile
    import pyarrow.parquet as pq
    d = tempfile.mkdtemp()
    pq.write_table(t, os.path.join(d, "events.parquet"))
    out = mod.queries()["cohort_retention"](d)
    df = (out.to_pandas() if hasattr(out, "to_pandas") else out) \
        .sort_values(["cohort_ym", "month_offset"]).reset_index(drop=True)
    jan = 2024 * 12 + 1
    feb = jan + 1
    got = list(zip(df.cohort_ym, df.month_offset, df.n_users))
    assert got == [(jan, 0, 2), (jan, 1, 1), (jan, 3, 1), (feb, 0, 1)]


def test_interval_overlap_join_matches_brute_force():
    """Random intervals (spans up to and beyond one bucket width, keyed
    and unkeyed) against an O(n^2) reference — exercises the multi-bucket
    replication + single-bucket pair-claim dedup."""
    import pandas as pd
    from cuttana_ray.stages.joins import interval_overlap_join
    rng = np.random.default_rng(3)
    nl, nr = 80, 70
    ls = rng.integers(0, 1000, nl)
    le = ls + rng.integers(0, 120, nl)          # spans 0..119
    rs = rng.integers(0, 1000, nr)
    re_ = rs + rng.integers(0, 120, nr)
    lk = rng.integers(0, 3, nl)
    rk = rng.integers(0, 3, nr)
    left = pa.table({"lid": pa.array(range(nl), pa.int64()),
                     "k": pa.array(lk, pa.int64()),
                     "s": pa.array(ls, pa.int64()),
                     "e": pa.array(le, pa.int64())})
    right = pa.table({"rid": pa.array(range(nr), pa.int64()),
                      "k": pa.array(rk, pa.int64()),
                      "s": pa.array(rs, pa.int64()),
                      "e": pa.array(re_, pa.int64())})

    for key, width in ((None, None), ("k", None), (None, 40), ("k", 17)):
        got = interval_overlap_join(
            rd.from_arrow(left).repartition(4),
            rd.from_arrow(right).repartition(3),
            "s", "e", "s", "e", key=key,
            left_cols=["lid"], right_cols=["rid"],
            bucket_width=width).to_pandas() \
            .sort_values(["lid", "r_rid"]).reset_index(drop=True)
        mask = (ls[:, None] <= re_[None, :]) & (rs[None, :] <= le[:, None])
        if key:
            mask &= lk[:, None] == rk[None, :]
        li, ri = np.nonzero(mask)
        exp = pd.DataFrame({"lid": li, "r_rid": ri}).astype("int64") \
            .sort_values(["lid", "r_rid"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp)


def test_skew_join_matches_plain_join():
    """Skewed key distribution through all three regimes (some / none /
    all keys heavy), multiple right rows per key, vs a pandas merge."""
    from cuttana_ray.stages.joins import skew_join
    rng = np.random.default_rng(6)
    # key 7 is hot (500 rows), the rest uniform
    lk = np.concatenate([np.full(500, 7), rng.integers(0, 20, 300)])
    lv = np.arange(len(lk))
    left = pa.table({"k": pa.array(lk, pa.int64()),
                     "lv": pa.array(lv, pa.int64())})
    # right: two rows for some keys, none for others
    rk = np.concatenate([np.arange(15), np.arange(0, 15, 2)])
    right = pa.table({"rk": pa.array(rk, pa.int64()),
                      "rv": pa.array(np.arange(len(rk)) * 10, pa.int64())})
    exp = pd.merge(left.to_pandas(), right.to_pandas(),
                   left_on="k", right_on="rk")[["k", "lv", "rv"]] \
        .sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    for thresh in (100, 10_000, 1):      # some / none / all heavy
        got = skew_join(rd.from_arrow(left).repartition(5),
                        rd.from_arrow(right).repartition(3),
                        "k", "rk", heavy_min_count=thresh).to_pandas() \
            [["k", "lv", "rv"]].sort_values(["k", "lv", "rv"]) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp)


def test_zorder_key_locality_and_exactness():
    from cuttana_ray.stages.layout import morton_interleave, zorder_sort
    # known interleave: a=0b101 fills even bits, b=0b011 odd bits
    assert morton_interleave(np.array([0b101]),
                             np.array([0b011]))[0] == 0b11011
    # exact round-trip: sorting by zkey groups small coordinate boxes
    rng = np.random.default_rng(2)
    a = rng.integers(0, 1 << 10, 500)
    b = rng.integers(0, 1 << 10, 500)
    t = pa.table({"a": pa.array(a, pa.int64()),
                  "b": pa.array(b, pa.int64())})
    out = zorder_sort(rd.from_arrow(t).repartition(4), "a", "b") \
        .to_pandas()
    z = morton_interleave(out.a.to_numpy(), out.b.to_numpy())
    assert (np.diff(z) >= 0).all()          # actually sorted on the curve
    # locality: mean |Δa|+|Δb| between curve-adjacent rows must be far
    # below the random-order baseline
    curve_gap = (np.abs(np.diff(out.a.to_numpy()))
                 + np.abs(np.diff(out.b.to_numpy()))).mean()
    rand_gap = (np.abs(np.diff(a)) + np.abs(np.diff(b))).mean()
    assert curve_gap < rand_gap / 3


def test_zorder_write_shrinks_file_bounding_boxes(tmp_path):
    """The point of Z-order: after write_parquet, each file's (a, b)
    bounding box is compact, so a predicate on either column can prune
    whole files via parquet column statistics. Compare total bbox area
    of zordered vs row-order files."""
    import pyarrow.parquet as pq
    from cuttana_ray.stages.layout import zorder_sort
    rng = np.random.default_rng(8)
    n = 20_000
    t = pa.table({"a": pa.array(rng.integers(0, 1 << 12, n), pa.int64()),
                  "b": pa.array(rng.integers(0, 1 << 12, n), pa.int64())})

    def bbox_area_sum(d: str) -> float:
        import glob
        total = 0.0
        for f in glob.glob(f"{d}/*.parquet"):
            md = pq.read_metadata(f)
            amin = bmin = float("inf")
            amax = bmax = float("-inf")
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                for c in range(rg.num_columns):
                    col = rg.column(c)
                    st = col.statistics
                    name = col.path_in_schema
                    if st is None or name not in ("a", "b"):
                        continue
                    if name == "a":
                        amin = min(amin, st.min)
                        amax = max(amax, st.max)
                    else:
                        bmin = min(bmin, st.min)
                        bmax = max(bmax, st.max)
            total += (amax - amin) * (bmax - bmin)
        return total

    plain_dir = str(tmp_path / "plain")
    z_dir = str(tmp_path / "zorder")
    ds = rd.from_arrow(t)
    ds.repartition(8).write_parquet(plain_dir)
    zorder_sort(ds, "a", "b").repartition(8).write_parquet(z_dir)
    # random-order files each span ~the full square; zordered files
    # cover small curve segments
    assert bbox_area_sum(z_dir) < bbox_area_sum(plain_dir) / 4


@pytest.mark.parametrize("num_blocks", [1, 7])
def test_lag_columns_matches_pandas_shift(num_blocks):
    from cuttana_ray.stages.running import lag_columns
    rng = np.random.default_rng(12)
    n = 3000
    t = pa.table({
        "u": pa.array(rng.integers(0, 25, n), pa.int64()),
        "seq": pa.array(rng.permutation(n), pa.int64()),
        "val": pa.array(rng.normal(size=n), pa.float64()),
        "tag": pa.array(rng.choice(["x", "y", "z"], n)),
    })
    got = lag_columns(rd.from_arrow(t).repartition(num_blocks),
                      "u", ["seq"], ["val", "tag"],
                      keep=["u", "seq"]).to_pandas() \
        .sort_values(["u", "seq"]).reset_index(drop=True)
    pdf = t.to_pandas().sort_values(["u", "seq"]).reset_index(drop=True)
    g = pdf.groupby("u")
    exp_val = g["val"].shift(1)
    exp_tag = g["tag"].shift(1)
    assert np.array_equal(got["prev_val"].to_numpy(),
                          exp_val.to_numpy(), equal_nan=True)
    assert got["prev_tag"].where(got["prev_tag"].notna(), None).tolist() \
        == exp_tag.where(exp_tag.notna(), None).tolist()


@pytest.mark.parametrize("num_blocks", [1, 9])
def test_coalesce_intervals_matches_brute_force(num_blocks):
    from cuttana_ray.stages.running import coalesce_intervals
    rng = np.random.default_rng(14)
    n = 2000
    k = rng.integers(0, 12, n)
    s = rng.integers(0, 10_000, n).astype(np.int64)
    e = s + rng.integers(0, 400, n)
    ds = rd.from_arrow(pa.table({"k": pa.array(k, pa.int64()),
                                 "s": pa.array(s, pa.int64()),
                                 "e": pa.array(e, pa.int64())})) \
        .repartition(num_blocks)
    got = coalesce_intervals(ds, "k", "s", "e").to_pandas() \
        .sort_values(["k", "island"]).reset_index(drop=True)
    # brute-force islands per key
    exp_rows = []
    for key in np.unique(k):
        ivs = sorted(zip(s[k == key], e[k == key]))
        cur_s, cur_e, cnt, isl = None, None, 0, 0
        for a, b in ivs:
            if cur_s is None or a > cur_e:
                if cur_s is not None:
                    exp_rows.append((key, isl, cur_s, cur_e, cnt))
                isl += 1
                cur_s, cur_e, cnt = a, b, 1
            else:
                cur_e = max(cur_e, b)
                cnt += 1
        exp_rows.append((key, isl, cur_s, cur_e, cnt))
    exp = pd.DataFrame(exp_rows, columns=["k", "island", "island_start",
                                          "island_end", "n_intervals"]) \
        .astype("int64").sort_values(["k", "island"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), exp)


def test_conductance_mod_known_answer():
    """4-cycle 0-1-2-3 (unit weights) under mod-2: every edge crosses, each
    side has volume 4 -> phi = 1.0 for both partitions."""
    import pyarrow as pa
    import ray.data as rd

    from cuttana_ray.stages.metrics import conductance_mod

    e = [(0, 1), (1, 2), (2, 3), (3, 0)]
    sym = e + [(b, a) for a, b in e]
    t = pa.table({"src": pa.array([a for a, _ in sym], pa.int64()),
                  "dst": pa.array([b for _, b in sym], pa.int64()),
                  "weight": pa.array([1] * len(sym), pa.int64())})
    out = conductance_mod(rd.from_arrow(t).repartition(3), 2).to_pandas()
    assert list(out["part"]) == [0, 1]
    assert list(out["vol"]) == [4, 4]
    assert list(out["cut"]) == [4, 4]
    assert list(out["conductance"]) == [1.0, 1.0]


def test_rich_club_known_answer():
    """Star K1,3 plus a triangle on the hub's neighbors: degrees are
    hub=3, leaves=3 (star edge + 2 triangle edges each)... construct
    explicitly: vertices 0..3, edges 0-1,0-2,0-3,1-2,1-3,2-3 (K4).
    Every vertex has degree 3: phi(2) = 1.0, phi(3) -> no vertices."""
    import pyarrow as pa
    import ray.data as rd

    from cuttana_ray.stages.metrics import rich_club

    e = [(a, b) for a in range(4) for b in range(4) if a < b]
    sym = e + [(b, a) for a, b in e]
    t = pa.table({"src": pa.array([a for a, _ in sym], pa.int64()),
                  "dst": pa.array([b for _, b in sym], pa.int64()),
                  "weight": pa.array([1] * len(sym), pa.int64())})
    out = rich_club(rd.from_arrow(t).repartition(2), [1, 2, 3]) \
        .to_pandas().set_index("k")
    assert out.loc[1, "n_nodes"] == 4 and out.loc[1, "phi"] == 1.0
    assert out.loc[2, "n_nodes"] == 4 and out.loc[2, "n_edges"] == 6
    assert out.loc[3, "n_nodes"] == 0 and out.loc[3, "phi"] == 0.0


def test_grouped_holt_matches_loop_replay():
    import ray.data as rd

    from cuttana_ray.stages.running import grouped_holt
    rng = np.random.default_rng(9)
    rows = []
    for k in ("a", "b"):
        for d in range(25):
            rows.append((k, d, int(rng.integers(1, 20))))
    t = pa.table({"k": pa.array([r[0] for r in rows]),
                  "d": pa.array([r[1] for r in rows], pa.int64()),
                  "x": pa.array([r[2] for r in rows], pa.int64())})
    for parts in (1, 4):
        got = grouped_holt(rd.from_arrow(t).repartition(parts),
                           "k", "d", "x").to_pandas() \
            .sort_values("k").reset_index(drop=True)
        for _, r in got.iterrows():
            xs = [x for kk, _, x in rows if kk == r["k"]]
            lvl, b = float(xs[0]), 0.0
            for xt in xs[1:]:
                prev = lvl
                lvl = 0.5 * xt + 0.5 * (lvl + b)
                b = 0.25 * (lvl - prev) + 0.75 * b
            assert r["n_points"] == len(xs)
            assert abs(r["level"] - round(lvl, 6)) < 1e-12
            assert abs(r["trend"] - round(b, 6)) < 1e-12
            assert abs(r["forecast1"] - round(lvl + b, 6)) < 1e-12


def test_bucketed_exchanges_match_native_aggregate(ray_session):
    """The bucketed sort-exchanges (pipelines/pagerank.py — the 96×
    replacement for the native per-key aggregate on high-cardinality
    keys) are value-identical to groupby().aggregate() for int sums,
    float sums and mins, across block layouts."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    from cuttana_ray.pipelines.pagerank import (
        grouped_min_exchange,
        grouped_sum2_exchange,
        grouped_sum_exchange,
    )

    rng = np.random.default_rng(17)
    n = 20_000
    t = pa.table({
        "k": pa.array(rng.integers(0, 3_000, n)),
        "k2": pa.array(rng.integers(0, 7, n)),
        "vi": pa.array(rng.integers(-50, 50, n)),
        "vf": pa.array(rng.random(n)),
    })
    for parts in (1, 9):
        ds = rd.from_arrow(t).repartition(parts)

        got = grouped_sum_exchange(ds, "k", "vi", int_val=True) \
            .to_pandas().sort_values("k").reset_index(drop=True)
        want = ds.groupby("k").aggregate(Sum("vi", alias_name="s")) \
            .to_pandas().sort_values("k").reset_index(drop=True)
        assert (got["k"].values == want["k"].values).all()
        assert (got["s"].values == want["s"].values).all()

        gotf = grouped_sum_exchange(ds, "k", "vf") \
            .to_pandas().sort_values("k").reset_index(drop=True)
        wantf = ds.groupby("k").aggregate(Sum("vf", alias_name="s")) \
            .to_pandas().sort_values("k").reset_index(drop=True)
        np.testing.assert_allclose(gotf["s"].values, wantf["s"].values,
                                   rtol=1e-12)

        gotm = grouped_min_exchange(ds, "k", "vi") \
            .to_pandas().sort_values("k").reset_index(drop=True)
        wantm = ds.groupby("k").aggregate(Min("vi", alias_name="m")) \
            .to_pandas().sort_values("k").reset_index(drop=True)
        assert (gotm["m"].values == wantm["m"].values).all()

        got2 = grouped_sum2_exchange(ds, "k", "k2", "vi", int_val=True) \
            .to_pandas().sort_values(["k", "k2"]).reset_index(drop=True)
        want2 = ds.groupby(["k", "k2"]) \
            .aggregate(Sum("vi", alias_name="vi")) \
            .to_pandas().sort_values(["k", "k2"]).reset_index(drop=True)
        assert (got2["k"].values == want2["k"].values).all()
        assert (got2["k2"].values == want2["k2"].values).all()
        assert (got2["vi"].values == want2["vi"].values).all()
