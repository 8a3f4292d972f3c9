"""Regression tests for the round-2 advisory fixes: pivot_agg cardinality
guard, grouped_dense_rank non-int keys, edit_distance_pairs null text,
grouped_weighted_median string keys under the collision guard."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def test_pivot_agg_guards_high_cardinality_discovery(ray_session):
    from cuttana_ray.stages.relational import pivot_agg
    t = pa.table({
        "k": pa.array(np.arange(50, dtype=np.int64) % 5),
        "cat": pa.array([f"c{i}" for i in range(50)]),   # 50 distinct
        "v": pa.array(np.ones(50, dtype=np.int64)),
    })
    ds = rd.from_arrow(t).repartition(3)
    with pytest.raises(ValueError, match="distinct values"):
        pivot_agg(ds, "k", "cat", "v", max_values=10)
    # explicit values bypass discovery (and the guard)
    out = pivot_agg(ds, "k", "cat", "v",
                    values=["c0", "c1"]).to_pandas()
    assert set(out.columns) == {"k", "v_c0", "v_c1"}
    assert len(out) == 5


def test_grouped_dense_rank_string_key(ray_session):
    """The r2 advisory bug: local_distinct hardcoded the key cast to int64,
    so a string partition key raised at runtime."""
    import pandas as pd
    from cuttana_ray.stages.relational import grouped_dense_rank
    rng = np.random.default_rng(5)
    keys = rng.choice(["alpha", "beta", "gamma"], 120).tolist()
    vals = rng.integers(0, 9, 120)
    t = pa.table({"k": pa.array(keys, pa.string()),
                  "v": pa.array(vals, pa.int64())})
    got = grouped_dense_rank(rd.from_arrow(t).repartition(4), "k", "v") \
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    pdf = pd.DataFrame({"k": keys, "v": vals})
    pdf["drank"] = pdf.groupby("k")["v"].rank(method="dense").astype(int)
    want = pdf.sort_values(["k", "v"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["drank"].to_numpy()
            == want["drank"].to_numpy()).all()


def test_edit_distance_pairs_null_text(ray_session):
    """Null text must not crash (fill-null) and must not fabricate pairs
    across different prefixes on bucket collisions (prefix re-check)."""
    from cuttana_ray.functions.editdist import edit_distance_pairs
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(["prefix-shared aaaa", "prefix-shared aaab",
                          None, None, "other-prefix zzzz"]),
    })
    out = edit_distance_pairs(rd.from_arrow(t).repartition(2),
                              "doc_id", "text").to_pandas()
    pairs = set(zip(out["d1"], out["d2"]))
    assert (1, 2) in pairs               # near-identical shared prefix
    assert (3, 4) in pairs               # two empty texts: distance 0
    d34 = out[(out.d1 == 3) & (out.d2 == 4)]["dist"].iloc[0]
    assert d34 == 0
    # the null docs share the empty prefix with nothing else
    assert not any((a in (3, 4)) != (b in (3, 4)) for a, b in pairs)


def test_grouped_weighted_median_string_key_guarded(ray_session):
    import duckdb
    from cuttana_ray.functions.quantiles import grouped_weighted_median
    rng = np.random.default_rng(11)
    n = 300
    t = pa.table({
        "k": pa.array(rng.choice(["x", "y", "z"], n).tolist(), pa.string()),
        "v": pa.array(rng.integers(0, 50, n), pa.int64()),
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "w": pa.array(rng.integers(1, 5, n), pa.int64()),
    })
    got = grouped_weighted_median(
        rd.from_arrow(t).repartition(4), "k", "v", "w",
        tiebreak=["id"]).to_pandas().sort_values("k").reset_index(drop=True)
    want = duckdb.connect().execute("""
        SELECT k, MIN(v) AS wmedian FROM (
            SELECT k, v, SUM(w) OVER (PARTITION BY k ORDER BY v, id
                ROWS UNBOUNDED PRECEDING) * 2 AS run2,
                   SUM(w) OVER (PARTITION BY k) AS tot
            FROM t) WHERE run2 >= tot GROUP BY k ORDER BY k
    """).fetchdf()
    assert (got["k"] == want["k"]).all()
    assert (got["wmedian"].to_numpy() == want["wmedian"].to_numpy()).all()


def test_shard_cpu_reservation_leaves_a_whole_cpu_free():
    from cuttana_ray.util import shard_cpu_reservation

    for total in (2, 3, 4, 8, 16, 32):
        for k in (2, 4, 8, 16):
            per = shard_cpu_reservation(total, k)
            assert 0.05 <= per <= 1.0
            # the invariant that prevents the from_arrow_refs metadata-task
            # deadlock: k actors never reserve past total-1
            assert per * k <= max(total - 1, 0.05 * k) + 1e-9
    # the exact config that deadlocked: 2 shards on 2 CPUs
    assert shard_cpu_reservation(2, 2) * 2 <= 1.0 + 1e-9


def test_simrank_query_capped_path_matches_oracle(ray_session):
    """Round-3 advisory: simrank_k3_events used to ERROR past the dense
    V-gate (V tracks users, so roughly sf >= 0.6). Now the query runs on
    the top-degree induced subgraph past _SIMRANK_CAP; forcing a tiny cap
    at sf0.001 must still match the (identically capped) SQL oracle."""
    import duckdb

    import pandas as pd

    import __ray_entry__ as entry
    old = entry._SIMRANK_CAP
    entry._SIMRANK_CAP = 8
    try:
        sf = "/root/testdata/sf0.001"
        got = entry.queries()["simrank_k3_events"](sf)
        if hasattr(got, "to_pandas"):
            got = got.to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
        exp = con.sql(entry.oracle_sql()["simrank_k3_events"]).df()
    finally:
        entry._SIMRANK_CAP = old

    def norm(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if df[c].dtype.kind == "f":
                df[c] = df[c].round(6)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    assert len(got) == len(exp) and len(got) > 0
    pd.testing.assert_frame_equal(norm(got), norm(exp),
                                  check_dtype=False, atol=1e-6)


def test_readability_scores_null_text(ray_session):
    """Round-3 advisory: a NULL text propagated null -> NaN -> INT64_MIN
    through count_substring_regex; fill_null must make NULL behave like
    the empty string."""
    from cuttana_ray.functions.textstats import readability_scores
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["One sentence. Two!", None], pa.string()),
    })
    out = readability_scores(rd.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 2
    row = out.iloc[1]
    # empty-string semantics: clamped word/sentence counts, zero syllables
    assert row["n_words"] == 1 and row["n_sentences"] == 1
    assert row["n_syllables"] == 0
    assert np.isfinite(row["flesch"]) and np.isfinite(row["fk_grade"])
