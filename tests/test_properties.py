"""Property-based tests (hypothesis) for the partitioner core invariants
(FIXTURES.md §B.3). Pure core — no Ray."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cuttana_ray.config import CuttanaConfig
from cuttana_ray.state import BufferManager, CuttanaBufferScorer, cuttana_partition


@st.composite
def adjacency_lists(draw, max_n=40):
    n = draw(st.integers(min_value=1, max_value=max_n))
    edges = draw(st.sets(
        st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)).map(
            lambda p: (min(p), max(p))).filter(lambda p: p[0] != p[1]),
        max_size=120))
    adj: dict[int, set[int]] = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    return n, [(v, sorted(s)) for v, s in adj.items()]


@given(adjacency_lists(), st.integers(min_value=1, max_value=8),
       st.integers(min_value=1, max_value=16))
@settings(max_examples=40, deadline=None)
def test_every_vertex_assigned_exactly_once_and_counts(data, k, buffer_cap):
    n, rows = data
    cfg = CuttanaConfig(num_sub_partitions=8, max_buffer_size=buffer_cap)
    res = cuttana_partition(rows, k, cfg)
    assert sorted(res.vertices.tolist()) == list(range(n))
    assert res.vertex_count == n
    assert res.edge_count == sum(len(nbrs) for _, nbrs in rows)
    assert int(res.partition_sizes.sum()) == n
    assert ((res.partitions >= 0) & (res.partitions < k)).all()
    assert 0.0 <= res.edge_cut_ratio <= 1.0
    # post-refinement balance: max size ≤ (V/k)(1+slack)+1  (refine.rs:46)
    assert res.partition_sizes.max() <= int(n / k * 1.05) + 1
    # determinism
    res2 = cuttana_partition(rows, k, cfg)
    assert (res.partitions == res2.partitions).all()


@given(st.lists(st.tuples(st.integers(0, 99),
                          st.lists(st.integers(0, 99), min_size=1,
                                   max_size=5)),
                min_size=1, max_size=30, unique_by=lambda t: t[0]))
@settings(max_examples=40, deadline=None)
def test_buffer_eviction_is_max_score_order(rows):
    """Evictions come out in non-increasing (score, vertex) order when no
    scores change in between (BTreeMap last_key_value semantics)."""
    buf = BufferManager(10 ** 6, CuttanaBufferScorer(2.0, 100))
    part_of = np.full(100, -1, dtype=np.int64)
    for v, nbrs in rows:
        buf.insert(v, np.asarray(nbrs, dtype=np.int64), part_of)
    keys = []
    while True:
        ev = buf.evict()
        if ev is None:
            break
        v, nbrs = ev
        score = 2.0 * 0.0 + len(nbrs) / 100.0
        keys.append((score, v))
    assert keys == sorted(keys, reverse=True)
    assert len(keys) == len(rows)


@given(st.lists(st.lists(st.sampled_from(["a", "bb", "c", "dd", "e"]),
                         min_size=0, max_size=12),
                min_size=1, max_size=20),
       st.integers(min_value=1, max_value=5))
@settings(max_examples=25, deadline=None)
def test_repetition_stats_matches_pure_python(token_lists, nblocks):
    """repetition_stats == a per-doc pure-Python Counter reference for any
    token content and block layout."""
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from cuttana_ray.functions.textstats import repetition_stats

    texts = [" ".join(toks) for toks in token_lists]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = repetition_stats(rd.from_arrow(t).repartition(nblocks)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    for i, text in enumerate(texts):
        toks = text.split(" ")       # '' → [''] like the engine/oracle
        bigs = [(a, b) for a, b in zip(toks, toks[1:])]
        tc, bc = Counter(toks), Counter(bigs)
        row = got.iloc[i]
        assert row.n_tokens == len(toks)
        assert row.n_distinct_tokens == len(tc)
        assert row.top_token_n == max(tc.values())
        assert row.n_bigrams == len(bigs)
        assert row.top_bigram_n == (max(bc.values()) if bc else 0)


@given(st.lists(st.integers(-2**40, 2**40), max_size=60),
       st.lists(st.integers(-2**40, 2**40), max_size=60))
@settings(max_examples=60, deadline=None)
def test_in_sorted_matches_isin(keys, vals):
    """util.in_sorted (the shared broadcast-membership idiom) must agree
    with np.isin on any sorted key array, including empties and dups."""
    from cuttana_ray.util import in_sorted
    ks = np.sort(np.asarray(keys, dtype=np.int64))
    vs = np.asarray(vals, dtype=np.int64)
    got = in_sorted(ks, vs)
    want = np.isin(vs, ks)
    assert got.dtype == bool and got.shape == vs.shape
    assert (got == want).all()
