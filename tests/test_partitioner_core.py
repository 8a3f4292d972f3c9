"""Partitioner-core unit tests: reference parity, scorer formulas, buffer
semantics, balance properties (no Ray needed — pure core)."""

from __future__ import annotations

import numpy as np
import pytest

from cuttana_ray.config import CuttanaConfig
from cuttana_ray.state import (
    BufferManager,
    CapacityError,
    CuttanaBufferScorer,
    CuttanaState,
    FennelScorer,
    cuttana_partition,
)
from cuttana_ray.state.core import widened_slack
from cuttana_ray.state.refine import compute_edge_cuts


# -- reference parity (tests/partition_tests.rs:7-17) ----------------------

def test_path3_reference_counts():
    res = cuttana_partition([(0, [1, 2]), (1, [0]), (2, [0])], 16)
    assert res.vertex_count == 3
    assert res.edge_count == 4
    # every vertex assigned exactly once
    assert sorted(res.vertices.tolist()) == [0, 1, 2]
    assert len(set(res.vertices.tolist())) == 3
    assert int(res.partition_sizes.sum()) == 3


def test_single_partition_all_together():
    res = cuttana_partition([(0, [1, 2]), (1, [0]), (2, [0])], 1)
    assert set(res.partitions.tolist()) == {0}
    assert res.edge_cut_ratio == 0.0


def test_empty_stream():
    res = cuttana_partition([], 4)
    assert res.vertex_count == 0 and res.edge_count == 0
    assert res.edge_cut_ratio == 0.0 and res.communication_volume == 0.0


def test_num_partitions_validation():
    with pytest.raises(ValueError):
        cuttana_partition([(0, [1])], 0)
    with pytest.raises(ValueError):
        CuttanaConfig(balance_slack=-0.1)


# -- buffer semantics (src/buffer.rs) --------------------------------------

def _mk_buffer(capacity=8, theta=2.0, thresh=100):
    return BufferManager(capacity, CuttanaBufferScorer(theta, thresh))


def test_buffer_score_formula():
    # score = theta*(placed_frac) + deg/threshold  (buffer.rs:150-158)
    scorer = CuttanaBufferScorer(theta=2.0, degree_threshold=100)
    part_of = np.full(10, -1, dtype=np.int32)
    part_of[1] = 3  # one neighbor placed
    nbrs = np.asarray([1, 2, 3, 4])
    assert scorer.score(nbrs, part_of) == pytest.approx(2.0 * 0.25 + 4 / 100)
    # incremental: old + theta/deg  (buffer.rs:160-168)
    assert scorer.update_score(0.54, nbrs) == pytest.approx(0.54 + 2.0 / 4)


def test_buffer_evict_max_score_then_max_vertex():
    buf = _mk_buffer()
    part_of = np.full(10, -1, dtype=np.int32)
    part_of[9] = 0
    buf.insert(1, np.asarray([2]), part_of)            # score 0 + 1/100
    buf.insert(2, np.asarray([9, 3]), part_of)         # score 1.0 + 2/100
    buf.insert(3, np.asarray([9]), part_of)            # score 2.0 + 1/100
    v, _ = buf.evict()
    assert v == 3
    v, _ = buf.evict()
    assert v == 2
    # ties break by larger vertex id (BTreeMap last_key_value semantics)
    buf.insert(5, np.asarray([7]), part_of)
    buf.insert(4, np.asarray([8]), part_of)
    v, _ = buf.evict()
    assert v == 5


def test_buffer_update_scores_and_capacity():
    buf = _mk_buffer(capacity=2)
    part_of = np.full(10, -1, dtype=np.int32)
    buf.insert(1, np.asarray([2, 3]), part_of)
    assert not buf.is_at_capacity()
    buf.insert(2, np.asarray([3]), part_of)
    assert buf.is_at_capacity()
    old = buf._score[1]
    buf.update_scores(np.asarray([1]))
    assert buf._score[1] == pytest.approx(old + 2.0 / 2)
    # updating a non-buffered vertex is a no-op (buffer.rs:76-79)
    buf.update_scores(np.asarray([9]))
    assert len(buf) == 2


def test_buffer_capacity_eviction_in_stream():
    # tiny buffer forces mid-stream evictions (cuttana.rs:40-45)
    rows = [(i, [j for j in range(20) if j != i]) for i in range(20)]
    cfg = CuttanaConfig(max_buffer_size=4, num_sub_partitions=8)
    res = cuttana_partition(rows, 4, cfg)
    assert res.vertex_count == 20
    assert sorted(res.vertices.tolist()) == list(range(20))


# -- FENNEL scorer (src/partition.rs:88-134) -------------------------------

def test_fennel_marginal_hand_computed():
    rng = np.random.default_rng(0)
    scorer = FennelScorer(gamma=1.5, rng=rng)
    sizes = np.asarray([2, 1, 0], dtype=np.int64)
    k, V, E = 3, 10, 40
    alpha = k ** 0.5 * V / E ** 1.5
    # neighbors: two in partition 0, one in partition 1
    nbr_parts = np.asarray([0, 0, 1], dtype=np.int32)
    best = scorer.find_best(nbr_parts, sizes, k, V, E, slack=0.5)
    s0 = 2 - alpha * 1.5 * 2 ** 0.5
    s1 = 1 - alpha * 1.5 * 1 ** 0.5
    s2 = 0 - alpha * 1.5 * 0.0  # smallest-partition candidate
    expected = int(np.argmax([s0, s1, s2]))
    assert best == expected


def test_fennel_room_constraint_excludes_full_partition():
    rng = np.random.default_rng(0)
    scorer = FennelScorer(gamma=1.5, rng=rng)
    sizes = np.asarray([5, 0], dtype=np.int64)
    # V=6, k=2, slack=0 → threshold 3: partition 0 is out of room, so its 5
    # neighbors can't win; smallest (1) is the only candidate
    nbr_parts = np.zeros(5, dtype=np.int32)
    assert scorer.find_best(nbr_parts, sizes, 2, 6, 10, slack=0.0) == 1


def test_capacity_error_when_no_room():
    # k=1 and slack small: second vertex exceeds (1+slack)*V/k at V=1...
    # construct directly: both partitions full
    cfg = CuttanaConfig(balance_slack=0.0, num_sub_partitions=4,
                        buffer_degree_threshold=1)
    # slack widened to 0.0 → threshold = V/k exactly; k=1: first vertex has
    # threshold 1*(1+0)=1 > size 0 ok; second: size 1 < 2? yes... capacity
    # error is hard to trigger with widened slack ≥ 0; use the state directly
    st = CuttanaState(4, 2, cfg)
    from cuttana_ray.state.core import Partitioner
    p = Partitioner(cfg, st)
    st.update_metrics(1)
    p.partition(0, np.asarray([1]))
    st.update_metrics(1)
    p.partition(1, np.asarray([0]))
    # sizes [1,1], V=2, threshold=(1+0)·2/2=1.0 → no room anywhere
    with pytest.raises(CapacityError):
        p.partition(2, np.asarray([], dtype=np.int64))


# -- state / refinement ----------------------------------------------------

def test_widened_slack():
    # state.rs:60-66: min(2*slack, slack+0.5)
    assert widened_slack(0.05) == pytest.approx(0.10)
    assert widened_slack(0.8) == pytest.approx(1.3)


def test_sub_id_arithmetic_and_sub_edges():
    cfg = CuttanaConfig(num_sub_partitions=4)
    st = CuttanaState(10, 3, cfg)
    assert st.gsub(2, 3) == 11
    st.add_sub_edge(1, 5, 2)
    assert st.sub_edges[1][5] == 2 and st.sub_edges[5][1] == 2
    st.add_sub_edge(1, 5)
    assert st.sub_edges[1][5] == 3


def test_edge_cut_matrix():
    # 2 partitions × 2 subs; sub 0 has edges to sub 1 (same partition, w=2)
    # and sub 2 (other partition, w=3):
    # edge_cuts[0] = [total - w_to_parent0, total - w_to_parent1] = [5-2, 5-3]
    cfg = CuttanaConfig(num_sub_partitions=2)
    st = CuttanaState(10, 2, cfg)
    st.add_sub_edge(0, 1, 2)
    st.add_sub_edge(0, 2, 3)
    cuts = compute_edge_cuts(st)
    assert cuts[0].tolist() == [3, 2]
    assert cuts[1].tolist() == [0, 2]  # sub1: only edge to sub0 (w2, parent 0)
    assert cuts[2].tolist() == [0, 3]


def test_balance_property_er_graph():
    rng = np.random.default_rng(1)
    n, k = 240, 6
    adj = {i: set() for i in range(n)}
    for _ in range(1500):
        a, b = rng.integers(0, n, 2)
        if a != b:
            adj[int(a)].add(int(b))
            adj[int(b)].add(int(a))
    rows = [(v, sorted(s)) for v, s in adj.items()]
    cfg = CuttanaConfig(num_sub_partitions=32)
    res = cuttana_partition(rows, k, cfg)
    max_parent = int(n / k * 1.05) + 1  # refine.rs:46 capacity
    assert res.partition_sizes.max() <= max_parent
    assert 0.0 <= res.edge_cut_ratio <= 1.0
    assert res.vertex_count == n
    assert res.edge_count == sum(len(s) for s in adj.values())
    # determinism
    res2 = cuttana_partition(rows, k, cfg)
    assert (res.partitions == res2.partitions).all()


def test_refine_moves_misplaced_sub():
    """A sub whose coarse-graph edges all point at another partition must be
    moved there by ``refine`` (the real scoring the reference stubs out at
    refine.rs:91,118,136)."""
    from cuttana_ray.state.refine import Refiner
    cfg = CuttanaConfig(num_sub_partitions=2, info_gain_threshold=0)
    st = CuttanaState(20, 2, cfg)
    # sizes: partition 0 = {sub0: 3, sub1: 2}, partition 1 = {sub2: 4}
    st.sub_sizes[0], st.sub_sizes[1], st.sub_sizes[2] = 3, 2, 4
    st.partition_sizes[0], st.partition_sizes[1] = 5, 4
    st.vertex_count, st.edge_count = 9, 20
    # sub1 is tightly connected to sub2 (partition 1), barely to sub0
    st.add_sub_edge(1, 2, 10)
    st.add_sub_edge(1, 0, 1)
    r = Refiner(st, balance_slack=0.5, gain_threshold=0)
    r.refine(st)
    assert st.sub_parent[1] == 1          # moved into partition 1
    assert st.partition_sizes.tolist() == [3, 6]
    assert r.moves_applied == 1           # and then no zero-gain churn


def test_fix_balance_restores_capacity():
    from cuttana_ray.state.refine import Refiner
    cfg = CuttanaConfig(num_sub_partitions=4)
    st = CuttanaState(40, 2, cfg)
    # partition 0 grossly over capacity: subs of size 6,6,6,2 vs V=22, k=2
    for i, sz in enumerate([6, 6, 6, 2]):
        st.sub_sizes[i] = sz
    st.sub_sizes[4] = 2
    st.partition_sizes[0], st.partition_sizes[1] = 20, 2
    st.vertex_count, st.edge_count = 22, 10
    r = Refiner(st, balance_slack=0.05, gain_threshold=0)
    # max_parent = 22/2*1.05+1 = 12
    r.fix_balance(st)
    assert st.partition_sizes.max() <= r.max_parent
    assert st.partition_sizes.sum() == 22


def test_refinement_improves_true_cut_on_community_graph():
    rng = np.random.default_rng(2)
    n, k = 150, 4
    adj = {i: set() for i in range(n)}
    for _ in range(1200):
        c = rng.integers(0, 2)
        a = int(rng.integers(0, n // 2)) + c * n // 2
        b = int(rng.integers(0, n // 2)) + c * n // 2
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    for _ in range(30):
        a, b = int(rng.integers(0, n // 2)), int(rng.integers(n // 2, n))
        adj[a].add(b)
        adj[b].add(a)
    rows = [(v, sorted(s)) for v, s in adj.items()]

    def post_cut(res):
        part = np.full(n, -1, dtype=np.int64)
        part[res.vertices] = res.partitions
        cut = sum(1 for v, s in adj.items()
                  for u in s if part[v] != part[u]) // 2
        return cut / res.edge_count

    r_no = cuttana_partition(rows, k, CuttanaConfig(num_sub_partitions=16,
                                                    max_refine_moves=0))
    r_yes = cuttana_partition(rows, k, CuttanaConfig(num_sub_partitions=16))
    assert r_yes.refine_moves > 0
    assert post_cut(r_yes) <= post_cut(r_no) + 1e-9


def test_refine_with_eviction_quality_table_on_community_graph():
    """Strict-parity experiment (CuttanaConfig.refine_eviction): the
    literal refine.rs:107-152 move-with-eviction plans with real scoring
    vs the default relaxed-capacity greedy loop, on the community fixture.
    Both must beat no-refinement on true recounted cut and both must hold
    the balance invariant; the comparison table is recorded in
    BASELINE.md."""
    rng = np.random.default_rng(2)
    n, k = 150, 4
    adj = {i: set() for i in range(n)}
    for _ in range(1200):
        c = rng.integers(0, 2)
        a = int(rng.integers(0, n // 2)) + c * n // 2
        b = int(rng.integers(0, n // 2)) + c * n // 2
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    for _ in range(30):
        a, b = int(rng.integers(0, n // 2)), int(rng.integers(n // 2, n))
        adj[a].add(b)
        adj[b].add(a)
    rows = [(v, sorted(s)) for v, s in adj.items()]

    def post_cut(res):
        part = np.full(n, -1, dtype=np.int64)
        part[res.vertices] = res.partitions
        cut = sum(1 for v, s in adj.items()
                  for u in s if part[v] != part[u]) // 2
        return cut / res.edge_count

    r_none = cuttana_partition(rows, k, CuttanaConfig(
        num_sub_partitions=16, max_refine_moves=0))
    r_default = cuttana_partition(rows, k, CuttanaConfig(
        num_sub_partitions=16))
    r_evict = cuttana_partition(rows, k, CuttanaConfig(
        num_sub_partitions=16, refine_eviction=True))
    max_parent = int(n / k * 1.05) + 1
    for r in (r_default, r_evict):
        assert r.partition_sizes.max() <= max_parent
        assert r.partition_sizes.sum() == n
        assert post_cut(r) <= post_cut(r_none) + 1e-9
    assert r_evict.refine_moves > 0
    # eviction plans subsume direct moves, so quality should be comparable
    # (identical or better within the greedy family's tie-break noise)
    assert post_cut(r_evict) <= post_cut(r_default) + 0.05


def test_refine_with_eviction_two_move_plan_applies():
    """Unit: a configuration where the best direct move does NOT fit under
    refine_capacity but the 2-move plan (move in + evict) does — the
    eviction branch must fire and reduce the true cut."""
    from cuttana_ray.state.refine import Refiner
    cfg = CuttanaConfig(num_sub_partitions=4)
    st = CuttanaState(40, 2, cfg)
    # partition 1 is near capacity; sub0 (in p0) is pulled hard toward p1,
    # sub2 (in p1) is pulled toward p0 — the pair swap is the only way in.
    st.sub_sizes[0], st.sub_sizes[1] = 6, 5      # p0 subs
    st.sub_sizes[4], st.sub_sizes[5] = 6, 5      # p1 subs (global ids 4,5)
    st.partition_sizes[0], st.partition_sizes[1] = 11, 11
    st.vertex_count, st.edge_count = 22, 40
    st.sub_parent[4], st.sub_parent[5] = 1, 1
    st.num_sub_in[0], st.num_sub_in[1] = 2, 2
    st.add_sub_edge(0, 4, 1)     # weak tie between the movers
    st.add_sub_edge(0, 5, 20)    # sub0 wants to join sub5 in p1
    st.add_sub_edge(4, 1, 20)    # sub4 wants to join sub1 in p0
    r = Refiner(st, balance_slack=0.05, gain_threshold=0)
    # max_parent = 22/2*1.05+1 = 12, refine_capacity = 13:
    # direct sub0 (sz 6) into p1 (11) = 17 > 13 → must evict sub4 back
    r.refine_with_eviction(st)
    assert r.moves_applied == 2
    assert st.sub_parent[0] == 1 and st.sub_parent[4] == 0
    assert st.partition_sizes.tolist() == [11, 11]


def test_stream_cut_matches_recount_before_refinement():
    """With refinement disabled, the stream-time cut_count (counted once per
    later-placed endpoint, partition.rs:38-44) must equal the recount from
    the final assignment."""
    rng = np.random.default_rng(2)
    n, k = 120, 4
    adj = {i: set() for i in range(n)}
    for _ in range(900):
        a, b = rng.integers(0, n, 2)
        if a != b:
            adj[int(a)].add(int(b))
            adj[int(b)].add(int(a))
    rows = [(v, sorted(s)) for v, s in adj.items()]
    cfg = CuttanaConfig(num_sub_partitions=16, max_refine_moves=0)
    res = cuttana_partition(rows, k, cfg)
    part = np.full(n, -1, dtype=np.int64)
    part[res.vertices] = res.partitions
    cut = sum(1 for v, s in adj.items() for u in s if part[v] != part[u]) // 2
    assert cut / res.edge_count == pytest.approx(res.edge_cut_ratio)


def test_pluggable_scorers_extension_surface():
    """Custom PartitionScorer/BufferScorer objects replace the defaults
    (↔ reference traits partition.rs:66-73, buffer.rs:121-133)."""
    from cuttana_ray.state.partitioner import StreamingPartitioner

    class RoundRobinScorer:
        def __init__(self):
            self.i = -1

        def find_best(self, nbr_partitions, sizes, num_partitions,
                      vertex_count, edge_count, slack):
            self.i = (self.i + 1) % num_partitions
            return self.i

    class ConstantBufferScorer:
        theta = 0.0
        degree_threshold = 1.0

        def score(self, nbrs, part_of):
            return float(len(nbrs))

        def update_score(self, old, nbrs):
            return old

    sp = StreamingPartitioner(6, 3, CuttanaConfig(num_sub_partitions=4,
                                                  max_refine_moves=0),
                              scorer=RoundRobinScorer(),
                              buffer_scorer=ConstantBufferScorer())
    for v in range(6):
        sp.consume(v, np.asarray([(v + 1) % 6]))
    res = sp.finalize()
    # round-robin global placement → perfectly balanced sizes
    assert res.partition_sizes.tolist() == [2, 2, 2]


def test_custom_buffer_scorer_honored_by_consume_batch():
    """Regression: the vectorized bulk-insert path hardcodes the Cuttana
    buffer formula; a custom buffer_scorer must route through per-row
    consume() and produce identical results to the per-row feed."""
    from cuttana_ray.sources.adjacency import adjacency_table, csr_batch
    from cuttana_ray.state.partitioner import StreamingPartitioner

    class InverseDegreeScorer:
        """Prefers evicting LOW-degree vertices — opposite of the default."""

        def score(self, nbrs, part_of):
            return 1.0 / (1 + len(nbrs))

        def update_score(self, old, nbrs):
            return old

    rng = np.random.default_rng(11)
    rows = [(v, sorted(set(rng.integers(0, 40, rng.integers(1, 6)).tolist())
                       - {v}))
            for v in range(40)]
    rows = [(v, n if n else [(v + 1) % 40]) for v, n in rows]
    cfg = CuttanaConfig(num_sub_partitions=4, max_buffer_size=8)

    sp_row = StreamingPartitioner(40, 3, cfg,
                                  buffer_scorer=InverseDegreeScorer())
    for v, nbrs in rows:
        sp_row.consume(v, np.asarray(nbrs, dtype=np.int64))
    res_row = sp_row.finalize()

    sp_bat = StreamingPartitioner(40, 3, cfg,
                                  buffer_scorer=InverseDegreeScorer())
    t = adjacency_table(rows)
    sp_bat.consume_batch(*csr_batch(t))
    res_bat = sp_bat.finalize()

    assert res_row.assignments() == res_bat.assignments()
