"""Big-V mode: hash-id vocabulary encode + shard-resident iterative state —
the north-star regime (10^11+ conversation-id vertices,
``BASELINE.json north_star``) where NO O(V) object may exist on any single
node, driver included.

The default path (``stages/vocab.py``) assigns dense ids by sorted-name rank
and *broadcasts* the dimension table into every encode task — exact, but the
broadcast ceases to exist at 10^11 names. Here instead:

* **ids are 63-bit FNV-1a hashes of the node names** (the vectorized
  zero-copy kernel from ``functions/dedup.py``), so encode is a stateless
  per-batch map — no dimension table, no broadcast, no shuffle.
* **collision safety is a distributed check, not an assumption**: unique
  (hash, name) pairs go through one sort-based exchange and adjacent rows
  are compared per block (driver sees O(#blocks) boundary metadata). Two
  names sharing one hash raises ``HashCollisionError`` instead of silently
  merging vertices. (At 10^11 names a 63-bit space expects a few hundred
  birthday collisions — the production answer is 128-bit ids; the check is
  what makes the 63-bit default honest.)
* **vertex state lives in the shards** (``HashShardPool``): ownership is
  the pure function ``id % k`` — no dense partition vector anywhere — and
  out-weights are aggregated shard-side from each shard's own edge rows and
  exchanged once for the remote gather working set (object-store refs; the
  driver routes refs and scalars only). Per-iteration traffic is cut-edge
  values, exactly like ``CSRPool.pagerank_sharded``.

The driver never holds: the vocabulary, a partition vector, an out-weight
vector, or a rank vector. Results come back as a ``ray.data.Dataset`` of
(node_id, rank) built from per-shard Arrow blocks.

Partitioning note: ``id % k`` on hash ids IS the hash-partition baseline —
the Cuttana-quality partitioner is a sequential stream over the adjacency
(``state/partitioner.py``) whose assignment *vector* is itself O(V); at
big-V scale its assignment would be carried as a distributed (id →
partition) table joined onto edges, which this module deliberately does not
fake on the sandbox (documented trade; quality metrics for the hash
baseline are what apply here).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from cuttana_ray.functions.dedup import _hash_strings
from cuttana_ray.pipelines.csr import _BSPShardMixin
from cuttana_ray.pipelines.pagerank import IterativeResult
from cuttana_ray.util import pool_size

_MASK63 = np.uint64((1 << 63) - 1)


class HashCollisionError(RuntimeError):
    pass


def hash_name_ids(names) -> np.ndarray:
    """63-bit FNV-1a ids (non-negative int64) for a string array/list."""
    return (_hash_strings(names) & _MASK63).astype(np.int64)


def symmetrize_string_edges(canonical: "ray.data.Dataset"
                            ) -> "ray.data.Dataset":
    """Canonical string edge table (one row per unordered pair) → doubled
    adjacency form (both directions, self-loops dropped) — the same
    contract ``stages.edges.symmetrize`` provides for encoded edges, as a
    flat per-batch map (no exchange)."""
    def double(t: pa.Table) -> pa.Table:
        sch = pa.schema([("src", pa.string()), ("dst", pa.string()),
                         ("weight", pa.int64())])
        if len(t) == 0 or "src" not in t.column_names:
            return sch.empty_table()
        fwd = pa.table({"src": pc.cast(t["src"], pa.string()),
                        "dst": pc.cast(t["dst"], pa.string()),
                        "weight": pc.cast(t["weight"], pa.int64())})
        rev = pa.table({"src": fwd["dst"], "dst": fwd["src"],
                        "weight": fwd["weight"]})
        both = pa.concat_tables([fwd, rev])
        return both.filter(
            pc.invert(pc.equal(both["src"], both["dst"]))).cast(sch)

    return canonical.map_batches(double, batch_format="pyarrow")


def hash_encode_edges(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """String edge table → int64 edge table, stateless per batch (no vocab
    object anywhere). Run ``check_hash_collisions`` once per corpus before
    trusting the ids."""
    def enc(batch: pa.Table) -> pa.Table:
        sch = pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                         ("weight", pa.int64())])
        if len(batch) == 0 or "src" not in batch.column_names:
            return sch.empty_table()
        return pa.table({
            "src": pa.array(hash_name_ids(
                pc.cast(batch["src"], pa.string()))),
            "dst": pa.array(hash_name_ids(
                pc.cast(batch["dst"], pa.string()))),
            "weight": pc.cast(batch["weight"], pa.int64()),
        })

    return edges.map_batches(enc, batch_format="pyarrow")


@ray.remote
def _collision_block(t: pa.Table) -> dict:
    """Adjacent-row collision scan within one (h, name)-sorted block."""
    if len(t) == 0 or "h" not in t.column_names:
        return {"empty": True}
    h = t["h"].to_numpy(zero_copy_only=False)
    name = t["name"].combine_chunks()
    same_h = h[1:] == h[:-1]
    diff_name = np.invert(pc.equal(name.slice(1), name.slice(0, len(t) - 1))
                          .to_numpy(zero_copy_only=False))
    return {"empty": False,
            "collisions": int((same_h & diff_name).sum()),
            "first": (int(h[0]), name[0].as_py()),
            "last": (int(h[-1]), name[len(t) - 1].as_py())}


def check_hash_collisions(edges: "ray.data.Dataset") -> int:
    """Distributed collision check over every node name in a string edge
    table. One sort-based exchange over per-block-unique (hash, name) pairs
    (the mostly-distinct-keys discipline from ``stages/vocab.py``); the
    driver sees per-block counts + boundary rows only. Raises
    ``HashCollisionError`` if any two distinct names share a 63-bit id;
    returns the number of distinct-name adjacencies checked (0 = clean)."""
    def pairs(batch: pa.Table) -> pa.Table:
        sch = pa.schema([("h", pa.int64()), ("name", pa.string())])
        if len(batch) == 0 or "src" not in batch.column_names:
            return sch.empty_table()
        u = pc.unique(pa.chunked_array([
            pc.cast(batch["src"], pa.string()).combine_chunks(),
            pc.cast(batch["dst"], pa.string()).combine_chunks(),
        ]).combine_chunks())
        return pa.table({"h": pa.array(hash_name_ids(u)), "name": u})

    srt = edges.map_batches(pairs, batch_format="pyarrow") \
        .sort(["h", "name"]).materialize()
    metas = ray.get([_collision_block.remote(r)
                     for r in srt.to_arrow_refs()])
    n = 0
    prev = None
    for m in metas:
        if m.get("empty"):
            continue
        n += m["collisions"]
        if prev is not None and prev[0] == m["first"][0] \
                and prev[1] != m["first"][1]:
            n += 1
        prev = m["last"]
    if n:
        raise HashCollisionError(
            f"{n} node-name pairs collide in the 63-bit id space; "
            "re-key with wider ids before running big-V analytics")
    return n


@ray.remote
class HashShard(_BSPShardMixin):
    """One shard of the big-V BSP pool. Owns every vertex v with
    ``v % k == owner``; holds the in-edge CSR over its owned dsts, its
    owned out-weights, and (after prepare) its slice of the vertex state.
    No dense vertex-indexed array appears anywhere — all state is keyed by
    sorted sparse id arrays + searchsorted positions."""

    def __init__(self, block_refs: list, owner: int, k: int):
        self.owner = owner
        self.k = k
        srcs, dsts, ws = [], [], []
        osrc, osw = [], []
        for ref in block_refs:
            t = ray.get(ref)
            if len(t) == 0 or "dst" not in t.column_names:
                continue
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            w = t["weight"].to_numpy(zero_copy_only=False)
            keep = (dst % k) == owner
            if keep.any():
                srcs.append(src[keep])
                dsts.append(dst[keep])
                ws.append(w[keep])
            ks = (src % k) == owner
            if ks.any():
                # out-weight partials for owned sources
                u, inv = np.unique(src[ks], return_inverse=True)
                osrc.append(u)
                osw.append(np.bincount(inv, weights=w[ks].astype(np.float64)))
        # in-edge CSR (same layout as CSRShard)
        if srcs:
            src = np.concatenate(srcs)
            dst = np.concatenate(dsts)
            w = np.concatenate(ws).astype(np.float64)
            order = np.lexsort((src, dst))
            self.src = src[order]
            self.w = w[order]
            dst = dst[order]
            starts = np.concatenate(
                [[0], np.nonzero(dst[1:] != dst[:-1])[0] + 1])
            self.starts = starts
            self.owned_dst = dst[starts]
        else:
            self.src = np.empty(0, np.int64)
            self.w = np.empty(0, np.float64)
            self.starts = np.empty(0, np.int64)
            self.owned_dst = np.empty(0, np.int64)
        # owned out-weights (combine block partials)
        if osrc:
            allsrc = np.concatenate(osrc)
            allw = np.concatenate(osw)
            self.osrc, inv = np.unique(allsrc, return_inverse=True)
            self.outw_own = np.bincount(inv, weights=allw)
        else:
            self.osrc = np.empty(0, np.int64)
            self.outw_own = np.empty(0, np.float64)
        # owned universe: every owned id seen as dst or src
        self.owned_all = np.unique(np.concatenate(
            [self.owned_dst, self.osrc]))

    def ready(self) -> int:
        """Owned-vertex count (each id is owned by exactly one shard)."""
        return len(self.owned_all)

    def prepare1(self, damping: float):
        """Index the local working set; report remote gather needs, grouped
        by owner shard."""
        self.damping = damping
        self.refs_sorted = np.unique(np.concatenate(
            [self.owned_all, self.src]))
        self.pos_src = np.searchsorted(self.refs_sorted, self.src)
        self.pos_owned = np.searchsorted(self.refs_sorted, self.owned_all)
        self.pos_inedge = np.searchsorted(self.owned_all, self.owned_dst)
        remote = self.refs_sorted[(self.refs_sorted % self.k) != self.owner]
        owners = remote % self.k
        self.pos_need = {}
        need: dict[int, np.ndarray] = {}
        for q in np.unique(owners).tolist():
            ids = remote[owners == q]
            need[int(q)] = ids
            self.pos_need[int(q)] = np.searchsorted(self.refs_sorted, ids)
        return need

    def _owned_outw(self, ids: np.ndarray) -> np.ndarray:
        """Out-weight for owned ids (0 when the id has no out-edges)."""
        out = np.zeros(len(ids), np.float64)
        if len(self.osrc):
            pos = np.searchsorted(self.osrc, ids)
            pos_c = np.minimum(pos, len(self.osrc) - 1)
            hit = self.osrc[pos_c] == ids
            out[hit] = self.outw_own[pos_c[hit]]
        return out

    def prepare2(self, requests: dict):
        """Store per-peer send positions; return per-peer out-weight refs
        for the ids each peer's gather references (one-time exchange)."""
        self.out_idx = {
            int(p): np.searchsorted(self.owned_all, ids)
            for p, ids in requests.items()}
        return {int(p): ray.put(self._owned_outw(np.asarray(ids)))
                for p, ids in requests.items()}

    def prepare3(self, V: int, incoming_outw: list) -> int:
        """Assemble the local out-weight slice (owned + received remote),
        build the static PageRank coefficient, init uniform rank state.
        Returns the local dangling count."""
        self.V = V
        outw = np.zeros(len(self.refs_sorted), np.float64)
        outw[self.pos_owned] = self._owned_outw(self.owned_all)
        for q, ref in incoming_outw:
            outw[self.pos_need[q]] = ray.get(ref)
        outw_safe = np.where(outw == 0.0, 1.0, outw)
        self.coef = self.w / outw_safe[self.pos_src] if len(self.src) \
            else self.w
        self.dangling_owned = outw[self.pos_owned] == 0.0
        self.vals = np.full(len(self.refs_sorted), 1.0 / V)
        return int(self.dangling_owned.sum())

    def result_table(self) -> pa.Table:
        ids, vals = self.sharded_result()
        return pa.table({"node_id": pa.array(ids, pa.int64()),
                         "rank": pa.array(vals, pa.float64())})

    def labels_result_table(self) -> pa.Table:
        ids, vals = self.sharded_labels_result()
        return pa.table({"node_id": pa.array(ids, pa.int64()),
                         "label": pa.array(vals, pa.int64())})


class HashShardPool:
    """k ``HashShard`` actors over a hash-id int64 edge table."""

    def __init__(self, edges: "ray.data.Dataset", num_shards: int,
                 num_cpus_per_shard: float | None = None):
        block_refs = edges.to_arrow_refs()
        if num_cpus_per_shard is None:
            try:
                total = int(ray.cluster_resources().get("CPU", num_shards))
            except Exception:
                total = num_shards
            num_cpus_per_shard = max(0.05, min(1.0, total / num_shards / 1.5))
        cls = HashShard.options(num_cpus=num_cpus_per_shard)
        self.shards = [cls.remote(block_refs, p, num_shards)
                       for p in range(num_shards)]
        self.V = int(sum(ray.get([s.ready.remote() for s in self.shards])))

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []

    def _prepare(self, damping: float) -> float:
        """Full BSP prepare; returns the initial dangling mass."""
        needs = ray.get([s.prepare1.remote(damping) for s in self.shards])
        requests: list[dict] = [{} for _ in self.shards]
        for p, need in enumerate(needs):
            for q, ids in need.items():
                requests[q][p] = ids
        outw_msgs = ray.get([s.prepare2.remote(requests[q])
                             for q, s in enumerate(self.shards)])
        incoming: list[list] = [[] for _ in self.shards]
        for q, msgs in enumerate(outw_msgs):
            for p, ref in msgs.items():
                incoming[p].append((q, ref))
        n_dangling = ray.get([s.prepare3.remote(self.V, incoming[p])
                              for p, s in enumerate(self.shards)])
        return float(sum(n_dangling)) / self.V

    def pagerank(self, damping: float = 0.85, tol: float = 1e-6,
                 max_iters: int = 100) -> "tuple[IterativeResult, ray.data.Dataset]":
        """Sharded-BSP PageRank; per-iteration driver traffic is three
        scalars + message refs per shard. Returns (IterativeResult with
        empty ``values`` — the scores are NOT collected — and the
        distributed (node_id, rank) Dataset)."""
        dangling_mass = self._prepare(damping)
        k = len(self.shards)
        incoming: list[list] = [[] for _ in range(k)]
        res = IterativeResult(np.empty(0), 0, False)
        for it in range(max_iters):
            t0 = time.perf_counter()
            outs = ray.get([
                s.sharded_iter.remote(dangling_mass / self.V, incoming[p])
                for p, s in enumerate(self.shards)])
            delta = float(sum(o[0] for o in outs))
            dangling_mass = float(sum(o[1] for o in outs))
            incoming = [[] for _ in range(k)]
            for q, (_, _, msgs) in enumerate(outs):
                for p, ref in msgs.items():
                    incoming[p].append((q, ref))
            res.deltas.append(delta)
            res.seconds_per_iter.append(time.perf_counter() - t0)
            if delta < tol:
                res.iterations, res.converged = it + 1, True
                break
        else:
            res.iterations = max_iters
        refs = [s.result_table.remote() for s in self.shards]
        return res, ray.data.from_arrow_refs(refs)

    def connected_components(self, max_iters: int = 200
                             ) -> "tuple[IterativeResult, ray.data.Dataset]":
        """Sharded-BSP min-label components over hash ids (component label
        = min member id). Needs the same prepare exchange for positions."""
        self._prepare(0.85)
        res = _lpa_labels_pool_loop(self, max_iters, "sharded_minlabel_iter")
        refs = [s.labels_result_table.remote() for s in self.shards]
        return res, ray.data.from_arrow_refs(refs)

    def label_propagation(self, max_iters: int = 10
                          ) -> "tuple[IterativeResult, ray.data.Dataset]":
        """Sharded-BSP synchronous weighted LPA over hash ids: labels start
        as the vertex's own hash id; each round every vertex adopts the
        incoming label with max total edge weight, ties to the SMALLEST
        label (note: the tie ordering is over hash ids, so tie-broken
        labels can differ from the dense-id path's — same partition
        semantics, different representative)."""
        self._prepare(0.85)
        res = _lpa_labels_pool_loop(self, max_iters, "sharded_lpa_iter")
        refs = [s.labels_result_table.remote() for s in self.shards]
        return res, ray.data.from_arrow_refs(refs)


def _lpa_labels_pool_loop(pool: "HashShardPool", max_iters: int,
                          iter_method: str) -> IterativeResult:
    """Shared BSP label loop (min-label / LPA) over a prepared pool."""
    ray.get([s.sharded_labels_init.remote() for s in pool.shards])
    k = len(pool.shards)
    incoming: list[list] = [[] for _ in range(k)]
    res = IterativeResult(np.empty(0), 0, False)
    for it in range(max_iters):
        t0 = time.perf_counter()
        outs = ray.get([getattr(s, iter_method).remote(incoming[p])
                        for p, s in enumerate(pool.shards)])
        changed = int(sum(o[0] for o in outs))
        incoming = [[] for _ in range(k)]
        for q, (_, msgs) in enumerate(outs):
            for p, ref in msgs.items():
                incoming[p].append((q, ref))
        res.deltas.append(float(changed))
        res.seconds_per_iter.append(time.perf_counter() - t0)
        if changed == 0:
            res.iterations, res.converged = it + 1, True
            break
    else:
        res.iterations = max_iters
    return res


def hash_mod_quality(enc: "ray.data.Dataset", num_shards: int) -> dict:
    """Partition-quality metrics for the big-V ``id % k`` ownership rule,
    computed fully distributed over the doubled int64 edge table: each block
    emits (cut-endpoints, per-partition edge-load bincount); the driver
    combines k+2 scalars per block — no O(V) object anywhere. Mirrors the
    cut-ratio / balance definitions of ``stages.metrics.partition_quality``
    (reference ``/root/reference/src/metrics.rs`` semantics) with edge load
    standing in for vertex load (the natural balance target when vertex
    identity is a hash)."""
    k = num_shards

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "src" not in t.column_names:
            return pa.table({"cut": pa.array([], pa.int64()),
                             "rows": pa.array([], pa.int64()),
                             "load": pa.array([], pa.list_(pa.int64()))})
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        sp = (src % k).astype(np.int64)
        dp = (dst % k).astype(np.int64)
        return pa.table({
            "cut": pa.array([int((sp != dp).sum())], pa.int64()),
            "rows": pa.array([len(src)], pa.int64()),
            "load": pa.array([np.bincount(dp, minlength=k).tolist()],
                             pa.list_(pa.int64())),
        })

    pdf = enc.map_batches(partial, batch_format="pyarrow").to_pandas()
    doubled_cut = int(pdf["cut"].sum())
    doubled_rows = int(pdf["rows"].sum())
    load = np.zeros(k, np.int64)
    for row in pdf["load"]:
        load += np.asarray(row, np.int64)
    mean_load = load.mean() if k else 0.0
    return {
        "num_partitions": k,
        # directed-rows convention (2E), matching
        # stages.metrics.partition_quality so edges/sec-per-iter numbers
        # compare 1:1 across the dense and big-V flagships
        "edge_count": doubled_rows,
        "cut_count": doubled_cut // 2,
        "cut_ratio": (doubled_cut / doubled_rows) if doubled_rows else 0.0,
        "edge_load_max": int(load.max()) if k else 0,
        "edge_balance": float(load.max() / mean_load) if mean_load else 0.0,
    }


def triangles_bigv(enc: "ray.data.Dataset", num_partitions: int | None = None
                   ) -> "tuple[int, ray.data.Dataset]":
    """Exact per-vertex triangle counts over arbitrary int64 (hash) ids with
    NO O(V) object anywhere — the big-V counterpart of
    ``pipelines.triangles.triangle_count``:

    * degrees: one distributed groupby over the doubled edge table (the
      dense path broadcasts an O(V) degree vector instead),
    * degree orientation: two hash joins attach (deg, id) to both endpoints,
      then a per-batch filter keeps each undirected edge once oriented
      low→high — same O(sqrt(E)) out-neighborhood bound as the dense path,
    * wedges + closing edges: distributed hash joins (identical shape to
      ``_triangles_join``),
    * per-vertex counts: per-batch partials → one groupby Sum → left join
      back onto the vertex universe (zero-fill), returned as a distributed
      (node_id, tri_count) Dataset.

    Returns ``(total_triangles, per_vertex_dataset)``.
    """
    from ray.data.aggregate import Count, Sum

    from cuttana_ray.util import pool_size, safe_join

    deg = enc.groupby("src").aggregate(Count(alias_name="_deg")) \
        .materialize()
    if num_partitions is None:
        n_edges = enc.count() // 2
        num_partitions = max(1, min(pool_size()[1], n_edges // 65536 + 1))

    ed = safe_join(enc.select_columns(["src", "dst"]),
                   deg.rename_columns({"src": "_a", "_deg": "_du"}),
                   join_type="inner", num_partitions=num_partitions,
                   on=("src",), right_on=("_a",))
    ed = safe_join(ed, deg.rename_columns({"src": "_b", "_deg": "_dv"}),
                   join_type="inner", num_partitions=num_partitions,
                   on=("dst",), right_on=("_b",))

    def orient(t: pa.Table) -> pa.Table:
        sch = pa.schema([("u", pa.int64()), ("v", pa.int64())])
        if len(t) == 0 or "src" not in t.column_names:
            return sch.empty_table()
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        du = t["_du"].to_numpy(zero_copy_only=False)
        dv = t["_dv"].to_numpy(zero_copy_only=False)
        keep = (du < dv) | ((du == dv) & (s < d))
        return pa.table({"u": pa.array(s[keep], pa.int64()),
                         "v": pa.array(d[keep], pa.int64())})

    o = ed.map_batches(orient, batch_format="pyarrow").materialize()

    universe = deg.rename_columns({"src": "node_id"}) \
        .select_columns(["node_id"])

    def zero_counts(t: pa.Table) -> pa.Table:
        return pa.table({
            "node_id": pc.cast(t["node_id"], pa.int64()),
            "tri_count": pa.array(np.zeros(len(t), np.int64))})

    if o.count() == 0:
        return 0, universe.map_batches(zero_counts, batch_format="pyarrow")

    wedges = safe_join(o, o.rename_columns({"u": "v2", "v": "w"}),
                       join_type="inner", num_partitions=num_partitions,
                       on=("v",), right_on=("v2",)).materialize()
    if wedges.count() == 0:
        return 0, universe.map_batches(zero_counts, batch_format="pyarrow")
    tri = safe_join(wedges, o.rename_columns({"u": "cu", "v": "cv"}),
                    join_type="inner", num_partitions=num_partitions,
                    on=("u", "w"), right_on=("cu", "cv")).materialize()
    total = tri.count()

    def pv_partial(t: pa.Table) -> pa.Table:
        sch = pa.schema([("vertex", pa.int64()), ("partial", pa.int64())])
        if len(t) == 0 or "u" not in t.column_names:
            return sch.empty_table()
        ids = np.concatenate([t["u"].to_numpy(zero_copy_only=False),
                              t["v"].to_numpy(zero_copy_only=False),
                              t["w"].to_numpy(zero_copy_only=False)])
        uniq, cnt = np.unique(ids, return_counts=True)
        return pa.table({"vertex": pa.array(uniq, pa.int64()),
                         "partial": pa.array(cnt.astype(np.int64))})

    counts = tri.map_batches(pv_partial, batch_format="pyarrow") \
        .groupby("vertex").aggregate(Sum("partial", alias_name="_tc"))
    joined = safe_join(universe, counts, join_type="left_outer",
                       num_partitions=num_partitions,
                       on=("node_id",), right_on=("vertex",))

    def finish(t: pa.Table) -> pa.Table:
        sch = pa.schema([("node_id", pa.int64()), ("tri_count", pa.int64())])
        if len(t) == 0 or "node_id" not in t.column_names:
            return sch.empty_table()
        return pa.table({
            "node_id": pc.cast(t["node_id"], pa.int64()),
            "tri_count": pc.cast(pc.fill_null(t["_tc"], 0), pa.int64())})

    return total, joined.map_batches(finish, batch_format="pyarrow")


def pagerank_bigv(edges_str: "ray.data.Dataset", num_shards: int = 16,
                  damping: float = 0.85, tol: float = 1e-6,
                  max_iters: int = 100, check_collisions: bool = True
                  ) -> "tuple[IterativeResult, ray.data.Dataset]":
    """End-to-end big-V PageRank over a STRING edge table: hash encode →
    symmetrization is the caller's concern (pass the table in the same
    doubled-adjacency form the dense path uses) → collision check →
    shard pool → BSP iterations. No O(V) object on the driver at any
    point; the result is a distributed (node_id, rank) Dataset keyed by
    hash ids (``hash_name_ids`` maps names → ids for lookups)."""
    if check_collisions:
        check_hash_collisions(edges_str)
    enc = hash_encode_edges(edges_str).materialize()
    pool = HashShardPool(enc, num_shards)
    try:
        return pool.pagerank(damping=damping, tol=tol, max_iters=max_iters)
    finally:
        pool.shutdown()
