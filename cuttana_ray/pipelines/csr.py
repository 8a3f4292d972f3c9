"""Per-partition CSR adjacency blocks in a stateful actor pool — the
gather-scatter fast path for the iterative algorithms (SURVEY.md §2.3 T12,
§7 P4b; north-star requirement).

Each of the k Cuttana partitions gets one actor that builds, ONCE in its
constructor, an in-edge CSR over the vertices it owns (owner = partition of
``dst``). Every iteration is then k actor calls: the driver broadcasts the
current vertex-state vector (``ray.put`` once per iteration — shared-memory
read in every actor, not a per-batch ship), each actor runs a vectorized
gather + ``reduceat`` segment-reduce over its CSR, and returns results for
its owned vertices only. Cuttana's low edge-cut is what keeps the gather
working-set (distinct remote srcs per actor) small — on a real multi-node
cluster the rank vector would be exchanged per partition and cut edges are
exactly the bytes on the wire.

Results are bit-identical in label algorithms and allclose-1e-6 in PageRank
vs shuffle mode (summation order differs).

Setup cost note: each actor filters the shared edge blocks for its own rows
(zero-copy reads from the local object store). On a multi-node cluster this
becomes one hash ``repartition`` by owner so each node reads only its shard;
the filter keeps the sandbox path shuffle-free.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import ray
import ray.data

from cuttana_ray.pipelines.graph import Graph
from cuttana_ray.pipelines.labelprop import argmax_labels
from cuttana_ray.pipelines.pagerank import IterativeResult
from cuttana_ray.util import shard_cpu_reservation


# Messages under this size ship INLINE in the task result / argument (the
# driver relays the bytes) instead of through ray.put: a BSP round at k
# shards otherwise costs O(k²) object-store round-trips (~1ms each), which
# dominates when hub-splitting has already made the payloads small. Large
# payloads still take the zero-copy object-store path.
# BSP message payloads at or below this ride inline through the driver's
# route step; larger ones go ray.put → peer-to-peer object store.
# Env-tunable because the right point is workload-dependent (the round-4
# scaling investigation measured both regimes; see BASELINE.md).
_INLINE_MAX_BYTES = int(os.environ.get(
    "CUTTANA_INLINE_MAX_BYTES", str(256 << 10)))


def _payload_nbytes(obj) -> int:
    if obj is None:
        return 0
    if isinstance(obj, np.ndarray):
        return obj.nbytes
    if isinstance(obj, tuple):
        return sum(_payload_nbytes(o) for o in obj)
    return _INLINE_MAX_BYTES + 1


def _ship(obj):
    """Inline small payloads; ray.put large ones."""
    return obj if _payload_nbytes(obj) <= _INLINE_MAX_BYTES else ray.put(obj)


def _unship(incoming: list) -> list:
    """[(q, ref_or_payload)] → [(q, payload)] with ONE batched ray.get for
    the ref entries (parallel fetch instead of one round-trip each)."""
    idx = [i for i, (_, m) in enumerate(incoming)
           if isinstance(m, ray.ObjectRef)]
    fetched = ray.get([incoming[i][1] for i in idx]) if idx else []
    out = list(incoming)
    for j, i in enumerate(idx):
        out[i] = (incoming[i][0], fetched[j])
    return out


class _BSPShardMixin:
    """Shared sharded-BSP iteration math (PageRank / min-label / LPA with
    shard-resident vertex state). A concrete shard class must set, in its
    prepare phase: ``refs_sorted`` (sorted ids this shard references),
    ``pos_src`` / ``pos_owned`` / ``pos_inedge`` (positions into
    ``refs_sorted`` / ``owned_all``), ``owned_all`` (sorted owned ids),
    ``coef`` / ``starts`` / ``src`` / ``w`` (the in-edge CSR),
    ``dangling_owned``, ``vals``, ``damping``, ``V``, ``pos_need``
    (per-peer positions of remote values) and ``out_idx`` (per-peer
    positions of owned values to send). ``CSRShard`` keys ownership off a
    dense partition vector; ``bigv.HashShard`` off ``id % k`` with no dense
    array anywhere."""

    def _apply_incoming(self, incoming: list, target: np.ndarray) -> None:
        """Apply peer value messages to ``target``. Inline payloads apply
        directly; ref payloads resolve in ONE batched ray.get (parallel
        fetch instead of one round-trip each)."""
        for q, v in _unship(incoming):
            target[self.pos_need[q]] = v

    def sharded_iter(self, dm_over_v: float, incoming: list):
        """One BSP round: apply incoming remote values, gather+scatter over
        the local CSR, return (local delta, local dangling mass, message
        refs keyed by destination shard)."""
        self._apply_incoming(incoming, self.vals)
        d = self.damping
        base = (1.0 - d) / self.V + d * dm_over_v
        new = np.full(len(self.owned_all), base)
        if len(self.src):
            contrib = self.vals[self.pos_src] * self.coef
            gathered = np.add.reduceat(contrib, self.starts) \
                if len(self.starts) else np.empty(0, np.float64)
            new[self.pos_inedge] += d * gathered
        old = self.vals[self.pos_owned]
        delta = float(np.abs(new - old).sum())
        dangling_mass = float(new[self.dangling_owned].sum())
        self.vals[self.pos_owned] = new
        out = {p: _ship(new[idx]) for p, idx in self.out_idx.items()}
        return delta, dangling_mass, out

    def sharded_result(self):
        return self.owned_all, self.vals[self.pos_owned]

    def sharded_labels_init(self) -> bool:
        """Min-label state over the same topology (labels start as ids)."""
        self.lvals = self.refs_sorted.copy()
        return True

    def sharded_minlabel_iter(self, incoming: list):
        """One BSP min-label round; messages carry updated owned labels."""
        self._apply_incoming(incoming, self.lvals)
        old = self.lvals[self.pos_owned]
        new = old.copy()
        if len(self.src):
            gathered = np.minimum.reduceat(self.lvals[self.pos_src],
                                           self.starts)
            np.minimum.at(new, self.pos_inedge, gathered)
        changed = int((new != old).sum())
        self.lvals[self.pos_owned] = new
        out = {p: _ship(new[idx]) for p, idx in self.out_idx.items()}
        return changed, out

    def sharded_labels_result(self):
        return self.owned_all, self.lvals[self.pos_owned]

    def sharded_lpa_iter(self, incoming: list):
        """One BSP synchronous-LPA round. Every in-edge of an owned vertex
        lives in this shard (owner = partition of dst), so the per-dst
        (weight desc, label asc) argmax is fully local — bit-identical to
        the broadcast mode's globally combined argmax."""
        self._apply_incoming(incoming, self.lvals)
        old = self.lvals[self.pos_owned]
        new = old.copy()
        if len(self.src):
            lab = self.lvals[self.pos_src]
            dst_pos = np.repeat(self.pos_inedge, np.diff(
                np.concatenate([self.starts, [len(self.src)]])))
            w = self.w.astype(np.int64)
            # combine per-(dst,label) sums first, then argmax — matching
            # label_propagation(): sort by (dst, label), reduce, then pick
            order2 = np.lexsort((lab, dst_pos))
            d2, l2, w2 = dst_pos[order2], lab[order2], w[order2]
            change = np.nonzero((d2[1:] != d2[:-1])
                                | (l2[1:] != l2[:-1]))[0] + 1
            starts2 = np.concatenate([[0], change])
            dd, ll = d2[starts2], l2[starts2]
            ww = np.add.reduceat(w2, starts2)
            order3 = np.lexsort((ll, -ww, dd))
            d3 = dd[order3]
            first3 = np.concatenate(
                [[0], np.nonzero(d3[1:] != d3[:-1])[0] + 1])
            new[d3[first3]] = ll[order3][first3]
        changed = int((new != old).sum())
        self.lvals[self.pos_owned] = new
        out = {p: _ship(new[idx]) for p, idx in self.out_idx.items()}
        return changed, out


@ray.remote
class CSRShard(_BSPShardMixin):
    """In-edge CSR over one partition's owned vertices."""

    def __init__(self, block_refs: list, part, owner: int):
        # `part` / state vectors arrive as top-level ObjectRef args, which Ray
        # auto-resolves zero-copy from the local object store.
        self.owner = owner
        self.part = part
        srcs, dsts, ws = [], [], []
        for ref in block_refs:
            t = ray.get(ref)
            if len(t) == 0 or "dst" not in t.column_names:
                continue  # empty shuffle-output blocks are schemaless
            dst = t["dst"].to_numpy(zero_copy_only=False)
            keep = part[dst] == owner
            if keep.any():
                srcs.append(t["src"].to_numpy(zero_copy_only=False)[keep])
                dsts.append(dst[keep])
                ws.append(t["weight"].to_numpy(zero_copy_only=False)[keep])
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
            self.owned = dst[starts]  # unique dsts with in-edges, sorted
        else:
            self.src = np.empty(0, np.int64)
            self.w = np.empty(0, np.float64)
            self.starts = np.empty(0, np.int64)
            self.owned = np.empty(0, np.int64)


    def dump(self, path: str) -> int:
        """Persist this shard's CSR as its (src, dst, weight) edge rows —
        loading skips the global edge shuffle entirely."""
        import pyarrow.parquet as pq
        counts = np.diff(np.concatenate([self.starts, [len(self.src)]])) \
            if len(self.starts) else np.empty(0, np.int64)
        dst = np.repeat(self.owned, counts.astype(np.int64))
        t = pa.table({"src": pa.array(self.src, pa.int64()),
                      "dst": pa.array(dst, pa.int64()),
                      "weight": pa.array(self.w, pa.float64())})
        pq.write_table(t, path)
        return len(t)

    def ready(self) -> int:
        return len(self.owned)

    def prepare_pagerank(self, outw) -> bool:
        # static per-edge coefficient w/outw[src]: computed once so each
        # iteration does a single gather + multiply (bandwidth-bound kernel)
        self.coef = self.w / outw[self.src] if len(self.src) else self.w
        return True

    def owned_ids(self):
        """Static across iterations — the driver fetches this ONCE and the
        per-iteration calls below return values only (halves the
        per-round return payload vs shipping (owned, vals) every time)."""
        return self.owned

    def pagerank_iter(self, ranks):
        if not len(self.owned):
            return np.empty(0, np.float64)
        contrib = ranks[self.src] * self.coef
        return np.add.reduceat(contrib, self.starts)

    def minlabel_iter(self, labels):
        if not len(self.owned):
            return np.empty(0, np.int64)
        return np.minimum.reduceat(labels[self.src], self.starts)

    # -- sharded BSP PageRank (rank state lives IN the shards) ------------
    #
    # The broadcast mode above ships the full O(V) rank vector every
    # iteration; at the north-star scale that vector doesn't fit one node.
    # In sharded mode each shard owns its partition's rank slice and each
    # iteration exchanges ONLY the values its neighbors' gathers reference
    # — i.e. Cuttana's cut edges are literally the bytes on the wire. The
    # driver handles scalars (teleport, dangling mass, delta) and message
    # refs; it never materializes a vertex vector until the final result.

    def sharded_prepare1(self, outw, damping: float, V: int):
        """Report the remote vertices this shard's gather needs, by owner."""
        part = self.part
        self.V = V
        self.damping = damping
        self.owned_all = np.nonzero(part == self.owner)[0].astype(np.int64)
        # compact local value index over every vertex this shard references
        self.refs_sorted = np.unique(np.concatenate(
            [self.owned_all, self.src])) if len(self.src) or \
            len(self.owned_all) else np.empty(0, np.int64)
        self.pos_src = np.searchsorted(self.refs_sorted, self.src)
        self.pos_owned = np.searchsorted(self.refs_sorted, self.owned_all)
        self.pos_inedge = np.searchsorted(self.owned_all, self.owned)
        outw_safe = np.where(outw == 0.0, 1.0, outw)
        self.coef = self.w / outw_safe[self.src] if len(self.src) else self.w
        self.dangling_owned = outw[self.owned_all] == 0.0
        self.vals = np.full(len(self.refs_sorted), 1.0 / V)
        remote = self.refs_sorted[part[self.refs_sorted] != self.owner] \
            if len(self.refs_sorted) else np.empty(0, np.int64)
        owners = part[remote]
        self.pos_need = {}
        need: dict[int, np.ndarray] = {}
        for q in np.unique(owners).tolist():
            ids = remote[owners == q]
            need[int(q)] = ids
            self.pos_need[int(q)] = np.searchsorted(self.refs_sorted, ids)
        return need

    def sharded_prepare2(self, requests: dict):
        """Store, per requesting shard, the indices (into owned_all) of the
        values it needs each round."""
        self.out_idx = {
            int(p): np.searchsorted(self.owned_all, ids)
            for p, ids in requests.items()}
        return True

    def lpa_iter(self, labels):
        """Per owned dst: incoming weight per label → (dst, label, weight)
        rows, argmax'ed on the driver across shards (each dst is owned by
        exactly one shard, so the argmax could equally run here; returning
        the per-label sums keeps one shared code path with shuffle mode)."""
        if not len(self.owned):
            e = np.empty(0, np.int64)
            return e, e, e
        lab = labels[self.src]
        dst = np.repeat(self.owned, np.diff(
            np.concatenate([self.starts, [len(self.src)]])))
        order = np.lexsort((lab, dst))
        d_s, l_s, w_s = dst[order], lab[order], self.w[order].astype(np.int64)
        change = np.nonzero((d_s[1:] != d_s[:-1]) | (l_s[1:] != l_s[:-1]))[0] + 1
        starts = np.concatenate([[0], change])
        return d_s[starts], l_s[starts], np.add.reduceat(w_s, starts)


class CSRPool:
    """k CSRShard actors keyed by a partition assignment vector."""

    def __init__(self, graph: Graph, part_of: np.ndarray, num_partitions: int,
                 num_cpus_per_shard: float | None = None):
        self.graph = graph
        self._outw = None
        self.part_of = np.asarray(part_of, dtype=np.int32)
        self.V = graph.num_vertices
        block_refs = graph.edges.to_arrow_refs()
        part_ref = ray.put(part_of.astype(np.int32))
        if num_cpus_per_shard is None:
            # reserve less than cpus/k so the pool always fits the cluster
            # (k actors each demanding a full CPU would deadlock on a small
            # cluster) while still expressing contention honestly, AND keep
            # one whole CPU free for Ray Data utility tasks (see
            # util.shard_cpu_reservation)
            try:
                total = int(ray.cluster_resources().get("CPU", num_partitions))
            except Exception:
                total = num_partitions
            num_cpus_per_shard = shard_cpu_reservation(total, num_partitions)
        cls = CSRShard.options(num_cpus=num_cpus_per_shard)
        self.shards = [
            cls.remote(block_refs, part_ref, p)
            for p in range(num_partitions)
        ]
        ray.get([s.ready.remote() for s in self.shards])


    def _out_weights(self) -> np.ndarray:
        return self._outw if self._outw is not None \
            else self.graph.out_weights()

    def save(self, dirpath: str) -> None:
        """Persist the built index: per-shard CSR edge files + the O(V)
        out-weight and partition vectors + a manifest. A later ``load``
        skips BOTH the edge shuffle and the out-weight pass — the
        repeated-analytics path (same discipline as the persisted IVF
        index in functions/simsearch.py)."""
        import json
        import pyarrow.parquet as pq
        os.makedirs(dirpath, exist_ok=True)
        rows = ray.get([s.dump.remote(os.path.join(dirpath,
                                                   f"shard-{p:04d}.parquet"))
                        for p, s in enumerate(self.shards)])
        pq.write_table(pa.table({
            "outw": pa.array(self._out_weights(), pa.float64()),
            "part": pa.array(self.part_of.astype(np.int32), pa.int32()),
        }), os.path.join(dirpath, "vertex_state.parquet"))
        with open(os.path.join(dirpath, "manifest.json"), "w") as f:
            json.dump({"V": int(self.V), "k": len(self.shards),
                       "shard_rows": rows}, f)

    @classmethod
    def load(cls, dirpath: str,
             num_cpus_per_shard: float | None = None) -> "CSRPool":
        """Reconstruct a pool from ``save`` output without a Graph (and
        without any shuffle): each shard reads only its own file."""
        import json
        import pyarrow.parquet as pq
        with open(os.path.join(dirpath, "manifest.json")) as f:
            meta = json.load(f)
        vs = pq.read_table(os.path.join(dirpath, "vertex_state.parquet"))
        pool = object.__new__(cls)
        pool.graph = None
        pool._outw = vs["outw"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        pool.part_of = vs["part"].to_numpy(zero_copy_only=False) \
            .astype(np.int32)
        pool.V = int(meta["V"])
        k = int(meta["k"])
        part_ref = ray.put(pool.part_of)
        if num_cpus_per_shard is None:
            try:
                total = int(ray.cluster_resources().get("CPU", k))
            except Exception:
                total = k
            num_cpus_per_shard = shard_cpu_reservation(total, k)
        scls = CSRShard.options(num_cpus=num_cpus_per_shard)
        pool.shards = []
        for p in range(k):
            t = pq.read_table(os.path.join(dirpath,
                                           f"shard-{p:04d}.parquet"))
            pool.shards.append(scls.remote([ray.put(t)], part_ref, p))
        ray.get([s.ready.remote() for s in pool.shards])
        return pool

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []

    # -- algorithms -------------------------------------------------------
    def pagerank(self, damping: float = 0.85, tol: float = 1e-6,
                 max_iters: int = 100) -> IterativeResult:
        V = self.V
        outw = self._out_weights()
        dangling = outw == 0.0
        outw_ref = ray.put(np.where(dangling, 1.0, outw))
        ray.get([s.prepare_pagerank.remote(outw_ref) for s in self.shards])
        owned_lists = ray.get([s.owned_ids.remote() for s in self.shards])
        ranks = np.full(V, 1.0 / V)
        res = IterativeResult(ranks, 0, False)
        for it in range(max_iters):
            t0 = time.perf_counter()
            ranks_ref = ray.put(ranks)
            gathered = np.zeros(V)
            for owned, vals in zip(owned_lists, ray.get([
                    s.pagerank_iter.remote(ranks_ref)
                    for s in self.shards])):
                gathered[owned] = vals
            new = (1 - damping) / V + damping * (
                gathered + ranks[dangling].sum() / V)
            delta = float(np.abs(new - ranks).sum())
            ranks = new
            res.deltas.append(delta)
            res.seconds_per_iter.append(time.perf_counter() - t0)
            if delta < tol:
                res.iterations, res.converged = it + 1, True
                break
        else:
            res.iterations = max_iters
        res.values = ranks
        return res

    def pagerank_sharded(self, damping: float = 0.85, tol: float = 1e-6,
                         max_iters: int = 100) -> IterativeResult:
        """BSP PageRank with shard-resident rank state: per-iteration
        traffic is the cut-edge values plus three scalars per shard — the
        driver never holds a vertex vector inside the loop. Same results as
        the broadcast mode (gathers are identical; only the scalar
        reductions sum in a different order)."""
        V = self.V
        outw = self._sharded_prepare(damping)
        n_dangling = int((outw == 0.0).sum())
        k = len(self.shards)
        dangling_mass = n_dangling / V      # ranks start uniform at 1/V
        incoming: list[list] = [[] for _ in range(k)]
        res = IterativeResult(np.empty(0), 0, False)
        for it in range(max_iters):
            t0 = time.perf_counter()
            outs = ray.get([
                s.sharded_iter.remote(dangling_mass / V, incoming[p])
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
        ranks = np.zeros(V)
        for owned, vals in ray.get(
                [s.sharded_result.remote() for s in self.shards]):
            ranks[owned] = vals
        res.values = ranks
        return res

    def connected_components(self, max_iters: int = 200) -> IterativeResult:
        owned_lists = ray.get([s.owned_ids.remote() for s in self.shards])
        labels = np.arange(self.V, dtype=np.int64)
        res = IterativeResult(labels, 0, False)
        for it in range(max_iters):
            t0 = time.perf_counter()
            labels_ref = ray.put(labels)
            new = labels.copy()
            for owned, vals in zip(owned_lists, ray.get([
                    s.minlabel_iter.remote(labels_ref)
                    for s in self.shards])):
                np.minimum.at(new, owned, vals)
            changed = int((new != labels).sum())
            labels = new
            res.deltas.append(float(changed))
            res.seconds_per_iter.append(time.perf_counter() - t0)
            if changed == 0:
                res.iterations, res.converged = it + 1, True
                break
        else:
            res.iterations = max_iters
        res.values = labels
        return res

    def _sharded_prepare(self, damping: float = 0.85) -> np.ndarray:
        outw = self._out_weights()  # one-time setup pass
        outw_ref = ray.put(outw)
        needs = ray.get([
            s.sharded_prepare1.remote(outw_ref, damping, self.V)
            for s in self.shards])
        requests: list[dict] = [{} for _ in self.shards]
        for p, need in enumerate(needs):
            for q, ids in need.items():
                requests[q][p] = ids
        ray.get([s.sharded_prepare2.remote(requests[q])
                 for q, s in enumerate(self.shards)])
        return outw

    def connected_components_sharded(self,
                                     max_iters: int = 200) -> IterativeResult:
        """BSP min-label propagation with shard-resident label state;
        bit-identical to the broadcast mode (integer minima)."""
        self._sharded_prepare()
        ray.get([s.sharded_labels_init.remote() for s in self.shards])
        k = len(self.shards)
        incoming: list[list] = [[] for _ in range(k)]
        res = IterativeResult(np.empty(0), 0, False)
        for it in range(max_iters):
            t0 = time.perf_counter()
            outs = ray.get([s.sharded_minlabel_iter.remote(incoming[p])
                            for p, s in enumerate(self.shards)])
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
        labels = np.zeros(self.V, dtype=np.int64)
        for owned, vals in ray.get(
                [s.sharded_labels_result.remote() for s in self.shards]):
            labels[owned] = vals
        res.values = labels
        return res

    def label_propagation_sharded(self,
                                  max_iters: int = 10) -> IterativeResult:
        """BSP synchronous LPA with shard-resident label state; bit-
        identical to the broadcast mode (each dst's full in-edge set lives
        in its owner shard, so local argmax == global argmax)."""
        self._sharded_prepare()
        ray.get([s.sharded_labels_init.remote() for s in self.shards])
        k = len(self.shards)
        incoming: list[list] = [[] for _ in range(k)]
        res = IterativeResult(np.empty(0), 0, False)
        for it in range(max_iters):
            t0 = time.perf_counter()
            outs = ray.get([s.sharded_lpa_iter.remote(incoming[p])
                            for p, s in enumerate(self.shards)])
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
        labels = np.zeros(self.V, dtype=np.int64)
        for owned, vals in ray.get(
                [s.sharded_labels_result.remote() for s in self.shards]):
            labels[owned] = vals
        res.values = labels
        return res

    def label_propagation(self, max_iters: int = 10) -> IterativeResult:
        labels = np.arange(self.V, dtype=np.int64)
        res = IterativeResult(labels, 0, False)
        for it in range(max_iters):
            t0 = time.perf_counter()
            labels_ref = ray.put(labels)
            parts = ray.get([s.lpa_iter.remote(labels_ref)
                             for s in self.shards])
            d = np.concatenate([p[0] for p in parts])
            l = np.concatenate([p[1] for p in parts])
            w = np.concatenate([p[2] for p in parts])
            new = argmax_labels(d, l, w, labels) if len(d) else labels.copy()
            changed = int((new != labels).sum())
            labels = new
            res.deltas.append(float(changed))
            res.seconds_per_iter.append(time.perf_counter() - t0)
            if changed == 0:
                res.iterations, res.converged = it + 1, True
                break
        else:
            res.iterations = max_iters
        res.values = labels
        return res
