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

Partitioning note: ``id % k`` on hash ids is the hash-partition BASELINE;
Cuttana-quality partitioning in this regime is
``bigv_cuttana_assignment`` — the sequential streaming partitioner
(``state/partitioner.py``, O(V) state by the reference's own design) runs
inside ONE Ray task over the sorted-hash-id adjacency, and its assignment
is carried as a distributed (node_id → partition) Dataset. It is consumed
two ways, never as a dense vector: by JOIN for cut metrics
(``partition_quality_join``) and — the point of the whole exercise — as
the SHARD OWNERSHIP of the BSP pool (``HashShardPool(assignment=...)``):
``attach_edge_partitions`` carries both endpoint partitions through the
one routing exchange, each shard rebuilds owner(id) for exactly the ids
its own rows reference from the carried columns (a local sparse map,
O(local edges)), and the FENNEL-quality cut shows up directly as fewer
boundary messages per superstep (``exchange_stats``) — the reference's
cut-quality-reduces-communication purpose
(/root/reference/src/partition.rs:88-100) realized at big-V scale.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from cuttana_ray.functions.dedup import _hash_strings
from cuttana_ray.pipelines.csr import _BSPShardMixin, _ship, _unship
from cuttana_ray.pipelines.pagerank import IterativeResult
from cuttana_ray.util import pool_size, shard_cpu_reservation

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


def _insorted(sorted_arr: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``vals`` in a sorted array."""
    if len(sorted_arr) == 0 or len(vals) == 0:
        return np.zeros(len(vals), dtype=bool)
    pos = np.searchsorted(sorted_arr, vals)
    pos_c = np.minimum(pos, len(sorted_arr) - 1)
    return sorted_arr[pos_c] == vals


@ray.remote
class HashShard(_BSPShardMixin):
    """One shard of the big-V BSP pool. Owns every vertex v with
    ``v % k == owner``; holds the in-edge CSR over its owned dsts, its
    owned out-weights, and (after prepare) its slice of the vertex state.
    No dense vertex-indexed array appears anywhere — all state is keyed by
    sorted sparse id arrays + searchsorted positions.

    **Hub splitting (vertex-cut for in-degree skew).** With purely
    dst-partitioned in-edges, a degree-D hub concentrates its ENTIRE
    adjacency (O(D) rows — O(V) for a conv→tool mega-hub) on one shard,
    which then serializes every BSP round. So in-edges whose dst is in the
    broadcast ``hubs`` list (discovered distributed by the pool: vertices
    with in-degree ≥ threshold; the list is ≤ E/threshold entries — a few
    thousand by construction) are instead partitioned by ``src % k``: every
    shard keeps the hub in-edges of its OWNED sources, locally
    pre-aggregates each round (sum / min / per-label sum), and ships one
    small per-hub partial vector to the hub's owner — the mirror/combiner
    vertex-cut scheme of PowerGraph (Gonzalez et al., OSDI 2012) applied
    only to the bounded hot-key set, as Pregel-style combiners. Per-round
    hub traffic is O(k · #hubs), and no shard ever holds more than its
    balanced share of edge rows."""

    def __init__(self, block_refs: list, owner: int, k: int,
                 hubs: np.ndarray | None = None,
                 pre_routed: bool = False,
                 hub_parts: np.ndarray | None = None,
                 parts_routed: bool = False):
        self.owner = owner
        self.k = k
        self.parts_routed = bool(parts_routed)
        if parts_routed and not pre_routed:
            raise ValueError("parts_routed requires pre-routed blocks "
                             "(attach_edge_partitions + route_edge_blocks)")
        self.hubs = np.sort(np.asarray(hubs, np.int64)) \
            if hubs is not None and len(hubs) else np.empty(0, np.int64)
        if parts_routed:
            # hub ownership under the Cuttana assignment, aligned with
            # the SORTED hub list (the pool looks the parts up once,
            # distributed, and broadcasts the small aligned array)
            if hub_parts is None or len(hub_parts) != len(self.hubs):
                raise ValueError("parts_routed shard needs hub_parts "
                                 "aligned with the sorted hub list")
            self.hub_owner = np.asarray(hub_parts, np.int64)
        else:
            self.hub_owner = (self.hubs % k).astype(np.int64)
        srcs, dsts, ws = [], [], []
        hsrcs, hdsts, hws = [], [], []
        osrc, osw = [], []
        pm_ids, pm_parts = [], []
        for ref in block_refs:
            t = ray.get(ref)
            if len(t) == 0 or "dst" not in t.column_names:
                continue
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            w = t["weight"].to_numpy(zero_copy_only=False)
            if pre_routed:
                # rows arrived via route_edge_blocks: role 0 = this
                # shard's non-hub in-edges, role 1 = its owned-src rows
                role = t["role"].to_numpy(zero_copy_only=False)
                keep = role == 0
                ks = role == 1
                if parts_routed:
                    sp = t["src_part"].to_numpy(zero_copy_only=False)
                    dp = t["dst_part"].to_numpy(zero_copy_only=False)
                    # local sparse ownership map: every id this shard will
                    # ever reference appears on one of its own rows with
                    # its partition carried — O(local edges) state, no
                    # global partition vector anywhere (the whole point)
                    pm_ids.append(src)
                    pm_parts.append(sp)
                    pm_ids.append(dst)
                    pm_parts.append(dp)
                    own_dst = dp == owner
                    own_src = sp == owner
                else:
                    own_dst = (dst % k) == owner
                    own_src = (src % k) == owner
                # routing invariant: role-0 rows are OUR non-hub in-edges,
                # role-1 rows are OUR owned-src rows. A violation means
                # route_edge_blocks delivered another shard's rows (the
                # mixed-block bug class) — fail loudly, a silent drop or
                # double-count corrupts every downstream algorithm.
                if (keep & (~own_dst | _insorted(self.hubs, dst))).any() \
                        or (ks & ~own_src).any():
                    raise ValueError(
                        f"HashShard {owner}: received misrouted edge rows "
                        "(route_edge_blocks invariant violated)")
                hkeep = ks & _insorted(self.hubs, dst)
            else:
                dst_hub = _insorted(self.hubs, dst)
                keep = ((dst % k) == owner) & ~dst_hub
                ks = (src % k) == owner
                hkeep = dst_hub & ks
            if keep.any():
                srcs.append(src[keep])
                dsts.append(dst[keep])
                ws.append(w[keep])
            if hkeep.any():
                hsrcs.append(src[hkeep])
                hdsts.append(dst[hkeep])
                hws.append(w[hkeep])
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
        # hub-partial CSR: in-edges of hub dsts from OWNED sources
        if hsrcs:
            hsrc = np.concatenate(hsrcs)
            hdst = np.concatenate(hdsts)
            hw = np.concatenate(hws).astype(np.float64)
            horder = np.lexsort((hsrc, hdst))
            self.h_src = hsrc[horder]
            self.h_w = hw[horder]
            hdst = hdst[horder]
            self.hstarts = np.concatenate(
                [[0], np.nonzero(hdst[1:] != hdst[:-1])[0] + 1])
            self.hdst_present = hdst[self.hstarts]
        else:
            self.h_src = np.empty(0, np.int64)
            self.h_w = np.empty(0, np.float64)
            self.hstarts = np.empty(0, np.int64)
            self.hdst_present = np.empty(0, np.int64)
        # owned out-weights (combine block partials)
        if osrc:
            allsrc = np.concatenate(osrc)
            allw = np.concatenate(osw)
            self.osrc, inv = np.unique(allsrc, return_inverse=True)
            self.outw_own = np.bincount(inv, weights=allw)
        else:
            self.osrc = np.empty(0, np.int64)
            self.outw_own = np.empty(0, np.float64)
        # owned universe: every owned id seen as dst or src (+ owned hubs,
        # which in doubled form always also appear as sources)
        self.owned_hubs = self.hubs[self.hub_owner == owner]
        self.owned_all = np.unique(np.concatenate(
            [self.owned_dst, self.osrc, self.owned_hubs]))
        # sparse (sorted ids → partition) map for parts-routed ownership;
        # covers exactly the ids referenced by this shard's rows (plus the
        # broadcast hub list via hub_owner), which is a superset of
        # refs_sorted — prepare1 resolves every owner lookup locally
        if pm_ids:
            ids_all = np.concatenate(pm_ids)
            parts_all = np.concatenate(pm_parts)
            self.pmap_ids, first = np.unique(ids_all, return_index=True)
            self.pmap_parts = parts_all[first].astype(np.int64)
        else:
            self.pmap_ids = np.empty(0, np.int64)
            self.pmap_parts = np.empty(0, np.int64)

    def _owner_of(self, ids: np.ndarray) -> np.ndarray:
        """Owning shard of each id: ``id % k`` in hash mode, the carried
        Cuttana assignment (local sparse map) in parts-routed mode."""
        ids = np.asarray(ids, np.int64)
        if not self.parts_routed:
            return (ids % self.k).astype(np.int64)
        if len(ids) == 0:
            return np.empty(0, np.int64)
        if len(self.pmap_ids) == 0:
            raise ValueError(f"HashShard {self.owner}: owner lookup with "
                             "an empty local partition map")
        pos = np.minimum(np.searchsorted(self.pmap_ids, ids),
                         len(self.pmap_ids) - 1)
        if not (self.pmap_ids[pos] == ids).all():
            raise ValueError(
                f"HashShard {self.owner}: referenced an id whose "
                "partition was never carried on a local row")
        return self.pmap_parts[pos]

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
        owners_all = self._owner_of(self.refs_sorted)
        remote_mask = owners_all != self.owner
        remote = self.refs_sorted[remote_mask]
        owners = owners_all[remote_mask]
        self.pos_need = {}
        need: dict[int, np.ndarray] = {}
        for q in np.unique(owners).tolist():
            ids = remote[owners == q]
            need[int(q)] = ids
            self.pos_need[int(q)] = np.searchsorted(self.refs_sorted, ids)
        # hub-split bookkeeping: positions of hub-partial sources (always
        # owned, hence always in refs_sorted), owned-hub state positions,
        # and per-peer scatter maps into each owner's fixed hub vector
        self.pos_hsrc = np.searchsorted(self.refs_sorted, self.h_src)
        self.pos_hub_owned = np.searchsorted(self.owned_all, self.owned_hubs)
        self.hub_send: dict[int, tuple] = {}
        if len(self.hdst_present):
            hidx = np.searchsorted(self.hubs, self.hdst_present)
            howners = self.hub_owner[hidx]
            for q in np.unique(howners).tolist():
                mask = howners == q
                hubs_of_q = self.hubs[self.hub_owner == q]
                self.hub_send[int(q)] = (
                    np.nonzero(mask)[0],
                    np.searchsorted(hubs_of_q, self.hdst_present[mask]),
                    len(hubs_of_q))
        self._self_hub = None
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
        if incoming_outw:
            got = ray.get([ref for _, ref in incoming_outw])
            for (q, _), v in zip(incoming_outw, got):
                outw[self.pos_need[q]] = v
        outw_safe = np.where(outw == 0.0, 1.0, outw)
        self.coef = self.w / outw_safe[self.pos_src] if len(self.src) \
            else self.w
        self.h_coef = self.h_w / outw_safe[self.pos_hsrc] \
            if len(self.h_src) else self.h_w
        self.dangling_owned = outw[self.pos_owned] == 0.0
        self.vals = np.full(len(self.refs_sorted), 1.0 / V)
        return int(self.dangling_owned.sum())

    def exchange_stats(self) -> dict:
        """Static per-round BSP message footprint from THIS shard (valid
        after the prepare exchange; payload sizes don't change across
        rounds, only values do): boundary gather values = owned ranks
        peers reference (one float64 each per round), hub vector floats =
        per-hub-owner partial vectors. This is the number the whole
        Cuttana exercise exists to shrink — cut quality realized as fewer
        exchanged bytes per superstep."""
        val_cnt = sum(len(ix) for p, ix in self.out_idx.items()
                      if p != self.owner)
        hub_cnt = sum(qlen for q, (_, _, qlen) in self.hub_send.items()
                      if q != self.owner)
        return {"boundary_values": int(val_cnt),
                "hub_vector_floats": int(hub_cnt),
                "bytes_per_round": 8 * int(val_cnt + hub_cnt)}

    # -- hub-split messaging (see class docstring) --------------------------

    def _hub_vectors(self, per_hub: np.ndarray, fill: float) -> dict:
        """Scatter per-present-hub aggregates into one fixed-size vector
        per destination owner (``fill`` marks absent hubs)."""
        out = {}
        for q, (li, qi, qlen) in self.hub_send.items():
            v = np.full(qlen, fill)
            v[qi] = per_hub[li]
            out[q] = v
        return out

    def _hub_partials_pr(self) -> dict:
        if len(self.h_src) == 0:
            return {}
        contrib = self.vals[self.pos_hsrc] * self.h_coef
        return self._hub_vectors(np.add.reduceat(contrib, self.hstarts), 0.0)

    def hub_init_pr(self) -> dict:
        """Initial hub partials (from the uniform init state), shipped once
        before the first BSP round so iteration 1 sees complete hub mass."""
        hp = self._hub_partials_pr()
        self._self_hub = hp.pop(self.owner, None)
        return {p: _ship((None, v)) for p, v in hp.items()}

    def sharded_iter(self, dm_over_v: float, incoming: list):
        """Hub-aware BSP PageRank round. Message payloads are
        ``(vals_for_peer | None, hub_partial_vector | None)``; hub owners
        fold the k incoming partial vectors (plus their own local slice)
        into their owned-hub rows."""
        hub_acc = np.zeros(len(self.owned_hubs))
        for q, (v, hv) in _unship(incoming):
            if v is not None:
                self.vals[self.pos_need[q]] = v
            if hv is not None:
                hub_acc += hv
        if self._self_hub is not None:
            hub_acc += self._self_hub
        d = self.damping
        base = (1.0 - d) / self.V + d * dm_over_v
        new = np.full(len(self.owned_all), base)
        if len(self.src):
            contrib = self.vals[self.pos_src] * self.coef
            new[self.pos_inedge] += d * np.add.reduceat(contrib, self.starts)
        if len(self.owned_hubs):
            new[self.pos_hub_owned] += d * hub_acc
        old = self.vals[self.pos_owned]
        delta = float(np.abs(new - old).sum())
        dangling_mass = float(new[self.dangling_owned].sum())
        self.vals[self.pos_owned] = new
        hp = self._hub_partials_pr()
        self._self_hub = hp.pop(self.owner, None)
        targets = set(self.out_idx) | set(hp)
        out = {p: _ship((new[self.out_idx[p]] if p in self.out_idx
                         else None, hp.get(p))) for p in targets}
        return delta, dangling_mass, out

    _INT_MAX = np.iinfo(np.int64).max

    def _hub_partials_min(self) -> dict:
        if len(self.h_src) == 0:
            return {}
        gathered = np.minimum.reduceat(self.lvals[self.pos_hsrc],
                                       self.hstarts)
        return {q: v.astype(np.int64) for q, v in
                self._hub_vectors(gathered, self._INT_MAX).items()}

    def _hub_partials_lpa(self) -> dict:
        """Per-(hub, label) weight sums for owned sources, split per hub
        owner as (positions-into-owner-vector, labels, wsums) triples."""
        if len(self.h_src) == 0:
            return {}
        lab = self.lvals[self.pos_hsrc]
        w = self.h_w.astype(np.int64)
        nper = np.diff(np.concatenate([self.hstarts, [len(self.h_src)]]))
        hpos = np.repeat(np.arange(len(self.hdst_present)), nper)
        order = np.lexsort((lab, hpos))
        h2, l2, w2 = hpos[order], lab[order], w[order]
        starts = np.concatenate(
            [[0], np.nonzero((h2[1:] != h2[:-1])
                             | (l2[1:] != l2[:-1]))[0] + 1])
        hh, ll = h2[starts], l2[starts]
        ww = np.add.reduceat(w2, starts)
        out = {}
        for q, (li, qi, _) in self.hub_send.items():
            # li: indices into hdst_present sent to q; qi: their positions
            # in q's hub vector. Select the reduced triples whose hub is
            # bound for q and remap to q-vector positions.
            sel = _insorted(np.sort(li), hh)
            if not sel.any():
                continue
            remap = np.full(len(self.hdst_present), -1, np.int64)
            remap[li] = qi
            out[q] = (remap[hh[sel]], ll[sel], ww[sel])
        return out

    def labels_init_hub(self, mode: str) -> dict:
        """Initial hub partials for the label loops (after
        ``sharded_labels_init``); payloads are (None, partial)."""
        hp = self._hub_partials_min() if mode == "min" \
            else self._hub_partials_lpa()
        self._self_hub = hp.pop(self.owner, None)
        return {p: _ship((None, v)) for p, v in hp.items()}

    def sharded_minlabel_iter(self, incoming: list):
        hub_acc = np.full(len(self.owned_hubs), self._INT_MAX)
        for q, (v, hv) in _unship(incoming):
            if v is not None:
                self.lvals[self.pos_need[q]] = v
            if hv is not None:
                hub_acc = np.minimum(hub_acc, hv)
        if self._self_hub is not None:
            hub_acc = np.minimum(hub_acc, self._self_hub)
        old = self.lvals[self.pos_owned]
        new = old.copy()
        if len(self.src):
            gathered = np.minimum.reduceat(self.lvals[self.pos_src],
                                           self.starts)
            np.minimum.at(new, self.pos_inedge, gathered)
        if len(self.owned_hubs):
            np.minimum.at(new, self.pos_hub_owned, hub_acc)
        changed = int((new != old).sum())
        self.lvals[self.pos_owned] = new
        hp = self._hub_partials_min()
        self._self_hub = hp.pop(self.owner, None)
        targets = set(self.out_idx) | set(hp)
        out = {p: _ship((new[self.out_idx[p]] if p in self.out_idx
                         else None, hp.get(p))) for p in targets}
        return changed, out

    def sharded_lpa_iter(self, incoming: list):
        tri = []            # (qpos, label, wsum) triples for owned hubs
        for q, (v, hv) in _unship(incoming):
            if v is not None:
                self.lvals[self.pos_need[q]] = v
            if hv is not None:
                tri.append(hv)
        if self._self_hub is not None:
            tri.append(self._self_hub)
        old = self.lvals[self.pos_owned]
        new = old.copy()
        if len(self.src):
            lab = self.lvals[self.pos_src]
            dst_pos = np.repeat(self.pos_inedge, np.diff(
                np.concatenate([self.starts, [len(self.src)]])))
            w = self.w.astype(np.int64)
            order2 = np.lexsort((lab, dst_pos))
            d2, l2, w2 = dst_pos[order2], lab[order2], w[order2]
            starts2 = np.concatenate(
                [[0], np.nonzero((d2[1:] != d2[:-1])
                                 | (l2[1:] != l2[:-1]))[0] + 1])
            dd, ll = d2[starts2], l2[starts2]
            ww = np.add.reduceat(w2, starts2)
            order3 = np.lexsort((ll, -ww, dd))
            d3 = dd[order3]
            first3 = np.concatenate(
                [[0], np.nonzero(d3[1:] != d3[:-1])[0] + 1])
            new[d3[first3]] = ll[order3][first3]
        if tri:
            hq = np.concatenate([t[0] for t in tri])
            hl = np.concatenate([t[1] for t in tri])
            hw = np.concatenate([t[2] for t in tri])
            o2 = np.lexsort((hl, hq))
            hq, hl, hw = hq[o2], hl[o2], hw[o2]
            st = np.concatenate(
                [[0], np.nonzero((hq[1:] != hq[:-1])
                                 | (hl[1:] != hl[:-1]))[0] + 1])
            qq, ql = hq[st], hl[st]
            qw = np.add.reduceat(hw, st)
            o3 = np.lexsort((ql, -qw, qq))
            q3 = qq[o3]
            f3 = np.concatenate([[0], np.nonzero(q3[1:] != q3[:-1])[0] + 1])
            new[self.pos_hub_owned[q3[f3]]] = ql[o3][f3]
        changed = int((new != old).sum())
        self.lvals[self.pos_owned] = new
        hp = self._hub_partials_lpa()
        self._self_hub = hp.pop(self.owner, None)
        targets = set(self.out_idx) | set(hp)
        out = {p: _ship((new[self.out_idx[p]] if p in self.out_idx
                         else None, hp.get(p))) for p in targets}
        return changed, out

    # -- per-shard (= per-partition) iteration checkpoints ------------------

    def save_checkpoint(self, dirpath: str) -> int:
        """Write this shard's owned slice of the rank state — the
        per-partition checkpoint unit. Only owned values persist; remote
        gather entries are re-synced from peers at resume."""
        import os

        import pyarrow.parquet as pq
        os.makedirs(dirpath, exist_ok=True)
        t = pa.table({"node_id": pa.array(self.owned_all, pa.int64()),
                      "rank": pa.array(self.vals[self.pos_owned],
                                       pa.float64())})
        pq.write_table(t, f"{dirpath}/shard_{self.owner:04d}.parquet")
        return len(t)

    def load_checkpoint(self, dirpath: str) -> bool:
        """Restore owned values from this shard's checkpoint file. The
        ownership function (id % k) is deterministic, so the stored id set
        must equal the rebuilt one — a mismatch means the shard count
        changed, which the pool rejects via the manifest first."""
        import pyarrow.parquet as pq
        t = pq.read_table(f"{dirpath}/shard_{self.owner:04d}.parquet")
        ids = t["node_id"].to_numpy(zero_copy_only=False)
        if len(ids) != len(self.owned_all) or not (ids == self.owned_all).all():
            raise ValueError("checkpoint/topology mismatch for shard "
                             f"{self.owner}")
        self.vals[self.pos_owned] = t["rank"].to_numpy(zero_copy_only=False)
        return True

    def resume_messages(self) -> dict:
        """The outgoing payloads an iteration end would have produced from
        the (restored) current state: peer value slices + hub partials.
        Feeding these into the next ``sharded_iter`` makes a resumed run
        bit-identical to the uninterrupted one."""
        hp = self._hub_partials_pr()
        self._self_hub = hp.pop(self.owner, None)
        cur = self.vals[self.pos_owned]
        targets = set(self.out_idx) | set(hp)
        return {p: _ship((cur[self.out_idx[p]] if p in self.out_idx
                          else None, hp.get(p))) for p in targets}

    def save_labels_checkpoint(self, dirpath: str) -> int:
        """Per-shard label-state checkpoint (min-label / LPA loops)."""
        import os

        import pyarrow.parquet as pq
        os.makedirs(dirpath, exist_ok=True)
        t = pa.table({"node_id": pa.array(self.owned_all, pa.int64()),
                      "label": pa.array(self.lvals[self.pos_owned],
                                        pa.int64())})
        pq.write_table(t, f"{dirpath}/shard_{self.owner:04d}.parquet")
        return len(t)

    def load_labels_checkpoint(self, dirpath: str) -> bool:
        import pyarrow.parquet as pq
        t = pq.read_table(f"{dirpath}/shard_{self.owner:04d}.parquet")
        ids = t["node_id"].to_numpy(zero_copy_only=False)
        if len(ids) != len(self.owned_all) \
                or not (ids == self.owned_all).all():
            raise ValueError("checkpoint/topology mismatch for shard "
                             f"{self.owner}")
        self.lvals = self.refs_sorted.copy()
        self.lvals[self.pos_owned] = t["label"].to_numpy(
            zero_copy_only=False)
        return True

    def resume_label_messages(self, mode: str) -> dict:
        """Label-loop counterpart of ``resume_messages``."""
        hp = self._hub_partials_min() if mode == "min" \
            else self._hub_partials_lpa()
        self._self_hub = hp.pop(self.owner, None)
        cur = self.lvals[self.pos_owned]
        targets = set(self.out_idx) | set(hp)
        return {p: _ship((cur[self.out_idx[p]] if p in self.out_idx
                          else None, hp.get(p))) for p in targets}

    def result_table(self) -> pa.Table:
        ids, vals = self.sharded_result()
        return pa.table({"node_id": pa.array(ids, pa.int64()),
                         "rank": pa.array(vals, pa.float64())})

    def labels_result_table(self) -> pa.Table:
        ids, vals = self.sharded_labels_result()
        return pa.table({"node_id": pa.array(ids, pa.int64()),
                         "label": pa.array(vals, pa.int64())})


def discover_hubs(edges: "ray.data.Dataset", threshold: int) -> np.ndarray:
    """Vertices with in-degree ≥ ``threshold`` over the doubled edge table
    (= full degree). One per-batch partial count, then ONE
    ``groupby(bucket).map_groups`` sort-exchange over hash buckets with
    the per-dst sum + threshold filter vectorized inside each bucket —
    NOT a native ``groupby(dst).aggregate(Sum)``: on a 200M-row graph
    the hash-aggregate path measured ~100× slower than the sort-shuffle
    (40.8 s vs 0.4 s partials at 8M rows; the aggregate's per-key reduce
    dominates when most keys are distinct). The result is ≤ E/threshold
    ids by construction — the bounded 'hot key' list that the shards
    treat with the vertex-cut scheme."""
    NB = 64

    def part(t: pa.Table) -> pa.Table:
        sch = pa.schema([("dst", pa.int64()), ("c", pa.int64()),
                         ("bucket", pa.int64())])
        if len(t) == 0 or "dst" not in t.column_names:
            return sch.empty_table()
        u, c = np.unique(t["dst"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"dst": pa.array(u, pa.int64()),
                         "c": pa.array(c.astype(np.int64)),
                         "bucket": pa.array(u % NB)})

    def over(t: pa.Table) -> pa.Table:
        sch = pa.schema([("dst", pa.int64())])
        if len(t) == 0 or "dst" not in t.column_names:
            return sch.empty_table()
        d = t["dst"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        order = np.argsort(d, kind="stable")
        d, c = d[order], c[order]
        starts = np.concatenate(
            [[0], np.nonzero(d[1:] != d[:-1])[0] + 1])
        tot = np.add.reduceat(c, starts)
        keep = tot >= threshold
        return pa.table({"dst": pa.array(d[starts][keep], pa.int64())})

    hubs = edges.map_batches(part, batch_format="pyarrow") \
        .groupby("bucket").map_groups(over, batch_format="pyarrow")
    # driver-side guard: the hub list must stay a broadcastable 'hot key'
    # list. A sane threshold bounds it at E/threshold; a pathological one
    # (threshold≈1 on a huge graph) would otherwise take_all O(V) rows.
    cap = 1 << 20
    rows = hubs.take(cap + 1)
    if len(rows) > cap:
        raise ValueError(
            f"discover_hubs: more than {cap} vertices exceed degree "
            f"threshold {threshold}; raise hub_degree_threshold")
    return np.sort(np.array([r["dst"] for r in rows], np.int64))


@ray.remote
def _block_parts(t: pa.Table) -> np.ndarray:
    """Distinct ``part`` values present in the block (sorted)."""
    if len(t) == 0:
        return np.empty(0, np.int64)
    return np.unique(t["part"].to_numpy(zero_copy_only=False))


@ray.remote(num_returns="dynamic")
def _split_block(t: pa.Table):
    """Yield one sub-table per distinct ``part`` (ascending part order).
    Only called on the rare mixed-part block; dynamic returns keep the
    sub-block objects owned by the caller, never collected to the driver."""
    parts = t["part"].to_numpy(zero_copy_only=False)
    for p in np.unique(parts):
        yield t.filter(pa.array(parts == p))


def lookup_partitions(assign: "ray.data.Dataset", ids: np.ndarray
                      ) -> np.ndarray:
    """Partition of each id in a SMALL driver-held id list (e.g. the hub
    list, ≤ 2^20 by ``discover_hubs``' cap) under a distributed
    (node_id → partition) assignment: broadcast the sorted id list, filter
    the assignment distributed, collect ≤ len(ids) rows. Raises if any id
    has no assignment row — a silent default would mis-route its edges."""
    ids = np.asarray(ids, np.int64)
    if len(ids) == 0:
        return np.empty(0, np.int64)
    ids_sorted = np.sort(ids)
    ref = ray.put(ids_sorted)

    def pick(t: pa.Table) -> pa.Table:
        sch = pa.schema([("node_id", pa.int64()),
                         ("partition", pa.int64())])
        if len(t) == 0 or "node_id" not in t.column_names:
            return sch.empty_table()
        nid = t["node_id"].to_numpy(zero_copy_only=False)
        hit = _insorted(ray.get(ref), nid)
        if not hit.any():
            return sch.empty_table()
        return pa.table({
            "node_id": pa.array(nid[hit], pa.int64()),
            "partition": pc.cast(t["partition"], pa.int64())
            .take(pa.array(np.nonzero(hit)[0]))}).cast(sch)

    rows = assign.map_batches(pick, batch_format="pyarrow").take_all()
    if len(rows) < len(ids):
        raise ValueError(
            f"lookup_partitions: {len(ids) - len(rows)} ids have no "
            "assignment row; the assignment must cover every vertex")
    out = np.empty(len(ids), np.int64)
    got_ids = np.array([r["node_id"] for r in rows], np.int64)
    got_parts = np.array([r["partition"] for r in rows], np.int64)
    pos = np.searchsorted(ids_sorted, got_ids)
    aligned = np.empty(len(ids), np.int64)
    aligned[pos] = got_parts
    # map back from sorted order to the caller's order
    out[np.argsort(ids, kind="stable")] = aligned
    return out


# Above this assignment size the per-endpoint partition attach switches
# from a broadcast sorted-array lookup (one ray.put, zero exchanges) to
# two distributed hash joins. 2^22 int64 pairs ≈ 64 MiB broadcast.
CUTTANA_ATTACH_BROADCAST_MAX = 1 << 22


def attach_edge_partitions(enc: "ray.data.Dataset",
                           assign: "ray.data.Dataset",
                           broadcast_max: int | None = None
                           ) -> "ray.data.Dataset":
    """Carry both endpoint partitions onto every edge row:
    ``(src, dst, weight)`` + ``(node_id → partition)`` →
    ``(src, dst, weight, src_part, dst_part)``.

    This is the step that lets the BSP shards route by CUTTANA-QUALITY
    ownership with **no O(V) partition vector anywhere**: downstream,
    each shard rebuilds owner(id) for exactly the ids its own edge rows
    reference, from the carried columns — the partition map stays a
    distributed table end to end.

    Under ``broadcast_max`` assigned vertices the map ships once as a
    sorted (ids, parts) numpy pair (``ray.put``, node-shared zero-copy);
    above it, two distributed hash joins attach the endpoints (the same
    shape ``partition_quality_join`` uses). Both paths raise/drop-check
    on missing ids rather than silently defaulting an owner."""
    from cuttana_ray.util import local_table, safe_join

    if broadcast_max is None:
        broadcast_max = CUTTANA_ATTACH_BROADCAST_MAX
    sch = pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                     ("weight", pa.int64()),
                     ("src_part", pa.int64()), ("dst_part", pa.int64())])
    n = assign.count()
    if n <= broadcast_max:
        at = local_table(assign)
        ids = at["node_id"].to_numpy(zero_copy_only=False)
        parts = at["partition"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ref = ray.put((ids[order], parts[order]))

        def att(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "src" not in t.column_names:
                return sch.empty_table()
            ids_s, parts_s = ray.get(ref)
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            pos_s = np.searchsorted(ids_s, src)
            pos_d = np.searchsorted(ids_s, dst)
            pos_sc = np.minimum(pos_s, len(ids_s) - 1)
            pos_dc = np.minimum(pos_d, len(ids_s) - 1)
            if not ((ids_s[pos_sc] == src).all()
                    and (ids_s[pos_dc] == dst).all()):
                raise ValueError("attach_edge_partitions: edge endpoint "
                                 "missing from the assignment")
            return pa.table({
                "src": t["src"], "dst": t["dst"],
                "weight": pc.cast(t["weight"], pa.int64()),
                "src_part": pa.array(parts_s[pos_sc]),
                "dst_part": pa.array(parts_s[pos_dc])}).cast(sch)

        return enc.map_batches(att, batch_format="pyarrow")

    from cuttana_ray.util import pool_size
    npart = max(1, min(pool_size()[1], enc.count() // 262144 + 1))
    j = safe_join(
        safe_join(enc, assign.rename_columns({"node_id": "_s",
                                              "partition": "src_part"}),
                  join_type="inner", num_partitions=npart,
                  on=("src",), right_on=("_s",)),
        assign.rename_columns({"node_id": "_d", "partition": "dst_part"}),
        join_type="inner", num_partitions=npart,
        on=("dst",), right_on=("_d",))

    def fin(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "src" not in t.column_names:
            return sch.empty_table()
        return pa.table({
            "src": t["src"], "dst": t["dst"],
            "weight": pc.cast(t["weight"], pa.int64()),
            "src_part": pc.cast(t["src_part"], pa.int64()),
            "dst_part": pc.cast(t["dst_part"], pa.int64())}).cast(sch)

    return j.map_batches(fin, batch_format="pyarrow")


def route_edge_blocks(enc: "ray.data.Dataset", k: int, hubs: np.ndarray,
                      by_partition: bool = False) -> list[list]:
    """ONE distributed exchange routing every edge row to exactly the
    shard(s) that consume it — replacing the naive construction where all
    k shards fetch the FULL edge table and filter locally (O(k·E) network
    traffic on a real cluster):

    * non-hub rows ship to owner(dst) as in-edge rows (``role`` 0) and to
      owner(src) as out-weight rows (``role`` 1) — each row twice, exactly
      the two shards that need it;
    * hub rows ship ONCE, to owner(src) (``role`` 1), where they serve
      both the out-weight partials and the vertex-cut hub CSR.

    ``by_partition=False`` routes by the hash baseline ``id % k``;
    ``by_partition=True`` expects ``attach_edge_partitions`` output
    (carried ``src_part``/``dst_part`` columns) and routes by the
    CARRIED Cuttana assignment instead — the columns ride along so the
    receiving shard can rebuild local ownership with no global map.

    Returns per-shard lists of Arrow block refs (each block single-part by
    construction of the groupby).
    """
    hubs_sorted = np.sort(np.asarray(hubs, np.int64)) if len(hubs) \
        else np.empty(0, np.int64)

    def tag(t: pa.Table) -> pa.Table:
        cols = [("src", pa.int64()), ("dst", pa.int64()),
                ("weight", pa.int64()), ("part", pa.int64()),
                ("role", pa.int8())]
        if by_partition:
            cols += [("src_part", pa.int64()), ("dst_part", pa.int64())]
        sch = pa.schema(cols)
        if len(t) == 0 or "dst" not in t.column_names:
            return sch.empty_table()
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        w = t["weight"].to_numpy(zero_copy_only=False)
        dst_hub = _insorted(hubs_sorted, dst)
        nh = ~dst_hub
        if by_partition:
            sp = t["src_part"].to_numpy(zero_copy_only=False)
            dp = t["dst_part"].to_numpy(zero_copy_only=False)
            part = np.concatenate([dp[nh], sp]).astype(np.int64)
        else:
            part = np.concatenate([dst[nh] % k, src % k]).astype(np.int64)
        out = {
            "src": pa.array(np.concatenate([src[nh], src]), pa.int64()),
            "dst": pa.array(np.concatenate([dst[nh], dst]), pa.int64()),
            "weight": pa.array(
                np.concatenate([w[nh], w]).astype(np.int64)),
            "part": pa.array(part),
            "role": pa.array(np.concatenate(
                [np.zeros(int(nh.sum()), np.int8),
                 np.ones(len(src), np.int8)])),
        }
        if by_partition:
            out["src_part"] = pa.array(
                np.concatenate([sp[nh], sp]).astype(np.int64))
            out["dst_part"] = pa.array(
                np.concatenate([dp[nh], dp]).astype(np.int64))
        return pa.table(out)

    grouped = enc.map_batches(tag, batch_format="pyarrow") \
        .groupby("part") \
        .map_groups(lambda t: t, batch_format="pyarrow") \
        .materialize()
    return bucket_grouped_blocks(grouped, k)


def bucket_grouped_blocks(grouped: "ray.data.Dataset", k: int
                          ) -> list[list]:
    """Per-``part`` lists of single-part Arrow block refs from a
    ``groupby("part").map_groups`` output. The sort-shuffle sorts by key
    but does NOT guarantee one group per output block — its range
    partitioning can pack several parts into one block
    (block-boundary-dependent, so it shows up flakily). Read the full
    distinct-part set per block; the common single-part block ships
    as-is, a mixed block is split in one remote task (per-part
    sub-blocks stay in the object store, never on the driver)."""
    refs = grouped.to_arrow_refs()
    parts_per_block = ray.get([_block_parts.remote(r) for r in refs])
    buckets: list[list] = [[] for _ in range(k)]
    for parts, r in zip(parts_per_block, refs):
        if len(parts) == 0:
            continue
        if len(parts) == 1:
            buckets[int(parts[0])].append(r)
        else:
            sub_refs = list(ray.get(_split_block.remote(r)))
            for p, sr in zip(parts, sub_refs):
                buckets[int(p)].append(sr)
    return buckets


def _route(msg_dicts: list, k: int) -> list:
    """[{dst_shard: ref}] per sender → per-receiver [(sender, ref)] lists."""
    incoming: list[list] = [[] for _ in range(k)]
    for q, msgs in enumerate(msg_dicts):
        for p, ref in msgs.items():
            incoming[p].append((q, ref))
    return incoming


class HashShardPool:
    """k ``HashShard`` actors over a hash-id int64 edge table. In-degree
    hubs (degree ≥ ``hub_degree_threshold``, default E/(4k)) take the
    vertex-cut path (see ``HashShard``): their in-edges spread across all
    shards by source owner and reach the hub as per-round combined
    partials — no shard holds O(max-degree) rows and the hub owner stops
    being the BSP straggler."""

    def __init__(self, edges: "ray.data.Dataset", num_shards: int,
                 num_cpus_per_shard: float | None = None,
                 hub_degree_threshold: int | None = None,
                 pre_route: bool = True,
                 assignment: "ray.data.Dataset | None" = None,
                 edge_count: int | None = None):
        """``assignment``: optional distributed (node_id → partition)
        table (``bigv_cuttana_assignment``) with partitions in
        [0, num_shards). When given, shard ownership IS the Cuttana
        partition — edges carry both endpoint partitions through one
        routing exchange and the shards rebuild ownership from the
        carried columns, so the FENNEL-quality cut shows up directly as
        fewer boundary messages per BSP round (``exchange_stats``).
        This closes the loop on the reference's purpose: cut quality
        reducing communication (/root/reference/src/partition.rs:88-100).
        ``edge_count``: pass a known ``edges.count()`` to skip the extra
        count pass (callers that session-cache the graph build know it)."""
        if edge_count is None:
            edge_count = edges.count()
        if hub_degree_threshold is None:
            hub_degree_threshold = max(
                64, edge_count // max(1, 4 * num_shards))
        self.hub_degree_threshold = int(hub_degree_threshold)
        self.hubs = discover_hubs(edges, self.hub_degree_threshold)
        hubs_ref = ray.put(self.hubs)
        self.by_partition = assignment is not None
        hub_parts_ref = None
        if self.by_partition:
            if not pre_route:
                raise ValueError(
                    "assignment routing requires pre_route=True")
            hub_parts = lookup_partitions(assignment, self.hubs)
            hub_parts_ref = ray.put(hub_parts)
            edges_p = attach_edge_partitions(edges, assignment)
            buckets = route_edge_blocks(edges_p, num_shards, self.hubs,
                                        by_partition=True)
        elif pre_route:
            # one exchange hands each shard only its own rows (O(E) total
            # traffic); the naive path ships the whole table k times
            buckets = route_edge_blocks(edges, num_shards, self.hubs)
        else:
            buckets = [edges.to_arrow_refs()] * num_shards
        if num_cpus_per_shard is None:
            try:
                total = int(ray.cluster_resources().get("CPU", num_shards))
            except Exception:
                total = num_shards
            num_cpus_per_shard = shard_cpu_reservation(total, num_shards)
        cls = HashShard.options(num_cpus=num_cpus_per_shard)
        self.shards = [cls.remote(buckets[p], p, num_shards, hubs_ref,
                                  pre_route, hub_parts_ref,
                                  self.by_partition)
                       for p in range(num_shards)]
        self.V = int(sum(ray.get([s.ready.remote() for s in self.shards])))

    def exchange_stats(self) -> dict:
        """Pool-wide static per-round message footprint (call after any
        algorithm's prepare has run — e.g. after ``pagerank``): total
        boundary gather values + hub partial floats + bytes/round, the
        direct measure of how much the partition quality shrinks BSP
        communication vs the ``id % k`` baseline."""
        per = ray.get([s.exchange_stats.remote() for s in self.shards])
        out = {"boundary_values": 0, "hub_vector_floats": 0,
               "bytes_per_round": 0}
        for d in per:
            for kk in out:
                out[kk] += d[kk]
        out["num_shards"] = len(self.shards)
        out["routing"] = "cuttana" if self.by_partition else "hash_mod"
        return out

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

    def _ckpt_dir(self, workdir: str, it: int) -> str:
        import os
        return os.path.join(workdir, "pagerank_bigv", f"iter_{it:04d}")

    def pagerank(self, damping: float = 0.85, tol: float = 1e-6,
                 max_iters: int = 100, workdir: str | None = None,
                 checkpoint_every: int = 10, resume: bool = False
                 ) -> "tuple[IterativeResult, ray.data.Dataset]":
        """Sharded-BSP PageRank; per-iteration driver traffic is three
        scalars + message refs per shard. Returns (IterativeResult with
        empty ``values`` — the scores are NOT collected — and the
        distributed (node_id, rank) Dataset).

        With ``workdir``, every ``checkpoint_every``-th iteration each
        shard persists its OWNED slice (the per-partition checkpoint unit)
        in parallel, plus a driver manifest carrying (iteration,
        dangling_mass, delta, num_shards). ``resume=True`` restores the
        latest complete checkpoint — shard count must match — re-syncs the
        remote gather entries with one message round, and continues
        bit-identically to the uninterrupted run."""
        import json as _json
        import os

        dangling_mass = self._prepare(damping)
        k = len(self.shards)
        start_it = 0
        incoming = None
        if workdir and resume:
            base = os.path.join(workdir, "pagerank_bigv")
            done = sorted(
                d for d in (os.listdir(base) if os.path.isdir(base) else [])
                if d.startswith("iter_")
                and os.path.exists(os.path.join(base, d, "MANIFEST.json")))
            if done:
                path = os.path.join(base, done[-1])
                with open(os.path.join(path, "MANIFEST.json")) as f:
                    meta = _json.load(f)
                if meta["num_shards"] != k:
                    raise ValueError(
                        f"checkpoint has {meta['num_shards']} shards, "
                        f"pool has {k}; rebuild with a matching pool")
                ray.get([s.load_checkpoint.remote(path)
                         for s in self.shards])
                if meta.get("converged"):
                    # completed run: state restored, nothing to iterate
                    res = IterativeResult(np.empty(0),
                                          meta["iteration"] + 1, True)
                    res.deltas.append(meta["delta"])
                    refs = [s.result_table.remote() for s in self.shards]
                    return res, ray.data.from_arrow_refs(refs)
                dangling_mass = meta["dangling_mass"]
                start_it = meta["iteration"] + 1
                incoming = _route(
                    ray.get([s.resume_messages.remote()
                             for s in self.shards]), k)
        if incoming is None:
            incoming = _route(
                ray.get([s.hub_init_pr.remote() for s in self.shards]), k)
        res = IterativeResult(np.empty(0), 0, False)
        it = start_it - 1
        for it in range(start_it, max_iters):
            t0 = time.perf_counter()
            outs = ray.get([
                s.sharded_iter.remote(dangling_mass / self.V, incoming[p])
                for p, s in enumerate(self.shards)])
            delta = float(sum(o[0] for o in outs))
            dangling_mass = float(sum(o[1] for o in outs))
            incoming = _route([o[2] for o in outs], k)
            res.deltas.append(delta)
            res.seconds_per_iter.append(time.perf_counter() - t0)
            converged = delta < tol
            if workdir and (converged or (it + 1) % checkpoint_every == 0):
                path = self._ckpt_dir(workdir, it)
                ray.get([s.save_checkpoint.remote(path)
                         for s in self.shards])
                with open(os.path.join(path, "MANIFEST.json"), "w") as f:
                    _json.dump({"iteration": it, "delta": delta,
                                "dangling_mass": dangling_mass,
                                "converged": converged,
                                "num_shards": k}, f)
            if converged:
                res.iterations, res.converged = it + 1, True
                break
        else:
            res.iterations = max(it + 1, start_it)
        refs = [s.result_table.remote() for s in self.shards]
        return res, ray.data.from_arrow_refs(refs)

    def connected_components(self, max_iters: int = 200,
                             workdir: str | None = None,
                             checkpoint_every: int = 10,
                             resume: bool = False
                             ) -> "tuple[IterativeResult, ray.data.Dataset]":
        """Sharded-BSP min-label components over hash ids (component label
        = min member id). Needs the same prepare exchange for positions.
        ``workdir``/``resume`` give per-shard label checkpoints with the
        same bit-exact-continuation contract as ``pagerank``."""
        self._prepare(0.85)
        res = _lpa_labels_pool_loop(self, max_iters, "sharded_minlabel_iter",
                                    workdir=workdir, algo="components_bigv",
                                    checkpoint_every=checkpoint_every,
                                    resume=resume)
        refs = [s.labels_result_table.remote() for s in self.shards]
        return res, ray.data.from_arrow_refs(refs)

    def label_propagation(self, max_iters: int = 10,
                          workdir: str | None = None,
                          checkpoint_every: int = 10, resume: bool = False
                          ) -> "tuple[IterativeResult, ray.data.Dataset]":
        """Sharded-BSP synchronous weighted LPA over hash ids: labels start
        as the vertex's own hash id; each round every vertex adopts the
        incoming label with max total edge weight, ties to the SMALLEST
        label (note: the tie ordering is over hash ids, so tie-broken
        labels can differ from the dense-id path's — same partition
        semantics, different representative)."""
        self._prepare(0.85)
        res = _lpa_labels_pool_loop(self, max_iters, "sharded_lpa_iter",
                                    workdir=workdir, algo="labelprop_bigv",
                                    checkpoint_every=checkpoint_every,
                                    resume=resume)
        refs = [s.labels_result_table.remote() for s in self.shards]
        return res, ray.data.from_arrow_refs(refs)


def _lpa_labels_pool_loop(pool: "HashShardPool", max_iters: int,
                          iter_method: str, workdir: str | None = None,
                          algo: str = "labels_bigv",
                          checkpoint_every: int = 10,
                          resume: bool = False) -> IterativeResult:
    """Shared BSP label loop (min-label / LPA) over a prepared pool, with
    optional per-shard checkpoints (same protocol as ``pagerank``)."""
    import json as _json
    import os

    k = len(pool.shards)
    mode = "min" if iter_method == "sharded_minlabel_iter" else "lpa"
    start_it = 0
    incoming = None
    if workdir and resume:
        base = os.path.join(workdir, algo)
        done = sorted(
            d for d in (os.listdir(base) if os.path.isdir(base) else [])
            if d.startswith("iter_")
            and os.path.exists(os.path.join(base, d, "MANIFEST.json")))
        if done:
            path = os.path.join(base, done[-1])
            with open(os.path.join(path, "MANIFEST.json")) as f:
                meta = _json.load(f)
            if meta["num_shards"] != k:
                raise ValueError(
                    f"checkpoint has {meta['num_shards']} shards, "
                    f"pool has {k}; rebuild with a matching pool")
            ray.get([s.load_labels_checkpoint.remote(path)
                     for s in pool.shards])
            if meta.get("converged"):
                # completed run: state restored, skip the resume round
                return IterativeResult(np.empty(0), meta["iteration"] + 1,
                                       True)
            start_it = meta["iteration"] + 1
            incoming = _route(
                ray.get([s.resume_label_messages.remote(mode)
                         for s in pool.shards]), k)
    if incoming is None:
        ray.get([s.sharded_labels_init.remote() for s in pool.shards])
        incoming = _route(
            ray.get([s.labels_init_hub.remote(mode)
                     for s in pool.shards]), k)
    res = IterativeResult(np.empty(0), 0, False)
    it = start_it - 1
    for it in range(start_it, max_iters):
        t0 = time.perf_counter()
        outs = ray.get([getattr(s, iter_method).remote(incoming[p])
                        for p, s in enumerate(pool.shards)])
        changed = int(sum(o[0] for o in outs))
        incoming = _route([o[1] for o in outs], k)
        res.deltas.append(float(changed))
        res.seconds_per_iter.append(time.perf_counter() - t0)
        converged = changed == 0
        if workdir and (converged or (it + 1) % checkpoint_every == 0):
            path = os.path.join(workdir, algo, f"iter_{it:04d}")
            ray.get([s.save_labels_checkpoint.remote(path)
                     for s in pool.shards])
            with open(os.path.join(path, "MANIFEST.json"), "w") as f:
                _json.dump({"iteration": it, "changed": changed,
                            "converged": converged, "num_shards": k}, f)
        if converged:
            res.iterations, res.converged = it + 1, True
            break
    else:
        res.iterations = max(it + 1, start_it)
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


# Doubled-table row cap for the local triangle twin (≈1M undirected
# edges): below it the four-join distributed pipeline is pure exchange
# fixed cost (~2 s/join aggregator spin-up, 8.7 s total measured on a
# 527k-edge graph at 32 cpus) for work one numpy task finishes in well
# under a second. Same pattern/cap as the hyperball/louvain local twins;
# the wedge-count ceiling below additionally protects against dense
# graphs whose expansion is superlinear in the row count.
_LOCAL_TRI_MAX_ROWS = 1 << 21


# Wedge-count ceiling for the local twin: the wedge expansion is the
# E^1.5-worst-case term (the row cap bounds E, NOT the wedge count — a
# near-clique just under the row cap has ~5e8 wedges), so a graph whose
# oriented wedge total exceeds this falls through to the partitioned
# streaming join pipeline, which spreads exactly that expansion across
# tasks. Chunked enumeration below additionally bounds PEAK memory to
# ~6 arrays × _TRI_CHUNK_WEDGES regardless of the total.
_LOCAL_TRI_MAX_WEDGES = 1 << 26
_TRI_CHUNK_WEDGES = 1 << 22


def _local_triangles_bigv(t: "pa.Table") \
        -> "tuple[int, ray.data.Dataset] | None":
    """One-task numpy twin of the distributed ``triangles_bigv`` join
    pipeline — bit-identical outputs including duplicate-edge
    multiplicity (a duplicated closing edge multiplies the hash join's
    output rows; the twin weighs each wedge by the closing edge's row
    count). Returns None when the oriented wedge total exceeds
    ``_LOCAL_TRI_MAX_WEDGES`` — the caller then runs the distributed
    path, whose partitioned joins are built for that expansion.
    Inner-join semantics are mirrored: canonical edges whose endpoint
    never appears as ``src`` (impossible on a symmetrized doubled
    table) are dropped, like the degree-attach inner joins."""
    src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    nodes, degs = np.unique(src, return_counts=True)
    V = len(nodes)
    half = src < dst
    s, d = src[half], dst[half]
    pos_d = np.searchsorted(nodes, d)
    ok = (pos_d < V) & (nodes[np.minimum(pos_d, V - 1)] == d)
    s, d, pos_d = s[ok], d[ok], pos_d[ok]
    if len(s) == 0:
        return 0, ray.data.from_arrow(pa.table({
            "node_id": pa.array(nodes, pa.int64()),
            "tri_count": pa.array(np.zeros(V, np.int64))}))
    pos_s = np.searchsorted(nodes, s)
    swap = degs[pos_d] < degs[pos_s]
    iu = np.where(swap, pos_d, pos_s)
    iv = np.where(swap, pos_s, pos_d)
    ekeys = np.sort(iu * V + iv)
    # wedges (u→v, v→w): right side sorted by its source vertex
    order = np.argsort(iu, kind="stable")
    ou, ov = iu[order], iv[order]
    lo = np.searchsorted(ou, iv, "left")
    cnt = np.searchsorted(ou, iv, "right") - lo
    off = np.concatenate([[0], np.cumsum(cnt)])
    if off[-1] > _LOCAL_TRI_MAX_WEDGES:
        return None
    counts = np.zeros(V, np.int64)
    total = 0
    # chunk over left edges so peak memory tracks _TRI_CHUNK_WEDGES
    bounds = np.searchsorted(
        off, np.arange(_TRI_CHUNK_WEDGES, off[-1], _TRI_CHUNK_WEDGES))
    for a, b in zip(np.concatenate([[0], bounds]),
                    np.concatenate([bounds, [len(iu)]])):
        if a >= b:
            continue
        c = cnt[a:b]
        li = np.repeat(np.arange(a, b, dtype=np.int64), c)
        o0 = off[a:b] - off[a]
        ri = (np.arange(off[b] - off[a], dtype=np.int64)
              - np.repeat(o0, c) + np.repeat(lo[a:b], c))
        wa, wm, ww = iu[li], iv[li], ov[ri]
        ck = wa * V + ww
        # closing-edge MULTIPLICITY, not membership: the distributed
        # join emits one triangle row per duplicate closing-edge row
        mult = (np.searchsorted(ekeys, ck, "right")
                - np.searchsorted(ekeys, ck, "left"))
        hit = mult > 0
        w = mult[hit]
        total += int(w.sum())
        for ids in (wa[hit], wm[hit], ww[hit]):
            counts += np.bincount(ids, weights=w,
                                  minlength=V).astype(np.int64)
    return total, ray.data.from_arrow(pa.table({
        "node_id": pa.array(nodes, pa.int64()),
        "tri_count": pa.array(counts)}))


def triangles_bigv(enc: "ray.data.Dataset", num_partitions: int | None = None,
                   local_max_edges: int | None = None
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

    Below ``local_max_edges`` doubled rows (default ``_LOCAL_TRI_MAX_ROWS``;
    pass 0 to disable) the whole computation routes to the one-task numpy
    twin — on tiny graphs the four hash joins here are pure exchange
    fixed cost (round-3 verdict item #7's routing rationale); the
    distributed path is unchanged above the gate and parity-pinned in
    ``tests/test_local_gates.py``.
    """
    from ray.data.aggregate import Count, Sum

    from cuttana_ray.util import local_table, pool_size, safe_join

    n_rows = enc.count()
    cap = _LOCAL_TRI_MAX_ROWS if local_max_edges is None else local_max_edges
    if cap and n_rows <= cap:
        lt = local_table(enc.select_columns(["src", "dst"]))
        if lt is None:    # empty input: no vertices, no triangles
            return 0, ray.data.from_arrow(pa.table({
                "node_id": pa.array([], pa.int64()),
                "tri_count": pa.array([], pa.int64())}))
        res = _local_triangles_bigv(lt)
        if res is not None:
            return res
        # wedge total over _LOCAL_TRI_MAX_WEDGES (dense graph under the
        # row cap): fall through to the partitioned join pipeline

    deg = enc.groupby("src").aggregate(Count(alias_name="_deg")) \
        .materialize()
    if num_partitions is None:
        n_edges = n_rows // 2
        num_partitions = max(1, min(pool_size()[1], n_edges // 65536 + 1))

    # degree-attach joins run over the CANONICAL half (src < dst, E rows)
    # of the doubled table — each undirected edge needs (du, dv) exactly
    # once, so joining on the doubled 2E rows would double both exchanges
    # for rows the orientation filter then throws away.
    canon = enc.select_columns(["src", "dst"]) \
        .filter(expr="src < dst")
    ed = safe_join(canon,
                   deg.rename_columns({"src": "_a", "_deg": "_du"}),
                   join_type="inner", num_partitions=num_partitions,
                   on=("src",), right_on=("_a",))
    ed = safe_join(ed, deg.rename_columns({"src": "_b", "_deg": "_dv"}),
                   join_type="inner", num_partitions=num_partitions,
                   on=("dst",), right_on=("_b",))

    def orient(t: pa.Table) -> pa.Table:
        # one canonical (s < d) row per undirected edge → emit it oriented
        # low-degree → high-degree (degree ties keep the s < d direction,
        # matching the dense path's total order)
        sch = pa.schema([("u", pa.int64()), ("v", pa.int64())])
        if len(t) == 0 or "src" not in t.column_names:
            return sch.empty_table()
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        du = t["_du"].to_numpy(zero_copy_only=False)
        dv = t["_dv"].to_numpy(zero_copy_only=False)
        swap = dv < du
        return pa.table({"u": pa.array(np.where(swap, d, s), pa.int64()),
                         "v": pa.array(np.where(swap, s, d), pa.int64())})

    o = ed.map_batches(orient, batch_format="pyarrow").materialize()

    universe = deg.rename_columns({"src": "node_id"}) \
        .select_columns(["node_id"])

    def zero_counts(t: pa.Table) -> pa.Table:
        return pa.table({
            "node_id": pc.cast(t["node_id"], pa.int64()),
            "tri_count": pa.array(np.zeros(len(t), np.int64))})

    if o.count() == 0:
        return 0, universe.map_batches(zero_counts, batch_format="pyarrow")

    # wedge and closing joins stream end to end: neither intermediate is
    # consumed twice, so materializing them (the OLD shape) only parked the
    # largest table of the whole pipeline — the wedge set, >> E on skewed
    # graphs — in the object store for no reason.
    wedges = safe_join(o, o.rename_columns({"u": "v2", "v": "w"}),
                       join_type="inner", num_partitions=num_partitions,
                       on=("v",), right_on=("v2",))
    tri = safe_join(wedges, o.rename_columns({"u": "cu", "v": "cv"}),
                    join_type="inner", num_partitions=num_partitions,
                    on=("u", "w"), right_on=("cu", "cv"))

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

    from cuttana_ray.pipelines.pagerank import grouped_sum_exchange
    # bucketed sort-exchange, not the native per-key aggregate — ~96x at
    # V-cardinality keys (see grouped_sum_exchange); int sums are exact
    counts = grouped_sum_exchange(
        tri.map_batches(pv_partial, batch_format="pyarrow"),
        "vertex", "partial", int_val=True) \
        .rename_columns({"s": "_tc"}).materialize()
    # each triangle contributes 3 per-vertex increments → the grand total
    # is one metadata-cheap aggregate over the (small, per-vertex) counts,
    # not a count() barrier over the full triangle-instance table
    tc_sum = counts.sum("_tc") if counts.count() else None
    total = int(tc_sum or 0) // 3

    # zero-fill against the vertex universe as a union + groupby-sum
    # instead of a left join: the task-based aggregate exchange skips the
    # hash-shuffle join's aggregator-pool fixed cost (~2.5 s warm on a
    # 32-cpu box) and moves the same O(V) rows
    def zero_partial(t: pa.Table) -> pa.Table:
        sch = pa.schema([("vertex", pa.int64()), ("_tc", pa.int64())])
        if len(t) == 0 or "node_id" not in t.column_names:
            return sch.empty_table()
        return pa.table({
            "vertex": pc.cast(t["node_id"], pa.int64()),
            "_tc": pa.array(np.zeros(len(t), np.int64))})

    unioned = grouped_sum_exchange(
        universe.map_batches(zero_partial, batch_format="pyarrow")
        .union(counts), "vertex", "_tc", int_val=True) \
        .rename_columns({"s": "_tc"})

    def finish(t: pa.Table) -> pa.Table:
        sch = pa.schema([("node_id", pa.int64()), ("tri_count", pa.int64())])
        if len(t) == 0 or "vertex" not in t.column_names:
            return sch.empty_table()
        return pa.table({
            "node_id": pc.cast(t["vertex"], pa.int64()),
            "tri_count": pc.cast(pc.fill_null(t["_tc"], 0), pa.int64())})

    return total, unioned.map_batches(finish, batch_format="pyarrow")


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


# -- Cuttana-quality partitioning in the big-V regime -----------------------

@ray.remote
def _consume_sparse_adjacency(refs: list, k: int, config, chunk: int):
    """Sequential Cuttana stream over SPARSE 63-bit hash ids.

    The reference partitioner (``/root/reference/src/cuttana.rs:10-59``) is
    a sequential algorithm with O(V) state BY DESIGN; that state lives in
    THIS one task — never on the driver, which only routes small object
    refs. Dense stream ids are the vertex's rank in the sorted hash-id
    order (the same sorted-rank rule ``stages/vocab.py`` uses for names),
    computed by ``searchsorted`` against the id universe collected in a
    first metadata pass; blocks are then re-read one at a time (object
    store, zero-copy) and fed through ``consume_batch``. The assignment
    returns as CHUNKED Arrow refs → ``from_arrow_refs`` Dataset, so no
    O(V) table ever materializes driver-side."""
    from cuttana_ray.sources.adjacency import csr_batch
    from cuttana_ray.state.partitioner import StreamingPartitioner

    ids = []
    for r in refs:
        t = ray.get(r)
        if len(t) and "vertex" in t.column_names:
            ids.append(t["vertex"].to_numpy(zero_copy_only=False))
    if not ids:
        return [], {"vertex_count": 0}
    ids_sorted = np.sort(np.concatenate(ids))
    n = len(ids_sorted)
    sp = StreamingPartitioner(n, k, config)
    for r in refs:
        t = ray.get(r)
        if len(t) == 0 or "vertex" not in t.column_names:
            continue
        vertices, offsets, flat = csr_batch(t)
        sp.consume_batch(np.searchsorted(ids_sorted, vertices),
                         offsets.astype(np.int64),
                         np.searchsorted(ids_sorted, flat))
    res = sp.finalize()
    node = ids_sorted[res.vertices]
    out_refs = []
    for lo in range(0, len(node), chunk):
        out_refs.append(ray.put(pa.table({
            "node_id": pa.array(node[lo:lo + chunk], pa.int64()),
            "partition": pa.array(
                res.partitions[lo:lo + chunk].astype(np.int32)),
        })))
    info = {
        "vertex_count": res.vertex_count,
        "edge_count": res.edge_count,
        "edge_cut_ratio_stream": res.edge_cut_ratio,
        "refine_moves": res.refine_moves,
    }
    return out_refs, info


def bigv_cuttana_assignment(enc: "ray.data.Dataset", k: int,
                            config=None, chunk: int = 1 << 20
                            ) -> "tuple[ray.data.Dataset, dict]":
    """Cuttana-quality partition ASSIGNMENT for hash-id edges, carried as
    a distributed (node_id → partition) Dataset — closes the round-3
    verdict's 'big-V forfeits cut quality' gap (old ``bigv.py`` header
    note): the sequential partitioner streams the sorted-hash-id
    adjacency inside one task, and everything downstream (cut metrics,
    shard routing) consumes the assignment by JOIN, never as a dense
    vector.

    Input: symmetrized hash-encoded ``(src, dst, weight)``. Returns
    ``(assignments Dataset (node_id:int64, partition:int32), info)``."""
    from cuttana_ray.stages.edges import build_adjacency

    adj = build_adjacency(enc).sort("vertex").materialize()
    refs = [r for r in adj.to_arrow_refs()]
    out_refs, info = ray.get(_consume_sparse_adjacency.remote(
        refs, k, config, chunk))
    if not out_refs:
        return ray.data.from_arrow(pa.table({
            "node_id": pa.array([], pa.int64()),
            "partition": pa.array([], pa.int32())})), info
    return ray.data.from_arrow_refs(out_refs), info


def partition_quality_join(enc: "ray.data.Dataset",
                           assign: "ray.data.Dataset", k: int,
                           edge_count: int | None = None) -> dict:
    """Cut metrics for a symmetrized hash-id edge table under a
    DISTRIBUTED assignment: both endpoint partitions attach by hash join
    (the big-V replacement for ``stages/metrics.partition_quality``'s
    broadcast dense vector), per-batch (cut, total) partials combine on
    the driver, and balance comes from one k-row groupby. Definitions
    match the reference exactly (``assignment.rs:87-99``): cut counts
    each undirected edge once; edge_count counts directed endpoints.
    ``edge_count``: pass a known ``enc.count()`` (callers that
    session-cache the graph build have it) to skip the sizing count.

    Under ``CUTTANA_ATTACH_BROADCAST_MAX`` assigned vertices the
    endpoint partitions attach via the broadcast sorted-array lookup
    (``attach_edge_partitions``) — zero joins; past the gate, two
    distributed hash joins (each join is the measured ~1-2.5 s
    aggregator fixed cost at ANY size, which dominated this function
    at contract scale)."""
    from ray.data.aggregate import Count
    from cuttana_ray.util import pool_size, safe_join

    if edge_count is None:
        edge_count = enc.count()
    if assign.count() <= CUTTANA_ATTACH_BROADCAST_MAX:
        j = attach_edge_partitions(enc, assign) \
            .rename_columns({"src_part": "p_src", "dst_part": "p_dst"})
    else:
        npart = max(1, min(pool_size()[1], edge_count // 262144 + 1))
        j = safe_join(
            safe_join(enc.select_columns(["src", "dst"]),
                      assign.rename_columns({"node_id": "_s",
                                             "partition": "p_src"}),
                      join_type="inner", num_partitions=npart,
                      on=("src",), right_on=("_s",)),
            assign.rename_columns({"node_id": "_d", "partition": "p_dst"}),
            join_type="inner", num_partitions=npart,
            on=("dst",), right_on=("_d",))

    def counter(batch: pa.Table) -> pa.Table:
        sch = pa.schema([("cut", pa.int64()), ("total", pa.int64())])
        if len(batch) == 0 or "p_src" not in batch.column_names:
            return sch.empty_table()
        ps = batch["p_src"].to_numpy(zero_copy_only=False)
        pd_ = batch["p_dst"].to_numpy(zero_copy_only=False)
        return pa.table({
            "cut": pa.array([int((ps != pd_).sum())], pa.int64()),
            "total": pa.array([len(ps)], pa.int64())}).cast(sch)

    doubled_cut = 0
    measured_edges = 0
    for b in j.map_batches(counter, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(b) == 0 or "cut" not in b.column_names:
            continue
        doubled_cut += int(b["cut"].to_numpy(zero_copy_only=False).sum())
        measured_edges += int(
            b["total"].to_numpy(zero_copy_only=False).sum())
    edge_count = measured_edges
    cut_count = doubled_cut // 2
    sizes = np.zeros(k, np.int64)
    for b in assign.groupby("partition").aggregate(
            Count(alias_name="n")).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        if len(b) == 0 or "partition" not in b.column_names:
            continue
        sizes[b["partition"].to_numpy(zero_copy_only=False)] = \
            b["n"].to_numpy(zero_copy_only=False)
    v_count = int(sizes.sum())
    return {
        "edge_count": edge_count,
        "cut_count": cut_count,
        "edge_cut_ratio": (cut_count / edge_count) if edge_count else 0.0,
        "communication_volume": (cut_count / (k * v_count))
        if v_count else 0.0,
        "balance_factor": (float(sizes.max()) / (v_count / k))
        if v_count else 0.0,
        "partition_sizes": sizes.tolist(),
    }
