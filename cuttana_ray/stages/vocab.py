"""Node vocabulary: dictionary-encode string node names to dense int64 ids.

The reference works on generic hashable vertex ids
(``/root/reference/src/cuttana.rs:16``); the engine's graph nodes are strings
("conv:…", "tool:…", "role:…"), dictionary-encoded once so every downstream
stage (partitioner state, PageRank rank vectors, CSR blocks) can use flat
NumPy arrays indexed by vertex id.

Determinism: ids are assigned by sorted name order, so results are stable
across runs, block layouts and cluster sizes (SURVEY.md §1.2).

Scale notes: the vocab is a classic broadcast dimension table — built once
via distinct+sort, shipped with ``ray.put`` once, and looked up with the
vectorized Arrow kernel ``pc.index_in`` per batch (no shuffle join). The
distinct itself is a shuffle over unique names only. For vocabularies too
large for one node's memory (≈10^11 conv ids at the north-star scale) use
``pipelines/bigv.py``: collision-checked 63-bit hash ids (stateless encode,
no dimension table) with vertex state sharded by ``id % k`` — implemented
and parity-tested (tests/test_bigv.py); the broadcast path here stays the
default because it is exact, dense-id and matches the sandbox scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


NODE_SCHEMA = pa.schema([
    ("node_id", pa.int64()), ("name", pa.string()), ("kind", pa.string()),
])


@ray.remote
def _dedup_block(t: pa.Table) -> pa.Table:
    """Adjacent-duplicate removal within one sorted name block."""
    n = len(t)
    if n == 0 or "name" not in t.column_names:
        return pa.table({"name": pa.array([], pa.string())})
    name = t["name"].combine_chunks()
    if n == 1:
        return pa.table({"name": name})
    keep = np.concatenate([[True], np.invert(
        pc.equal(name.slice(1, n), name.slice(0, n - 1))
        .to_numpy(zero_copy_only=False))])
    return pa.table({"name": name.filter(pa.array(keep))})


@ray.remote
def _block_meta(t: pa.Table) -> tuple[int, str | None, str | None]:
    if len(t) == 0:
        return 0, None, None
    return len(t), t["name"][0].as_py(), t["name"][len(t) - 1].as_py()


@ray.remote
def _ids_for_block(t: pa.Table, offset: int, drop_first: bool) -> pa.Table:
    if drop_first:
        t = t.slice(1)
    name = t["name"].combine_chunks()
    kind = pc.replace_substring_regex(name, pattern=":.*$", replacement="")
    return pa.table({
        "node_id": pa.array(np.arange(offset, offset + len(t),
                                      dtype=np.int64)),
        "name": name,
        "kind": kind,
    })


def build_vocab_dataset(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distributed vocab build: per-block distinct → global SORT over the
    per-block-unique names (a sort is ~30× cheaper than Ray's hash groupby
    when most keys are distinct) → per-block adjacent dedup → cross-block
    boundary dedup + id assignment from cumulative block counts (the
    driver sees only O(#blocks) metadata, never the names). Ids equal the
    rank in sorted-name order — identical to the collected form, at any
    vocabulary size."""
    def names(batch: pa.Table) -> pa.Table:
        u = pc.unique(pa.chunked_array([
            pc.cast(batch["src"], pa.string()).combine_chunks(),
            pc.cast(batch["dst"], pa.string()).combine_chunks(),
        ]).combine_chunks())
        return pa.table({"name": u})

    srt = edges.map_batches(names, batch_format="pyarrow") \
        .sort("name").materialize()
    deduped = [_dedup_block.remote(r) for r in srt.to_arrow_refs()]
    metas = ray.get([_block_meta.remote(r) for r in deduped])
    # cross-block boundary: a block's first name may equal the previous
    # non-empty block's last name (duplicates cluster under the sort)
    live: list[tuple] = []       # (ref, effective_len, drop_first)
    prev_last: str | None = None
    for ref, (ln, first, last) in zip(deduped, metas):
        if ln == 0:
            continue
        drop = first == prev_last
        eff = ln - int(drop)
        if eff > 0:
            live.append((ref, eff, drop))
        prev_last = last
    if not live:
        return ray.data.from_arrow(NODE_SCHEMA.empty_table())
    offsets = np.concatenate(
        [[0], np.cumsum([e for _, e, _ in live])[:-1]]).astype(np.int64)
    out_refs = [_ids_for_block.remote(r, int(o), drop)
                for (r, _, drop), o in zip(live, offsets)]
    return ray.data.from_arrow_refs(out_refs)


def build_vocab(edges: "ray.data.Dataset") -> pa.Table:
    """Distinct sorted node names from a string edge table → nodes table
    (``node_id, name, kind``); ``kind`` is the "prefix:" namespace.

    The distinct + sort + id assignment run distributed
    (``build_vocab_dataset``); only the finished dimension table is
    collected here, because every current consumer broadcasts it
    (``encode_edges``). A vocabulary too large to collect should use
    ``build_vocab_dataset`` + a distributed join to encode instead."""
    t = pa.concat_tables(
        ray.get(build_vocab_dataset(edges).to_arrow_refs()))
    return t.combine_chunks()


def encode_edges(edges: "ray.data.Dataset", vocab: pa.Table) -> "ray.data.Dataset":
    """String edge table → int64 edge table via a broadcast vocab and the
    vectorized ``pc.index_in`` kernel (one ``ray.put`` for the whole job, not
    one ship per batch)."""
    vocab_ref = ray.put(vocab["name"].combine_chunks())

    # plain tasks, not an actor pool: the per-task ``ray.get`` of the
    # broadcast vocab is a zero-copy mmap of the node-local object-store
    # copy (one transfer per NODE on a cluster, free single-node), and
    # ``index_in`` needs no per-worker prep — so an actor pool here buys
    # nothing per batch while paying ~3.5 s pool spin-up per graph build
    # (measured at sf0.1: 4.7 s actor-pool encode vs 1.2 s task encode)
    def encode(batch: pa.Table) -> pa.Table:
        names = ray.get(vocab_ref)
        src = pc.index_in(pc.cast(batch["src"], pa.string()),
                          value_set=names)
        dst = pc.index_in(pc.cast(batch["dst"], pa.string()),
                          value_set=names)
        return pa.table({
            "src": pc.cast(src, pa.int64()),
            "dst": pc.cast(dst, pa.int64()),
            "weight": batch["weight"],
        })

    return edges.map_batches(encode, batch_format="pyarrow")


def decode_column(ds: "ray.data.Dataset", vocab: pa.Table,
                  column: str, out: str | None = None) -> "ray.data.Dataset":
    """Attach the string name for an int node-id column (broadcast lookup)."""
    out = out or f"{column}_name"
    vocab_ref = ray.put(vocab["name"].combine_chunks())

    # tasks for the same reason as ``encode_edges``: zero-copy node-local
    # broadcast fetch, no per-worker prep, no actor-pool spin-up
    def decode(batch: pa.Table) -> pa.Table:
        names = ray.get(vocab_ref)
        ids = pc.cast(batch[column], pa.int64())
        return batch.append_column(out, pc.take(names, ids))

    return ds.map_batches(decode, batch_format="pyarrow")
