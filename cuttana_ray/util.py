"""Small shared utilities."""

from __future__ import annotations

import os

# Above this vertex count the iterative algorithms stop using driver-side
# dense combines and switch to distributed shuffle combines (override with
# the env var, e.g. in tests, to force the sharded path on small graphs).
DEFAULT_MAX_DRIVER_STATE = 200_000_000


def resolve_combine(combine: str, num_vertices: int) -> str:
    """``combine="auto"`` → "driver" while the dense O(V) vector is cheap
    on one node, "shuffle" beyond ``CUTTANA_MAX_DRIVER_STATE`` vertices."""
    if combine != "auto":
        return combine
    cap = int(os.environ.get("CUTTANA_MAX_DRIVER_STATE",
                             DEFAULT_MAX_DRIVER_STATE))
    return "driver" if num_vertices <= cap else "shuffle"


def strip_schema_metadata(ds):
    """Drop schema-level metadata (pandas round-trip blobs on parquet
    inputs): Ray's reduce tasks try to hash block schemas for deduplication
    and log 'Failed to hash the schemas' on every reduce when metadata is
    attached; stripping is zero-copy and fuses into the next map stage."""
    return ds.map_batches(lambda b: b.replace_schema_metadata(None),
                          batch_format="pyarrow", zero_copy_batch=True)


def drop_empty_blocks(ds):
    """Remove zero-row blocks from a dataset (block METADATA decides;
    non-empty payloads pass through zero-copy).

    ``groupby().map_groups`` — and, intermittently, the native hash
    aggregates — emit a SCHEMA-LESS empty block per input partition that
    held no groups, and empty blocks BYPASS later ``map_batches`` UDFs
    (the batcher yields no batches for them), so they cannot be
    normalized in-stream. If such a block wins the dataset's schema
    resolution, a downstream hash join fails with ``No match for key
    field reference ...``. This drops them (and normalizes any remaining
    pandas blocks to Arrow so ``from_arrow_refs`` is sound)."""
    import pyarrow as _pa

    import ray.data
    m = ds.map_batches(lambda t: t, batch_format="pyarrow",
                       zero_copy_batch=True).materialize()
    refs = []
    for bundle in m.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(ref)
    if not refs:
        return m
    return ray.data.from_arrow_refs(refs)


def local_table(ds) -> "_pa.Table":
    """Materialize a SMALL dataset to one driver-side Arrow table, skipping
    the schema-less empty blocks groupby stages emit (see
    ``drop_empty_blocks``). Callers gate on a row-count bound first — this
    is the documented local finish for size-gated fast paths, never for
    unbounded data."""
    import pyarrow as _pa

    import ray as _ray
    tables = [t for t in _ray.get(ds.to_arrow_refs())
              if len(t) > 0 and t.num_columns > 0]
    if not tables:
        return None
    return _pa.concat_tables(tables)


def safe_join(left, right, *args, **kwargs):
    """``Dataset.join`` with both sides cleaned of schema-less empty blocks
    first (see ``drop_empty_blocks``) — the package-internal join helper.

    Ray's hash-shuffle join materializes both sides into its aggregators
    anyway, so the extra pass is one zero-copy identity map per side; this
    helper is explicit at each call site instead of a process-wide
    ``ray.data.Dataset.join`` monkeypatch so unrelated ray.data users in the
    same process keep stock join behavior."""
    return drop_empty_blocks(left).join(drop_empty_blocks(right),
                                        *args, **kwargs)


def ensure_int64_key(ds, key: str, out: str = "_ik"):
    """Return ``(ds', keycol)`` where ``keycol`` is an int64 column usable
    as a carry-chain partition key (``stages/running.py`` keys runs on
    int64). Integer keys pass through unchanged (keycol == key); any other
    type gets a 62-bit siphash column plus a DISTRIBUTED injectivity check
    — one pre-combined exchange over unique (key, hash) pairs, O(#keys) —
    that raises on the ~2^-62-per-pair collision instead of silently
    merging two keys' runs."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    sch = ds.schema()
    if pa.types.is_integer(sch.types[sch.names.index(key)]):
        return ds, key

    def add_k(t: pa.Table) -> pa.Table:
        if len(t) == 0 or key not in t.column_names:
            return t.append_column(out, pa.array([], pa.int64()))
        import pandas as pd
        h = pd.util.hash_pandas_object(
            pd.Series(t[key].to_pandas()), index=False).to_numpy() \
            & np.uint64((1 << 62) - 1)
        return t.append_column(out, pa.array(h.astype(np.int64)))

    keyed = ds.map_batches(add_k, batch_format="pyarrow")

    from ray.data.aggregate import Count

    def upairs(t: pa.Table) -> pa.Table:
        psch = pa.schema([(key, pa.string()), (out, pa.int64())])
        if len(t) == 0 or key not in t.column_names:
            return psch.empty_table()
        return pa.table({key: pc.cast(t[key], pa.string()),
                         out: t[out]}).group_by([key, out]) \
            .aggregate([]).cast(psch)

    upair = keyed.map_batches(upairs, batch_format="pyarrow") \
        .groupby([key, out]).aggregate(Count(alias_name="_c")) \
        .materialize()
    n_pairs = upair.count()
    n_hashes = drop_empty_blocks(upair).groupby(out) \
        .aggregate(Count(alias_name="_n")).count()
    if n_pairs != n_hashes:
        raise ValueError(
            f"ensure_int64_key: 62-bit hash collision over column {key!r} "
            f"({n_pairs} keys -> {n_hashes} hashes); use an integer key")
    return keyed, out


def in_sorted(keys, vals):
    """Boolean membership of ``vals`` in the SORTED int array ``keys``
    (np.searchsorted + clamped equality — the shared idiom for broadcast
    key-set filters). Returns a bool array aligned with ``vals``."""
    import numpy as np
    if len(keys) == 0:
        return np.zeros(len(vals), dtype=bool)
    pos = np.searchsorted(keys, vals)
    return (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)] == vals)


def shard_cpu_reservation(total: float, k: int) -> float:
    """Per-actor ``num_cpus`` for a k-shard BSP pool on a ``total``-CPU
    cluster: ``min(1, total/k/1.5, (total-1)/k)``, floored at 0.05.

    The ``/1.5`` under-reservation keeps the pool schedulable while
    expressing contention honestly. The ``(total-1)/k`` term guarantees at
    least ONE whole CPU stays unreserved: Ray Data utility tasks (e.g. the
    ``get_table_block_metadata`` tasks ``ray.data.from_arrow_refs`` spawns
    to wrap shard result tables) demand a full CPU, and a pool that leaves
    only a fraction free deadlocks the driver's ``ray.get`` on them forever
    — observed as a hard hang at ``num_cpus=2, k=2`` in the scaling
    harness's lo point (bench.py ``--bigv-scaling-worker 2``)."""
    return max(0.05, min(1.0, total / k / 1.5, (total - 1) / k))


def pool_size(cap: int = 8) -> tuple[int, int]:
    """Actor-pool ``concurrency`` range ``(1, max)`` that leaves CPU headroom
    for the read/shuffle stages around it: max = half the cluster CPUs, at
    least 1, at most ``cap``.

    A pool that reserves every CPU starves its upstream/downstream operators
    and can stall the streaming executor indefinitely (observed with
    concurrency=4 on a 4-CPU test cluster). The min=1 end lets Ray launch
    fewer actors than max when the input has fewer blocks (a fixed int there
    warns and idles actors on small inputs).
    """
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 4)) if \
            ray.is_initialized() else 4
    except Exception:
        cpus = 4
    return (1, max(1, min(cap, cpus // 2)))
