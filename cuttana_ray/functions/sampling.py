"""Deterministic sampling operators.

Sampling for training-data pipelines must be reproducible across runs,
cluster sizes, and block layouts — so instead of RNG state (which is
per-worker and layout-dependent) we hash a stable key column with a Lehmer
LCG in exact int64 arithmetic. The same arithmetic is expressible in ANSI
SQL, which is what makes ``orders_sample`` a driver-checkable query rather
than a rows-only one.

Zero shuffles: both operators are embarrassingly parallel batch filters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# Lehmer / Park-Miller constants: multiplier 48271, modulus 2^31-1. Safe in
# int64 for keys < 2^63 / 48271 ≈ 1.9e14 (any realistic surrogate key).
_MUL = 48271
_MOD = 2_147_483_647


def _bucket(keys: np.ndarray, seed: int) -> np.ndarray:
    """Pseudo-random bucket in [0, 1000) per key — exact integer math,
    identical in SQL: ``((key * 48271 + seed) % 2147483647) % 1000``.
    Keys must be non-negative: SQL ``%`` truncates toward zero while
    numpy's floors, so negative keys would diverge from the oracle."""
    return ((keys * _MUL + seed) % _MOD) % 1000


def hash_sample(ds: "ray.data.Dataset", key_col: str, permille: int,
                seed: int = 0) -> "ray.data.Dataset":
    """Keep ~``permille``/1000 of rows, chosen deterministically by
    ``key_col`` (int-typed): the same key always samples the same way, so
    reruns, resumed runs, and different block layouts agree row-for-row."""

    def keep(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        k = pc.cast(t[key_col], pa.int64()).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(_bucket(k, seed) < permille))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(ds: "ray.data.Dataset", key_col: str,
                      stratum_col: str, rates: dict[str, int],
                      default_permille: int = 0,
                      seed: int = 0) -> "ray.data.Dataset":
    """Per-stratum deterministic sampling: ``rates`` maps stratum value →
    permille kept (strata absent from the map fall back to
    ``default_permille``). The workhorse of quality-tiered training-data
    mixes (keep 100% of high-quality docs, 5% of boilerplate)."""

    def keep(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        k = pc.cast(t[key_col], pa.int64()).to_numpy(zero_copy_only=False)
        buckets = _bucket(k, seed)
        strata = t[stratum_col].to_pandas().to_numpy()
        thresh = np.full(len(t), default_permille, np.int64)
        for value, pm in rates.items():
            thresh[strata == value] = pm
        return t.filter(pa.array(buckets < thresh))

    return ds.map_batches(keep, batch_format="pyarrow")


def source_mixture_weights(ds: "ray.data.Dataset", source_col: str = "source",
                           max_upsample: float = 2.0) -> pa.Table:
    """Per-source resampling weights that move the corpus toward a
    UNIFORM source mixture — the data-mixing step a training pipeline
    runs before sampling (the DoReMi-family shape with a fixed uniform
    target instead of learned reference losses):

    * ``natural_share`` — the source's fraction of documents;
    * ``weight = min(target/natural, max_upsample)`` with
      ``target = 1/#sources`` — the per-document sampling multiplier,
      capped so rare sources are not upsampled past ``max_upsample``
      (unbounded duplication of a tiny source hurts more than an
      imperfect mixture);
    * ``resampled_share`` — the mixture the capped weights actually
      produce, renormalized.

    Scale shape: per-batch ``group_by(source)`` partial counts → one
    tiny ``groupby(source)`` Sum exchange; the finish runs on O(#sources)
    rows (sources are a bounded dimension — the documented small-result
    driver finish). Output sorted by source for deterministic replay.
    """
    from ray.data.aggregate import Sum

    from cuttana_ray.util import drop_empty_blocks, local_table

    def partial(t: pa.Table) -> pa.Table:
        sch = pa.schema([("source", pa.string()), ("_n", pa.int64())])
        if len(t) == 0 or source_col not in t.column_names:
            return sch.empty_table()
        out = pa.table({"source": pc.cast(t[source_col], pa.string())}) \
            .group_by(["source"]).aggregate([([], "count_all")])
        return pa.table({"source": out["source"],
                         "_n": out["count_all"]}).cast(sch)

    agg = local_table(drop_empty_blocks(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source").aggregate(Sum("_n", alias_name="n"))))
    empty = pa.table({"source": pa.array([], pa.string()),
                      "n_docs": pa.array([], pa.int64()),
                      "natural_share": pa.array([], pa.float64()),
                      "weight": pa.array([], pa.float64()),
                      "resampled_share": pa.array([], pa.float64())})
    if agg is None or len(agg) == 0:
        return empty
    order = pc.sort_indices(agg, sort_keys=[("source", "ascending")])
    agg = agg.take(order)
    n = agg["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    total = n.sum()
    k = len(n)
    nat = n / total
    wt = np.minimum((1.0 / k) / nat, float(max_upsample))
    eff = wt * nat
    res = eff / eff.sum()

    def r6(x):
        # half-away-from-zero to match SQL ROUND (np.round is half-to-
        # even and diverges on exactly-representable decimal midpoints
        # like 1/128); values here are all >= 0
        return pc.round(pa.array(x, pa.float64()), 6,
                        round_mode="half_towards_infinity")

    return pa.table({
        "source": agg["source"],
        "n_docs": pa.array(n.astype(np.int64)),
        "natural_share": r6(nat),
        "weight": r6(wt),
        "resampled_share": r6(res)})


def token_budget_allocation(ds: "ray.data.Dataset", budget_tokens: int,
                            source_col: str = "source",
                            chars_col: str = "n_chars",
                            chars_per_token: int = 4,
                            max_upsample: float = 2.0) -> pa.Table:
    """Turn a token budget into a per-source allocation plan — the step
    after ``source_mixture_weights``: estimate each source's tokens
    (``Σ floor(n_chars / chars_per_token)``, the standard chars/4
    heuristic), re-run the capped uniform-target mixture math on TOKEN
    shares, and allocate ``floor(budget · resampled_share)`` tokens per
    source. ``epochs`` (allocation / available) is the repetition
    factor trainers watch — >1 means the source will be seen more than
    once at this budget.

    Scale shape: per-batch (source, token) partials → one tiny groupby;
    O(#sources) finish. Output sorted by source:
    ``(source, est_tokens, token_share, weight, alloc_tokens, epochs)``.
    """
    from ray.data.aggregate import Sum

    from cuttana_ray.util import drop_empty_blocks, local_table

    def partial(t: pa.Table) -> pa.Table:
        sch = pa.schema([("source", pa.string()), ("_tok", pa.int64())])
        if len(t) == 0 or source_col not in t.column_names:
            return sch.empty_table()
        tok = t[chars_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64) // chars_per_token
        out = pa.table({"source": pc.cast(t[source_col], pa.string()),
                        "_tok": pa.array(tok)}) \
            .group_by(["source"]).aggregate([("_tok", "sum")])
        return pa.table({"source": out["source"],
                         "_tok": out["_tok_sum"]}).cast(sch)

    agg = local_table(drop_empty_blocks(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source").aggregate(Sum("_tok", alias_name="tok"))))
    empty = pa.table({"source": pa.array([], pa.string()),
                      "est_tokens": pa.array([], pa.int64()),
                      "token_share": pa.array([], pa.float64()),
                      "weight": pa.array([], pa.float64()),
                      "alloc_tokens": pa.array([], pa.int64()),
                      "epochs": pa.array([], pa.float64())})
    if agg is None or len(agg) == 0:
        return empty
    order = pc.sort_indices(agg, sort_keys=[("source", "ascending")])
    agg = agg.take(order)
    tok = agg["tok"].to_numpy(zero_copy_only=False).astype(np.float64)
    k = len(tok)
    nat = tok / tok.sum()
    wt = np.minimum((1.0 / k) / nat, float(max_upsample))
    res = wt * nat / (wt * nat).sum()
    alloc = np.floor(float(budget_tokens) * res).astype(np.int64)
    epochs = alloc / np.maximum(tok, 1.0)

    def r6(x):
        return pc.round(pa.array(np.asarray(x, np.float64)), 6,
                        round_mode="half_towards_infinity")

    return pa.table({
        "source": agg["source"],
        "est_tokens": pa.array(tok.astype(np.int64)),
        "token_share": r6(nat),
        "weight": r6(wt),
        "alloc_tokens": pa.array(alloc),
        "epochs": r6(epochs)})
