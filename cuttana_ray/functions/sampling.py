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
