"""Storage-layout operators: Z-order (Morton) clustering.

Multi-dimensional locality for scan pruning — the technique behind
Delta/Iceberg ``ZORDER BY``: interleaving the bits of two sort columns
puts rows that are close in BOTH dimensions into the same blocks, so a
predicate on either column touches a bounded fraction of files instead
of all of them. The reference engine has no layout operators at all
(SURVEY.md §2.4); this widens the sort/top-k family with the
locality-sort variant.

``zorder_key`` is one vectorized ``map_batches`` pass (a per-bit
shift/mask loop over whole NumPy columns — 2·bits integer ops per row,
no Python rows); ``zorder_sort`` then runs the single global sort on the
interleaved key. The bit loop is written exactly as the SQL oracle
replays it, so the key is int64-exact on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

DEFAULT_BITS = 21        # 2x21 interleaved bits stay well inside int64


def morton_interleave(a: np.ndarray, b: np.ndarray,
                      bits: int = DEFAULT_BITS) -> np.ndarray:
    """Interleave the low ``bits`` of two non-negative int64 columns:
    bit ``i`` of ``a`` lands at position ``2i``, of ``b`` at ``2i+1``."""
    a = a.astype(np.int64)
    b = b.astype(np.int64)
    out = np.zeros(len(a), np.int64)
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def zorder_key(ds: "ray.data.Dataset", col_a: str, col_b: str,
               bits: int = DEFAULT_BITS,
               key_col: str = "zkey") -> "ray.data.Dataset":
    """Append the Morton key of (``col_a``, ``col_b``) as ``key_col``."""
    def add_key(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column(key_col, pa.array([], pa.int64()))
        z = morton_interleave(
            t[col_a].to_numpy(zero_copy_only=False),
            t[col_b].to_numpy(zero_copy_only=False), bits)
        return t.append_column(key_col, pa.array(z, pa.int64()))
    return ds.map_batches(add_key, batch_format="pyarrow")


def zorder_sort(ds: "ray.data.Dataset", col_a: str, col_b: str,
                bits: int = DEFAULT_BITS) -> "ray.data.Dataset":
    """Cluster the dataset on the space-filling curve over
    (``col_a``, ``col_b``): one key pass + ONE global sort — written
    this way, `write_parquet` emits files whose (col_a, col_b) bounding
    boxes are compact, which is what makes downstream row-group pruning
    effective on either column."""
    return zorder_key(ds, col_a, col_b, bits).sort("zkey")


def morton_sql_expr(col_a: str, col_b: str,
                    bits: int = DEFAULT_BITS) -> str:
    """The identical interleave as a DuckDB SQL expression (used by the
    driver oracle; bit-for-bit equal to ``morton_interleave``)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({col_a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({col_b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)
