"""Edit-distance (Levenshtein) near-duplicate verification.

The dedup family (``functions/dedup.py``) generates candidates by sketch
(MinHash bands / SimHash / shingles); this module adds the classic
character-level verifier: exact Levenshtein distance over candidate pairs,
computed distributedly. Candidates here come from cheap prefix blocking —
documents sharing their first ``prefix_len`` characters — which is the
textbook blocking key for edit-distance dedup (an edit inside the prefix
moves the doc to another bucket; sketch-based candidates can be piped into
``edit_distances`` instead when that matters).

Scale plan: blocking + pair expansion reuse the key-aligned vectorized
expansion of ``stages/keyblocks.py`` (no all-pairs stage anywhere); texts
are capped to ``text_cap`` chars BEFORE the exchange so the pair shuffle
moves bounded bytes; each pair's DP is O(text_cap²) with the inner loop
fully vectorized (the insertion chain folds into a ``minimum.accumulate``
via ``min_k cur[k]+(j-k) = j + min_k (cur[k]-k)``), so the Python-level
loop is text_cap iterations per pair, not a char-by-char double loop.

The reference engine has no text operators (SURVEY.md §2.4 gap list);
parity target is DuckDB's ``levenshtein()`` (single-character edits over
codepoints — identical to this kernel on the testdata's ASCII corpus).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from cuttana_ray.stages.keyblocks import within_group_pairs

from cuttana_ray.util import safe_join


def _lev(a: np.ndarray, b: np.ndarray) -> int:
    """Exact Levenshtein distance between two int32 codepoint arrays;
    row-DP with every row update vectorized over ``b``."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    ar = np.arange(lb + 1, dtype=np.int64)
    prev = ar.copy()
    cur = np.empty(lb + 1, dtype=np.int64)
    for i in range(1, la + 1):
        cur[0] = i
        np.minimum(prev[:-1] + (b != a[i - 1]), prev[1:] + 1, out=cur[1:])
        # insertions: cur[j] = min_k≤j cur[k] + (j-k) = j + min_k (cur[k]-k)
        np.subtract(cur, ar, out=cur)
        np.minimum.accumulate(cur, out=cur)
        np.add(cur, ar, out=cur)
        prev, cur = cur, prev
    return int(prev[-1])


def _codes(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32) \
        .astype(np.int32)


class _PairDistance:
    """Actor-pool stage: Levenshtein over (t1, t2) columns of a pair
    batch (setup-free today, but model-shaped for a learned verifier)."""

    def __init__(self, max_dist: int, prefix_len: int = 0):
        self.max_dist = max_dist
        self.prefix_len = prefix_len

    def __call__(self, t: pa.Table) -> pa.Table:
        schema = pa.schema([("d1", pa.int64()), ("d2", pa.int64()),
                            ("dist", pa.int64())])
        if len(t) == 0:
            return schema.empty_table()
        if self.prefix_len:
            # candidate buckets are keyed by a 62-bit prefix hash; re-check
            # the actual prefixes so a hash collision can only cost compute,
            # never add a wrong pair (hash-exact semantics)
            same = pc.equal(
                pc.utf8_slice_codeunits(t["_t1"], 0, self.prefix_len),
                pc.utf8_slice_codeunits(t["_t2"], 0, self.prefix_len))
            t = t.filter(same)
            if len(t) == 0:
                return schema.empty_table()
        t1 = t["_t1"].to_pylist()
        t2 = t["_t2"].to_pylist()
        dist = np.fromiter(
            (_lev(_codes(x), _codes(y)) for x, y in zip(t1, t2)),
            dtype=np.int64, count=len(t1))
        out = pa.table({"d1": t["d1"], "d2": t["d2"],
                        "dist": pa.array(dist)}).cast(schema)
        return out.filter(pc.less_equal(out["dist"], self.max_dist))


def edit_distance_pairs(ds: "ray.data.Dataset", id_col: str, text_col: str,
                        prefix_len: int = 16, text_cap: int = 128,
                        max_dist: int = 24) -> "ray.data.Dataset":
    """(d1, d2, dist) for document pairs sharing their first
    ``prefix_len`` chars with Levenshtein distance ≤ ``max_dist`` over the
    first ``text_cap`` chars. d1 < d2."""
    from cuttana_ray.util import pool_size

    def project(t: pa.Table) -> pa.Table:
        sch = pa.schema([("g", pa.int64()), ("i", pa.int64()),
                         ("_t", pa.string())])
        if len(t) == 0 or id_col not in t.column_names:
            return sch.empty_table()
        import pandas as pd
        # null text → empty string (ngram_jaccard_pairs.keyed does the
        # same); otherwise null prefixes hash into one shared bucket and
        # _PairDistance._codes(None) raises
        text = pc.fill_null(t[text_col], "")
        capped = pc.utf8_slice_codeunits(text, 0, text_cap)
        pfx = pc.utf8_slice_codeunits(text, 0, prefix_len)
        # pandas' siphash: stable across processes, no lazy-import race
        h = pd.util.hash_pandas_object(
            pd.Series(pfx.to_pandas()), index=False).to_numpy() \
            & np.uint64((1 << 62) - 1)
        g = pa.array(h.astype(np.int64))
        return pa.table({"g": g, "i": pc.cast(t[id_col], pa.int64()),
                         "_t": capped}).cast(sch)

    projected = ds.map_batches(project, batch_format="pyarrow") \
        .materialize()
    pairs = within_group_pairs(projected, "g", "i").drop_columns(["co"])
    texts1 = projected.select_columns(["i", "_t"]) \
        .rename_columns({"i": "p1", "_t": "_t1"})
    texts2 = projected.select_columns(["i", "_t"]) \
        .rename_columns({"i": "p2", "_t": "_t2"})
    joined = safe_join(safe_join(pairs, texts1, join_type="inner", num_partitions=8,
                        on=("p1",)), texts2, join_type="inner", num_partitions=8, on=("p2",)) \
        .rename_columns({"p1": "d1", "p2": "d2"})
    return joined.map_batches(_PairDistance,
                              fn_constructor_kwargs={
                                  "max_dist": max_dist,
                                  "prefix_len": min(prefix_len, text_cap)},
                              batch_format="pyarrow",
                              concurrency=pool_size(4))
