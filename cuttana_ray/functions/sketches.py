"""Mergeable sketches for streaming/distributed summaries.

Engine-designed category (SURVEY.md §2.4 "sketches"; the reference has no
sketch support). MinHash/SimHash live with the dedup pipelines in
``functions/dedup.py``; this module holds cardinality sketches.

HyperLogLog here is the classic Flajolet–Fouillet–Gandouet–Meunier
construction (standard public algorithm): values hash to 64 bits, the top
``p`` bits pick one of ``m = 2^p`` registers, and each register keeps the
maximum leading-zero count (+1) of the remaining bits. Registers merge by
element-wise max — associative and commutative, which is exactly what makes
the sketch distributed-friendly: every batch produces an m-byte register
array, and any tree/driver combine of those arrays yields the same sketch
as a single pass. At 100 TB the shuffle traffic is m bytes per block
(16 KiB at p=14) regardless of row count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _hash_column(batch: pa.Table, col: str, seed: int = 42) -> np.ndarray:
    """Vectorized 64-bit hash of any column type (polars, like exact_dedup)."""
    import polars as pl

    h = pl.from_arrow(batch[col].combine_chunks()).hash(seed=seed)
    return h.to_numpy().astype(np.uint64)


def murmur64_int(vals: np.ndarray) -> np.ndarray:
    """DuckDB's integer ``hash()`` (murmur64 finalizer: xor-shift-32,
    multiply by 0xd6e8feb86659fd93, twice, then a final xor-shift),
    vectorized over uint64 with natural wraparound. Bit-identical to
    ``SELECT hash(x)`` for BIGINT x — the bridge that lets an approximate
    sketch be hash-compared against a DuckDB oracle computing the SAME
    sketch."""
    M = np.uint64(0xD6E8FEB86659FD93)
    x = np.ascontiguousarray(vals).astype(np.int64).view(np.uint64).copy()
    x ^= x >> np.uint64(32)
    x *= M
    x ^= x >> np.uint64(32)
    x *= M
    x ^= x >> np.uint64(32)
    return x


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_idx_rank(hashes: np.ndarray, p: int) -> "tuple[np.ndarray, np.ndarray]":
    """Per-hash HLL (register index, rank) pair: idx = top ``p`` bits,
    rank = leading zeros of the remaining 64-p bits (capped) + 1."""
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes << np.uint64(p)
    # exact vectorized bit_length via binary search (float log2 rounds wrong
    # above 2^53); leading zeros = 64 - bit_length, capped at the 64-p
    # remaining bits for rest == 0
    bl = np.zeros(len(rest), dtype=np.uint8)
    v = rest.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(s))
        bl[big] += np.uint8(s)
        v[big] >>= np.uint64(s)
    bl += (v > 0).astype(np.uint8)
    lz = np.minimum((64 - bl).astype(np.uint8), np.uint8(64 - p))
    rank = (lz + 1).astype(np.uint8)
    return idx, rank


def hll_registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """One batch's register array (uint8, len 2^p) from 64-bit hashes."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if not len(hashes):
        return regs
    idx, rank = hll_idx_rank(hashes, p)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Cardinality estimate with the standard small-range correction."""
    m = len(regs)
    est = _hll_alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return m * np.log(m / zeros)  # linear counting
    return float(est)


def approx_distinct(ds: "ray.data.Dataset", col: str, p: int = 14,
                    seed: int = 42, hash_fn: str = "polars") -> pa.Table:
    """Approximate COUNT(DISTINCT col) via HyperLogLog (±~1.04/sqrt(2^p),
    ≈0.8% at the default p=14).

    Per-batch register arrays (2^p bytes each, independent of batch row
    count) stream to an element-wise-max driver merge. Returns a one-row
    table ``(approx_distinct: int64, precision_p: int64)``.

    ``hash_fn="duckdb_int"`` (integer columns only) hashes with
    ``murmur64_int`` — bit-identical to DuckDB's ``hash()`` — so the whole
    sketch, estimate included, can be replayed in SQL and hash-compared;
    ``seed`` is ignored on that path. Default ``"polars"`` hashes any
    column type.
    """
    def partial(batch: pa.Table) -> pa.Table:
        if hash_fn == "duckdb_int":
            vals = batch[col].combine_chunks() \
                .to_numpy(zero_copy_only=False)
            hashes = murmur64_int(vals)
        else:
            hashes = _hash_column(batch, col, seed)
        regs = hll_registers(hashes, p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    merged = np.zeros(1 << p, dtype=np.uint8)
    parts = ds.map_batches(partial, batch_format="pyarrow")
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        for blob in b["regs"].to_pylist():
            np.maximum(merged, np.frombuffer(blob, dtype=np.uint8),
                       out=merged)
    return pa.table({
        "approx_distinct": pa.array([int(round(hll_estimate(merged)))],
                                    pa.int64()),
        "precision_p": pa.array([p], pa.int64()),
    })


# ---------------------------------------------------------------------------
# Count-Min sketch + exact-verified heavy hitters


def cms_add(regs: np.ndarray, hashes_by_row: list[np.ndarray],
            counts: np.ndarray) -> None:
    """Accumulate weighted keys into a (d, w) int64 Count-Min array."""
    d, w = regs.shape
    for j in range(d):
        np.add.at(regs[j], (hashes_by_row[j] % np.uint64(w)).astype(np.int64),
                  counts)


def heavy_hitters(ds: "ray.data.Dataset", col: str, min_count: int,
                  w: int = 8192, d: int = 4,
                  seed: int = 7) -> "ray.data.Dataset":
    """All values of ``col`` occurring ≥ ``min_count`` times, with their
    EXACT counts (``GROUP BY col HAVING COUNT(*) >= min_count`` — the
    output is exact; the sketch only prunes).

    Scale plan: (1) per-block partial counts (the usual combiner);
    (2) each partial-count block reduces to a (d, w) Count-Min array —
    fixed ``d*w*8`` bytes per block regardless of rows — merged by
    summation on the driver, same discipline as the HLL register merge
    above; (3) the merged sketch (a few hundred KiB) is broadcast into a
    filter over the partial counts: Count-Min never under-counts, so every
    true heavy hitter survives, and only the pruned survivors reach the
    final exact groupby. The full-cardinality exchange a plain
    GROUP-BY-HAVING needs (one row per distinct key) never happens — at
    web scale (say 10^11 distinct URLs, 10^3 heavy ones) that is the
    difference between shuffling the whole vocabulary and shuffling
    ~collision-bounded thousands of rows.
    """
    from ray.data.aggregate import Sum

    key_field = "key"
    dschema = ds.schema()
    ktype = dschema.types[dschema.names.index(col)]
    if not isinstance(ktype, pa.DataType):  # pandas-block datasets report
        try:                                # numpy dtypes here
            ktype = pa.from_numpy_dtype(np.dtype(ktype))
        except (pa.ArrowNotImplementedError, TypeError):
            ktype = pa.string()             # object dtype ⇒ strings
    pschema = pa.schema([(key_field, ktype), ("cnt", pa.int64())])

    def per_batch_counts(t: pa.Table) -> pa.Table:
        import polars as pl
        schema = pschema
        if len(t) == 0:
            return schema.empty_table()
        vc = pl.from_arrow(t[col].combine_chunks()).rename(key_field) \
            .value_counts()
        out = vc.to_arrow()
        cnt = out["count" if "count" in out.column_names else "counts"]
        return pa.table({key_field: out[key_field],
                         "cnt": pa.array(cnt.to_numpy(zero_copy_only=False)
                                         .astype(np.int64))}).cast(schema)

    partial = ds.map_batches(per_batch_counts,
                             batch_format="pyarrow").materialize()

    def cms_of_block(t: pa.Table) -> pa.Table:
        regs = np.zeros((d, w), dtype=np.int64)
        if len(t):
            hs = [_hash_column(t, key_field, seed + j) for j in range(d)]
            cms_add(regs, hs, t["cnt"].to_numpy(zero_copy_only=False))
        return pa.table({"cms": pa.array([regs.tobytes()], pa.binary())})

    merged = np.zeros((d, w), dtype=np.int64)
    for b in partial.map_batches(cms_of_block, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        for blob in b["cms"].to_pylist():
            merged += np.frombuffer(blob, dtype=np.int64).reshape(d, w)

    def survives(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        est = np.full(len(t), np.iinfo(np.int64).max, dtype=np.int64)
        for j in range(d):
            h = (_hash_column(t, key_field, seed + j) % np.uint64(w)) \
                .astype(np.int64)
            np.minimum(est, merged[j][h], out=est)
        return t.filter(pa.array(est >= min_count))

    exact = partial.map_batches(survives, batch_format="pyarrow") \
        .groupby(key_field).aggregate(Sum("cnt", alias_name="cnt"))
    return exact.filter(expr=f"cnt >= {int(min_count)}")


# ---------------------------------------------------------------------------
# Deterministic mergeable quantile sketch (Munro–Paterson-style compactor)
# ---------------------------------------------------------------------------

class QuantileSketch:
    """Bounded-size mergeable order-statistics summary.

    A stack of levels; level ``i`` holds sorted values each representing
    ``2^i`` original rows. When a level exceeds ``cap`` it compacts:
    keep every second value (odd positions of the sorted run — a
    DETERMINISTIC compaction, unlike randomized KLL, trading the
    unbiasedness guarantee for exact reproducibility) and push the
    survivors one level up. Size is O(cap * log(n/cap)) no matter the
    input; two sketches merge by concatenating levels and re-compacting,
    associatively — the same register discipline as the HLL/Count-Min
    sketches above, so every block ships a fixed-size summary and any
    combine tree yields a valid sketch. Deterministic compaction keeps
    the classic Munro–Paterson rank-error bound of
    O(log^2(n/cap) / cap) * n.
    """

    def __init__(self, cap: int = 512):
        self.cap = int(cap)
        self.levels: list[np.ndarray] = []

    def _compact(self) -> None:
        i = 0
        while i < len(self.levels):
            lv = self.levels[i]
            if len(lv) > self.cap:
                lv = np.sort(lv)
                promoted = lv[1::2]
                self.levels[i] = lv[:0]
                if i + 1 == len(self.levels):
                    self.levels.append(promoted)
                else:
                    self.levels[i + 1] = np.concatenate(
                        [self.levels[i + 1], promoted])
            i += 1

    def add(self, values: np.ndarray) -> None:
        v = np.asarray(values, np.float64)
        if len(v) == 0:
            return
        if not self.levels:
            self.levels.append(v.copy())
        else:
            self.levels[0] = np.concatenate([self.levels[0], v])
        self._compact()

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        for i, lv in enumerate(other.levels):
            while len(self.levels) <= i:
                self.levels.append(np.array([], np.float64))
            self.levels[i] = np.concatenate([self.levels[i], lv])
        self._compact()
        return self

    def to_table(self) -> pa.Table:
        lvl = np.concatenate(
            [np.full(len(lv), i, np.int64)
             for i, lv in enumerate(self.levels)] or
            [np.array([], np.int64)])
        val = np.concatenate(
            [lv for lv in self.levels] or [np.array([], np.float64)])
        return pa.table({"level": pa.array(lvl),
                         "value": pa.array(val, pa.float64())})

    @classmethod
    def from_table(cls, t: pa.Table, cap: int = 512) -> "QuantileSketch":
        sk = cls(cap)
        lvl = t["level"].to_numpy(zero_copy_only=False)
        val = t["value"].to_numpy(zero_copy_only=False)
        nlev = int(lvl.max()) + 1 if len(lvl) else 0
        sk.levels = [val[lvl == i].astype(np.float64)
                     for i in range(nlev)]
        sk._compact()
        return sk

    def quantiles(self, qs: "list[float]") -> "list[float]":
        vals = np.concatenate(
            [lv for lv in self.levels] or [np.array([], np.float64)])
        wts = np.concatenate(
            [np.full(len(lv), 1 << i, np.int64)
             for i, lv in enumerate(self.levels)] or
            [np.array([], np.int64)])
        if len(vals) == 0:
            return [float("nan")] * len(qs)
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        total = cum[-1]
        out = []
        for q in qs:
            target = min(max(q, 0.0), 1.0) * total
            out.append(float(vals[np.searchsorted(cum, target,
                                                  side="left")
                                   if target > 0 else 0]))
        return out


def quantile_sketch(ds: "ray.data.Dataset", col: str, cap: int = 512,
                    qs: "list[float]" = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
                    ) -> pa.Table:
    """Approximate quantiles in ONE streaming pass: each block emits its
    fixed-size compactor summary (``QuantileSketch.to_table`` rows,
    O(cap·log) per block), the driver merges them — no sort, no shuffle,
    no second read. The approximate sibling of the exact
    ``float_quantiles`` (histogram refinement, 2-3 passes); accuracy is
    pytest-asserted against the exact path. Output: (q, value)."""
    def partial(t: pa.Table) -> pa.Table:
        sk = QuantileSketch(cap)
        if len(t) and col in t.column_names:
            sk.add(t[col].to_numpy(zero_copy_only=False))
        return sk.to_table()

    merged = QuantileSketch(cap)
    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(b):
            merged.merge(QuantileSketch.from_table(b, cap))
    vals = merged.quantiles(list(qs))
    return pa.table({"q": pa.array([float(q) for q in qs], pa.float64()),
                     "value": pa.array(vals, pa.float64())})


def grouped_approx_distinct(ds: "ray.data.Dataset", key: str, col: str,
                            p: int = 12) -> "ray.data.Dataset":
    """Approximate COUNT(DISTINCT col) PER KEY via one HyperLogLog sketch
    per key: each block collapses to its distinct (key, col) pairs, hashes
    with ``murmur64_int`` (bit-identical to DuckDB ``hash()``), and emits
    one 2^p-byte register row per key it contains; ONE ``groupby(key)``
    exchange max-merges the registers and estimates. Shuffle traffic is
    (keys-per-block x 2^p) bytes regardless of row count — the grouped
    sibling of ``approx_distinct``, SQL-replayable the same way.

    Output: (key, approx_distinct:int64, precision_p:int64).
    """
    m = 1 << p
    kt = ds.schema().types[ds.schema().names.index(key)]
    part_schema = pa.schema([("k", kt), ("regs", pa.binary())])
    out_schema = pa.schema([(key, kt), ("approx_distinct", pa.int64()),
                            ("precision_p", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return part_schema.empty_table()
        d = t.select([key, col]).group_by([key, col]).aggregate([])
        hv = murmur64_int(d[col].to_numpy(zero_copy_only=False)
                          .astype(np.int64))
        karr = d[key]
        kvals, inv = np.unique(
            karr.to_numpy(zero_copy_only=False), return_inverse=True)
        rows_k, rows_r = [], []
        for i in range(len(kvals)):
            regs = hll_registers(hv[inv == i], p)
            rows_k.append(kvals[i])
            rows_r.append(regs.tobytes())
        return pa.table({"k": pa.array(rows_k, kt),
                         "regs": pa.array(rows_r, pa.binary())}) \
            .cast(part_schema)

    def merge(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "regs" not in t.column_names:
            return out_schema.empty_table()
        merged = np.zeros(m, np.uint8)
        for b in t["regs"]:
            np.maximum(merged, np.frombuffer(b.as_py(), np.uint8),
                       out=merged)
        return pa.table({
            key: t["k"].slice(0, 1),
            "approx_distinct": pa.array([int(round(hll_estimate(merged)))],
                                        pa.int64()),
            "precision_p": pa.array([p], pa.int64()),
        }).cast(out_schema)

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("k").map_groups(merge, batch_format="pyarrow")


# -- Misra-Gries mergeable heavy hitters --------------------------------------

def _mg_compress(terms: pa.Array, counts: np.ndarray, k: int
                 ) -> "tuple[pa.Array, np.ndarray]":
    """Compress an exact (term, count) summary to at most ``k`` entries by
    the mergeable-summaries rule (Agarwal et al., PODS 2012): subtract the
    (k+1)-th largest count from everything and drop the non-positive
    remainder. The total undercount introduced across ALL compressions of
    a dataset of N items is bounded by N/k."""
    if len(counts) <= k:
        return terms, counts
    order = np.argsort(-counts, kind="stable")
    pivot = counts[order[k]]
    resid = counts - pivot
    keep = resid > 0
    return terms.filter(pa.array(keep)), resid[keep]


def mg_heavy_hitter_terms(ds: "ray.data.Dataset", frac: float = 0.01,
                          k: int = 512, text_col: str = "text",
                          tokenize: bool = True) -> pa.Table:
    """EXACT corpus-frequency heavy hitters with O(k) driver state and
    ZERO shuffles — the scale-path complement to a full
    ``groupby(term)`` top-k (which exchanges the whole vocabulary):

    1. Pass 1: each block computes exact in-block term counts (one Arrow
       ``group_by``) and Misra-Gries-compresses them to ``k`` entries;
       the driver merges the O(#blocks·k) partials and compresses again.
       Any term with true count ≥ N·frac survives as long as
       ``frac ≥ 1/k`` (asserted), because total MG undercount ≤ N/k.
    2. Pass 2: the ≤k candidates broadcast via ``ray.put``; each block
       contributes an exact vectorized recount (``pc.index_in`` +
       ``bincount``); the driver folds and applies the EXACT threshold
       ``count ≥ ceil(N·frac)``.

    Output: ``(term, n, share)`` for every term at or above the
    threshold — exact values, layout-invariant (the MG pass only selects
    candidates; the emitted numbers come from the recount).

    With ``tokenize=False`` the column's values are the items directly
    (cast to string, nulls dropped) — the heavy-KEY diagnostic used for
    skew-aware shuffle planning: which join/groupby keys exceed frac of
    the table, exactly, without ever shuffling the key column.
    """
    import math

    import pyarrow.compute as pc
    import ray

    assert frac >= 1.0 / k, f"need frac >= 1/k for exactness ({frac} < 1/{k})"

    def toks(batch: pa.Table) -> pa.Array:
        if not tokenize:
            v = pc.cast(batch[text_col], pa.string())
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            return v.drop_null()
        t = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(batch[text_col], "")),
            pattern=r"\W+")
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        flat = pc.list_flatten(t)
        return flat.filter(pc.greater(pc.utf8_length(flat), 0))

    summ_schema = pa.schema([("term", pa.string()), ("n", pa.int64()),
                             ("total", pa.int64())])

    def mg_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return summ_schema.empty_table()
        flat = toks(batch)
        if len(flat) == 0:
            return summ_schema.empty_table()
        g = pa.table({"term": flat}).group_by("term") \
            .aggregate([("term", "count")])
        terms = g["term"].combine_chunks()
        counts = g["term_count"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        terms, counts = _mg_compress(terms, counts, k)
        return pa.table({"term": terms,
                         "n": pa.array(counts, pa.int64()),
                         "total": pa.array(
                             np.full(len(counts), len(flat), np.int64))})

    # driver merge: O(#blocks·k) rows in, one group-sum, one compress
    parts = []
    total_n = 0
    seen_totals = 0
    for b in ds.map_batches(mg_block, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(b) == 0:
            continue
        parts.append(b.select(["term", "n"]))
        total_n += int(b["total"][0].as_py())
    if not parts:
        return pa.table({"term": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "share": pa.array([], pa.float64())})
    merged = pa.concat_tables(parts).group_by("term") \
        .aggregate([("n", "sum")])
    cand, _ = _mg_compress(merged["term"].combine_chunks(),
                           merged["n_sum"].to_numpy(
                               zero_copy_only=False).astype(np.int64), k)
    cref = ray.put(cand)

    cnt_schema = pa.schema([("i", pa.int64()), ("n", pa.int64())])

    def recount(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return cnt_schema.empty_table()
        flat = toks(batch)
        if len(flat) == 0:
            return cnt_schema.empty_table()
        cv = ray.get(cref)
        idx = pc.fill_null(pc.index_in(flat, value_set=cv), -1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        hit = idx >= 0
        c = np.bincount(idx[hit], minlength=len(cv))
        nz = c > 0
        return pa.table({"i": pa.array(np.nonzero(nz)[0], pa.int64()),
                         "n": pa.array(c[nz], pa.int64())})

    exact = np.zeros(len(cand), np.int64)
    for b in ds.map_batches(recount, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(b):
            np.add.at(exact, b["i"].to_numpy(zero_copy_only=False),
                      b["n"].to_numpy(zero_copy_only=False))
    thresh = math.ceil(total_n * frac)
    keep = exact >= thresh
    out = pa.table({
        "term": cand.filter(pa.array(keep)),
        "n": pa.array(exact[keep], pa.int64()),
        "share": pa.array(np.round(exact[keep] / total_n, 6),
                          pa.float64())})
    return out.sort_by([("n", "descending"), ("term", "ascending")])
