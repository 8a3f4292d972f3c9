"""Vector-column aggregates over embedding tables.

``label_centroids`` — element-wise mean embedding per label (the building
block of IVF/k-means training, class prototypes, and centroid-based
dedup): one ``map_batches`` pass emits per-batch pre-aggregated partials
in LONG form (label, dim, s, n) — ≤ labels×dim rows per batch regardless
of batch size, so hub labels ship sums, not rows — then either a driver
combine over the tiny partials (default; same small-state regime as
``pipelines/pagerank._grouped_sum_to_dense``) or a distributed
``groupby(label, dim).sum`` (``combine="shuffle"``, the huge-label path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from cuttana_ray.functions.simsearch import _batch_matrix


def _partials(vec_col: str, label_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        if len(batch) == 0 or vec_col not in batch.column_names:
            return pa.table({"label": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        m = _batch_matrix(batch, vec_col).astype(np.float64)
        labels = batch[label_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        dim = m.shape[1]
        sums = np.zeros((len(uniq), dim), dtype=np.float64)
        np.add.at(sums, inv, m)
        counts = np.bincount(inv).astype(np.int64)
        # long form: one row per (label, dim)
        return pa.table({
            "label": pa.array(np.repeat(uniq, dim), pa.int64()),
            "dim": pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64),
                                    len(uniq))),
            "s": pa.array(sums.ravel(), pa.float64()),
            "n": pa.array(np.repeat(counts, dim), pa.int64()),
        })
    return fn


def label_centroids(ds: "ray.data.Dataset", vec_col: str = "embedding",
                    label_col: str = "label",
                    combine: str = "driver") -> pa.Table:
    """Element-wise mean vector per label, long format: (label, dim
    [1-based], centroid). Exact — sums in float64 regardless of the
    stored vector dtype."""
    parts = ds.map_batches(_partials(vec_col, label_col),
                           batch_format="pyarrow")
    if combine == "shuffle":
        agg = parts.groupby(["label", "dim"]).aggregate(
            Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        t = pa.concat_tables(
            agg.iter_batches(batch_size=None, batch_format="pyarrow"))
        lab = t["label"].to_numpy(zero_copy_only=False)
        dim = t["dim"].to_numpy(zero_copy_only=False)
        s = t["s"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
    else:
        sums_by_label: dict[int, np.ndarray] = {}
        counts_by_label: dict[int, int] = {}
        for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
            bl = b["label"].to_numpy(zero_copy_only=False)
            bd = b["dim"].to_numpy(zero_copy_only=False)
            bs = b["s"].to_numpy(zero_copy_only=False)
            bn = b["n"].to_numpy(zero_copy_only=False)
            if len(bl) == 0:
                continue
            d = int(bd.max())
            for lb in np.unique(bl):
                msk = bl == lb
                vec = np.zeros(d, dtype=np.float64)
                vec[bd[msk] - 1] = bs[msk]
                if int(lb) in sums_by_label:
                    sums_by_label[int(lb)] += vec
                else:
                    sums_by_label[int(lb)] = vec
                counts_by_label[int(lb)] = counts_by_label.get(int(lb), 0) \
                    + int(bn[msk][0])
        labs = sorted(sums_by_label)
        d = len(next(iter(sums_by_label.values()))) if labs else 0
        lab = np.repeat(np.array(labs, dtype=np.int64), d)
        dim = np.tile(np.arange(1, d + 1, dtype=np.int64), len(labs))
        s = np.concatenate([sums_by_label[x] for x in labs]) if labs \
            else np.array([], dtype=np.float64)
        n = np.repeat(np.array([counts_by_label[x] for x in labs],
                               dtype=np.int64), d)
    order = np.lexsort((dim, lab))
    return pa.table({
        "label": pa.array(lab[order], pa.int64()),
        "dim": pa.array(dim[order], pa.int64()),
        "centroid": pa.array(s[order] / n[order], pa.float64()),
    })


def kmeans(ds: "ray.data.Dataset", k: int = 4, iters: int = 3,
           vec_col: str = "embedding", id_col: str = "vec_id"):
    """Distributed Lloyd k-means over a vector column.

    Returns ``(assignments, centroids)``: a Dataset of ``(id_col,
    cluster:int64)`` plus the final ``k×d`` float64 centroid matrix.

    Scale shape: centroid state is ``k×d`` by definition — broadcast via
    ``ray.put`` once per iteration and read zero-copy in every task; each
    batch ships back ≤ ``k×d`` partial-sum rows (long form, like
    ``label_centroids``), so the driver reduce is O(k·d·num_blocks) tiny
    rows and the full vector table never leaves the workers. Deterministic
    init (the ``k`` smallest ids' vectors) and lowest-cluster tie-break
    make runs reproducible across layouts and cluster sizes. Distances use
    the explicit ``Σ(x_i-c_i)²`` form in float64 to track the SQL oracle's
    arithmetic. An emptied cluster keeps its previous centroid.
    """
    import ray

    sub = ds.select_columns([id_col, vec_col])
    init_rows = sub.sort(id_col).limit(k).take_all()
    C = np.stack([np.asarray(r[vec_col], dtype=np.float64)
                  for r in init_rows])
    if len(C) < k:
        raise ValueError(f"k={k} exceeds dataset size {len(C)}")

    def _assign(X: np.ndarray, Cm: np.ndarray) -> np.ndarray:
        diff = X[:, None, :] - Cm[None, :, :]
        return np.argmin((diff * diff).sum(axis=2), axis=1)

    long_schema = pa.schema([("cluster", pa.int64()), ("dim", pa.int64()),
                             ("s", pa.float64()), ("n", pa.int64())])
    for _ in range(iters):
        cref = ray.put(C)

        def partial(batch: pa.Table, _cref=cref) -> pa.Table:
            if len(batch) == 0:
                return long_schema.empty_table()
            Cm = ray.get(_cref)
            X = _batch_matrix(batch, vec_col).astype(np.float64)
            a = _assign(X, Cm)
            uniq, inv = np.unique(a, return_inverse=True)
            d = X.shape[1]
            sums = np.zeros((len(uniq), d), dtype=np.float64)
            np.add.at(sums, inv, X)
            counts = np.bincount(inv).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.repeat(uniq, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                        len(uniq))),
                "s": pa.array(sums.ravel(), pa.float64()),
                "n": pa.array(np.repeat(counts, d), pa.int64())})

        sums = np.zeros_like(C)
        cnt = np.zeros(k, dtype=np.int64)
        for b in sub.map_batches(partial, batch_format="pyarrow") \
                .iter_batches(batch_size=None, batch_format="pyarrow"):
            if len(b) == 0:
                continue
            cl = b["cluster"].to_numpy(zero_copy_only=False)
            dm = b["dim"].to_numpy(zero_copy_only=False)
            s = b["s"].to_numpy(zero_copy_only=False)
            n = b["n"].to_numpy(zero_copy_only=False)
            np.add.at(sums, (cl, dm), s)
            first = dm == 0
            np.add.at(cnt, cl[first], n[first])
        newC = C.copy()
        nz = cnt > 0
        newC[nz] = sums[nz] / cnt[nz, None]
        C = newC

    cref = ray.put(C)

    def finalize(batch: pa.Table, _cref=cref) -> pa.Table:
        out_schema = pa.schema([
            (id_col, batch.schema.field(id_col).type if len(batch) else
             pa.int64()), ("cluster", pa.int64())])
        if len(batch) == 0:
            return out_schema.empty_table()
        Cm = ray.get(_cref)
        X = _batch_matrix(batch, vec_col).astype(np.float64)
        return pa.table({id_col: batch[id_col],
                         "cluster": pa.array(_assign(X, Cm), pa.int64())})

    return sub.map_batches(finalize, batch_format="pyarrow"), C


# ---------------------------------------------------------------------------
# int8 scalar quantization (the memory-side half of an ANN index)
# ---------------------------------------------------------------------------

def embedding_extrema(ds: "ray.data.Dataset", vec_col: str = "embedding"
                      ) -> "tuple[np.ndarray, np.ndarray]":
    """Global per-dimension (min, max) of a fixed-width vector column.

    One ``map_batches`` pass emits a d-row (dim, vmin, vmax) partial per
    batch; the driver folds the tiny partials (O(#blocks x d) driver
    state, the same bounded regime as ``stages/profile.py``). Extrema are
    order-free, so the fold is exact — no float-summation hazard.
    """
    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "vmin": pa.array([], pa.float64()),
                             "vmax": pa.array([], pa.float64())})
        m = _batch_matrix(batch, vec_col).astype(np.float64)
        d = m.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(d, dtype=np.int64)),
            "vmin": pa.array(m.min(axis=0)),
            "vmax": pa.array(m.max(axis=0)),
        })

    vmin = vmax = None
    for part in ds.map_batches(partial, batch_format="pyarrow") \
                  .iter_batches(batch_format="pyarrow"):
        if len(part) == 0:
            continue
        dims = part["dim"].to_numpy()
        lo = part["vmin"].to_numpy()
        hi = part["vmax"].to_numpy()
        if vmin is None:
            d = int(dims.max()) + 1
            vmin = np.full(d, np.inf)
            vmax = np.full(d, -np.inf)
        np.minimum.at(vmin, dims, lo)
        np.maximum.at(vmax, dims, hi)
    if vmin is None:
        raise ValueError("empty dataset")
    return vmin, vmax


def _quantize_matrix(m: np.ndarray, vmin: np.ndarray, vmax: np.ndarray,
                     levels: int) -> np.ndarray:
    """Codes in [0, levels] as int64. The arithmetic is written in the
    exact order the SQL oracle replays it — ``floor(((x - vmin) * L) /
    (vmax - vmin) + 0.5)`` in float64 — so codes are bit-identical to
    DuckDB's on any input."""
    x = m.astype(np.float64)
    rng = vmax - vmin
    safe = np.where(rng > 0.0, rng, 1.0)
    codes = np.floor(((x - vmin) * float(levels)) / safe + 0.5)
    codes = np.where(rng > 0.0, codes, 0.0)
    return codes.astype(np.int64)


def quantize_embeddings(ds: "ray.data.Dataset", vec_col: str = "embedding",
                        id_col: str = "vec_id", levels: int = 255,
                        extrema: "tuple[np.ndarray, np.ndarray] | None" = None
                        ) -> "ray.data.Dataset":
    """Per-vector scalar-quantization summary: ``(vec_id, n_dims,
    code_sum, code_dot)`` where ``code_dot = sum(code[j] * (j+1))`` — two
    exact int64 checksums that pin every code without emitting the d-wide
    code rows. The codes themselves are recomputed where needed (cheaper
    than shipping them at 100 TB; the scale x offset pair is O(d) and
    broadcast in the task closure)."""
    if extrema is None:
        extrema = embedding_extrema(ds, vec_col)
    vmin, vmax = extrema

    def summarize(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_dims": pa.array([], pa.int64()),
                             "code_sum": pa.array([], pa.int64()),
                             "code_dot": pa.array([], pa.int64())})
        codes = _quantize_matrix(_batch_matrix(batch, vec_col), vmin, vmax,
                                 levels)
        pos = np.arange(1, codes.shape[1] + 1, dtype=np.int64)
        return pa.table({
            id_col: batch[id_col],
            "n_dims": pa.array(np.full(len(codes), codes.shape[1],
                                       np.int64)),
            "code_sum": pa.array(codes.sum(axis=1)),
            "code_dot": pa.array((codes * pos).sum(axis=1)),
        })

    return ds.map_batches(summarize, batch_format="pyarrow")


def embedding_absmax(ds: "ray.data.Dataset", vec_col: str = "embedding"
                     ) -> float:
    """Global scalar max(|x|) over every element of the vector column —
    the symmetric-quantization scale. One extrema pass (order-free,
    exact), O(#blocks x d) driver fold."""
    vmin, vmax = embedding_extrema(ds, vec_col)
    return float(max(np.abs(vmin).max(), np.abs(vmax).max()))


def _symmetric_codes(m: np.ndarray, amax: float, levels: int) -> np.ndarray:
    """Codes in [-levels, levels] as int64 with ONE global scale:
    ``floor((x * L) / amax + 0.5)``. Because the scale is a single
    scalar, the integer code dot product is EXACTLY monotone with the
    dequantized inner product (dot(x_hat, y_hat) = (amax/L)^2 *
    dot(cx, cy)) — so ranking by it IS maximum-inner-product search over
    the dequantized vectors, not a heuristic. Arithmetic order matches
    the SQL oracle's replay verbatim."""
    x = m.astype(np.float64)
    scale = amax if amax > 0.0 else 1.0
    return np.floor((x * float(levels)) / scale + 0.5).astype(np.int64)


def knn_quantized(ds: "ray.data.Dataset", queries: np.ndarray, k: int = 10,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  levels: int = 127,
                  amax: "float | None" = None, bulk: bool = False):
    """Approximate maximum-inner-product top-k over int8-style symmetric
    codes: ranking is int64 end to end — reproducible bit-for-bit across
    layouts AND replayable by the SQL oracle with zero float-comparison
    risk — and exactly equal to exact MIPS over the dequantized vectors
    (see ``_symmetric_codes``). Per batch: codes matmul the broadcast
    query codes, keep the local top-k, driver merges the tiny candidate
    sets (same shape as ``knn_brute_force``). Output:
    (query_id, vec_id, dot) sorted by (query_id, -dot, vec_id)."""
    import ray as _ray
    if amax is None:
        amax = embedding_absmax(ds, vec_col)
    qcodes = _symmetric_codes(np.asarray(queries, dtype=np.float64),
                              amax, levels)
    q_ref = _ray.put(qcodes)

    def local_topk(batch: pa.Table) -> pa.Table:
        qm = _ray.get(q_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        codes = _symmetric_codes(_batch_matrix(batch, vec_col), amax,
                                 levels)
        dots = qm @ codes.T                        # (nq, nb) int64
        kk = min(k, dots.shape[1])
        idx = np.argpartition(-dots, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(len(qm)), kk)
        cols = idx.ravel()
        return pa.table({
            "query_id": pa.array(rows, pa.int64()),
            id_col: pa.array(ids[cols], pa.int64()),
            "dot": pa.array(dots[rows, cols], pa.int64()),
        })

    cand = ds.map_batches(local_topk, batch_format="pyarrow",
                          batch_size=4096)
    if bulk:
        # bulk kNN join (nq >> #blocks*k): distributed grouped_topk merge
        from cuttana_ray.functions.simsearch import merge_topk_distributed
        return merge_topk_distributed(cand, k, id_col, score_col="dot")
    cand = cand.to_pandas()
    cand = cand.sort_values(["query_id", "dot", id_col],
                            ascending=[True, False, True])
    top = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    return pa.Table.from_pandas(top, preserve_index=False)


def covariance_matrix(ds: "ray.data.Dataset", vec_col: str = "embedding"
                      ) -> pa.Table:
    """Sample covariance matrix of a fixed-width vector column in ONE
    streaming pass: each batch ships its d x d Gram partial ``X^T X``
    plus column sums and count (O(d^2) per block regardless of rows —
    the register discipline again), the driver folds them and finishes
    with ``(G - s s^T / n) / (n - 1)``. This is the input half of
    PCA/whitening at 100 TB: no per-pair shuffle, no second read.

    Output: long upper-triangle rows ``(i, j, cov)`` with 1-based dims,
    float64. Exact up to summation order (the SQL check rounds).
    """
    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"g": pa.array([], pa.float64()),
                             "s": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        m = _batch_matrix(t, vec_col).astype(np.float64)
        g = m.T @ m
        return pa.table({
            "g": pa.array(g.ravel(), pa.float64()),
            "s": pa.array(np.concatenate(
                [m.sum(axis=0), np.zeros(len(g.ravel()) - m.shape[1])]),
                pa.float64()),
            "n": pa.array(np.concatenate(
                [[len(m)], np.zeros(len(g.ravel()) - 1, np.int64)]),
                pa.int64()),
        })

    G = s = None
    n = 0
    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(b) == 0:
            continue
        gflat = b["g"].to_numpy(zero_copy_only=False)
        d = int(round(len(gflat) ** 0.5))
        if G is None:
            G = np.zeros((d, d))
            s = np.zeros(d)
        G += gflat.reshape(d, d)
        s += b["s"].to_numpy(zero_copy_only=False)[:d]
        n += int(b["n"].to_numpy(zero_copy_only=False)[0])
    if G is None or n < 2:
        raise ValueError("need at least 2 vectors")
    cov = (G - np.outer(s, s) / n) / (n - 1)
    iu, ju = np.triu_indices(len(cov))
    return pa.table({
        "i": pa.array(iu + 1, pa.int64()),
        "j": pa.array(ju + 1, pa.int64()),
        "cov": pa.array(cov[iu, ju], pa.float64()),
    })


def standardize_embeddings(ds: "ray.data.Dataset",
                           vec_col: str = "embedding",
                           id_col: str = "vec_id") -> "ray.data.Dataset":
    """Per-dimension z-score standardization (the feature-scaling half of
    whitening): one O(d) moment pass (per-block n/sum/sumsq partials,
    driver fold — bounded state like ``embedding_extrema``), then a
    streaming map emits long ``(vec_id, pos, z)`` rows with
    ``z = (x - mean) / stddev_samp`` in float64. Constant dimensions
    (stddev 0) emit z = 0. SQL-checkable against AVG/STDDEV_SAMP with
    end rounding (summation order)."""
    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"s": pa.array([], pa.float64()),
                             "s2": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        m = _batch_matrix(t, vec_col).astype(np.float64)
        return pa.table({
            "s": pa.array(m.sum(axis=0)),
            "s2": pa.array((m * m).sum(axis=0)),
            "n": pa.array(np.full(m.shape[1], len(m), np.int64)),
        })

    s = s2 = None
    n = 0
    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(b) == 0:
            continue
        if s is None:
            s = np.zeros(len(b))
            s2 = np.zeros(len(b))
        s += b["s"].to_numpy(zero_copy_only=False)
        s2 += b["s2"].to_numpy(zero_copy_only=False)
        n += int(b["n"][0].as_py())
    if s is None or n < 2:
        raise ValueError("need at least 2 vectors")
    mean = s / n
    var = (s2 - (s * s) / n) / (n - 1)
    std = np.sqrt(np.maximum(var, 0.0))
    safe = np.where(std > 0.0, std, 1.0)

    def zrows(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "z": pa.array([], pa.float64())})
        m = _batch_matrix(t, vec_col).astype(np.float64)
        z = np.where(std > 0.0, (m - mean) / safe, 0.0)
        d = m.shape[1]
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(np.repeat(ids, d), pa.int64()),
            "pos": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    len(m)), pa.int64()),
            "z": pa.array(z.ravel(), pa.float64()),
        })

    return ds.map_batches(zrows, batch_format="pyarrow")


def pca_scores(ds: "ray.data.Dataset", k: int = 2,
               vec_col: str = "embedding",
               id_col: str = "vec_id"):
    """Principal-component scores: the covariance pass above (one
    streaming read, O(d^2) folded state) feeds a d x d eigendecomposition
    ON THE DRIVER (d is the embedding width — trivially small next to n),
    then one more streaming map projects every centered vector onto the
    top-``k`` components. Returns ``(scores_ds, components, eigvals)``
    where ``scores_ds`` has long rows (vec_id, comp [1-based], score).

    Deterministic up to eigenvector sign, which is fixed by forcing the
    largest-|loading| coordinate positive. Approximation-free; rows-only
    in the driver contract (eigendecomposition is not SQL-expressible)
    with NumPy whole-matrix parity in pytest.
    """
    # reuse the covariance fold, but keep the mean for centering
    t = covariance_matrix(ds, vec_col)
    iu = t["i"].to_numpy(zero_copy_only=False) - 1
    ju = t["j"].to_numpy(zero_copy_only=False) - 1
    cv = t["cov"].to_numpy(zero_copy_only=False)
    d = int(iu.max()) + 1
    C = np.zeros((d, d))
    C[iu, ju] = cv
    C[ju, iu] = cv

    # column means via one O(d) pass
    s = np.zeros(d)
    n = 0
    def mean_partial(tt: pa.Table) -> pa.Table:
        if len(tt) == 0:
            return pa.table({"s": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        m = _batch_matrix(tt, vec_col).astype(np.float64)
        return pa.table({"s": pa.array(m.sum(axis=0)),
                         "n": pa.array(np.full(m.shape[1], len(m),
                                               np.int64))})
    for b in ds.map_batches(mean_partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(b) == 0:
            continue
        s += b["s"].to_numpy(zero_copy_only=False)
        n += int(b["n"][0].as_py())
    mean = s / n

    evals, evecs = np.linalg.eigh(C)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T                    # (k, d)
    # sign convention: largest-|loading| coordinate positive
    for r in range(len(comps)):
        j = int(np.argmax(np.abs(comps[r])))
        if comps[r, j] < 0:
            comps[r] = -comps[r]
    eigvals = evals[order]

    def project(tt: pa.Table) -> pa.Table:
        if len(tt) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "comp": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        m = _batch_matrix(tt, vec_col).astype(np.float64) - mean
        sc = m @ comps.T                         # (n, k)
        ids = tt[id_col].to_numpy(zero_copy_only=False)
        kk = sc.shape[1]
        return pa.table({
            id_col: pa.array(np.repeat(ids, kk), pa.int64()),
            "comp": pa.array(np.tile(np.arange(1, kk + 1, dtype=np.int64),
                                     len(m)), pa.int64()),
            "score": pa.array(sc.ravel(), pa.float64()),
        })

    return (ds.map_batches(project, batch_format="pyarrow"),
            comps, eigvals)


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup = k-means bucketing + within-cluster cosine
# ---------------------------------------------------------------------------

def semantic_dedup(ds: "ray.data.Dataset", k: int = 4, iters: int = 2,
                   threshold: float = 0.45, vec_col: str = "embedding",
                   id_col: str = "vec_id") -> "ray.data.Dataset":
    """SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication", arXiv:2303.09540): k-means
    cluster the embedding space, then search for near-duplicates WITHIN
    each cluster only — the global O(N²) pairwise pass becomes Σ O(n_c²),
    and with k chosen ∝ N (the paper uses k in the tens of thousands at
    LAION scale) expected cluster sizes stay bounded, so the per-cluster
    matmul is a constant-sized task.

    Keep rule (deterministic, order-free, SQL-replayable as one EXISTS):
    a vector is DROPPED iff some LOWER-id vector in the same cluster has
    cosine ≥ ``threshold`` with it — the greedy lowest-id-representative
    variant. The decision for j never depends on whether i itself was
    dropped, so no iteration is needed on either side.

    Scale shape: clustering is the existing distributed Lloyd ``kmeans``
    (k×d broadcast state, long-form partials); the final assignment is
    re-derived per batch from the broadcast centroid matrix (identical
    float64 argmin arithmetic to ``kmeans``'s own finalize pass), which
    avoids joining the assignment table back onto the vectors — Arrow's
    hash join cannot carry ``list<float>`` payload columns, and skipping
    the join saves an exchange anyway. The within-cluster pass is then a
    ``groupby(cluster).map_groups`` whose UDF is a vectorized float32
    matmul (float32 matches ``embedding_cosine_pairs`` and DuckDB's
    ``list_cosine_similarity`` over FLOAT[] to ~1e-7). The UDF splits its
    input by the cluster column — map_groups may pack several whole
    groups into one block — so cross-cluster pairs are never compared.

    Output: ``(id_col, cluster:int64, keep:int64)`` for EVERY input row.
    """
    import ray

    _, C = kmeans(ds, k=k, iters=iters, vec_col=vec_col, id_col=id_col)
    cref = ray.put(C)

    def tag(batch: pa.Table, _cref=cref) -> pa.Table:
        if len(batch) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             vec_col: batch[vec_col],
                             "cluster": pa.array([], pa.int64())})
        Cm = ray.get(_cref)
        X = _batch_matrix(batch, vec_col).astype(np.float64)
        diff = X[:, None, :] - Cm[None, :, :]
        a = np.argmin((diff * diff).sum(axis=2), axis=1)
        return pa.table({id_col: batch[id_col].cast(pa.int64()),
                         vec_col: batch[vec_col],
                         "cluster": pa.array(a, pa.int64())})

    withvec = ds.select_columns([id_col, vec_col]).map_batches(
        tag, batch_format="pyarrow")

    out_schema = pa.schema([(id_col, pa.int64()), ("cluster", pa.int64()),
                            ("keep", pa.int64())])

    def per_cluster(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return out_schema.empty_table()
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cl = group["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        X = _batch_matrix(group, vec_col).astype(np.float32)
        order = np.lexsort((ids, cl))
        ids, cl, X = ids[order], cl[order], X[order]
        starts = np.concatenate([[0], np.nonzero(cl[1:] != cl[:-1])[0] + 1,
                                 [len(cl)]])
        keep = np.ones(len(ids), np.int64)
        for s, e in zip(starts[:-1], starts[1:]):
            n = e - s
            if n < 2:
                continue
            Xn = X[s:e]
            Xn = Xn / np.maximum(
                np.linalg.norm(Xn, axis=1, keepdims=True), 1e-12)
            sim = Xn @ Xn.T
            dup = np.triu(sim >= threshold, k=1).any(axis=0)
            keep[s:e][dup] = 0
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "cluster": pa.array(cl, pa.int64()),
                         "keep": pa.array(keep, pa.int64())})

    return withvec.groupby("cluster").map_groups(
        per_cluster, batch_format="pyarrow")
