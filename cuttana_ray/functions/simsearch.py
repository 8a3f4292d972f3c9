"""Similarity search over an embedding column (``list<float>``).

* ``knn_brute_force`` — exact cosine top-k: every batch matmuls against the
  broadcast normalized query matrix (``ray.put`` once), keeps its local
  top-k, and the driver merges the tiny per-batch candidate sets. The
  baseline and the recall oracle.
* ``knn_ivf`` — the scale path: a seeded k-means-lite (few Lloyd iterations
  on a sample) builds ``nlist`` centroids; vectors are bucketed by nearest
  centroid (one shuffle); queries probe only the ``nprobe`` nearest buckets.
  Approximate — recall measured against brute force in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch[vec_col]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, (pa.ListArray, pa.LargeListArray, pa.FixedSizeListArray)):
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
        n = len(arr)
        return flat.reshape(n, -1)
    return np.stack([np.asarray(v, dtype=np.float32) for v in arr.to_pylist()])


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def knn_brute_force(ds: "ray.data.Dataset", queries: np.ndarray, k: int = 10,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> pa.Table:
    """Exact cosine top-k. Output: ``(query_id, vec_id, cosine)`` sorted by
    (query_id, -cosine, vec_id); ``query_id`` = row index into ``queries``."""
    q = _normalize(np.asarray(queries, dtype=np.float32))
    q_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_batch_matrix(batch, vec_col))
        sims = qm @ m.T                          # (nq, nb)
        kk = min(k, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(len(qm)), kk)
        cols = idx.ravel()
        return pa.table({
            "query_id": pa.array(rows, pa.int64()),
            id_col: pa.array(ids[cols], pa.int64()),
            "cosine": pa.array(sims[rows, cols].astype(np.float64)),
        })

    cand = ds.map_batches(local_topk, batch_format="pyarrow",
                          batch_size=4096).to_pandas()
    cand = cand.sort_values(["query_id", "cosine", id_col],
                            ascending=[True, False, True])
    top = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    return pa.Table.from_pandas(top, preserve_index=False)


def kmeans_lite(sample: np.ndarray, nlist: int, iters: int = 8,
                seed: int = 42) -> np.ndarray:
    """Seeded Lloyd iterations on normalized vectors (cosine ≈ L2 on the
    sphere). Deterministic; NumPy only."""
    rng = np.random.default_rng(seed)
    sample = _normalize(sample.astype(np.float32))
    cent = sample[rng.choice(len(sample), min(nlist, len(sample)),
                             replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def knn_ivf(ds: "ray.data.Dataset", queries: np.ndarray, k: int = 10,
            nlist: int = 16, nprobe: int = 4, vec_col: str = "embedding",
            id_col: str = "vec_id", sample_size: int = 10_000) -> pa.Table:
    """IVF approximate top-k: bucket by nearest centroid, probe the
    ``nprobe`` closest buckets per query. Same output schema as brute force."""
    sample = []
    got = 0
    for b in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        sample.append(_batch_matrix(b, vec_col))
        got += len(sample[-1])
        if got >= sample_size:
            break
    cent = kmeans_lite(np.concatenate(sample), nlist)
    cent_ref = ray.put(cent)
    q = _normalize(np.asarray(queries, dtype=np.float32))
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]     # (nq, nprobe)
    probed_buckets = np.unique(probe)
    probed_ref = ray.put(set(probed_buckets.tolist()))
    q_ref = ray.put(q)
    probe_ref = ray.put(probe)

    def bucket_topk(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        wanted = ray.get(probed_ref)
        qm = ray.get(q_ref)
        pr = ray.get(probe_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = _normalize(_batch_matrix(batch, vec_col))
        bucket = np.argmax(m @ c.T, axis=1)
        keep = np.isin(bucket, list(wanted))
        if not keep.any():
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        ids, m, bucket = ids[keep], m[keep], bucket[keep]
        sims = qm @ m.T
        # mask out vectors whose bucket is not probed by that query
        mask = np.zeros_like(sims, dtype=bool)
        for qi in range(len(qm)):
            mask[qi] = np.isin(bucket, pr[qi])
        sims = np.where(mask, sims, -2.0)
        kk = min(k, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(len(qm)), kk)
        cols = idx.ravel()
        ok = sims[rows, cols] > -2.0
        return pa.table({
            "query_id": pa.array(rows[ok], pa.int64()),
            id_col: pa.array(ids[cols[ok]], pa.int64()),
            "cosine": pa.array(sims[rows, cols][ok].astype(np.float64)),
        })

    cand = ds.map_batches(bucket_topk, batch_format="pyarrow",
                          batch_size=4096).to_pandas()
    cand = cand.sort_values(["query_id", "cosine", id_col],
                            ascending=[True, False, True])
    top = cand.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    return pa.Table.from_pandas(top, preserve_index=False)
