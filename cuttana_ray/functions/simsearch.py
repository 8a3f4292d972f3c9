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


def merge_topk_distributed(cand: "ray.data.Dataset", k: int, id_col: str,
                           score_col: str = "cosine") -> "ray.data.Dataset":
    """Distributed global top-k merge over per-block candidate rows —
    the BULK path for large query sets. ``grouped_topk``'s combiner
    discipline means the one exchange carries ≤ k rows per (block, query),
    and the driver never materializes the O(#blocks·k·nq) candidate set
    (the driver-pandas merge in the interactive path is exactly that).
    Output ordering matches the interactive path: (query_id, -score, id)."""
    from cuttana_ray.stages.relational import grouped_topk
    top = grouped_topk(cand, ["query_id"],
                       [(score_col, "descending"), (id_col, "ascending")], k)
    return top.sort(["query_id", score_col, id_col],
                    descending=[False, True, False])


def knn_brute_force(ds: "ray.data.Dataset", queries: np.ndarray, k: int = 10,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    bulk: bool = False):
    """Exact cosine top-k. Output: ``(query_id, vec_id, cosine)`` sorted by
    (query_id, -cosine, vec_id); ``query_id`` = row index into ``queries``.

    ``bulk=False`` (interactive query batches): per-block top-k partials
    collect to the driver for the final merge — O(#blocks·k·nq) rows,
    right for small nq; returns a ``pa.Table``. ``bulk=True`` (bulk kNN
    join, nq ≫ #blocks·k): the merge is a distributed ``grouped_topk``
    exchange and the result stays a ``ray.data.Dataset``."""
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
                          batch_size=4096)
    if bulk:
        return merge_topk_distributed(cand, k, id_col)
    cand = cand.to_pandas()
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


class IVFIndex:
    """Persisted IVF index over an embedding Dataset.

    * Centroid training sample is an UNBIASED deterministic hash-stride
      over the whole dataset (Knuth multiplicative hash of the id column),
      not the first blocks — layout- and order-independent.
    * Bucket assignment runs ONCE at build time; the bucketed table
      (bucket, id, normalized vec blob) is materialized in the object
      store and reused by every subsequent ``query`` call, instead of
      re-assigning the full dataset per query batch.
    """

    def __init__(self, ds: "ray.data.Dataset", nlist: int = 16,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 sample_size: int = 10_000, seed: int = 42):
        self.id_col = id_col
        n = ds.count()
        keep_mod = max(1, n // sample_size)

        def sample_fn(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
                % np.uint64(keep_mod)
            keep = h == 0
            if not keep.any():
                return pa.table({"vec": pa.array([], pa.binary())})
            m = _batch_matrix(batch, vec_col)[keep]
            return pa.table({"vec": pa.array(
                [row.tobytes() for row in m], pa.binary())})

        blobs = []
        dim = None
        for b in ds.map_batches(sample_fn, batch_format="pyarrow") \
                .iter_batches(batch_size=None, batch_format="pyarrow"):
            blobs.extend(b["vec"].to_pylist())
        sample = np.frombuffer(b"".join(blobs), dtype=np.float32) \
            .reshape(len(blobs), -1)
        self.centroids = kmeans_lite(sample, nlist, seed=seed)
        cent_ref = ray.put(self.centroids)

        def assign(batch: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            m = _normalize(_batch_matrix(batch, vec_col))
            bucket = np.argmax(m @ c.T, axis=1).astype(np.int32)
            return pa.table({
                "bucket": pa.array(bucket),
                id_col: pa.array(ids, pa.int64()),
                "vec": pa.array([row.tobytes() for row in m], pa.binary()),
            })

        self.buckets = ds.map_batches(assign, batch_format="pyarrow") \
            .materialize()

    def query(self, queries: np.ndarray, k: int = 10,
              nprobe: int = 4, bulk: bool = False):
        id_col = self.id_col
        q = _normalize(np.asarray(queries, dtype=np.float32))
        nprobe = min(nprobe, len(self.centroids))
        probe = np.argsort(-(q @ self.centroids.T), axis=1)[:, :nprobe]
        probe_ref = ray.put(probe)
        q_ref = ray.put(q)

        def bucket_topk(batch: pa.Table) -> pa.Table:
            qm = ray.get(q_ref)
            pr = ray.get(probe_ref)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            bucket = batch["bucket"].to_numpy(zero_copy_only=False)
            wanted = np.unique(pr)
            keep = np.isin(bucket, wanted)
            if not keep.any():
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 id_col: pa.array([], pa.int64()),
                                 "cosine": pa.array([], pa.float64())})
            ids, bucket = ids[keep], bucket[keep]
            blobs = [batch["vec"][int(i)].as_py()
                     for i in np.nonzero(keep)[0]]
            m = np.frombuffer(b"".join(blobs), dtype=np.float32) \
                .reshape(len(ids), -1)
            sims = qm @ m.T
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

        cand = self.buckets.map_batches(bucket_topk, batch_format="pyarrow",
                                        batch_size=4096)
        if bulk:
            return merge_topk_distributed(cand, k, id_col)
        cand = cand.to_pandas()
        cand = cand.sort_values(["query_id", "cosine", id_col],
                                ascending=[True, False, True])
        top = cand.groupby("query_id", sort=True).head(k) \
            .reset_index(drop=True)
        return pa.Table.from_pandas(top, preserve_index=False)


def knn_ivf(ds: "ray.data.Dataset", queries: np.ndarray, k: int = 10,
            nlist: int = 16, nprobe: int = 4, vec_col: str = "embedding",
            id_col: str = "vec_id", sample_size: int = 10_000) -> pa.Table:
    """IVF approximate top-k: one-shot convenience over ``IVFIndex`` (build
    once + single query batch). Same output schema as brute force."""
    index = IVFIndex(ds, nlist, vec_col, id_col, sample_size)
    return index.query(queries, k, nprobe)
