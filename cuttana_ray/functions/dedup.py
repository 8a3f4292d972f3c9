"""Deduplication operators for large-scale training-data pipelines.

All stages are ``map_batches`` over Arrow with per-batch vectorized NumPy
kernels; candidate generation always goes through a bucketing groupby so no
stage ever compares all pairs:

* ``exact_dedup`` — content-hash partition + per-group first (min id).
* ``minhash_lsh_pairs`` — k-shingles → universal-hash MinHash signatures →
  banded LSH bucketing → within-bucket candidate pairs → signature-estimated
  Jaccard filter.
* ``ngram_jaccard_pairs`` — the exact-verify tier on top of MinHash LSH:
  recomputes true shingle-set Jaccard for candidate pairs.
* ``simhash_pairs`` — 64-bit SimHash per doc, banded into 4×16-bit keys →
  candidates → Hamming-distance filter.
* ``embedding_cosine_pairs`` — near-dup by embedding cosine ≥ threshold,
  blockwise matmul against a broadcast normalized matrix.

Deterministic: hash seeds fixed; outputs sorted-normalized (a < b).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Min

from cuttana_ray.util import pool_size

_MERSENNE = (1 << 61) - 1
_HASH_SEED = 0x9E3779B97F4A7C15


def _hash_strings(arr: list[bytes | str]) -> np.ndarray:
    """Stable 64-bit FNV-1a over utf-8 bytes, vectorized-ish (Python loop per
    unique string happens once per batch; shingle hashing below is the hot
    path and is fully NumPy)."""
    out = np.empty(len(arr), dtype=np.uint64)
    for i, s in enumerate(arr):
        b = s.encode() if isinstance(s, str) else s
        h = np.uint64(0xCBF29CE484222325)
        for byte in b:
            h = np.uint64((int(h) ^ byte) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


def exact_dedup(ds: "ray.data.Dataset", text_col: str = "text",
                id_col: str = "doc_id") -> "ray.data.Dataset":
    """One representative (min id) per distinct content + duplicate count.

    Content-hash bucketing: a 64-bit hash column is added per batch
    (vectorized via polars) and the shuffle groups by the hash, so full text
    never keys the exchange. Output: ``(doc_id, dup_count)``.
    """
    import polars as pl

    def add_hash(batch: pa.Table) -> pa.Table:
        h = pl.from_arrow(batch[text_col].combine_chunks()).hash(seed=42)
        return pa.table({
            id_col: batch[id_col],
            "h": pa.array(h.to_numpy().astype(np.int64)),
        })

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    agg = hashed.groupby("h").aggregate(
        Min(id_col, alias_name=id_col), Count(alias_name="dup_count"))
    return agg.select_columns([id_col, "dup_count"])


# -- MinHash LSH ------------------------------------------------------------

def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Rolling 64-bit hashes of the k-byte shingles of ``text`` (NumPy
    sliding window over the byte array)."""
    b = np.frombuffer(text.encode(), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)))
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    weights = np.power(np.uint64(257), np.arange(k, dtype=np.uint64),
                       dtype=np.uint64)
    return np.unique((win * weights).sum(axis=1, dtype=np.uint64))


class _MinHasher:
    """Stateful per-actor: permutation coefficients generated once."""

    def __init__(self, num_perm: int, shingle_k: int, bands: int,
                 text_col: str, id_col: str):
        rng = np.random.default_rng(42)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        # (a*x + b) mod p, min per permutation
        vals = (sh[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, band_ids, band_hashes, sigs = [], [], [], []
        for doc_id, text in zip(batch[self.id_col].to_pylist(),
                                batch[self.text_col].to_pylist()):
            sig = self.signature(text or "")
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band:(b + 1) * self.rows_per_band]
                ids.append(doc_id)
                band_ids.append(b)
                band_hashes.append(int(chunk.sum() % _MERSENNE))
                sigs.append(sig.astype(np.int64))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "band": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.int64()),
            "sig": pa.array([s.tolist() for s in sigs],
                            pa.list_(pa.int64())),
        })


def minhash_lsh_pairs(ds: "ray.data.Dataset", text_col: str = "text",
                      id_col: str = "doc_id", num_perm: int = 64,
                      bands: int = 16, shingle_k: int = 5,
                      threshold: float = 0.5) -> "ray.data.Dataset":
    """Candidate near-duplicate pairs with signature-estimated Jaccard ≥
    threshold. Output: ``(doc_a, doc_b, est_jaccard)``, doc_a < doc_b."""
    sigs = ds.map_batches(
        _MinHasher, batch_format="pyarrow", concurrency=pool_size(),
        fn_constructor_args=(num_perm, shingle_k, bands, text_col, id_col))

    def bucket_pairs(group: pa.Table) -> pa.Table:
        n = len(group)
        a_out, b_out, est = [], [], []
        if n > 1:
            ids = group["doc_id"].to_numpy(zero_copy_only=False)
            sig = np.stack([np.asarray(s) for s in group["sig"].to_pylist()])
            order = np.argsort(ids)
            ids, sig = ids[order], sig[order]
            for i in range(n):
                for j in range(i + 1, n):
                    if ids[i] == ids[j]:
                        continue
                    e = float((sig[i] == sig[j]).mean())
                    if e >= threshold:
                        a_out.append(int(ids[i]))
                        b_out.append(int(ids[j]))
                        est.append(e)
        return pa.table({"doc_a": pa.array(a_out, pa.int64()),
                         "doc_b": pa.array(b_out, pa.int64()),
                         "est_jaccard": pa.array(est, pa.float64())})

    pairs = sigs.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pyarrow")
    # a pair can surface from several bands → keep one row (max estimate)
    from ray.data.aggregate import Max
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Max("est_jaccard", alias_name="est_jaccard"))


def ngram_jaccard_pairs(ds: "ray.data.Dataset", text_col: str = "text",
                        id_col: str = "doc_id", shingle_k: int = 5,
                        num_perm: int = 64, bands: int = 16,
                        threshold: float = 0.5) -> "ray.data.Dataset":
    """Exact shingle-set Jaccard for MinHash-LSH candidate pairs.

    The candidate texts are joined back by broadcasting the (small) candidate
    id set and re-shingling only those docs. Output:
    ``(doc_a, doc_b, jaccard)`` with jaccard ≥ threshold.
    """
    cand = minhash_lsh_pairs(ds, text_col, id_col, num_perm, bands,
                             shingle_k, threshold * 0.5).to_pandas()
    if not len(cand):
        return ray.data.from_arrow(pa.table({
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64())}))
    need = set(cand["doc_a"]) | set(cand["doc_b"])
    need_ref = ray.put(need)

    def shingles_of(batch: pa.Table) -> pa.Table:
        wanted = ray.get(need_ref)
        ids, shs = [], []
        for doc_id, text in zip(batch[id_col].to_pylist(),
                                batch[text_col].to_pylist()):
            if doc_id in wanted:
                ids.append(doc_id)
                shs.append(_shingle_hashes(text or "", shingle_k)
                           .astype(np.int64).tolist())
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "sh": pa.array(shs, pa.list_(pa.int64()))})

    sh_map = {}
    for b in ds.map_batches(shingles_of, batch_format="pyarrow") \
            .iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        for doc_id, sh in zip(b["doc_id"].to_pylist(), b["sh"].to_pylist()):
            sh_map[doc_id] = np.asarray(sh, dtype=np.int64)
    rows = {"doc_a": [], "doc_b": [], "jaccard": []}
    for a, b in zip(cand["doc_a"], cand["doc_b"]):
        sa, sb = sh_map.get(int(a)), sh_map.get(int(b))
        if sa is None or sb is None or (len(sa) == 0 and len(sb) == 0):
            continue
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        j = inter / (len(sa) + len(sb) - inter)
        if j >= threshold:
            rows["doc_a"].append(int(a))
            rows["doc_b"].append(int(b))
            rows["jaccard"].append(j)
    return ray.data.from_arrow(pa.table({
        "doc_a": pa.array(rows["doc_a"], pa.int64()),
        "doc_b": pa.array(rows["doc_b"], pa.int64()),
        "jaccard": pa.array(rows["jaccard"], pa.float64())}))


# -- SimHash ----------------------------------------------------------------

class _SimHasher:
    def __init__(self, text_col: str, id_col: str):
        import re
        self.tok = re.compile(r"\w+")
        self.text_col = text_col
        self.id_col = id_col

    def simhash(self, text: str) -> np.uint64:
        toks = self.tok.findall((text or "").lower())
        if not toks:
            return np.uint64(0)
        hs = _hash_strings(toks)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        return np.uint64(((v > 0).astype(np.uint64)
                          << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        sh = np.array([self.simhash(t)
                       for t in batch[self.text_col].to_pylist()],
                      dtype=np.uint64)
        out = {"doc_id": pa.array(ids, pa.int64()),
               "simhash": pa.array(sh.astype(np.int64))}
        for b in range(4):  # 4 bands × 16 bits for Hamming ≤ 3 candidates
            out[f"band{b}"] = pa.array(
                ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64))
        return pa.table(out)


def simhash_pairs(ds: "ray.data.Dataset", text_col: str = "text",
                  id_col: str = "doc_id",
                  max_hamming: int = 3) -> "ray.data.Dataset":
    """Near-dup pairs with SimHash Hamming distance ≤ ``max_hamming``
    (guaranteed found when ≤ 3: pigeonhole over 4 bands)."""
    sigs = ds.map_batches(_SimHasher, batch_format="pyarrow", concurrency=pool_size(),
                          fn_constructor_args=(text_col, id_col)).materialize()

    def band_pairs(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        sh = group["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(ids)
        ids, sh = ids[order], sh[order]
        a_out, b_out, d_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                d = int(bin(int(sh[i]) ^ int(sh[j])).count("1"))
                if d <= max_hamming:
                    a_out.append(int(ids[i]))
                    b_out.append(int(ids[j]))
                    d_out.append(d)
        return pa.table({"doc_a": pa.array(a_out, pa.int64()),
                         "doc_b": pa.array(b_out, pa.int64()),
                         "hamming": pa.array(d_out, pa.int64())})

    parts = []
    for b in range(4):
        parts.append(sigs.groupby(f"band{b}").map_groups(
            band_pairs, batch_format="pyarrow"))
    allp = parts[0].union(*parts[1:])
    return allp.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming"))


# -- embedding cosine -------------------------------------------------------

def embedding_cosine_pairs(ds: "ray.data.Dataset", vec_col: str = "embedding",
                           id_col: str = "vec_id",
                           threshold: float = 0.95) -> "ray.data.Dataset":
    """Near-dup pairs by cosine ≥ threshold: each batch matmuls against the
    broadcast normalized matrix (brute force; the IVF variant in
    ``simsearch`` is the scale path). Output: ``(id_a, id_b, cosine)``."""
    mats, ids = [], []
    for b in ds.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        ids.append(b[id_col].to_numpy(zero_copy_only=False))
        mats.append(np.stack(
            [np.asarray(v, dtype=np.float32) for v in b[vec_col].to_pylist()]))
    all_ids = np.concatenate(ids)
    mat = np.concatenate(mats)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    mat_ref = ray.put((all_ids, mat))

    def pairs(batch: pa.Table) -> pa.Table:
        ref_ids, ref_mat = ray.get(mat_ref)
        bids = batch[id_col].to_numpy(zero_copy_only=False)
        bm = np.stack([np.asarray(v, dtype=np.float32)
                       for v in batch[vec_col].to_pylist()])
        bm = bm / np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
        sims = bm @ ref_mat.T
        ii, jj = np.nonzero(sims >= threshold)
        keep = bids[ii] < ref_ids[jj]  # normalize + drop self
        return pa.table({
            "id_a": pa.array(bids[ii][keep], pa.int64()),
            "id_b": pa.array(ref_ids[jj][keep], pa.int64()),
            "cosine": pa.array(sims[ii, jj][keep].astype(np.float64)),
        })

    return ds.map_batches(pairs, batch_format="pyarrow", batch_size=2048)
