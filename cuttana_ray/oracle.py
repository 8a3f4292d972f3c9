"""Single-process NumPy/pure-Python oracles for correctness parity.

Independent implementations (different machinery than the distributed
pipelines: dense matrices, union-find, per-vertex dict loops) of the four
north-star algorithms, used by the pytest suite: PageRank per-vertex
``allclose(atol=1e-6)`` at convergence; components / labels / triangle
counts exact (BASELINE.md "Correctness parity").
"""

from __future__ import annotations

import numpy as np


def pagerank_oracle(src: np.ndarray, dst: np.ndarray, weight: np.ndarray,
                    num_vertices: int, damping: float = 0.85,
                    tol: float = 1e-6, max_iters: int = 100) -> np.ndarray:
    """Dense power iteration; edges are the symmetrized directed list."""
    V = num_vertices
    outw = np.zeros(V)
    np.add.at(outw, src, weight.astype(np.float64))
    dangling = outw == 0.0
    norm_w = weight / np.where(outw[src] == 0, 1.0, outw[src])
    r = np.full(V, 1.0 / V)
    for _ in range(max_iters):
        gathered = np.zeros(V)
        np.add.at(gathered, dst, r[src] * norm_w)
        new = (1 - damping) / V + damping * (gathered + r[dangling].sum() / V)
        if np.abs(new - r).sum() < tol:
            return new
        r = new
    return r


def components_oracle(src: np.ndarray, dst: np.ndarray,
                      num_vertices: int) -> np.ndarray:
    """Union-find; label = min vertex id in the component."""
    parent = np.arange(num_vertices)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(src.tolist(), dst.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return np.asarray([find(i) for i in range(num_vertices)], dtype=np.int64)


def lpa_oracle(src: np.ndarray, dst: np.ndarray, weight: np.ndarray,
               num_vertices: int, max_iters: int = 10) -> np.ndarray:
    """Per-vertex dict loop with the exact engine semantics: synchronous,
    max incoming weight per label, ties → smallest label."""
    labels = np.arange(num_vertices, dtype=np.int64)
    in_nbrs: list[list[tuple[int, int]]] = [[] for _ in range(num_vertices)]
    for s, d, w in zip(src.tolist(), dst.tolist(), weight.tolist()):
        in_nbrs[d].append((s, w))
    for _ in range(max_iters):
        new = labels.copy()
        for v in range(num_vertices):
            if not in_nbrs[v]:
                continue
            counts: dict[int, int] = {}
            for s, w in in_nbrs[v]:
                counts[int(labels[s])] = counts.get(int(labels[s]), 0) + w
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[v] = best
        if (new == labels).all():
            return new
        labels = new
    return labels


def triangles_oracle(src: np.ndarray, dst: np.ndarray,
                     num_vertices: int) -> tuple[np.ndarray, int]:
    """Dense ``A² ∘ A``: per-vertex count = diag(A³)/2, total = trace/6.
    Small graphs only (tests)."""
    A = np.zeros((num_vertices, num_vertices), dtype=np.int64)
    A[src, dst] = 1
    A = np.maximum(A, A.T)
    np.fill_diagonal(A, 0)
    A3 = A @ A @ A
    per_vertex = np.diag(A3) // 2
    return per_vertex.astype(np.int64), int(np.trace(A3) // 6)
