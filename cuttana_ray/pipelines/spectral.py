"""Second-eigenvalue (spectral-gap) estimation of the normalized adjacency.

``N = D^{-1/2} W D^{-1/2}`` over the symmetrized weighted graph has
principal eigenvalue 1 with eigenvector ``u ∝ √strength`` — known in
closed form, so no first power iteration is needed. The second eigenvalue
(whose gap from 1 bounds random-walk mixing time and conductance via
Cheeger) comes from ``k`` DEFLATED power-iteration steps:

    x ← N·x;  x ← x − (u·x)·u;  λ ← ‖x‖₂;  x ← x/λ

from the deterministic seed ``x₀[v] = (v mod 7) + 1`` (deflated +
normalized first). Exposed as a fixed-``k`` iteration so an unrolled SQL
oracle replays it exactly; the returned λ is the estimate after exactly
``k`` steps, not a convergence guarantee (on a disconnected graph the
true λ₂ is 1 and the iterate reports it correctly — a second
eigenvalue-1 vector survives deflation).

Execution shape mirrors ``pipelines/katz.py``: one streamed edge pass per
round with the O(V) iterate re-broadcast (documented small-V regime; the
sharded-BSP modes in ``pipelines/csr.py`` are the big-V alternative).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from cuttana_ray.pipelines.graph import Graph


def _partial_fn(xs_ref):
    def fn(batch: pa.Table) -> pa.Table:
        xs = ray.get(xs_ref)
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        w = batch["weight"].to_numpy(zero_copy_only=False).astype(np.float64)
        uniq, inv = np.unique(src, return_inverse=True)
        sums = np.bincount(inv, weights=w * xs[dst])
        return pa.table({"v": pa.array(uniq, pa.int64()),
                         "s": pa.array(sums, pa.float64())})
    return fn


def spectral_gap(graph: Graph, k: int = 8) -> tuple[float, np.ndarray]:
    """``k`` deflated power-iteration steps on the normalized adjacency;
    returns ``(lambda2_estimate, final_unit_vector)``.

    Zero-strength (isolated) vertices contribute nothing to N (their rows
    and columns are zero) and keep value 0 throughout.
    """
    V = graph.num_vertices
    s = graph.out_weights()
    pos = s > 0
    rs = np.zeros(V, dtype=np.float64)
    rs[pos] = 1.0 / np.sqrt(s[pos])
    u = np.sqrt(np.maximum(s, 0.0))
    u = u / float(np.sqrt((u * u).sum()))

    x = ((np.arange(V, dtype=np.int64) % 7) + 1).astype(np.float64)
    x = x - float(u @ x) * u
    x = x / float(np.sqrt((x * x).sum()))
    lam = 0.0
    for _ in range(k):
        xs_ref = ray.put(x * rs)
        part = graph.edges.map_batches(_partial_fn(xs_ref),
                                       batch_format="pyarrow")
        acc = np.zeros(V, dtype=np.float64)
        for b in part.iter_batches(batch_size=None, batch_format="pyarrow"):
            np.add.at(acc, b["v"].to_numpy(zero_copy_only=False),
                      b["s"].to_numpy(zero_copy_only=False))
        y = acc * rs
        y = y - float(u @ y) * u
        lam = float(np.sqrt((y * y).sum()))
        x = y / lam if lam > 0 else y
    return lam, x


def sweep_cut(graph: Graph, score: np.ndarray
              ) -> tuple[int, int, int, float]:
    """Sweep cut (Andersen-Chung-Lang FOCS'06): order vertices by
    ``score/degree`` descending (vertex-id tie-break), then find the
    prefix with minimum conductance ``cut(S)/min(vol(S), vol(V∖S))`` —
    the local-partitioning step that turns a PPR vector into an actual
    community. Returns ``(prefix_size, cut_edges, volume, conductance)``
    of the best non-trivial prefix (earliest wins conductance ties).

    The cut profile over ALL prefixes comes from one streamed edge pass:
    each undirected edge contributes +1 at min(pos) and −1 at max(pos) of
    its endpoints' sweep positions (a difference array), so cumsum gives
    cut(t) exactly — no per-prefix recount. The O(V) position vector is
    the documented small-V regime. Assumes every vertex has degree ≥ 1
    (true for any graph built from an edge list).
    """
    V = graph.num_vertices
    deg = graph.degrees().astype(np.int64)
    ratio = score / np.where(deg > 0, deg, 1).astype(np.float64)
    order = np.lexsort((np.arange(V), -ratio))
    pos = np.empty(V, dtype=np.int64)
    pos[order] = np.arange(V, dtype=np.int64)
    pos_ref = ray.put(pos)

    def diff_fn(batch: pa.Table) -> pa.Table:
        sch = pa.schema([("t", pa.int64()), ("d", pa.int64())])
        if len(batch) == 0 or "src" not in batch.column_names:
            return sch.empty_table()
        P = ray.get(pos_ref)
        s = batch["src"].to_numpy(zero_copy_only=False)
        dd = batch["dst"].to_numpy(zero_copy_only=False)
        m = s < dd  # canonical direction only
        lo = np.minimum(P[s[m]], P[dd[m]])
        hi = np.maximum(P[s[m]], P[dd[m]])
        t = np.concatenate([lo, hi])
        d = np.concatenate([np.ones(len(lo), np.int64),
                            np.full(len(hi), -1, np.int64)])
        uniq, inv = np.unique(t, return_inverse=True)
        return pa.table({"t": pa.array(uniq, pa.int64()),
                         "d": pa.array(np.bincount(inv, weights=d)
                                       .astype(np.int64))}).cast(sch)

    diff = np.zeros(V, dtype=np.int64)
    part = graph.edges.map_batches(diff_fn, batch_format="pyarrow")
    for b in part.iter_batches(batch_size=None, batch_format="pyarrow"):
        np.add.at(diff, b["t"].to_numpy(zero_copy_only=False),
                  b["d"].to_numpy(zero_copy_only=False))
    cut = np.cumsum(diff)
    vol = np.cumsum(deg[order])
    tot = int(deg.sum())
    t_rng = np.arange(V - 1)
    denom = np.minimum(vol[:-1], tot - vol[:-1])
    phi = cut[:-1].astype(np.float64) / denom
    i = int(np.lexsort((t_rng, phi))[0])
    return (i + 1, int(cut[i]), int(vol[i]), float(phi[i]))
