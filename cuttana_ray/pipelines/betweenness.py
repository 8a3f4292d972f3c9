"""Betweenness centrality via sampled Brandes over the link graph.

Exact Brandes (Brandes 2001, unweighted) summed over a SEED SET of
sources: bc(v) = Σ_{s ∈ seeds} δ_s(v), where δ_s is the one-source
dependency. With seeds = all vertices this is exact (directed-pair
convention — on a symmetrized graph each unordered pair contributes from
both endpoints); with a hash-spaced sample it is the standard scalable
estimator (scale the result by V/|seeds| for an unbiased estimate).

Per source the two sweeps are frontier-bounded edge passes, exactly the
``pipelines/bfs.py`` discipline:

* forward, level t → t+1: σ (shortest-path counts) of next-level vertices
  accumulate as a SUM over frontier in-edges — per-batch
  ``np.add.reduceat`` partials, combined per ``resolve_combine``;
* backward, level t+1 → t: dependencies δ flow the other way,
  δ(u) += σ(u)/σ(w)·(1+δ(w)) summed over u's successors w in level t+1 —
  the same per-batch partial-sum shape with the roles of src/dst swapped.

Work per round is O(edges touching the frontier), never O(E); the
per-source state (dist, σ, δ) is O(V) driver/broadcast state in the same
regime as the other iterative pipelines (``combine="shuffle"`` is the
documented huge-V path). Seeds are processed sequentially — total passes
are |seeds| × 2·depth; pick |seeds| accordingly (this is a sampled
estimator by design at scale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from cuttana_ray.pipelines.graph import Graph


def _sum_partials_fn(state_ref, forward: bool):
    """Edge pass emitting per-batch (vertex, weighted-sum) partials.

    forward: src in frontier → contribute ``val[src]`` to dst.
    backward: dst in frontier → contribute ``val[dst]`` to src.
    """
    def fn(batch: pa.Table) -> pa.Table:
        mask, val = ray.get(state_ref)
        a = batch["src" if forward else "dst"] \
            .to_numpy(zero_copy_only=False)
        b = batch["dst" if forward else "src"] \
            .to_numpy(zero_copy_only=False)
        keep = mask[a]
        if not keep.any():
            return pa.table({"v": pa.array([], pa.int64()),
                             "partial": pa.array([], pa.float64())})
        tgt, contrib = b[keep], val[a[keep]]
        order = np.argsort(tgt, kind="stable")
        tgt_s, c_s = tgt[order], contrib[order]
        starts = np.concatenate(
            [[0], np.nonzero(tgt_s[1:] != tgt_s[:-1])[0] + 1])
        sums = np.add.reduceat(c_s, starts)
        return pa.table({"v": pa.array(tgt_s[starts], pa.int64()),
                         "partial": pa.array(sums, pa.float64())})
    return fn


def _combine(ds_partial, V: int) -> np.ndarray:
    out = np.zeros(V, dtype=np.float64)
    for b in ds_partial.iter_batches(batch_size=1 << 20,
                                     batch_format="pyarrow"):
        np.add.at(out, b["v"].to_numpy(zero_copy_only=False),
                  b["partial"].to_numpy(zero_copy_only=False))
    return out


def betweenness(graph: Graph, seeds: "np.ndarray | list[int]",
                max_depth: int = 200) -> np.ndarray:
    """Σ over seeds of Brandes dependencies; returns a float64[V] array.
    Endpoints excluded (δ_s(s) = 0), the standard convention."""
    V = graph.num_vertices
    edges = graph.edges
    bc = np.zeros(V, dtype=np.float64)

    for s in np.asarray(seeds, dtype=np.int64):
        dist = np.full(V, -1, dtype=np.int64)
        sigma = np.zeros(V, dtype=np.float64)
        dist[s] = 0
        sigma[s] = 1.0
        levels = [np.array([s], dtype=np.int64)]
        # forward sweep: levels + path counts
        for t in range(max_depth):
            frontier = np.zeros(V, dtype=bool)
            frontier[levels[-1]] = True
            ref = ray.put((frontier, sigma))
            partial = edges.map_batches(_sum_partials_fn(ref, True),
                                        batch_format="pyarrow")
            sums = _combine(partial, V)
            new = (sums > 0) & (dist == -1)
            if not new.any():
                break
            sigma[new] += sums[new]
            dist[new] = t + 1
            levels.append(np.nonzero(new)[0].astype(np.int64))
        # backward sweep: dependency accumulation, deepest level first
        delta = np.zeros(V, dtype=np.float64)
        for t in range(len(levels) - 1, 0, -1):
            wmask = np.zeros(V, dtype=bool)
            wmask[levels[t]] = True
            coeff = np.zeros(V, dtype=np.float64)
            coeff[levels[t]] = (1.0 + delta[levels[t]]) / sigma[levels[t]]
            ref = ray.put((wmask, coeff))
            partial = edges.map_batches(_sum_partials_fn(ref, False),
                                        batch_format="pyarrow")
            sums = _combine(partial, V)
            prev = levels[t - 1]
            # only predecessors (dist == t-1) receive dependency
            delta[prev] += sigma[prev] * sums[prev]
        delta[s] = 0.0
        bc += delta
    return bc
