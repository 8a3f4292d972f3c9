"""Partition quality metrics over the labeled edge table.

Reproduces the reference's metric definitions exactly
(``/root/reference/src/assignment.rs:87-99``; normalization analysis in
SURVEY.md §1.1):

* ``edge_cut_ratio = cut_count / edge_count`` where ``edge_count`` counts
  directed endpoints (2·|E_undirected| for a symmetrized table,
  ``/root/reference/src/state.rs:159``) and ``cut_count`` counts each cut
  undirected edge ONCE — so over a doubled edge table,
  ``cut_count = (#rows with part[src] != part[dst]) / 2``.
* ``communication_volume = cut_count / (k · vertex_count)``.
* balance factor = ``max_p size(p) / (V / k)`` (bounded by ``1+slack``,
  ``/root/reference/src/assignment.rs:38-41``).

Implementation: the assignment vector is broadcast once via ``ray.put`` as a
dense int32 NumPy array; each edge batch contributes partial (cut, total)
sums — no shuffle, one tiny final aggregate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def assignment_array(assignments: "ray.data.Dataset",
                     num_vertices: int) -> np.ndarray:
    """Assignments Dataset → dense vertex→partition int32 array (-1 gaps)."""
    arr = np.full(num_vertices, -1, dtype=np.int32)
    for b in assignments.iter_batches(batch_size=1 << 20,
                                      batch_format="pyarrow"):
        v = b["vertex"].to_numpy(zero_copy_only=False)
        p = b["partition"].to_numpy(zero_copy_only=False)
        arr[v] = p
    return arr


def cut_metrics_mod(edges: "ray.data.Dataset", num_partitions: int) -> dict:
    """Cut metrics for a symmetrized INT-keyed edge table under the
    SQL-reproducible assignment rule ``partition(node) = node mod k``
    (used by the DuckDB oracle harness — no vocab needed)."""
    def counter(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        cut = (src % num_partitions) != (dst % num_partitions)
        return pa.table({
            "cut": pa.array([int(cut.sum())], pa.int64()),
            "total": pa.array([len(src)], pa.int64()),
        })

    partials = edges.map_batches(counter, batch_format="pyarrow").to_pandas()
    doubled_cut = int(partials["cut"].sum())
    edge_count = int(partials["total"].sum())
    cut_count = doubled_cut // 2
    return {
        "edge_count": edge_count,
        "cut_count": cut_count,
        "edge_cut_ratio": (cut_count / edge_count) if edge_count else 0.0,
    }


def modularity_mod(edges: "ray.data.Dataset", num_partitions: int) -> dict:
    """Newman modularity of a symmetrized weighted INT-keyed edge table
    under the SQL-reproducible rule ``cluster(node) = node mod k``:
    ``Q = Σ_c (w_in_c/2m − (d_c/2m)²)`` with ``2m`` the total symmetrized
    weight, ``w_in_c`` the symmetrized weight internal to cluster c, and
    ``d_c`` cluster c's weighted degree. Per-batch partials are k rows of
    exact int64 sums (k = num_partitions, bounded), combined on the
    driver; the float formula runs once over k terms at the end."""
    def counter(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        w = batch["weight"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = src % num_partitions
        deg = np.zeros(num_partitions, np.int64)
        win = np.zeros(num_partitions, np.int64)
        np.add.at(deg, c, w)
        internal = c == (dst % num_partitions)
        np.add.at(win, c[internal], w[internal])
        return pa.table({
            "c": pa.array(np.arange(num_partitions, dtype=np.int64)),
            "d_c": pa.array(deg), "w_in": pa.array(win)})

    d_c = np.zeros(num_partitions, np.int64)
    w_in = np.zeros(num_partitions, np.int64)
    for b in edges.map_batches(counter, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(b) == 0 or "c" not in b.column_names:
            continue
        idx = b["c"].to_numpy(zero_copy_only=False)
        np.add.at(d_c, idx, b["d_c"].to_numpy(zero_copy_only=False))
        np.add.at(w_in, idx, b["w_in"].to_numpy(zero_copy_only=False))
    m2 = float(d_c.sum())
    q = float(np.sum(w_in / m2 - (d_c / m2) ** 2)) if m2 else 0.0
    return {"n_clusters": num_partitions, "modularity": q}


def partition_quality(edges: "ray.data.Dataset", part_of: np.ndarray,
                      num_partitions: int,
                      weighted: bool = False) -> dict:
    """Cut metrics for a symmetrized int edge table + assignment vector."""
    ref = ray.put(part_of)

    # plain tasks: the broadcast assignment vector is a zero-copy
    # node-local ``ray.get`` per task and there is no per-worker prep, so
    # an actor pool here only added spin-up cost (see stages/vocab.py
    # encode_edges for the measurement)
    def cut_counter(batch: pa.Table) -> pa.Table:
        part = ray.get(ref)
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        w = batch["weight"].to_numpy(zero_copy_only=False) if weighted \
            else np.ones(len(src), dtype=np.int64)
        cut = part[src] != part[dst]
        return pa.table({
            "cut": pa.array([int(w[cut].sum())], pa.int64()),
            "total": pa.array([int(w.sum())], pa.int64()),
            "rows": pa.array([len(src)], pa.int64()),
        })

    partials = edges.map_batches(cut_counter,
                                 batch_format="pyarrow").to_pandas()
    doubled_cut = int(partials["cut"].sum())
    edge_count = int(partials["total"].sum())  # directed endpoints (2E)
    cut_count = doubled_cut // 2               # each cut edge once
    assigned = part_of[part_of >= 0]
    vertex_count = int(len(assigned))
    sizes = np.bincount(assigned, minlength=num_partitions)
    mean = vertex_count / num_partitions if num_partitions else 0.0
    return {
        "vertex_count": vertex_count,
        "edge_count": edge_count,
        "cut_count": cut_count,
        "edge_cut_ratio": (cut_count / edge_count) if edge_count else 0.0,
        "communication_volume": (cut_count / (num_partitions * vertex_count))
        if vertex_count else 0.0,
        "balance_factor": (float(sizes.max()) / mean) if mean else 0.0,
        "partition_sizes": sizes.tolist(),
    }


def conductance_mod(edges: "ray.data.Dataset", num_partitions: int
                    ) -> pa.Table:
    """Per-partition conductance under the SQL-reproducible rule
    ``partition(node) = node mod k`` over a symmetrized weighted INT-keyed
    edge table: ``phi(c) = cut(c) / min(vol(c), 2m - vol(c))`` where
    ``vol(c)`` is the summed weighted degree of c's vertices (each
    symmetrized row contributes its weight to its src's partition),
    ``cut(c)`` the weight of rows leaving c, and ``2m`` the total
    symmetrized weight. The natural next step after the reference's
    edge-cut / balance / modularity family (`assignment.rs:87-99`):
    conductance is the per-partition bottleneck ratio rather than a
    global average.

    Scale shape: same bounded k-row-partial regime as ``modularity_mod`` —
    exact int64 partials per batch, one tiny driver fold, the float
    formula once over k terms. No shuffle.

    Output one row per partition: ``(partition, vol, cut, conductance)``
    (conductance rounded to 6; 0.0 for an empty partition).
    """
    def counter(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        w = batch["weight"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = src % num_partitions
        vol = np.zeros(num_partitions, np.int64)
        cut = np.zeros(num_partitions, np.int64)
        np.add.at(vol, c, w)
        crossing = c != (dst % num_partitions)
        np.add.at(cut, c[crossing], w[crossing])
        return pa.table({
            "c": pa.array(np.arange(num_partitions, dtype=np.int64)),
            "vol": pa.array(vol), "cut": pa.array(cut)})

    vol = np.zeros(num_partitions, np.int64)
    cut = np.zeros(num_partitions, np.int64)
    for b in edges.map_batches(counter, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(b) == 0 or "c" not in b.column_names:
            continue
        idx = b["c"].to_numpy(zero_copy_only=False)
        np.add.at(vol, idx, b["vol"].to_numpy(zero_copy_only=False))
        np.add.at(cut, idx, b["cut"].to_numpy(zero_copy_only=False))
    m2 = int(vol.sum())
    denom = np.minimum(vol, m2 - vol)
    phi = np.where(denom > 0, cut / np.maximum(denom, 1), 0.0)
    return pa.table({
        "part": pa.array(np.arange(num_partitions, dtype=np.int64)),
        "vol": pa.array(vol, pa.int64()),
        "cut": pa.array(cut, pa.int64()),
        "conductance": pa.array(np.round(phi, 6), pa.float64())})


def rich_club(edges: "ray.data.Dataset", thresholds: "list[int]"
              ) -> pa.Table:
    """Rich-club coefficient phi(k) = 2·E_k / (N_k·(N_k−1)) for each
    degree threshold k: the edge density among vertices of UNWEIGHTED
    degree > k (Zhou & Mondragón 2004; Colizza et al. 2006 for the
    uncorrected form computed here). Input: symmetrized int-keyed edges.

    Scale shape: degrees are one ``groupby(src)`` count; two hash joins
    attach (deg_src, deg_dst) to the edge table; then E_k for ALL
    thresholds comes from one pass over ``min(deg_src, deg_dst)`` —
    per-batch partials are |thresholds| ints, folded on the driver (the
    bounded-partials regime). N_k likewise folds from per-batch degree
    partials. Nothing materializes beyond the O(|thresholds|) result.
    """
    from ray.data.aggregate import Count

    from cuttana_ray.util import safe_join

    ks = np.asarray(sorted(thresholds), np.int64)
    deg = edges.groupby("src").aggregate(Count(alias_name="deg")) \
        .map_batches(lambda t: pa.table({
            "v": t["src"], "deg": pc.cast(t["deg"], pa.int64())}),
            batch_format="pyarrow").materialize()

    # N_k partials from the degree table
    def vcount(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "deg" not in t.column_names:
            return pa.table({"k": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        d = t["deg"].to_numpy(zero_copy_only=False)
        return pa.table({
            "k": pa.array(ks),
            "n": pa.array([(d > k).sum() for k in ks], pa.int64())})

    n_k = np.zeros(len(ks), np.int64)
    for b in deg.map_batches(vcount, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(b):
            n_k += np.asarray(b["n"].to_pylist(), np.int64)

    es = safe_join(edges.select_columns(["src", "dst"]),
                   deg.rename_columns({"v": "src", "deg": "deg_src"}),
                   join_type="inner", num_partitions=8, on=("src",))
    ed = safe_join(es, deg.rename_columns({"v": "dst", "deg": "deg_dst"}),
                   join_type="inner", num_partitions=8, on=("dst",))

    def ecount(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "deg_src" not in t.column_names:
            return pa.table({"k": pa.array([], pa.int64()),
                             "e2": pa.array([], pa.int64())})
        md = np.minimum(
            t["deg_src"].to_numpy(zero_copy_only=False),
            t["deg_dst"].to_numpy(zero_copy_only=False))
        return pa.table({
            "k": pa.array(ks),
            "e2": pa.array([(md > k).sum() for k in ks], pa.int64())})

    e2_k = np.zeros(len(ks), np.int64)   # symmetrized rows: 2·E_k
    for b in ed.map_batches(ecount, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(b):
            e2_k += np.asarray(b["e2"].to_pylist(), np.int64)

    pairs = n_k * (n_k - 1)
    phi = np.where(pairs > 0, e2_k / np.maximum(pairs, 1), 0.0)
    return pa.table({
        "k": pa.array(ks),
        "n_nodes": pa.array(n_k, pa.int64()),
        "n_edges": pa.array(e2_k // 2, pa.int64()),
        "phi": pa.array(np.round(phi, 6), pa.float64())})
