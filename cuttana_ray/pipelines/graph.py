"""Graph build pipelines: raw tables → (nodes, symmetrized int edge table).

Lifecycle (SURVEY.md §3 target lifecycle, steps 1-5): read → edge extraction
(``map_batches`` / distributed lead) → weighted dedup (shuffle on (src,dst))
→ vocab encode (broadcast dimension table) → symmetrize → checkpointed
Parquet stages under ``workdir`` so a rerun skips finished work.

Graph semantics match the reference's input contract: an undirected graph in
doubled adjacency form — every undirected edge appears in both directions
(``/root/reference/src/stream.rs:11``; fixture semantics
``/root/reference/tests/partition_tests.rs:8-16``), self-loops dropped.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray.data

from cuttana_ray.pipelines import checkpoint as ckpt
from cuttana_ray.stages.edges import (
    bipartite_edges,
    build_adjacency,
    consecutive_pairs,
    dedup_weighted,
    symmetrize,
)
from cuttana_ray.stages.vocab import build_vocab, encode_edges


@dataclass
class Graph:
    """Encoded link graph: ``edges`` is symmetrized (both directions present,
    no self-loops), endpoints are dense int64 node ids into ``nodes``."""

    edges: "ray.data.Dataset"      # src:int64, dst:int64, weight:int64
    nodes: pa.Table                # node_id, name, kind
    num_vertices: int
    workdir: str | None = None

    def _per_src_sum(self, weighted: bool) -> np.ndarray:
        """Per-vertex sum over outgoing edges, computed distributed: each
        block emits per-batch (src, partial) rows (≤ distinct-src rows, not
        raw edges), the driver combines the small partials. The dense O(V)
        driver array is the documented small-V regime (see
        stages/vocab.py scale notes); the raw edge table never streams to
        the driver."""
        def partial(batch: pa.Table) -> pa.Table:
            src = batch["src"].to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(src, return_inverse=True)
            if weighted:
                w = batch["weight"].to_numpy(zero_copy_only=False)
                sums = np.bincount(inv, weights=w.astype(np.float64))
            else:
                sums = np.bincount(inv).astype(np.float64)
            return pa.table({"v": pa.array(uniq, pa.int64()),
                             "s": pa.array(sums, pa.float64())})

        out = np.zeros(self.num_vertices, dtype=np.float64)
        parts = self.edges.map_batches(partial, batch_format="pyarrow")
        for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
            np.add.at(out, b["v"].to_numpy(zero_copy_only=False),
                      b["s"].to_numpy(zero_copy_only=False))
        return out

    def out_weights(self) -> np.ndarray:
        """Total outgoing edge weight per vertex (dense float64)."""
        return self._per_src_sum(weighted=True)

    def degrees(self) -> np.ndarray:
        """Unique-neighbor out-degree per vertex (= in-degree; symmetric)."""
        return self._per_src_sum(weighted=False).astype(np.int64)


def _build(edges_str: "ray.data.Dataset", workdir: str | None,
           deduped: bool = False, canonical: bool = False) -> Graph:
    """``canonical=True``: ``edges_str`` carries one row per unordered pair
    (extractors ran ``canonicalize_undirected`` before their dedup), so
    symmetrization is a flat map — one fewer all-to-all exchange."""
    if workdir:
        edges_dir = os.path.join(workdir, "edges")
        nodes_dir = os.path.join(workdir, "nodes")
        if ckpt.is_complete(edges_dir) and ckpt.is_complete(nodes_dir):
            nodes = ckpt.read_table(nodes_dir)
            edges = ray.data.read_parquet(edges_dir, file_extensions=["parquet"])
            return Graph(edges, nodes, nodes.num_rows, workdir)

    # string edges are consumed twice (vocab + encode): pin the deduped
    # weighted table, which is far smaller than the raw input.
    if not deduped:
        edges_str = dedup_weighted(edges_str)
    edges_str = edges_str.materialize()
    nodes = build_vocab(edges_str)
    enc = symmetrize(encode_edges(edges_str, nodes),
                     assume_canonical=canonical)
    if workdir:
        ckpt.write_table(nodes, os.path.join(workdir, "nodes"))
        edges = ckpt.write_stage(enc, os.path.join(workdir, "edges"))
    else:
        edges = enc.materialize()
    return Graph(edges, nodes, nodes.num_rows, workdir)


def build_graph_from_transcripts(transcripts: "ray.data.Dataset",
                                 workdir: str | None = None) -> Graph:
    """Flagship edge extraction (BASELINE.json north_star):

    * conv→tool edges: turns with non-null ``tool`` (hub-skewed: popular
      tools collapse to weighted edges before any shuffle).
    * role→role turn-adjacency edges: consecutive ``turn_idx`` within each
      conversation (4-vertex hub core carrying large weights).
    """
    from cuttana_ray.stages.edges import transcript_edges
    return _build(transcript_edges(transcripts), workdir, deduped=True,
                  canonical=True)


def build_graph_from_events(events: "ray.data.Dataset",
                            workdir: str | None = None) -> Graph:
    """Driver-oracle analog over the ``events`` table: user→event_type
    bipartite links + event_type→next-event_type adjacency per user ordered
    by (ts, event_id)."""
    from cuttana_ray.stages.edges import canonicalize_undirected
    # dedup=False: both extractors return per-block partials (weights sum
    # to the same totals); the ONE outer dedup after canonicalize merges
    # directional splits, (a,b)/(b,a) splits and block partials in a
    # single sort exchange — two fewer exchanges than dedup-per-extractor
    ue = bipartite_edges(events.select_columns(["user_id", "event_type"]),
                         "user_id", "event_type", "user:", "event:",
                         dedup=False)
    ee = consecutive_pairs(
        events.select_columns(["user_id", "ts", "event_id", "event_type"]),
        "user_id", ["ts", "event_id"], "event_type", "event:", "event:",
        dedup=False)
    return _build(canonicalize_undirected(ue.union(ee)), workdir,
                  deduped=False, canonical=True)


def directed_edges_from_events(events: "ray.data.Dataset",
                               nodes: pa.Table) -> "ray.data.Dataset":
    """DIRECTED (pre-symmetrization) encoded edge table over the events
    graph — the same extractors as ``build_graph_from_events`` but without
    canonicalize/symmetrize, for direction-sensitive algorithms (HITS).

    ``nodes`` is the vocab of the symmetric build (both directions of every
    name appear there, so the directed endpoints are always covered).
    Self-loops (event:X → event:X runs) are dropped per-batch, matching the
    symmetric build's contract. The two extractors cover disjoint edge-key
    spaces (user:→event: vs event:→event:), each already globally weighted,
    so their union needs no further dedup exchange."""
    import pyarrow.compute as pc

    ue = bipartite_edges(events.select_columns(["user_id", "event_type"]),
                         "user_id", "event_type", "user:", "event:")
    ee = consecutive_pairs(
        events.select_columns(["user_id", "ts", "event_id", "event_type"]),
        "user_id", ["ts", "event_id"], "event_type", "event:", "event:")
    enc = encode_edges(ue.union(ee), nodes)

    def drop_loops(batch: pa.Table) -> pa.Table:
        if "src" not in batch.column_names or len(batch) == 0:
            return batch
        return batch.filter(pc.invert(pc.equal(batch["src"], batch["dst"])))

    return enc.map_batches(drop_loops, batch_format="pyarrow",
                           zero_copy_batch=True)


def quotient_graph(edges: "ray.data.Dataset", labels: "ray.data.Dataset",
                   drop_self_loops: bool = True,
                   num_partitions: int | None = None) -> "ray.data.Dataset":
    """Contract a graph by a vertex→label mapping — the page→host /
    community-coarsening operator: every vertex collapses into its label's
    super-vertex and parallel edges merge by weight sum.

    Fully distributed: two hash joins attach labels to both endpoints
    (``labels`` is a (vertex, label) Dataset — never broadcast, so the
    mapping may be as large as V), then one groupby-sum collapses the
    multigraph. Intra-cluster edges drop by default (set
    ``drop_self_loops=False`` to keep them as super-loops). A doubled
    (symmetrized) input stays doubled in the output.

    Returns a Dataset with columns (lsrc, ldst, weight).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from cuttana_ray.util import pool_size, safe_join

    if num_partitions is None:
        num_partitions = pool_size()[1]
    e = safe_join(edges.select_columns(["src", "dst", "weight"]),
                  labels.rename_columns({"vertex": "_sv", "label": "lsrc"}),
                  join_type="inner", num_partitions=num_partitions,
                  on=("src",), right_on=("_sv",))
    e = safe_join(e,
                  labels.rename_columns({"vertex": "_dv", "label": "ldst"}),
                  join_type="inner", num_partitions=num_partitions,
                  on=("dst",), right_on=("_dv",))

    def project(t: pa.Table) -> pa.Table:
        sch = pa.schema([("lsrc", pa.int64()), ("ldst", pa.int64()),
                         ("weight", pa.int64())])
        if len(t) == 0 or "lsrc" not in t.column_names:
            return sch.empty_table()
        out = pa.table({"lsrc": pc.cast(t["lsrc"], pa.int64()),
                        "ldst": pc.cast(t["ldst"], pa.int64()),
                        "weight": pc.cast(t["weight"], pa.int64())})
        if drop_self_loops:
            out = out.filter(pc.invert(pc.equal(out["lsrc"], out["ldst"])))
        # pre-aggregate inside the batch before the exchange
        return out.group_by(["lsrc", "ldst"]) \
            .aggregate([("weight", "sum")]) \
            .rename_columns(["lsrc", "ldst", "weight"])

    return e.map_batches(project, batch_format="pyarrow") \
        .groupby(["lsrc", "ldst"]).aggregate(Sum("weight",
                                                 alias_name="weight"))


def graph_adjacency(graph: Graph) -> "ray.data.Dataset":
    """Adjacency rows for the partitioner feed, checkpointed when a workdir
    is set (the natural restart point before the sequential stage)."""
    if graph.workdir:
        d = os.path.join(graph.workdir, "adjacency")
        if ckpt.is_complete(d):
            return ray.data.read_parquet(d, file_extensions=["parquet"])
        return ckpt.write_stage(build_adjacency(graph.edges), d)
    return build_adjacency(graph.edges)
