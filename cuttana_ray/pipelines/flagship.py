"""Flagship end-to-end pipeline (the north-star lifecycle, SURVEY.md §3):

transcripts → edge extraction → vocab encode → symmetrize → adjacency →
Cuttana streaming partition → quality metrics (vs mod-k hash baseline) →
CSR actor pool → PageRank + connected components + label propagation +
triangle count → checkpointed Parquet outputs + lineage JSON.

Every stage under ``workdir`` is resumable (manifest-gated); the per-turn
``text`` byte-equality invariant is a separate pass-through
(``transcript_passthrough``) with its own check helper.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import ray.data

from cuttana_ray.config import CuttanaConfig
from cuttana_ray.pipelines import checkpoint as ckpt
from cuttana_ray.pipelines.components import connected_components
from cuttana_ray.pipelines.csr import CSRPool
from cuttana_ray.pipelines.graph import (
    build_graph_from_transcripts,
    graph_adjacency,
)
from cuttana_ray.pipelines.labelprop import label_propagation
from cuttana_ray.pipelines.pagerank import pagerank
from cuttana_ray.pipelines.triangles import triangle_count
from cuttana_ray.stages.metrics import assignment_array, partition_quality
from cuttana_ray.stages.partition_stage import (
    hash_partition_baseline,
    run_cuttana_partition,
)


# the columns either flagship mode reads from the transcript table — pass
# them as read_parquet(columns=...) so the (much wider) text column never
# leaves storage ("prune at the read"; select_columns alone does not push
# the projection into the parquet scan, measured 3.0 s vs 0.9 s cold)
FLAGSHIP_COLUMNS = ("conv_id", "turn_idx", "role", "tool")


def run_flagship(transcripts: "ray.data.Dataset", workdir: str,
                 num_partitions: int = 16,
                 config: CuttanaConfig | None = None,
                 mode: str = "csr", pagerank_tol: float = 1e-6,
                 lpa_iters: int = 10) -> dict:
    """Returns a metrics/lineage dict; writes all tables under ``workdir``."""
    config = config or CuttanaConfig()
    os.makedirs(workdir, exist_ok=True)
    t_start = time.perf_counter()
    timings: dict[str, float] = {}

    def clock(name: str, t0: float) -> float:
        timings[name] = round(time.perf_counter() - t0, 4)
        return time.perf_counter()

    t0 = time.perf_counter()
    graph = build_graph_from_transcripts(transcripts, workdir)
    t0 = clock("graph_build", t0)

    adjacency = graph_adjacency(graph)
    t0 = clock("adjacency", t0)

    # Cuttana streaming partition (sequential stage) + hash baseline
    assign_dir = os.path.join(workdir, "assignments")
    if ckpt.is_complete(assign_dir):
        assignments = ray.data.read_parquet(assign_dir,
                                            file_extensions=["parquet"])
        stream_info = ckpt.read_manifest(assign_dir)
    else:
        assignments, stream_info = run_cuttana_partition(
            adjacency, graph.num_vertices, num_partitions, config)
        assignments = ckpt.write_stage(assignments, assign_dir,
                                       meta=stream_info)
    part = assignment_array(assignments, graph.num_vertices)
    part[part < 0] = 0  # isolated vertices (none in practice) → partition 0
    t0 = clock("cuttana_partition", t0)

    quality = partition_quality(graph.edges, part, num_partitions)
    hash_part = assignment_array(
        hash_partition_baseline(graph.num_vertices, num_partitions),
        graph.num_vertices)
    hash_quality = partition_quality(graph.edges, hash_part, num_partitions)
    t0 = clock("quality_metrics", t0)

    # iterative algorithms
    if mode == "csr":
        pool = CSRPool(graph, part, num_partitions)
        pr = pool.pagerank(tol=pagerank_tol)
        cc = pool.connected_components()
        lp = pool.label_propagation(max_iters=lpa_iters)
        pool.shutdown()
    elif mode == "sharded":
        # BSP: vertex state lives in the shards, per-iteration exchange is
        # the cut-edge working set (the multi-node regime)
        pool = CSRPool(graph, part, num_partitions)
        pr = pool.pagerank_sharded(tol=pagerank_tol)
        cc = pool.connected_components_sharded()
        lp = pool.label_propagation_sharded(max_iters=lpa_iters)
        pool.shutdown()
    else:
        pr = pagerank(graph, tol=pagerank_tol, workdir=workdir)
        cc = connected_components(graph, workdir=workdir)
        lp = label_propagation(graph, max_iters=lpa_iters, workdir=workdir)
    t0 = clock("iterative_algorithms", t0)

    tri = triangle_count(graph)
    t0 = clock("triangles", t0)

    # outputs
    out = pa.table({
        "vertex": pa.array(np.arange(graph.num_vertices, dtype=np.int64)),
        "partition": pa.array(part.astype(np.int32)),
        "rank": pa.array(pr.values),
        "component": pa.array(cc.values),
        "label": pa.array(lp.values),
        "tri_count": pa.array(tri.per_vertex),
    })
    ckpt.write_table(out, os.path.join(workdir, "vertex_results"))

    E = quality["edge_count"]
    pr_iter_secs = float(np.mean(pr.seconds_per_iter)) if pr.seconds_per_iter else 0.0
    lineage = {
        "engine": "cuttana_ray",
        "num_partitions": num_partitions,
        "mode": mode,
        "num_vertices": graph.num_vertices,
        "edge_count": E,
        "stream": {k: v for k, v in stream_info.items() if k != "config"},
        "quality_cuttana": quality,
        "quality_hash_baseline": hash_quality,
        "pagerank": {"iterations": pr.iterations, "converged": pr.converged,
                     "sec_per_iter": pr_iter_secs,
                     "edges_per_sec_per_iter":
                         (E / pr_iter_secs) if pr_iter_secs else None},
        "components": {"iterations": cc.iterations,
                       "n_components": int(len(np.unique(cc.values)))},
        "labelprop": {"iterations": lp.iterations,
                      "n_labels": int(len(np.unique(lp.values)))},
        "triangles": {"total": tri.total},
        "timings_sec": timings,
        "total_sec": round(time.perf_counter() - t_start, 4),
    }
    with open(os.path.join(workdir, "lineage.json"), "w") as f:
        json.dump(lineage, f, indent=2, default=str)
    return lineage


def run_flagship_bigv(transcripts: "ray.data.Dataset", workdir: str,
                      num_shards: int = 16, pagerank_tol: float = 1e-6,
                      lpa_iters: int = 10,
                      check_collisions: bool = True,
                      routing: str = "hash",
                      partitioner: str = "sequential") -> dict:
    """North-star-regime flagship: the same lifecycle as ``run_flagship``
    but with NO O(V) object on the driver (or any single node) at any
    point — the 10^11-vertex path (``pipelines/bigv.py`` module docstring):

    transcripts → string edge extraction → distributed 63-bit collision
    check → stateless hash-id encode (checkpointed) → distributed
    ``id % k`` cut/balance metrics → ``HashShardPool`` BSP PageRank +
    components + label propagation → per-shard Parquet results + lineage.

    ``routing="cuttana"`` additionally runs the Cuttana-quality
    partitioner over the hash-id adjacency (checkpointed under
    ``assignments_bigv`` with the stream metrics in its manifest, so a
    resumed run skips the partitioning pass) and keys SHARD OWNERSHIP by
    that assignment — the reference's cut-quality-reduces-communication
    purpose realized in the big-V regime; lineage then carries both
    cut-quality dicts and the pool's measured per-round exchange
    footprint (``exchange_stats``) for the routing actually used.
    ``partitioner`` picks how that assignment is produced:
    ``"sequential"`` (default) is the reference-faithful one-task stream
    (O(V) state in that task, ``bigv_cuttana_assignment``);
    ``"sharded"`` is the restreaming range-shard engine with NO O(V)
    state in any task (``bigv_sharded``) — with it the ENTIRE lifecycle
    holds no O(V) object anywhere.

    The driver routes object refs and scalars only; results land as
    manifest-gated Parquet stage directories (one file per shard), so a
    rerun with the same ``workdir`` skips finished stages.
    """
    from cuttana_ray.pipelines.bigv import (
        HashShardPool,
        bigv_cuttana_assignment,
        check_hash_collisions,
        hash_encode_edges,
        hash_mod_quality,
        partition_quality_join,
        symmetrize_string_edges,
    )
    from cuttana_ray.stages.edges import transcript_edges

    if routing not in ("hash", "cuttana"):
        raise ValueError(f"routing must be 'hash' or 'cuttana', "
                         f"got {routing!r}")
    if partitioner not in ("sequential", "sharded"):
        raise ValueError(f"partitioner must be 'sequential' or "
                         f"'sharded', got {partitioner!r}")
    os.makedirs(workdir, exist_ok=True)

    # full resume: when every output stage is manifest-complete and the
    # lineage exists, the prior run's lineage IS the result — recomputing
    # (pool rebuild + three BSP prepares + the triangle joins) would only
    # reproduce tables the write_stage calls below would then discard
    lineage_path = os.path.join(workdir, "lineage.json")
    out_stages = ("edges_hashed", "rank_bigv", "component_bigv",
                  "label_bigv", "tri_bigv")
    if os.path.exists(lineage_path) and all(
            ckpt.is_complete(os.path.join(workdir, s)) for s in out_stages):
        with open(lineage_path) as f:
            prev = json.load(f)
        if prev.get("mode") == "bigv":
            prev["resumed"] = True
            return prev

    t_start = time.perf_counter()
    timings: dict[str, float] = {}

    def clock(name: str, t0: float) -> float:
        timings[name] = round(time.perf_counter() - t0, 4)
        return time.perf_counter()

    t0 = time.perf_counter()
    edges_dir = os.path.join(workdir, "edges_hashed")
    if ckpt.is_complete(edges_dir):
        enc = ray.data.read_parquet(edges_dir, file_extensions=["parquet"])
        edge_meta = ckpt.read_manifest(edges_dir)
    else:
        # extractors canonicalize + dedup (one row per unordered pair);
        # doubling is a flat map, encode is stateless per batch
        sym = symmetrize_string_edges(transcript_edges(transcripts))
        if check_collisions:
            check_hash_collisions(sym)
        edge_meta = {"collision_checked": bool(check_collisions)}
        enc = ckpt.write_stage(hash_encode_edges(sym), edges_dir,
                               meta=edge_meta)
    t0 = clock("graph_build", t0)

    quality = hash_mod_quality(enc, num_shards)
    t0 = clock("quality_metrics", t0)

    assignment = None
    quality_cuttana = None
    if routing == "cuttana":
        # Cuttana-quality assignment as a checkpointed stage: the
        # sequential streaming pass is the expensive, deterministic part
        # (reference src/cuttana.rs lifecycle) — a resumed run reloads
        # the (node_id → partition) parquet and its manifest metrics
        # instead of re-streaming the adjacency
        assign_dir = os.path.join(workdir, "assignments_bigv")
        if ckpt.is_complete(assign_dir):
            assignment = ray.data.read_parquet(
                assign_dir, file_extensions=["parquet"]).materialize()
            stream_info = ckpt.read_manifest(assign_dir)
            if stream_info.get("partitioner",
                               "sequential") != partitioner:
                raise ValueError(
                    "assignments_bigv checkpoint was produced by the "
                    f"{stream_info.get('partitioner', 'sequential')!r} "
                    f"partitioner; rerun with that, or clear the stage "
                    f"to switch to {partitioner!r}")
        else:
            if partitioner == "sharded":
                from cuttana_ray.pipelines.bigv_sharded import (
                    bigv_cuttana_assignment_sharded,
                )
                assignment, stream_info = bigv_cuttana_assignment_sharded(
                    enc, k=num_shards)
                stream_info = {k: v for k, v in stream_info.items()
                               if k != "pass_sizes"}
            else:
                assignment, stream_info = bigv_cuttana_assignment(
                    enc, k=num_shards)
            stream_info["partitioner"] = partitioner
            assignment = ckpt.write_stage(assignment, assign_dir,
                                          meta=stream_info)
        quality_cuttana = partition_quality_join(
            enc, assignment, num_shards,
            edge_count=quality["edge_count"])
        t0 = clock("cuttana_partition", t0)

    pool = HashShardPool(enc, num_shards, assignment=assignment,
                         edge_count=quality["edge_count"])
    V = pool.V
    exchange = None
    try:
        # per-shard (= per-partition) iteration checkpoints + resume
        pr, pr_ds = pool.pagerank(tol=pagerank_tol, workdir=workdir,
                                  resume=True)
        # static per-round BSP message footprint under the routing in
        # use (valid once pagerank's prepare has run)
        exchange = pool.exchange_stats()
        ckpt.write_stage(pr_ds, os.path.join(workdir, "rank_bigv"))
        cc, cc_ds = pool.connected_components(workdir=workdir, resume=True)
        comp_ds = ckpt.write_stage(
            cc_ds.rename_columns({"label": "component"}),
            os.path.join(workdir, "component_bigv"))
        lp, lp_ds = pool.label_propagation(max_iters=lpa_iters,
                                           workdir=workdir, resume=True)
        label_ds = ckpt.write_stage(lp_ds, os.path.join(workdir, "label_bigv"))
    finally:
        pool.shutdown()
    t0 = clock("iterative_algorithms", t0)

    from cuttana_ray.pipelines.bigv import triangles_bigv
    tri_total, tri_ds = triangles_bigv(enc)
    ckpt.write_stage(tri_ds, os.path.join(workdir, "tri_bigv"))
    t0 = clock("triangles", t0)

    # distinct counts for lineage, computed as a distributed groupby —
    # the distinct set itself (O(V) for components in the worst case)
    # never leaves the cluster; the driver sees one scalar
    def _n_distinct(ds: "ray.data.Dataset", col: str) -> int:
        return ds.select_columns([col]).groupby(col).count().count()

    n_components = _n_distinct(comp_ds, "component")
    n_labels = _n_distinct(label_ds, "label")
    t0 = clock("summaries", t0)

    E = quality["edge_count"]
    pr_iter_secs = float(np.mean(pr.seconds_per_iter)) \
        if pr.seconds_per_iter else 0.0
    lineage = {
        "engine": "cuttana_ray",
        "mode": "bigv",
        "num_shards": num_shards,
        "num_vertices": V,
        "edge_count": E,
        "edges_stage": edge_meta,
        "routing": routing,
        "quality_hash_mod": quality,
        "quality_cuttana": quality_cuttana,
        "exchange_stats": exchange,
        "pagerank": {"iterations": pr.iterations, "converged": pr.converged,
                     "sec_per_iter": pr_iter_secs,
                     "edges_per_sec_per_iter":
                         (E / pr_iter_secs) if pr_iter_secs else None},
        "components": {"iterations": cc.iterations,
                       "n_components": n_components},
        "labelprop": {"iterations": lp.iterations,
                      "n_labels": n_labels},
        "triangles": {"total": tri_total},
        "timings_sec": timings,
        "total_sec": round(time.perf_counter() - t_start, 4),
    }
    with open(os.path.join(workdir, "lineage.json"), "w") as f:
        json.dump(lineage, f, indent=2, default=str)
    return lineage


def transcript_passthrough(transcripts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Stable-(conv_id, turn_idx)-ordered pass-through; per-turn ``text``
    byte-equality end-to-end is the per-row invariant from
    ``BASELINE.json`` ``input_hint``."""
    return transcripts.sort(["conv_id", "turn_idx"])
