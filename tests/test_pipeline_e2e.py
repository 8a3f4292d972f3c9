"""End-to-end: flagship pipeline, per-turn text invariant, checkpoint/resume,
partition stage quality + determinism."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from cuttana_ray import oracle
from cuttana_ray.config import CuttanaConfig
from cuttana_ray.pipelines import checkpoint as ckpt
from cuttana_ray.pipelines.flagship import run_flagship, transcript_passthrough
from cuttana_ray.pipelines.graph import build_graph_from_transcripts, graph_adjacency
from cuttana_ray.pipelines.pagerank import pagerank
from cuttana_ray.stages.metrics import assignment_array, partition_quality
from cuttana_ray.stages.partition_stage import (
    hash_partition_baseline,
    run_cuttana_partition,
)


def test_text_byte_equality_passthrough(tiny_transcripts, tmp_path):
    """Per-turn ``text`` byte-equality under stable (conv_id, turn_idx)
    ordering, end-to-end through shuffle + parquet round-trip
    (BASELINE.json input_hint)."""
    ds = rd.from_arrow(tiny_transcripts).repartition(9)
    out_dir = str(tmp_path / "passthrough")
    transcript_passthrough(ds).write_parquet(out_dir)
    back = rd.read_parquet(out_dir).sort(["conv_id", "turn_idx"]).to_pandas()
    exp = tiny_transcripts.to_pandas() \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(back) == len(exp)
    assert (back["text"].to_numpy() == exp["text"].to_numpy()).all()
    assert (back["conv_id"].to_numpy() == exp["conv_id"].to_numpy()).all()
    assert (back["turn_idx"].to_numpy() == exp["turn_idx"].to_numpy()).all()


def test_cuttana_beats_hash_baseline_and_balances(tiny_graph):
    g = tiny_graph
    k = 8
    cfg = CuttanaConfig(num_sub_partitions=64)
    adj = graph_adjacency(g)
    assign, info = run_cuttana_partition(adj, g.num_vertices, k, cfg)
    part = assignment_array(assign, g.num_vertices)
    assert (part >= 0).all()          # every vertex assigned exactly once
    assert assign.count() == g.num_vertices
    q = partition_quality(g.edges, part, k)
    hq = partition_quality(
        g.edges, assignment_array(hash_partition_baseline(g.num_vertices, k),
                                  g.num_vertices), k)
    assert q["edge_cut_ratio"] < hq["edge_cut_ratio"]
    # post-refinement balance: max size ≤ max_parent = V/k·(1+slack)+1
    assert max(q["partition_sizes"]) <= int(g.num_vertices / k * 1.05) + 1
    # stream-time metric formulas (assignment.rs:87-99)
    assert info["edge_cut_ratio_stream"] == pytest.approx(
        info["vertex_count"] and
        (info["edge_cut_ratio_stream"] * info["edge_count"])
        / info["edge_count"])
    # determinism across reruns
    assign2, _ = run_cuttana_partition(adj, g.num_vertices, k, cfg)
    assert (assignment_array(assign2, g.num_vertices) == part).all()


def test_flagship_end_to_end(tiny_transcripts, tmp_path):
    workdir = str(tmp_path / "flagship")
    ds = rd.from_arrow(tiny_transcripts).repartition(5)
    lineage = run_flagship(ds, workdir, num_partitions=4,
                           config=CuttanaConfig(num_sub_partitions=32),
                           lpa_iters=4)
    # outputs + lineage written
    assert os.path.exists(os.path.join(workdir, "lineage.json"))
    assert ckpt.is_complete(os.path.join(workdir, "edges"))
    assert ckpt.is_complete(os.path.join(workdir, "assignments"))
    assert ckpt.is_complete(os.path.join(workdir, "vertex_results"))
    res = ckpt.read_table(os.path.join(workdir, "vertex_results"))
    assert res.num_rows == lineage["num_vertices"]
    # CSR-mode results match oracles computed from the checkpointed edges
    et = ckpt.read_table(os.path.join(workdir, "edges")).to_pandas()
    src, dst, w = (et["src"].to_numpy(), et["dst"].to_numpy(),
                   et["weight"].to_numpy())
    V = lineage["num_vertices"]
    assert np.allclose(res["rank"].to_numpy(),
                       oracle.pagerank_oracle(src, dst, w, V), atol=1e-6)
    assert (res["component"].to_numpy()
            == oracle.components_oracle(src, dst, V)).all()
    assert (res["tri_count"].to_numpy()
            == oracle.triangles_oracle(src, dst, V)[0]).all()
    assert lineage["quality_cuttana"]["edge_cut_ratio"] \
        < lineage["quality_hash_baseline"]["edge_cut_ratio"]
    # second run resumes from checkpoints (graph build + partition skipped)
    lineage2 = run_flagship(ds, workdir, num_partitions=4,
                            config=CuttanaConfig(num_sub_partitions=32),
                            lpa_iters=4)
    assert lineage2["num_vertices"] == lineage["num_vertices"]
    assert lineage2["quality_cuttana"]["cut_count"] \
        == lineage["quality_cuttana"]["cut_count"]


def test_pagerank_checkpoint_resume_equals_uninterrupted(tiny_graph, tmp_path):
    g = tiny_graph
    # damping 0.5 converges in ~20 rounds; resume-equality is
    # damping-independent, so keep the test cheap
    full = pagerank(g, damping=0.5, workdir=str(tmp_path / "full"))
    # interrupted: run only 3 iterations, then resume from checkpoint
    inter_dir = str(tmp_path / "inter")
    pagerank(g, damping=0.5, max_iters=3, workdir=inter_dir)
    resumed = pagerank(g, damping=0.5, workdir=inter_dir, resume=True)
    assert np.allclose(resumed.values, full.values, atol=1e-12)
    # lineage manifests present per iteration
    it0 = ckpt.iter_dir(inter_dir, "pagerank", 0)
    assert ckpt.is_complete(it0)
    m = ckpt.read_manifest(it0)
    assert {"delta", "seconds", "iteration"} <= set(m)


def test_stage_checkpoint_atomicity(tmp_path):
    d = str(tmp_path / "stage")
    t = pa.table({"a": [1, 2, 3]})
    ckpt.write_table(t, d)
    assert ckpt.is_complete(d)
    # incomplete dir (no manifest) is not considered complete
    d2 = str(tmp_path / "stage2")
    os.makedirs(d2)
    assert not ckpt.is_complete(d2)


def test_stage_checkpoint_crash_resume_no_duplicates(tmp_path):
    """Regression: a crash mid-write (part files present, no manifest)
    must not leave stale files that double the re-written stage."""
    d = str(tmp_path / "stage")
    ds = rd.range(100)
    # simulate crash: data written, manifest never materialized
    os.makedirs(d)
    ds.write_parquet(d)
    assert not ckpt.is_complete(d)
    out = ckpt.write_stage(rd.range(100), d)
    assert out.count() == 100
    assert ckpt.read_manifest(d)["rows"] == 100


def test_flagship_shuffle_mode(tiny_transcripts, tmp_path):
    """mode="shuffle" flagship path (checkpointed iterations) matches the
    CSR-mode results."""
    ds = rd.from_arrow(tiny_transcripts).repartition(4)
    l_csr = run_flagship(ds, str(tmp_path / "csr"), num_partitions=4,
                         config=CuttanaConfig(num_sub_partitions=32),
                         mode="csr", lpa_iters=3)
    l_shf = run_flagship(ds, str(tmp_path / "shf"), num_partitions=4,
                         config=CuttanaConfig(num_sub_partitions=32),
                         mode="shuffle", lpa_iters=3)
    r_csr = ckpt.read_table(os.path.join(str(tmp_path / "csr"),
                                         "vertex_results"))
    r_shf = ckpt.read_table(os.path.join(str(tmp_path / "shf"),
                                         "vertex_results"))
    assert np.allclose(r_csr["rank"].to_numpy(), r_shf["rank"].to_numpy(),
                       atol=1e-6)
    assert (r_csr["component"].to_numpy()
            == r_shf["component"].to_numpy()).all()
    assert (r_csr["label"].to_numpy() == r_shf["label"].to_numpy()).all()
    assert l_csr["quality_cuttana"]["cut_count"] \
        == l_shf["quality_cuttana"]["cut_count"]


def test_components_and_lpa_resume(tiny_graph, tmp_path):
    from cuttana_ray.pipelines.components import connected_components
    from cuttana_ray.pipelines.labelprop import label_propagation
    full = connected_components(tiny_graph, workdir=str(tmp_path / "ccf"))
    connected_components(tiny_graph, max_iters=2,
                         workdir=str(tmp_path / "cci"))
    resumed = connected_components(tiny_graph, workdir=str(tmp_path / "cci"),
                                   resume=True)
    assert (resumed.values == full.values).all()

    fl = label_propagation(tiny_graph, max_iters=5,
                           workdir=str(tmp_path / "lpf"))
    label_propagation(tiny_graph, max_iters=2, workdir=str(tmp_path / "lpi"))
    rl = label_propagation(tiny_graph, max_iters=5,
                           workdir=str(tmp_path / "lpi"), resume=True)
    assert (rl.values == fl.values).all()


def test_compact_stage_merges_small_files(tmp_path):
    import glob

    import pyarrow as pa

    from cuttana_ray.pipelines import checkpoint as ckpt
    d = str(tmp_path / "stage")
    ckpt.write_stage(rd.range(5000).repartition(40), d,
                     meta={"note": "orig"})
    before = glob.glob(f"{d}/*.parquet")
    assert len(before) > 4
    n = ckpt.compact_stage(d, target_rows_per_file=2500)
    after = glob.glob(f"{d}/*.parquet")
    assert n == len(after) == 2
    # content identical, manifest keeps lineage + compaction record
    t = ckpt.read_table(d)
    assert sorted(t["id"].to_pylist()) == list(range(5000))
    m = ckpt.read_manifest(d)
    assert m["note"] == "orig" and m["compacted_from"] == len(before)
    # already-compact stages are left untouched
    assert ckpt.compact_stage(d, target_rows_per_file=2500) == 2
