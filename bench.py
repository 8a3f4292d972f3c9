#!/usr/bin/env python
"""Benchmark harness.

Default: run the headline pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32)`` and print ONE JSON line::

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N, ...}

``--scaling``: run the same bench twice in fresh processes at num_cpus=8 and
num_cpus=32 on the same input and report both throughputs plus the scaling
efficiency (BASELINE.md criterion: ≥0.8 from N to 4N).

Headline pipelines:
* flagship transcripts: synthetic transcript table at the scale factor
  (FIXTURES.md §A; 0.1 → 300k convs ≈ 1M turns) → edge extraction → Cuttana
  partition → PageRank(1e-6)/CC/LPA/triangles via the CSR actor pool.
* events link graph from the sf dir: graph build + shuffle-mode PageRank.
* training-data ops over the sf dir: exact dedup + MinHash LSH on documents,
  brute-force KNN over embeddings.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import logging

    import numpy as np
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level=logging.ERROR)
    try:
        import ray.data as rd
        from ray.data import DataContext
        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
        logging.getLogger("ray.data").setLevel(logging.ERROR)

        from cuttana_ray.pipelines.flagship import run_flagship
        from cuttana_ray.sources.transcripts import write_synth_transcripts

        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
        n_convs = max(1000, int(3_000_000 * sf))

        queries: dict[str, float] = {}
        detail: dict[str, object] = {}

        # -- flagship transcripts ------------------------------------------
        tdir = f"/tmp/cuttana_bench/transcripts_sf{sf}"
        write_synth_transcripts(tdir, n_convs, num_files=32)   # cached
        transcripts = rd.read_parquet(tdir, file_extensions=["parquet"])
        transcripts.count()  # warm page cache (untimed read)

        workdir = tempfile.mkdtemp(prefix="cuttana_bench_")
        t0 = time.perf_counter()
        lineage = run_flagship(transcripts, workdir, num_partitions=16,
                               mode="csr")
        queries["flagship_transcripts"] = round(time.perf_counter() - t0, 3)
        detail["flagship"] = {
            "num_vertices": lineage["num_vertices"],
            "edge_count": lineage["edge_count"],
            "pagerank_iterations": lineage["pagerank"]["iterations"],
            "pagerank_sec_per_iter": round(
                lineage["pagerank"]["sec_per_iter"], 5),
            "edges_per_sec_per_iter": round(
                lineage["pagerank"]["edges_per_sec_per_iter"] or 0),
            "edge_cut_ratio_cuttana":
                round(lineage["quality_cuttana"]["edge_cut_ratio"], 4),
            "edge_cut_ratio_hash":
                round(lineage["quality_hash_baseline"]["edge_cut_ratio"], 4),
            "balance_factor":
                round(lineage["quality_cuttana"]["balance_factor"], 4),
            "timings": lineage["timings_sec"],
        }
        shutil.rmtree(workdir, ignore_errors=True)

        # -- events graph, shuffle-mode PageRank ---------------------------
        from cuttana_ray.pipelines.graph import build_graph_from_events
        from cuttana_ray.pipelines.pagerank import pagerank
        t0 = time.perf_counter()
        g = build_graph_from_events(
            rd.read_parquet(os.path.join(sf_dir, "events.parquet")))
        queries["events_graph_build"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        pr = pagerank(g, tol=1e-6)
        queries["events_pagerank_shuffle"] = round(time.perf_counter() - t0, 3)
        E = g.edges.count()
        spi = float(np.mean(pr.seconds_per_iter)) if pr.seconds_per_iter else 0
        detail["events_pagerank"] = {
            "edge_count": E, "iterations": pr.iterations,
            "sec_per_iter": round(spi, 4),
            "edges_per_sec_per_iter": round(E / spi) if spi else None,
        }

        # -- training-data ops ---------------------------------------------
        from cuttana_ray.functions.dedup import exact_dedup, minhash_lsh_pairs
        from cuttana_ray.functions.simsearch import knn_brute_force
        docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
        t0 = time.perf_counter()
        exact_dedup(docs).count()
        queries["dedup_exact_docs"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        minhash_lsh_pairs(docs, threshold=0.5).count()
        queries["minhash_lsh_docs"] = round(time.perf_counter() - t0, 3)

        import pyarrow.parquet as pq
        et = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                           columns=["embedding"])
        q = np.stack([np.asarray(v, np.float32)
                      for v in et["embedding"][:8].to_pylist()])
        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
        t0 = time.perf_counter()
        knn_brute_force(emb, q, k=10)
        queries["knn_brute_force"] = round(time.perf_counter() - t0, 3)

        total = round(sum(queries.values()), 3)
        return {
            "metric": "headline pipelines total wall time (flagship "
                      "transcripts graph + events graph + training-data ops)",
            "value": total,
            "unit": "sec",
            "queries": queries,
            "sf": sf,
            "num_cpus": num_cpus,
            "detail": detail,
        }
    finally:
        ray.shutdown()


def run_scaling(sf_dir: str, lo: int = 8, hi: int = 32) -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True, cwd=os.path.dirname(
                                 os.path.abspath(__file__)))
        return json.loads(out.stdout.strip().splitlines()[-1])

    one(lo)           # warm-up pass: page cache + synthetic-input generation
    r_lo = one(lo)
    r_hi = one(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling efficiency (fresh-process runs, same input)",
        f"sec_{lo}": t_lo,
        f"sec_{hi}": t_hi,
        "speedup": round(t_lo / t_hi, 3),
        "scaling_efficiency": round(eff, 3),
        "queries_lo": r_lo["queries"],
        "queries_hi": r_hi["queries"],
        "sf": r_lo["sf"],
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    else:
        ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        print(json.dumps(run_bench(sf_dir, ncpu)))
