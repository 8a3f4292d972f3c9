"""Checkpoint / resume / lineage for iterative pipelines.

The reference has no persistence at all (results live in RAM,
``/root/reference/src/result.rs:5-12``); resumability is a north-star
requirement of this engine. Layout (SURVEY.md §4)::

    {workdir}/{stage}/              # e.g. edges/, nodes/, assignments/
        part-*.parquet              # partitioned output
        manifest.json               # written LAST → presence = stage complete
    {workdir}/{algo}/iter_{i:04d}/  # per-iteration algorithm state
        state.parquet
        manifest.json

A stage directory is complete iff its ``manifest.json`` exists (written
atomically via temp-file rename after the data). ``resume``: scan for the
last complete iteration and continue from it. Manifests carry lineage:
config, input fingerprint, row counts, iteration metrics, engine version.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

MANIFEST = "manifest.json"


def _write_manifest(dirpath: str, meta: dict) -> None:
    fd, tmp = tempfile.mkstemp(dir=dirpath, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(meta, f, indent=2, default=str)
    os.replace(tmp, os.path.join(dirpath, MANIFEST))


def is_complete(dirpath: str) -> bool:
    return os.path.exists(os.path.join(dirpath, MANIFEST))


def read_manifest(dirpath: str) -> dict:
    with open(os.path.join(dirpath, MANIFEST)) as f:
        return json.load(f)


def write_stage(ds: "ray.data.Dataset", dirpath: str, meta: dict | None = None,
                overwrite: bool = False) -> "ray.data.Dataset":
    """Write a Dataset stage directory with a completion manifest; returns a
    reader over it. No-op (returns reader) when already complete."""
    if is_complete(dirpath):
        if not overwrite:
            return ray.data.read_parquet(dirpath, file_extensions=["parquet"])
        shutil.rmtree(dirpath)
    elif os.path.isdir(dirpath):
        # incomplete leftover from a crashed write: part files but no
        # manifest. Ray's write_parquet uses unique filenames per run, so a
        # rewrite on top would read back BOTH generations — clean first.
        shutil.rmtree(dirpath)
    os.makedirs(dirpath, exist_ok=True)
    ds.write_parquet(dirpath)
    # row count from parquet FOOTERS only — no data re-read (at 100 TB a
    # count() here would re-scan the entire stage output)
    rows = sum(
        pq.ParquetFile(os.path.join(dirpath, f)).metadata.num_rows
        for f in os.listdir(dirpath) if f.endswith(".parquet"))
    _write_manifest(dirpath, {"rows": rows, **(meta or {})})
    return ray.data.read_parquet(dirpath, file_extensions=["parquet"])


def write_table(table: pa.Table, dirpath: str, meta: dict | None = None) -> None:
    """Small driver-side table (vocab, metrics) → single-file stage."""
    if is_complete(dirpath):
        return
    if os.path.isdir(dirpath):
        shutil.rmtree(dirpath)  # incomplete leftover (crash mid-write)
    os.makedirs(dirpath, exist_ok=True)
    pq.write_table(table, os.path.join(dirpath, "part-00000.parquet"))
    _write_manifest(dirpath, {"rows": table.num_rows, **(meta or {})})


def read_table(dirpath: str) -> pa.Table:
    files = sorted(f for f in os.listdir(dirpath) if f.endswith(".parquet"))
    return pa.concat_tables(
        [pq.read_table(os.path.join(dirpath, f)) for f in files])


# -- per-iteration vertex-state checkpoints --------------------------------

def iter_dir(workdir: str, algo: str, iteration: int) -> str:
    return os.path.join(workdir, algo, f"iter_{iteration:04d}")


def save_iteration(workdir: str, algo: str, iteration: int,
                   state: np.ndarray, meta: dict) -> None:
    """Vertex-state vector (index = vertex id) + lineage manifest."""
    d = iter_dir(workdir, algo, iteration)
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table({"vertex": pa.array(np.arange(len(state), dtype=np.int64)),
                  "value": pa.array(state)}),
        os.path.join(d, "state.parquet"))
    _write_manifest(d, {"algo": algo, "iteration": iteration,
                        "num_vertices": len(state), **meta})


def load_latest_iteration(workdir: str, algo: str) -> tuple[int, np.ndarray, dict] | None:
    """Most recent complete iteration → (iteration, state, manifest)."""
    base = os.path.join(workdir, algo)
    if not os.path.isdir(base):
        return None
    its = sorted(
        (int(n.split("_")[1]) for n in os.listdir(base)
         if n.startswith("iter_") and is_complete(os.path.join(base, n))),
        reverse=True)
    if not its:
        return None
    i = its[0]
    d = iter_dir(workdir, algo, i)
    t = pq.read_table(os.path.join(d, "state.parquet"))
    state = np.empty(t.num_rows, dtype=t["value"].type.to_pandas_dtype())
    state[t["vertex"].to_numpy()] = t["value"].to_numpy(zero_copy_only=False)
    return i, state, read_manifest(d)


def compact_stage(dirpath: str, target_rows_per_file: int = 1 << 20) -> int:
    """Compact a completed stage directory's small parquet files into
    ~``target_rows_per_file``-row files — the small-files problem: a
    many-block write (or many incremental appends) leaves hundreds of
    tiny files whose open/footer overhead dominates re-reads at scale.

    One streaming read → ``repartition(ceil(rows/target))`` → atomic
    rewrite (same temp-dir + rename discipline as ``write_stage``); the
    manifest is regenerated with the original lineage plus a
    ``compacted_from`` count. Row count comes from parquet footers (no
    data pass). Returns the new file count.
    """
    if not is_complete(dirpath):
        raise ValueError(f"stage {dirpath} is not complete")
    meta = read_manifest(dirpath)
    files = sorted(f for f in os.listdir(dirpath) if f.endswith(".parquet"))
    total = sum(pq.read_metadata(os.path.join(dirpath, f)).num_rows
                for f in files)
    n_out = max(1, -(-total // target_rows_per_file))
    if n_out >= len(files):
        return len(files)                      # nothing to gain
    ds = ray.data.read_parquet(
        [os.path.join(dirpath, f) for f in files])
    parent = os.path.dirname(os.path.abspath(dirpath))
    tmp = tempfile.mkdtemp(prefix=".compact_", dir=parent)
    try:
        ds.repartition(n_out).write_parquet(tmp)
        meta = dict(meta)
        meta["compacted_from"] = len(files)
        _write_manifest(tmp, meta)
        back = tempfile.mkdtemp(prefix=".old_", dir=parent)
        os.rename(dirpath, os.path.join(back, "d"))
        os.rename(tmp, dirpath)
        shutil.rmtree(back)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return len([f for f in os.listdir(dirpath) if f.endswith(".parquet")])
