"""Transcript table source + deterministic synthetic generator.

Input schema (authoritative: ``BASELINE.json`` ``input_hint``)::

    conv_id: string, turn_idx: int32, role: string, text: string,
    tool: string (nullable), ts: timestamp[us]

The synthetic generator follows FIXTURES.md §A exactly: seed=42 NumPy PCG64,
Zipf turn counts, a fixed Markov chain over roles (skewed role→role
adjacency), Zipf tool popularity with ~70% null (hub skew on conv→tool
edges), and deterministic text whose byte-equality is checked end-to-end.
No wall-clock, no external data.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

ROLES = ["user", "assistant", "system", "tool"]
# fixed Markov transition matrix over ROLES, start state "user"
_ROLE_TRANSITIONS = np.array([
    # to:  user  assistant system tool
    [0.05, 0.75, 0.05, 0.15],  # from user
    [0.55, 0.10, 0.05, 0.30],  # from assistant
    [0.60, 0.30, 0.05, 0.05],  # from system
    [0.10, 0.80, 0.02, 0.08],  # from tool
])
_EPOCH_US = np.int64(1_767_225_600_000_000)  # 2026-01-01T00:00:00 in µs
_N_TOOLS = 50
_VOCAB_SIZE = 1000


def synth_transcripts_table(n_convs: int, seed: int = 42) -> pa.Table:
    """Deterministic transcript table with ``n_convs`` conversations
    (~3 turns each on average)."""
    rng = np.random.default_rng(np.random.PCG64(seed))
    vocab = np.array([f"w{i:04d}" for i in range(_VOCAB_SIZE)])
    tools = np.array([f"tool{i:02d}" for i in range(_N_TOOLS)])
    # Zipf(a=1.5) popularity over the 50 tools, deterministic ranking
    tool_p = 1.0 / np.power(np.arange(1, _N_TOOLS + 1), 1.5)
    tool_p /= tool_p.sum()

    # turn counts: 1 + Zipf(a=2.2) clipped to [1, 64]
    n_turns = np.minimum(1 + rng.zipf(2.2, size=n_convs), 64)
    total = int(n_turns.sum())

    conv_idx = np.repeat(np.arange(n_convs), n_turns)
    turn_idx = (np.arange(total)
                - np.repeat(np.cumsum(n_turns) - n_turns, n_turns)).astype(np.int32)

    # role Markov chain, vectorized over conversations via per-turn sampling
    role_idx = np.zeros(total, dtype=np.int64)
    u = rng.random(total)
    starts = np.cumsum(n_turns) - n_turns
    cum = np.cumsum(_ROLE_TRANSITIONS, axis=1)
    prev = np.zeros(n_convs, dtype=np.int64)  # start at "user"
    max_t = int(n_turns.max())
    for t in range(max_t):
        live = n_turns > t
        pos = starts[live] + t
        if t == 0:
            role_idx[pos] = 0
        else:
            cur = (u[pos][:, None] > cum[prev[live]]).sum(axis=1)
            role_idx[pos] = cur
        prev[live] = role_idx[pos]

    # tool: ~70% null, else Zipf-popular tool name
    has_tool = rng.random(total) >= 0.70
    tool_choice = rng.choice(_N_TOOLS, size=total, p=tool_p)
    tool_vals = np.where(has_tool, tools[tool_choice], None)

    words = vocab[rng.integers(0, _VOCAB_SIZE, size=(total, 6))]
    text = np.array([
        f"t{c}-{t} " + " ".join(ws)
        for c, t, ws in zip(conv_idx.tolist(), turn_idx.tolist(), words.tolist())
    ])

    ts = _EPOCH_US + conv_idx.astype(np.int64) * 3_600_000_000 + \
        turn_idx.astype(np.int64) * 7_000_000

    return pa.table({
        "conv_id": pa.array([f"conv{i:08d}" for i in conv_idx.tolist()]),
        "turn_idx": pa.array(turn_idx, type=pa.int32()),
        "role": pa.array(np.array(ROLES)[role_idx]),
        "text": pa.array(text),
        "tool": pa.array(tool_vals.tolist(), type=pa.string()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
    }).cast(TRANSCRIPT_SCHEMA)


def write_synth_transcripts(out_dir: str, n_convs: int, seed: int = 42,
                            num_files: int = 8) -> str:
    """Write the synthetic table as multi-file Parquet (one file per shard so
    block counts exceed the highest benchmarked parallelism). Idempotent:
    skips if a completion marker exists (resumable-output convention)."""
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    table = synth_transcripts_table(n_convs, seed)
    n = table.num_rows
    bounds = np.linspace(0, n, num_files + 1).astype(int)
    for i in range(num_files):
        pq.write_table(table.slice(bounds[i], bounds[i + 1] - bounds[i]),
                       os.path.join(out_dir, f"part-{i:05d}.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def read_transcripts(path: str, columns: list[str] | None = None,
                     **kwargs) -> "ray.data.Dataset":
    """Engine-canonical source: Parquet transcripts with column pruning.

    Replaces the reference's CSV adjacency source
    (``/root/reference/src/stream.rs:23-55``) as the primary input; pass
    ``columns`` so only the needed columns leave storage.
    """
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def write_transcripts_jsonl(table: pa.Table, out_dir: str,
                            num_files: int = 4) -> str:
    """Test/interop helper: shard a transcript table to JSONL files.
    ``ts`` is serialized as int64 microseconds since epoch (lossless)."""
    import pyarrow.compute as pc
    os.makedirs(out_dir, exist_ok=True)
    t = table.set_column(
        table.schema.get_field_index("ts"), "ts",
        pc.cast(table["ts"], pa.int64()))
    df = t.to_pandas()
    n = len(df)
    bounds = np.linspace(0, n, num_files + 1).astype(int)
    for i in range(num_files):
        df.iloc[bounds[i]:bounds[i + 1]].to_json(
            os.path.join(out_dir, f"part-{i:05d}.jsonl"),
            orient="records", lines=True)
    return out_dir


def read_transcripts_jsonl(path: str, **kwargs) -> "ray.data.Dataset":
    """JSONL transcript source: ``ray.data.read_json`` + a per-batch cast
    onto ``TRANSCRIPT_SCHEMA`` (``ts`` accepted as int64 µs or native
    timestamp; ``tool`` nullable). Keeps the pipeline schema-identical to
    the Parquet source so every downstream stage is source-agnostic."""
    import pyarrow.compute as pc
    ds = ray.data.read_json(path, file_extensions=["jsonl", "json"],
                            **kwargs)

    def to_schema(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return TRANSCRIPT_SCHEMA.empty_table()
        ts = batch["ts"]
        if not pa.types.is_timestamp(ts.type):
            ts = pc.cast(pc.cast(ts, pa.int64()), pa.timestamp("us"))
        tool = batch["tool"] if "tool" in batch.column_names \
            else pa.nulls(len(batch), pa.string())
        return pa.table({
            "conv_id": pc.cast(batch["conv_id"], pa.string()),
            "turn_idx": pc.cast(batch["turn_idx"], pa.int32()),
            "role": pc.cast(batch["role"], pa.string()),
            "text": pc.cast(batch["text"], pa.string()),
            "tool": pc.cast(tool, pa.string()),
            "ts": ts,
        }).cast(TRANSCRIPT_SCHEMA)

    return ds.map_batches(to_schema, batch_format="pyarrow")
