from cuttana_ray.sources.adjacency import (
    ADJACENCY_SCHEMA,
    adjacency_table,
    csr_batch,
    from_adjacency_list,
    read_adjacency_text,
)
from cuttana_ray.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    read_transcripts,
    read_transcripts_jsonl,
    synth_transcripts_table,
    write_synth_transcripts,
    write_transcripts_jsonl,
)

__all__ = [
    "ADJACENCY_SCHEMA",
    "TRANSCRIPT_SCHEMA",
    "adjacency_table",
    "csr_batch",
    "from_adjacency_list",
    "read_adjacency_text",
    "read_transcripts",
    "read_transcripts_jsonl",
    "synth_transcripts_table",
    "write_synth_transcripts",
    "write_transcripts_jsonl",
]
