"""PII detection / redaction over a text column (SURVEY.md §2.4
engine-designed category: large-scale training-data pipelines scrub
contact details before anything else sees the text; absent from the
reference, whose payloads are graph edges).

Fully vectorized, shuffle-free, embarrassingly parallel: per batch one
``pyarrow.compute.count_substring_regex`` + one ``replace_substring_regex``
per pattern — both RE2 under the hood, the same engine DuckDB's
``regexp_matches`` family uses, so the op is oracle-checkable character
for character. Patterns apply in a fixed order on the progressively
redacted text (an email is counted once, not re-matched as a phone
number). No Python row loops; nothing leaves the stage but the cleaned
text and three int64 counts per row.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# Ordered (name, RE2 pattern). Conservative on purpose: at 100 TB a few
# false positives are cheaper than leaked contact data.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
    # SSN before phone: the looser phone pattern would otherwise consume
    # the 123-45-6789 shape first
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("phone", r"\+?[0-9][0-9 ()\-]{7,}[0-9]"),
]


def scrub_pii(ds: "ray.data.Dataset", text_col: str = "text",
              id_col: str = "doc_id",
              replacement: str = "[REDACTED]") -> "ray.data.Dataset":
    """Redact emails, phone numbers, and SSNs from ``text_col``.

    Output: ``(id_col, text_clean, n_email, n_phone, n_ssn)``. Counts are
    per-pattern match counts on the text as it stood when that pattern
    ran (fixed order ``PII_PATTERNS``), so the triple is deterministic.
    """
    def scrub(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [(id_col, batch.schema.field(id_col).type
              if id_col in batch.column_names else pa.int64()),
             ("text_clean", pa.string())]
            + [(f"n_{name}", pa.int64()) for name, _ in PII_PATTERNS])
        if len(batch) == 0:
            return out_schema.empty_table()
        text = pc.cast(batch[text_col], pa.string())
        cols: dict[str, object] = {id_col: batch[id_col]}
        counts = []
        for name, pat in PII_PATTERNS:
            counts.append(pc.cast(
                pc.count_substring_regex(text, pat), pa.int64()))
            text = pc.replace_substring_regex(text, pat, replacement)
        cols["text_clean"] = text
        for (name, _), c in zip(PII_PATTERNS, counts):
            cols[f"n_{name}"] = c
        return pa.table(cols).cast(out_schema)

    return ds.map_batches(scrub, batch_format="pyarrow")
