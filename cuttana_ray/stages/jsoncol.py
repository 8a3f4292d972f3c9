"""JSON-string column parsing (SURVEY.md §2.4 string / scalar-function
row — absent from the reference, whose records are plain adjacency text,
``/root/reference/src/graph.rs``; engine-designed).

``json_extract_scalars`` turns a column of JSON object strings (e.g. the
``events.props`` payload) into typed columns with NO Python-level row
loop: valid JSON cannot contain an unescaped newline inside a string
literal (RFC 8259 §7 requires ``\\n`` escapes), so the batch's values
newline-join into one NDJSON buffer — a single ``pyarrow.compute
.binary_join`` kernel call — that ``pyarrow.json.read_json`` block-parses
in C++. Per 100 TB discipline the parse cost is per-batch vectorized
native code and the stage carries only the requested fields plus ``keep``
columns into downstream exchanges.
"""

from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.json as pj
import ray.data


def _parse_json_column(col: "pa.ChunkedArray | pa.Array",
                       schema: pa.Schema) -> pa.Table:
    """Block-parse a string column of JSON objects against ``schema``.
    Nulls (and empty strings) yield all-null rows. One C++ parse per call."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.cast(col, pa.string())
    # null / '' → '{}' so row alignment with the batch is preserved
    col = pc.if_else(
        pc.or_kleene(pc.is_null(col), pc.equal(col, "")),
        pa.scalar("{}", pa.string()), col)
    n = len(col)
    as_list = pa.ListArray.from_arrays(
        pa.array([0, n], pa.int32()), col)
    joined = pc.binary_join(as_list, "\n")[0].as_py()
    parsed = pj.read_json(
        io.BytesIO(joined.encode("utf-8")),
        parse_options=pj.ParseOptions(
            explicit_schema=schema, unexpected_field_behavior="ignore"))
    if parsed.num_rows != n:  # blank lines can only come from corrupt input
        raise ValueError(
            f"JSON column parse produced {parsed.num_rows} rows for {n} "
            "input values — a value contains a raw newline (invalid JSON)")
    # read_json may drop fields absent from the data; re-align to schema
    cols = []
    for f in schema:
        if f.name in parsed.column_names:
            cols.append(pc.cast(parsed[f.name], f.type))
        else:
            cols.append(pa.nulls(n, f.type))
    return pa.table(cols, schema=schema)


def json_extract_scalars(ds: "ray.data.Dataset", json_col: str,
                         fields: dict[str, pa.DataType],
                         keep: list[str] | None = None) -> "ray.data.Dataset":
    """Extract typed top-level fields from a JSON-string column.

    ``fields`` maps field name → Arrow type; missing keys and nulls become
    null. ``keep`` columns pass through unchanged. The JSON column itself
    is dropped (re-request it via ``keep`` to retain the raw payload).
    """
    keep = list(keep or [])
    schema = pa.schema(list(fields.items()))

    def fn(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [(k, batch.schema.field(k).type) for k in keep]
            + list(fields.items()))
        if len(batch) == 0:
            return out_schema.empty_table()
        parsed = _parse_json_column(batch[json_col], schema)
        cols = [batch[k] for k in keep] + [parsed[f.name] for f in schema]
        return pa.table(cols, schema=out_schema)

    return ds.map_batches(fn, batch_format="pyarrow")
