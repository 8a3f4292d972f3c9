"""Item–item co-occurrence similarity (the collaborative-filtering
building block): for every unordered pair of items engaged by the same
group (user / customer / basket), the number of shared groups and the
cosine similarity ``co / sqrt(n1 · n2)`` over the binary group-item
incidence matrix.

Scale plan: the quadratic step — expanding each group's item set into
pairs — runs inside key-aligned blocks (``stages/keyblocks.py``),
vectorized across every group of a block and pre-combined before the single
(p1, p2) exchange; per-item totals ride a tiny groupby and return via two
distributed hash joins, so no driver materialization anywhere. Pair volume
is inherently Σ k_g² over group sizes — the classic mitigation (cap or
downsample hyper-connected groups) is a semantics change, so it is left to
callers; ``min_support`` prunes the long singleton tail after the exchange.

The reference engine has nothing in this family (its closest shape is the
neighbour-set scoring inside partitioning, ``/root/reference/src/core.rs``);
this extends the SURVEY.md §2.4 join/aggregation families and the
LLM-data-pipeline surface (user–item graphs for data curation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from cuttana_ray.util import safe_join



def cooccurrence_cosine(ds: "ray.data.Dataset", group: str, item: str,
                        min_support: int = 2) -> "ray.data.Dataset":
    """(p1, p2, co, cosine) for item pairs sharing ≥ ``min_support``
    groups; ``cosine = co / sqrt(n_p1 · n_p2)`` with n = the item's
    distinct-group count. Input need not be distinct — a pre-combined
    (group, item) distinct is the first step."""
    from cuttana_ray.stages.keyblocks import _pairs_and_counts
    from cuttana_ray.util import drop_empty_blocks

    co, counts = _pairs_and_counts(ds, group, item)
    if min_support > 1:
        co = co.filter(expr=f"co >= {int(min_support)}")
    co = drop_empty_blocks(co)
    counts = drop_empty_blocks(counts)

    c1 = counts.rename_columns({"i": "p1", "n_g": "_n1"})
    c2 = counts.rename_columns({"i": "p2", "n_g": "_n2"})
    joined = safe_join(safe_join(co, c1, join_type="inner", num_partitions=8, on=("p1",)), c2, join_type="inner", num_partitions=8, on=("p2",))

    def finish(t: pa.Table) -> pa.Table:
        schema = pa.schema([("p1", pa.int64()), ("p2", pa.int64()),
                            ("co", pa.int64()), ("cosine", pa.float64())])
        if len(t) == 0:
            return schema.empty_table()
        co_ = t["co"].to_numpy(zero_copy_only=False).astype(np.int64)
        n1 = t["_n1"].to_numpy(zero_copy_only=False).astype(np.int64)
        n2 = t["_n2"].to_numpy(zero_copy_only=False).astype(np.int64)
        cos = co_ / np.sqrt((n1 * n2).astype(np.float64))
        return pa.table({"p1": t["p1"], "p2": t["p2"],
                         "co": pa.array(co_),
                         "cosine": pa.array(cos)}).cast(schema)

    return joined.map_batches(finish, batch_format="pyarrow")
