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
                        min_support: int = 2,
                        precomputed=None) -> "ray.data.Dataset":
    """(p1, p2, co, cosine) for item pairs sharing ≥ ``min_support``
    groups; ``cosine = co / sqrt(n_p1 · n_p2)`` with n = the item's
    distinct-group count. Input need not be distinct — a pre-combined
    (group, item) distinct is the first step. ``precomputed`` accepts an
    existing ``_pairs_and_counts`` result (co, counts) so callers running
    several analyses over one incidence pay the wedge plan once."""
    from cuttana_ray.stages.keyblocks import _pairs_and_counts
    from cuttana_ray.util import drop_empty_blocks

    co, counts = precomputed if precomputed is not None \
        else _pairs_and_counts(ds, group, item)
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

def bipartite_motifs(ds: "ray.data.Dataset", group: str, item: str,
                     precomputed=None) -> pa.Table:
    """Butterfly census of the bipartite (group, item) incidence graph —
    the standard bipartite motif primitive (a butterfly is a 2×2 biclique;
    a caterpillar is a 3-path). Returns a one-row table
    ``(butterflies, caterpillars, bcc)`` with the bipartite clustering
    coefficient ``bcc = 4·butterflies / caterpillars`` (0 when there are
    no caterpillars).

    Identities (exact, integer):
      butterflies  = Σ_{i1<i2} C(co(i1,i2), 2)      — co = shared groups;
                     each butterfly is counted once, by its item pair.
      caterpillars = Σ_{(g,i)∈E} (deg(g)−1)·(deg(i)−1)
                     — each 3-path once, by its center edge.

    Scale plan: item-pair codegrees ride the shared wedge plan
    (``stages/keyblocks._pairs_and_counts`` — one sort, per-block
    vectorized expansion, pre-combined single exchange); degrees are
    per-block partial counts + one small groupby each; the caterpillar
    sum is two distributed hash joins of the O(V)-row degree tables onto
    the distinct edge table, combined per batch. Nothing but the final
    two scalars reaches the driver.
    """
    from ray.data.aggregate import Sum

    from cuttana_ray.stages.edges import dedup_weighted
    from cuttana_ray.stages.keyblocks import _pairs_and_counts
    from cuttana_ray.util import drop_empty_blocks

    pairs, icounts = precomputed if precomputed is not None \
        else _pairs_and_counts(ds, group, item)

    def bf_partial(t: pa.Table) -> pa.Table:
        sch = pa.schema([("bf", pa.int64())])
        if len(t) == 0 or "co" not in t.column_names:
            return sch.empty_table()
        co = t["co"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"bf": pa.array(
            [int((co * (co - 1) // 2).sum())], pa.int64())})

    bf_agg = pairs.map_batches(bf_partial, batch_format="pyarrow").sum("bf")
    butterflies = int(bf_agg or 0)

    # distinct (group, item) edges via the sort-based exchange (weight is
    # the per-block multiplicity — discarded; presence is what matters)
    def tag(t: pa.Table) -> pa.Table:
        sch = pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                         ("weight", pa.int64())])
        if len(t) == 0 or group not in t.column_names:
            return sch.empty_table()
        out = pa.table({"src": pc.cast(t[group], pa.int64()),
                        "dst": pc.cast(t[item], pa.int64())}) \
            .group_by(["src", "dst"]).aggregate([])
        return pa.table({"src": out["src"], "dst": out["dst"],
                         "weight": pa.array(np.ones(len(out), np.int64))
                         }).cast(sch)

    edges = drop_empty_blocks(dedup_weighted(
        ds.map_batches(tag, batch_format="pyarrow"))) \
        .select_columns(["src", "dst"])

    def gdeg_partial(t: pa.Table) -> pa.Table:
        sch = pa.schema([("src", pa.int64()), ("c", pa.int64())])
        if len(t) == 0 or "src" not in t.column_names:
            return sch.empty_table()
        return t.select(["src"]).group_by(["src"]) \
            .aggregate([([], "count_all")]) \
            .rename_columns(["src", "c"]).cast(sch)

    gdeg = edges.map_batches(gdeg_partial, batch_format="pyarrow") \
        .groupby("src").aggregate(Sum("c", alias_name="_dg"))
    ideg = icounts.rename_columns({"i": "dst", "n_g": "_di"})

    j = safe_join(safe_join(edges, drop_empty_blocks(gdeg),
                            join_type="inner", num_partitions=4,
                            on=("src",)),
                  drop_empty_blocks(ideg), join_type="inner",
                  num_partitions=4, on=("dst",))

    def cat_partial(t: pa.Table) -> pa.Table:
        sch = pa.schema([("ct", pa.int64())])
        if len(t) == 0 or "_dg" not in t.column_names:
            return sch.empty_table()
        dg = t["_dg"].to_numpy(zero_copy_only=False).astype(np.int64)
        di = t["_di"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"ct": pa.array(
            [int(((dg - 1) * (di - 1)).sum())], pa.int64())})

    ct_agg = j.map_batches(cat_partial, batch_format="pyarrow").sum("ct")
    caterpillars = int(ct_agg or 0)

    bcc = round(4.0 * butterflies / caterpillars, 6) if caterpillars \
        else 0.0
    return pa.table({"butterflies": pa.array([butterflies], pa.int64()),
                     "caterpillars": pa.array([caterpillars], pa.int64()),
                     "bcc": pa.array([bcc], pa.float64())})
