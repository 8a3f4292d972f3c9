"""End-to-end training-data curation funnel.

Composes the repo's text-pipeline operators the way a production corpus
curation run chains them (the CCNet / RefinedWeb recipe shape):

    all docs → language filter → quality filter → exact dedup keep
             → benchmark decontamination

and reports the survivor count after each cumulative stage. Each stage's
semantics are exactly the already-SQL-checked operator's (``lang_id``,
``quality_scores``, ``exact_dedup``, ``decontaminate``), so the whole
funnel replays in one DuckDB query.

Scale shape: four hash joins on ``doc_id`` line the per-doc flags up
(each side is a per-doc row, never wider than a few columns); the funnel
itself folds to 5 integers via per-batch partial counts — no driver
materialization of any per-doc table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

STAGES = ["all", "lang_en", "quality", "exact_dedup", "decontam"]


def curation_funnel(docs: "ray.data.Dataset", quality_min: float = 0.5,
                    bench_mod: int = 97, text_col: str = "text",
                    id_col: str = "doc_id") -> pa.Table:
    """Cumulative survivor counts through the curation stages.

    * ``lang_en``: ``lang_id`` predicts 'en';
    * ``quality``: composite ``quality_scores`` ≥ ``quality_min``;
    * ``exact_dedup``: the doc is its text group's min-id representative;
    * ``decontam``: zero 5-token shingle hits against the deterministic
      eval set ``doc_id % bench_mod == 0`` (eval members themselves hit
      their own shingles and drop — the realistic outcome).

    Output: ``(stage_idx:int64, stage:string, n_docs:int64)``.
    """
    from cuttana_ray.functions.decontam import (benchmark_shingles,
                                                decontaminate)
    from cuttana_ray.functions.dedup import exact_dedup
    from cuttana_ray.functions.textstats import lang_id, quality_scores
    from cuttana_ray.util import safe_join

    lang = lang_id(docs, text_col, id_col) \
        .select_columns([id_col, "lang_pred"])
    qual = quality_scores(docs, text_col, id_col) \
        .select_columns([id_col, "quality"])
    keep = exact_dedup(docs, text_col, id_col) \
        .select_columns([id_col]) \
        .map_batches(lambda t: t.append_column(
            "is_rep", pa.array(np.ones(len(t), np.int64))),
            batch_format="pyarrow")

    def bench_only(t: pa.Table) -> pa.Table:
        if len(t) == 0 or id_col not in t.column_names:
            return t
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(ids % bench_mod == 0))

    bset = benchmark_shingles(
        docs.map_batches(bench_only, batch_format="pyarrow"), n=5)
    decon = decontaminate(docs, bset, n=5) \
        .select_columns([id_col, "n_hits"])

    j = safe_join(lang, qual, join_type="inner", num_partitions=8,
                  on=(id_col,))
    j = safe_join(j, decon, join_type="inner", num_partitions=8,
                  on=(id_col,))
    j = safe_join(j, keep, join_type="left_outer", num_partitions=8,
                  on=(id_col,))

    part_schema = pa.schema([("i", pa.int64()), ("n", pa.int64())])

    def partial(t: pa.Table, _qmin=quality_min) -> pa.Table:
        if len(t) == 0 or "lang_pred" not in t.column_names:
            return part_schema.empty_table()
        f_lang = pc.equal(t["lang_pred"], "en").to_numpy(
            zero_copy_only=False)
        f_q = t["quality"].to_numpy(zero_copy_only=False) >= _qmin
        f_d = pc.fill_null(t["is_rep"], 0).to_numpy(
            zero_copy_only=False).astype(bool)
        f_c = t["n_hits"].to_numpy(zero_copy_only=False) == 0
        cum = np.array([len(t),
                        f_lang.sum(),
                        (f_lang & f_q).sum(),
                        (f_lang & f_q & f_d).sum(),
                        (f_lang & f_q & f_d & f_c).sum()], np.int64)
        return pa.table({"i": pa.array(np.arange(5, dtype=np.int64)),
                         "n": pa.array(cum)})

    counts = np.zeros(5, np.int64)
    for b in j.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(b):
            np.add.at(counts, b["i"].to_numpy(zero_copy_only=False),
                      b["n"].to_numpy(zero_copy_only=False))
    return pa.table({
        "stage_idx": pa.array(np.arange(5, dtype=np.int64)),
        "stage": pa.array(STAGES, pa.string()),
        "n_docs": pa.array(counts, pa.int64())})
