"""End-to-end training-data curation funnel.

Composes the repo's text-pipeline operators the way a production corpus
curation run chains them (the CCNet / RefinedWeb recipe shape):

    all docs → language filter → quality filter → exact dedup keep
             → benchmark decontamination

and reports the survivor count after each cumulative stage. Each stage's
semantics are exactly the already-SQL-checked operator's (``lang_id``,
``quality_scores``, ``exact_dedup``, ``decontaminate``), so the whole
funnel replays in one DuckDB query.

Scale shape: the language/quality/contamination flags all derive from the
same document batch, so ONE fused ``map_batches`` pass computes them with
zero joins; only the exact-dedup representative set needs a global view,
and it merges back via union + ``groupby``-Max (a task-based aggregate
exchange — measured ~1-2.5 s cheaper per exchange than a hash-shuffle
join's aggregator pool at any input size). The funnel itself folds to 5
integers via per-batch partial counts — no driver materialization of any
per-doc table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

STAGES = ["all", "lang_en", "quality", "exact_dedup", "decontam"]

# Row gate for pinning the full documents dataset across the funnel's
# three consumers; past this, branches recompute from the lazy read.
_FUNNEL_PIN_MAX_ROWS = 50_000_000


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
    import ray
    from ray.data.aggregate import Max

    from cuttana_ray.functions.decontam import (_batch_shingles,
                                                benchmark_shingles)
    from cuttana_ray.functions.dedup import exact_dedup
    from cuttana_ray.functions.textstats import _LangId, _QualityScorer

    # Consumed by 3 branches below. Pinning the corpus (incl. text) is
    # size-gated like every other multi-consumer cache in the package:
    # under the gate one materialize beats three re-reads; above it we
    # stream and let each branch re-execute the (column-pruned) read.
    if docs.count() <= _FUNNEL_PIN_MAX_ROWS:
        docs = docs.materialize()

    def bench_only(t: pa.Table) -> pa.Table:
        if len(t) == 0 or id_col not in t.column_names:
            return t
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(ids % bench_mod == 0))

    bset = benchmark_shingles(
        docs.map_batches(bench_only, batch_format="pyarrow"), n=5)
    set_ref = ray.put(bset)

    flag_schema = pa.schema([
        (id_col, pa.int64()), ("lang_ok", pa.int64()),
        ("quality", pa.float64()), ("n_hits", pa.int64()),
        ("is_rep", pa.int64())])

    # ONE fused pass computes every per-batch flag (lang, quality,
    # contamination) — the three hash joins the old shape paid to line
    # these up were pure exchange fixed cost, since each side was a
    # per-doc row of the very same batch
    def flags(batch: pa.Table, _lang=_LangId(text_col, id_col),
              _qual=_QualityScorer(text_col, id_col)) -> pa.Table:
        if len(batch) == 0 or text_col not in batch.column_names:
            return flag_schema.empty_table()
        lang_t = _lang(batch)
        qual_t = _qual(batch)
        rows, sh = _batch_shingles(batch, text_col, 5)
        hits = np.zeros(len(batch), dtype=np.int64)
        if len(rows):
            isin = pc.is_in(sh, value_set=ray.get(set_ref)) \
                .to_numpy(zero_copy_only=False)
            np.add.at(hits, rows, isin.astype(np.int64))
        return pa.table({
            id_col: pc.cast(batch[id_col], pa.int64()),
            "lang_ok": pc.cast(pc.equal(lang_t["lang_pred"], "en"),
                               pa.int64()),
            "quality": qual_t["quality"],
            "n_hits": pa.array(hits),
            "is_rep": pa.array(np.zeros(len(batch), np.int64)),
        }).cast(flag_schema)

    def rep_rows(t: pa.Table) -> pa.Table:
        if len(t) == 0 or id_col not in t.column_names:
            return flag_schema.empty_table()
        n = len(t)
        return pa.table({
            id_col: pc.cast(t[id_col], pa.int64()),
            "lang_ok": pa.array(np.zeros(n, np.int64)),
            "quality": pa.array(np.zeros(n, np.float64)),
            "n_hits": pa.array(np.zeros(n, np.int64)),
            "is_rep": pa.array(np.ones(n, np.int64)),
        }).cast(flag_schema)

    # dedup representatives merge by union + groupby-Max instead of the
    # old left join: every flag is ≥ 0 with the rep rows contributing 0
    # (and vice versa), so Max reassembles the per-doc row exactly —
    # one task-based aggregate exchange, zero hash-join aggregator pools
    keep = exact_dedup(docs, text_col, id_col).select_columns([id_col]) \
        .map_batches(rep_rows, batch_format="pyarrow")
    j = docs.map_batches(flags, batch_format="pyarrow").union(keep) \
        .groupby(id_col).aggregate(
            Max("lang_ok", alias_name="lang_ok"),
            Max("quality", alias_name="quality"),
            Max("n_hits", alias_name="n_hits"),
            Max("is_rep", alias_name="is_rep"))

    part_schema = pa.schema([("i", pa.int64()), ("n", pa.int64())])

    def partial(t: pa.Table, _qmin=quality_min) -> pa.Table:
        if len(t) == 0 or "lang_ok" not in t.column_names:
            return part_schema.empty_table()
        f_lang = t["lang_ok"].to_numpy(zero_copy_only=False) == 1
        f_q = t["quality"].to_numpy(zero_copy_only=False) >= _qmin
        f_d = t["is_rep"].to_numpy(zero_copy_only=False) == 1
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


def source_quality_calibration(docs: "ray.data.Dataset", q: float = 0.75,
                               source_col: str = "source",
                               text_col: str = "text",
                               id_col: str = "doc_id") -> pa.Table:
    """Per-source quality-threshold calibration — the "keep the top
    (1−q) quantile of each source" step a curation pipeline runs so one
    global threshold doesn't wipe out whole domains (low-resource
    sources score systematically lower on surface-quality heuristics):
    for each source, the exact ``q``-quantile of the composite
    ``quality_scores`` signal and the keep statistics against that
    source's OWN threshold.

    Scale shape: one fused pass emits (source, quality); the per-source
    threshold is an exact grouped quantile (one exchange); thresholds
    are O(#sources) so the keep-count pass broadcasts them and folds to
    per-batch partials + one tiny groupby. Output sorted by source:
    ``(source, q_threshold, n_docs, n_keep, keep_rate)``; the compare
    uses the UNROUNDED threshold (both sides round display values only).
    """
    import ray
    from ray.data.aggregate import Sum

    from cuttana_ray.functions.quantiles import grouped_float_quantiles
    from cuttana_ray.functions.textstats import _QualityScorer
    from cuttana_ray.util import drop_empty_blocks, local_table

    scorer = _QualityScorer(text_col, id_col)

    def sq(t: pa.Table) -> pa.Table:
        sch = pa.schema([("source", pa.string()),
                         ("quality", pa.float64())])
        if len(t) == 0 or text_col not in t.column_names:
            return sch.empty_table()
        return pa.table({
            "source": pc.cast(t[source_col], pa.string()),
            "quality": scorer(t)["quality"]}).cast(sch)

    sqd = docs.map_batches(sq, batch_format="pyarrow").materialize()
    thr = local_table(drop_empty_blocks(
        grouped_float_quantiles(sqd, "source", "quality", [q])))
    empty = pa.table({"source": pa.array([], pa.string()),
                      "q_threshold": pa.array([], pa.float64()),
                      "n_docs": pa.array([], pa.int64()),
                      "n_keep": pa.array([], pa.int64()),
                      "keep_rate": pa.array([], pa.float64())})
    if thr is None or len(thr) == 0:
        return empty
    order = pc.sort_indices(thr, sort_keys=[("source", "ascending")])
    thr = thr.take(order)
    src_arr = thr["source"].combine_chunks()
    thr_vals = thr["value"].to_numpy(zero_copy_only=False)
    ref = ray.put((src_arr, thr_vals))

    def partial(t: pa.Table) -> pa.Table:
        sch = pa.schema([("source", pa.string()), ("n", pa.int64()),
                         ("k", pa.int64())])
        if len(t) == 0 or "source" not in t.column_names:
            return sch.empty_table()
        sa, tv = ray.get(ref)
        idx_a = pc.index_in(t["source"].combine_chunks(), value_set=sa)
        # a null/unmatched source yields a null index — drop those rows
        # (exactly what the join-based shape did) instead of crashing
        # on the numpy fancy-index below
        ok = pc.is_valid(idx_a)
        if not pc.all(ok).as_py():
            t = t.filter(ok)
            idx_a = idx_a.filter(ok)
            if len(t) == 0:
                return sch.empty_table()
        idx = idx_a.to_numpy(zero_copy_only=False)
        qv = t["quality"].to_numpy(zero_copy_only=False)
        keep = (qv >= tv[idx]).astype(np.int64)
        n = np.bincount(idx, minlength=len(tv)).astype(np.int64)
        k = np.bincount(idx, weights=keep,
                        minlength=len(tv)).astype(np.int64)
        live = n > 0
        return pa.table({
            "source": sa.take(pa.array(np.nonzero(live)[0])),
            "n": pa.array(n[live]), "k": pa.array(k[live])}).cast(sch)

    agg = local_table(drop_empty_blocks(
        sqd.map_batches(partial, batch_format="pyarrow")
        .groupby("source").aggregate(Sum("n", alias_name="n"),
                                     Sum("k", alias_name="k"))))
    if agg is None or len(agg) == 0:
        return empty
    order = pc.sort_indices(agg, sort_keys=[("source", "ascending")])
    agg = agg.take(order)
    n = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    k = agg["k"].to_numpy(zero_copy_only=False).astype(np.int64)

    def r6(x):
        return pc.round(pa.array(np.asarray(x, np.float64)), 6,
                        round_mode="half_towards_infinity")

    return pa.table({
        "source": agg["source"],
        "q_threshold": r6(thr_vals),
        "n_docs": pa.array(n),
        "n_keep": pa.array(k),
        "keep_rate": r6(k / np.maximum(n, 1))})
