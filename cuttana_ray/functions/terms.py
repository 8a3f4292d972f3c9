"""Vocabulary-building text operators: global term frequencies and TF-IDF.

The term-extraction hot path is vectorized end-to-end: polars'
``str.extract_all`` (Rust regex over the whole column) → ``explode`` →
in-batch ``group_by`` partial counts, so the single
``groupby(term)`` / ``groupby(doc, term)`` exchange moves distinct-term
partials, never raw token streams. No Python loops over rows or tokens.

Scale notes:
* ``term_counts`` pre-aggregates per batch; hot terms (stopwords) arrive
  at the exchange as one row per block, the classic combiner discipline.
* ``top_terms`` prunes each post-aggregation block to its local top-k
  before a final k·#blocks-row sort — never a global sort of the vocab.
* ``doc_tfidf`` joins the (doc, term, tf) table with the (term, df) table
  via Ray's hash join keyed on term — the vocabulary is unbounded at
  100 TB, so df is NEVER broadcast or collected driver-side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from cuttana_ray.util import safe_join

_DEFAULT_PATTERN = "[a-z]+"


def _extract_fn(text_col: str, id_col: str | None, pattern: str):
    def fn(batch: pa.Table) -> pa.Table:
        import polars as pl
        fields = ([(id_col, pa.int64())] if id_col else []) + \
            [("term", pa.string()), ("tf", pa.int64())]
        schema = pa.schema(fields)
        if len(batch) == 0 or text_col not in batch.column_names:
            return schema.empty_table()
        cols = {"text": pc.fill_null(pc.cast(batch[text_col], pa.string()),
                                     "")}
        if id_col:
            cols[id_col] = pc.cast(batch[id_col], pa.int64())
        df = pl.from_arrow(pa.table(cols))
        toks = df.with_columns(
            pl.col("text").str.to_lowercase().str.extract_all(pattern)
            .alias("term")).drop("text").explode("term") \
            .drop_nulls("term")
        keys = ([id_col] if id_col else []) + ["term"]
        counts = toks.group_by(keys).len(name="tf")
        out = counts.to_arrow()
        cols = {}
        if id_col:
            cols[id_col] = pc.cast(out[id_col], pa.int64())
        cols["term"] = pc.cast(out["term"], pa.string())
        cols["tf"] = pc.cast(out["tf"], pa.int64())
        return pa.table(cols).cast(schema)
    return fn


def term_counts(ds: "ray.data.Dataset", text_col: str = "text",
                pattern: str = _DEFAULT_PATTERN) -> "ray.data.Dataset":
    """Global term frequencies ``(term, tf)`` (terms = lowercase regex
    matches, default ASCII words)."""
    partial = ds.map_batches(_extract_fn(text_col, None, pattern),
                             batch_format="pyarrow")
    return partial.groupby("term").aggregate(Sum("tf", alias_name="tf"))


def top_terms(ds: "ray.data.Dataset", k: int = 50, text_col: str = "text",
              pattern: str = _DEFAULT_PATTERN) -> "ray.data.Dataset":
    """The ``k`` most frequent terms, ties broken by term (ascending) —
    per-block top-k pruning before one tiny final sort."""
    counts = term_counts(ds, text_col, pattern)

    def local_topk(t: pa.Table) -> pa.Table:
        if len(t) <= k:
            return t
        order = pc.sort_indices(t, sort_keys=[("tf", "descending"),
                                              ("term", "ascending")])
        return t.take(order[:k])

    pruned = counts.map_batches(local_topk, batch_format="pyarrow")
    return pruned.sort(["tf", "term"], descending=[True, False]).limit(k)


def _bigram_fn(text_col: str):
    """Per-batch (w1, w2, tf) partial counts of consecutive-token pairs.

    Fully vectorized: one Arrow ``split_pattern`` over the column, then the
    bigram index pairs are computed from the list offsets (per-list aranges
    — no Python loop over rows or tokens), and counted with an in-batch
    polars ``group_by`` so the global exchange moves distinct-pair partials.
    """
    schema = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                        ("tf", pa.int64())])

    def fn(batch: pa.Table) -> pa.Table:
        import polars as pl
        if len(batch) == 0 or text_col not in batch.column_names:
            return schema.empty_table()
        text = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
        arr = pc.split_pattern(text, " ")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        flat = arr.flatten()
        offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.maximum(np.diff(offsets) - 1, 0)
        total = int(counts.sum())
        if total == 0:
            return schema.empty_table()
        base = np.repeat(offsets[:-1], counts)
        within = np.arange(total, dtype=np.int64) - \
            np.repeat(np.cumsum(counts) - counts, counts)
        idx = base + within
        pairs = pa.table({"w1": flat.take(pa.array(idx)),
                          "w2": flat.take(pa.array(idx + 1))})
        out = pl.from_arrow(pairs).group_by(["w1", "w2"]) \
            .len(name="tf").to_arrow()
        return pa.table({"w1": pc.cast(out["w1"], pa.string()),
                         "w2": pc.cast(out["w2"], pa.string()),
                         "tf": pc.cast(out["tf"], pa.int64())}).cast(schema)
    return fn


def bigram_counts(ds: "ray.data.Dataset",
                  text_col: str = "text") -> "ray.data.Dataset":
    """Global counts of consecutive whitespace-token pairs ``(w1, w2, tf)``
    — the n-gram statistics pass of a training-data pipeline."""
    partial = ds.map_batches(_bigram_fn(text_col), batch_format="pyarrow")
    return partial.groupby(["w1", "w2"]).aggregate(Sum("tf", alias_name="tf"))


def top_bigrams(ds: "ray.data.Dataset", k: int = 50,
                text_col: str = "text") -> "ray.data.Dataset":
    """The ``k`` most frequent token bigrams, ties broken by (w1, w2)
    ascending — per-block top-k pruning before one tiny final sort."""
    counts = bigram_counts(ds, text_col)

    def local_topk(t: pa.Table) -> pa.Table:
        if len(t) <= k:
            return t
        order = pc.sort_indices(t, sort_keys=[("tf", "descending"),
                                              ("w1", "ascending"),
                                              ("w2", "ascending")])
        return t.take(order[:k])

    pruned = counts.map_batches(local_topk, batch_format="pyarrow")
    return pruned.sort(["tf", "w1", "w2"],
                       descending=[True, False, False]).limit(k)


def doc_term_counts(ds: "ray.data.Dataset", text_col: str = "text",
                    id_col: str = "doc_id",
                    pattern: str = _DEFAULT_PATTERN) -> "ray.data.Dataset":
    """Per-document term frequencies ``(doc_id, term, tf)``."""
    partial = ds.map_batches(_extract_fn(text_col, id_col, pattern),
                             batch_format="pyarrow")
    return partial.groupby([id_col, "term"]).aggregate(
        Sum("tf", alias_name="tf"))


def doc_tfidf_topk(ds: "ray.data.Dataset", k: int = 3, *,
                   text_col: str = "text", id_col: str = "doc_id",
                   pattern: str = _DEFAULT_PATTERN,
                   round_to: int = 6) -> "ray.data.Dataset":
    """Top-``k`` TF-IDF terms per document:
    ``tfidf = tf · ln(N / df)``, ties broken by term ascending.

    ``df`` (documents containing the term) comes from one
    ``groupby(term)`` aggregate over the per-doc table and joins back via
    Ray's hash join keyed on term — vocabulary never touches the driver.
    ``N`` is the document count (one small aggregate).
    """
    doc_tf = doc_term_counts(ds, text_col, id_col, pattern).materialize()
    n_docs = float(ds.count())

    def ones(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "term" not in t.column_names:
            return pa.schema([("term", pa.string()),
                              ("df", pa.int64())]).empty_table()
        return pa.table({"term": t["term"],
                         "df": pa.array(np.ones(len(t), np.int64))})

    df_tab = doc_tf.map_batches(ones, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("df", alias_name="df"))

    from cuttana_ray.util import drop_empty_blocks
    doc_tf = drop_empty_blocks(doc_tf)
    df_tab = drop_empty_blocks(df_tab)
    joined = safe_join(doc_tf, df_tab, join_type="inner", num_partitions=16,
                         on=("term",), right_suffix="_r")

    def score(t: pa.Table) -> pa.Table:
        schema = pa.schema([(id_col, pa.int64()), ("term", pa.string()),
                            ("tf", pa.int64()), ("df", pa.int64()),
                            ("tfidf", pa.float64())])
        if len(t) == 0 or "tf" not in t.column_names:
            return schema.empty_table()
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        df = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        tfidf = np.round(tf * np.log(n_docs / df), round_to)
        return pa.table({id_col: t[id_col], "term": t["term"],
                         "tf": t["tf"], "df": t["df"],
                         "tfidf": pa.array(tfidf, pa.float64())
                         }).cast(schema)

    from cuttana_ray.stages.relational import grouped_topk
    scored = joined.map_batches(score, batch_format="pyarrow")
    return grouped_topk(scored, [id_col],
                        [("tfidf", "descending"), ("term", "ascending")], k)


def _space_unigram_fn(text_col: str):
    """Per-batch (w, c) partial counts with the SAME single-space
    tokenizer as ``_bigram_fn`` (PMI needs consistent marginals)."""
    schema = pa.schema([("w", pa.string()), ("c", pa.int64())])

    def fn(batch: pa.Table) -> pa.Table:
        import polars as pl
        if len(batch) == 0 or text_col not in batch.column_names:
            return schema.empty_table()
        text = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
        arr = pc.split_pattern(text, " ")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        flat = pa.table({"w": arr.flatten()})
        out = pl.from_arrow(flat).group_by("w").len(name="c").to_arrow()
        return pa.table({"w": pc.cast(out["w"], pa.string()),
                         "c": pc.cast(out["c"], pa.int64())}).cast(schema)
    return fn


def pmi_bigrams(ds: "ray.data.Dataset", min_count: int = 10, k: int = 20,
                text_col: str = "text") -> pa.Table:
    """Top-``k`` collocations by pointwise mutual information:
    ``pmi = ln((tf/N_bi) / ((c1/N_uni)·(c2/N_uni)))`` over space-token
    bigrams with ``tf ≥ min_count``, ordered by (pmi desc, w1, w2).

    Scale shape: unigram and bigram counts are the standard partial-
    aggregated exchanges; the unigram marginals attach to surviving
    bigrams through ONE ``groupby(token)`` cogroup (melt each bigram to
    two token-sided rows, union with the unigram table — no join, no
    broadcast vocabulary) and fold back per (w1, w2) as indicator sums.
    Only the min-count survivors with attached marginals — already a
    top-k-bounded set — reach the driver for the final ln/sort.
    """
    from ray.data.aggregate import Sum

    big = bigram_counts(ds, text_col).materialize()  # reused: N_bi + melt
    uni = ds.map_batches(_space_unigram_fn(text_col),
                         batch_format="pyarrow") \
        .groupby("w").aggregate(Sum("c", alias_name="c")).materialize()

    def _total(d: "ray.data.Dataset", col: str) -> int:
        tot = 0
        for b in d.iter_batches(batch_size=None, batch_format="pyarrow"):
            if len(b) and col in b.column_names:
                tot += int(pc.sum(b[col]).as_py() or 0)
        return tot

    n_bi = float(_total(big, "tf"))
    n_uni = float(_total(uni, "c"))

    melt_schema = pa.schema([("token", pa.string()), ("w1", pa.string()),
                             ("w2", pa.string()), ("n", pa.int64()),
                             ("side", pa.int64())])

    def melt_big(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "w1" not in t.column_names:
            return melt_schema.empty_table()
        keep = pc.greater_equal(t["tf"], min_count)
        t = t.filter(keep)
        n = len(t)
        rows = []
        for side, tok_col in ((1, "w1"), (2, "w2")):
            rows.append(pa.table({
                "token": t[tok_col], "w1": t["w1"], "w2": t["w2"],
                "n": pc.cast(t["tf"], pa.int64()),
                "side": pa.array(np.full(n, side, np.int64))}))
        return pa.concat_tables([r.cast(melt_schema) for r in rows])

    def melt_uni(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "w" not in t.column_names:
            return melt_schema.empty_table()
        n = len(t)
        empty = pa.array([""] * n, pa.string())
        return pa.table({"token": t["w"], "w1": empty, "w2": empty,
                         "n": pc.cast(t["c"], pa.int64()),
                         "side": pa.array(np.zeros(n, np.int64))}) \
            .cast(melt_schema)

    melted = big.map_batches(melt_big, batch_format="pyarrow").union(
        uni.map_batches(melt_uni, batch_format="pyarrow"))

    def attach(g: pa.Table) -> pa.Table:
        schema = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                            ("tf", pa.int64()), ("c1_part", pa.int64()),
                            ("c2_part", pa.int64())])
        side = g["side"].to_numpy(zero_copy_only=False)
        uni_rows = np.flatnonzero(side == 0)
        if len(uni_rows) == 0 or len(uni_rows) == len(g):
            return schema.empty_table()   # no marginal / no bigram rows
        c_tok = int(g["n"][int(uni_rows[0])].as_py())
        bg = g.filter(pa.array(side != 0))
        s = bg["side"].to_numpy(zero_copy_only=False)
        n = bg["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "w1": bg["w1"], "w2": bg["w2"],
            "tf": pa.array(np.where(s == 1, n, 0).astype(np.int64)),
            "c1_part": pa.array(np.where(s == 1, c_tok, 0)
                                .astype(np.int64)),
            "c2_part": pa.array(np.where(s == 2, c_tok, 0)
                                .astype(np.int64))}).cast(schema)

    folded = melted.groupby("token") \
        .map_groups(attach, batch_format="pyarrow") \
        .groupby(["w1", "w2"]).aggregate(
            Sum("tf", alias_name="tf"),
            Sum("c1_part", alias_name="c1"),
            Sum("c2_part", alias_name="c2"))

    parts = [b for b in folded.iter_batches(batch_size=None,
                                            batch_format="pyarrow")
             if len(b) and "w1" in b.column_names]
    if not parts:
        return pa.table({"w1": pa.array([], pa.string()),
                         "w2": pa.array([], pa.string()),
                         "tf": pa.array([], pa.int64()),
                         "c1": pa.array([], pa.int64()),
                         "c2": pa.array([], pa.int64()),
                         "pmi": pa.array([], pa.float64())})
    t = pa.concat_tables(parts)
    tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
    c1 = t["c1"].to_numpy(zero_copy_only=False).astype(np.float64)
    c2 = t["c2"].to_numpy(zero_copy_only=False).astype(np.float64)
    pmi = np.round(np.log((tf / n_bi) / ((c1 / n_uni) * (c2 / n_uni))), 6)
    t = t.append_column("pmi", pa.array(pmi, pa.float64()))
    order = pc.sort_indices(t, sort_keys=[("pmi", "descending"),
                                          ("w1", "ascending"),
                                          ("w2", "ascending")])
    t = t.take(order[:k])
    return pa.table({"w1": t["w1"], "w2": t["w2"],
                     "tf": pc.cast(t["tf"], pa.int64()),
                     "c1": pc.cast(t["c1"], pa.int64()),
                     "c2": pc.cast(t["c2"], pa.int64()),
                     "pmi": t["pmi"]})


def build_postings(ds: "ray.data.Dataset", text_col: str = "text",
                   id_col: str = "doc_id",
                   pattern: str = _DEFAULT_PATTERN) -> "ray.data.Dataset":
    """Inverted-index posting lists: ``(term, df, postings)`` where
    ``postings`` is the sorted doc-id list joined by ','.

    The distributed artifact is the intermediate (term, doc_id) DISTINCT
    pair table — that is what a 100 TB deployment keeps (and what
    ``decontaminate``-style membership probes join against); the joined
    string column is the compact per-term rendering, built inside the
    same single ``groupby(term)`` exchange via ``map_groups`` (in-group
    sort + one ``pc.binary_join_element_wise``-free list join — no Python
    token loops). Hot terms (stopwords) produce one long row each; at
    scale cap or skip rendering for df above a threshold and keep the
    pair rows (documented trade, same hub discipline as term_counts).
    """
    partial = ds.map_batches(_extract_fn(text_col, id_col, pattern),
                             batch_format="pyarrow")

    out_schema = pa.schema([("term", pa.string()), ("df", pa.int64()),
                            ("postings", pa.string())])

    def render(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        # rows are (doc_id, term, tf) partials for ONE term group; a doc
        # can appear once per source block -> distinct doc ids first
        docs = np.unique(t[id_col].to_numpy(zero_copy_only=False))
        return pa.table({
            "term": pa.array([t["term"][0].as_py()]),
            "df": pa.array([len(docs)], pa.int64()),
            "postings": pa.array([",".join(map(str, docs.tolist()))]),
        }).cast(out_schema)

    return partial.groupby("term").map_groups(render,
                                              batch_format="pyarrow")


def unigram_logppl(ds: "ray.data.Dataset", vocab_k: int = 4096,
                   text_col: str = "text", id_col: str = "doc_id",
                   pattern: str = _DEFAULT_PATTERN) -> "ray.data.Dataset":
    """Per-document unigram log-perplexity quality score (the CCNet-style
    LM filter with a unigram model standing in for KenLM):

    1. corpus term counts (one combiner-disciplined exchange);
    2. the model = top-``vocab_k`` terms by (count desc, term asc) with
       ``p(t) = c_t / N``; everything else folds into ONE out-of-vocabulary
       symbol with ``p(oov) = (N - Σ_vocab c) / N`` — bounded driver state
       (``vocab_k`` rows + two scalars), broadcast once via ``ray.put``;
    3. per-doc scoring is a flat ``map_batches``: polars extract_all →
       explode → join against the tiny vocab frame →
       ``logppl = round(-mean ln p, 6)`` — no second exchange, docs never
       leave their batch.

    Output: ``(doc_id, n_tokens, n_oov, logppl)``; zero-token docs keep a
    row with ``n_tokens = 0`` and null ``logppl``.
    """
    import math

    import ray

    counts = term_counts(ds, text_col, pattern).materialize()
    total = counts.aggregate(Sum("tf", alias_name="n"))["n"] or 0

    def local_topk(t: pa.Table) -> pa.Table:
        if len(t) <= vocab_k:
            return t
        order = pc.sort_indices(t, sort_keys=[("tf", "descending"),
                                              ("term", "ascending")])
        return t.take(order[:vocab_k])

    vocab = counts.map_batches(local_topk, batch_format="pyarrow") \
        .sort(["tf", "term"], descending=[True, False]).limit(vocab_k) \
        .take_all()
    vterms = [r["term"] for r in vocab]
    vlps = [math.log(r["tf"] / total) for r in vocab]
    oov_mass = total - sum(r["tf"] for r in vocab)
    oov_lp = math.log(oov_mass / total) if oov_mass > 0 else 0.0
    model_ref = ray.put((vterms, vlps, oov_lp))

    schema = pa.schema([(id_col, pa.int64()), ("n_tokens", pa.int64()),
                        ("n_oov", pa.int64()), ("logppl", pa.float64())])

    def score(batch: pa.Table) -> pa.Table:
        import polars as pl
        if len(batch) == 0 or text_col not in batch.column_names:
            return schema.empty_table()
        terms, lps, olp = ray.get(model_ref)
        vf = pl.DataFrame({"term": pl.Series(terms, dtype=pl.String),
                           "vlp": pl.Series(lps, dtype=pl.Float64)})
        df = pl.from_arrow(pa.table({
            id_col: pc.cast(batch[id_col], pa.int64()),
            "text": pc.fill_null(pc.cast(batch[text_col], pa.string()), ""),
        }))
        toks = df.with_columns(
            pl.col("text").str.to_lowercase().str.extract_all(pattern)
            .alias("term")).drop("text").explode("term")
        # null term = the placeholder row of a zero-token doc (kept so the
        # doc stays in the output)
        j = toks.join(vf, on="term", how="left").with_columns(
            tok=pl.col("term").is_not_null().cast(pl.Int64),
            oov=(pl.col("term").is_not_null()
                 & pl.col("vlp").is_null()).cast(pl.Int64),
            lp=pl.when(pl.col("term").is_null()).then(None)
                .otherwise(pl.col("vlp").fill_null(olp)))
        agg = j.group_by(id_col).agg(
            n_tokens=pl.col("tok").sum(),
            n_oov=pl.col("oov").sum(),
            logppl=-pl.col("lp").mean()).to_arrow()
        # round with the same Arrow kernel the other float-checked queries
        # use, so the rounding mode matches the passing-oracle convention
        agg = agg.set_column(agg.schema.get_field_index("logppl"), "logppl",
                             pc.round(agg["logppl"], 6))
        return agg.cast(schema)

    return ds.map_batches(score, batch_format="pyarrow")


def bigram_logppl(ds: "ray.data.Dataset", vocab_k: int = 64,
                  text_col: str = "text", id_col: str = "doc_id",
                  pattern: str = _DEFAULT_PATTERN) -> "ray.data.Dataset":
    """Per-document BIGRAM log-perplexity (the CCNet-style LM filter one
    order up from ``unigram_logppl``): tokens outside the top-``vocab_k``
    vocabulary fold into one ``<unk>`` symbol, and each adjacent in-doc
    token pair scores ``ln p(w2|w1)`` under add-1 smoothing over the
    ``vocab_k + 1`` mapped symbols: ``p = (c(w1,w2) + 1) / (c(w1) + V)``.

    Scale shape: the model state is bounded by construction — the vocab is
    ``vocab_k`` strings and the bigram table at most ``(vocab_k + 1)²``
    counts — so one ``map_batches`` pass emits per-batch packed-code
    partials (``np.bincount`` on ``w1·V + w2``), the driver folds them into
    a dense ``V×V`` array (same bounded-partials regime as
    ``embeddings.kmeans``), and the scoring pass broadcasts the model via
    ``ray.put``. Besides the ``term_counts`` vocab exchange nothing
    shuffles; docs never leave their batch.

    Output: ``(doc_id, n_bigrams:int64, logppl:float64)``; docs with < 2
    tokens keep a row with ``n_bigrams = 0`` and null ``logppl``.
    """
    import ray

    counts = term_counts(ds, text_col, pattern).materialize()

    def local_topk(t: pa.Table) -> pa.Table:
        if len(t) <= vocab_k:
            return t
        order = pc.sort_indices(t, sort_keys=[("tf", "descending"),
                                              ("term", "ascending")])
        return t.take(order[:vocab_k])

    vocab = [r["term"] for r in
             counts.map_batches(local_topk, batch_format="pyarrow")
             .sort(["tf", "term"], descending=[True, False])
             .limit(vocab_k).take_all()]
    V = len(vocab) + 1          # +1 for <unk>, code V-1
    vref = ray.put(vocab)

    def mapped_pairs(batch: pa.Table):
        """Packed bigram codes (w1*V + w2) + parent doc index per pair."""
        import polars as pl
        texts = pl.from_arrow(
            pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
            .combine_chunks())
        t = texts.str.to_lowercase().str.extract_all(pattern) \
            .to_frame("l").to_arrow()["l"]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        flat = pc.list_flatten(t)
        parents = pc.list_parent_indices(t).to_numpy(
            zero_copy_only=False).astype(np.int64)
        vterms = ray.get(vref)
        code = pc.fill_null(
            pc.index_in(flat, value_set=pa.array(vterms, pa.string())),
            V - 1).to_numpy(zero_copy_only=False).astype(np.int64)
        same = parents[1:] == parents[:-1]
        w1, w2 = code[:-1][same], code[1:][same]
        return w1 * V + w2, parents[:-1][same]

    part_schema = pa.schema([("code", pa.int64()), ("n", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return part_schema.empty_table()
        packed, _ = mapped_pairs(batch)
        if len(packed) == 0:
            return part_schema.empty_table()
        cnt = np.bincount(packed, minlength=V * V)
        nz = cnt > 0
        return pa.table({"code": pa.array(np.nonzero(nz)[0], pa.int64()),
                         "n": pa.array(cnt[nz], pa.int64())})

    cb = np.zeros(V * V, np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(b) == 0:
            continue
        np.add.at(cb, b["code"].to_numpy(zero_copy_only=False),
                  b["n"].to_numpy(zero_copy_only=False))
    cl = cb.reshape(V, V).sum(axis=1)                    # c(w1)
    lp = np.log((cb + 1.0) / (np.repeat(cl, V) + float(V)))
    lpref = ray.put(lp)

    out_schema = pa.schema([(id_col, pa.int64()), ("n_bigrams", pa.int64()),
                            ("logppl", pa.float64())])

    def score(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        packed, pair_parents = mapped_pairs(batch)
        n = len(batch)
        lpv = ray.get(lpref)
        nb = np.bincount(pair_parents, minlength=n).astype(np.int64)
        s = np.zeros(n, np.float64)
        if len(packed):
            np.add.at(s, pair_parents, lpv[packed])
        logppl = np.round(-s / np.maximum(nb, 1), 6)
        return pa.table({
            id_col: pc.cast(batch[id_col], pa.int64()),
            "n_bigrams": pa.array(nb, pa.int64()),
            "logppl": pa.array(logppl, pa.float64(), mask=nb == 0)})

    return ds.map_batches(score, batch_format="pyarrow")


def bm25_scores(ds: "ray.data.Dataset", query_terms: "list[str]",
                text_col: str = "text", id_col: str = "doc_id",
                k1: float = 1.2, b: float = 0.75) -> "ray.data.Dataset":
    """Okapi BM25 relevance of every document against a fixed query term
    set (Robertson et al., TREC-3; the Lucene ``+1`` idf variant so
    scores stay positive): for each doc with ≥1 match,

        score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
        idf(t) = ln((N − df(t) + 0.5) / (df(t) + 0.5) + 1)

    Output ``(doc_id, dl, n_matched, score)`` (score rounded to 6 dp).

    Scale shape: the query side is O(#terms) CONSTANTS — term frequencies
    are counted per batch with one vectorized equality mask per term
    (never a (doc, term) exchange over the whole vocabulary, unlike
    ``doc_tfidf`` which must shuffle because its term set is unbounded);
    corpus statistics (N, Σdl, per-term df) are one-row per-block
    partials summed on the driver, then ride the scoring task's closure.
    Two streaming passes over the per-doc stats, no join anywhere."""
    query_terms = list(query_terms)
    m = len(query_terms)

    def perdoc(t: pa.Table) -> pa.Table:
        fields = [(id_col, pa.int64()), ("dl", pa.int64())] + \
            [(f"_tf{j}", pa.int64()) for j in range(m)]
        sch = pa.schema(fields)
        if len(t) == 0 or text_col not in t.column_names:
            return sch.empty_table()
        n = len(t)
        texts = pc.cast(t[text_col], pa.string())
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(texts, "")), pattern=r"\W+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(
            zero_copy_only=False)
        cols = {id_col: pc.cast(t[id_col], pa.int64()),
                "dl": pa.array(np.bincount(
                    parents[nonempty], minlength=n).astype(np.int64))}
        for j, term in enumerate(query_terms):
            hit = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            hit = np.nan_to_num(hit.astype(np.float64)) > 0  # nulls → miss
            cols[f"_tf{j}"] = pa.array(np.bincount(
                parents[hit], minlength=n).astype(np.int64))
        return pa.table(cols).cast(sch)

    stats = ds.map_batches(perdoc, batch_format="pyarrow").materialize()

    def corpus_partial(t: pa.Table) -> pa.Table:
        fields = [("n", pa.int64()), ("dls", pa.int64())] + \
            [(f"_df{j}", pa.int64()) for j in range(m)]
        sch = pa.schema(fields)
        if len(t) == 0 or "dl" not in t.column_names:
            return sch.empty_table()
        dl = t["dl"].to_numpy(zero_copy_only=False)
        row = {"n": [len(t)], "dls": [int(dl.sum())]}
        for j in range(m):
            tf = t[f"_tf{j}"].to_numpy(zero_copy_only=False)
            row[f"_df{j}"] = [int((tf > 0).sum())]
        return pa.table(row).cast(sch)

    agg = stats.map_batches(corpus_partial, batch_format="pyarrow") \
        .sum(["n", "dls"] + [f"_df{j}" for j in range(m)])
    N = int(agg["sum(n)"] or 0) if agg else 0
    if N == 0:
        return stats.map_batches(
            lambda t: pa.schema(
                [(id_col, pa.int64()), ("dl", pa.int64()),
                 ("n_matched", pa.int64()), ("score", pa.float64())]
            ).empty_table(), batch_format="pyarrow")
    avgdl = float(agg["sum(dls)"] or 0) / N
    idf = [float(np.log((N - df + 0.5) / (df + 0.5) + 1.0))
           for df in (int(agg[f"sum(_df{j})"] or 0) for j in range(m))]

    def score(t: pa.Table) -> pa.Table:
        sch = pa.schema([(id_col, pa.int64()), ("dl", pa.int64()),
                         ("n_matched", pa.int64()),
                         ("score", pa.float64())])
        if len(t) == 0 or "dl" not in t.column_names:
            return sch.empty_table()
        n = len(t)
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        total = np.zeros(n, np.float64)
        matched = np.zeros(n, np.int64)
        norm = k1 * (1.0 - b + b * dl / avgdl)
        for j in range(m):
            tf = t[f"_tf{j}"].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            total += idf[j] * tf * (k1 + 1.0) / (tf + norm)
            matched += (tf > 0).astype(np.int64)
        out = pa.table({id_col: t[id_col], "dl": t["dl"],
                        "n_matched": pa.array(matched),
                        "score": pa.array(np.round(total, 6))}).cast(sch)
        return out.filter(pc.greater(out["n_matched"], 0))

    return stats.map_batches(score, batch_format="pyarrow")


def heaps_law(ds: "ray.data.Dataset", text_col: str = "text",
              id_col: str = "doc_id",
              pattern: str = _DEFAULT_PATTERN) -> pa.Table:
    """Heaps'-law fit ``V(N) = K·N^β`` of vocabulary growth over the
    corpus in ``id_col`` order — the standard sanity check that a crawl
    slice is natural text (β ≈ 0.4-0.6) rather than boilerplate (β → 0)
    or noise (β → 1).

    Fully distributed: per-doc token counts are one vectorized regex pass;
    each term's FIRST document is one ``groupby(term).min`` exchange (the
    only vocabulary-sized shuffle — same cost as ``term_counts``); both
    per-doc series turn into prefix sums with the block-carry scan
    (``stages/running.py`` — O(#blocks) driver metadata, never O(#docs));
    the log-log OLS fit folds one-row per-block partials. Returns ONE row:
    (n_docs, total_tokens, vocab_size, heaps_k, heaps_beta).
    """
    from ray.data.aggregate import Count, Min, Sum

    from cuttana_ray.stages.running import running_agg
    from cuttana_ray.util import safe_join

    def ntok(batch: pa.Table) -> pa.Table:
        sch = pa.schema([(id_col, pa.int64()), ("nt", pa.int64()),
                         ("_k", pa.int64())])
        if len(batch) == 0 or text_col not in batch.column_names:
            return sch.empty_table()
        text = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
        n = pc.count_substring_regex(pc.utf8_lower(text), pattern=pattern)
        return pa.table({id_col: pc.cast(batch[id_col], pa.int64()),
                         "nt": pc.cast(n, pa.int64()),
                         "_k": pa.array(np.zeros(len(batch), np.int64))
                         }).cast(sch)

    per_doc = ds.map_batches(ntok, batch_format="pyarrow")

    firsts = ds.map_batches(_extract_fn(text_col, id_col, pattern),
                            batch_format="pyarrow") \
        .groupby("term").aggregate(Min(id_col, alias_name="fd"))
    new_terms = firsts.groupby("fd").aggregate(Count(alias_name="nv"))

    joined = safe_join(per_doc, new_terms, join_type="left_outer",
                       num_partitions=8, on=(id_col,), right_on=("fd",))

    def fill(t: pa.Table) -> pa.Table:
        sch = pa.schema([(id_col, pa.int64()), ("nt", pa.int64()),
                         ("nv", pa.int64()), ("_k", pa.int64())])
        if len(t) == 0 or id_col not in t.column_names:
            return sch.empty_table()
        return pa.table({id_col: t[id_col], "nt": t["nt"],
                         "nv": pc.fill_null(pc.cast(t["nv"], pa.int64()),
                                            0),
                         "_k": t["_k"]}).cast(sch)

    filled = joined.map_batches(fill, batch_format="pyarrow")
    # two block-carry prefix scans on the constant key (total order by id)
    r1 = running_agg(filled, "_k", [id_col], "nt",
                     keep=["_k", id_col, "nv"])
    r1 = r1.map_batches(lambda t: t.rename_columns(
        [{"running_sum": "cumn"}.get(c, c) for c in t.column_names]),
        batch_format="pyarrow")
    r2 = running_agg(r1, "_k", [id_col], "nv", keep=["_k", id_col, "cumn"])

    def ols_partial(t: pa.Table) -> pa.Table:
        sch = pa.schema([("n", pa.int64()), ("sx", pa.float64()),
                         ("sy", pa.float64()), ("sxy", pa.float64()),
                         ("sxx", pa.float64()), ("nd", pa.int64()),
                         ("tt", pa.int64()), ("vs", pa.int64())])
        if len(t) == 0 or "cumn" not in t.column_names:
            return sch.empty_table()
        cumn = t["cumn"].to_numpy(zero_copy_only=False)
        cumv = t["running_sum"].to_numpy(zero_copy_only=False)
        m = (cumn > 0) & (cumv > 0)
        x = np.log(cumn[m].astype(np.float64))
        y = np.log(cumv[m].astype(np.float64))
        return pa.table({
            "n": pa.array([int(m.sum())], pa.int64()),
            "sx": pa.array([float(x.sum())]),
            "sy": pa.array([float(y.sum())]),
            "sxy": pa.array([float((x * y).sum())]),
            "sxx": pa.array([float((x * x).sum())]),
            "nd": pa.array([len(t)], pa.int64()),
            "tt": pa.array([0], pa.int64()),
            "vs": pa.array([0], pa.int64()),
        }).cast(sch)

    parts = r2.map_batches(ols_partial, batch_format="pyarrow") \
        .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                   Sum("sy", alias_name="sy"), Sum("sxy", alias_name="sxy"),
                   Sum("sxx", alias_name="sxx"),
                   Sum("nd", alias_name="nd"))
    n = float(parts["n"])
    sx, sy = float(parts["sx"]), float(parts["sy"])
    sxy, sxx = float(parts["sxy"]), float(parts["sxx"])
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    k = float(np.exp((sy - beta * sx) / n))
    # the two scalar totals ride on the same exchanges already run
    tot = per_doc.aggregate(Sum("nt", alias_name="tt"))["tt"]
    # NB: a global Count() with no `on` returns 0 in Ray 2.49 — count a
    # concrete column instead
    vocab = firsts.aggregate(Count(on="term", alias_name="vs"))["vs"]
    return pa.table({
        "n_docs": pa.array([int(parts["nd"])], pa.int64()),
        "total_tokens": pa.array([int(tot)], pa.int64()),
        "vocab_size": pa.array([int(vocab)], pa.int64()),
        "heaps_k": pa.array([round(k, 6)], pa.float64()),
        "heaps_beta": pa.array([round(beta, 6)], pa.float64()),
    })


def group_term_cosine(ds: "ray.data.Dataset", group_col: str = "source",
                      text_col: str = "text",
                      pattern: str = _DEFAULT_PATTERN
                      ) -> pa.Table:
    """Pairwise cosine similarity between the unigram term-frequency
    vectors of each document group (source, lang, …) — the standard
    corpus-mixing diagnostic ("how lexically close are my sources?").

    All heavy work is exact int64 and distributed: per-batch
    (group, term, tf) partials (one polars extract_all pass), ONE
    ``groupby(term)`` exchange whose map_groups emits each term's
    cross-group products (#groups² rows per term, #groups is small by
    construction), then one tiny ``groupby(pair)`` sum. The cosine
    divides exact integer dot products, so results are layout-invariant
    with no float folding at all. Returns (source_a, source_b, dot,
    cosine) for a < b; pairs sharing NO term are absent (sparse-join
    semantics — their cosine is 0 by definition).
    """
    from ray.data.aggregate import Sum

    def extract(batch: pa.Table) -> pa.Table:
        import polars as pl
        sch = pa.schema([("g", pa.string()), ("term", pa.string()),
                         ("tf", pa.int64())])
        if len(batch) == 0 or text_col not in batch.column_names:
            return sch.empty_table()
        df = pl.from_arrow(pa.table({
            "g": pc.cast(batch[group_col], pa.string()),
            "text": pc.fill_null(pc.cast(batch[text_col], pa.string()),
                                 "")}))
        toks = df.with_columns(
            pl.col("text").str.to_lowercase().str.extract_all(pattern)
            .alias("term")).drop("text").explode("term") \
            .drop_nulls("term")
        out = toks.group_by(["g", "term"]).len(name="tf").to_arrow()
        return pa.table({"g": pc.cast(out["g"], pa.string()),
                         "term": pc.cast(out["term"], pa.string()),
                         "tf": pc.cast(out["tf"], pa.int64())}).cast(sch)

    counts = ds.map_batches(extract, batch_format="pyarrow") \
        .groupby(["g", "term"]).aggregate(Sum("tf", alias_name="tf"))

    def cross(t: pa.Table) -> pa.Table:
        # vectorized upper-triangle outer product over the term's groups
        # (#groups is small; the vocabulary dimension parallelizes)
        sch = pa.schema([("sa", pa.string()), ("sb", pa.string()),
                         ("p", pa.int64())])
        if len(t) == 0:
            return sch.empty_table()
        g = np.asarray(t["g"].to_pylist())
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(g, kind="stable")
        g, tf = g[order], tf[order]
        n = len(g)
        iu, ju = np.triu_indices(n, k=0)
        return pa.table({"sa": pa.array(g[iu], pa.string()),
                         "sb": pa.array(g[ju], pa.string()),
                         "p": pa.array(tf[iu] * tf[ju], pa.int64())
                         }).cast(sch)

    pairs = counts.groupby("term").map_groups(cross,
                                              batch_format="pyarrow") \
        .groupby(["sa", "sb"]).aggregate(Sum("p", alias_name="dot")) \
        .to_pandas()                       # #groups² rows — tiny
    norms = {r["sa"]: int(r["dot"]) for _, r in pairs.iterrows()
             if r["sa"] == r["sb"]}
    out = pairs[pairs["sa"] < pairs["sb"]].sort_values(["sa", "sb"])
    cos = [round(int(d) / float(np.sqrt(float(norms[a]) * norms[b])), 6)
           for a, b, d in zip(out["sa"], out["sb"], out["dot"])]
    return pa.table({
        "source_a": pa.array(out["sa"].tolist(), pa.string()),
        "source_b": pa.array(out["sb"].tolist(), pa.string()),
        "dot": pa.array([int(v) for v in out["dot"]], pa.int64()),
        "cosine": pa.array(cos, pa.float64()),
    })
