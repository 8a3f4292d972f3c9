"""Text analysis operators over a documents table.

Actor-pool ``map_batches`` stages (regexes compiled once per actor in
``__init__``), vectorized with pyarrow.compute / pandas string kernels:

* ``token_stats`` — whitespace token count, BPE-ish regex token count,
  char count (SQL-checkable).
* ``quality_scores`` — length / punctuation ratio / stopword ratio / mean
  word length + a composite [0,1] quality score.
* ``lang_id`` — stopword-profile n-gram heuristic over a fixed set of
  languages (en, de, fr, es, it, pt).
* ``fingerprints`` — winnowing document fingerprint: rolling Rabin-Karp
  k-gram hashes, minimum per sliding window, distinct-set XOR-folded to one
  int64 per doc.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data



# BPE-ish token pattern: word pieces, numbers, or single non-space symbols
_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "ich", "zu", "mit"},
    "fr": {"le", "la", "et", "les", "des", "est", "un", "une", "du", "que"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "los", "es", "una"},
    "it": {"il", "di", "che", "la", "e", "un", "per", "una", "sono", "non"},
    "pt": {"o", "a", "de", "que", "e", "do", "da", "em", "um", "para"},
}


def token_stats(ds: "ray.data.Dataset", text_col: str = "text",
                id_col: str = "doc_id") -> "ray.data.Dataset":
    """``(doc_id, n_tokens, n_bpe_tokens, n_chars_computed)``; whitespace
    tokens via a vectorized regex count (Arrow kernel, no Python rows)."""
    def stats(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch[text_col], pa.string())
        n_ws = pc.count_substring_regex(text, pattern=r"\S+")
        n_bpe = pc.count_substring_regex(text, pattern=_BPE_PATTERN)
        n_chars = pc.utf8_length(text)
        return pa.table({
            id_col: batch[id_col],
            "n_tokens": pc.cast(n_ws, pa.int64()),
            "n_bpe_tokens": pc.cast(n_bpe, pa.int64()),
            "n_chars_computed": pc.cast(n_chars, pa.int64()),
        })
    return ds.map_batches(stats, batch_format="pyarrow")


class _QualityScorer:
    def __init__(self, text_col: str, id_col: str):
        import re
        self.word = re.compile(r"[a-zA-Z]+")
        self.punct = re.compile(r"[^\w\s]")
        self.stop = _STOPWORDS["en"]
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd
        text = pd.Series(batch[self.text_col].to_pylist()).fillna("")
        n_chars = text.str.len()
        words = text.str.lower().str.findall(self.word)
        n_words = words.map(len)
        n_punct = text.str.count(self.punct)
        stop_ratio = words.map(
            lambda ws: sum(w in self.stop for w in ws) / max(1, len(ws)))
        mean_wlen = words.map(
            lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)
        punct_ratio = (n_punct / n_chars.clip(lower=1)).astype(float)
        # composite: reward mid-length docs, stopword presence, low punct
        length_score = np.clip(n_chars / 200.0, 0, 1)
        score = (0.4 * length_score + 0.3 * np.clip(stop_ratio * 5, 0, 1)
                 + 0.3 * (1 - np.clip(punct_ratio * 4, 0, 1)))
        return pa.table({
            self.id_col: batch[self.id_col],
            "n_chars": pa.array(n_chars.to_numpy(), pa.int64()),
            "n_words": pa.array(n_words.to_numpy(), pa.int64()),
            "punct_ratio": pa.array(punct_ratio.to_numpy(), pa.float64()),
            "stopword_ratio": pa.array(stop_ratio.to_numpy(), pa.float64()),
            "mean_word_len": pa.array(mean_wlen.to_numpy(), pa.float64()),
            "quality": pa.array(np.asarray(score, dtype=np.float64)),
        })


def quality_scores(ds: "ray.data.Dataset", text_col: str = "text",
                   id_col: str = "doc_id") -> "ray.data.Dataset":
    return ds.map_batches(_QualityScorer(text_col, id_col),
                          batch_format="pyarrow")


class _LangId:
    def __init__(self, text_col: str, id_col: str):
        import re
        self.tok = re.compile(r"[a-zà-ÿ]+")
        self.profiles = {lang: sw for lang, sw in _STOPWORDS.items()}
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = []
        scores = []
        for text in batch[self.text_col].to_pylist():
            toks = self.tok.findall((text or "").lower())
            best, best_s = "und", 0.0
            for lang, sw in self.profiles.items():
                s = sum(t in sw for t in toks) / max(1, len(toks))
                if s > best_s:
                    best, best_s = lang, s
            langs.append(best if best_s > 0 else "und")
            scores.append(best_s)
        return pa.table({
            self.id_col: batch[self.id_col],
            "lang_pred": pa.array(langs, pa.string()),
            "lang_score": pa.array(scores, pa.float64()),
        })


def lang_id(ds: "ray.data.Dataset", text_col: str = "text",
            id_col: str = "doc_id") -> "ray.data.Dataset":
    return ds.map_batches(_LangId(text_col, id_col), batch_format="pyarrow")


class _Fingerprinter:
    """Winnowing (Schleimer et al.): rolling k-gram hashes, min per window
    of w, XOR-fold the distinct mins to a single int64."""

    def __init__(self, k: int, w: int, text_col: str, id_col: str):
        self.k, self.w = k, w
        self.text_col = text_col
        self.id_col = id_col

    def fingerprint(self, text: str) -> int:
        b = np.frombuffer((text or "").encode(), dtype=np.uint8)
        if len(b) < self.k:
            b = np.pad(b, (0, self.k - len(b)))
        win = np.lib.stride_tricks.sliding_window_view(b, self.k).astype(np.uint64)
        weights = np.power(np.uint64(257), np.arange(self.k, dtype=np.uint64),
                           dtype=np.uint64)
        hashes = (win * weights).sum(axis=1, dtype=np.uint64)
        if len(hashes) >= self.w:
            mins = np.min(np.lib.stride_tricks.sliding_window_view(
                hashes, self.w), axis=1)
        else:
            mins = np.asarray([hashes.min()], dtype=np.uint64)
        acc = np.uint64(0)
        for h in np.unique(mins):
            acc ^= h
        return int(acc.astype(np.int64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [self.fingerprint(t) for t in batch[self.text_col].to_pylist()]
        return pa.table({
            self.id_col: batch[self.id_col],
            "fingerprint": pa.array(fps, pa.int64()),
        })


def fingerprints(ds: "ray.data.Dataset", k: int = 8, w: int = 4,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> "ray.data.Dataset":
    return ds.map_batches(_Fingerprinter(k, w, text_col, id_col),
                          batch_format="pyarrow")


def int_quantiles(ds: "ray.data.Dataset", col: str,
                  qs: tuple = (0.5, 0.9, 0.95, 0.99)) -> pa.Table:
    """Exact discrete quantiles of an integer column WITHOUT a global sort.

    Each batch emits (value, count) partials — bounded by the batch's
    distinct-value count, not its row count — and the driver merges the tiny
    histograms. Scale-safe whenever the column's value cardinality is small
    relative to the data (document lengths, token counts, status codes …):
    at 100 TB the shuffle-free histogram is thousands of rows while a
    sort-based quantile would move every block. For unbounded-cardinality
    columns, pre-bucket (e.g. ``value // width``) for approximate quantiles
    with a chosen resolution.

    Quantile definition matches DuckDB ``quantile_disc``: the element at
    sorted position ``max(ceil(q*n), 1) - 1``, verified against DuckDB in
    the driver contract (``doc_length_quantiles``). Returns a pyarrow table
    ``(q: float64, value: int64)``, one row per requested quantile.
    """
    import math

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uniq.astype(np.int64)),
                         "c": pa.array(cnt.astype(np.int64))})

    vs, cs = [], []
    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        vs.append(b["v"].to_numpy(zero_copy_only=False))
        cs.append(b["c"].to_numpy(zero_copy_only=False))
    if not vs or not sum(len(a) for a in vs):
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.int64())})
    allv = np.concatenate(vs)
    allc = np.concatenate(cs)
    uniq, inv = np.unique(allv, return_inverse=True)
    counts = np.bincount(inv, weights=allc).astype(np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1])
    out = []
    for q in qs:
        target = max(math.ceil(q * n), 1)
        idx = int(np.searchsorted(cum, target, side="left"))
        out.append(int(uniq[idx]))
    return pa.table({"q": pa.array([float(q) for q in qs], pa.float64()),
                     "value": pa.array(out, pa.int64())})


def grouped_int_quantiles(ds: "ray.data.Dataset", key: str, col: str,
                          qs: tuple = (0.5, 0.9)) -> "ray.data.Dataset":
    """Per-``key``-group exact discrete quantiles (``quantile_disc``
    semantics, same position rule as ``int_quantiles``) without a global
    sort: per-batch (key, value, count) histograms bound the ONE groupby
    exchange by the per-block distinct-value count, and each key group's
    tiny histogram selects its quantiles inside ``map_groups``. Returns
    ``(key, q: float64, value: int64)`` rows."""
    import math
    import pandas as pd

    key_type = ds.schema().types[ds.schema().names.index(key)]
    part_schema = pa.schema([(key, key_type), ("v", pa.int64()),
                             ("c", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return part_schema.empty_table()
        df = pa.table({key: t[key], "v": pc.cast(t[col], pa.int64())}) \
            .to_pandas()
        agg = df.groupby([key, "v"], sort=False, as_index=False) \
            .size().rename(columns={"size": "c"})
        return pa.Table.from_pandas(agg, preserve_index=False) \
            .cast(part_schema)

    def select(df: "pd.DataFrame") -> "pd.DataFrame":
        g = df.groupby("v", as_index=False, sort=True)["c"].sum() \
            .sort_values("v")
        cum = g["c"].cumsum().to_numpy()
        vals = g["v"].to_numpy()
        n = int(cum[-1])
        out_q, out_v = [], []
        for q in qs:
            target = max(math.ceil(q * n), 1)
            out_q.append(float(q))
            out_v.append(int(vals[int(np.searchsorted(cum, target,
                                                      side="left"))]))
        return pd.DataFrame({key: [df[key].iloc[0]] * len(qs),
                             "q": out_q, "value": np.int64(out_v)})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(key).map_groups(select, batch_format="pandas")


def repetition_stats(ds: "ray.data.Dataset", text_col: str = "text",
                     id_col: str = "doc_id") -> "ray.data.Dataset":
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    "Scaling Language Models", §A1.1 quality filters): per document the
    token count, distinct-token count, the most-frequent token's count,
    and the most-frequent token-bigram's count (with the bigram total).

    All counts are EXACT int64 — fraction thresholds divide downstream, so
    the driver hash can't drift on float rounding. Fully vectorized and
    embarrassingly parallel: one ``split_pattern`` kernel per batch, then
    dictionary-encoded token codes keyed as ``doc_idx * C + code`` through
    a single ``np.unique`` (and ``C²`` keys for bigrams) — no shuffle, no
    Python per-row loop, nothing leaves the batch but 6 ints per doc.

    Tokenization is a plain single-space split (matching SQL
    ``string_split(text, ' ')``) so the op is oracle-checkable.
    """
    def stats(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            (id_col, pa.int64()), ("n_tokens", pa.int64()),
            ("n_distinct_tokens", pa.int64()), ("top_token_n", pa.int64()),
            ("n_bigrams", pa.int64()), ("top_bigram_n", pa.int64())])
        n = len(batch)
        if n == 0:
            return out_schema.empty_table()
        toks = pc.split_pattern(pc.cast(batch[text_col], pa.string()), " ")
        toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        counts = np.diff(offs)                      # tokens per doc
        flat = toks.values.dictionary_encode()
        codes = flat.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        C = len(flat.dictionary)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)

        top_tok = np.zeros(n, np.int64)
        n_distinct = np.zeros(n, np.int64)
        if len(codes):
            pair_keys, pair_cnt = np.unique(doc_of * C + codes,
                                            return_counts=True)
            pd_doc = pair_keys // C
            np.maximum.at(top_tok, pd_doc, pair_cnt)
            np.add.at(n_distinct, pd_doc, 1)

        # bigrams: adjacent token positions belonging to the same doc
        top_big = np.zeros(n, np.int64)
        n_bigrams = np.maximum(counts - 1, 0).astype(np.int64)
        if len(codes) > 1:
            same = doc_of[1:] == doc_of[:-1]
            if same.any():
                if C and C * C < (2 ** 62) // max(n, 1):
                    bg_keys = (doc_of[:-1][same] * (C * C)
                               + codes[:-1][same] * C + codes[1:][same])
                    bk, bc = np.unique(bg_keys, return_counts=True)
                    np.maximum.at(top_big, bk // (C * C), bc)
                else:  # giant per-batch vocab: overflow-safe 3-column path
                    tri = np.stack([doc_of[:-1][same], codes[:-1][same],
                                    codes[1:][same]], axis=1)
                    bk, bc = np.unique(tri, axis=0, return_counts=True)
                    np.maximum.at(top_big, bk[:, 0], bc)

        return pa.table({
            id_col: batch[id_col], "n_tokens": pa.array(counts.astype(np.int64)),
            "n_distinct_tokens": pa.array(n_distinct),
            "top_token_n": pa.array(top_tok),
            "n_bigrams": pa.array(n_bigrams),
            "top_bigram_n": pa.array(top_big)}).cast(out_schema)

    return ds.map_batches(stats, batch_format="pyarrow")


def hashed_linear_score(ds: "ray.data.Dataset", text_col: str = "text",
                        id_col: str = "doc_id", dim: int = 65536
                        ) -> "ray.data.Dataset":
    """fastText/CCNet-shaped hashed linear document scorer — the
    production quality-filter shape: token → hash-bucket feature → weight
    lookup → mean score → keep/drop. Weights here are a DETERMINISTIC
    placeholder table ``w(b) = ((b·2654435761) mod 2^32) − 2^31`` (Knuth
    multiplicative mix) so the whole operator is replayable in SQL; a
    trained coefficient table would broadcast exactly the same way —
    O(dim) per node, never O(corpus).

    Output per doc: ``(doc_id, n_tokens, wsum, score, keep)`` where
    ``wsum`` is the exact int64 weight sum (layout-invariant — no float
    accumulation order anywhere), ``score = wsum / (n_tokens · 2^32)``
    rounded to 6 dp, and ``keep = wsum > 0``. Tokenization and the
    per-token 64-bit FNV-1a match the SimHash stage bit-for-bit
    (``functions/dedup._hash_strings``), fully vectorized: one Arrow
    regex split per batch, one NumPy pass per byte position, bincount
    segment sums — no Python loop over docs or tokens.
    """
    from cuttana_ray.functions.dedup import _hash_strings

    shift = 1 << 31
    mod = 1 << 32

    def score(t: pa.Table) -> pa.Table:
        sch = pa.schema([(id_col, pa.int64()), ("n_tokens", pa.int64()),
                         ("wsum", pa.int64()), ("score", pa.float64()),
                         ("keep", pa.bool_())])
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
        keep_tok = pc.greater(pc.utf8_length(flat), 0).to_numpy(
            zero_copy_only=False)
        ntok = np.zeros(n, np.int64)
        wsum = np.zeros(n, np.int64)
        if keep_tok.any():
            hs = _hash_strings(flat.filter(pa.array(keep_tok)))
            par = parents[keep_tok]
            b = (hs % np.uint64(dim)).astype(np.int64)
            wn = (b * 2654435761) % mod - shift
            ntok += np.bincount(par, minlength=n).astype(np.int64)
            # float64 bincount is exact here: |wn| < 2^31 and docs are
            # ≪ 2^21 tokens, so every partial sum stays below 2^52
            wsum += np.bincount(par, weights=wn.astype(np.float64),
                                minlength=n).astype(np.int64)
        # single division (wsum and ntok·2^32 both exact) — bit-identical
        # to the oracle's wsum / (n * 4294967296.0)
        sc = np.where(ntok > 0,
                      np.round(wsum / (np.maximum(ntok, 1) * float(mod)), 6),
                      0.0)
        return pa.table({id_col: pc.cast(t[id_col], pa.int64()),
                         "n_tokens": pa.array(ntok),
                         "wsum": pa.array(wsum),
                         "score": pa.array(sc),
                         "keep": pa.array(wsum > 0)}).cast(sch)

    return ds.map_batches(score, batch_format="pyarrow")


def boilerplate_sentences(ds: "ray.data.Dataset", text_col: str = "text",
                          id_col: str = "doc_id", min_docs: int = 2
                          ) -> "ray.data.Dataset":
    """CCNet-style boilerplate detection at the sentence level — the
    dedup unit real web-corpus cleaners operate on (headers, footers,
    cookie banners recur across DOCUMENTS, not within them): split every
    document on sentence terminators, normalize (space-trim + lowercase),
    and report each sentence appearing in ≥ ``min_docs`` DISTINCT
    documents with its document count.

    Scale shape: a document lives in one row, so its (doc, sentence)
    pairs dedup entirely inside the batch (one Arrow group_by per batch)
    and the exchange moves pre-combined per-sentence partial counts —
    the combiner discipline; no raw sentence stream ever shuffles twice.
    Output ``(sentence, n_docs)``."""
    from ray.data.aggregate import Sum

    def extract(t: pa.Table) -> pa.Table:
        sch = pa.schema([("sentence", pa.string()), ("c", pa.int64())])
        if len(t) == 0 or text_col not in t.column_names:
            return sch.empty_table()
        texts = pc.cast(t[text_col], pa.string())
        sents = pc.split_pattern_regex(
            pc.fill_null(texts, ""), pattern=r"[.!?]+")
        if isinstance(sents, pa.ChunkedArray):
            sents = sents.combine_chunks()
        flat = pc.utf8_lower(pc.utf8_trim(pc.list_flatten(sents), " "))
        parents = pc.list_parent_indices(sents)
        keep = pc.greater(pc.utf8_length(flat), 0)
        pairs = pa.table({"d": parents.filter(keep),
                          "sentence": flat.filter(keep)}) \
            .group_by(["d", "sentence"]).aggregate([])
        out = pairs.select(["sentence"]).group_by(["sentence"]) \
            .aggregate([([], "count_all")]) \
            .rename_columns(["sentence", "c"])
        return out.cast(sch)

    counts = ds.map_batches(extract, batch_format="pyarrow") \
        .groupby("sentence").aggregate(Sum("c", alias_name="n_docs"))
    return counts.filter(expr=f"n_docs >= {int(min_docs)}")


def readability_scores(ds: "ray.data.Dataset", text_col: str = "text",
                       id_col: str = "doc_id") -> "ray.data.Dataset":
    """Flesch reading ease + Flesch-Kincaid grade level per document —
    the classic surface-readability filters for training-data curation
    (e.g. keeping a grade-level band per corpus slice).

    Pure vectorized Arrow regex kernels, one pass, no Python rows:

    * words      = non-overlapping ``\\S+`` matches (floored at 1 so the
      ratios are total functions; the floor is part of the contract),
    * sentences  = ``[.!?]+`` runs, floored at 1,
    * syllables  = vowel-group runs ``[aeiouy]+`` in the lowercased text —
      the standard cheap syllable proxy (counted over the whole text; a
      per-word floor would need word-splitting for <1% delta).

    ``flesch = 206.835 − 1.015·w/s − 84.6·y/w``;
    ``fk_grade = 0.39·w/s + 11.8·y/w − 15.59``. Both rounded 6 dp; every
    count is exact int64, so results are layout-invariant and exactly
    SQL-replayable (DuckDB ``regexp_extract_all`` shares RE2 semantics
    with the Arrow kernel).
    """
    def scores(batch: pa.Table) -> pa.Table:
        sch = pa.schema([(id_col, pa.int64()), ("n_words", pa.int64()),
                         ("n_sentences", pa.int64()),
                         ("n_syllables", pa.int64()),
                         ("flesch", pa.float64()),
                         ("fk_grade", pa.float64())])
        if len(batch) == 0 or text_col not in batch.column_names:
            return sch.empty_table()
        # fill_null like every sibling: a NULL text otherwise propagates
        # through count_substring_regex as null → NaN → INT64_MIN garbage
        text = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
        w = np.maximum(pc.count_substring_regex(text, pattern=r"\S+")
                       .to_numpy(zero_copy_only=False).astype(np.int64), 1)
        s = np.maximum(pc.count_substring_regex(text, pattern=r"[.!?]+")
                       .to_numpy(zero_copy_only=False).astype(np.int64), 1)
        y = pc.count_substring_regex(pc.utf8_lower(text),
                                     pattern=r"[aeiouy]+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ws = w.astype(np.float64) / s
        yw = y.astype(np.float64) / w
        return pa.table({
            id_col: pc.cast(batch[id_col], pa.int64()),
            "n_words": pa.array(w),
            "n_sentences": pa.array(s),
            "n_syllables": pa.array(y),
            "flesch": pa.array(
                np.round(206.835 - 1.015 * ws - 84.6 * yw, 6)),
            "fk_grade": pa.array(
                np.round(0.39 * ws + 11.8 * yw - 15.59, 6)),
        }).cast(sch)
    return ds.map_batches(scores, batch_format="pyarrow")
