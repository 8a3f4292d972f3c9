"""Byte-pair-encoding merge learning — training the tokenizer itself,
the step upstream of every token-count operator in this package.

Standard BPE (Sennrich et al., ACL 2016, public algorithm): start from
characters (plus an end-of-word marker), repeatedly merge the most
frequent adjacent symbol pair. The distributed part is exactly the part
that scales with the corpus: word frequencies via the vectorized
extract/explode/partial-count path of ``functions/terms.py`` (one
``groupby(term)`` exchange), capped to the top ``max_words`` types by a
per-block top-k + tiny final sort. The merge loop itself then runs on the
driver over the CAPPED word-frequency table — O(max_words x num_merges)
work on a few-thousand-row table, which is how production BPE trainers
operate too (they never stream the raw corpus through the merge loop).

Deterministic: ties on pair frequency break to the lexicographically
smallest pair, so merges are reproducible across runs, layouts and
cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from cuttana_ray.functions.terms import _DEFAULT_PATTERN, term_counts

END = "</w>"


def _merge_loop(words: "list[tuple[str, ...]]", freqs: "list[int]",
                num_merges: int) -> "list[tuple[str, str, int]]":
    """The classic in-memory merge loop over (symbol-tuple, freq) pairs."""
    merges: list[tuple[str, str, int]] = []
    words = [list(w) for w in words]
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, f in zip(words, freqs):
            for a, b in zip(w, w[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        # deterministic: max count, then lexicographically smallest pair
        top = max(counts.values())
        best = min(p for p, c in counts.items() if c == top)
        merges.append((best[0], best[1], top))
        a, b = best
        ab = a + b
        for w in words:
            i = 0
            while i < len(w) - 1:
                if w[i] == a and w[i + 1] == b:
                    w[i:i + 2] = [ab]
                else:
                    i += 1
    return merges


def learn_bpe(ds: "ray.data.Dataset", num_merges: int = 10,
              max_words: int = 20_000, text_col: str = "text",
              pattern: str = _DEFAULT_PATTERN) -> pa.Table:
    """Learn ``num_merges`` BPE merges from the corpus. Returns
    ``(rank, left, right, pair_count)`` — rank is 1-based merge order.

    Scale shape: the corpus-sized work (tokenize + count) is the existing
    distributed term-count path; only the top-``max_words`` (term, tf)
    rows ever reach the driver."""
    tc = term_counts(ds, text_col=text_col, pattern=pattern)

    def local_topk(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        import pyarrow.compute as pc
        idx = pc.sort_indices(t, sort_keys=[("tf", "descending"),
                                            ("term", "ascending")])
        return t.take(idx[:max_words])

    capped = pa.concat_tables(
        [b for b in tc.map_batches(local_topk, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow")])
    import pyarrow.compute as pc
    idx = pc.sort_indices(capped, sort_keys=[("tf", "descending"),
                                             ("term", "ascending")])
    capped = capped.take(idx[:max_words])

    words = [tuple(term) + (END,) for term in capped["term"].to_pylist()]
    freqs = [int(f) for f in capped["tf"].to_pylist()]
    merges = _merge_loop(words, freqs, num_merges)
    return pa.table({
        "rank": pa.array(range(1, len(merges) + 1), pa.int64()),
        "left": pa.array([m[0] for m in merges]),
        "right": pa.array([m[1] for m in merges]),
        "pair_count": pa.array([m[2] for m in merges], pa.int64()),
    })


def _encode_word(word: str, merges: "list[tuple[str, str]]") -> int:
    """Number of symbols after applying ``merges`` in order, each with the
    classic left-to-right non-overlapping scan (same loop as
    ``_merge_loop``'s apply step)."""
    w = list(word)
    for a, b in merges:
        ab = a + b
        i = 0
        while i < len(w) - 1:
            if w[i] == a and w[i + 1] == b:
                w[i:i + 2] = [ab]
            else:
                i += 1
    return len(w)


def encode_with_merges(ds: "ray.data.Dataset",
                       merges: "list[tuple[str, str]]",
                       text_col: str = "text", id_col: str = "doc_id"
                       ) -> "ray.data.Dataset":
    """Tokenizer APPLICATION — the other half of ``learn_bpe`` and the
    single hottest stage of a real training-data pipeline: encode every
    document with a fixed, already-learned merge table and report
    ``(doc_id, n_words, n_chars, n_symbols, compression)`` where
    ``compression = n_chars / n_symbols`` (0 for empty docs).

    Scale shape: the merge table is a FIXED O(num_merges) constant shipped
    inside the task closure (a trained tokenizer is a broadcast artifact,
    never corpus-sized); per batch the corpus-sized work is one Arrow
    regex split, and the merge loop runs once per UNIQUE word type in the
    batch (the standard production trick — types ≪ tokens) with counts
    mapped back vectorized. Word symbols never leave the task; only
    per-doc integer sums do, so results are layout-invariant and
    hash-exact."""
    import pyarrow.compute as pc

    def encode(t: pa.Table) -> pa.Table:
        import pandas as pd
        sch = pa.schema([(id_col, pa.int64()), ("n_words", pa.int64()),
                         ("n_chars", pa.int64()), ("n_symbols", pa.int64()),
                         ("compression", pa.float64())])
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
        keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(
            zero_copy_only=False)
        n_words = np.zeros(n, np.int64)
        n_chars = np.zeros(n, np.int64)
        n_syms = np.zeros(n, np.int64)
        if keep.any():
            words = pd.Series(flat.filter(pa.array(keep)).to_pandas())
            par = parents[keep]
            uniq = pd.unique(words)
            enc = {w: _encode_word(w, merges) for w in uniq}
            syms = words.map(enc).to_numpy().astype(np.int64)
            lens = words.str.len().to_numpy().astype(np.int64)
            n_words += np.bincount(par, minlength=n).astype(np.int64)
            n_chars += np.bincount(par, weights=lens.astype(np.float64),
                                   minlength=n).astype(np.int64)
            n_syms += np.bincount(par, weights=syms.astype(np.float64),
                                  minlength=n).astype(np.int64)
        comp = np.where(n_syms > 0,
                        np.round(n_chars / np.maximum(n_syms, 1), 6), 0.0)
        return pa.table({id_col: pc.cast(t[id_col], pa.int64()),
                         "n_words": pa.array(n_words),
                         "n_chars": pa.array(n_chars),
                         "n_symbols": pa.array(n_syms),
                         "compression": pa.array(comp)}).cast(sch)

    return ds.map_batches(encode, batch_format="pyarrow")
