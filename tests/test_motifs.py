"""Motif censuses: 4-cycle (square) count on general graphs, butterfly /
caterpillar counts on bipartite incidence graphs, and the hashed linear
document scorer — each checked against an independent brute-force oracle
(itertools / dict loops, no shared machinery)."""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from cuttana_ray.functions.cooccur import bipartite_motifs
from cuttana_ray.pipelines.triangles import square_count


def _sym_edges(pairs: list[tuple[int, int]], nblocks: int = 3):
    src, dst = [], []
    for a, b in pairs:
        src += [a, b]
        dst += [b, a]
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    return rd.from_arrow(t).repartition(nblocks)


def _brute_squares(pairs: list[tuple[int, int]]) -> int:
    es = {frozenset(p) for p in pairs}
    vs = sorted({v for p in pairs for v in p})
    n = 0
    for a, b, c, d in itertools.combinations(vs, 4):
        # the 3 distinct 4-cycles on {a,b,c,d}, one per diagonal pairing
        for cyc in ((a, b, c, d), (a, b, d, c), (a, c, b, d)):
            w, x, y, z = cyc
            if ({frozenset((w, x)), frozenset((x, y)),
                 frozenset((y, z)), frozenset((z, w))} <= es):
                n += 1
    return n


def test_square_count_c4():
    got = square_count(_sym_edges([(0, 1), (1, 2), (2, 3), (3, 0)]))
    assert got["squares"][0].as_py() == 1


def test_square_count_k23():
    # complete bipartite K_{2,3}: C(2,2)*C(3,2) = 3 squares
    pairs = [(a, b) for a in (0, 1) for b in (2, 3, 4)]
    got = square_count(_sym_edges(pairs))
    assert got["squares"][0].as_py() == 3


def test_square_count_triangle_free_of_squares():
    got = square_count(_sym_edges([(0, 1), (1, 2), (2, 0)]))
    assert got["squares"][0].as_py() == 0
    assert got["codeg_pairs"][0].as_py() == 0


@pytest.mark.parametrize("seed,nblocks", [(7, 2), (8, 5), (9, 1)])
def test_square_count_random_brute_force(seed, nblocks):
    rng = np.random.default_rng(seed)
    n = 14
    pairs = [(a, b) for a, b in itertools.combinations(range(n), 2)
             if rng.random() < 0.3]
    got = square_count(_sym_edges(pairs, nblocks))
    assert got["squares"][0].as_py() == _brute_squares(pairs)


def _bip_ds(edges: list[tuple[int, int]], nblocks: int = 3):
    # deliberately duplicated rows: the operator must distinct first
    e2 = edges + edges[: len(edges) // 2]
    t = pa.table({"g": pa.array([a for a, _ in e2], pa.int64()),
                  "i": pa.array([b for _, b in e2], pa.int64())})
    return rd.from_arrow(t).repartition(nblocks)


def _brute_bipartite(edges: list[tuple[int, int]]) -> tuple[int, int]:
    es = set(edges)
    items = sorted({i for _, i in es})
    gdeg: dict[int, int] = {}
    ideg: dict[int, int] = {}
    for g, i in es:
        gdeg[g] = gdeg.get(g, 0) + 1
        ideg[i] = ideg.get(i, 0) + 1
    bf = 0
    for i1, i2 in itertools.combinations(items, 2):
        co = len({g for g, i in es if i == i1}
                 & {g for g, i in es if i == i2})
        bf += co * (co - 1) // 2
    ct = sum((gdeg[g] - 1) * (ideg[i] - 1) for g, i in es)
    return bf, ct


def test_bipartite_motifs_k23():
    edges = [(a, b) for a in (10, 11) for b in (0, 1, 2)]
    got = bipartite_motifs(_bip_ds(edges), "g", "i").to_pandas()
    assert got["butterflies"][0] == 3
    assert got["caterpillars"][0] == 12
    assert got["bcc"][0] == 1.0  # complete bipartite graphs are closed


@pytest.mark.parametrize("seed,nblocks", [(3, 2), (4, 4)])
def test_bipartite_motifs_random_brute_force(seed, nblocks):
    rng = np.random.default_rng(seed)
    edges = sorted({(int(rng.integers(0, 9)), int(rng.integers(100, 112)))
                    for _ in range(60)})
    bf, ct = _brute_bipartite(edges)
    got = bipartite_motifs(_bip_ds(edges, nblocks), "g", "i").to_pandas()
    assert got["butterflies"][0] == bf
    assert got["caterpillars"][0] == ct
    exp_bcc = round(4.0 * bf / ct, 6) if ct else 0.0
    assert got["bcc"][0] == pytest.approx(exp_bcc, abs=1e-9)


def _fnv(token: str) -> int:
    h = 0xCBF29CE484222325
    for byte in token.encode("utf-8"):
        h = ((h ^ byte) * 0x100000001B3) % (1 << 64)
    return h


def _brute_linear_score(text: str | None, dim: int = 65536):
    import re
    toks = [t for t in re.split(r"\W+", (text or "").lower()) if t]
    wsum = 0
    for t in toks:
        b = _fnv(t) % dim
        wsum += (b * 2654435761) % (1 << 32) - (1 << 31)
    n = len(toks)
    score = round(wsum / (n * float(1 << 32)), 6) if n else 0.0
    return n, wsum, score, wsum > 0


@pytest.mark.parametrize("nblocks", [1, 4])
def test_hashed_linear_score_brute_force(nblocks):
    from cuttana_ray.functions.textstats import hashed_linear_score
    texts = ["The quick brown fox. Jumps!", "", None, "aaa aaa aaa",
             "Ray Data engines stream Arrow batches 123 -- zero copy?",
             "x", "mixed CASE Tokens, mixed case tokens"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = hashed_linear_score(rd.from_arrow(t).repartition(nblocks)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    for i, text in enumerate(texts):
        n, wsum, score, keep = _brute_linear_score(text)
        assert got["n_tokens"][i] == n, (i, text)
        assert got["wsum"][i] == wsum
        assert got["score"][i] == pytest.approx(score, abs=1e-9)
        assert bool(got["keep"][i]) == keep


def _brute_bpe_word(word: str, merges) -> int:
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


@pytest.mark.parametrize("nblocks", [1, 3])
def test_encode_with_merges_brute_force(nblocks):
    import re
    from cuttana_ray.functions.bpe import encode_with_merges
    merges = [("t", "h"), ("th", "e"), ("a", "a"), ("e", "r")]
    texts = ["the theory of everything", "aaaa aaa a", "", None,
             "THE THETHE ther", "xyz", "er er era threr"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = encode_with_merges(rd.from_arrow(t).repartition(nblocks),
                             merges).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for i, text in enumerate(texts):
        words = [w for w in re.split(r"\W+", (text or "").lower()) if w]
        nc = sum(len(w) for w in words)
        ns = sum(_brute_bpe_word(w, merges) for w in words)
        assert got["n_words"][i] == len(words), (i, text)
        assert got["n_chars"][i] == nc
        assert got["n_symbols"][i] == ns, (i, text)
        comp = round(nc / ns, 6) if ns else 0.0
        assert got["compression"][i] == pytest.approx(comp, abs=1e-9)
        assert got["n_symbols"][i] <= got["n_chars"][i]


@pytest.mark.parametrize("nblocks", [1, 3])
def test_bm25_scores_brute_force(nblocks):
    import math
    import re
    from cuttana_ray.functions.terms import bm25_scores
    texts = ["stream batch join stream", "batch batch", "",
             "nothing relevant here", None, "join", "stream " * 30]
    terms = ["stream", "batch", "join"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = bm25_scores(rd.from_arrow(t).repartition(nblocks), terms) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    toks = [[w for w in re.split(r"\W+", (x or "").lower()) if w]
            for x in texts]
    N = len(texts)
    avgdl = sum(len(ws) for ws in toks) / N
    df = {q: sum(1 for ws in toks if q in ws) for q in terms}
    k1, b = 1.2, 0.75
    exp = {}
    for i, ws in enumerate(toks):
        s, nm = 0.0, 0
        for q in terms:
            tf = ws.count(q)
            if tf:
                idf = math.log((N - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
                s += idf * tf * (k1 + 1.0) / (
                    tf + k1 * (1.0 - b + b * len(ws) / avgdl))
                nm += 1
        if nm:
            exp[i] = (len(ws), nm, round(s, 6))
    assert set(got["doc_id"]) == set(exp)
    for _, r in got.iterrows():
        dl, nm, s = exp[r["doc_id"]]
        assert r["dl"] == dl and r["n_matched"] == nm
        assert r["score"] == pytest.approx(s, abs=1e-9)


@pytest.mark.parametrize("qname,builder", [
    ("bpe_encode_docs", "_bpe_encode_sql"),
])
def test_bpe_oracle_adjacent_merge_semantics(qname, builder):
    """The SQL oracle's REPLACE replay must equal the engine's greedy
    scan even when the SAME merge applies at ADJACENT positions ('erer'
    under (e,r), 'thethe' under (th,e), 'aaaa' runs) — the case a
    shared-delimiter encoding silently gets wrong."""
    import duckdb

    import __ray_entry__ as entry
    from cuttana_ray.functions.bpe import encode_with_merges

    texts = ["erer rere ththe thethe", "aaaa aaaaaa anand andand",
             "ouou inin thth erere"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = encode_with_merges(rd.from_arrow(t).repartition(2),
                             entry._BPE_FIXED_MERGES).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    exp = con.sql(getattr(entry, builder)()).df() \
        .sort_values("doc_id").reset_index(drop=True)
    con.close()
    for col in ["n_words", "n_chars", "n_symbols"]:
        assert list(got[col]) == list(exp[col]), col
    assert np.allclose(got["compression"], exp["compression"], atol=1e-9)


def _brute_bipartite_check(und_edges, n):
    """Independent 2-coloring via Python BFS per component; returns
    {root: (n_vertices, odd_edges, is_bipartite)}."""
    adj = [[] for _ in range(n)]
    for a, b in und_edges:
        adj[a].append(b)
        adj[b].append(a)
    comp = [-1] * n
    dist = [0] * n
    for s in range(n):
        if comp[s] != -1:
            continue
        comp[s] = s
        q = [s]
        while q:
            nxt = []
            for v in q:
                for w in adj[v]:
                    if comp[w] == -1:
                        comp[w] = s
                        dist[w] = dist[v] + 1
                        nxt.append(w)
            q = nxt
    out = {}
    for s in set(comp):
        verts = [v for v in range(n) if comp[v] == s]
        odd = sum(1 for a, b in und_edges
                  if comp[a] == s and dist[a] % 2 == dist[b] % 2)
        out[s] = (len(verts), odd, odd == 0)
    return out


@pytest.mark.parametrize("edges,n", [
    # even cycle (bipartite) + triangle (odd) + isolated vertex
    ([(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 4)], 8),
    # C5: exactly one same-parity witness edge
    ([(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)], 5),
    # K2,3 (bipartite even though it has 4-cycles)
    ([(a, b) for a in (0, 1) for b in (2, 3, 4)], 5),
])
def test_bipartiteness_known_graphs(edges, n):
    from cuttana_ray.pipelines.components import bipartiteness
    from tests.test_graph_algos import graph_from_edges
    got = bipartiteness(graph_from_edges(edges, n)).to_pandas() \
        .set_index("component")
    exp = _brute_bipartite_check(edges, n)
    assert set(got.index) == set(exp)
    for c, (nv, odd, bip) in exp.items():
        assert got.loc[c, "n_vertices"] == nv
        assert got.loc[c, "odd_edges"] == odd, (c, edges)
        assert bool(got.loc[c, "is_bipartite"]) == bip


def test_bipartiteness_random_brute_force():
    from cuttana_ray.pipelines.components import bipartiteness
    from tests.test_graph_algos import graph_from_edges
    rng = np.random.default_rng(11)
    n = 18
    edges = [(a, b) for a, b in itertools.combinations(range(n), 2)
             if rng.random() < 0.12]
    got = bipartiteness(graph_from_edges(edges, n, num_blocks=4)) \
        .to_pandas().set_index("component")
    exp = _brute_bipartite_check(edges, n)
    assert set(got.index) == set(exp)
    for c, (nv, odd, bip) in exp.items():
        assert (got.loc[c, "n_vertices"], got.loc[c, "odd_edges"],
                bool(got.loc[c, "is_bipartite"])) == (nv, odd, bip)


def _brute_wl(und_edges, n, rounds=3):
    """Independent per-vertex dict-loop WL with the same Mersenne31
    multiset hash and dense-rank relabel."""
    P, MULT = 2_147_483_647, 48_271
    adj = [[] for _ in range(n)]
    for a, b in und_edges:
        adj[a].append(b)
        adj[b].append(a)
    colors = [len(set(adj[v])) for v in range(n)]
    # engine graphs are distinct-pair symmetric: dedup adjacency
    adj = [sorted(set(a)) for a in adj]
    for _ in range(rounds):
        sigs = [(colors[v],
                 sum((colors[u] * MULT) % P for u in adj[v]) % P)
                for v in range(n)]
        ranks = {s: i for i, s in enumerate(sorted(set(sigs)))}
        colors = [ranks[s] for s in sigs]
    return colors


@pytest.mark.parametrize("edges,n,expect_classes", [
    ([(0, 1), (1, 2), (2, 3), (3, 4)], 5, 3),       # path P5: end/next/mid
    ([(0, 1), (1, 2), (2, 3), (3, 0)], 4, 1),        # C4: vertex-transitive
    # C6 vs 2xC3 in one graph: both 2-regular, 1-WL cannot separate them
    ([(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0),
      (6, 7), (7, 8), (8, 6), (9, 10), (10, 11), (11, 9)], 12, 1),
])
def test_wl_refinement_known_graphs(edges, n, expect_classes):
    from cuttana_ray.pipelines.wl import wl_refinement
    from tests.test_graph_algos import graph_from_edges
    got = wl_refinement(graph_from_edges(edges, n)).to_pandas() \
        .sort_values("vertex")["color"].to_list()
    assert got == _brute_wl(edges, n)
    assert len(set(got)) == expect_classes


@pytest.mark.parametrize("seed,nblocks,rounds", [(5, 2, 3), (6, 5, 4)])
def test_wl_refinement_random_brute_force(seed, nblocks, rounds):
    from cuttana_ray.pipelines.wl import wl_refinement
    from tests.test_graph_algos import graph_from_edges
    rng = np.random.default_rng(seed)
    n = 16
    edges = [(a, b) for a, b in itertools.combinations(range(n), 2)
             if rng.random() < 0.2]
    got = wl_refinement(graph_from_edges(edges, n, num_blocks=nblocks),
                        rounds=rounds).to_pandas() \
        .sort_values("vertex")["color"].to_list()
    assert got == _brute_wl(edges, n, rounds)


def test_wl_refinement_isomorphism_invariant():
    """A relabeled isomorphic copy must land on the identical canonical
    color partition (same class sizes per color id)."""
    from cuttana_ray.pipelines.wl import wl_refinement
    from tests.test_graph_algos import graph_from_edges
    rng = np.random.default_rng(12)
    n = 14
    edges = [(a, b) for a, b in itertools.combinations(range(n), 2)
             if rng.random() < 0.25]
    perm = rng.permutation(n)
    pedges = [(int(perm[a]), int(perm[b])) for a, b in edges]
    c1 = wl_refinement(graph_from_edges(edges, n)).to_pandas()
    c2 = wl_refinement(graph_from_edges(pedges, n)).to_pandas()
    h1 = c1.groupby("color").size().sort_index()
    h2 = c2.groupby("color").size().sort_index()
    assert list(h1.index) == list(h2.index)
    assert list(h1) == list(h2)
    # and the permutation maps colors pointwise
    m1 = c1.set_index("vertex")["color"]
    m2 = c2.set_index("vertex")["color"]
    assert all(m2[perm[v]] == m1[v] for v in range(n))


def _brute_salsa(src, dst, w, n, iters=4):
    outw = np.zeros(n)
    inw = np.zeros(n)
    np.add.at(outw, src, w)
    np.add.at(inw, dst, w)
    ow = np.where(outw > 0, outw, 1.0)
    iw = np.where(inw > 0, inw, 1.0)
    h = np.full(n, 1.0 / n)
    for _ in range(iters):
        a = np.zeros(n)
        np.add.at(a, dst, h[src] * (w / ow[src]))
        if a.sum() > 0:
            a = a / a.sum()
        h = np.zeros(n)
        np.add.at(h, src, a[dst] * (w / iw[dst]))
        if h.sum() > 0:
            h = h / h.sum()
    return a, h


@pytest.mark.parametrize("seed,nblocks,iters", [(21, 1, 4), (22, 4, 3)])
def test_salsa_random_brute_force(seed, nblocks, iters):
    from cuttana_ray.pipelines.hits import salsa
    rng = np.random.default_rng(seed)
    n, m = 12, 40
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.integers(1, 5, len(src)).astype(np.int64)
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst),
                  "weight": pa.array(w)})
    res = salsa(rd.from_arrow(t).repartition(nblocks), n,
                max_iters=iters, tol=0.0)
    a, h = _brute_salsa(src, dst, w.astype(np.float64), n, iters)
    np.testing.assert_allclose(res.authority, a, atol=1e-12)
    np.testing.assert_allclose(res.hub, h, atol=1e-12)
    # L1 normalization invariant
    assert res.authority.sum() == pytest.approx(1.0)
    assert res.hub.sum() == pytest.approx(1.0)


def _brute_weighted_clustering(und_edges_w, n):
    """Independent dict-loop Onnela coefficient."""
    w = {}
    adj = [set() for _ in range(n)]
    for a, b, x in und_edges_w:
        w[frozenset((a, b))] = x
        adj[a].add(b)
        adj[b].add(a)
    wmax = max(w.values()) if w else 1.0
    out = []
    for v in range(n):
        k = len(adj[v])
        if k < 2:
            out.append(0.0)
            continue
        s = 0.0
        for j, h in itertools.combinations(sorted(adj[v]), 2):
            if h in adj[j]:
                p = (w[frozenset((v, j))] * w[frozenset((j, h))]
                     * w[frozenset((v, h))])
                s += (p ** (1.0 / 3.0)) / wmax
        out.append(round(2.0 * s / (k * (k - 1)), 6))
    return out


@pytest.mark.parametrize("seed,nblocks", [(31, 2), (32, 5)])
def test_weighted_clustering_brute_force(seed, nblocks):
    from cuttana_ray.pipelines.triangles import weighted_clustering
    from cuttana_ray.pipelines.graph import Graph
    rng = np.random.default_rng(seed)
    n = 12
    und = [(a, b, float(rng.integers(1, 9)))
           for a, b in itertools.combinations(range(n), 2)
           if rng.random() < 0.35]
    src = [a for a, b, _ in und] + [b for a, b, _ in und]
    dst = [b for a, b, _ in und] + [a for a, b, _ in und]
    ws = [x for _, _, x in und] * 2
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64()),
                  "weight": pa.array([int(x) for x in ws], pa.int64())})
    nodes = pa.table({"node_id": pa.array(np.arange(n, dtype=np.int64)),
                      "name": pa.array([f"v{i}" for i in range(n)]),
                      "kind": pa.array(["v"] * n)})
    g = Graph(rd.from_arrow(t).repartition(nblocks).materialize(), nodes, n)
    got = weighted_clustering(g).to_pandas().sort_values("vertex")
    exp = _brute_weighted_clustering(und, n)
    np.testing.assert_allclose(got["wclustering"].to_numpy(),
                               np.array(exp), atol=1e-6)
    # unweighted special case: all weights equal -> reduces to C(v)
    eq = [(a, b, 1.0) for a, b, _ in und]
    t2 = pa.table({"src": pa.array(src, pa.int64()),
                   "dst": pa.array(dst, pa.int64()),
                   "weight": pa.array([1] * len(src), pa.int64())})
    g2 = Graph(rd.from_arrow(t2).repartition(nblocks).materialize(),
               nodes, n)
    got2 = weighted_clustering(g2).to_pandas().sort_values("vertex")
    np.testing.assert_allclose(
        got2["wclustering"].to_numpy(),
        np.array(_brute_weighted_clustering(eq, n)), atol=1e-6)


@pytest.mark.parametrize("nblocks", [1, 3])
def test_boilerplate_sentences_brute_force(nblocks):
    import re
    from cuttana_ray.functions.textstats import boilerplate_sentences
    texts = ["Hello world. Subscribe now! Unique thought one.",
             "Different body? Subscribe now! hello WORLD.",
             "subscribe now!   Subscribe  now! Solo sentence.",
             "", None, "No repeats here at all"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = boilerplate_sentences(rd.from_arrow(t).repartition(nblocks),
                                min_docs=2).to_pandas() \
        .sort_values("sentence").reset_index(drop=True)
    # brute force: per-doc distinct normalized sentences, count docs
    counts = {}
    for x in texts:
        seen = set()
        for s in re.split(r"[.!?]+", x or ""):
            s = s.strip(" ").lower()
            if s:
                seen.add(s)
        for s in seen:
            counts[s] = counts.get(s, 0) + 1
    exp = sorted((s, c) for s, c in counts.items() if c >= 2)
    assert list(zip(got["sentence"], got["n_docs"])) == exp
    # 'subscribe now' appears in 3 docs despite intra-doc repeats
    assert dict(exp)["subscribe now"] == 3
    assert dict(exp)["hello world"] == 2


def test_edge_embeddedness_known():
    # triangle 0-1-2 plus pendant edge 2-3: triangle edges have
    # embeddedness 1, the pendant edge is a local bridge (0)
    from cuttana_ray.pipelines.graph import Graph
    from cuttana_ray.pipelines.triangles import edge_embeddedness
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3)]
    n = 4
    edges = _sym_edges(pairs, 2).map_batches(
        lambda t: t.append_column(
            "weight", pa.array([1] * len(t), pa.int64())),
        batch_format="pyarrow")
    nodes = pa.table({"node_id": pa.array(np.arange(n, dtype=np.int64)),
                      "name": pa.array([f"v{i}" for i in range(n)]),
                      "kind": pa.array(["v"] * n)})
    g = Graph(edges.materialize(), nodes, n)
    got = edge_embeddedness(g).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    exp = {(0, 1): 1, (0, 2): 1, (1, 2): 1, (2, 3): 0}
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert exp[(r["a"], r["b"])] == r["embeddedness"]


@pytest.mark.parametrize("seed,nblocks", [(21, 2), (22, 5)])
def test_edge_embeddedness_random_brute_force(seed, nblocks):
    from cuttana_ray.pipelines.graph import Graph
    from cuttana_ray.pipelines.triangles import edge_embeddedness
    rng = np.random.default_rng(seed)
    n = 16
    pairs = [(a, b) for a, b in itertools.combinations(range(n), 2)
             if rng.random() < 0.25]
    edges = _sym_edges(pairs, nblocks).map_batches(
        lambda t: t.append_column(
            "weight", pa.array([1] * len(t), pa.int64())),
        batch_format="pyarrow")
    nodes = pa.table({"node_id": pa.array(np.arange(n, dtype=np.int64)),
                      "name": pa.array([f"v{i}" for i in range(n)]),
                      "kind": pa.array(["v"] * n)})
    g = Graph(edges.materialize(), nodes, n)
    got = edge_embeddedness(g).to_pandas()
    adj = [set() for _ in range(n)]
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    exp = {(a, b): len(adj[a] & adj[b]) for a, b in pairs}
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert exp[(r["a"], r["b"])] == r["embeddedness"]
