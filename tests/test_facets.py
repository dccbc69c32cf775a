"""facets.facet_counts vs a brute-force recount from the fixture corpus."""

import numpy as np

from searchengine_ray.config import ModelParams
from searchengine_ray.engine import SearchEngine
from searchengine_ray.facets import facet_counts


def test_counts_match_corpus(built_index, fixture_corpus):
    eng = SearchEngine(built_index, ModelParams(model="unrankedboolean"))
    matched = eng.search("q", "mutex").column("doc_id").to_numpy()
    got = {
        f: n
        for f, n in zip(
            facet_counts(eng.index, matched).column("facet").to_pylist(),
            facet_counts(eng.index, matched).column("n").to_pylist(),
        )
    }
    langs = fixture_corpus.column("lang").to_pylist()
    ids = fixture_corpus.column("doc_id").to_pylist()
    want: dict[str, int] = {}
    ms = set(int(d) for d in matched)
    for d, lg in zip(ids, langs):
        if d in ms:
            want[lg.lower()] = want.get(lg.lower(), 0) + 1
    assert got == want
    assert sum(got.values()) == len(ms)  # facet field covers every doc


def test_empty_matched(built_index):
    eng = SearchEngine(built_index, ModelParams(model="unrankedboolean"))
    t = facet_counts(eng.index, np.empty(0, np.int64))
    assert t.num_rows == 0 and t.schema.names == ["facet", "n"]


def test_search_after_pages_tile_the_full_ranking(built_index):
    """Three cursor pages concatenated == top-30 of one search — no
    overlap, no gap, even across score ties."""
    import pyarrow as pa

    eng = SearchEngine(built_index, ModelParams(model="bm25", top_k=30))
    q = "mutex thread lock"
    full = eng.search("q", q)
    eng10 = SearchEngine(built_index, ModelParams(model="bm25", top_k=10))
    pages = [eng10.search("q", q)]
    for _ in range(2):
        last = pages[-1]
        after = (
            last.column("score")[-1].as_py(),
            last.column("external_id")[-1].as_py(),
        )
        pages.append(eng10.search_after("q", q, after, 10))
    tiled = pa.concat_tables(pages)
    assert tiled.column("doc_id").to_pylist() == full.column("doc_id").to_pylist()
    assert tiled.column("score").to_pylist() == full.column("score").to_pylist()


def test_search_after_splits_score_ties_by_external_id(built_index):
    """UnrankedBoolean gives every match score 1.0 — one giant tie — so
    paging order is PURELY the external-id tie-break; cursoring through
    must enumerate matches in external-id order with no repeats."""
    eng = SearchEngine(built_index, ModelParams(model="unrankedboolean", top_k=1 << 30))
    q = "mutex"
    all_ext = eng.search("q", q).column("external_id").to_pylist()
    assert len(all_ext) > 6
    assert all_ext == sorted(all_ext)  # the tie-break IS the order
    got, after = [], None
    eng3 = SearchEngine(built_index, ModelParams(model="unrankedboolean"))
    while True:
        page = (
            eng3.search_after("q", q, after, 3)
            if after is not None
            else eng3.search("q", q).slice(0, 3)
        )
        if page.num_rows == 0:
            break
        got.extend(page.column("external_id").to_pylist())
        after = (
            page.column("score")[-1].as_py(),
            page.column("external_id")[-1].as_py(),
        )
    assert got == all_ext


def test_collapse_top1_matches_bruteforce(built_index, fixture_corpus):
    from searchengine_ray.facets import collapse_top1

    eng = SearchEngine(built_index, ModelParams(model="bm25", top_k=1 << 30))
    t = eng.search("q", "mutex thread")
    docs = t.column("doc_id").to_numpy()
    scores = t.column("score").to_numpy()
    exts = t.column("external_id").to_pylist()
    lang_of = dict(
        zip(
            fixture_corpus.column("doc_id").to_pylist(),
            [s.lower() for s in fixture_corpus.column("lang").to_pylist()],
        )
    )
    best: dict[str, tuple] = {}
    for d, s, e in zip(docs, scores, exts):
        lg = lang_of[int(d)]
        key = (-s, e)
        if lg not in best or key < best[lg][0]:
            best[lg] = (key, int(d), float(s))
    got = collapse_top1(eng.index, docs, scores)
    assert got.num_rows == len(best)
    for f, d, s in zip(
        got.column("facet").to_pylist(),
        got.column("doc_id").to_pylist(),
        got.column("score").to_pylist(),
    ):
        assert best[f][1] == d and best[f][2] == s
    # output ordered by (score desc, external id asc)
    ss = got.column("score").to_pylist()
    assert ss == sorted(ss, reverse=True) or len(set(ss)) < len(ss)
