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
