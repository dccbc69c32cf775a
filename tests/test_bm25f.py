"""BM25F (bm25f.py) vs a pure-Python recount over the fixture corpus,
plus the algebraic properties that pin its semantics: single-field
degeneration to plain BM25, and the saturation subadditivity that
distinguishes tf-level combination from score-level #WSUM."""

import math
import re

import numpy as np
import pyarrow as pa

from searchengine_ray.bm25f import bm25f_search
from searchengine_ray.config import ModelParams
from searchengine_ray.engine import SearchEngine

K1, B = 1.2, 0.75
_TOKEN = re.compile(r"[a-z0-9_]+")


def _field_texts(corpus: pa.Table) -> dict[str, list[str]]:
    return {
        "body": [s.lower() for s in corpus.column("content").to_pylist()],
        "title": [s.lower() for s in corpus.column("path").to_pylist()],
        "keywords": [s.lower() for s in corpus.column("lang").to_pylist()],
    }


def _scalar_bm25f(corpus, terms, weights):
    """Plain-Python BM25F recount straight from the corpus strings."""
    texts = _field_texts(corpus)
    n = corpus.num_rows
    toks = {f: [_TOKEN.findall(t) for t in texts[f]] for f in weights}
    dls = {f: [len(t) for t in toks[f]] for f in weights}
    ave = {
        f: sum(dls[f]) / sum(1 for x in dls[f] if x > 0) for f in weights
    }
    out = {}
    for t in terms:
        tft = {}
        for f, w in weights.items():
            for d in range(n):
                tf = toks[f][d].count(t)
                if tf:
                    tft[d] = tft.get(d, 0.0) + w * tf / (
                        (1.0 - B) + B * dls[f][d] / ave[f]
                    )
        df = len(tft)
        if df == 0:
            continue
        idf = max(0.0, math.log((n - df + 0.5) / (df + 0.5)))
        for d, x in tft.items():
            out[d] = out.get(d, 0.0) + idf * x / (K1 + x)
    return out


def test_bm25f_matches_scalar_recount(built_index, fixture_corpus):
    eng = SearchEngine(built_index, ModelParams(model="bm25"))
    weights = {"body": 1.0, "title": 0.8, "keywords": 1.5}
    terms = ["mutex", "py"]  # 'py' is in title (extension) AND keywords
    got = bm25f_search(eng.index, terms, weights).to_pandas()
    want = _scalar_bm25f(fixture_corpus, terms, weights)
    assert set(got["doc_id"]) == set(want)
    for r in got.itertuples():
        assert abs(r.score_r - want[r.doc_id]) < 5e-6


def test_bm25f_single_field_is_plain_bm25(built_index):
    """With one field at weight 1.0, BM25F's idf*tft/(k1+tft) over
    tft = tf/D algebraically equals BM25's idf*tf/(tf + k1*D)."""
    eng = SearchEngine(built_index, ModelParams(model="bm25", top_k=1 << 30))
    f = bm25f_search(eng.index, ["mutex"], {"body": 1.0}).to_pandas()
    b = eng.search("q", "mutex").to_pandas()
    bm = dict(zip(b["doc_id"], b["score"]))
    assert set(f["doc_id"]) == set(bm)
    for r in f.itertuples():
        assert abs(r.score_r - bm[r.doc_id]) < 5e-6


def test_bm25f_cross_field_saturates_subadditively(built_index):
    """For docs matching 'py' in BOTH title and keywords, the combined
    score is strictly LESS than the sum of the two single-field scores
    (x/(k1+x) is concave) — the property score-level #WSUM lacks —
    while still strictly exceeding either single-field score alone."""
    eng = SearchEngine(built_index, ModelParams(model="bm25"))
    both = bm25f_search(
        eng.index, ["py"], {"title": 0.8, "keywords": 1.5}
    ).to_pandas()
    t_only = bm25f_search(eng.index, ["py"], {"title": 0.8}).to_pandas()
    k_only = bm25f_search(eng.index, ["py"], {"keywords": 1.5}).to_pandas()
    tt = dict(zip(t_only["doc_id"], t_only["score_r"]))
    kk = dict(zip(k_only["doc_id"], k_only["score_r"]))
    # same doc set: the py-lang docs carry .py in the path AND py keyword
    assert set(both["doc_id"]) == set(tt) == set(kk)
    checked = 0
    for r in both.itertuples():
        # NOTE: single-field runs have df == union df here (same doc set),
        # so idf is identical and the comparison isolates the saturation
        assert r.score_r < tt[r.doc_id] + kk[r.doc_id] - 1e-9
        assert r.score_r > max(tt[r.doc_id], kk[r.doc_id]) + 1e-9
        checked += 1
    assert checked > 0


def test_bm25f_unknown_term_empty(built_index):
    eng = SearchEngine(built_index, ModelParams(model="bm25"))
    t = bm25f_search(eng.index, ["zzzznotaterm"], {"body": 1.0})
    assert t.num_rows == 0 and t.schema.names == ["doc_id", "score_r"]
