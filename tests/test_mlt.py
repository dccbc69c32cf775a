"""MoreLikeThis: term selection vs a transparent recount, and the e2e
like->search loop retrieving a planted identical-content document."""

import numpy as np
import pyarrow.compute as pc

from searchengine_ray.config import ModelParams
from searchengine_ray.engine import SearchEngine
from searchengine_ray.mlt import more_like_this, select_terms


def test_select_terms_matches_recount(built_index, fixture_corpus):
    eng = SearchEngine(built_index, ModelParams(model="bm25"))
    text = fixture_corpus.column("content")[0].as_py()
    t = select_terms(eng.index, text, top_n=8)
    assert 0 < t.num_rows <= 8
    # transparent recount: tf from the text, df/N from the index
    from searchengine_ray.analyze import STOPWORDS, tokenize

    toks = [x for x in tokenize(text) if x not in STOPWORDS]
    want = {}
    for term in set(toks):
        p = eng.index.postings("body", term, need_positions=False)
        if p.stat_df:
            want[term] = toks.count(term) * float(
                np.log(eng.index.num_docs / p.stat_df)
            )
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
    got = list(
        zip(t.column("term").to_pylist(), t.column("score").to_pylist())
    )
    assert [g[0] for g in got] == [w[0] for w in ranked]
    assert np.allclose([g[1] for g in got], [w[1] for w in ranked])
    # scores are sorted desc
    s = t.column("score").to_numpy()
    assert (np.diff(s) <= 1e-12).all()


def test_mlt_finds_identical_twin(built_index, fixture_corpus):
    """The fixture plants tie/aa + tie/bb with IDENTICAL content: MLT of
    aa's text must rank bb at #1 once aa itself is excluded."""
    eng = SearchEngine(built_index, ModelParams(model="bm25", top_k=1 << 30))
    repos = fixture_corpus.column("repo").to_pylist()
    ids = fixture_corpus.column("doc_id").to_pylist()
    texts = fixture_corpus.column("content").to_pylist()
    aa = repos.index("tie/aa")
    bb = repos.index("tie/bb")
    res = more_like_this(
        eng, texts[aa], top_n=5, exclude_doc_id=ids[aa]
    ).to_pandas()
    assert len(res) > 0
    assert ids[aa] not in set(res.doc_id)
    assert res.iloc[0].doc_id == ids[bb]


def test_mlt_empty_text(built_index):
    eng = SearchEngine(built_index, ModelParams(model="bm25"))
    t = select_terms(eng.index, "the and of")  # all stopwords
    assert t.num_rows == 0
