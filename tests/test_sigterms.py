"""Significant terms (sigterms.py) vs a scalar recount over the fixture
corpus, plus the JLH edge semantics: the query term dominates, terms with
fg% == bg% (e.g. the planted every-doc 'check' token) are strictly
excluded, empty input yields the empty schema."""

import re

import numpy as np
import pytest

from searchengine_ray.config import ModelParams
from searchengine_ray.engine import SearchEngine

_TOKEN = re.compile(r"[a-z0-9_]+")
_STOP = None


def _stops():
    global _STOP
    if _STOP is None:
        from searchengine_ray.analyze import STOPWORDS

        _STOP = STOPWORDS
    return _STOP


def _scalar_jlh(texts, matched, k):
    docs = [set(t for t in _TOKEN.findall(x.lower()) if t not in _stops())
            for x in texts]
    fgt, bgt = len(matched), len(docs)
    fg, bg = {}, {}
    for d, ts in enumerate(docs):
        for t in ts:
            bg[t] = bg.get(t, 0) + 1
            if d in matched:
                fg[t] = fg.get(t, 0) + 1
    out = []
    for t, f in fg.items():
        fgp, bgp = f / fgt, bg[t] / bgt
        if fgp > bgp:
            out.append((t, f, bg[t], (fgp - bgp) * (fgp / bgp)))
    out.sort(key=lambda r: (-r[3], r[0]))
    return out[:k]


@pytest.fixture(scope="module")
def _corpus_parquet(fixture_corpus, tmp_path_factory):
    """sigterms re-reads documents.parquet(doc_id, text); derive one from
    the fixture corpus so the analyzer input matches the built index."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    d = tmp_path_factory.mktemp("sig")
    t = pa.table(
        {
            "doc_id": pa.array(range(fixture_corpus.num_rows), type=pa.int64()),
            "text": fixture_corpus.column("content"),
        }
    )
    papq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_sigterms_matches_scalar_recount(built_index, fixture_corpus, _corpus_parquet):
    from searchengine_ray.sigterms import significant_terms

    eng = SearchEngine(built_index, ModelParams(model="unrankedboolean"))
    matched = eng.search("q", "unit").column("doc_id").to_numpy()
    got = significant_terms(
        eng.index, _corpus_parquet, np.asarray(matched), k=8
    ).to_pandas()
    want = _scalar_jlh(
        fixture_corpus.column("content").to_pylist(),
        set(int(d) for d in matched),
        8,
    )
    assert got["term"].tolist() == [w[0] for w in want]
    assert got["fg"].tolist() == [w[1] for w in want]
    assert got["bg"].tolist() == [w[2] for w in want]
    for g, w in zip(got["score_r"], want):
        assert abs(g - w[3]) < 5e-7
    # the query term itself is maximally uncommonly-common -> rank 1
    assert got["term"][0] == "unit"
    # the planted every-doc token has fg% == bg% == 1 -> strictly excluded
    assert "check" not in set(got["term"])


def test_sigterms_empty_matched(built_index, _corpus_parquet):
    from searchengine_ray.sigterms import significant_terms

    eng = SearchEngine(built_index, ModelParams(model="unrankedboolean"))
    t = significant_terms(eng.index, _corpus_parquet, np.empty(0, np.int64))
    assert t.num_rows == 0
    assert t.schema.names == ["term", "fg", "bg", "score_r", "rank"]
