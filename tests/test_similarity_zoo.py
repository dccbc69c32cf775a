"""Similarity zoo through the §2.12 registered-model surface: LM
Jelinek-Mercer (exp-domain prod reducer) and Axiomatic F2EXP — the two
extra Lucene similarity lineages beside BM25/TF-IDF, each pinned against
a pure-Python scalar recount and the doc-sharded two-phase serving path
(the first models to push the CTF all-reduce through a registered leaf).
"""

import math

import numpy as np
import pytest

from searchengine_ray.config import ModelParams
from searchengine_ray.engine import SearchEngine


def _leaf_stats(idx, term):
    p = idx.postings("body", term, need_positions=False)
    return p


def _lmjm_leaf_scalar(idx, term, doc):
    """Scalar replay of config._lmjm_leaf for one (term, doc)."""
    p = _leaf_stats(idx, term)
    pos = int(np.searchsorted(p.doc_ids, doc))
    if pos >= p.df or p.doc_ids[pos] != doc:
        return None
    tf = float(p.tfs[pos])
    dl = float(idx.doclen("body", np.array([doc]))[0])
    lam = 0.01
    ctf = int(p.tfs.sum())
    clen = idx.sum_field_lengths("body")
    denom = lam * (ctf / clen)
    return 1.0 + ((1.0 - lam) * (tf / dl)) / denom


def test_lmjm_scalar_recount(ray_session, built_index):
    eng = SearchEngine(built_index, ModelParams(model="lmjm", top_k=1 << 30))
    t = eng.search("q", "mutex lock").to_pandas()
    assert len(t) > 0
    idx = eng.index
    for _, row in t.iterrows():
        d, s = int(row["doc_id"]), 1.0
        for term in ("mutex", "lock"):
            leaf = _lmjm_leaf_scalar(idx, term, d)
            if leaf is not None:
                s *= leaf
        # every op is rational IEEE in a fixed association -> exact
        assert row["score"] == s


def test_lmjm_rank_matches_lucene_loglinear(ray_session, built_index):
    """The exp-domain score is exp(Lucene LMJM score): ln(engine score)
    equals the sum of per-term ln(1+x) contributions, and the induced
    ranking (doc_id tie-break) is identical."""
    eng = SearchEngine(built_index, ModelParams(model="lmjm", top_k=1 << 30))
    t = eng.search("q", "mutex lock").to_pandas()
    docs = t["doc_id"].astype(int).to_numpy()
    idx = eng.index
    loglin = []
    for d in docs:
        s = 0.0
        for term in ("mutex", "lock"):
            leaf = _lmjm_leaf_scalar(idx, term, int(d))
            if leaf is not None:
                s += math.log(leaf)
        loglin.append(s)
    loglin = np.asarray(loglin)
    np.testing.assert_allclose(
        np.log(t["score"].to_numpy()), loglin, rtol=1e-12
    )
    by_engine = docs[np.lexsort((docs, -t["score"].to_numpy()))]
    by_log = docs[np.lexsort((docs, -loglin))]
    assert list(by_engine) == list(by_log)


def test_lmjm_single_term_is_bare_leaf(ray_session, built_index):
    """prod reducer onto a ones accumulator: 1.0 * leaf == leaf exactly,
    so a one-term query scores the bare leaf."""
    eng = SearchEngine(built_index, ModelParams(model="lmjm", top_k=1 << 30))
    t = eng.search("q", "mutex").to_pandas()
    idx = eng.index
    for _, row in t.head(5).iterrows():
        assert row["score"] == _lmjm_leaf_scalar(idx, "mutex", int(row["doc_id"]))


def test_f2exp_scalar_recount(ray_session, built_index):
    eng = SearchEngine(built_index, ModelParams(model="f2exp", top_k=1 << 30))
    t = eng.search("q", "mutex lock").to_pandas()
    assert len(t) > 0
    idx = eng.index
    avdl = idx.sum_field_lengths("body") / idx.doc_count("body")
    for _, row in t.head(10).iterrows():
        d, s = int(row["doc_id"]), 0.0
        dl = float(idx.doclen("body", np.array([d]))[0])
        for term in ("mutex", "lock"):
            p = _leaf_stats(idx, term)
            pos = int(np.searchsorted(p.doc_ids, d))
            if pos < p.df and p.doc_ids[pos] == d:
                tf = float(p.tfs[pos])
                idfk = (idx.num_docs / p.df) ** 0.35
                s += idfk * (tf / (tf + 0.5 + 0.5 * dl / avdl))
        assert row["score"] == s


def test_zoo_unsupported_ops_raise(ray_session, built_index):
    lm = SearchEngine(built_index, ModelParams(model="lmjm", top_k=10))
    with pytest.raises(ValueError):
        lm.search("q", "#and( mutex lock )")  # no conjunctive map
    f2 = SearchEngine(built_index, ModelParams(model="f2exp", top_k=10))
    with pytest.raises(ValueError):
        f2.search("q", "#wand( mutex lock )")


def test_zoo_sharded_matches_full(ray_session, built_index):
    """Both models through the doc-sharded two-phase path: the CTF/df
    all-reduce must reproduce the single-index scores bitwise (lmjm is
    the first registered model whose leaf READS the all-reduced ctf)."""
    from searchengine_ray.engine import evaluate_sharded

    for model in ("lmjm", "f2exp"):
        full = SearchEngine(built_index, ModelParams(model=model, top_k=30))
        want = full.search("q", "mutex lock").to_pandas()
        got = evaluate_sharded(
            built_index, "q", "mutex lock", parts=[0, 1],
            params=ModelParams(model=model, top_k=30),
        ).to_pandas()
        assert list(got["external_id"]) == list(want["external_id"]), model
        assert list(got["score"]) == list(want["score"]), model
