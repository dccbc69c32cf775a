"""#BOOSTING / #CONSTSCORE (ES boosting and constant_score query analogs):
demotion-without-exclusion semantics pinned against the plain positive-leg
search, constant-score membership against the child's match set, single
demotion under overlapping negative legs, optimizer positional rules, and
the doc-sharded two-phase path.
"""

import numpy as np
import pytest

from searchengine_ray.config import ModelParams
from searchengine_ray.engine import SearchEngine


def _eng(built_index, model="bm25"):
    return SearchEngine(built_index, ModelParams(model=model, top_k=1 << 30))


def test_boosting_demotes_negative_matches_only(ray_session, built_index):
    eng = _eng(built_index)
    plain = eng.search("q", "mutex lock").to_pandas()
    boosted = eng.search("q", "#boosting/40( #sum( mutex lock ) thread )").to_pandas()
    neg = set(eng.search("q", "thread").to_pandas()["doc_id"].astype(int))
    assert list(plain["doc_id"].sort_values()) == list(
        boosted["doc_id"].sort_values()
    )  # match set untouched
    p = plain.set_index("doc_id")["score"]
    b = boosted.set_index("doc_id")["score"]
    demoted = 0
    for d in p.index:
        if int(d) in neg:
            assert b[d] == p[d] * 0.4
            demoted += 1
        else:
            assert b[d] == p[d]
    assert demoted > 0 and demoted < len(p)  # both branches exercised


def test_boosting_overlapping_negatives_demote_once(ray_session, built_index):
    """A doc matching SEVERAL negative legs demotes once (union before
    scaling), like ES's single negative query."""
    eng = _eng(built_index)
    one = eng.search("q", "#boosting/50( #sum( mutex lock ) thread )").to_pandas()
    # 'thread' twice: overlap is total, scores must be identical
    two = eng.search(
        "q", "#boosting/50( #sum( mutex lock ) thread thread )"
    ).to_pandas()
    assert list(one["doc_id"]) == list(two["doc_id"])
    assert list(one["score"]) == list(two["score"])


def test_boosting_no_negative_is_positive(ray_session, built_index):
    """Optimizer: a stopword-analyzed-away negative leaves the node ==
    its positive leg (the #andnot empty-negative rule)."""
    eng = _eng(built_index)
    plain = eng.search("q", "mutex lock").to_pandas()
    got = eng.search("q", "#boosting/40( #sum( mutex lock ) the )").to_pandas()
    assert list(got["doc_id"]) == list(plain["doc_id"])
    assert list(got["score"]) == list(plain["score"])


def test_boosting_range_raises(ray_session, built_index):
    with pytest.raises(ValueError, match="negative_boost"):
        _eng(built_index).search("q", "#boosting/150( #sum( mutex ) lock )")


def test_constscore_membership_and_constant(ray_session, built_index):
    eng = _eng(built_index)
    child = eng.search("q", "#near/1( unit test )").to_pandas()
    got = eng.search("q", "#constscore/250( #near/1( unit test ) )").to_pandas()
    assert set(got["doc_id"]) == set(child["doc_id"])
    assert (got["score"] == 2.5).all()
    # bare #CONSTSCORE -> ES default boost 1.0
    bare = eng.search("q", "#constscore( #near/1( unit test ) )").to_pandas()
    assert (bare["score"] == 1.0).all()


def test_constscore_additive_inside_sum(ray_session, built_index):
    """Inside a BM25 #SUM the constant leg adds exactly boost for member
    docs: score == plain + 2.5 on the near-match set, plain elsewhere."""
    eng = _eng(built_index)
    plain = eng.search("q", "mutex lock").to_pandas().set_index("doc_id")["score"]
    members = set(
        eng.search("q", "#near/1( unit test )").to_pandas()["doc_id"].astype(int)
    )
    got = eng.search(
        "q", "#sum( #constscore/250( #near/1( unit test ) ) mutex lock )"
    ).to_pandas()
    for _, row in got.iterrows():
        d = int(row["doc_id"])
        base = float(plain.get(d, 0.0))
        if d in members:
            # engine associates ((0 + 2.5) + mutex) + lock; the plain
            # query gave (mutex + lock), so 2.5 + base differs by <=1 ULP
            assert row["score"] == pytest.approx(2.5 + base, rel=1e-14)
        else:
            # same accumulation order as the plain query -> exact
            assert row["score"] == base


def test_boosting_sharded_matches_full(ray_session, built_index):
    from searchengine_ray.engine import evaluate_sharded

    q = "#boosting/40( #sum( #constscore/250( #near/1( unit test ) ) mutex lock ) thread )"
    full = _eng(built_index)
    want = full.search("q", q).to_pandas()
    got = evaluate_sharded(
        built_index, "q", q, parts=[0, 1],
        params=ModelParams(model="bm25", top_k=1 << 30),
    ).to_pandas()
    assert list(got["external_id"]) == list(want["external_id"])
    assert list(got["score"]) == list(want["score"])
