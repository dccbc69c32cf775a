"""Full ES bool query (engine.bool_search): manual recombination parity,
filter-context zero-scoring, msm defaults, and the guard paths."""

import numpy as np
import pytest


def _eng(built_index):
    from searchengine_ray.config import ModelParams
    from searchengine_ray.engine import SearchEngine

    return SearchEngine(
        built_index, ModelParams(model="bm25", top_k=1 << 30)
    )


def _leg(eng, q):
    t = eng.search("q", q).to_pandas()
    return dict(zip(t.doc_id, t.score))


def test_bool_equals_manual_recombination(ray_session, built_index):
    eng = _eng(built_index)
    base = _leg(eng, "unit check open")  # the scoring #SUM
    m = set(_leg(eng, "unit.body"))
    s1, s2 = set(_leg(eng, "check.body")), set(_leg(eng, "open.body"))
    mn = set(_leg(eng, "fault.body"))
    exp = {
        d: base[d]
        for d in base
        if d in m and (d in s1 or d in s2) and d not in mn
    }
    got = eng.bool_search(
        "q",
        must=["unit"],
        should=["check", "open"],
        must_not=["fault"],
        minimum_should_match=1,
    )
    gd = dict(
        zip(
            got.column("doc_id").to_pylist(),
            got.column("score").to_pylist(),
        )
    )
    assert gd == exp  # membership AND bitwise scores


def test_filter_only_scores_zero(ray_session, built_index):
    eng = _eng(built_index)
    got = eng.bool_search("q", filter=["unit"])
    assert set(got.column("doc_id").to_pylist()) == set(
        _leg(eng, "unit.body")
    )
    assert set(got.column("score").to_pylist()) == {0.0}


def test_msm_defaults(ray_session, built_index):
    eng = _eng(built_index)
    # should-only: ES default msm=1 — equals the plain disjunction's set
    g1 = eng.bool_search("q", should=["unit", "check"])
    assert set(g1.column("doc_id").to_pylist()) == set(
        _leg(eng, "unit check")
    )
    # must present: default msm=0 — should widens scoring, not matching
    g0 = eng.bool_search("q", must=["unit"], should=["check"])
    assert set(g0.column("doc_id").to_pylist()) == set(
        _leg(eng, "unit.body")
    )


def test_derived_and_range_clauses(ray_session, built_index):
    eng = _eng(built_index)
    got = eng.bool_search(
        "q", must=["#near/1( unit test )"], must_not=["fault"]
    )
    near = set(_leg(eng, "#near/1( unit test )"))
    mn = set(_leg(eng, "fault.body"))
    assert set(got.column("doc_id").to_pylist()) == near - mn


def test_guards(ray_session, built_index):
    eng = _eng(built_index)
    with pytest.raises(ValueError, match="at least one"):
        eng.bool_search("q", must_not=["unit"])
    with pytest.raises(ValueError, match="filter leaf"):
        eng.bool_search("q", must=["#range( n_chars 0 10 )"])
    with pytest.raises(ValueError, match="single term"):
        eng.bool_search("q", must=["#and( unit check )"])
