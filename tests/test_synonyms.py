"""Query-time synonym expansion (qryparse.expand_synonyms +
SearchEngine(synonyms=), ES synonym filter analog): rewrite parity vs
hand-written #SYN queries, composition under #NEAR, analyzer
normalization (stemming/stopwords), pattern-operator exclusion, and the
single-token guards."""

import numpy as np
import pytest


def _eng(built_index, synonyms=None, model="bm25"):
    from searchengine_ray.config import ModelParams
    from searchengine_ray.engine import SearchEngine

    return SearchEngine(
        built_index,
        ModelParams(model=model, top_k=1 << 30),
        synonyms=synonyms,
    )


def _table(t):
    return (
        t.column("doc_id").to_numpy(),
        t.column("score").to_numpy(),
    )


def test_expansion_equals_handwritten_syn(ray_session, built_index):
    """search('unit') with unit->[test, check] == search('#syn(unit test
    check)') bitwise."""
    got = _eng(
        built_index, synonyms={"unit": ["test", "check"]}
    ).search("q", "unit")
    exp = _eng(built_index).search("q", "#syn( unit test check )")
    gd, gs = _table(got)
    ed, es = _table(exp)
    assert np.array_equal(gd, ed)
    assert np.array_equal(gs, es)


def test_expansion_composes_under_near(ray_session, built_index):
    """#near/1(unit test) with unit->[open] == #near/1(#syn(unit open)
    test): the rewrite reaches leaves inside positional operators."""
    got = _eng(built_index, synonyms={"unit": ["open"]}).search(
        "q", "#near/1( unit test )"
    )
    exp = _eng(built_index).search(
        "q", "#near/1( #syn( unit open ) test )"
    )
    gd, gs = _table(got)
    ed, es = _table(exp)
    assert np.array_equal(gd, ed)
    assert np.array_equal(gs, es)


def test_mapping_normalizes_through_analyzer(ray_session, built_index):
    """Surface-form keys/values analyze like any query token: stopword
    synonyms vanish, self-synonyms and duplicates collapse — a mapping
    that normalizes to nothing leaves the query untouched."""
    eng = _eng(
        built_index,
        synonyms={"unit": ["the", "unit", "UNIT"]},  # all degenerate
    )
    assert eng._synonyms == {}
    base = _eng(built_index).search("q", "unit")
    got = eng.search("q", "unit")
    assert np.array_equal(_table(got)[1], _table(base)[1])


def test_single_token_guards(ray_session, built_index):
    with pytest.raises(ValueError, match="single-token"):
        _eng(built_index, synonyms={"unit test": ["check"]})
    with pytest.raises(ValueError, match="single-token"):
        _eng(built_index, synonyms={"unit": ["near-death"]})


def test_pattern_operators_not_expanded(ray_session, built_index):
    """#prefix's pattern arg must NOT rewrite even when it collides with
    a synonym key (it is a dictionary pattern, not a term)."""
    got = _eng(built_index, synonyms={"unit": ["check"]}).search(
        "q", "#prefix( unit )"
    )
    exp = _eng(built_index).search("q", "#prefix( unit )")
    assert np.array_equal(_table(got)[0], _table(exp)[0])
    assert np.array_equal(_table(got)[1], _table(exp)[1])


def test_unrelated_terms_untouched(ray_session, built_index):
    got = _eng(built_index, synonyms={"unit": ["check"]}).search(
        "q", "open file"
    )
    exp = _eng(built_index).search("q", "open file")
    assert np.array_equal(_table(got)[1], _table(exp)[1])
