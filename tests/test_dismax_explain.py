"""#DISMAX (ES dis_max / multi_match best_fields analog) and
engine.explain (Lucene IndexSearcher.explain analog): scalar parity vs
brute recombination of single-leg searches, model ladders, and the
explain-rows-sum-to-search invariant."""

import numpy as np
import pytest


def _eng(built_index, model="bm25"):
    from searchengine_ray.config import ModelParams
    from searchengine_ray.engine import SearchEngine

    return SearchEngine(built_index, ModelParams(model=model, top_k=1 << 30))


def _leg(eng, q):
    t = eng.search("q", q).to_pandas()
    return dict(zip(t.doc_id, t.score))


def test_dismax_parity_vs_manual(ray_session, built_index):
    """#DISMAX/30 over three legs == union docs, max + 0.3*(sum-max) of
    the per-leg search() scores (each single-term search IS the leaf)."""
    eng = _eng(built_index)
    legs = [
        _leg(eng, "unit.body"),
        _leg(eng, "py.keywords"),
        _leg(eng, "check.body"),
    ]
    got = eng.search(
        "q", "#dismax/30( unit.body py.keywords check.body )"
    ).to_pandas()
    docs = sorted(set().union(*[set(d) for d in legs]))
    assert sorted(got.doc_id) == docs
    by_doc = dict(zip(got.doc_id, got.score))
    for d in docs:
        vals = [lg[d] for lg in legs if d in lg]
        exp = max(vals) + 0.30 * (sum(vals) - max(vals))
        assert by_doc[d] == exp, (d, by_doc[d], exp)


def test_dismax_default_tie_is_pure_max(ray_session, built_index):
    eng = _eng(built_index)
    legs = [_leg(eng, "unit.body"), _leg(eng, "check.body")]
    got = eng.search("q", "#dismax( unit.body check.body )").to_pandas()
    for d, s in zip(got.doc_id, got.score):
        assert s == max(lg[d] for lg in legs if d in lg)


def test_dismax_single_leg_collapses(ray_session, built_index):
    """Optimizer collapses #DISMAX(x) -> x, like #AND(x)."""
    eng = _eng(built_index)
    a = eng.search("q", "#dismax/70( unit.body )").to_pandas()
    b = eng.search("q", "unit.body").to_pandas()
    assert a.doc_id.tolist() == b.doc_id.tolist()
    assert a.score.tolist() == b.score.tolist()


def test_dismax_unranked_membership(ray_session, built_index):
    eng = _eng(built_index, "unrankedboolean")
    got = eng.search("q", "#dismax( unit.body fault.body )").to_pandas()
    u = set(_leg(eng, "unit.body")) | set(_leg(eng, "fault.body"))
    assert set(got.doc_id) == u
    assert (got.score == 1.0).all()


def test_dismax_indri_raises(ray_session, built_index):
    eng = _eng(built_index, "indri")
    with pytest.raises(ValueError, match="DISMAX"):
        eng.search("q", "#dismax( unit check )")


def test_dismax_tie_out_of_range_raises(ray_session, built_index):
    eng = _eng(built_index)
    with pytest.raises(ValueError, match="tie-breaker"):
        eng.search("q", "#dismax/101( unit check )")


def test_explain_rows_sum_to_search(ray_session, built_index):
    """Per-doc sum of explain rows == the served flat-BM25 score, and the
    component columns match the index's own statistics."""
    eng = _eng(built_index)
    ex = eng.explain("q", "unit check").to_pandas()
    served = eng.search("q", "unit check").to_pandas()
    sums = ex.groupby("doc_id").score.sum()
    by_doc = dict(zip(served.doc_id, served.score))
    assert set(sums.index) == set(by_doc)
    for d, s in sums.items():
        assert s == pytest.approx(by_doc[d], rel=0, abs=5e-16)
    # components are the index's statistics, not recomputed ones
    from searchengine_ray.indexio import InvertedIndex

    idx = InvertedIndex(built_index)
    for term in ("unit", "check"):
        rows = ex[ex.term == term]
        p = idx.postings("body", term, need_positions=False)
        assert rows.doc_id.tolist() == p.doc_ids.tolist()
        assert rows.tf.tolist() == p.tfs.tolist()
        assert (rows.df == p.stat_df).all()
        np.testing.assert_array_equal(
            rows.dl.to_numpy(), idx.doclen("body", p.doc_ids)
        )


def test_explain_single_term_and_field(ray_session, built_index):
    eng = _eng(built_index)
    ex = eng.explain("q", "py.keywords").to_pandas()
    assert (ex.term == "py").all() and (ex["field"] == "keywords").all()
    assert len(ex) > 0


def test_explain_structured_raises(ray_session, built_index):
    eng = _eng(built_index)
    with pytest.raises(ValueError, match="flat"):
        eng.explain("q", "#near/1( unit test )")


def test_explain_non_bm25_raises(ray_session, built_index):
    with pytest.raises(ValueError, match="BM25"):
        _eng(built_index, "indri").explain("q", "unit")


def test_dismax_sharded_matches_full(ray_session, built_index):
    """#DISMAX through the doc-sharded two-phase path: the all-reduced
    leaf stats must reproduce the single-index evaluation exactly."""
    from searchengine_ray.config import ModelParams
    from searchengine_ray.engine import SearchEngine, evaluate_sharded

    q = "#dismax/30( unit.body py.keywords check.body )"
    full = SearchEngine(built_index, ModelParams(model="bm25", top_k=30))
    want = full.search("q", q).to_pandas()
    got = evaluate_sharded(
        built_index, "q", q, parts=[0, 1],
        params=ModelParams(model="bm25", top_k=30),
    ).to_pandas()
    assert list(got["external_id"]) == list(want["external_id"])
    np.testing.assert_allclose(
        got["score"].to_numpy(), want["score"].to_numpy(), atol=1e-12
    )


def test_dismax_percolates(ray_session):
    """A #DISMAX stored query percolates with union-membership semantics
    identical to the index-backed engine."""
    from searchengine_ray.gate import engine_for
    from searchengine_ray.percolate import percolate

    sf = "/root/testdata/sf0.001"
    t = percolate(sf, [("dm", "#dismax( dup spark )")]).to_pandas()
    eng = engine_for(sf, "unrankedboolean")
    want = set(eng.search("x", "#dismax( dup spark )").column("doc_id").to_pylist())
    assert set(t[t["query_id"] == "dm"]["doc_id"]) == want
    assert want


def test_explain_under_tombstones_keeps_stale_df(
    ray_session, fixture_corpus, tmp_path
):
    """explain() on a tombstoned index: deleted docs' rows vanish, but the
    df column stays the STALE stat_df scoring uses (Lucene docFreq ignores
    live-docs until expunge) — and rows still sum to the served scores."""
    import ray.data

    from searchengine_ray.build import build_index
    from searchengine_ray.config import BuildConfig
    from searchengine_ray.delete import delete_documents

    idx = str(tmp_path / "exp_del")
    build_index(
        lambda: ray.data.from_arrow(fixture_corpus), idx,
        BuildConfig(doc_bucket_size=64, skip_block_docs=16, num_partitions=2),
    )
    eng0 = _eng(idx)
    before = eng0.explain("q", "check").to_pandas()
    dead = before.doc_id.tolist()[:3]
    delete_documents(idx, doc_ids=dead)

    eng = _eng(idx)  # reopen: visibility is at open time
    after = eng.explain("q", "check").to_pandas()
    assert set(after.doc_id) == set(before.doc_id) - set(dead)
    # stale stats: df unchanged by the tombstones
    assert set(after.df) == set(before.df)
    served = eng.search("q", "check").to_pandas()
    assert dict(zip(after.doc_id, after.score)) == dict(
        zip(served.doc_id, served.score)
    )


# ---- minimum_should_match (ES bool msm analog) ----


def test_msm_filters_by_clause_count(ray_session, built_index):
    """m=2 keeps exactly the docs matching >= 2 distinct clauses, with
    scores bitwise equal to the plain search."""
    eng = _eng(built_index)
    base = eng.search("q", "unit check open")
    legs = [_leg(eng, t) for t in ("unit.body", "check.body", "open.body")]
    got = eng.search_min_should_match("q", "unit check open", 2)
    exp_docs = {
        d
        for d in set().union(*[set(lg) for lg in legs])
        if sum(d in lg for lg in legs) >= 2
    }
    assert set(got.column("doc_id").to_pylist()) == exp_docs
    base_scores = dict(
        zip(
            base.column("doc_id").to_pylist(),
            base.column("score").to_pylist(),
        )
    )
    for d, s in zip(
        got.column("doc_id").to_pylist(), got.column("score").to_pylist()
    ):
        assert s == base_scores[d]  # scoring untouched


def test_msm_percentage_and_bounds(ray_session, built_index):
    eng = _eng(built_index)
    full = eng.search("q", "unit check open")
    # 0 and 1 of 3 clauses -> everything survives (every match matches >=1)
    got1 = eng.search_min_should_match("q", "unit check open", 1)
    assert got1.num_rows == full.num_rows
    # '66%' of 3 -> floor(1.98) = 1; '100%' -> 3 (pure conjunction)
    got66 = eng.search_min_should_match("q", "unit check open", "66%")
    assert got66.num_rows == full.num_rows
    got100 = eng.search_min_should_match("q", "unit check open", "100%")
    legs = [_leg(eng, t) for t in ("unit.body", "check.body", "open.body")]
    conj = set(legs[0]) & set(legs[1]) & set(legs[2])
    assert set(got100.column("doc_id").to_pylist()) == conj


def test_msm_derived_clause_and_raises(ray_session, built_index):
    eng = _eng(built_index)
    # derived list as a clause is legal (it IS one should clause)
    got = eng.search_min_should_match(
        "q", "#sum( #near/1( unit test ) check )", 2
    )
    legs = [_leg(eng, "#near/1( unit test )"), _leg(eng, "check.body")]
    exp = set(legs[0]) & set(legs[1])
    assert set(got.column("doc_id").to_pylist()) == exp
    import pytest as _pt

    with _pt.raises(ValueError, match="flat"):
        eng.search_min_should_match("q", "#and( #or( unit check ) open )", 1)
    with _pt.raises(ValueError, match="minimum_should_match"):
        eng.search_min_should_match("q", "unit check", "abc")
