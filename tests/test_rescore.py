"""Window rescoring (engine.rescore_topn, ES rescore-API analog):
scalar parity vs a brute recombination of the two legs, window-cut
semantics, and the weight-0 degeneration."""

import numpy as np
import pyarrow.compute as pc


def _eng(built_index):
    from searchengine_ray.config import ModelParams
    from searchengine_ray.engine import SearchEngine

    return SearchEngine(built_index, ModelParams(model="bm25", top_k=1 << 30))


def test_scalar_parity(ray_session, built_index):
    """rescore_topn == brute recombination of the two search() outputs."""
    eng = _eng(built_index)
    base_q, resc_q = "check unit", "#near/1( unit test )"
    window, k, qw, rw = 20, 8, 1.0, 2.0
    got = eng.rescore_topn(
        "q", base_q, resc_q, window=window, query_weight=qw,
        rescore_weight=rw, k=k,
    ).to_pandas()

    base = eng.search("q", base_q).to_pandas().head(window)
    resc = eng.search("q", resc_q).to_pandas()
    ns = base.doc_id.map(
        dict(zip(resc.doc_id, resc.score))
    ).fillna(0.0).to_numpy()
    comb = qw * base.score.to_numpy() + rw * ns
    order = np.lexsort((base.external_id.to_numpy(), -comb))[:k]
    assert got.doc_id.tolist() == base.doc_id.to_numpy()[order].tolist()
    exp_r = pc.round(
        __import__("pyarrow").array(comb[order]), ndigits=6
    ).to_pylist()
    assert got.score_r.tolist() == exp_r
    # the rescore leg actually fired for at least one window doc
    assert (ns > 0).any()


def test_window_cut_excludes_outside_docs(ray_session, built_index):
    """A doc outside the base top-`window` can never enter the result,
    however well the rescore query scores it."""
    eng = _eng(built_index)
    base_q, resc_q = "check unit", "#near/1( unit test )"
    full = eng.search("q", base_q).to_pandas()
    small = eng.rescore_topn(
        "q", base_q, resc_q, window=5, k=5
    ).to_pandas()
    win_ids = set(full.doc_id.head(5))
    assert set(small.doc_id) <= win_ids


def test_zero_weight_degenerates_to_base(ray_session, built_index):
    """rescore_weight=0 -> the window re-ranked by its own base scores,
    i.e. exactly the base top-k (same order, rounded scores)."""
    eng = _eng(built_index)
    got = eng.rescore_topn(
        "q", "check unit", "#near/1( unit test )", window=20,
        rescore_weight=0.0, k=10,
    ).to_pandas()
    base = eng.search("q", "check unit").to_pandas().head(10)
    assert got.doc_id.tolist() == base.doc_id.tolist()
    assert np.allclose(got.score_r, np.round(base.score, 6), atol=5e-7)
