"""MMR re-ranking (mmr.py): exact parity with a scalar reference greedy,
the lam=1 degeneration to pure relevance order, the diversity property on
the planted near-dup corpus, and the negative-cosine penalty regression
(the max over a non-empty kept set must NOT be floored at zero)."""

import math
import os

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF}/embeddings.parquet"), reason="testdata missing"
)


def _scalar_mmr(vids, rel, sims, k, lam):
    """Reference greedy with plain Python floats and explicit max."""
    kept, scores = [], []
    remaining = list(range(len(vids)))
    for _ in range(min(k, len(vids))):
        best = None
        for i in remaining:
            ms = max((sims[i][j] for j in kept), default=0.0)
            s = lam * rel[i] - (1.0 - lam) * ms
            key = (-s, vids[i])
            if best is None or key < best[0]:
                best = (key, i, s)
        kept.append(best[1])
        scores.append(best[2])
        remaining.remove(best[1])
    return [int(vids[i]) for i in kept], scores


def test_mmr_greedy_matches_scalar_reference():
    from searchengine_ray.mmr import mmr_greedy

    rng = np.random.default_rng(5)
    n = 30
    mat = rng.normal(size=(n, 8))
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    vids = rng.permutation(n).astype(np.int64) * 3
    rel = mat @ mat[0]
    sims = mat @ mat.T
    got = mmr_greedy(vids, rel, sims, k=12, lam=0.6).to_pandas()
    want_ids, want_scores = _scalar_mmr(vids, rel, sims, 12, 0.6)
    assert got["vec_id"].tolist() == want_ids
    for g, w in zip(got["mmr"], want_scores):
        assert abs(g - w) < 5e-7  # engine output is rounded to 6dp


def test_mmr_lam1_is_pure_relevance():
    from searchengine_ray.mmr import mmr_greedy

    rng = np.random.default_rng(9)
    n = 20
    mat = rng.normal(size=(n, 8))
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    vids = np.arange(n, dtype=np.int64)
    rel = mat @ mat[3]
    sims = mat @ mat.T
    got = mmr_greedy(vids, rel, sims, k=8, lam=1.0).to_pandas()
    want = vids[np.lexsort((vids, -rel))][:8]
    assert got["vec_id"].tolist() == want.tolist()
    # and the reported score IS the relevance (penalty weight 0)
    assert np.allclose(got["mmr"], np.sort(rel)[::-1][:8].round(6))


def test_mmr_negative_similarity_not_floored():
    """Regression for the bug the DuckDB oracle caught: with all pairwise
    sims negative, the penalty term must be the true (negative) max —
    i.e. a BONUS — not clamped to zero."""
    from searchengine_ray.mmr import mmr_greedy

    vids = np.array([1, 2], dtype=np.int64)
    rel = np.array([1.0, 0.5])
    sims = np.array([[1.0, -0.8], [-0.8, 1.0]])
    got = mmr_greedy(vids, rel, sims, k=2, lam=0.7).to_pandas()
    # second pick's score: 0.7*0.5 - 0.3*(-0.8) = 0.59, not 0.35
    assert got["vec_id"].tolist() == [1, 2]
    assert math.isclose(got["mmr"][1], 0.7 * 0.5 - 0.3 * (-0.8), abs_tol=5e-7)


def test_mmr_rerank_diversifies(ray_session):
    """On the planted-near-dup corpus, MMR's selection must be less
    self-similar than the pure-relevance top-k (that is its job), while
    lam=1.0 reproduces the relevance order exactly."""
    import pyarrow.compute as pc

    from searchengine_ray.ann import _load_matrix, brute_topk
    from searchengine_ray.mmr import mmr_rerank

    k, nc = 10, 50
    mmr = mmr_rerank(SF, query_vec_id=0, n_candidates=nc, k=k, lam=0.5).to_pandas()
    ids, mat = _load_matrix(SF)
    pos = {int(v): i for i, v in enumerate(ids)}

    def mean_pairwise(sel):
        sub = mat[[pos[int(v)] for v in sel]]
        s = sub @ sub.T
        iu = np.triu_indices(len(sel), 1)
        return float(s[iu].mean())

    top = brute_topk(SF, n_queries=1, k=k)
    top_ids = top.filter(pc.equal(top.column("query_id"), 0)).column(
        "neighbor_id"
    ).to_pylist()
    assert mean_pairwise(mmr["vec_id"].tolist()) < mean_pairwise(top_ids)

    pure = mmr_rerank(SF, query_vec_id=0, n_candidates=nc, k=k, lam=1.0).to_pandas()
    assert pure["vec_id"].tolist() == top_ids
