"""Range search, filtered vector search, and minmax-linear hybrid fusion:
numpy brute-force parity, guard rails, and fusion arithmetic."""

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _brute(sf):
    from searchengine_ray.ann import _load_matrix

    ids, mat = _load_matrix(sf)
    order = np.argsort(ids)
    return ids[order], mat[order]


def test_range_search_matches_brute(ray_session):
    from searchengine_ray.ann import range_search

    ids, mat = _brute(SF)
    nq, thr = 10, 0.3
    got = range_search(SF, n_queries=nq, threshold=thr).to_pandas()
    sims = mat[:nq] @ mat.T
    exp = set()
    for qi in range(nq):
        for j in np.nonzero(sims[qi] >= thr)[0]:
            if ids[j] != ids[qi]:
                exp.add((ids[qi], ids[j]))
    assert set(zip(got.query_id, got.neighbor_id)) == exp
    # values: the rounded cosine equals the brute one
    for _, r in got.iterrows():
        qi = int(np.searchsorted(ids, r.query_id))
        j = int(np.searchsorted(ids, r.neighbor_id))
        assert r.cosine == round(float(mat[qi] @ mat[j]), 6)


def test_range_search_guard_raises(ray_session):
    from searchengine_ray.ann import range_search

    with pytest.raises(ValueError, match="max_results"):
        range_search(SF, n_queries=10, threshold=-1.0, max_results=100)


def test_filtered_topk_matches_brute(ray_session):
    from searchengine_ray.ann import filtered_topk

    lab = pq.read_table(
        f"{SF}/embeddings.parquet", columns=["vec_id", "label"]
    ).to_pandas().set_index("vec_id").label
    ids, mat = _brute(SF)
    nq, k, L = 10, 10, 3
    got = filtered_topk(SF, n_queries=nq, k=k, label=L).to_pandas()
    labels = lab.loc[ids].to_numpy()
    sims = mat[:nq] @ mat.T
    sims[:, labels != L] = -np.inf
    for qi in range(nq):
        s = sims[qi].copy()
        s[ids == ids[qi]] = -np.inf
        order = np.lexsort((ids, -s))[:k]
        order = order[np.isfinite(s[order])]
        mine = got[got.query_id == ids[qi]].sort_values("rank")
        assert mine.neighbor_id.tolist() == ids[order].tolist()
        assert (
            np.asarray(lab.loc[mine.neighbor_id].tolist()) == L
        ).all()


def test_linear_fuse_manual_parity():
    from searchengine_ray.hybrid import linear_fuse

    ids1 = np.array([5, 2, 9]); s1 = np.array([4.0, 2.0, 1.0])
    ids2 = np.array([2, 7]); s2 = np.array([0.5, 0.25])
    t = linear_fuse([(ids1, s1), (ids2, s2)], [0.7, 0.3], k=10).to_pandas()
    n1 = {5: 1.0, 2: (2.0 - 1.0) / 3.0, 9: 0.0}
    n2 = {2: 1.0, 7: 0.0}
    exp = {d: 0.7 * n1.get(d, 0.0) + 0.3 * n2.get(d, 0.0)
           for d in (2, 5, 7, 9)}
    got = dict(zip(t.doc_id, t.score_r))
    for d, v in exp.items():
        assert got[d] == round(v, 6), d
    # rank order: score desc, doc_id asc
    assert t.doc_id.tolist() == sorted(exp, key=lambda d: (-exp[d], d))


def test_linear_fuse_zero_span_leg_is_all_ones():
    from searchengine_ray.hybrid import linear_fuse

    t = linear_fuse(
        [(np.array([1, 2]), np.array([3.0, 3.0]))], [0.5], k=5
    ).to_pandas()
    assert set(t.score_r) == {0.5}


def test_hybrid_linear_recombines_the_two_legs(ray_session, built_index):
    """hybrid_linear == manual minmax fusion of engine.search and
    brute_topk outputs (vec_id keyed to doc_id)."""
    from searchengine_ray.ann import brute_topk
    from searchengine_ray.config import ModelParams
    from searchengine_ray.engine import SearchEngine
    from searchengine_ray.hybrid import hybrid_linear

    eng = SearchEngine(built_index, ModelParams(model="bm25", top_k=1 << 30))
    n_cand, k = 20, 10
    got = hybrid_linear(
        eng, SF, "check unit", n_candidates=n_cand, k=k
    ).to_pandas()

    lex = eng.search("q", "check unit").to_pandas().head(n_cand)
    vec = brute_topk(SF, n_queries=1, k=n_cand).to_pandas()
    ls, vs = lex.score.to_numpy(), vec.cosine.to_numpy()
    n_l = (ls - ls.min()) / (ls.max() - ls.min())
    n_v = (vs - vs.min()) / (vs.max() - vs.min())
    fused: dict = {}
    for d, v in zip(lex.doc_id, n_l):
        fused[d] = fused.get(d, 0.0) + 0.7 * v
    for d, v in zip(vec.neighbor_id, n_v):
        fused[d] = fused.get(d, 0.0) + 0.3 * v
    exp = sorted(fused, key=lambda d: (-fused[d], d))[:k]
    assert got.doc_id.tolist() == exp
    for d, s in zip(got.doc_id, got.score_r):
        assert s == round(fused[d], 6)


def _ivf_index(sf):
    """Reuse ivf_topk's cached index build for the same (corpus, params)."""
    import hashlib
    import os

    from searchengine_ray.ann import ivf_build

    path = f"{sf}/embeddings.parquet"
    st = os.stat(path)
    key = hashlib.md5(
        repr((os.path.abspath(path), st.st_mtime_ns, st.st_size, 16, 99,
              4096)).encode()
    ).hexdigest()[:16]
    index_dir = os.path.join("/tmp", "se_ray_ivf", key)
    if not os.path.exists(os.path.join(index_dir, "centroids.npy")):
        ivf_build(sf, index_dir, n_cells=16, seed=99, sample_rows=4096)
    return index_dir


def test_ivf_range_subset_of_brute_and_exact_at_full_probe(ray_session):
    from searchengine_ray.ann import _query_matrix, ivf_range, range_search

    idx = _ivf_index(SF)
    qi, qm = _query_matrix(SF, 10)
    thr = 0.3
    brute = range_search(SF, n_queries=10, threshold=thr).to_pandas()
    bset = set(zip(brute.query_id, brute.neighbor_id))

    part = ivf_range(idx, qi, qm, threshold=thr, nprobe=4).to_pandas()
    pset = set(zip(part.query_id, part.neighbor_id))
    assert pset <= bset  # probed-cells pairs only
    # values agree with brute on the intersection
    bval = {(q, n): c for q, n, c in
            zip(brute.query_id, brute.neighbor_id, brute.cosine)}
    for q, n, c in zip(part.query_id, part.neighbor_id, part.cosine):
        assert c == bval[(q, n)]

    # probing every cell makes it exact
    full = ivf_range(idx, qi, qm, threshold=thr, nprobe=16).to_pandas()
    assert set(zip(full.query_id, full.neighbor_id)) == bset


def test_ivf_range_guard_raises(ray_session):
    import pytest as _pytest

    from searchengine_ray.ann import _query_matrix, ivf_range

    idx = _ivf_index(SF)
    qi, qm = _query_matrix(SF, 10)
    with _pytest.raises(ValueError, match="max_results"):
        ivf_range(idx, qi, qm, threshold=-1.0, nprobe=16, max_results=50)
