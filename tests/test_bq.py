"""Binary-quantization ANN (bq.bq_topk): brute-force parity of the
Hamming shortlist + SQ8 rescore, pack/popcount kernels, and shortlist
decomposability across batch sizes."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_bq_pack_and_hamming_match_naive():
    from searchengine_ray.bq import bq_pack, hamming_matrix

    rng = np.random.default_rng(3)
    a = rng.standard_normal((17, 64))
    b = rng.standard_normal((29, 64))
    ham = hamming_matrix(bq_pack(a), bq_pack(b))
    naive = ((a > 0)[:, None, :] != (b > 0)[None, :, :]).sum(axis=2)
    assert np.array_equal(ham, naive)


def test_bq_pack_rejects_wide_vectors():
    from searchengine_ray.bq import bq_pack

    with pytest.raises(ValueError, match="dim=65"):
        bq_pack(np.zeros((2, 65)))


def test_bq_topk_matches_brute(ray_session):
    """Full-driver brute recomputation of shortlist + rescore semantics."""
    from searchengine_ray.ann import _load_matrix
    from searchengine_ray.bq import bq_topk
    from searchengine_ray.sq8 import SQ_SCALE, sq_encode, sq_train

    ids, mat = _load_matrix(SF)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    nq, k, L = 10, 10, 50

    mins, spans = sq_train(mat)  # sf0.001 rows all survive the sample
    codes = sq_encode(mat, mins, spans).astype(np.int64)
    w = np.floor(
        mat[:nq] * spans[None, :] * float(SQ_SCALE) / 255.0 + 0.5
    ).astype(np.int64)
    w[:, spans <= 0] = 0

    bits = mat > 0.0
    got = bq_topk(SF, n_queries=nq, k=k, shortlist=L).to_pandas()
    for qi in range(nq):
        ham = (bits[qi][None, :] != bits).sum(axis=1)
        cand = [(int(ham[j]), int(ids[j]), j) for j in range(len(ids))
                if ids[j] != ids[qi]]
        cand.sort()
        short = cand[:L]
        scored = sorted(
            ((int(w[qi] @ codes[j]), int(ids[j]), h)
             for h, _, j in short),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        sub = got[got.query_id == ids[qi]].sort_values("rank")
        assert list(sub.neighbor_id) == [nid for _, nid, _ in scored]
        assert list(sub.score) == [s for s, _, _ in scored]
        assert list(sub.hamming) == [h for _, _, h in scored]


def test_bq_topk_batch_size_invariant(ray_session):
    """The per-batch shortlist + streaming fold is decomposable: tiny
    blocks give the identical table as the default partitioning."""
    import ray.data

    from searchengine_ray.bq import bq_topk

    base = bq_topk(SF).to_pandas()
    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 8 * 1024  # force many small blocks
        small = bq_topk(SF).to_pandas()
    finally:
        ctx.target_max_block_size = old
    assert base.equals(small)


def test_lsh_multiprobe_matches_brute(ray_session):
    """Candidate set = probed buckets exactly; ranks = exact cosine
    among candidates; recall vs full brute is positive."""
    from searchengine_ray.ann import _load_matrix
    from searchengine_ray.bq import lsh_multiprobe_topk

    ids, mat = _load_matrix(SF)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    nq, k, nb = 10, 10, 8
    w = (1 << np.arange(nb)).astype(np.int64)
    codes = ((mat[:, :nb] > 0).astype(np.int64) @ w)
    got = lsh_multiprobe_topk(SF, n_queries=nq, k=k,
                              n_bits=nb).to_pandas()
    for qi in range(nq):
        probes = {int(codes[qi])} | {
            int(codes[qi] ^ (1 << j)) for j in range(nb)
        }
        cand = [j for j in range(len(ids))
                if int(codes[j]) in probes and ids[j] != ids[qi]]
        sims = sorted(
            ((float(mat[qi] @ mat[j]), int(ids[j])) for j in cand),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        sub = got[got.query_id == ids[qi]].sort_values("rank")
        assert list(sub.neighbor_id) == [nid for _, nid in sims]
        for c, (s, _) in zip(sub.cosine, sims):
            assert c == round(s, 6)


def test_lsh_multiprobe_guard(ray_session):
    import pytest as _pytest

    from searchengine_ray.bq import lsh_multiprobe_topk

    with _pytest.raises(ValueError, match="n_bits"):
        lsh_multiprobe_topk(SF, n_bits=0)
