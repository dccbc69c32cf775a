"""k-arg #NEAR lock-step machine vs the scalar QryIopNear.java:27-83 sweep.

The vectorized machine must be transition-identical to `_near_positions`
(the direct port of the reference pointer loop) on arbitrary inputs.
"""

import numpy as np
import pytest

from searchengine_ray.indexio import Postings
from searchengine_ray.operators import _eval_near, _near_positions


def _mk_postings(doc_pos: dict[int, list[int]]) -> Postings:
    docs = sorted(doc_pos)
    tfs = np.array([len(doc_pos[d]) for d in docs], dtype=np.int64)
    off = np.zeros(len(docs) + 1, dtype=np.int64)
    np.cumsum(tfs, out=off[1:])
    flat = np.array([p for d in docs for p in doc_pos[d]], dtype=np.int64)
    return Postings(
        np.array(docs, dtype=np.int64), tfs, off, flat,
        df=len(docs), ctf=int(tfs.sum()),
    )


@pytest.mark.parametrize("k,dist,seed", [
    (3, 1, 0), (3, 2, 1), (3, 8, 2), (4, 1, 3), (4, 3, 4), (5, 2, 5),
])
def test_neark_matches_scalar_sweep(k, dist, seed):
    rng = np.random.default_rng(seed)
    parts = []
    for _ in range(k):
        dp = {}
        for d in range(40):
            if rng.random() < 0.8:
                npos = int(rng.integers(1, 12))
                dp[d] = sorted(
                    rng.choice(60, size=npos, replace=False).tolist()
                )
        parts.append(_mk_postings(dp))
    got = _eval_near(parts, dist)

    # scalar oracle per common doc
    common = parts[0].doc_ids
    for p in parts[1:]:
        common = np.intersect1d(common, p.doc_ids)
    exp_docs, exp_pos = [], {}
    for d in common:
        plists = []
        for p in parts:
            i = int(np.searchsorted(p.doc_ids, d))
            plists.append(p.positions_for(i).tolist())
        matches = _near_positions(plists, dist)
        if matches:
            exp_docs.append(int(d))
            exp_pos[int(d)] = matches
    assert got.doc_ids.tolist() == exp_docs
    for i, d in enumerate(got.doc_ids):
        assert got.positions_for(i).tolist() == exp_pos[int(d)], f"doc {d}"
