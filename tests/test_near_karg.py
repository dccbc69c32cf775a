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


def test_ordered_minimal_intervals_differential():
    """#ORDERED/g (intervals ordered + max_gaps, minimal-interval
    semantics) against a brute-force itertools oracle: 300 random
    position multisets, k in 2..3, g in 0..3."""
    import itertools

    import numpy as np

    from searchengine_ray.operators import _eval_ordered, _make_postings

    def mk(positions):
        p = np.asarray(positions, dtype=np.int64)
        return _make_postings(
            np.array([0]), np.array([len(p)]), np.array([0, len(p)]), p
        )

    def brute(pls, g):
        k = len(pls)
        ivs = [
            (c[0], c[-1])
            for c in itertools.product(*pls)
            if all(c[i] < c[i + 1] for i in range(k - 1))
        ]
        s = set(ivs)
        minimal = [
            iv for iv in s
            if not any(o != iv and o[0] >= iv[0] and o[1] <= iv[1] for o in s)
        ]
        return sorted(e for a, e in minimal if e - a + 1 - k <= g)

    rng = np.random.default_rng(5)
    for _ in range(300):
        k = rng.integers(2, 4)
        g = int(rng.integers(0, 4))
        pls = [
            sorted(rng.choice(np.arange(12), size=rng.integers(1, 6),
                              replace=False).tolist())
            for _ in range(k)
        ]
        res = _eval_ordered([mk(p) for p in pls], g)
        got = sorted(res.positions.tolist()) if res.df else []
        assert got == brute(pls, g), (pls, g)


def test_ordered_vs_near_semantics(ray_session):
    """#ORDERED/2 admits gapped spans #NEAR/1 rejects and is a superset
    of exact adjacency; guards raise."""
    import pytest as _pytest

    from searchengine_ray.gate import engine_for

    eng = engine_for("/root/testdata/sf0.001", "rankedboolean")
    near = eng.search("q", "#near/1( hash join )")
    ordered = eng.search("q", "#ordered/2( hash join )")
    assert set(near.column("doc_id").to_pylist()) <= set(
        ordered.column("doc_id").to_pylist()
    )
    assert ordered.num_rows > near.num_rows
    # max_gaps=0 == the exact-phrase case: same doc set as #near/1 for
    # 2 args (both demand adjacency; tf may differ due to consume rules)
    phrase = eng.search("q", "#ordered( hash join )")
    assert set(phrase.column("doc_id").to_pylist()) == set(
        near.column("doc_id").to_pylist()
    )
    # single-arg #ordered collapses to the bare term in the optimizer
    # (a one-term interval IS the term — the Lucene intervals semantics);
    # the evaluator's k>=2 guard stays as an internal invariant
    one = eng.search("q", "#ordered/1( hash )")
    bare = eng.search("q", "hash")
    assert one.column("doc_id").to_pylist() == bare.column(
        "doc_id").to_pylist()


def test_unordered_minimal_intervals_differential():
    """#UNORDERED/g against a brute-force oracle: 400 random disjoint
    position sets (distinct terms never share a slot), k in 2..3."""
    import itertools

    import numpy as np

    from searchengine_ray.operators import _eval_unordered, _make_postings

    def mk(positions):
        p = np.asarray(positions, dtype=np.int64)
        return _make_postings(
            np.array([0]), np.array([len(p)]), np.array([0, len(p)]), p
        )

    def brute(pls, g):
        k = len(pls)
        ivs = [(min(c), max(c)) for c in itertools.product(*pls)
               if len(set(c)) == k]
        s = set(ivs)
        minimal = [iv for iv in s
                   if not any(o != iv and o[0] >= iv[0] and o[1] <= iv[1]
                              for o in s)]
        return sorted(e for a, e in minimal if e - a + 1 - k <= g)

    rng = np.random.default_rng(9)
    for _ in range(400):
        k = rng.integers(2, 4)
        g = int(rng.integers(0, 4))
        allpos = rng.permutation(14)
        sizes = [int(rng.integers(1, 5)) for _ in range(k)]
        cut = np.cumsum([0] + sizes)
        if cut[-1] > 14:
            continue
        pls = [sorted(allpos[cut[j]:cut[j + 1]].tolist()) for j in range(k)]
        res = _eval_unordered([mk(p) for p in pls], g)
        got = sorted(res.positions.tolist()) if res.df else []
        assert got == brute(pls, g), (pls, g)


def test_unordered_superset_of_ordered(ray_session):
    """Every ordered minimal interval is an unordered one, so the doc
    set is a superset; and unordered finds reversed-order spans."""
    from searchengine_ray.gate import engine_for

    eng = engine_for("/root/testdata/sf0.001", "rankedboolean")
    o = eng.search("q", "#ordered/2( vector scan )")
    u = eng.search("q", "#unordered/2( vector scan )")
    assert set(o.column("doc_id").to_pylist()) <= set(
        u.column("doc_id").to_pylist()
    )
    assert u.num_rows > o.num_rows  # reversed spans exist in this corpus


def test_intervals_and_dfuzzy_sharded_match_full(ray_session, built_index):
    """#ORDERED / #UNORDERED / #DFUZZY under doc-sharded two-phase
    evaluation (derived df/ctf all-reduce) equal the full-index answer
    exactly — the new iops ride the generic derived-stats machinery."""
    from searchengine_ray.config import ModelParams
    from searchengine_ray.engine import SearchEngine, evaluate_sharded

    full = SearchEngine(built_index, ModelParams(model="bm25", top_k=1 << 30))
    for q in (
        "#ordered/3( unit lock )",
        "#unordered/3( unit lock )",
        "#dfuzzy/2( lokc )",
        "#sum( #ordered/2( unit test ) mutex )",
    ):
        want = full.search("q", q).to_pandas()
        got = evaluate_sharded(
            built_index, "q", q, parts=[0, 1],
            params=ModelParams(model="bm25", top_k=1 << 30),
        ).to_pandas()
        assert list(got["external_id"]) == list(want["external_id"]), q
        assert list(got["score"]) == list(want["score"]), q
        assert len(want) > 0, f"degenerate query {q}"
