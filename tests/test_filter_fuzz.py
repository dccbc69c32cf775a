"""Randomized filter-operator cross-check (#FILREQ/#FILREJ/#RANGE):
generated nested filter and query legs must satisfy the set algebra
exactly — filreq = query ∩ filter and filrej = query \\ filter with the
query leg's scores UNTOUCHED — under every retrieval model, and #range
legs must equal the corpus BETWEEN set. The strongest evidence that
filter context composes with the whole operator zoo without perturbing
scoring."""

import os

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF}/documents.parquet"), reason="testdata missing"
)

_TERMS = [
    "dup", "spark", "hash", "join", "vector", "scan", "sort", "merge",
    "window", "stream", "batch", "group", "order", "the", "a",
]


def _gen_leg(rng, model, depth=0):
    """A structured leg valid under `model` (reference op-support ladders:
    BM25 rejects #and/#or, non-BM25 rejects #sum). A TOP-LEVEL leg is
    never a bare stopword — the analyzer drops it before the filter op
    sees its positional args (the documented arity-error case, pinned by
    the dedicated edge test); stopwords still appear inside ops."""
    sops = ["#and", "#or"] if model != "bm25" else ["#sum"]
    ops = sops + ["#syn", "#near/2", "#window/4"]
    if depth >= 2 or rng.random() < 0.4:
        pool = _TERMS[:-2] if depth == 0 else _TERMS
        return pool[rng.integers(len(pool))]
    op = ops[rng.integers(len(ops))]
    n = int(rng.integers(2, 4))
    if op in ("#syn", "#near/2", "#window/4"):
        args = [_TERMS[rng.integers(len(_TERMS))] for _ in range(n)]
    else:
        args = [_gen_leg(rng, model, depth + 1) for _ in range(n)]
    return f"{op}( {' '.join(args)} )"


@pytest.mark.parametrize(
    "model", ["bm25", "rankedboolean", "unrankedboolean", "indri", "tfidf"]
)
def test_filter_ops_fuzz_set_algebra(ray_session, model):
    from searchengine_ray.gate import engine_for

    rng = np.random.default_rng(hash(model) % (2**32))
    eng = engine_for(SF, model)
    checked = 0
    for _ in range(12):
        f_leg = _gen_leg(rng, model)
        q_leg = _gen_leg(rng, model)
        try:
            q = eng.search("x", q_leg).to_pandas()
            f = eng.search("x", f_leg).to_pandas()
        except ValueError:
            continue  # a model-invalid combination — raise-agreement is
            # covered by the parity suite; filters need evaluable legs
        req = eng.search(
            "x", f"#filreq( {f_leg} {q_leg} )"
        ).to_pandas().sort_values("doc_id")
        rej = eng.search(
            "x", f"#filrej( {f_leg} {q_leg} )"
        ).to_pandas().sort_values("doc_id")
        scores = dict(zip(q.doc_id, q.score))
        f_ids = set(f.doc_id)
        want_req = {d: s for d, s in scores.items() if d in f_ids}
        want_rej = {d: s for d, s in scores.items() if d not in f_ids}
        assert dict(zip(req.doc_id, req.score)) == want_req, (model, f_leg, q_leg)
        assert dict(zip(rej.doc_id, rej.score)) == want_rej, (model, f_leg, q_leg)
        checked += 1
    assert checked >= 8  # the generator must mostly produce valid pairs


def test_range_filter_fuzz_between_algebra(ray_session):
    """Random numeric bounds: #filreq(#range(n_chars lo hi) q) == q
    restricted to the DuckDB BETWEEN set, scores untouched."""
    import duckdb

    from searchengine_ray.gate import engine_for

    rng = np.random.default_rng(7)
    eng = engine_for(SF, "bm25")
    con = duckdb.connect()
    for _ in range(8):
        lo = int(rng.integers(0, 400))
        hi = lo + int(rng.integers(0, 400))
        q_leg = _gen_leg(rng, "bm25")
        q = eng.search("x", q_leg).to_pandas()
        got = eng.search(
            "x", f"#filreq( #range( n_chars {lo} {hi} ) {q_leg} )"
        ).to_pandas().sort_values("doc_id")
        keep = set(
            r[0] for r in con.execute(
                f"SELECT doc_id FROM '{SF}/documents.parquet' "
                f"WHERE n_chars BETWEEN {lo} AND {hi}"
            ).fetchall()
        )
        want = q[q.doc_id.isin(keep)].sort_values("doc_id")
        assert got.doc_id.tolist() == want.doc_id.tolist(), (lo, hi, q_leg)
        assert (got.score.values == want.score.values).all(), (lo, hi, q_leg)


def test_damerau_matches_duckdb_500_cases():
    """The unrestricted Damerau DP against DuckDB damerau_levenshtein —
    the exact function the #DFUZZY oracle uses."""
    import duckdb
    import numpy as np

    from searchengine_ray.operators import _damerau

    rng = np.random.default_rng(3)
    for _ in range(500):
        a = "".join(rng.choice(list("abcde"), rng.integers(0, 8)))
        b = "".join(rng.choice(list("abcde"), rng.integers(0, 8)))
        want = duckdb.sql(
            f"SELECT damerau_levenshtein('{a}','{b}')"
        ).fetchone()[0]
        assert _damerau(a, b) == want, (a, b)


def test_dfuzzy_transposition_reaches_spark(ray_session):
    """#DFUZZY/1 finds 'spark' from the transposed 'sprak' (distance 1
    under Damerau); classic #FUZZY/1 does not (distance 2)."""
    from searchengine_ray.gate import engine_for

    eng = engine_for(SF, "rankedboolean")
    dam = eng.search("q", "#dfuzzy/1( sprak )")
    lev = eng.search("q", "#fuzzy/1( sprak )")
    assert dam.num_rows > 0
    spark = eng.search("q", "spark")
    assert set(dam.column("doc_id").to_pylist()) >= set(
        spark.column("doc_id").to_pylist()
    )
    # Levenshtein at 1 edit cannot reach 'spark' from 'sprak', so the
    # classic expansion is a strict subset here
    assert set(lev.column("doc_id").to_pylist()) < set(
        dam.column("doc_id").to_pylist()
    )
