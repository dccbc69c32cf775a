"""#SPANFIRST / #SPANNOT (Lucene SpanFirstQuery / SpanNotQuery analogs):
vectorized packed-key machines vs a scalar per-doc python oracle, plus
parser arity/no-collapse rules.
"""

import numpy as np
import pytest

from searchengine_ray.analyze import analyze_query_token
from searchengine_ray.indexio import Postings
from searchengine_ray.operators import _eval_spanfirst, _eval_spannot
from searchengine_ray.qryparse import QuerySyntaxError, parse_query


def _mk_postings(doc_pos: dict[int, list[int]]) -> Postings:
    docs = sorted(d for d in doc_pos if doc_pos[d])
    tfs = np.array([len(doc_pos[d]) for d in docs], dtype=np.int64)
    off = np.zeros(len(docs) + 1, dtype=np.int64)
    np.cumsum(tfs, out=off[1:])
    flat = np.array(
        [p for d in docs for p in doc_pos[d]], dtype=np.int64
    )
    return Postings(
        np.array(docs, dtype=np.int64), tfs, off, flat,
        df=len(docs), ctf=int(tfs.sum()),
    )


def _rand_postings(rng, n_docs=50, max_pos=40, p_doc=0.7):
    dp = {}
    for d in range(n_docs):
        if rng.random() < p_doc:
            npos = int(rng.integers(1, 8))
            dp[d] = sorted(rng.choice(max_pos, size=npos, replace=False).tolist())
    return dp


@pytest.mark.parametrize("seed,end", [(0, 1), (1, 3), (2, 7), (3, 40)])
def test_spanfirst_matches_scalar(seed, end):
    rng = np.random.default_rng(seed)
    dp = _rand_postings(rng)
    got = _eval_spanfirst(_mk_postings(dp), end)
    exp = {d: [p for p in ps if p < end] for d, ps in dp.items()}
    exp = {d: ps for d, ps in exp.items() if ps}
    assert got.doc_ids.tolist() == sorted(exp)
    for i, d in enumerate(got.doc_ids):
        assert got.positions_for(i).tolist() == exp[int(d)]
    assert got.df == len(exp) and got.ctf == sum(map(len, exp.values()))


@pytest.mark.parametrize("seed,dist", [(0, 0), (1, 1), (2, 3), (3, 10), (4, 2)])
def test_spannot_matches_scalar(seed, dist):
    rng = np.random.default_rng(100 + seed)
    inc, exc1, exc2 = (_rand_postings(rng) for _ in range(3))
    got = _eval_spannot(
        [_mk_postings(inc), _mk_postings(exc1), _mk_postings(exc2)], dist
    )
    exp = {}
    for d, ps in inc.items():
        keep = [
            p for p in ps
            if not any(
                abs(p - q) <= dist
                for ex in (exc1, exc2)
                for q in ex.get(d, [])
            )
        ]
        if keep:
            exp[d] = keep
    assert got.doc_ids.tolist() == sorted(exp)
    for i, d in enumerate(got.doc_ids):
        assert got.positions_for(i).tolist() == exp[int(d)]


def test_spannot_empty_exclude_is_identity():
    inc = _mk_postings({3: [0, 5], 9: [2]})
    got = _eval_spannot([inc, _mk_postings({})], 4)
    assert got.doc_ids.tolist() == [3, 9]
    assert got.positions.tolist() == [0, 5, 2]


def test_parser_spanfirst_no_collapse_and_arity():
    t = parse_query("#spanfirst/5( spark )", "#sum", analyze_query_token)
    leaf = t.args[0].args[0] if t.name == "#sum" else t.args[0]
    # single-arg #spanfirst must survive the optimizer
    assert "spanfirst" in repr(t)
    with pytest.raises(QuerySyntaxError):
        parse_query("#spanfirst/0( spark )", "#sum", analyze_query_token)
    with pytest.raises(QuerySyntaxError):
        parse_query("#spanfirst/3( spark scan )", "#sum", analyze_query_token)


def test_parser_spannot_arity_stopword_include_is_loud():
    # include leg 'the' is dropped by analysis -> under-arity must raise,
    # never silently promote the exclude leg (same doc'd caveat as #filreq)
    with pytest.raises(QuerySyntaxError):
        parse_query("#spannot/2( the vector )", "#sum", analyze_query_token)
    t = parse_query("#spannot/2( scan vector the )", "#sum", analyze_query_token)
    assert "spannot" in repr(t)
