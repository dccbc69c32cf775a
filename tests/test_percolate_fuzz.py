"""Randomized percolation cross-check: generated NESTED structured
queries must percolate to exactly the index-backed engine's boolean
membership — the strongest evidence the batch-postings adapter and the
serving index present identical semantics to the shared Evaluator."""

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


def _gen_query(rng, depth=0):
    ops = ["#and", "#or", "#syn", "#near/2", "#window/4"]
    if depth >= 2 or rng.random() < 0.35:
        return _TERMS[rng.integers(len(_TERMS))]
    op = ops[rng.integers(len(ops))]
    n = int(rng.integers(2, 4))
    if op in ("#syn", "#near/2", "#window/4"):
        # iop operators take term/iop args; keep args as terms for
        # validity across models
        args = [_TERMS[rng.integers(len(_TERMS))] for _ in range(n)]
    else:
        args = [_gen_query(rng, depth + 1) for _ in range(n)]
    return f"{op}( {' '.join(args)} )"


def test_percolation_fuzz_equals_engine(ray_session):
    import pyarrow.parquet as papq

    from searchengine_ray.gate import engine_for
    from searchengine_ray.percolate import Percolator

    rng = np.random.default_rng(42)
    queries = [(f"q{i}", _gen_query(rng)) for i in range(25)]
    eng = engine_for(SF, "unrankedboolean")
    tbl = papq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    p = Percolator(queries)
    r = p(tbl)
    got = {}
    for d, q in zip(r.column("doc_id").to_pylist(), r.column("query_id").to_pylist()):
        got.setdefault(q, set()).add(d)
    nonempty = 0
    for qid, q in queries:
        want = set(eng.search("x", q).column("doc_id").to_pylist())
        assert got.get(qid, set()) == want, (qid, q)
        nonempty += bool(want)
    assert nonempty >= 10  # the corpus vocabulary makes most queries match
