import numpy as np
import pyarrow as pa

from searchengine_ray.hybrid import rrf_fuse


def _fuse_dict(t: pa.Table) -> dict:
    return dict(
        zip(t.column("doc_id").to_pylist(), t.column("rrf").to_pylist())
    )


def test_rrf_fuse_matches_bruteforce():
    rng = np.random.default_rng(11)
    lex_ids = rng.choice(200, size=50, replace=False).astype(np.int64)
    vec_ids = rng.choice(200, size=50, replace=False).astype(np.int64)
    lex = (lex_ids, np.arange(1, 51, dtype=np.int64))
    vec = (vec_ids, np.arange(1, 51, dtype=np.int64))
    got = rrf_fuse([lex, vec], rrf_k=60, k=200)

    want: dict[int, float] = {}
    for ids, ranks in (lex, vec):
        for i, r in zip(ids, ranks):
            want[int(i)] = want.get(int(i), 0.0) + 1.0 / (60 + int(r))
    assert _fuse_dict(got) == want
    # ordering: rrf desc, doc_id asc
    rows = list(
        zip(got.column("rrf").to_pylist(), got.column("doc_id").to_pylist())
    )
    assert rows == sorted(rows, key=lambda x: (-x[0], x[1]))
    assert got.column("rank").to_pylist() == list(range(1, len(rows) + 1))


def test_rrf_doc_in_both_legs_beats_single_leg_rank1():
    # rank 2 + rank 2 = 2/62 > 1/61 = rank 1 in one leg only
    lex = (np.array([10, 20], dtype=np.int64), np.array([1, 2]))
    vec = (np.array([30, 20], dtype=np.int64), np.array([1, 2]))
    got = rrf_fuse([lex, vec], rrf_k=60, k=3)
    assert got.column("doc_id").to_pylist()[0] == 20


def test_rrf_tie_breaks_by_doc_id():
    # two docs each rank-1 in exactly one leg: identical rrf, id asc wins
    lex = (np.array([7], dtype=np.int64), np.array([1]))
    vec = (np.array([3], dtype=np.int64), np.array([1]))
    got = rrf_fuse([lex, vec], rrf_k=60, k=2)
    assert got.column("doc_id").to_pylist() == [3, 7]
    r = got.column("rrf").to_pylist()
    assert r[0] == r[1]


def test_rrf_empty_legs():
    e = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    t = rrf_fuse([e, e])
    assert t.num_rows == 0
    assert t.schema.names == ["doc_id", "rrf", "rank"]
