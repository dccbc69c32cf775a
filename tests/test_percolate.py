"""Percolation (percolate.py): membership must equal the index-backed
engine for every operator family (the point of reusing the real
Evaluator), results must be batch-partitioning-invariant, and degenerate
documents must not crash the batch-postings adapter."""

import os

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF}/documents.parquet"), reason="testdata missing"
)

QUERIES = [
    ("q_and", "dup spark"),
    ("q_near", "#near/1( hash join )"),
    ("q_or", "#or( vector scan )"),
    ("q_andnot", "#andnot( merge sort )"),
    ("q_window", "#window/8( vector scan )"),
    ("q_syn", "#syn( scan sort )"),
]


def test_percolate_equals_index_backed_engine(ray_session):
    from searchengine_ray.gate import engine_for
    from searchengine_ray.percolate import percolate

    t = percolate(SF, QUERIES).to_pandas()
    eng = engine_for(SF, "unrankedboolean")
    for qid, q in QUERIES:
        want = set(eng.search("x", q).column("doc_id").to_pylist())
        got = set(t[t["query_id"] == qid]["doc_id"])
        assert got == want, qid
        assert want  # every stored query matches something at sf0.001


def test_percolator_partition_invariant(ray_session):
    """Matching is doc-local: any split of the same rows into batches
    yields the identical pair set."""
    import pyarrow.parquet as papq

    from searchengine_ray.percolate import Percolator

    tbl = papq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    p = Percolator(QUERIES)

    def pairs(batches):
        out = set()
        for b in batches:
            r = p(b)
            out |= set(
                zip(r.column("doc_id").to_pylist(), r.column("query_id").to_pylist())
            )
        return out

    whole = pairs([tbl])
    split3 = pairs([tbl.slice(0, 100), tbl.slice(100, 37), tbl.slice(137)])
    assert whole == split3 and whole


def test_percolator_degenerate_docs():
    from searchengine_ray.percolate import Percolator

    t = pa.table(
        {
            "doc_id": pa.array([5, 6, 7], type=pa.int64()),
            "text": pa.array(["", "the of and", "hash join dup"]),
        }
    )
    p = Percolator([("a", "#near/1( hash join )"), ("b", "dup spark")])
    r = p(t)
    got = set(zip(r.column("doc_id").to_pylist(), r.column("query_id").to_pylist()))
    assert got == {(7, "a")}  # near matches; 'dup spark' needs BOTH terms


def test_percolator_non_body_field_raises():
    from searchengine_ray.percolate import Percolator

    t = pa.table(
        {"doc_id": pa.array([1], type=pa.int64()), "text": pa.array(["dup"])}
    )
    p = Percolator([("a", "dup.keywords")])
    with pytest.raises(NotImplementedError):
        p(t)


def test_scored_percolation_equals_serving_scores(ray_session):
    """The scored-percolation contract: for corpus docs, every (doc,
    stored query) match carries the serving engine's BM25 score BITWISE
    (global stats injected via stats_override, tf/dl from the stream) —
    across flat, derived-positional, and field queries."""
    from searchengine_ray.gate import engine_for, index_for
    from searchengine_ray.percolate import percolate_scored

    # body-only, like all percolation (the documented adapter contract);
    # flat #SUM plus a derived positional list (global derived df/ctf)
    queries = [
        ("f", "dup spark"),
        ("n", "#near/1( hash join )"),
        ("w", "#sum( #window/8( vector scan ) merge )"),
    ]
    out = percolate_scored(SF, index_for(SF), queries).to_pandas()
    eng = engine_for(SF, "bm25")
    for qid, q in queries:
        want = (
            eng.search("x", q).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
        got = (
            out[out.query_id == qid]
            .sort_values("doc_id").reset_index(drop=True)
        )
        assert len(got) == len(want) and len(want) > 0, qid
        assert (got.doc_id.values == want.doc_id.values).all(), qid
        assert (got.score.values == want.score.values).all(), qid


def test_scored_percolator_keeps_no_index_and_validates_model(ray_session):
    """The actor state is model-sized (no index reader retained) and
    non-BM25 scoring raises up front."""
    from searchengine_ray.config import ModelParams
    from searchengine_ray.gate import index_for
    from searchengine_ray.percolate import ScoredPercolator

    p = ScoredPercolator(index_for(SF), [("q", "dup spark")])
    assert not any(
        "InvertedIndex" in type(v).__name__ for v in vars(p).values()
    )
    with pytest.raises(ValueError, match="BM25"):
        ScoredPercolator(
            index_for(SF), [("q", "dup")],
            params=ModelParams(model="indri"),
        )


def test_percolation_on_stemmed_profile(ray_session, tmp_path):
    """Regression (session review finding): queries stem at parse, so the
    document STREAM must stem with the same profile — membership takes
    the profile explicitly, scored percolation reads it from the index.
    On a porter index, 'running' must percolate docs containing 'runs'."""
    import ray.data

    from searchengine_ray.build import build_index
    from searchengine_ray.config import BuildConfig
    from searchengine_ray.gate import engine_for  # noqa: F401 (style par)
    from searchengine_ray.engine import SearchEngine
    from searchengine_ray.config import ModelParams
    from searchengine_ray.percolate import Percolator, percolate_scored

    texts = ["the runner runs fast", "walking walks", "runs running runs",
             "unrelated words here"]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(4, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 4),
        "source": pa.array(["s"] * 4),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    import pyarrow.parquet as papq

    papq.write_table(tbl, sf / "documents.parquet")
    idx = str(tmp_path / "idx")
    build_index(str(sf), idx, BuildConfig(stemmer="porter"))

    # membership: explicit profile, both sides stem
    p = Percolator([("q", "running")], stemmer_name="porter")
    got = p(tbl.select(["doc_id", "text"]))
    assert set(got.column("doc_id").to_pylist()) == {0, 2}

    # scored: profile read from the index; scores == serving bitwise
    out = percolate_scored(str(sf), idx, [("q", "running walks")]).to_pandas()
    eng = SearchEngine(idx, ModelParams(model="bm25", top_k=1 << 30))
    want = eng.search("x", "running walks").to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    got2 = out.sort_values("doc_id").reset_index(drop=True)
    assert len(got2) == len(want) > 0
    assert (got2.doc_id.values == want.doc_id.values).all()
    assert (got2.score.values == want.score.values).all()
