"""Numeric doc-values #range filter (ES range query / Lucene
NumericDocValues analog): standalone membership vs a DuckDB BETWEEN,
filter-context score identity under #filreq, tombstone exclusion, missing
/ malformed inputs."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def range_ctx(ray_session, tmp_path_factory):
    import pyarrow.parquet as pq

    from searchengine_ray.build import build_index
    from searchengine_ray.config import BuildConfig

    rng = np.random.default_rng(5)
    vocab = ["alpha", "beta", "gamma", "delta", "mutex", "lock", "the"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 30)))
        for _ in range(60)
    ]
    root = tmp_path_factory.mktemp("rng")
    sf = root / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(60, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 60),
            "source": pa.array(["s0"] * 60),
            "n_chars": pa.array(
                [len(t) for t in texts], type=pa.int64()
            ),
        }),
        sf / "documents.parquet",
    )
    idx = str(root / "idx")
    build_index(str(sf), idx, BuildConfig(doc_bucket_size=16,
                                          num_partitions=2))
    return str(sf), idx, texts


def _engine(idx, sf, model="unrankedboolean", dv=True):
    from searchengine_ray.config import ModelParams
    from searchengine_ray.engine import SearchEngine

    return SearchEngine(
        idx, ModelParams(model=model, top_k=1 << 30),
        docvalues_dir=sf if dv else None,
    )


def test_range_membership_matches_between(range_ctx):
    sf, idx, texts = range_ctx
    eng = _engine(idx, sf)
    got = set(eng.search("q", "#range( n_chars 60 120 )")
              .column("doc_id").to_pylist())
    want = {i for i, t in enumerate(texts) if 60 <= len(t) <= 120}
    assert got == want and 0 < len(want) < 60


def test_range_filter_context_keeps_scores(range_ctx):
    sf, idx, texts = range_ctx
    eng = _engine(idx, sf, model="bm25")
    base = eng.search("q", "mutex lock").to_pandas()
    filt = eng.search(
        "q", "#filreq( #range( n_chars 60 120 ) #sum( mutex lock ) )"
    ).to_pandas()
    keep = {i for i, t in enumerate(texts) if 60 <= len(t) <= 120}
    want = base[base.doc_id.isin(keep)]
    assert filt.doc_id.tolist() == want.doc_id.tolist()
    assert (filt.score.values == want.score.values).all()


def test_range_excludes_tombstoned_docs(range_ctx, tmp_path):
    import shutil

    from searchengine_ray.delete import delete_documents

    sf, idx, texts = range_ctx
    idx2 = str(tmp_path / "idx2")
    shutil.copytree(idx, idx2)
    eng = _engine(idx2, sf)
    before = eng.search("q", "#range( n_chars 60 120 )")
    victims = before.column("external_id").to_pylist()[:3]
    delete_documents(idx2, external_ids=victims)
    after = _engine(idx2, sf).search("q", "#range( n_chars 60 120 )")
    assert set(after.column("external_id").to_pylist()) == (
        set(before.column("external_id").to_pylist()) - set(victims)
    )


def test_range_error_paths(range_ctx):
    sf, idx, _ = range_ctx
    # no doc values attached -> clear error
    with pytest.raises(ValueError, match="doc values"):
        _engine(idx, sf, dv=False).search("q", "#range( n_chars 0 10 )")
    eng = _engine(idx, sf)
    with pytest.raises(ValueError):  # bad arity (parse/optimize time)
        eng.search("q", "#range( n_chars 10 )")
    with pytest.raises(ValueError):  # non-numeric bounds
        eng.search("q", "#range( n_chars low high )")
    with pytest.raises(ValueError):  # non-numeric column
        eng.search("q", "#range( lang 0 10 )")


def test_range_disjoint_docvalues_matches_nothing(range_ctx, tmp_path):
    """Regression (session review finding): a doc-values source whose
    doc_ids have ZERO overlap with the shard's span (e.g. a segment from
    another corpus) must apply missing-field semantics — no matches, no
    IndexError from the empty pushdown read."""
    import pyarrow.parquet as pq

    sf, idx, _ = range_ctx
    other = tmp_path / "other"
    other.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": pa.array([1000, 1001], pa.int64()),
            "n_chars": pa.array([5, 6], pa.int64()),
        }),
        other / "documents.parquet",
    )
    eng = _engine(idx, str(other))
    assert eng.search("q", "#range( n_chars 0 1000000 )").num_rows == 0


def test_range_unknown_column_raises_value_error(range_ctx):
    """ADVICE r4: a column absent from documents.parquet must surface as
    the same clean ValueError the numeric/arity paths raise, not a raw
    pyarrow error."""
    sf, idx, _ = range_ctx
    eng = _engine(idx, sf)
    with pytest.raises(ValueError, match="unknown doc-values column"):
        eng.search("q", "#range( no_such_column 0 10 )")


def test_attach_docvalues_invalidates_cache(range_ctx, tmp_path):
    """ADVICE r4: re-attaching a DIFFERENT corpus dir on a live reader must
    drop the per-column cache — stale values from the first corpus must not
    be served for already-queried columns."""
    import pyarrow.parquet as pq

    sf, idx, texts = range_ctx
    eng = _engine(idx, sf)
    first = set(
        eng.search("q", "#range( n_chars 60 120 )").column("doc_id").to_pylist()
    )
    assert first  # cache is now warm for n_chars

    # second corpus: same doc_ids, shifted values -> nothing in [60, 120]
    other = tmp_path / "other2"
    other.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(60, dtype=np.int64)),
            "n_chars": pa.array([10**6] * 60, type=pa.int64()),
        }),
        other / "documents.parquet",
    )
    eng.index.attach_docvalues(str(other))
    assert eng.search("q", "#range( n_chars 60 120 )").num_rows == 0
    # re-attaching the SAME dir keeps the (now re-warmed) cache valid
    eng.index.attach_docvalues(str(other))
    assert eng.search("q", "#range( n_chars 999999 1000001 )").num_rows == 60
