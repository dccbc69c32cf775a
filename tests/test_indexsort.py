"""Index sorting + early-terminating field-sorted collection
(indexsort.py): order semantics, the early-out visit bound, cursor
pagination tiling, error paths, and oracle parity of both gates."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _engine():
    from searchengine_ray.gate import engine_for

    return engine_for(SF, "bm25")


def test_sort_order_semantics(ray_session):
    from searchengine_ray.indexsort import sort_order

    eng = _engine()
    ids = sort_order(eng.index, "n_chars", descending=True)
    assert len(ids) == eng.index.n_local_docs
    vals, valid = eng.index.docvalues_for_docs("n_chars", ids)
    assert valid.all()  # n_chars is total on this corpus
    # non-increasing values; ties broken by ext rank ascending
    assert (np.diff(vals) <= 0).all()
    ext = eng.index.ext_ranks(ids)
    same = vals[1:] == vals[:-1]
    assert (np.diff(ext)[same] > 0).all()
    # ascending direction is the exact reverse ordering rule
    asc = sort_order(eng.index, "n_chars", descending=False)
    va, _ = eng.index.docvalues_for_docs("n_chars", asc)
    assert (np.diff(va) >= 0).all()
    # cached: same object back
    assert sort_order(eng.index, "n_chars", True) is ids


def test_sorted_search_equals_brute_force(ray_session):
    from searchengine_ray.indexsort import sorted_search

    eng = _engine()
    t = sorted_search(eng, "q", "dup spark", "n_chars", k=40)
    got = list(zip(t.column("doc_id").to_pylist(),
                   t.column("sort_val").to_pylist()))
    # brute force: evaluate, join values, sort
    full = eng.search("q", "dup spark")
    docs = full.column("doc_id").to_numpy()
    vals, _ = eng.index.docvalues_for_docs("n_chars", docs)
    ext = eng.index.ext_ranks(docs)
    order = np.lexsort((ext, -vals))[:40]
    exp = [(int(docs[i]), int(vals[i])) for i in order]
    assert got == exp


def test_early_termination_visit_bound(ray_session):
    from searchengine_ray.indexsort import sorted_search

    import searchengine_ray.indexsort as m

    eng = _engine()
    # a dense query (most docs match): with a small chunk the scan must
    # stop after a handful of chunks, never walking the corpus order
    orig_chunk = m._CHUNK
    try:
        m._CHUNK = 16
        t = sorted_search(eng, "q", "scan sort slow", "n_chars", k=5)
    finally:
        m._CHUNK = orig_chunk
    visited = int(t.schema.metadata[b"visited"])
    assert t.num_rows == 5
    # dense match set => a chunk or two suffices, far below corpus size
    assert visited <= 64 < eng.index.n_local_docs
    with pytest.raises(ValueError, match="k must be"):
        sorted_search(eng, "q", "dup", "n_chars", k=0)
    with pytest.raises(ValueError, match="not integral"):
        # engineered: a float docvalue — value is integral on this
        # corpus, so fake one via a score column? n_chars is integral;
        # use the embeddings-less 'value' only on events — no such doc
        # column, so assert the guard by monkeypatching docvalues
        import searchengine_ray.indexsort as m

        orig = eng.index.docvalues_for_docs
        try:
            eng.index.docvalues_for_docs = lambda c, d: (
                np.full(len(d), 1.5), np.ones(len(d), bool))
            eng.index._sortmap_cache = {}
            sorted_search(eng, "q", "dup", "n_chars", k=3)
        finally:
            eng.index.docvalues_for_docs = orig
            eng.index._sortmap_cache = {}


def test_search_after_pages_tile(ray_session):
    from searchengine_ray.indexsort import sorted_search, sorted_search_after

    eng = _engine()
    p1 = sorted_search(eng, "q", "dup", "n_chars", k=10)
    all25 = sorted_search(eng, "q", "dup", "n_chars", k=100)
    assert all25.num_rows == 25
    pages = [p1]
    while pages[-1].num_rows == 10:
        last = pages[-1]
        d = last.column("doc_id")[-1].as_py()
        v = last.column("sort_val")[-1].as_py()
        e = str(eng.index.external_ids(np.asarray([d], np.int64))[0])
        nxt = sorted_search_after(eng, "q", "dup", "n_chars",
                                  after_value=float(v),
                                  after_external_id=e, k=10)
        if nxt.num_rows == 0:
            break
        pages.append(nxt)
    tiled = [d for p in pages for d in p.column("doc_id").to_pylist()]
    assert tiled == all25.column("doc_id").to_pylist()


def test_sharded_sorted_merge_equals_full(ray_session):
    """Per-shard first-k + (value, ext) merge == the full-index answer —
    the per-segment collect + coordinator merge claim."""
    from searchengine_ray.build import build_index
    from searchengine_ray.config import BuildConfig, ModelParams
    from searchengine_ray.engine import SearchEngine
    from searchengine_ray.indexsort import sorted_search

    idx_dir = "/tmp/se_ray_index/sorted_sharded_t"
    # doc_bucket_size 200 -> partitions [0,200) [200,400) [400,600), all
    # non-empty over the 500-doc corpus
    build_index(SF, idx_dir, BuildConfig(num_partitions=3, doc_bucket_size=200))
    import json, os

    with open(os.path.join(idx_dir, "manifest.json")) as f:
        nparts = len(json.load(f)["partitions"])
    assert nparts == 3
    full = sorted_search(_engine(), "q", "dup", "n_chars", k=15)
    rows = []
    for p in range(nparts):
        eng_p = SearchEngine(
            idx_dir, ModelParams(model="bm25", top_k=1 << 30), parts=[p],
            docvalues_dir=SF,
        )
        tp = sorted_search(eng_p, "q", "dup", "n_chars", k=15)
        for d, v in zip(tp.column("doc_id").to_pylist(),
                        tp.column("sort_val").to_pylist()):
            rows.append((d, v))
    idx_full = _engine().index
    ext = idx_full.ext_ranks(np.asarray([r[0] for r in rows], np.int64))
    order = np.lexsort((ext, -np.asarray([r[1] for r in rows])))[:15]
    merged = [rows[i][0] for i in order]
    assert merged == full.column("doc_id").to_pylist()


def test_gates_match_oracles(ray_session):
    import __ray_entry__ as entry

    q = entry.queries()
    sql = entry.oracle_sql()
    con = duckdb.connect()
    for tbl in ("documents", "events", "embeddings"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{SF}/{tbl}.parquet')"
        )
    for name in ("se_sorted_search", "se_sorted_search_after"):
        got = q[name](SF).to_pandas()
        exp = con.sql(sql[name]).df()
        cols = sorted(got.columns)
        g = got[cols].sort_values(cols).reset_index(drop=True)
        e = exp[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, e, check_dtype=False), name


def test_sortmap_invalidated_on_docvalues_reattach(ray_session):
    """Re-attaching a different doc-values dir must drop the cached sort
    order (the r4-advice staleness class, applied to the new cache)."""
    from searchengine_ray.indexsort import sort_order

    eng = _engine()
    before = sort_order(eng.index, "n_chars", descending=True)
    assert ("n_chars", True) in eng.index._sortmap_cache
    try:
        eng.index.attach_docvalues("/tmp/does_not_matter_dir")
        assert ("n_chars", True) not in eng.index._sortmap_cache
    finally:
        eng.index.attach_docvalues(SF)
    after = sort_order(eng.index, "n_chars", descending=True)
    assert np.array_equal(before, after)
