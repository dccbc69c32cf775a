"""checkindex.check_index across the index lifecycle: fresh multi-part
build, segment append, tombstone deletion, expunge compaction, and
forceMerge must ALL verify clean — the integrity tool has to hold on
every layout the writer can produce, not just a fresh build."""

import pyarrow.compute as pc
import pytest


def _cfg():
    from searchengine_ray.config import BuildConfig

    return BuildConfig(doc_bucket_size=64, skip_block_docs=16, num_partitions=2)


@pytest.fixture(scope="module")
def lifecycle(ray_session, fixture_corpus, tmp_path_factory):
    """{name: index_dir} for every writer-producible layout."""
    import ray.data

    from searchengine_ray.build import add_documents, build_index, force_merge
    from searchengine_ray.delete import delete_documents, expunge_deletes

    tbl = fixture_corpus
    root = tmp_path_factory.mktemp("ci_life")
    out = {}

    lower = tbl.filter(pc.less(tbl.column("doc_id"), 60))
    upper = tbl.filter(pc.greater_equal(tbl.column("doc_id"), 60))

    inc = str(root / "inc")
    build_index(lambda: ray.data.from_arrow(lower), inc, _cfg())
    add_documents(inc, lambda: ray.data.from_arrow(upper), _cfg(), tag="up")
    out["incremental"] = inc

    dele = str(root / "dele")
    build_index(lambda: ray.data.from_arrow(tbl), dele, _cfg())
    delete_documents(dele, doc_ids=[3, 17, 40])
    out["tombstoned"] = dele

    expu = str(root / "expu")
    build_index(lambda: ray.data.from_arrow(tbl), expu, _cfg())
    delete_documents(expu, doc_ids=[3, 17, 40])
    expunge_deletes(expu)
    out["expunged"] = expu

    merged = str(root / "merged")
    build_index(lambda: ray.data.from_arrow(lower), merged, _cfg())
    add_documents(
        merged, lambda: ray.data.from_arrow(upper), _cfg(), tag="up"
    )
    force_merge(merged, num_partitions=1)
    out["force_merged"] = merged

    return out


@pytest.mark.parametrize(
    "layout", ["incremental", "tombstoned", "expunged", "force_merged"]
)
def test_lifecycle_layout_verifies_clean(lifecycle, layout):
    from searchengine_ray.checkindex import check_index

    t = check_index(lifecycle[layout]).to_pandas()
    assert len(t) == 4, layout
    assert t.lexicon_ok.all(), layout
    assert t.stats_ok.all(), layout
    assert (t.n_positions == t.sum_ctf).all(), layout


def test_expunge_shrinks_the_verified_content(lifecycle):
    """The expunged index's decoded content is a strict subset of the
    tombstoned one's (same corpus, 3 docs removed): fewer docs, smaller
    df/ctf sums — and BOTH verify, proving checkindex reads raw layout
    (tombstones don't mask corruption, expunge doesn't break invariants)."""
    from searchengine_ray.checkindex import check_index

    ts = check_index(lifecycle["tombstoned"]).to_pandas().set_index("field")
    ex = check_index(lifecycle["expunged"]).to_pandas().set_index("field")
    assert (ex.n_docs < ts.n_docs).all()
    assert (ex.sum_ctf <= ts.sum_ctf).all()
    assert (ex.sum_ctf < ts.sum_ctf).any()


def test_force_merged_equals_incremental_content(lifecycle):
    """forceMerge is a pure row redistribution: per-field content summary
    (counts AND checksum) identical to the unmerged segmented index."""
    from searchengine_ray.checkindex import check_index

    inc = (
        check_index(lifecycle["incremental"]).to_pandas()
        .set_index("field").sort_index()
    )
    mg = (
        check_index(lifecycle["force_merged"]).to_pandas()
        .set_index("field").sort_index()
    )
    for col in ("n_terms", "sum_df", "sum_ctf", "n_positions",
                "doclen_sum", "n_docs", "checksum"):
        assert inc[col].tolist() == mg[col].tolist(), col
