"""CheckIndex analog (checkindex.check_index): clean-index invariants,
lexicon/stats cross-checks, SQL-stoplist parity, and loud failure on
planted corruption of every verified surface."""

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _check(index_dir):
    from searchengine_ray.checkindex import check_index

    return check_index(index_dir).to_pandas().set_index("field")


def test_clean_index_summary(ray_session, built_index, fixture_corpus):
    t = _check(built_index)
    assert sorted(t.index) == ["body", "keywords", "title", "url"]
    assert t.lexicon_ok.all() and t.stats_ok.all()
    # every decoded position was counted, and positions == ctf
    assert (t.n_positions == t.sum_ctf).all()
    assert (t.n_docs == fixture_corpus.num_rows).all()
    # stopwords occupy positions but are not indexed -> strict inequality
    assert (t.sum_ctf < t.doclen_sum).loc["body"]
    assert (t.n_terms > 0).all()


def test_checksum_matches_lexicon_recompute(ray_session, built_index):
    """The decoded-content checksum equals one recomputed from the lexicon
    directory — i.e. encode->decode is content-lossless per (term,df,ctf)."""
    import pyarrow.dataset as pads

    from searchengine_ray.checkindex import term_triple_checksum

    t = _check(built_index)
    lex = pads.dataset(
        glob.glob(os.path.join(built_index, "lexicon", "**", "*.parquet"),
                  recursive=True)
    ).to_table().to_pandas()
    for f, grp in lex.groupby("field"):
        assert t.loc[f, "checksum"] == term_triple_checksum(
            grp.term.tolist(), grp.df.to_numpy(), grp.ctf.to_numpy()
        )


def test_stoplist_matches_oracle_sql(ray_session):
    """analyze.STOPWORDS == the _STOPLIST_SQL literal the oracles use."""
    import __ray_entry__ as entry
    from searchengine_ray.analyze import STOPWORDS

    sql_words = set(
        w.strip("'") for w in entry._STOPLIST_SQL.strip("()").split(",")
    )
    assert sql_words == set(STOPWORDS)


def _corrupt_copy(built_index, tmp_path, mutate):
    """Copy the index, apply ``mutate(table) -> table`` to its first
    postings file, return the copied index dir."""
    dst = str(tmp_path / "corrupt_idx")
    shutil.copytree(built_index, dst)
    f = sorted(glob.glob(
        os.path.join(dst, "postings", "**", "*.parquet"), recursive=True
    ))[0]
    t = pq.read_table(f)
    pq.write_table(mutate(t), f)
    return dst


def _set_col(t, name, idx, value):
    col = t.column(name).to_pylist()
    col[idx] = value
    i = t.schema.get_field_index(name)
    return t.set_column(i, name, pa.array(col, type=t.schema.field(name).type))


def test_corrupt_df_raises(ray_session, built_index, tmp_path):
    from searchengine_ray.checkindex import check_index

    bad = _corrupt_copy(
        built_index, tmp_path,
        lambda t: _set_col(t, "df", 0, t.column("df")[0].as_py() + 1),
    )
    with pytest.raises(ValueError, match="df"):
        check_index(bad)


def test_corrupt_ctf_raises(ray_session, built_index, tmp_path):
    from searchengine_ray.checkindex import check_index

    bad = _corrupt_copy(
        built_index, tmp_path,
        lambda t: _set_col(t, "ctf", 0, t.column("ctf")[0].as_py() + 1),
    )
    with pytest.raises(ValueError, match="ctf"):
        check_index(bad)


def test_corrupt_blockmax_raises(ray_session, built_index, tmp_path):
    from searchengine_ray.checkindex import check_index

    def mut(t):
        v = t.column("blk_max_tf").to_pylist()
        v[0] = [x + 1 for x in v[0]]
        i = t.schema.get_field_index("blk_max_tf")
        return t.set_column(
            i, "blk_max_tf", pa.array(v, type=t.schema.field("blk_max_tf").type)
        )

    bad = _corrupt_copy(built_index, tmp_path, mut)
    with pytest.raises(ValueError, match="block-max"):
        check_index(bad)


def test_corrupt_payload_raises(ray_session, built_index, tmp_path):
    """Flipping bytes inside the varbyte docs payload is caught by one of
    the structural invariants (df/ascending/first-last)."""
    from searchengine_ray.checkindex import check_index

    def mut(t):
        raw = bytearray(t.column("docs_vb")[0].as_py())
        raw[0] ^= 0x01
        return _set_col(t, "docs_vb", 0, bytes(raw))

    bad = _corrupt_copy(built_index, tmp_path, mut)
    with pytest.raises(ValueError):
        check_index(bad)


def test_conflicting_docmap_duplicate_raises(
    ray_session, built_index, tmp_path
):
    from searchengine_ray.checkindex import check_index

    dst = str(tmp_path / "dupdm_idx")
    shutil.copytree(built_index, dst)
    f = sorted(glob.glob(
        os.path.join(dst, "docmap", "**", "*.parquet"), recursive=True
    ))[0]
    t = pq.read_table(f)
    first = t.slice(0, 1).to_pydict()
    first["len_body"] = [first["len_body"][0] + 5]  # CONFLICTING duplicate
    pq.write_table(
        pa.concat_tables([t, pa.table(first, schema=t.schema)]), f
    )
    with pytest.raises(ValueError, match="conflicting docmap duplicates"):
        check_index(dst)


def test_identical_docmap_duplicate_tolerated(
    ray_session, built_index, tmp_path
):
    """Retry-shaped duplicates (identical rows) pass, like the reader."""
    from searchengine_ray.checkindex import check_index

    dst = str(tmp_path / "retrydm_idx")
    shutil.copytree(built_index, dst)
    f = sorted(glob.glob(
        os.path.join(dst, "docmap", "**", "*.parquet"), recursive=True
    ))[0]
    t = pq.read_table(f)
    pq.write_table(pa.concat_tables([t, t.slice(0, 1)]), f)
    out = check_index(dst).to_pandas()
    assert out.lexicon_ok.all() and out.stats_ok.all()


def test_docmap_cache_invalidates_on_rewrite(tmp_path):
    """_load_docmap_cached keys on the partition's file fingerprint, not
    path alone — expunge/force_merge rewrite docmap content at the same
    path, and a long-lived worker must not serve the pre-mutation copy."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_ray import checkindex

    dm = tmp_path / "docmap" / "part_00000"
    dm.mkdir(parents=True)
    f = dm / "data.parquet"
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "len_body": pa.array([10, 20], pa.int64())}),
        f,
    )
    ids1, lens1 = checkindex._load_docmap_cached(str(dm), ("len_body",))
    assert list(ids1) == [1, 2]
    # rewrite the partition content at the same path (expunge analog)
    pq.write_table(
        pa.table({"doc_id": pa.array([2], pa.int64()),
                  "len_body": pa.array([20], pa.int64())}),
        f,
    )
    os.utime(f, ns=(2, 2))
    ids2, lens2 = checkindex._load_docmap_cached(str(dm), ("len_body",))
    assert list(ids2) == [2]
    assert list(lens2["len_body"]) == [20]
