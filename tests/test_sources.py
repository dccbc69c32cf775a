"""JSONL/CSV source+sink roundtrips (sources.py): exact content fidelity
on adversarial text (embedded newlines, quotes, commas, unicode, empties)
and the gate's checksum surface."""

import os

import pyarrow as pa
import pyarrow.parquet as pq


TRICKY = [
    "plain text",
    "line one\nline two\nline three",
    'quotes "inside" and, commas, everywhere',
    "unicode: naïve café — 漢字 🚀",
    "",
    "trailing newline\n",
    "tab\tseparated\tvalues",
    "both \"quotes\" and\nnewlines, plus a comma",
]


def _tiny_sf(tmp_path):
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    t = pa.table(
        {
            "doc_id": pa.array(range(len(TRICKY)), type=pa.int64()),
            "text": pa.array(TRICKY, type=pa.string()),
            "lang": pa.array(["en"] * len(TRICKY), type=pa.string()),
            "source": pa.array(["t"] * len(TRICKY), type=pa.string()),
            "n_chars": pa.array(
                [len(s) for s in TRICKY], type=pa.int64()
            ),
        }
    )
    pq.write_table(t, os.path.join(sf, "documents.parquet"))
    return sf, t


def test_tricky_text_roundtrips_exactly(ray_session, tmp_path):
    from searchengine_ray import sources

    sf, orig = _tiny_sf(tmp_path)
    sources.write_documents_jsonl(sf, str(tmp_path / "j"))
    sources.write_documents_csv(sf, str(tmp_path / "c"))
    for reader, path in (
        (sources.read_documents_jsonl, str(tmp_path / "j")),
        (sources.read_documents_csv, str(tmp_path / "c")),
    ):
        got = (
            reader(path)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        exp = orig.to_pandas()
        assert got.text.tolist() == exp.text.tolist(), path
        assert got.doc_id.tolist() == exp.doc_id.tolist()
        assert got.n_chars.tolist() == exp.n_chars.tolist()
        assert got.lang.tolist() == exp.lang.tolist()


def test_roundtrip_check_pins_both_formats(ray_session, tmp_path):
    """The gate surface: one row per (fmt, doc), shas equal across fmts
    and equal to a direct hash of the originals."""
    import hashlib

    from searchengine_ray import sources

    sf, orig = _tiny_sf(tmp_path)
    # bypass the /tmp cache (keyed on sf_dir) by exporting explicitly
    sources._EXPORT_CACHE.clear()
    t = sources.roundtrip_check(sf).to_pandas()
    assert len(t) == 2 * len(TRICKY)
    assert set(t.fmt) == {"csv", "jsonl"}
    exp_sha = {
        i: hashlib.sha256(s.encode()).hexdigest()[:40]
        for i, s in enumerate(TRICKY)
    }
    for _, row in t.iterrows():
        assert row.sha == exp_sha[row.doc_id], (row.fmt, row.doc_id)
    sources._EXPORT_CACHE.clear()


def test_multi_shard_export_reads_whole(ray_session, tmp_path):
    """A sharded JSONL export (multiple files) reads back complete."""
    import ray.data

    from searchengine_ray import sources

    sf = str(tmp_path / "sf2")
    os.makedirs(sf)
    n = 257
    t = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array([f"doc {i}\nbody" for i in range(n)]),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array([10] * n, type=pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(sf, "documents.parquet"))
    out = str(tmp_path / "jm")
    ray.data.read_parquet(
        os.path.join(sf, "documents.parquet"), override_num_blocks=4
    ).write_json(out)
    assert len(os.listdir(out)) > 1  # actually sharded
    got = sources.read_documents_jsonl(out).to_pandas()
    assert sorted(got.doc_id.tolist()) == list(range(n))


def test_export_cache_invalidates_on_regenerated_corpus(
    ray_session, tmp_path
):
    """A regenerated documents.parquet at the SAME path must re-export —
    the cache keys on (path, mtime_ns, size), not path alone."""
    from searchengine_ray import sources

    sf, _ = _tiny_sf(tmp_path)
    root1 = sources._export_root(sf)
    # regenerate the corpus at the same path with different content
    t2 = pa.table(
        {
            "doc_id": pa.array([0], type=pa.int64()),
            "text": pa.array(["regenerated"], type=pa.string()),
            "lang": pa.array(["en"], type=pa.string()),
            "source": pa.array(["t"], type=pa.string()),
            "n_chars": pa.array([11], type=pa.int64()),
        }
    )
    pq.write_table(t2, os.path.join(sf, "documents.parquet"))
    os.utime(
        os.path.join(sf, "documents.parquet"),
        ns=(1, 1),  # force a distinct mtime even on coarse clocks
    )
    root2 = sources._export_root(sf)
    assert root2 != root1
    got = sources.read_documents_jsonl(os.path.join(root2, "jsonl"))
    assert got.to_pandas().text.tolist() == ["regenerated"]


def test_hive_roundtrip_all_langs(ray_session):
    """Partitioned write + per-partition pruned reads reconstruct the
    full corpus exactly (sha-pinned per doc)."""
    import duckdb
    import pyarrow as pa

    from searchengine_ray.sources import (
        _hive_export_root, hive_roundtrip_check, read_documents_hive,
    )

    sf = "/root/testdata/sf0.001"
    langs = duckdb.sql(
        f"SELECT DISTINCT lang FROM "
        f"read_parquet('{sf}/documents.parquet') ORDER BY lang"
    ).df().lang.tolist()
    root = _hive_export_root(sf)
    total = 0
    for lg in langs:
        t = pa.concat_tables(
            pa.table(b) for b in read_documents_hive(root, lg).iter_batches(
                batch_format="pyarrow")
        )
        assert set(t.column("lang").to_pylist()) == {lg}
        total += t.num_rows
    assert total == 500
    en = hive_roundtrip_check(sf, "en")
    exp = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf}/documents.parquet') "
        f"WHERE lang = 'en'"
    ).fetchone()[0]
    assert en.num_rows == exp
