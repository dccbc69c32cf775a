"""Corpus-sums resume trap (VERDICT r4 item 7): a retried build can leave
overlapping-but-identical docmap files inside one partition; the reader
dedupes on doc_id and _finalize must mirror that — identical duplicates
leave stats.json unchanged, conflicting duplicates raise."""

import json
import os
import shutil

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest


def _docmap_file(idx: str) -> str:
    dm = os.path.join(idx, "docmap")
    for root, _dirs, files in os.walk(dm):
        for f in files:
            if f.endswith(".parquet"):
                return os.path.join(root, f)
    raise AssertionError("no docmap parquet found")


@pytest.fixture()
def small_index(ray_session, fixture_corpus, tmp_path):
    import ray.data

    from searchengine_ray.build import build_index
    from searchengine_ray.config import BuildConfig

    out = str(tmp_path / "idx")
    cfg = BuildConfig(doc_bucket_size=64, skip_block_docs=16, num_partitions=2)
    build_index(lambda: ray.data.from_arrow(fixture_corpus), out, cfg)
    return out


def test_identical_duplicate_docmap_rows_do_not_inflate_stats(small_index):
    from searchengine_ray.build import _finalize
    from searchengine_ray.config import BuildConfig

    with open(os.path.join(small_index, "stats.json")) as f:
        before = json.load(f)

    src = _docmap_file(small_index)
    shutil.copy(src, src.replace(".parquet", "_retry.parquet"))
    _finalize(small_index, BuildConfig())

    with open(os.path.join(small_index, "stats.json")) as f:
        after = json.load(f)
    assert after == before


def test_conflicting_duplicate_docmap_rows_raise(small_index):
    from searchengine_ray.build import _finalize
    from searchengine_ray.config import BuildConfig

    src = _docmap_file(small_index)
    t = pq.read_table(src)
    col = next(n for n in t.schema.names if n.startswith("len_"))
    bad = t.set_column(
        t.schema.get_field_index(col), col,
        pc.add(t.column(col), 1),
    )
    pq.write_table(bad, src.replace(".parquet", "_conflict.parquet"))
    with pytest.raises(Exception, match="conflicting docmap duplicates"):
        _finalize(small_index, BuildConfig())


def test_crash_leftover_tmp_dir_is_ignored(small_index):
    """Review finding r5: a crash-leftover part_XXXXX.tmp docmap dir (an
    _atomic_write that died between write and rename) holds near-duplicate
    rows of its real sibling; _finalize must skip it like the tiered-merge
    scan does, leaving stats.json unchanged."""
    from searchengine_ray.build import _finalize
    from searchengine_ray.config import BuildConfig

    with open(os.path.join(small_index, "stats.json")) as f:
        before = json.load(f)

    dm = os.path.join(small_index, "docmap")
    real = next(d for d in sorted(os.listdir(dm))
                if os.path.isdir(os.path.join(dm, d)))
    shutil.copytree(os.path.join(dm, real), os.path.join(dm, real + ".tmp"))
    _finalize(small_index, BuildConfig())

    with open(os.path.join(small_index, "stats.json")) as f:
        after = json.load(f)
    assert after == before


def test_winnow_pairs_matches_brute(ray_session):
    """Pairs equal a brute recomputation from the gated fingerprint
    stream (df cap + shared-count threshold)."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    from searchengine_ray.dedup import winnow_pairs
    from searchengine_ray.textstats import _winnow_doc_fps

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(sf + "/documents.parquet",
                      columns=["doc_id", "text"])
    ids = t.column("doc_id").to_numpy()
    dd, mm = _winnow_doc_fps(t, 3, 4)
    by_fp = defaultdict(set)
    for di, fp in zip(dd, mm):
        by_fp[int(fp)].add(int(ids[di]))
    shared = defaultdict(int)
    for docs in by_fp.values():
        if 2 <= len(docs) <= 50:
            ds = sorted(docs)
            for i in range(len(ds)):
                for j in range(i + 1, len(ds)):
                    shared[(ds[i], ds[j])] += 1
    exp = {p: c for p, c in shared.items() if c >= 5}
    got = winnow_pairs(sf).to_pandas()
    assert {(a, b): c for a, b, c in
            zip(got.doc_a, got.doc_b, got.n_shared)} == exp


def test_winnow_pairs_guards(ray_session):
    import pytest as _pytest

    from searchengine_ray.dedup import winnow_pairs

    with _pytest.raises(ValueError, match="min_shared"):
        winnow_pairs("/root/testdata/sf0.001", min_shared=0)
    with _pytest.raises(ValueError, match="pairs"):
        winnow_pairs("/root/testdata/sf0.001", min_shared=1,
                     max_pairs=1)
