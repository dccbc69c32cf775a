"""Document deletion: tombstones (Lucene live-docs semantics — deleted docs
vanish from every posting list while docFreq/ctf stay stale) and expunge
compaction (forceMergeDeletes — the index becomes bitwise-equivalent to a
from-scratch build of the surviving corpus). The reference only reads a
merged Lucene index (Homeworks/HW6/QryEval/Idx.java:237-260); this covers
the writer side its users rely on Lucene for."""

import json
import os

import numpy as np
import pyarrow.compute as pc
import pytest

from searchengine_ray.build import build_index
from searchengine_ray.config import BuildConfig, ModelParams
from searchengine_ray.delete import delete_documents, expunge_deletes
from searchengine_ray.engine import SearchEngine

QUERIES = {
    "bm25": ["mutex lock", "#near/1( unit test )", "uniqueterm_only_here"],
    "indri": ["#and( open file )", "#wand( 0.3 mutex 0.7 lock )"],
    "rankedboolean": [
        "#or( read write )", "#syn( fault failure )", "#window/8( read write )"
    ],
}


def _cfg() -> BuildConfig:
    return BuildConfig(doc_bucket_size=64, skip_block_docs=16, num_partitions=2)


def _run_all(index_dir: str, parse_positions: bool = True):
    """{(model, query): DataFrame} over every planted query, full depth."""
    out = {}
    for model, queries in QUERIES.items():
        eng = SearchEngine(index_dir, ModelParams(model=model, top_k=1 << 30))
        for q in queries:
            out[(model, q)] = eng.search("q", q).to_pandas()
    return out


def _ext_ids(tbl) -> list[str]:
    return [
        f"{r}/{p}@{c}"
        for r, p, c in zip(
            tbl.column("repo").to_pylist(),
            tbl.column("path").to_pylist(),
            tbl.column("commit").to_pylist(),
        )
    ]


@pytest.fixture(scope="module")
def deleted(ray_session, fixture_corpus, tmp_path_factory):
    """(index dir with tombstones, baseline results, dead ext-id set,
    survivors-only corpus table)."""
    import ray.data

    root = tmp_path_factory.mktemp("del")
    idx = str(root / "idx")
    build_index(lambda: ray.data.from_arrow(fixture_corpus), idx, _cfg())
    base = _run_all(idx)
    # kill every 3rd hit of each query -> the dead set provably intersects
    # every result list (term, positional, syn, window, wand paths alike)
    dead = sorted({
        e for df in base.values() for e in df.external_id.tolist()[::3]
    })
    assert len(dead) >= 10
    pre_reader = SearchEngine(idx, ModelParams(model="bm25", top_k=1 << 30))
    n = delete_documents(idx, external_ids=dead + ["org0/never-built@dead"])
    assert n == len(dead)  # unknown external id ignored, no error
    ext = np.asarray(_ext_ids(fixture_corpus))
    survivors = fixture_corpus.filter(
        ~np.isin(ext, np.asarray(dead, dtype=object))
    )
    return idx, base, set(dead), survivors, pre_reader


def test_deleted_docs_vanish_and_survivors_keep_scores(deleted):
    idx, base, dead, _, _ = deleted
    after = _run_all(idx)
    for key, b in base.items():
        a = after[key]
        assert not set(a.external_id) & dead, key
        # Lucene-faithful stats: TERM docFreq/ctf stay stale (deleted docs
        # keep counting until merge), so the after ranking is the before
        # ranking minus the dead rows. DERIVED lists (#near/#window/#syn)
        # are recomputed over live docs only (Lucene applies liveDocs at
        # the scorer), so a bm25 idf over a derived list legitimately
        # shrinks its df — order is preserved (one shared idf), scores not.
        want = b[~b.external_id.isin(dead)]
        assert a.external_id.tolist() == want.external_id.tolist(), key
        if key != ("bm25", "#near/1( unit test )"):
            assert (a.score.values == want.score.values).all(), key


def test_reader_opened_before_delete_keeps_snapshot(deleted):
    idx, base, dead, _, pre_reader = deleted
    got = pre_reader.search("q", "mutex lock").to_pandas()
    want = base[("bm25", "mutex lock")]
    assert got.external_id.tolist() == want.external_id.tolist()
    assert set(got.external_id) & dead  # still serves tombstoned docs


def test_redelete_is_noop(deleted):
    idx, _, dead, _, _ = deleted
    assert delete_documents(idx, external_ids=sorted(dead)) == 0
    assert delete_documents(idx) == 0


def test_expunge_matches_fresh_build_of_survivors(
    deleted, ray_session, tmp_path_factory
):
    import ray.data

    idx, _, dead, survivors, _ = deleted
    n = expunge_deletes(idx)
    assert n == len(dead)
    assert not os.path.isdir(os.path.join(idx, "deletes"))

    fresh = str(tmp_path_factory.mktemp("fresh") / "idx")
    build_index(lambda: ray.data.from_arrow(survivors), fresh, _cfg())

    with open(os.path.join(idx, "stats.json")) as f:
        s_exp = json.load(f)
    with open(os.path.join(fresh, "stats.json")) as f:
        s_new = json.load(f)
    assert s_exp == s_new  # n_docs + field sums SHRANK to the merged truth

    exp, new = _run_all(idx), _run_all(fresh)
    for key in new:
        a, b = exp[key], new[key]
        assert a.external_id.tolist() == b.external_id.tolist(), key
        assert (a.score.values == b.score.values).all(), key
        assert not set(a.external_id) & dead, key

    # idempotent once clean
    assert expunge_deletes(idx) == 0


def test_interval_ops_respect_tombstones(deleted):
    """#ORDERED / #UNORDERED / #DFUZZY under tombstoned deletes: derived
    lists recompute over LIVE docs only (liveDocs at the scorer), so the
    result equals a fresh build over the survivors row-for-row."""
    import ray.data

    idx, _base, dead, survivors, _pre = deleted
    import tempfile

    fresh = tempfile.mkdtemp(prefix="ordered_survivors_")
    build_index(lambda: ray.data.from_arrow(survivors), fresh + "/i", _cfg())
    any_live = 0
    for q in (
        "#ordered/8( unit lock )",
        "#unordered/8( unit lock )",
        "#dfuzzy/2( lokc )",
    ):
        live = SearchEngine(
            idx, ModelParams(model="rankedboolean", top_k=1 << 30)
        ).search("q", q).to_pandas()
        want = SearchEngine(
            fresh + "/i", ModelParams(model="rankedboolean", top_k=1 << 30)
        ).search("q", q).to_pandas()
        assert not set(live.external_id) & dead, q
        # RankedBoolean score = derived tf, identical on both indexes
        assert live.external_id.tolist() == want.external_id.tolist(), q
        assert live.score.tolist() == want.score.tolist(), q
        any_live += len(live)
    assert any_live > 0, "all three queries degenerate on the fixture"
