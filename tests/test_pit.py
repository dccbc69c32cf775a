"""Point-in-time snapshots (pit.py, Lucene open-reader / ES PIT analog):
the frozen view is bitwise immune to tombstones, expunge compaction and
force_merge on the live index; snapshots are hardlinks (zero data bytes);
close releases only the snapshot tree."""

import os
import shutil

import numpy as np
import pytest


def _scores(index_dir, query="unit.body check.body"):
    from searchengine_ray.config import ModelParams
    from searchengine_ray.engine import SearchEngine

    t = SearchEngine(
        index_dir, ModelParams(model="bm25", top_k=1 << 30)
    ).search("q", query)
    return (
        t.column("doc_id").to_numpy(),
        t.column("score").to_numpy(),
    )


def _copy(built_index, tmp_path, name):
    dst = str(tmp_path / name)
    shutil.copytree(built_index, dst)
    return dst


def test_pit_survives_delete_and_expunge(
    ray_session, built_index, tmp_path
):
    from searchengine_ray.delete import delete_documents, expunge_deletes
    from searchengine_ray.pit import open_pit

    live = _copy(built_index, tmp_path, "live1")
    before_docs, before_scores = _scores(live)
    with open_pit(live, pit_root=str(tmp_path / "pits")) as p:
        dead = before_docs[: len(before_docs) // 2]
        delete_documents(live, doc_ids=dead)
        # tombstone phase: live loses docs, PIT does not
        live_docs, _ = _scores(live)
        assert not np.isin(dead, live_docs).any()
        pd_, ps_ = _scores(p.path)
        assert np.array_equal(pd_, before_docs)
        assert np.array_equal(ps_, before_scores)  # bitwise
        # full compaction rewrite under the snapshot
        expunge_deletes(live)
        pd_, ps_ = _scores(p.path)
        assert np.array_equal(pd_, before_docs)
        assert np.array_equal(ps_, before_scores)
    assert not os.path.exists(p.path)
    # live index untouched by the close
    live_docs2, _ = _scores(live)
    assert np.array_equal(live_docs, live_docs2)


def test_pit_survives_force_merge(ray_session, built_index, tmp_path):
    from searchengine_ray.build import force_merge
    from searchengine_ray.pit import open_pit

    live = _copy(built_index, tmp_path, "live2")
    before_docs, before_scores = _scores(live)
    p = open_pit(live, pit_root=str(tmp_path / "pits"))
    force_merge(live, num_partitions=1)
    pd_, ps_ = _scores(p.path)
    assert np.array_equal(pd_, before_docs)
    assert np.array_equal(ps_, before_scores)
    p.close()
    p.close()  # idempotent


def test_pit_is_hardlinked_not_copied(ray_session, built_index, tmp_path):
    from searchengine_ray.pit import open_pit

    live = _copy(built_index, tmp_path, "live3")
    with open_pit(live, pit_root=str(tmp_path / "pits")) as p:
        n_parquet = 0
        for base, _d, files in os.walk(p.path):
            for f in files:
                snap = os.path.join(base, f)
                src = os.path.join(
                    live, os.path.relpath(snap, p.path)
                )
                if f.endswith(".json"):
                    # copied: mutation-in-place safe
                    assert os.stat(snap).st_ino != os.stat(src).st_ino
                else:
                    # hardlinked: zero data bytes
                    assert os.stat(snap).st_ino == os.stat(src).st_ino
                    n_parquet += 1
        assert n_parquet > 0


def test_open_pit_missing_dir_raises(ray_session, tmp_path):
    from searchengine_ray.pit import open_pit

    with pytest.raises(ValueError, match="no index"):
        open_pit(str(tmp_path / "nope"))
