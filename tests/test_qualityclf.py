"""Trained quality classifier: training determinism, guard, scoring
invariance across batch sizes, and that the model actually learns the
pseudo-label rule."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_training_deterministic(ray_session):
    from searchengine_ray.qualityclf import train_quality_classifier

    b1, w1 = train_quality_classifier(SF)
    b2, w2 = train_quality_classifier(SF)
    assert b1 == b2
    assert np.array_equal(w1, w2)


def test_oversized_corpus_thins_deterministically(monkeypatch,
                                                  ray_session):
    """Above the cap the trainer hash-thins instead of raising, and the
    thinned training stays deterministic."""
    import pyarrow.parquet as pq

    from searchengine_ray import qualityclf

    real = pq.read_metadata

    class FakeMeta:
        num_rows = 10_000

    monkeypatch.setattr(
        pq, "read_metadata", lambda p: FakeMeta() if "documents" in p
        else real(p),
    )
    b1, w1 = qualityclf.train_quality_classifier(SF)
    b2, w2 = qualityclf.train_quality_classifier(SF)
    assert b1 == b2 and np.array_equal(w1, w2)
    # the fake 10k-row metadata forces a thinning threshold < max, so
    # the sample is a strict subset and the weights differ from the
    # full-corpus training below
    monkeypatch.undo()
    b_full, w_full = qualityclf.train_quality_classifier(SF)
    assert (b1, list(w1)) != (b_full, list(w_full))


def test_classifier_learns_rule(ray_session):
    """Accuracy of the trained model against its own pseudo-labels must
    clearly beat the majority-class baseline."""
    from searchengine_ray.gate import cur_quality_classifier
    from searchengine_ray.qualityclf import (
        _FEATS, features_batch, label_rule, _read_docs,
    )

    got = cur_quality_classifier(SF).to_pandas().sort_values("doc_id")
    rows = (
        _read_docs(SF)
        .map_batches(features_batch, batch_format="pyarrow")
        .take_all()
    )
    rows.sort(key=lambda r: r["doc_id"])
    F = np.array([[r[f] for f in _FEATS] for r in rows], dtype=np.int64)
    y = label_rule(F)
    acc = float((got.label_pred.to_numpy() == y).mean())
    base = max(y.mean(), 1 - y.mean())
    assert acc > base + 0.05, (acc, base)
    # separation: mean prob on positives > mean prob on negatives
    assert got.prob_r.to_numpy()[y == 1].mean() > \
        got.prob_r.to_numpy()[y == 0].mean()


def test_scoring_batch_size_invariant(ray_session):
    import ray.data

    from searchengine_ray.gate import _qc_trained
    from searchengine_ray.qualityclf import quality_scores

    b, w = _qc_trained(SF)
    base = quality_scores(SF, b, w).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 8 * 1024
        small = quality_scores(SF, b, w).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
    finally:
        ctx.target_max_block_size = old
    assert base.equals(small)
