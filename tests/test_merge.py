"""force_merge: the Lucene ``IndexWriter.forceMerge(maxNumSegments)``
analog. A base build + appended segment + deletions, merged to one
partition, must be observably identical to a from-scratch single-partition
build of the surviving corpus — postings rows byte-for-byte, lexicon,
stats, and every query result. The reference only reads such a merged
index (Homeworks/HW6/QryEval/Idx.java:237-260); this covers the writer op
its users run Lucene for."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pytest

from searchengine_ray.build import (
    add_documents,
    build_index,
    force_merge,
    index_partitions,
)
from searchengine_ray.config import BuildConfig, ModelParams
from searchengine_ray.delete import delete_documents
from searchengine_ray.engine import SearchEngine

H = 60  # split point of the 120-doc fixture corpus

QUERIES = {
    "bm25": ["mutex lock", "#near/1( unit test )"],
    "indri": ["#and( open file )"],
    "rankedboolean": ["#syn( fault failure )", "#window/8( read write )"],
}


def _cfg(parts: int = 2) -> BuildConfig:
    return BuildConfig(
        doc_bucket_size=64, skip_block_docs=16, num_partitions=parts
    )


def _rows(index_dir: str, sub: str, keys: list[str]) -> pd.DataFrame:
    df = (
        pads.dataset(os.path.join(index_dir, sub))
        .to_table()
        .to_pandas()
    )
    return df.sort_values(keys, kind="mergesort").reset_index(drop=True)


def _ext_ids(tbl) -> np.ndarray:
    return np.asarray(
        [
            f"{r}/{p}@{c}"
            for r, p, c in zip(
                tbl.column("repo").to_pylist(),
                tbl.column("path").to_pylist(),
                tbl.column("commit").to_pylist(),
            )
        ]
    )


@pytest.fixture(scope="module")
def merged_pair(ray_session, fixture_corpus, tmp_path_factory):
    """(merged dir, fresh dir): base(2 parts) + append + delete +
    force_merge(1) vs build_index(survivors re-identified to the merged
    id space, 1 part)."""
    import ray.data

    root = tmp_path_factory.mktemp("merge")
    tbl = fixture_corpus
    merged, fresh = str(root / "merged"), str(root / "fresh")

    lower = tbl.filter(pc.less(tbl.column("doc_id"), H))
    upper = tbl.filter(pc.greater_equal(tbl.column("doc_id"), H))
    build_index(lambda: ray.data.from_arrow(lower), merged, _cfg())
    add_documents(merged, lambda: ray.data.from_arrow(upper), _cfg(), tag="up")
    # dead set crosses both halves; external ids survive the append re-id
    ext = _ext_ids(tbl)
    dead = sorted(ext[tbl.column("doc_id").to_numpy() % 5 == 1].tolist())
    assert delete_documents(merged, external_ids=dead) == len(dead)
    n_parts = force_merge(merged, num_partitions=1)
    assert n_parts == 1

    # survivors, re-identified to the merged index's own id space
    dm = pads.dataset(os.path.join(merged, "docmap")).to_table(
        columns=["doc_id", "external_id"]
    )
    id_of = dict(
        zip(dm.column("external_id").to_pylist(), dm.column("doc_id").to_pylist())
    )
    keep = np.asarray([e in id_of for e in ext])
    surv = tbl.filter(keep)
    new_ids = [id_of[e] for e in ext[keep]]
    surv = surv.set_column(
        surv.schema.get_field_index("doc_id"),
        "doc_id",
        [new_ids],
    )
    build_index(lambda: ray.data.from_arrow(surv), fresh, _cfg(parts=1))
    return merged, fresh, set(dead)


def test_merge_postings_bitwise_equal_fresh_build(merged_pair):
    merged, fresh, _ = merged_pair
    a = _rows(merged, "postings", ["field", "term", "bucket"])
    b = _rows(fresh, "postings", ["field", "term", "bucket"])
    pd.testing.assert_frame_equal(a, b)  # includes the encoded varbyte cols


def test_merge_docmap_lexicon_stats_equal(merged_pair):
    merged, fresh, _ = merged_pair
    pd.testing.assert_frame_equal(
        _rows(merged, "docmap", ["doc_id"]), _rows(fresh, "docmap", ["doc_id"])
    )
    pd.testing.assert_frame_equal(
        _rows(merged, "lexicon", ["field", "term"]),
        _rows(fresh, "lexicon", ["field", "term"]),
    )
    with open(os.path.join(merged, "stats.json")) as f:
        sm = json.load(f)
    with open(os.path.join(fresh, "stats.json")) as f:
        sf = json.load(f)
    assert sm == sf


def test_merge_queries_equal_and_dead_gone(merged_pair):
    merged, fresh, dead = merged_pair
    for model, queries in QUERIES.items():
        em = SearchEngine(merged, ModelParams(model=model, top_k=1 << 30))
        ef = SearchEngine(fresh, ModelParams(model=model, top_k=1 << 30))
        for q in queries:
            a = em.search("q", q).to_pandas()
            b = ef.search("q", q).to_pandas()
            assert len(a) == len(b) > 0, (model, q)
            assert a.external_id.tolist() == b.external_id.tolist(), (model, q)
            assert (a.score.values == b.score.values).all(), (model, q)
            assert not set(a.external_id) & dead, (model, q)


def test_remerge_is_noop_and_append_still_works(merged_pair, ray_session):
    import ray.data

    merged, _, _ = merged_pair
    with open(os.path.join(merged, "manifest.json")) as f:
        before = json.load(f)
    assert force_merge(merged, num_partitions=1) == 1
    with open(os.path.join(merged, "manifest.json")) as f:
        after = json.load(f)
    assert before == after  # early-exit: no rewrite, no manifest churn

    from searchengine_ray.corpus import synthesize_corpus

    extra = synthesize_corpus(n_docs=8, seed=99)
    add_documents(
        merged, lambda: ray.data.from_arrow(extra), _cfg(parts=1), tag="extra"
    )
    assert len(index_partitions(merged)) == 2  # merged part + new segment
    eng = SearchEngine(merged, ModelParams(model="rankedboolean", top_k=1 << 30))
    assert len(eng.search("q", "#or( read write )").to_pandas()) > 0
