"""Incremental (segment-append) index builds: add_documents must serve the
union bitwise-identically to a from-scratch build of the full corpus, be
resubmit-idempotent, resume pending partitions, and reject structurally
incompatible appends. (Lucene segment-model analog; the reference only ever
opens the merged Lucene result, Homeworks/HW6/QryEval/Idx.java:237-260.)"""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from searchengine_ray.build import add_documents, build_index, index_partitions
from searchengine_ray.config import BuildConfig, ModelParams
from searchengine_ray.corpus import synthesize_corpus
from searchengine_ray.engine import SearchEngine

H = 60  # split point of the 122-row synthetic corpus

QUERIES = {
    "bm25": ["mutex lock", "#near/1( unit test )", "uniqueterm_only_here"],
    "indri": ["#and( open file )", "#wand( 0.3 mutex 0.7 lock )"],
    "rankedboolean": [
        "#or( read write )", "#syn( fault failure )", "#window/8( read write )"
    ],
}


def _cfg() -> BuildConfig:
    return BuildConfig(doc_bucket_size=64, skip_block_docs=16, num_partitions=2)


@pytest.fixture(scope="module")
def pair(ray_session, fixture_corpus, tmp_path_factory):
    """(full-build dir, half-build+append dir) over the same corpus."""
    import ray.data

    root = tmp_path_factory.mktemp("inc")
    tbl = fixture_corpus
    full, inc = str(root / "full"), str(root / "inc")
    lower = tbl.filter(pc.less(tbl.column("doc_id"), H))
    upper = tbl.filter(pc.greater_equal(tbl.column("doc_id"), H))
    build_index(lambda: ray.data.from_arrow(tbl), full, _cfg())
    build_index(lambda: ray.data.from_arrow(lower), inc, _cfg())
    add_documents(inc, lambda: ray.data.from_arrow(upper), _cfg(), tag="upper")
    return full, inc, upper


def test_incremental_matches_full_bitwise(pair):
    full, inc, _ = pair
    for model, queries in QUERIES.items():
        ef = SearchEngine(full, ModelParams(model=model, top_k=1 << 30))
        ei = SearchEngine(inc, ModelParams(model=model, top_k=1 << 30))
        for q in queries:
            a = ef.search("q", q).to_pandas()
            b = ei.search("q", q).to_pandas()
            assert len(a) == len(b) > 0, (model, q)
            # rank identity including externalId tie-breaks; doc_ids differ
            # by design (the appended half re-ids at the bucket-aligned base)
            assert a.external_id.tolist() == b.external_id.tolist(), (model, q)
            assert (a.score.values == b.score.values).all(), (model, q)


def test_global_stats_match_full(pair):
    full, inc, _ = pair
    with open(os.path.join(full, "stats.json")) as f:
        sf = json.load(f)
    with open(os.path.join(inc, "stats.json")) as f:
        si = json.load(f)
    assert sf == si  # n_docs + per-field sums/doc_counts are exact ints


def test_readd_is_noop(pair):
    import ray.data

    _, inc, upper = pair
    with open(os.path.join(inc, "manifest.json")) as f:
        before = json.load(f)
    add_documents(inc, lambda: ray.data.from_arrow(upper), _cfg(), tag="upper")
    with open(os.path.join(inc, "manifest.json")) as f:
        after = json.load(f)
    assert before == after
    assert len(after["segments"]) == 1 and after["segments"][0]["complete"]


def test_partition_numbering_continues(pair):
    _, inc, _ = pair
    with open(os.path.join(inc, "manifest.json")) as f:
        manifest = json.load(f)
    seg = manifest["segments"][0]
    # base used parts 0..1; the segment continues at 2 with a bucket-aligned
    # doc base disjoint from every base-build id
    assert seg["part_lo"] == 2
    assert seg["doc_base"] % 64 == 0 and seg["doc_base"] >= H
    parts = index_partitions(inc)
    assert parts[0] == 0 and all(
        p in manifest["partitions"] or True for p in parts
    )
    for p in parts:
        assert manifest["partitions"][str(p)]["status"] == "done"


def test_resume_finishes_pending_partition(pair, tmp_path):
    import ray.data

    full, inc, upper = pair
    work = str(tmp_path / "resume")
    shutil.copytree(inc, work)
    mp = os.path.join(work, "manifest.json")
    with open(mp) as f:
        manifest = json.load(f)
    seg = manifest["segments"][0]
    # simulate a crash: first segment partition unrecorded, dirs gone,
    # segment + index marked incomplete
    gp = str(seg["part_lo"])
    del manifest["partitions"][gp]
    seg["complete"] = False
    manifest["complete"] = False
    with open(mp, "w") as f:
        json.dump(manifest, f)
    shutil.rmtree(os.path.join(work, "postings", f"part_{int(gp):05d}"))
    shutil.rmtree(os.path.join(work, "docmap", f"part_{int(gp):05d}"))

    add_documents(work, lambda: ray.data.from_arrow(upper), _cfg(), tag="upper")
    ef = SearchEngine(full, ModelParams(model="bm25", top_k=1 << 30))
    er = SearchEngine(work, ModelParams(model="bm25", top_k=1 << 30))
    a, b = (e.search("q", "mutex lock").to_pandas() for e in (ef, er))
    assert a.external_id.tolist() == b.external_id.tolist()
    assert (a.score.values == b.score.values).all()


def test_incompatible_append_raises(pair):
    import ray.data

    _, inc, upper = pair
    bad = BuildConfig(doc_bucket_size=64, skip_block_docs=16, stemmer="porter")
    with pytest.raises(ValueError, match="structurally incompatible"):
        add_documents(inc, lambda: ray.data.from_arrow(upper), bad, tag="x")


def test_incomplete_base_raises(ray_session, fixture_corpus, tmp_path):
    import ray.data

    out = str(tmp_path / "idx")
    tbl = fixture_corpus
    build_index(lambda: ray.data.from_arrow(tbl), out, _cfg())
    mp = os.path.join(out, "manifest.json")
    with open(mp) as f:
        manifest = json.load(f)
    manifest["complete"] = False
    with open(mp, "w") as f:
        json.dump(manifest, f)
    with pytest.raises(ValueError, match="incomplete"):
        add_documents(out, lambda: ray.data.from_arrow(tbl), _cfg())


def test_sha256_invariant_spans_segments(pair):
    """Per-row content sha256 (north-rule invariant) is id-shift-independent."""
    import hashlib

    from searchengine_ray.indexio import InvertedIndex

    _, inc, upper = pair
    idx = InvertedIndex(inc)
    ext = idx._external_ids
    sha = idx._sha256
    want = {
        f"{r}/{p}@{c}": hashlib.sha256(t.encode()).hexdigest()
        for r, p, c, t in zip(
            upper.column("repo").to_pylist(),
            upper.column("path").to_pylist(),
            upper.column("commit").to_pylist(),
            upper.column("content").to_pylist(),
        )
    }
    hit = 0
    for e, s in zip(ext, sha):
        if e in want:
            assert want[e] == s
            hit += 1
    assert hit == upper.num_rows
