"""Tiered background merge (build.maybe_merge / select_tiered_merge — the
Lucene TieredMergePolicy analog): policy selection on synthetic ladders,
and the e2e invariant that a policy-driven partial compaction is a pure
row redistribution — every query result, docmap row, and tombstone
behavior identical before and after, with only the partition layout
changing."""

import json
import os

import pandas as pd
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pytest

from searchengine_ray.build import (
    add_documents,
    build_index,
    index_partitions,
    maybe_merge,
    select_tiered_merge,
)
from searchengine_ray.config import BuildConfig, ModelParams
from searchengine_ray.engine import SearchEngine

QUERIES = [
    ("bm25", "mutex lock"),
    ("bm25", "#near/1( unit test )"),
    ("indri", "#and( open file )"),
    ("rankedboolean", "#window/8( read write )"),
]


def _cfg() -> BuildConfig:
    return BuildConfig(doc_bucket_size=64, skip_block_docs=16)


def _results(index_dir: str) -> list[tuple]:
    out = []
    for model, q in QUERIES:
        t = SearchEngine(
            index_dir, ModelParams(model=model, top_k=1 << 30)
        ).search("q", q)
        out.append(
            (
                t.column("external_id").to_pylist(),
                [round(s, 9) for s in t.column("score").to_pylist()],
            )
        )
    return out


def _docmap(index_dir: str) -> pd.DataFrame:
    return (
        pads.dataset(os.path.join(index_dir, "docmap"))
        .to_table()
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_policy_selection_rules():
    # (key, doc_lo, rows): 4 same-tier adjacent -> first run selected
    entries = [(0, 0, 100), (1, 100, 70), (2, 200, 90), (3, 300, 80)]
    assert select_tiered_merge(entries, 4, 4) == [0, 1, 2, 3]
    # cap at max_merge_at_once
    assert select_tiered_merge(entries, 4, 2) == [0, 1]
    # a different-tier partition breaks the run (no adjacency across it)
    entries = [(0, 0, 100), (1, 100, 1000), (2, 200, 90), (3, 300, 80)]
    assert select_tiered_merge(entries, 3, 3) is None
    # selection is by DOC order even when keys are shuffled
    entries = [(7, 300, 80), (2, 0, 100), (9, 100, 70), (4, 200, 90)]
    assert select_tiered_merge(entries, 4, 4) == [2, 9, 4, 7]
    # tier boundaries are powers of two: 63 and 64 are different tiers
    entries = [(0, 0, 63), (1, 100, 64), (2, 200, 63), (3, 300, 64)]
    assert select_tiered_merge(entries, 2, 2) is None or \
        select_tiered_merge(entries, 2, 2) not in ([0, 1], [1, 2], [2, 3])
    # giant never merged with minnows
    entries = [(0, 0, 100_000), (1, 100, 60), (2, 200, 60), (3, 300, 60)]
    assert select_tiered_merge(entries, 3, 3) == [1, 2, 3]
    with pytest.raises(ValueError):
        select_tiered_merge(entries, 1, 4)


@pytest.fixture(scope="module")
def tiered_index(ray_session, fixture_corpus, tmp_path_factory):
    """base(60 docs) + four 15-doc appends; returns (dir, pre-merge
    results, pre-merge docmap)."""
    import ray.data

    out = str(tmp_path_factory.mktemp("tiered") / "idx")
    tbl = fixture_corpus

    def slice_of(lo, hi):
        m = pc.and_(
            pc.greater_equal(tbl.column("doc_id"), lo),
            pc.less(tbl.column("doc_id"), hi),
        )
        return tbl.filter(m)

    build_index(lambda: ray.data.from_arrow(slice_of(0, 60)), out, _cfg())
    for i in range(4):
        lo, hi = 60 + 15 * i, 60 + 15 * (i + 1)
        sub = slice_of(lo, hi)
        add_documents(
            out, lambda sub=sub: ray.data.from_arrow(sub), _cfg(),
            id_range=(lo, hi), tag=f"s{i}",
        )
    return out, _results(out), _docmap(out)


def test_tiered_merge_pure_redistribution(tiered_index):
    out, pre, pre_dm = tiered_index
    assert len(index_partitions(out)) == 5
    performed = maybe_merge(out, segs_per_tier=3, max_merge_at_once=3)
    # the four 15-doc segments share a tier; first three merge
    assert performed == [[1, 2, 3]]
    assert len(index_partitions(out)) == 3
    # every query result identical; docmap rows identical
    assert _results(out) == pre
    pd.testing.assert_frame_equal(_docmap(out), pre_dm)
    # manifest lineage recorded
    with open(os.path.join(out, "manifest.json")) as f:
        man = json.load(f)
    rec = [m for m in man.get("merges", []) if m.get("policy") == "tiered"]
    assert rec and rec[-1]["merged"] == [1, 2, 3] and rec[-1]["into"] == 1
    # re-running the policy is a no-op (no qualifying run remains)
    assert maybe_merge(out, segs_per_tier=3, max_merge_at_once=3) == []
    assert _results(out) == pre
    # no staging/backup leftovers
    for sub in ("postings", "docmap"):
        for suffix in (".tiered", ".pre_tiered"):
            assert not os.path.exists(os.path.join(out, sub + suffix))


def test_tiered_cascade_until_ladder(ray_session, fixture_corpus,
                                     tmp_path_factory):
    """8 equal micro-segments with segs_per_tier=2 cascade LSM-style;
    afterwards no two doc-adjacent live partitions share a tier, and
    queries still match the unmerged twin."""
    import ray.data

    tbl = fixture_corpus
    root = tmp_path_factory.mktemp("cascade")
    out = str(root / "idx")

    def slice_of(lo, hi):
        m = pc.and_(
            pc.greater_equal(tbl.column("doc_id"), lo),
            pc.less(tbl.column("doc_id"), hi),
        )
        return tbl.filter(m)

    build_index(lambda: ray.data.from_arrow(slice_of(0, 40)), out, _cfg())
    for i in range(8):
        lo, hi = 40 + 10 * i, 40 + 10 * (i + 1)
        sub = slice_of(lo, hi)
        add_documents(
            out, lambda sub=sub: ray.data.from_arrow(sub), _cfg(),
            id_range=(lo, hi), tag=f"c{i}",
        )
    pre = _results(out)
    performed = maybe_merge(out, segs_per_tier=2, max_merge_at_once=2)
    assert len(performed) >= 3  # cascaded, not a single pass
    assert _results(out) == pre
    with open(os.path.join(out, "manifest.json")) as f:
        man = json.load(f)
    live = sorted(
        (int(e["doc_lo"]), int(e["docmap"]["rows"]))
        for e in man["partitions"].values()
        if e.get("status") == "done" and not e.get("empty")
    )
    tiers = [max(r, 1).bit_length() - 1 for _lo, r in live]
    assert all(tiers[i] != tiers[i + 1] for i in range(len(tiers) - 1))


def test_tiered_merge_ignores_crash_leftovers(ray_session, fixture_corpus,
                                              tmp_path_factory):
    """A crash can leave stale ``postings.tiered`` staging roots or
    ``part_*.tmp`` dirs behind; a re-run must regenerate staging from the
    live tree and produce the same results as a clean merge."""
    import shutil

    import ray.data

    tbl = fixture_corpus
    out = str(tmp_path_factory.mktemp("crashy") / "idx")

    def slice_of(lo, hi):
        m = pc.and_(
            pc.greater_equal(tbl.column("doc_id"), lo),
            pc.less(tbl.column("doc_id"), hi),
        )
        return tbl.filter(m)

    build_index(lambda: ray.data.from_arrow(slice_of(0, 60)), out, _cfg())
    for i in range(3):
        lo, hi = 60 + 15 * i, 60 + 15 * (i + 1)
        sub = slice_of(lo, hi)
        add_documents(
            out, lambda sub=sub: ray.data.from_arrow(sub), _cfg(),
            id_range=(lo, hi), tag=f"x{i}",
        )
    pre = _results(out)
    # simulate a crash mid-stage: stale staging root with garbage inside,
    # plus a bogus part_*.tmp leftover inside the live root
    stale = os.path.join(out, "postings.tiered")
    os.makedirs(os.path.join(stale, "part_99999"))
    with open(os.path.join(stale, "part_99999", "junk.parquet"), "w") as f:
        f.write("not parquet")
    os.makedirs(os.path.join(out, "postings", "part_00001.tmp"))
    performed = maybe_merge(out, segs_per_tier=3, max_merge_at_once=3)
    assert performed == [[1, 2, 3]]
    assert _results(out) == pre
    assert not os.path.exists(stale)
    assert not os.path.exists(
        os.path.join(out, "postings", "part_00001.tmp")
    )
