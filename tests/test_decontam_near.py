"""Near-duplicate decontamination (curation.decontaminate_near):
brute-force numpy parity on the fixed corpus, planted edited-leak
detection, and the two loud guards."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _brute_pairs(sf, n=8, num_perm=128, bands=32, thr=60, sig_seed=1234,
                 seed=7):
    """Pure-numpy reference: same split, shingles, signatures, banding,
    verdicts — no Ray."""
    from searchengine_ray.dedup import MinHashSignatures, _shingle_hashes
    from searchengine_ray.sketch import _hash64

    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    ids = t.column("doc_id").to_numpy()
    texts = t.column("text").to_pylist()
    bucket = _hash64(ids, seed) % np.uint64(100)
    m = MinHashSignatures(n=n, num_perm=num_perm, seed=sig_seed)
    rpb = num_perm // bands
    mix = (np.arange(1, rpb + 1, dtype=np.uint64)
           * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    sh, sig, bh = {}, {}, {}
    for i, d in enumerate(ids):
        h = _shingle_hashes(texts[i], n)
        if not len(h):
            continue
        sh[d] = np.sort(h)
        s = m.sig(texts[i])
        sig[d] = s
        bh[d] = np.array(
            [(s[b * rpb:(b + 1) * rpb] * mix).sum() for b in range(bands)],
            dtype=np.uint64,
        )
    tests = [d for d in sh if bucket[ids == d][0] >= 90]
    trains = [d for d in sh if bucket[ids == d][0] < 90]
    out = set()
    for td in trains:
        for bd in tests:
            if not (bh[td] == bh[bd]).any():
                continue
            inter = len(np.intersect1d(sh[td], sh[bd]))
            union = len(sh[td]) + len(sh[bd]) - inter
            if union > 0 and 100 * inter >= thr * union:
                out.add((td, bd, inter, union))
    return out


def test_brute_force_parity(ray_session):
    from searchengine_ray.curation import decontaminate_near

    got = decontaminate_near(SF).to_pandas()
    got_set = set(
        zip(got.doc_id, got.bench_id, got.n_inter, got.n_union)
    )
    assert got_set == _brute_pairs(SF)


def test_planted_edited_leak_is_flagged(ray_session, tmp_path):
    """A train-split doc that is a lightly edited copy of a test-split doc
    gets flagged; an unrelated train doc does not."""
    from searchengine_ray.curation import decontaminate_near
    from searchengine_ray.sketch import _hash64

    ids = np.arange(200, dtype=np.int64)
    bucket = _hash64(ids, 7) % np.uint64(100)
    test_id = int(ids[bucket >= 90][0])
    train_ids = ids[bucket < 80]
    leak_id, clean_id = int(train_ids[0]), int(train_ids[1])

    base = " ".join(f"tok{i} word{i * 7 % 31}" for i in range(60))
    edited = base.replace("tok7 ", "tok7x ")  # one-token edit
    rows = {test_id: base, leak_id: edited,
            clean_id: " ".join(f"zz{i} qq{i}" for i in range(60))}
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    dids = sorted(rows)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(dids, pa.int64()),
                "text": pa.array([rows[d] for d in dids], pa.string()),
                "lang": pa.array(["en"] * 3),
                "source": pa.array(["s"] * 3),
                "n_chars": pa.array([len(rows[d]) for d in dids], pa.int64()),
            }
        ),
        os.path.join(sf, "documents.parquet"),
    )
    got = decontaminate_near(sf).to_pandas()
    assert leak_id in set(got.doc_id)
    assert clean_id not in set(got.doc_id)
    row = got[got.doc_id == leak_id].iloc[0]
    assert row.bench_id == test_id
    assert 100 * row.n_inter >= 60 * row.n_union


def test_guards_raise(ray_session):
    from searchengine_ray.curation import decontaminate_near

    with pytest.raises(ValueError, match="max_bench_docs"):
        decontaminate_near(SF, max_bench_docs=1)
    with pytest.raises(ValueError, match="max_pairs"):
        decontaminate_near(SF, threshold_pct=0, max_pairs=1)
