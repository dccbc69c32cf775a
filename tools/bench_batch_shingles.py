"""Micro-bench: the round-4 batch-flat kernels vs the former per-document
Python drives (round-3 implementations inlined below as the baseline).

Kernel-level (no Ray pipeline startup), on the sf documents table:
- top_bigrams combiner: per-token Python dict loop  vs  one lexsort +
  run-length pass over dictionary codes (the repetition_stats kernel);
- MinHash signatures: per-doc _shingle_hashes + per-doc matmul  vs
  _batch_shingles + per-permutation segmented reduceat minima;
- decontamination shingle partial: per-doc _shingle_hashes list  vs
  one _batch_shingles call.

Outputs one JSON line with per-kernel (old_sec, new_sec, speedup) and
asserts the outputs are equal so the bench doubles as a parity check.

Usage: PYTHONPATH=/root/repo python tools/bench_batch_shingles.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from searchengine_ray.analyze import tokenize
from searchengine_ray.dedup import (
    MinHashSignatures,
    _batch_shingles,
    _shingle_hashes,
)


def naive_bigram_counts(t: pa.Table) -> dict:
    counts: dict[str, int] = {}
    for text in t.column("text").to_pylist():
        toks = tokenize(text)
        for i in range(len(toks) - 1):
            bg = toks[i] + " " + toks[i + 1]
            counts[bg] = counts.get(bg, 0) + 1
    return counts


def new_bigram_counts(t: pa.Table) -> dict:
    """Mirrors the textextras.top_bigrams combiner kernel. On THIS corpus
    (29-word vocabulary, short tokens) the old dict loop runs mostly in
    C-dict code so the single-thread ratio is modest (~1.2x); the point of
    the rewrite is the GIL-free Arrow/numpy path that scales with Ray's
    batch parallelism and with realistic vocabularies."""
    import pyarrow.compute as pc

    from searchengine_ray.textstats import _flat_tokens

    _n, doc_idx, flat = _flat_tokens(t)
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy().astype(np.int64)
    adj = doc_idx[1:] == doc_idx[:-1]
    v = np.int64(len(enc.dictionary))
    key = codes[:-1][adj] * v + codes[1:][adj]
    key.sort(kind="stable")
    starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
    counts = np.diff(np.r_[starts, len(key)])
    uniq = key[starts]
    left = pc.take(enc.dictionary, pa.array(uniq // v))
    right = pc.take(enc.dictionary, pa.array(uniq % v))
    bg = pc.binary_join_element_wise(left, right, " ").to_pylist()
    return dict(zip(bg, counts.tolist()))


def naive_minhash(t: pa.Table, m: MinHashSignatures) -> np.ndarray:
    return np.vstack([m.sig(x) for x in t.column("text").to_pylist()])


def naive_decontam_partial(t: pa.Table, n: int) -> np.ndarray:
    hs = [_shingle_hashes(x, n) for x in t.column("text").to_pylist()]
    hs = [h for h in hs if len(h)]
    return np.unique(np.concatenate(hs)) if hs else np.empty(0, np.uint64)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    reps = 3
    out = {"sf_dir": sf, "n_docs": t.num_rows}

    def best(fn):
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn()
            times.append(time.perf_counter() - t0)
        return r, min(times)

    old_bg, old_s = best(lambda: naive_bigram_counts(t))
    new_bg, new_s = best(lambda: new_bigram_counts(t))
    assert old_bg == new_bg
    out["top_bigrams"] = {
        "old_sec": round(old_s, 4), "new_sec": round(new_s, 4),
        "speedup": round(old_s / new_s, 2),
    }

    m = MinHashSignatures(n=3, num_perm=128, seed=1234)
    old_sig, old_s = best(lambda: naive_minhash(t, m))
    new_tbl, new_s = best(lambda: m(t))
    new_sig = np.array(new_tbl.column("sig").to_pylist()).view(np.uint64)
    assert np.array_equal(old_sig, new_sig)
    out["minhash_signatures"] = {
        "old_sec": round(old_s, 4), "new_sec": round(new_s, 4),
        "speedup": round(old_s / new_s, 2),
    }

    old_d, old_s = best(lambda: naive_decontam_partial(t, 8))
    new_d, new_s = best(lambda: np.unique(_batch_shingles(t, 8, distinct=False)[1]))
    assert np.array_equal(old_d, new_d)
    out["decontam_partial"] = {
        "old_sec": round(old_s, 4), "new_sec": round(new_s, 4),
        "speedup": round(old_s / new_s, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
