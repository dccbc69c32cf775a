"""Micro-bench: vectorized textstats kernels vs the former per-row Python
kernels (round-2 implementations inlined below as the baseline).

Kernel-level (no Ray pipeline startup), on the sf corpus and on a x20
longer-document variant. The headline win is winnowing: the per-k-gram
``hashlib.md5`` Python loop is replaced by the dedup shingler's memoized
FNV + one numpy combine + sliding_window_view minima. Token stats move to
Arrow split_pattern_regex + bincount/lexsort — GIL-free C kernels that
scale with Ray's batch parallelism; on THIS synthetic corpus (29-word
vocabulary, short tokens) Python's C-implemented re/set paths are already
near-optimal, so the single-thread kernel ratio there is ~1x, not the
bottleneck either way.

Usage: PYTHONPATH=/root/repo python tools/bench_textstats.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def naive_token_stats(tbl: pa.Table):
    from searchengine_ray.analyze import STOPWORDS, tokenize

    out = []
    for text in tbl.column("text").to_pylist():
        toks = tokenize(text)
        out.append(
            (len(toks), len(set(toks)), sum(1 for x in toks if x in STOPWORDS))
        )
    return out


def vec_token_stats(tbl: pa.Table):
    from searchengine_ray.analyze import STOPWORDS
    from searchengine_ray.textstats import _flat_tokens

    n, doc_idx, flat = _flat_tokens(tbl)
    n_tok = np.bincount(doc_idx, minlength=n)
    hit = pc.is_in(flat, value_set=pa.array(sorted(STOPWORDS))).to_numpy(
        zero_copy_only=False
    )
    n_stop = np.bincount(doc_idx[hit], minlength=n)
    codes = flat.dictionary_encode().indices.to_numpy()
    order = np.lexsort((codes, doc_idx))
    dd, cc = doc_idx[order], codes[order]
    first = np.empty(len(dd), dtype=bool)
    first[0] = True
    first[1:] = (dd[1:] != dd[:-1]) | (cc[1:] != cc[:-1])
    n_uniq = np.bincount(dd[first], minlength=n)
    return n_tok, n_uniq, n_stop


def naive_winnow(tbl: pa.Table, k: int = 3, w: int = 4):
    from searchengine_ray.analyze import tokenize

    out = []
    for text in tbl.column("text").to_pylist():
        toks = tokenize(text)
        grams = [
            hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()
            for i in range(max(0, len(toks) - k + 1))
        ]
        if grams:
            sel = {min(grams[i : i + w]) for i in range(len(grams))}
            out.append((len(sel), min(sel)))
        else:
            out.append((0, ""))
    return out


def vec_winnow(tbl: pa.Table, k: int = 3, w: int = 4):
    """The library's global-batch winnow kernel, via the module internals
    (same code path map_batches runs)."""
    import searchengine_ray.textstats as ts

    # reach the inner batch fn by constructing the op over a fake dir is
    # awkward; instead replicate by calling the kernel pieces directly
    from searchengine_ray.dedup import _POS_MIX, _term_hash64

    pad = np.iinfo(np.uint64).max
    n, doc_idx, flat = ts._flat_tokens(tbl)
    if len(doc_idx) < k:
        return []
    d = flat.dictionary_encode()
    uniq = d.dictionary.to_pylist()
    uh = np.fromiter((_term_hash64(x) for x in uniq), dtype=np.uint64, count=len(uniq))
    seq = uh[d.indices.to_numpy()]
    m = len(seq) - k + 1
    h = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        h = h * _POS_MIX[j % len(_POS_MIX)] + seq[j : j + m]
    valid = doc_idx[:m] == doc_idx[k - 1 :]
    gram_doc = doc_idx[:m][valid]
    gh = h[valid]
    pos = np.arange(len(gh), dtype=np.int64) + gram_doc * (w - 1)
    padded = np.full(int(pos[-1]) + w, pad, dtype=np.uint64)
    padded[pos] = gh
    mins = np.lib.stride_tricks.sliding_window_view(padded, w).min(axis=1)[pos]
    order = np.lexsort((mins, gram_doc))
    dd, mm = gram_doc[order], mins[order]
    first = np.empty(len(dd), dtype=bool)
    first[0] = True
    first[1:] = (dd[1:] != dd[:-1]) | (mm[1:] != mm[:-1])
    return np.bincount(dd[first], minlength=n)


def bench(fn, tbl, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn(tbl)
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    long_tbl = pa.table(
        {
            "doc_id": tbl.column("doc_id"),
            "text": pa.array([t * 20 for t in tbl.column("text").to_pylist()]),
        }
    )

    out = {"sf_dir": sf_dir, "n_docs": tbl.num_rows}
    for label, t in (("sf", tbl), ("long20x", long_tbl)):
        ns = bench(naive_token_stats, t)
        vs = bench(vec_token_stats, t)
        nw = bench(naive_winnow, t)
        vw = bench(vec_winnow, t)
        out[f"{label}_token_stats_naive_sec"] = round(ns, 3)
        out[f"{label}_token_stats_vec_sec"] = round(vs, 3)
        out[f"{label}_winnow_naive_sec"] = round(nw, 3)
        out[f"{label}_winnow_vec_sec"] = round(vw, 3)
        out[f"{label}_winnow_speedup"] = round(nw / max(vw, 1e-9), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
