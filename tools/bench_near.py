"""Micro-benchmark: k-arg #NEAR lock-step vectorized machine vs the scalar
per-doc pointer sweep (the round-1 k-arg path). No Ray needed — operates on
in-memory Postings at sf0.1-like density.

Usage: PYTHONPATH=/root/repo python tools/bench_near.py
"""

import time

import numpy as np

from searchengine_ray.indexio import Postings
from searchengine_ray.operators import (
    _eval_neark_vectorized,
    _near_positions,
)


def make_postings(n_docs: int, density: float, max_pos: int, seed: int) -> Postings:
    rng = np.random.default_rng(seed)
    docs = np.flatnonzero(rng.random(n_docs) < density).astype(np.int64)
    tfs = rng.integers(1, 9, size=len(docs)).astype(np.int64)
    off = np.zeros(len(docs) + 1, dtype=np.int64)
    np.cumsum(tfs, out=off[1:])
    pos = np.concatenate(
        [
            np.sort(rng.choice(max_pos, size=t, replace=False))
            for t in tfs
        ]
    ).astype(np.int64)
    return Postings(docs, tfs, off, pos, df=len(docs), ctf=int(tfs.sum()))


def scalar_near(parts, dist):
    from functools import reduce

    common = reduce(np.intersect1d, [p.doc_ids for p in parts])
    n_match = 0
    for d in common:
        plists = []
        for p in parts:
            i = int(np.searchsorted(p.doc_ids, d))
            plists.append(p.positions_for(i).tolist())
        if _near_positions(plists, dist):
            n_match += 1
    return n_match


def main() -> None:
    # ~sf0.1 bench-corpus scale: 200k docs, common-term density
    parts = [make_postings(200_000, 0.35, 300, seed=s) for s in (1, 2, 3)]
    dist = 2

    t0 = time.time()
    v = _eval_neark_vectorized(parts, dist)
    t_vec = time.time() - t0

    t0 = time.time()
    n_scalar = scalar_near(parts, dist)
    t_scalar = time.time() - t0

    assert v.df == n_scalar, (v.df, n_scalar)
    print(
        f"3-arg #near/{dist}: docs_in_all={len(np.intersect1d(np.intersect1d(parts[0].doc_ids, parts[1].doc_ids), parts[2].doc_ids))} "
        f"matches={v.df}"
    )
    print(f"vectorized: {t_vec*1000:.1f} ms   scalar sweep: {t_scalar*1000:.1f} ms")
    print(f"speedup: {t_scalar / t_vec:.1f}x")


if __name__ == "__main__":
    main()
