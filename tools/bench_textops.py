"""Micro-bench: the round-4 per-document taggers/filters (RAKE, TextRank,
Gopher rules) — batch-global vectorized kernels vs straightforward per-doc
Python replays of the identical semantics (the shape a naive port would
ship). Kernel-level, one process, no Ray pipeline startup: the numbers
isolate the per-batch compute that `map_batches` parallelizes.

Usage: PYTHONPATH=/root/repo python tools/bench_textops.py [sf_dir]
Prints one JSON line: docs/sec for each kernel, vectorized and naive, and
the ratio.
"""

from __future__ import annotations

import collections
import json
import re
import sys
import time

import pyarrow.parquet as pq


def naive_textrank(texts, iters=5, k=5):
    from searchengine_ray.analyze import STOPWORDS
    from searchengine_ray.textrank import TEXTRANK_SCALE

    out = []
    for i, text in enumerate(texts):
        toks = [
            w for w in re.findall(r"[a-z0-9_]+", text.lower())
            if w not in STOPWORDS
        ]
        edges = {
            (min(x, y), max(x, y))
            for x, y in zip(toks, toks[1:]) if x != y
        }
        if not edges:
            continue
        deg = collections.Counter()
        for u, v in edges:
            deg[u] += 1
            deg[v] += 1
        s = {v: TEXTRANK_SCALE for v in deg}
        for _ in range(iters):
            c = collections.Counter()
            for u, v in edges:
                c[u] += s[v] // deg[v]
                c[v] += s[u] // deg[u]
            s = {
                v: (15 * TEXTRANK_SCALE) // 100 + (85 * c[v]) // 100
                for v in deg
            }
        out += sorted(s.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return out


def naive_gopher(texts, stoplist):
    rows = []
    for text in texts:
        words = [w for w in re.split(r"\s+", text) if w]
        toks = re.findall(r"[a-z0-9_]+", text.lower())
        lines = text.split("\n")
        n_words = len(words)
        tot = sum(len(w) for w in words)
        alpha = sum(1 for w in words if re.search("[a-zA-Z]", w))
        sym = sum(1 for w in words if "#" in w or "..." in w)
        stop_hits = len({t for t in toks if t in stoplist})
        bullets = sum(1 for ln in lines if re.match("^[-*•]", ln))
        ells = sum(1 for ln in lines if re.search(r"(\.\.\.|…)$", ln))
        rows.append(
            50 <= n_words <= 100_000
            and 3 * n_words <= tot <= 10 * n_words
            and 100 * sym <= 10 * n_words
            and 100 * alpha >= 80 * n_words
            and stop_hits >= 2
            and 100 * bullets <= 90 * len(lines)
            and 100 * ells <= 30 * len(lines)
        )
    return rows


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    tbl = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    texts = tbl.column("text").to_pylist()
    n = len(texts)

    from searchengine_ray.analyze import STOPWORDS
    from searchengine_ray.curation import gopher_rules
    from searchengine_ray.textrank import textrank_keywords

    res = {"sf": sf, "docs": n}

    # time the operators through a warmed single-block local Dataset (the
    # second run excludes Ray startup; compute dominates dispatch at this
    # corpus size, so the ratio reflects the batch kernels)
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    def one_block():
        return ray.data.from_arrow(tbl)

    # warm
    textrank_keywords(one_block).to_pandas()
    t0 = time.time()
    textrank_keywords(one_block).to_pandas()
    t_tr_vec = time.time() - t0

    t0 = time.time()
    naive_textrank(texts)
    t_tr_naive = time.time() - t0

    gopher_rules(one_block).to_pandas()  # warm
    t0 = time.time()
    gopher_rules(one_block).to_pandas()
    t_g_vec = time.time() - t0

    t0 = time.time()
    naive_gopher(texts, STOPWORDS)
    t_g_naive = time.time() - t0

    res.update({
        "textrank_vec_docs_per_sec": round(n / t_tr_vec, 1),
        "textrank_naive_docs_per_sec": round(n / t_tr_naive, 1),
        "textrank_speedup": round(t_tr_naive / t_tr_vec, 2),
        "gopher_vec_docs_per_sec": round(n / t_g_vec, 1),
        "gopher_naive_docs_per_sec": round(n / t_g_naive, 1),
        "gopher_speedup": round(t_g_naive / t_g_vec, 2),
    })
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
