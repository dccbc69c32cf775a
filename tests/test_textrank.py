"""TextRank keywords (textrank.textrank_keywords): brute-force scalar
parity of the fixed-point power iteration, graph-shape sanity (a star's
hub ranks first), degenerate docs, and partition invariance (per-doc
semantics)."""

import collections
import re

import numpy as np
import pyarrow as pa


def _ds_factory(texts):
    import ray.data

    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    return lambda: ray.data.from_arrow(tbl)


def _brute(texts, k=5):
    """Pure-Python replay of the exact integer iteration."""
    from searchengine_ray.analyze import STOPWORDS
    from searchengine_ray.textrank import (
        TEXTRANK_DAMP_DEN, TEXTRANK_DAMP_NUM, TEXTRANK_ITERS, TEXTRANK_SCALE,
    )

    rows = []
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
        for _ in range(TEXTRANK_ITERS):
            c = collections.Counter()
            for u, v in edges:
                c[u] += s[v] // deg[v]
                c[v] += s[u] // deg[u]
            s = {
                v: ((TEXTRANK_DAMP_DEN - TEXTRANK_DAMP_NUM)
                    * TEXTRANK_SCALE) // TEXTRANK_DAMP_DEN
                + (TEXTRANK_DAMP_NUM * c[v]) // TEXTRANK_DAMP_DEN
                for v in deg
            }
        top = sorted(s.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        rows += [(i, t, sc, r + 1) for r, (t, sc) in enumerate(top)]
    return rows


def test_scalar_parity_random(ray_session):
    rng = np.random.default_rng(41)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "the", "a"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 40)))
        for _ in range(60)
    ] + ["", "the the the", "solo"]
    from searchengine_ray.textrank import textrank_keywords

    got = (
        textrank_keywords(_ds_factory(texts)).to_pandas()
        .sort_values(["doc_id", "rnk"]).reset_index(drop=True)
    )
    want = _brute(texts)
    assert list(map(tuple, got.itertuples(index=False))) == want


def test_star_hub_ranks_first(ray_session):
    """hub-spoke-hub-... : the hub has max degree and must rank 1; spokes
    tie and break alphabetically."""
    from searchengine_ray.textrank import textrank_keywords

    text = "hub s1 hub s2 hub s3 hub s4"
    t = (
        textrank_keywords(_ds_factory([text])).to_pandas()
        .sort_values("rnk")
    )
    assert t["term"].iloc[0] == "hub"
    spokes = t["term"].iloc[1:].tolist()
    assert spokes == sorted(spokes)
    assert t["score"].iloc[1:].nunique() == 1


def test_degenerate_docs(ray_session):
    """Empty, stopword-only, single-token, and same-token-run docs build
    no graph and emit nothing."""
    from searchengine_ray.textrank import textrank_keywords

    t = textrank_keywords(
        _ds_factory(["", "the and of", "solo", "dup dup dup", "x y"])
    ).to_pandas()
    assert t.doc_id.unique().tolist() == [4]
    assert set(t.term) == {"x", "y"}


def test_partition_invariance(ray_session):
    import ray.data

    from searchengine_ray.textrank import textrank_keywords

    texts = ["alpha beta the alpha gamma", "gamma delta eps", "x y z x"] * 7
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    a = textrank_keywords(
        lambda: ray.data.from_arrow(tbl)
    ).to_pandas().sort_values(["doc_id", "rnk"]).reset_index(drop=True)
    b = textrank_keywords(
        lambda: ray.data.from_arrow(tbl).repartition(7)
    ).to_pandas().sort_values(["doc_id", "rnk"]).reset_index(drop=True)
    assert a.equals(b)
