"""RAKE keyphrase extraction (rake.rake_keyphrases): hand-computed
scoring, brute-force scalar parity, duplicate-phrase collapse, degenerate
docs, and partition invariance (per-doc semantics)."""

import numpy as np
import pyarrow as pa
import pytest


def _ds_factory(texts):
    import ray.data

    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    return lambda: ray.data.from_arrow(tbl)


def _brute(texts, k=5):
    """Pure-Python RAKE replay with the same integer quantization."""
    from searchengine_ray.analyze import STOPWORDS
    from searchengine_ray.rake import RAKE_Q

    import re
    tok = re.compile(r"[a-z0-9_]+")
    out = []
    for did, tx in enumerate(texts):
        ws = tok.findall(tx.lower())
        phrases, cur = [], []
        for w in ws:
            if w in STOPWORDS:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(cur)
        freq, deg = {}, {}
        for p in phrases:
            for w in p:
                freq[w] = freq.get(w, 0) + 1
                deg[w] = deg.get(w, 0) + len(p)
        wscore = {w: deg[w] * RAKE_Q // freq[w] for w in freq}
        seen = {}
        for p in phrases:
            seen[" ".join(p)] = sum(wscore[w] for w in p)
        ranked = sorted(seen.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out += [(did, ph, sc, i + 1) for i, (ph, sc) in enumerate(ranked)]
    return out


def test_hand_example(ray_session):
    """'red apple and green apple': freq(apple)=2 deg(apple)=4,
    red/green freq 1 deg 2 -> every word scores exactly 2.0 so both
    phrases score 4*2^20, tie broken alphabetically."""
    from searchengine_ray.rake import RAKE_Q, rake_keyphrases

    t = rake_keyphrases(
        _ds_factory(["red apple and green apple"])
    ).to_pandas().sort_values("rn")
    assert t.phrase.tolist() == ["green apple", "red apple"]
    assert (t.score_q == 4 * RAKE_Q).all()
    assert t.rn.tolist() == [1, 2]


def test_scalar_parity_random(ray_session):
    """Brute-force parity over seeded random docs incl. stopword runs,
    repeated phrases, and single-word docs."""
    from searchengine_ray.rake import rake_keyphrases

    rng = np.random.default_rng(11)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "the", "and", "of"]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(1, 40))))
        for _ in range(60)
    ]
    got = rake_keyphrases(_ds_factory(texts)).to_pandas()
    got = got.sort_values(["doc_id", "rn"]).itertuples(index=False)
    assert sorted(map(tuple, got)) == sorted(_brute(texts))


def test_degenerate_docs(ray_session):
    """Stopword-only and empty docs produce no phrases (both sides of
    the oracle agree by construction — phrase rows only)."""
    from searchengine_ray.rake import rake_keyphrases

    t = rake_keyphrases(
        _ds_factory(["the and of", "", "a to be", "solo"])
    ).to_pandas()
    assert t.doc_id.tolist() == [3]
    assert t.phrase.tolist() == ["solo"]


def test_partition_invariance(ray_session):
    """Per-doc semantics: the result is identical however the corpus is
    split into blocks."""
    import ray.data

    from searchengine_ray.rake import rake_keyphrases

    texts = ["alpha beta the alpha", "gamma delta", "the beta beta"] * 7
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    a = rake_keyphrases(
        lambda: ray.data.from_arrow(tbl)
    ).to_pandas().sort_values(["doc_id", "rn"]).reset_index(drop=True)
    b = rake_keyphrases(
        lambda: ray.data.from_arrow(tbl).repartition(7)
    ).to_pandas().sort_values(["doc_id", "rn"]).reset_index(drop=True)
    assert a.equals(b)
