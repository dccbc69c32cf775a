"""Phrase suggester (ES phrase-suggester analog, phrase.suggest_phrases):
scalar parity vs a brute-force recount, LM-context-beats-candidate-rank,
stopword passthrough, OOV fallback, and the enumeration guards."""

import math

import numpy as np
import pyarrow as pa
import pytest


def _mini_corpus():
    """Controlled corpus: 'tint' outranks 'tent' by df, but only
    'tent pole' exists as a bigram — context must beat the df rank."""
    texts = ["tint wall"] * 20 + ["tent pole"] * 10
    n = len(texts)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "repo": [f"org/r{i % 3}" for i in range(n)],
        "path": [f"src/f_{i:04d}.py" for i in range(n)],
        "commit": ["c" * 40] * n,
        "lang": ["py"] * n,
        "content": texts,
    })


@pytest.fixture(scope="module")
def phrase_index(ray_session, tmp_path_factory):
    import ray.data

    from searchengine_ray.build import build_index
    from searchengine_ray.config import BuildConfig

    tbl = _mini_corpus()
    out = str(tmp_path_factory.mktemp("pidx") / "index")
    build_index(
        lambda: ray.data.from_arrow(tbl), out,
        BuildConfig(doc_bucket_size=16, skip_block_docs=8, num_partitions=1),
    )
    return out


def _docs_ds():
    import ray.data

    return ray.data.from_arrow(
        pa.table({"text": _mini_corpus().column("content")})
    )


def _engine_index(path):
    from searchengine_ray.config import ModelParams
    from searchengine_ray.engine import SearchEngine

    return SearchEngine(path, ModelParams(model="bm25")).index


def test_context_beats_candidate_rank(ray_session, phrase_index):
    """'tnt' candidates rank (tint df=20, tent df=10) at equal dist, but
    the bigram LM must pick 'tent pole' (c12=10) over 'tint pole' (0)."""
    from searchengine_ray.phrase import suggest_phrases

    idx = _engine_index(phrase_index)
    t = suggest_phrases(idx, _docs_ds, ["tnt pole"]).to_pandas()
    assert t.suggestion.iloc[0] == "tent pole"
    assert "tint pole" in set(t.suggestion)  # still enumerated, ranked lower
    assert t.rn.tolist() == list(range(1, len(t) + 1))


def test_scalar_parity(ray_session, phrase_index):
    """Full-table parity against a brute-force pure-Python recount of
    candidates, bigram counts, and the quantized scoring chain."""
    from searchengine_ray.operators import _levenshtein_all
    from searchengine_ray.phrase import PEN_Q, _nll_q, suggest_phrases

    idx = _engine_index(phrase_index)
    vocab = sorted(t for (_f, t) in idx.vocabulary("body"))
    dfs = {t: idx.postings("body", t, need_positions=False).stat_df
           for t in vocab}
    V = len(vocab) + 1
    texts = ["tint wall"] * 20 + ["tent pole"] * 10
    c12: dict = {}
    c1: dict = {}
    for tx in texts:
        ws = tx.split()
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1

    def cands(q):
        d = _levenshtein_all(q, vocab)
        cc = sorted(
            (int(dd), -dfs[t], t) for t, dd in zip(vocab, d) if dd <= 2
        )[:3]
        return [(t, dd) for dd, _ndf, t in cc] or [(q, 0)]

    phrases = ["tnt pole", "tint wal", "tnt"]
    exp = []
    for ph in phrases:
        toks = ph.split()
        combos = [[]]
        for tk in toks:
            combos = [c + [x] for c in combos for x in cands(tk)]
        scored = []
        for combo in combos:
            terms = [t for t, _ in combo]
            dist = sum(d for _, d in combo)
            q = PEN_Q * dist
            for a, b in zip(terms, terms[1:]):
                q += _nll_q(c12.get((a, b), 0), c1.get(a, 0), V)
            scored.append((q, dist, " ".join(terms)))
        scored.sort()
        exp += [(ph, s, d, q, i + 1)
                for i, (q, d, s) in enumerate(scored[:3])]

    got = suggest_phrases(idx, _docs_ds, phrases).to_pandas()
    assert list(map(tuple, got.itertuples(index=False))) == exp


def test_stopword_passthrough_and_oov_fallback(ray_session, phrase_index):
    from searchengine_ray.phrase import suggest_phrases

    idx = _engine_index(phrase_index)
    t = suggest_phrases(idx, _docs_ds, ["the tnt", "zzzzzz pole"]).to_pandas()
    the_rows = t[t.input == "the tnt"]
    # 'the' is never "corrected" — every suggestion keeps it verbatim
    assert all(s.split()[0] == "the" for s in the_rows.suggestion)
    zz = t[t.input == "zzzzzz pole"]
    # no dictionary term within 2 edits of 'zzzzzz' -> identity at dist 0
    assert all(s.split()[0] == "zzzzzz" for s in zz.suggestion)
    assert zz.dist.min() == 0


def test_guards(ray_session, phrase_index):
    from searchengine_ray.phrase import MAX_PHRASE_TOKENS, suggest_phrases

    idx = _engine_index(phrase_index)
    with pytest.raises(ValueError, match="MAX_PHRASE_TOKENS"):
        suggest_phrases(idx, _docs_ds, ["t " * (MAX_PHRASE_TOKENS + 1)])


def test_quantized_nll_matches_libm():
    """_nll_q is the exact lm_perplexity expression (scalar libm ln)."""
    from searchengine_ray.curation import LM_Q
    from searchengine_ray.phrase import _nll_q

    for c12, c1, V in [(0, 0, 5), (10, 10, 5), (3, 40, 101)]:
        p = (1.0 + float(c12)) / (float(c1) + float(V))
        assert _nll_q(c12, c1, V) == int(
            math.floor((0.0 - math.log(p)) * float(LM_Q) + 0.5)
        )
