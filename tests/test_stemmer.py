"""Pluggable stemmer profile (reference HW1-5 stem, HW6 none —
`Homeworks/HW1/QryEval/QryParser.java:48` vs HW6 `QryParser.java:48-50`)."""

import numpy as np
import pyarrow as pa
import pytest

from searchengine_ray.stem import get_stemmer, porter, register_stemmer


@pytest.mark.parametrize("word,expect", [
    ("caresses", "caress"), ("ponies", "poni"), ("cats", "cat"),
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("motoring", "motor"), ("sing", "sing"), ("conflated", "conflat"),
    ("troubling", "troubl"), ("sized", "size"), ("hopping", "hop"),
    ("falling", "fall"), ("hissing", "hiss"), ("failing", "fail"),
    ("happy", "happi"), ("sky", "sky"), ("relational", "relat"),
    ("conditional", "condit"), ("vietnamization", "vietnam"),
    ("predication", "predic"), ("operator", "oper"), ("feudalism", "feudal"),
    ("decisiveness", "decis"), ("hopefulness", "hope"),
    ("formaliti", "formal"), ("triplicate", "triplic"), ("formative", "form"),
    ("formalize", "formal"), ("electriciti", "electr"),
    ("electrical", "electr"), ("hopeful", "hope"), ("goodness", "good"),
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("adoption", "adopt"), ("probate", "probat"),
    ("rate", "rate"), ("cease", "ceas"), ("controll", "control"),
    ("roll", "roll"),
])
def test_porter_published_examples(word, expect):
    # cases from the Porter 1980 paper's worked examples
    assert porter(word) == expect


def test_analyze_batch_merges_stemmed_variants():
    from searchengine_ray.analyze import analyze_batch

    ab = analyze_batch(["running runs run the runner"], stemmer=porter)
    terms = dict(zip(ab.term.tolist(), ab.tf.tolist()))
    # running/runs/run merge; 'the' is a stopword but holds position 3
    assert terms["run"] == 3
    assert terms["runner"] == 1
    assert ab.doc_lens[0] == 5
    i = ab.term.tolist().index("run")
    assert ab.positions[ab.pos_offsets[i]:ab.pos_offsets[i + 1]].tolist() == [0, 1, 2]


def test_stemmed_index_matches_variants(ray_session, tmp_path):
    """A porter-profile index retrieves morphological variants for a
    stemmed query; query-side analysis picks the profile from stats.json."""
    import ray.data

    from searchengine_ray.build import build_index
    from searchengine_ray.config import BuildConfig, ModelParams
    from searchengine_ray.engine import SearchEngine

    rows = {
        "doc_id": [0, 1, 2, 3],
        "repo": ["r"] * 4,
        "path": [f"p{i}" for i in range(4)],
        "commit": ["c"] * 4,
        "lang": ["txt"] * 4,
        "content": [
            "connection pooling strategies",
            "connected pools connect quickly",
            "totally unrelated words here",
            "connections connecting connectors",
        ],
    }
    tbl = pa.table(
        {
            k: pa.array(v, type=pa.int64() if k == "doc_id" else pa.string())
            for k, v in rows.items()
        }
    )
    out = str(tmp_path / "stem_idx")
    cfg = BuildConfig(stemmer="porter")
    build_index(lambda: ray.data.from_arrow(tbl), out, cfg)
    eng = SearchEngine(out, ModelParams(model="rankedboolean", top_k=10))
    got = eng.search("q", "connects").to_pandas()
    assert set(got["doc_id"]) == {0, 1, 3}

    # no-stem profile on the same corpus: exact term only
    out2 = str(tmp_path / "nostem_idx")
    build_index(lambda: ray.data.from_arrow(tbl), out2, BuildConfig())
    eng2 = SearchEngine(out2, ModelParams(model="rankedboolean", top_k=10))
    got2 = eng2.search("q", "connected").to_pandas()
    assert set(got2["doc_id"]) == {1}


def test_stemmed_profile_reaches_letor_and_drmm(ray_session, tmp_path):
    """letor/drmm/expand analyze queries and doc text with the INDEX's
    stemmer profile — on a porter index, unstemmed lookups would silently
    zero every term-dependent feature."""
    import ray.data

    from searchengine_ray.build import build_index
    from searchengine_ray.config import BuildConfig
    from searchengine_ray.drmm import DrmmConfig, DrmmScorer
    from searchengine_ray.engine import SearchEngine
    from searchengine_ray.letor import Featurizer, LetorConfig

    rows = {
        "doc_id": [0, 1, 2, 3],
        "repo": ["r"] * 4,
        "path": ["a", "b", "c", "d"],
        "commit": ["c"] * 4,
        "lang": ["t"] * 4,
        # 4 docs so df=1 stays below N/2 and the BM25 idf clamp doesn't zero
        "content": [
            "connections pooling connecting",
            "unrelated words here",
            "more filler text",
            "yet other filler",
        ],
    }
    tbl = pa.table(
        {
            k: pa.array(v, type=pa.int64() if k == "doc_id" else pa.string())
            for k, v in rows.items()
        }
    )
    out = str(tmp_path / "sidx")
    build_index(lambda: ray.data.from_arrow(tbl), out, BuildConfig(stemmer="porter"))
    eng = SearchEngine(out)
    fz = Featurizer(eng.index)
    F = fz.features("connected pools", np.array([0, 1, 2, 3]), LetorConfig())
    assert F[0, 4] > 0  # body BM25 found the stemmed matches
    assert F[0, 6] == 1.0  # both query terms overlap doc 0
    s = DrmmScorer(eng.index, DrmmConfig(dim=8))
    terms, gates = s.query_terms_and_gates("connected pools")
    assert terms == ["connect", "pool"]


def test_register_stemmer_roundtrip():
    register_stemmer("identity_test", lambda w: w)
    assert get_stemmer("identity_test")("abc") == "abc"
    with pytest.raises(ValueError):
        get_stemmer("nope_not_registered")


# ---------------------------------------------------------------------------
# KSTEM (Krovetz 1993) — the reference's HW1-HW5 profile
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("word,expect", [
    # plural -> singular
    ("dogs", "dog"), ("flies", "fly"), ("policies", "policy"),
    ("churches", "church"), ("boxes", "box"), ("tables", "table"),
    ("values", "value"), ("queries", "query"), ("hashes", "hash"),
    ("keys", "key"), ("streams", "stream"), ("batches", "batch"),
    # past tense / aspect with e-restoration and un-doubling
    ("running", "run"), ("sitting", "sit"), ("hoping", "hope"),
    ("hopping", "hop"), ("using", "use"), ("used", "use"),
    ("agreed", "agree"), ("freed", "free"), ("applied", "apply"),
    ("studied", "study"), ("committed", "commit"), ("planned", "plan"),
    ("stopped", "stop"), ("sorted", "sort"), ("merging", "merge"),
    ("filtering", "filter"), ("grouped", "group"), ("scanning", "scan"),
    # dictionary words and -ing nouns never stem
    ("thing", "thing"), ("king", "king"), ("spring", "spring"),
    ("data", "data"), ("index", "index"),
    # irregular direct conflations
    ("feet", "foot"), ("indices", "index"), ("matrices", "matrix"),
    ("children", "child"), ("took", "take"), ("was", "be"), ("said", "say"),
])
def test_kstem_published_examples(word, expect):
    from searchengine_ray.stem import kstem

    assert kstem(word) == expect


def test_kstem_registered_and_corpus_invariant():
    """The gate entry se_bm25_term_kstem relies on the testdata vocabulary
    being KSTEM-invariant; pin that here (and the registry lookup)."""
    from searchengine_ray.stem import get_stemmer

    ks = get_stemmer("kstem")
    vocab = (
        "a agg batch big column customer data dup fast filter group hash "
        "join key line merge order part query row scan slow small sort "
        "spark stream table the value vector window"
    ).split()
    assert {w: ks(w) for w in vocab} == {w: w for w in vocab}


def test_kstem_lexicon_plug_point():
    """kstem_with_lexicon: a supplied lexicon licenses removals the
    built-in list doesn't know about."""
    from searchengine_ray.stem import kstem, kstem_with_lexicon

    k2 = kstem_with_lexicon({"house", "gas"})
    assert k2("houses") == "house"
    assert k2("gases") == "gas"
    # and known words never stem
    assert k2("house") == "house"
    assert kstem("sitting") == k2("sitting") == "sit"
