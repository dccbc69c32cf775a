"""Engine vs pure-Python oracle: rank-identity + score equality (<=1e-10)
across every operator and retrieval model (SURVEY.md §5 test plan)."""

import hashlib

import numpy as np
import pyarrow.dataset as pads
import pytest

from searchengine_ray.config import ModelParams
from searchengine_ray.engine import SearchEngine

QUERIES = [
    ("1", "memory buffer overflow"),
    ("2", "#and( buffer overflow check )"),
    ("3", "#or( mutex.title lock semaphore )"),
    ("4", "#near/1( unit test )"),
    ("5", "#near/3( open file )"),
    ("6", "#window/8( read write )"),
    ("7", "#syn( error fault failure )"),
    ("8", "#wand( 0.8 #and( hash map ) 0.1 #and( #near/1( hash map ) ) 0.1 #and( #window/8( hash map ) ) )"),
    ("9", "#wsum( 0.2 index.url 0.3 index.title 0.5 index.body )"),
    ("10", "#and( #syn( alloc #near/2( memory allocate ) ) free )"),
    ("11", "uniqueterm_only_here"),        # df=1 edge
    ("12", "check"),                        # df > N/2 -> idf clamp to 0
    ("13", "mutex lock"),                   # exact-tie docs -> extid tie-break
    ("14", "nosuchtermanywhere"),           # empty result
    ("15", "the of and"),                   # stopword-only -> empty query
    ("16", "#near/2( the fast )"),          # stopword vanishes inside near
    ("17", "py.keywords"),                  # keywords field
    ("18", "#sum( #near/1( unit test ) runner )"),
    ("19", "#window/4( #syn( alloc alloc ) free )"),  # duplicate positions edge
    ("20", "#window/8( read write buffer )"),          # 3-arg window
]

MODELS = ["bm25", "indri", "rankedboolean", "unrankedboolean"]


def _params(model):
    return ModelParams(model=model, top_k=50)


@pytest.fixture(scope="module")
def engines(built_index):
    return {m: SearchEngine(built_index, _params(m)) for m in MODELS}


@pytest.mark.parametrize("model", MODELS)
def test_parity_all_queries(model, engines, oracle):
    eng = engines[model]
    for qid, q in QUERIES:
        try:
            got = eng.search(qid, q).to_pandas()
            raised = None
        except ValueError as e:
            got, raised = None, e
        try:
            want = oracle.search(qid, q, _params(model))
            oracle_raised = None
        except ValueError as e:
            want, oracle_raised = None, e
        # engine and oracle must agree on which op/model combos are invalid
        assert (raised is None) == (oracle_raised is None), (
            f"{model} q{qid}: engine={raised} oracle={oracle_raised}"
        )
        if raised is not None:
            continue
        assert list(got["external_id"]) == list(want["external_id"]), (
            f"{model} q{qid} rank mismatch:\n{got.head(8)}\n--\n{want.head(8)}"
        )
        np.testing.assert_allclose(
            got["score"].to_numpy(),
            want["score"].to_numpy(),
            rtol=0,
            atol=1e-10,
            err_msg=f"{model} q{qid}",
        )


def test_tie_break_is_exercised(engines, oracle):
    got = engines["bm25"].search("13", "mutex lock").to_pandas()
    # the two planted tie docs have identical content -> identical scores
    tie = got[got["external_id"].str.startswith("tie/")]
    assert len(tie) == 2
    s = tie["score"].to_numpy()
    assert s[0] == s[1]
    assert list(tie["external_id"]) == sorted(tie["external_id"])


def test_sha256_invariant(built_index, fixture_corpus):
    dm = pads.dataset(f"{built_index}/docmap").to_table().to_pandas()
    content = dict(
        zip(
            fixture_corpus.column("doc_id").to_pylist(),
            fixture_corpus.column("content").to_pylist(),
        )
    )
    assert len(dm) == len(content)
    for _, row in dm.iterrows():
        assert (
            hashlib.sha256(content[row.doc_id].encode()).hexdigest() == row.sha256
        )


def test_postings_invariants(built_index):
    from searchengine_ray.indexio import InvertedIndex

    idx = InvertedIndex(built_index)
    total_ctf = 0
    for field, term in idx.vocabulary("body"):
        p = idx.postings(field, term)
        assert np.all(np.diff(p.doc_ids) > 0), f"docids not ascending for {term}"
        assert p.df == len(p.doc_ids)
        assert p.ctf == int(p.tfs.sum())
        for i in range(p.df):
            pos = p.positions_for(i)
            assert np.all(np.diff(pos) > 0)
        total_ctf += p.ctf
    # sum of body ctf == sum of body doclens minus stopword positions
    dm = pads.dataset(f"{built_index}/docmap").to_table()
    sum_len = sum(dm.column("len_body").to_pylist())
    assert total_ctf < sum_len  # stopwords occupy positions but aren't indexed


@pytest.mark.parametrize(
    "q",
    [
        "memory buffer overflow",
        "mutex lock",
        "check",                      # clamped idf -> fallback path
        "uniqueterm_only_here",
        "mutex.title lock",           # multi-field flat
        "alloc free memory buffer cache",
    ],
)
def test_maxscore_fast_path_exact(built_index, q):
    """Flat-BM25 MaxScore pruning must be rank- and score-identical to the
    exhaustive evaluator, including tie-breaks and fallback cases."""
    fast = SearchEngine(built_index, ModelParams(model="bm25", top_k=10))
    slow = SearchEngine(
        built_index, ModelParams(model="bm25", top_k=10, use_maxscore=False)
    )
    a = fast.search("q", q).to_pandas()
    b = slow.search("q", q).to_pandas()
    assert list(a["external_id"]) == list(b["external_id"])
    np.testing.assert_array_equal(a["score"].to_numpy(), b["score"].to_numpy())


def test_ctf_doclen_stopword_invariant(built_index, fixture_corpus):
    """FIXTURES.md §6: sum of body ctf == sum of body doclens minus the
    number of stopword token instances, exactly."""
    from searchengine_ray.analyze import STOPWORDS, tokenize
    from searchengine_ray.indexio import InvertedIndex

    idx = InvertedIndex(built_index)
    total_ctf = sum(
        idx.postings(f, t, need_positions=False).ctf
        for f, t in idx.vocabulary("body")
    )
    texts = fixture_corpus.column("content").to_pylist()
    n_stop = sum(1 for t in texts for w in tokenize(t) if w in STOPWORDS)
    assert total_ctf == idx.sum_field_lengths("body") - n_stop


def test_hot_term_salting_splits_buckets(built_index):
    """The shuffle key includes the doc bucket: a term spanning multiple
    doc ranges must produce multiple postings ROWS (salting), and the
    reader must reassemble them docid-ascending."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from searchengine_ray.indexio import InvertedIndex, _parquet_files

    t = pads.dataset(_parquet_files([f"{built_index}/postings"])).to_table()
    body = t.filter(pc.equal(t.column("field"), "body"))
    import collections

    rows_per_term = collections.Counter(body.column("term").to_pylist())
    multi = [term for term, c in rows_per_term.items() if c > 1]
    assert multi, "fixture bucket size should force multi-bucket terms"
    idx = InvertedIndex(built_index)
    for term in multi[:5]:
        p = idx.postings("body", term)
        assert np.all(np.diff(p.doc_ids) > 0)
        assert p.df >= rows_per_term[term]  # each bucket row holds >=1 doc


def test_manifest_lineage_metrics(built_index):
    import json

    with open(f"{built_index}/manifest.json") as f:
        m = json.load(f)
    assert m["complete"]
    for part in m["partitions"].values():
        assert part["status"] == "done"
        if part.get("empty"):
            continue
        for side in ("docmap", "postings"):
            assert part[side]["rows"] > 0
            assert part[side]["bytes"] > 0
            assert len(part[side]["fingerprint"]) == 16


def test_parity_stemmed_profile(ray_session, tmp_path):
    """Engine vs oracle under the Porter profile: same rank-identity bar as
    the no-stem parity suite, on queries whose surface forms differ from
    the indexed stems."""
    import ray.data

    from searchengine_ray.build import build_index
    from searchengine_ray.config import BuildConfig
    from searchengine_ray.corpus import synthesize_corpus
    from searchengine_ray.oracle import Oracle

    tbl = synthesize_corpus(120, seed=7)
    out = str(tmp_path / "stemmed_idx")
    build_index(
        lambda: ray.data.from_arrow(tbl), out,
        BuildConfig(doc_bucket_size=64, stemmer="porter"),
    )
    oracle = Oracle(tbl, stemmer="porter")
    queries = [
        ("1", "pointers overflows"),          # plural query, singular docs
        ("2", "#near/1( units testing )"),    # stemmed adjacency
        ("3", "#syn( errors faults failures )"),
        ("4", "checking"),                    # stems to the idf-clamped term
        ("5", "#window/8( reads writes )"),
    ]
    for model in ("bm25", "indri", "rankedboolean"):
        eng = SearchEngine(out, _params(model))
        for qid, q in queries:
            got = eng.search(qid, q).to_pandas()
            want = oracle.search(qid, q, _params(model))
            assert list(got["external_id"]) == list(want["external_id"]), (
                f"{model} q{qid}"
            )
            assert np.allclose(
                got["score"].to_numpy(), want["score"].to_numpy(), atol=1e-10
            ), f"{model} q{qid}"
        # a stemmed query must actually match morphological variants
        if model == "rankedboolean":
            assert len(eng.search("x", "pointers").to_pandas()) > 0


def test_partitioned_build_pruned_reads_same_content(ray_session, tmp_path):
    """A 2-partition build over an sf_dir source (doc_range predicate
    pushdown into read_parquet) produces content identical to the
    1-partition build, and the pruned factory really prunes."""
    import glob

    import pandas as pd
    import pyarrow.dataset as pads

    from searchengine_ray.build import build_index
    from searchengine_ray.config import BuildConfig
    from searchengine_ray.corpus import corpus_from_documents

    sf = "/root/testdata/sf0.001"
    half = corpus_from_documents(sf, doc_range=(0, 250))
    assert half.count() == 250  # pushdown filter actually applies

    a, b = str(tmp_path / "one"), str(tmp_path / "two")
    build_index(sf, a, BuildConfig(doc_bucket_size=128, num_partitions=1))
    build_index(sf, b, BuildConfig(doc_bucket_size=128, num_partitions=2))

    def canon(d, sub):
        t = pads.dataset(
            sorted(glob.glob(f"{d}/{sub}/**/*.parquet", recursive=True))
        ).to_table().to_pandas()
        return t.sort_values(list(t.columns[:4])).reset_index(drop=True)

    for sub in ("postings", "docmap", "lexicon"):
        pd.testing.assert_frame_equal(canon(a, sub), canon(b, sub))
    assert open(f"{a}/stats.json").read() == open(f"{b}/stats.json").read()


def test_crash_resume_content_identical(ray_session, tmp_path):
    """FIXTURES.md §6: kill mid-build, resume -> index content identical to
    an uninterrupted build (docmap/postings/lexicon/stats)."""
    import glob
    import json
    import shutil

    import pandas as pd
    import pyarrow.dataset as pads
    import ray.data

    from searchengine_ray.build import build_index
    from searchengine_ray.config import BuildConfig
    from searchengine_ray.corpus import synthesize_corpus

    tbl = synthesize_corpus(150, seed=23)
    cfg = BuildConfig(doc_bucket_size=64, num_partitions=3)
    fac = lambda: ray.data.from_arrow(tbl)  # noqa: E731
    a, b = str(tmp_path / "ix_a"), str(tmp_path / "ix_b")
    build_index(fac, a, cfg)
    build_index(fac, b, cfg)
    # simulate a crash: partition 1 outputs + manifest entry vanish
    man = json.load(open(f"{b}/manifest.json"))
    del man["partitions"]["1"]
    man["complete"] = False
    json.dump(man, open(f"{b}/manifest.json", "w"))
    shutil.rmtree(f"{b}/postings/part_00001")
    shutil.rmtree(f"{b}/docmap/part_00001")
    build_index(fac, b, cfg)  # resume

    def canon(d, sub):
        t = pads.dataset(
            sorted(glob.glob(f"{d}/{sub}/**/*.parquet", recursive=True))
        ).to_table().to_pandas()
        return t.sort_values(list(t.columns[:4])).reset_index(drop=True)

    for sub in ("postings", "docmap", "lexicon"):
        pd.testing.assert_frame_equal(canon(a, sub), canon(b, sub))
    assert open(f"{a}/stats.json").read() == open(f"{b}/stats.json").read()


def test_model_registry_extension(built_index):
    """SURVEY §2.12: plug in a new retrieval model via hooks (no ladders)."""
    import math

    from searchengine_ray.config import DEFAULT_OP, MODEL_REGISTRY, register_model

    def tfidf_leaf(tf, dl, stats, params):
        return math.log(stats.n_docs / max(1, stats.df)) * tf

    register_model(
        "mytfidf", tfidf_leaf, default_op="#sum",
        combine={"#sum": "sum", "#and": "min"},
    )
    try:
        eng = SearchEngine(built_index, ModelParams(model="mytfidf", top_k=5))
        t = eng.search("q", "mutex lock").to_pandas()
        assert len(t) == 5
        # hand-check the top doc's score
        idx = eng.index
        d = int(t["doc_id"].iloc[0])
        s = 0.0
        for term in ("mutex", "lock"):
            p = idx.postings("body", term, need_positions=False)
            pos = int(np.searchsorted(p.doc_ids, d))
            tf = float(p.tfs[pos]) if pos < p.df and p.doc_ids[pos] == d else 0.0
            if tf:
                import math as _m

                s += _m.log(idx.num_docs / p.df) * tf
        assert t["score"].iloc[0] == pytest.approx(s, rel=1e-12)
        # structured ops route through the generic reducers
        t2 = eng.search("q", "#and( mutex lock )").to_pandas()
        assert len(t2) > 0
        # positional derived lists score through the same leaf hook
        t3 = eng.search("q", "#near/1( unit test )").to_pandas()
        assert len(t3) > 0
        # an op absent from this model's combine map raises cleanly
        with pytest.raises(ValueError):
            eng.search("q", "#or( mutex lock )")
    finally:
        MODEL_REGISTRY.pop("mytfidf", None)
        DEFAULT_OP.pop("mytfidf", None)


def test_builtin_tfidf_model(built_index):
    """'tfidf' ships as a built-in REGISTERED model (config.register_model
    at import time) — the §2.12 extension surface as a first-class fifth
    model: leaf == ln(N/df)*tf with scalar libm idf, no idf clamp, generic
    reducers for structured ops, clean raise for unmapped ops."""
    import math

    eng = SearchEngine(built_index, ModelParams(model="tfidf", top_k=10))
    t = eng.search("q", "mutex lock").to_pandas()
    idx = eng.index
    for _, row in t.head(3).iterrows():
        d, s = int(row["doc_id"]), 0.0
        for term in ("mutex", "lock"):
            p = idx.postings("body", term, need_positions=False)
            pos = int(np.searchsorted(p.doc_ids, d))
            tf = float(p.tfs[pos]) if pos < p.df and p.doc_ids[pos] == d else 0.0
            if tf:
                s += math.log(idx.num_docs / p.df) * tf
        assert row["score"] == pytest.approx(s, rel=1e-12)
    # no idf clamp: the df > N/2 term BM25 zeroes must still score > 0
    t2 = eng.search("q", "check").to_pandas()
    assert len(t2) and (t2["score"] > 0).all()
    # structured ops ride the generic registered-model reducers
    ta = eng.search("q", "#and( mutex lock )").to_pandas()
    to = eng.search("q", "#or( mutex lock )").to_pandas()
    assert len(ta) and len(to) >= len(ta)
    # an op absent from tfidf's combine map raises cleanly
    with pytest.raises(ValueError):
        eng.search("q", "#wand( mutex lock )")


def test_andnot_is_setminus_scored_by_positive(built_index):
    """#ANDNOT(a b) = docs(a) \\ docs(b), scores identical to a's — checked
    under all four models against the plain positive-leg search."""
    from searchengine_ray.config import ModelParams
    from searchengine_ray.engine import SearchEngine

    for model in ("bm25", "rankedboolean", "unrankedboolean", "indri"):
        eng = SearchEngine(
            built_index, ModelParams(model=model, top_k=1 << 30)
        )
        pos = eng.search("q", "mutex")
        neg = eng.search("q", "thread")
        got = eng.search("q", "#andnot( mutex thread )")
        neg_ids = set(neg.column("doc_id").to_pylist())
        want = {
            d: s
            for d, s in zip(
                pos.column("doc_id").to_pylist(),
                pos.column("score").to_pylist(),
            )
            if d not in neg_ids
        }
        have = dict(
            zip(
                got.column("doc_id").to_pylist(),
                got.column("score").to_pylist(),
            )
        )
        assert have == want, model
        assert len(have) < pos.num_rows  # the filter actually removed docs


def test_filreq_filrej_filter_context(built_index):
    """Indri #filreq/#filrej (ES bool-filter-context semantics): the
    filter leg gates membership, never scores — checked under all five
    models against the plain query-leg search; filreq and filrej
    partition the query's matches; arity and empty-filter semantics."""
    from searchengine_ray.config import ModelParams
    from searchengine_ray.engine import SearchEngine

    for model in (
        "bm25", "rankedboolean", "unrankedboolean", "indri", "tfidf"
    ):
        eng = SearchEngine(
            built_index, ModelParams(model=model, top_k=1 << 30)
        )
        q = eng.search("q", "mutex")
        f = eng.search("q", "thread")
        req = eng.search("q", "#filreq( thread mutex )")
        rej = eng.search("q", "#filrej( thread mutex )")
        f_ids = set(f.column("doc_id").to_pylist())
        scores = dict(
            zip(q.column("doc_id").to_pylist(), q.column("score").to_pylist())
        )
        want_req = {d: s for d, s in scores.items() if d in f_ids}
        want_rej = {d: s for d, s in scores.items() if d not in f_ids}
        have_req = dict(zip(req.column("doc_id").to_pylist(),
                            req.column("score").to_pylist()))
        have_rej = dict(zip(rej.column("doc_id").to_pylist(),
                            rej.column("score").to_pylist()))
        assert have_req == want_req, model
        assert have_rej == want_rej, model
        # the two filters partition the query's matches, both non-trivially
        assert set(have_req) | set(have_rej) == set(scores)
        assert not (set(have_req) & set(have_rej))
        assert have_req and have_rej, model

    eng = SearchEngine(built_index, ModelParams(model="bm25", top_k=10))
    # arity: a filter op needs exactly (filter, query)
    with pytest.raises(ValueError):
        eng.search("q", "#filreq( mutex )")
    # a BARE stopword filter leg vanishes at analysis, so positional
    # identity is lost -> arity error (documented in optimize())
    with pytest.raises(ValueError):
        eng.search("q", "#filrej( the mutex )")
    # a STRUCTURED empty filter keeps its node: #filrej rejects nothing
    # -> the node IS its query; #filreq requires nothing -> matches none
    base = eng.search("q", "mutex").to_pandas()
    kept = eng.search("q", "#filrej( #syn( the ) mutex )").to_pandas()
    assert kept.equals(base)
    assert eng.search("q", "#filreq( #syn( the ) mutex )").num_rows == 0
