import pytest

from searchengine_ray.analyze import analyze_query_token
from searchengine_ray.qryparse import (
    Op,
    QuerySyntaxError,
    Term,
    parse_query,
    parse_string,
)


def parse(q, default="#sum"):
    return parse_query(q, default, analyze_query_token)


def test_flat_query_wraps_in_default_op():
    t = parse("parse json config")
    assert isinstance(t, Op) and t.name == "#sum"
    assert [a.name for a in t.args] == ["#score"] * 3
    assert [a.args[0].term for a in t.args] == ["parse", "json", "config"]


def test_field_suffix_and_default_field():
    t = parse("mutex.title lock")
    assert t.args[0].args[0].field == "title"
    assert t.args[1].args[0].field == "body"


def test_unknown_field_rejected():
    with pytest.raises(QuerySyntaxError):
        parse("mutex.nosuchfield")


def test_near_distance_and_field_propagation():
    t = parse("#near/3(open file)")
    # single-arg #sum collapses to the #score wrapper
    assert t.name == "#score"
    near = t.args[0]
    assert near.name == "#near" and near.dist == 3 and near.field == "body"


def test_iop_field_mismatch_rejected():
    with pytest.raises(QuerySyntaxError):
        parse("#near/2(open.title file.body)")


def test_weights_parsed_for_wand():
    t = parse("#wand( 0.8 hash 0.2 #near/1(hash map) )")
    assert t.name == "#wand"
    assert t.weights == [0.8, 0.2]
    assert len(t.args) == 2


def test_multi_term_token_replicates_weight():
    t = parse("#wsum( 0.5 near-death 0.5 exp )")
    assert t.weights == [0.5, 0.5, 0.5]
    assert len(t.args) == 3


def test_stopword_only_operator_deleted():
    t = parse("#sum( #and(the of) zebra )")
    # the #and vanishes; single remaining arg collapses to its #score
    assert t.name == "#score"
    assert t.args[0].term == "zebra"


def test_all_stopwords_query_is_none():
    assert parse("the and of") is None


def test_weight_removed_with_deleted_arg():
    t = parse("#wand( 0.7 #and(the) 0.3 zebra )")
    assert t.name == "#score"  # collapsed single arg


def test_unbalanced_parens():
    with pytest.raises(QuerySyntaxError):
        parse_string("#and(a b", analyze_query_token)


def test_nested_structure():
    t = parse("#and( #syn( alloc #near/2(memory allocate) ) free )", "#and")
    assert t.name == "#and"
    syn_score = t.args[0]
    assert syn_score.name == "#score"
    syn = syn_score.args[0]
    assert syn.name == "#syn"
    assert isinstance(syn.args[0], Term)
    assert syn.args[1].name == "#near"


def test_case_insensitive_ops():
    t = parse("#AND( #SYN(station depot) track )", "#and")
    assert t.name == "#and"


def test_operator_registry_extension():
    """SURVEY §2.12 extension surface: register #uw as an unordered-window
    alias; it parses and evaluates through the #window machinery."""
    from searchengine_ray.qryparse import (
        IOP_NAMES,
        OPERATOR_REGISTRY,
        register_operator,
    )

    register_operator("#uw", kind="iop", alias_of="#window")
    try:
        t = parse("#uw/8( read write )")
        assert t.name == "#score"
        assert t.args[0].name == "#window" and t.args[0].dist == 8
    finally:
        OPERATOR_REGISTRY.pop("#uw", None)
        IOP_NAMES.discard("#uw")


# ---------------------------------------------------------------------------
# SDM query generator (Homeworks/HW4/DonMetzler.pl — Metzler & Croft 2005)
# ---------------------------------------------------------------------------


def test_sdm_matches_reference_generated_queries():
    """Byte-identical to strings from the reference's own generated file
    (Homeworks/HW4/QryEval/HW4-Exp-1c.qry)."""
    from searchengine_ray.sdm import formulate_query

    ref = {
        "french lick resort and casino": "#wand( 0.8 #and( french lick resort and casino ) 0.1 #and( #near/1( and casino )  #near/1( resort and )  #near/1( lick resort )  #near/1( french lick ) ) 0.1 #and( #window/8( and casino )  #window/8( resort and )  #window/8( lick resort )  #window/8( french lick ) ) )",
        "toilet": "#and( toilet )",
        "air travel information": "#wand( 0.8 #and( air travel information ) 0.1 #and( #near/1( travel information )  #near/1( air travel ) ) 0.1 #and( #window/8( travel information )  #window/8( air travel ) ) )",
        "used car parts": "#wand( 0.8 #and( used car parts ) 0.1 #and( #near/1( car parts )  #near/1( used car ) ) 0.1 #and( #window/8( car parts )  #window/8( used car ) ) )",
        "gmat prep classes": "#wand( 0.8 #and( gmat prep classes ) 0.1 #and( #near/1( prep classes )  #near/1( gmat prep ) ) 0.1 #and( #window/8( prep classes )  #window/8( gmat prep ) ) )",
        "wedding budget calculator": "#wand( 0.8 #and( wedding budget calculator ) 0.1 #and( #near/1( budget calculator )  #near/1( wedding budget ) ) 0.1 #and( #window/8( budget calculator )  #window/8( wedding budget ) ) )",
    }
    for flat, want in ref.items():
        assert formulate_query(flat, "sd", ("0.8", "0.1", "0.1")) == want


def test_sdm_zero_weights_and_fd_subsets():
    from searchengine_ray.sdm import formulate_query

    # w_O = w_U = 0 collapses to the term #and
    assert formulate_query("used car parts", "sd", (1.0, 0.0, 0.0)) == (
        "#and( used car parts )"
    )
    # fd: every >=2 subset windows; only contiguous runs get #near
    fd = formulate_query("a b c", "fd", (0.6, 0.2, 0.2))
    assert "#near/1( a c )" not in fd
    assert "#window/8( a c )" in fd
    assert "#near/1( a b c )" in fd and "#window/12( a b c )" in fd


def test_sdm_queries_run_through_the_engine(ray_session, built_index):
    """Generated SDM queries parse and score (Indri #wand path)."""
    from searchengine_ray.config import ModelParams
    from searchengine_ray.engine import SearchEngine
    from searchengine_ray.sdm import formulate_query

    q = formulate_query("spark join stream", "sd")
    eng = SearchEngine(built_index, ModelParams(model="indri", top_k=10))
    t = eng.search("1", q)
    assert t.num_rows > 0


def test_fuzzy_prefix_parse_and_survive_optimize():
    """#FUZZY/#PREFIX are dictionary expansions — the single-arg collapse
    that rewrites #AND(x) -> x must NOT touch them."""
    from searchengine_ray.qryparse import Op, parse_query

    ident = lambda toks: toks  # noqa: E731
    analyze = lambda s: [s.lower()]  # noqa: E731
    t = parse_query("#fuzzy/1( spak )", "#or", analyze)
    inner = t.args[0] if t.name == "#score" else t
    assert isinstance(inner, Op) and inner.name == "#fuzzy" and inner.dist == 1
    t = parse_query("#prefix( wind )", "#or", analyze)
    inner = t.args[0] if t.name == "#score" else t
    assert isinstance(inner, Op) and inner.name == "#prefix"


def test_levenshtein_all_matches_reference():
    from searchengine_ray.operators import _levenshtein_all

    def ref(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    vocab = ["spark", "scan", "sort", "join", "", "a", "sparkly", "park"]
    got = _levenshtein_all("spak", vocab)
    assert got.tolist() == [ref("spak", v) for v in vocab]
    assert _levenshtein_all("x", []).tolist() == []


def test_fuzzy_prefix_match_syn_of_expansion(ray_session, built_index):
    """#fuzzy/#prefix must equal the #SYN over their expansion sets."""
    from searchengine_ray.config import ModelParams
    from searchengine_ray.engine import SearchEngine

    eng = SearchEngine(built_index, ModelParams(model="rankedboolean", top_k=1 << 30))
    vocab = sorted(t for _f, t in eng.index.vocabulary("body"))
    pre = [t for t in vocab if t.startswith("mu")]
    assert pre  # 'mutex' at least
    a = eng.search("q", "#prefix( mu )").to_pandas()
    b = eng.search("q", f"#syn( {' '.join(pre)} )").to_pandas()
    assert a.doc_id.tolist() == b.doc_id.tolist()
    assert (a.score.values == b.score.values).all()

    t = eng.search("q", "#fuzzy/1( mutex )").to_pandas()
    assert len(t) > 0  # at least the exact term matches
    zero = eng.search("q", "#fuzzy/1( qqqqqqq )").to_pandas()
    assert len(zero) == 0


def test_wildcard_regexp_raw_pattern_parse():
    """Raw-pattern ops bypass the analyzer: metacharacters survive, numeric
    patterns are not eaten as weights, regexp dots stay in the pattern,
    and a whitelisted trailing .field suffix is honoured."""
    from searchengine_ray.qryparse import Op, Term, parse_query

    analyze = lambda s: [s.lower()]  # noqa: E731
    t = parse_query("#wildcard( s?a* )", "#or", analyze)
    inner = t.args[0] if t.name == "#score" else t
    assert isinstance(inner, Op) and inner.name == "#wildcard"
    assert isinstance(inner.args[0], Term) and inner.args[0].term == "s?a*"
    t = parse_query("#regexp( .*(ue|ow) )", "#or", analyze)
    inner = t.args[0] if t.name == "#score" else t
    assert inner.name == "#regexp" and inner.args[0].term == ".*(ue|ow)"
    assert inner.args[0].field == "body"
    t = parse_query("#regexp( 123 )", "#or", analyze)
    inner = t.args[0] if t.name == "#score" else t
    assert inner.args[0].term == "123"  # numeric token is the pattern
    t = parse_query("#wildcard( mu*.title )", "#or", analyze)
    inner = t.args[0] if t.name == "#score" else t
    assert inner.args[0].term == "mu*" and inner.args[0].field == "title"
    # lowercasing must not invert case-sensitive escapes: \D stays \D
    # (match non-digit), while literal letters still lower to match the
    # all-lowercase dictionary
    t = parse_query(r"#regexp( \D+X\WY )", "#or", analyze)
    inner = t.args[0] if t.name == "#score" else t
    assert inner.args[0].term == r"\D+x\Wy"


def test_wildcard_regexp_match_syn_of_expansion(ray_session, built_index):
    """#wildcard/#regexp must equal the #SYN over their expansion sets
    (same contract as #prefix/#fuzzy), computed here with Python re."""
    import re

    from searchengine_ray.config import ModelParams
    from searchengine_ray.engine import SearchEngine

    eng = SearchEngine(built_index, ModelParams(model="rankedboolean", top_k=1 << 30))
    vocab = sorted(t for _f, t in eng.index.vocabulary("body"))

    exp = [t for t in vocab if re.fullmatch(r"m.*x", t)]
    assert exp  # 'mutex' at least
    a = eng.search("q", "#wildcard( m*x )").to_pandas()
    b = eng.search("q", f"#syn( {' '.join(exp)} )").to_pandas()
    assert a.doc_id.tolist() == b.doc_id.tolist()
    assert (a.score.values == b.score.values).all()

    exp = [t for t in vocab if re.fullmatch(r"mu.+|.*dex", t)]
    a = eng.search("q", "#regexp( mu.+|.*dex )").to_pandas()
    b = eng.search("q", f"#syn( {' '.join(exp)} )").to_pandas()
    assert a.doc_id.tolist() == b.doc_id.tolist()
    assert (a.score.values == b.score.values).all()

    assert len(eng.search("q", "#wildcard( zzz* )").to_pandas()) == 0


def test_spell_suggest_ranking(ray_session, built_index):
    """Suggestions ranked (dist ASC, df DESC, suggestion ASC), term itself
    excluded, k respected — checked against a brute-force recount."""
    from searchengine_ray.config import ModelParams
    from searchengine_ray.engine import SearchEngine
    from searchengine_ray.operators import _levenshtein_all
    from searchengine_ray.spell import suggest

    eng = SearchEngine(built_index, ModelParams(model="bm25"))
    idx = eng.index
    vocab = sorted(t for _f, t in idx.vocabulary("body"))
    q = "mutx"
    t = suggest(idx, [q], k=4).to_pandas()
    assert len(t) <= 4 and (t.qterm == q).all()
    assert q not in set(t.suggestion)

    d = _levenshtein_all(q, vocab)
    cand = sorted(
        (
            (int(dd), -idx.postings("body", v, need_positions=False).stat_df, v)
            for v, dd in zip(vocab, d)
            if dd <= 2 and v != q
        ),
    )[:4]
    assert t.suggestion.tolist() == [c[2] for c in cand]
    assert t.dist.tolist() == [c[0] for c in cand]
    assert t.df.tolist() == [-c[1] for c in cand]


def test_andnot_optimizer_positional_semantics():
    """#ANDNOT's first SURVIVING arg is the MUST leg. Stopwords vanish at
    analysis before any operator sees them (the reference's documented
    behavior — #NEAR args shift the same way), so `#andnot( the scan )`
    degenerates to the single positive `scan`; a stopword NEGATIVE is a
    no-op filter and the node likewise becomes its positive. What the
    optimizer must never do is promote a lone negative after the POSITIVE
    was emptied post-parse — covered by the empty-positive branch below."""
    # stopword tokens never reach the operator: both degenerate to 'scan'
    for q in ("#andnot( the scan )", "#andnot( scan the )"):
        t = parse(q)
        assert isinstance(t, Op) and t.name == "#score"
        assert t.args[0].term == "scan"
    # both legs real -> node survives with positional args
    t = parse("#andnot( scan sort )")
    assert isinstance(t, Op) and t.name == "#andnot" and len(t.args) == 2
    # post-parse empty positive (an operator that optimizes to None) kills
    # the node instead of promoting the negative
    from searchengine_ray.qryparse import optimize

    node = parse_string("#andnot( #syn( the ) scan )", analyze_query_token)
    assert optimize(node) is None


def test_complete_prefix_ranking(ray_session, built_index):
    """Completions ranked (df DESC, suggestion ASC) within the prefix
    interval; a term equal to the prefix is a valid completion; k
    respected; no-match prefixes emit nothing."""
    from searchengine_ray.config import ModelParams
    from searchengine_ray.engine import SearchEngine
    from searchengine_ray.spell import complete

    eng = SearchEngine(built_index, ModelParams(model="bm25"))
    idx = eng.index
    vocab = sorted(t for _f, t in idx.vocabulary("body"))
    # pick the most productive single-char prefix so k actually cuts
    import collections as _c

    heads = _c.Counter(v[0] for v in vocab)
    p = heads.most_common(1)[0][0]
    t = complete(idx, [p, "zzzq"], k=3).to_pandas()
    assert (t.prefix == p).all()  # no rows for the no-match prefix
    cand = sorted(
        (
            (-idx.postings("body", v, need_positions=False).stat_df, v)
            for v in vocab
            if v.startswith(p)
        ),
    )[:3]
    assert t.suggestion.tolist() == [c[1] for c in cand]
    assert t.df.tolist() == [-c[0] for c in cand]
    # a full term used as its own prefix is returned as a completion
    full = vocab[0]
    t2 = complete(idx, [full], k=2).to_pandas()
    assert full in set(t2.suggestion)
