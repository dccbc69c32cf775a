"""simple_query_string: parser ASTs/precedence/errors, evaluator
semantics (membership algebra, stopword pruning, prefix leaf), and
equivalence with bool_search on the flat subset."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _parse(s, **kw):
    from searchengine_ray.qryparse import parse_simple_query

    return parse_simple_query(s, **kw)


def test_parser_precedence_not_and_or():
    # NOT > AND > OR; whitespace = default op (and)
    assert _parse("a b | c") == (
        "or",
        [("and", [("leaf", "a"), ("leaf", "b")]), ("leaf", "c")],
    )
    assert _parse("-a + b") == (
        "and",
        [("not", ("leaf", "a")), ("leaf", "b")],
    )


def test_parser_default_or_flattens_whitespace():
    assert _parse("a b | c", default_operator="or") == (
        "or",
        [("leaf", "a"), ("leaf", "b"), ("leaf", "c")],
    )


def test_parser_phrase_slop_and_prefix():
    assert _parse('"x y"~2') == ("leaf", "#near/3( x y )")
    assert _parse('"x y"') == ("leaf", "#near/1( x y )")
    assert _parse('"solo"') == ("leaf", "solo")
    assert _parse("pre*") == ("leaf", "#prefix( pre )")


def test_parser_groups():
    assert _parse("a + (b | c)") == (
        "and",
        [("leaf", "a"), ("or", [("leaf", "b"), ("leaf", "c")])],
    )


@pytest.mark.parametrize(
    "bad", ['"unclosed', '""', "a + (b | c", "a +", '"x y"~', "a | | b"]
)
def test_parser_errors(bad):
    from searchengine_ray.qryparse import QuerySyntaxError

    with pytest.raises(QuerySyntaxError):
        _parse(bad)


def _engine(sf):
    from searchengine_ray.gate import engine_for

    return engine_for(sf, "bm25")


def test_sqs_equals_bool_search_flat(ray_session):
    """On the flat must/should/must_not subset the two APIs agree
    bitwise (same scoring tree, same membership)."""
    eng = _engine(SF)
    a = eng.simple_query_string("q", "dup + (spark | merge) + -hash")
    b = eng.bool_search(
        "q", must=["dup"], should=["spark", "merge"], must_not=["hash"],
        minimum_should_match=1,
    )
    assert a.column("doc_id").to_pylist() == b.column("doc_id").to_pylist()
    assert a.column("score").to_pylist() == b.column("score").to_pylist()


def test_sqs_membership_algebra(ray_session):
    """OR-group membership: every hit matches the phrase AND at least
    one of spark|merge AND not dup."""
    import duckdb

    eng = _engine(SF)
    t = eng.simple_query_string(
        "q", '"fast scan" + (spark | merge) + -dup'
    ).to_pandas()
    tok = (
        "SELECT doc_id, unnest(regexp_extract_all(lower(text), "
        "'[a-z0-9_]+')) AS term, unnest(range(len(regexp_extract_all("
        f"lower(text), '[a-z0-9_]+')))) AS pos FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    exp = duckdb.sql(
        f"""WITH tok AS ({tok}),
        near AS (SELECT DISTINCT a.doc_id FROM tok a JOIN tok b
                 ON a.doc_id=b.doc_id AND b.pos=a.pos+1
                 WHERE a.term='fast' AND b.term='scan')
        SELECT doc_id FROM near
        WHERE doc_id IN (SELECT doc_id FROM tok
                         WHERE term IN ('spark','merge'))
          AND doc_id NOT IN (SELECT doc_id FROM tok WHERE term='dup')
        """
    ).df()
    assert sorted(t.doc_id) == sorted(exp.doc_id)


def test_sqs_stopword_clause_prunes(ray_session):
    """An all-stopword clause drops like the reference optimizer's
    empty-drop: AND/OR siblings survive, scores unchanged."""
    eng = _engine(SF)
    a = eng.simple_query_string("q", "dup + the")
    b = eng.simple_query_string("q", "dup")
    assert a.column("doc_id").to_pylist() == b.column("doc_id").to_pylist()
    assert a.column("score").to_pylist() == b.column("score").to_pylist()


def test_sqs_prefix_leaf_matches_explicit(ray_session):
    eng = _engine(SF)
    a = eng.simple_query_string("q", "s* + dup")
    b = eng.bool_search("q", must=["#prefix( s )", "dup"])
    assert a.column("doc_id").to_pylist() == b.column("doc_id").to_pylist()
    assert a.column("score").to_pylist() == b.column("score").to_pylist()


def test_sqs_unbounded_not_raises(ray_session):
    eng = _engine(SF)
    with pytest.raises(ValueError, match="positive"):
        eng.simple_query_string("q", "-dup")
    with pytest.raises(ValueError, match="NOT|positive"):
        eng.simple_query_string("q", "dup | -hash")
    with pytest.raises(ValueError, match="dropped"):
        eng.simple_query_string("q", "the + of")


def test_sqs_randomized_membership_fuzz(ray_session):
    """150 random grammar-generated queries: the engine's MEMBERSHIP
    equals a brute set-algebra evaluation of the parsed AST over
    per-leaf match sets (scores are covered by the bool_search
    bitwise-equality test above, not re-checked here)."""
    import random

    from searchengine_ray.qryparse import parse_simple_query

    rng = random.Random(11)
    vocab = ["dup", "spark", "merge", "hash", "join", "scan", "sort",
             "fast", "slow", "table"]
    from searchengine_ray.gate import engine_for

    eng = _engine(SF)
    ub = engine_for(SF, "unrankedboolean")  # membership semantics:
    # the BM25 searcher prunes zero-score (clamped-idf) docs, the
    # boolean one returns the raw inverted-list membership

    def leaf_docs(clause):
        t = ub.search("q", clause)
        return set(t.column("doc_id").to_pylist())

    cache = {}

    def docs_of(clause):
        if clause not in cache:
            cache[clause] = leaf_docs(clause)
        return cache[clause]

    def brute(node):
        kind = node[0]
        if kind == "leaf":
            return docs_of(node[1])
        if kind == "or":
            out = set()
            for c in node[1]:
                out |= brute(c)
            return out
        # and: positives intersect, negations subtract
        pos = [c for c in node[1] if c[0] != "not"]
        neg = [c[1] for c in node[1] if c[0] == "not"]
        cur = set(brute(pos[0]))  # copy: &=/-= must not mutate the cache
        for c in pos[1:]:
            cur &= brute(c)
        for c in neg:
            cur -= brute(c)
        return cur

    def gen(depth):
        r = rng.random()
        if depth >= 2 or r < 0.45:
            w = rng.choice(vocab)
            if rng.random() < 0.15:
                return f'"{w} {rng.choice(vocab)}"'
            return w
        if r < 0.7:
            return f"{gen(depth + 1)} + {gen(depth + 1)}"
        if r < 0.85:
            return f"{gen(depth + 1)} | {gen(depth + 1)}"
        return f"({gen(depth + 1)} + -{rng.choice(vocab)})"

    checked = 0
    for _ in range(150):
        q = gen(0)
        ast = parse_simple_query(q)
        try:
            got = eng.simple_query_string("q", q)
        except ValueError:
            continue  # unbounded-NOT shapes are allowed to raise
        exp = brute(ast)
        assert set(got.column("doc_id").to_pylist()) == exp, q
        checked += 1
    assert checked >= 100  # the grammar mostly generates legal shapes
