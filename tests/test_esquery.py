"""ES query-DSL analogs (esquery.py: pinned / terms_set /
match_phrase_prefix) and the rank_feature / distance_feature
function_score functions — semantics edges plus oracle parity of each
gate at sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
DOCS_PQ = f"read_parquet('{SF}/documents.parquet')"


class FakeIndex:
    def __init__(self, vals, valid=None):
        self.vals = np.asarray(vals, dtype=float)
        self.valid = (
            np.ones(len(self.vals), dtype=bool)
            if valid is None
            else np.asarray(valid, dtype=bool)
        )

    def docvalues_for_docs(self, column, docs):
        return self.vals.copy(), self.valid.copy()


DOCS = np.arange(4, dtype=np.int64)


def _fn(vals, valid=None, **spec):
    from searchengine_ray.funcscore import _fn_values

    return _fn_values(FakeIndex(vals, valid), DOCS, {"field": "x", **spec})


def test_rank_feature_saturation_log_sigmoid():
    v = np.array([0.0, 10.0, 100.0, 250.0])
    got = _fn(v, type="rank_feature", function="saturation", pivot=50)
    assert np.array_equal(got, v / (v + 50.0))
    got = _fn(v, type="rank_feature", function="log", scaling_factor=2.0)
    assert np.array_equal(got, np.log(2.0 + v))
    got = _fn(v, type="rank_feature", function="sigmoid", pivot=50,
              exponent=0.6)
    assert np.array_equal(got, v**0.6 / (v**0.6 + 50.0**0.6))
    # boost scales the function value (the ES rank_feature boost)
    b = _fn(v, type="rank_feature", function="saturation", pivot=50,
            boost=3.0)
    assert np.array_equal(b, 3.0 * (v / (v + 50.0)))


def test_rank_feature_missing_and_negative():
    # missing feature -> 0 contribution (the no-match analog) unless a
    # 'missing' fallback is given
    got = _fn(np.array([1.0, 2.0, 3.0, 4.0]),
              valid=[True, False, True, False],
              type="rank_feature", function="saturation", pivot=1)
    assert got[1] == 0.0 and got[3] == 0.0 and got[0] == 0.5
    got = _fn(np.array([1.0, 2.0, 3.0, 4.0]),
              valid=[True, False, True, True],
              type="rank_feature", function="saturation", pivot=1,
              missing=1.0)
    assert got[1] == 0.5
    with pytest.raises(ValueError, match="non-negative"):
        _fn(np.array([1.0, -2.0, 3.0, 4.0]), type="rank_feature",
            function="saturation", pivot=1)
    with pytest.raises(ValueError, match="rank_feature function"):
        _fn(np.ones(4), type="rank_feature", function="swish", pivot=1)


def test_distance_feature_formula_and_missing():
    v = np.array([250.0, 300.0, 400.0, 0.0])
    got = _fn(v, type="distance_feature", origin=300, pivot=50)
    assert np.array_equal(got, 50.0 / (50.0 + np.abs(v - 300.0)))
    assert got[1] == 1.0  # at the origin the boost peaks at 1*boost
    got = _fn(v, valid=[True, True, False, True],
              type="distance_feature", origin=300, pivot=50, boost=2.0)
    assert got[2] == 0.0 and got[1] == 2.0


def _engine(sf_dir=SF):
    from searchengine_ray.gate import engine_for

    return engine_for(sf_dir, "bm25")


def test_pinned_order_and_dedupe(ray_session):
    from searchengine_ray.esquery import pinned_search

    eng = _engine()
    exts = [str(e) for e in eng.index.external_ids(
        np.asarray([7, 123, 42], np.int64))]
    t = pinned_search(eng, "q", "dup spark", exts, k=15).to_pandas()
    assert list(t["doc_id"][:3]) == [7, 123, 42]
    assert list(t["is_pinned"][:3]) == [1, 1, 1]
    assert (t["is_pinned"][3:] == 0).all()
    assert list(t["rn"]) == list(range(1, 16))
    # pinned docs never reappear in the organic section
    assert not set(t["doc_id"][3:]) & {7, 123, 42}
    # repeated pins collapse to the first slot
    t2 = pinned_search(eng, "q", "dup spark", [exts[0], exts[0], exts[1]],
                       k=5).to_pandas()
    assert list(t2["doc_id"][:2]) == [7, 123]
    with pytest.raises(KeyError, match="not in the index docmap"):
        pinned_search(eng, "q", "dup spark", ["nope"], k=5)


def test_pinned_nonmatching_doc_still_pins(ray_session):
    from searchengine_ray.esquery import pinned_search

    eng = _engine()
    organic = eng.search("q", "dup spark")
    odocs = set(organic.column("doc_id").to_pylist())
    nonmatch = next(
        int(d) for d in eng.index.all_doc_ids() if int(d) not in odocs
    )
    ext = str(eng.index.external_ids(np.asarray([nonmatch], np.int64))[0])
    t = pinned_search(eng, "q", "dup spark", [ext], k=5).to_pandas()
    assert t["doc_id"][0] == nonmatch and t["is_pinned"][0] == 1


def test_terms_set_threshold_semantics(ray_session):
    from searchengine_ray.esquery import terms_set_search

    eng = _engine()
    terms = ["dup", "spark", "merge", "hash"]
    t = terms_set_search(eng, "q", terms, "n_chars", msm_divisor=150)
    got = set(t.column("doc_id").to_pylist())
    exp = duckdb.sql(
        f"""WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9_]+'))
                       AS term
              FROM {DOCS_PQ}),
            m AS (SELECT doc_id, count(DISTINCT term) AS nm FROM tok
                  WHERE term IN ('dup','spark','merge','hash')
                  GROUP BY doc_id)
            SELECT m.doc_id FROM m JOIN {DOCS_PQ} d USING (doc_id)
            WHERE m.nm >= greatest(1, d.n_chars // 150)"""
    ).df()
    assert got == set(exp["doc_id"])
    # scores equal the untouched plain disjunction (the msm rule)
    plain = eng.search("q", " ".join(terms))
    pmap = dict(zip(plain.column("doc_id").to_pylist(),
                    plain.column("score").to_pylist()))
    for d, s in zip(t.column("doc_id").to_pylist(),
                    t.column("score_r").to_pylist()):
        assert s == round(pmap[d], 6)
    with pytest.raises(ValueError, match="msm_divisor"):
        terms_set_search(eng, "q", terms, "n_chars", msm_divisor=0)
    with pytest.raises(ValueError, match="must be a single term"):
        terms_set_search(eng, "q", ["#sum( dup spark )"], "n_chars")
    # a #range leaf parses as a bool clause but is not an inverted list
    with pytest.raises(ValueError, match="not a term leaf"):
        terms_set_search(eng, "q", ["#range( n_chars 100 200 )"], "n_chars")


def test_match_phrase_prefix_cap_and_empty(ray_session):
    from searchengine_ray.esquery import match_phrase_prefix

    eng = _engine()
    # cap bites: 3 of the 6 s-terms expand; equals the hand-built query
    t = match_phrase_prefix(eng, "q", "order s", max_expansions=3)
    manual = eng.search("q", "#near/1( order #syn( scan slow small ) )")
    assert t.column("doc_id").to_pylist() == manual.column(
        "doc_id").to_pylist()
    # uncapped: all six expand
    t6 = match_phrase_prefix(eng, "q", "order s", max_expansions=50)
    manual6 = eng.search(
        "q", "#near/1( order #syn( scan slow small sort spark stream ) )")
    assert t6.column("doc_id").to_pylist() == manual6.column(
        "doc_id").to_pylist()
    # no dictionary term with the prefix -> empty, like ES
    assert match_phrase_prefix(eng, "q", "order zzz").num_rows == 0
    # single-token phrase degenerates to the capped prefix disjunction
    t1 = match_phrase_prefix(eng, "q", "sc", max_expansions=50)
    assert t1.num_rows > 0
    with pytest.raises(ValueError, match="survive analysis"):
        match_phrase_prefix(eng, "q", "order the")
    with pytest.raises(ValueError, match="max_expansions"):
        match_phrase_prefix(eng, "q", "order s", max_expansions=0)
    with pytest.raises(ValueError, match="empty phrase"):
        match_phrase_prefix(eng, "q", "   ")


def test_gates_match_oracles(ray_session):
    """Full oracle parity for the five new gates at sf0.001 — the same
    check the driver runs (sorted rows, identical columns)."""
    import __ray_entry__ as entry

    q = entry.queries()
    sql = entry.oracle_sql()
    con = duckdb.connect()
    for tbl in ("documents", "events", "embeddings"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{SF}/{tbl}.parquet')"
        )
    for name in ("se_rank_feature", "se_distance_feature", "se_pinned",
                 "se_terms_set", "se_match_phrase_prefix"):
        got = q[name](SF)
        if hasattr(got, "to_pandas"):
            got = got.to_pandas()
        exp = con.sql(sql[name]).df()
        cols = sorted(got.columns)
        assert cols == sorted(exp.columns), name
        g = got[cols].sort_values(cols).reset_index(drop=True)
        e = exp[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, e, check_dtype=False), name


def test_multi_match_desugars_to_gated_ops(ray_session):
    from searchengine_ray.esquery import multi_match

    eng = _engine()
    best = multi_match(eng, "q", "en dup", ["body", "keywords"],
                       match_type="best_fields", tie_breaker=0.2)
    manual = eng.search(
        "q", "#dismax/20( #sum( en.body dup.body ) "
             "#sum( en.keywords dup.keywords ) )")
    assert best.column("doc_id").to_pylist() == manual.column(
        "doc_id").to_pylist()
    assert best.column("score").to_pylist() == manual.column(
        "score").to_pylist()
    most = multi_match(eng, "q", "en dup", ["body", "keywords"],
                       match_type="most_fields")
    manual2 = eng.search(
        "q", "#sum( en.body en.keywords dup.body dup.keywords )")
    assert most.column("score").to_pylist() == manual2.column(
        "score").to_pylist()
    with pytest.raises(ValueError, match="bm25f"):
        multi_match(eng, "q", "dup", ["body"], match_type="cross_fields")
    with pytest.raises(ValueError, match="tie_breaker"):
        multi_match(eng, "q", "dup", ["body"], tie_breaker=0.123)
    with pytest.raises(ValueError, match="analyzes to nothing"):
        multi_match(eng, "q", "the", ["body"])
    with pytest.raises(ValueError, match="at least one field"):
        multi_match(eng, "q", "dup", [])
    with pytest.raises(ValueError, match="multi_match type"):
        multi_match(eng, "q", "dup", ["body"], match_type="phrase")


def test_collapse_topn_contains_top1(ray_session):
    from searchengine_ray.facets import collapse_top1, collapse_topn

    eng = _engine()
    t = eng.search("q", "dup spark")
    d = t.column("doc_id").to_numpy()
    s = t.column("score").to_numpy()
    one = collapse_top1(eng.index, d, s, field="keywords").to_pandas()
    two = collapse_topn(eng.index, d, s, field="keywords",
                        inner_size=2).to_pandas()
    # rn=1 rows of topn == top1 (same winners per facet)
    first = two[two["rn"] == 1].set_index("facet")
    for _, row in one.iterrows():
        assert first.loc[row["facet"], "doc_id"] == row["doc_id"]
    # per facet: rn=2's score never beats rn=1's
    for f, grp in two.groupby("facet"):
        grp = grp.sort_values("rn")
        assert list(grp["rn"]) == list(range(1, len(grp) + 1))
        assert (grp["score"].diff().dropna() <= 1e-12).all()
    with pytest.raises(ValueError, match="inner_size"):
        collapse_topn(eng.index, d, s, inner_size=0)


def test_sampler_counts_bounded_by_window(ray_session):
    from searchengine_ray.facets import facet_counts, sampler_facets

    eng = _engine()
    t = eng.search("q", "dup spark")
    sampled = sampler_facets(eng, "dup spark", shard_size=100).to_pandas()
    assert sampled["n"].sum() == min(100, t.num_rows)
    full = facet_counts(
        eng.index, t.column("doc_id").to_numpy(), "keywords").to_pandas()
    fm = dict(zip(full["facet"], full["n"]))
    for _, r in sampled.iterrows():
        assert r["n"] <= fm[r["facet"]]
    with pytest.raises(ValueError, match="shard_size"):
        sampler_facets(eng, "dup spark", shard_size=0)


def test_terms_shard_error_semantics(ray_session):
    from searchengine_ray.esaggs import terms_shard_error_agg

    got = terms_shard_error_agg(SF, size=5, n_shards=4).to_pandas()
    assert len(got) == 5
    # reported count never exceeds the true count; bound is non-negative
    true = duckdb.sql(
        f"SELECT user_id, count(*) AS n FROM "
        f"read_parquet('{SF}/events.parquet') GROUP BY 1"
    ).df().set_index("user_id")["n"]
    for _, r in got.iterrows():
        assert r["doc_count"] <= true[r["user_id"]]
        assert r["doc_count_error_upper_bound"] >= 0
        # true count is within reported + bound (the ES guarantee)
        assert true[r["user_id"]] <= (
            r["doc_count"] + r["doc_count_error_upper_bound"]
        )
    # a single shard with a huge size never truncates: exact counts,
    # zero error bound
    exact = terms_shard_error_agg(SF, size=10_000, n_shards=1).to_pandas()
    assert (exact["doc_count_error_upper_bound"] == 0).all()
    assert all(exact.set_index("user_id")["doc_count"] == true[
        exact["user_id"]].values)
    with pytest.raises(ValueError, match="size and n_shards"):
        terms_shard_error_agg(SF, size=0)


def test_new_gates_match_oracles(ray_session):
    import __ray_entry__ as entry

    q = entry.queries()
    sql = entry.oracle_sql()
    con = duckdb.connect()
    for tbl in ("documents", "events", "embeddings"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{SF}/{tbl}.parquet')"
        )
    for name in ("se_multi_match", "se_collapse_inner", "se_sampler_terms",
                 "events_terms_shard_error"):
        got = q[name](SF)
        if hasattr(got, "to_pandas"):
            got = got.to_pandas()
        exp = con.sql(sql[name]).df()
        cols = sorted(got.columns)
        assert cols == sorted(exp.columns), name
        g = got[cols].sort_values(cols).reset_index(drop=True)
        e = exp[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(g, e, check_dtype=False), name


def test_has_child_score_modes(ray_session):
    """score_mode folds vs manual recombination from the child table;
    min/max_children window; guards."""
    from searchengine_ray.esquery import has_child_search

    eng = _engine()
    t = eng.search("q", "dup")
    child = t.to_pandas()
    child["parent"] = [
        str(e).split("/", 1)[0]
        for e in eng.index.external_ids(child["doc_id"].to_numpy())
    ]
    child = child.sort_values("doc_id")
    for mode in ("max", "sum", "avg", "min", "none"):
        got = has_child_search(
            eng, "q", "dup", score_mode=mode, min_children=1
        ).to_pandas().set_index("parent")
        for p, grp in child.groupby("parent"):
            cs = list(grp["score"])
            if mode == "max":
                want = max(cs)
            elif mode == "min":
                want = min(cs)
            elif mode == "none":
                want = 0.0
            else:
                acc = 0.0
                for v in cs:
                    acc += float(v)
                want = acc / len(cs) if mode == "avg" else acc
            assert got.loc[p, "score_r"] == round(want, 6), (mode, p)
            assert got.loc[p, "n_children"] == len(grp)
    # max_children excludes crowded parents
    capped = has_child_search(
        eng, "q", "dup", min_children=1, max_children=1
    ).to_pandas()
    assert (capped["n_children"] == 1).all()
    with pytest.raises(ValueError, match="score_mode"):
        has_child_search(eng, "q", "dup", score_mode="first")
    with pytest.raises(ValueError, match="min_children"):
        has_child_search(eng, "q", "dup", min_children=0)


def test_has_parent_filter_leaves_scores(ray_session):
    from searchengine_ray.esquery import has_parent_search

    eng = _engine()
    t = has_parent_search(eng, "q", "dup", parent_min_children=2).to_pandas()
    plain = eng.search("q", "dup").to_pandas().set_index("doc_id")
    assert len(t) > 0
    for _, r in t.iterrows():
        assert r["score_r"] == round(plain.loc[r["doc_id"], "score"], 6)
    # every surviving doc's parent really has >= 2 matching children
    counts = t.groupby("parent").size()
    assert (counts >= 2).all()
    with pytest.raises(ValueError, match="parent_min_children"):
        has_parent_search(eng, "q", "dup", parent_min_children=0)


def test_matched_queries_metadata(ray_session):
    from searchengine_ray.esquery import matched_queries_search

    eng = _engine()
    t = matched_queries_search(
        eng, "q",
        {"exact": "dup", "phrase": "#near/1( hash join )", "alt": "spark"},
    ).to_pandas()
    # names render sorted; scores equal the plain disjunction (metadata
    # never touches scoring — the ES rule). The equivalent plain query
    # must fold in the SAME sorted-name clause order.
    plain = eng.search(
        "q", "#sum( spark dup #near/1( hash join ) )"
    ).to_pandas().set_index("doc_id")
    for _, r in t.iterrows():
        assert r["matched"] != ""
        assert list(r["matched"].split(",")) == sorted(r["matched"].split(","))
        assert r["score_r"] == round(plain.loc[r["doc_id"], "score"], 6)
    # docs matching only 'dup' report exactly ['exact']
    only_dup = t[t["matched"] == "exact"]
    spark_docs = set(
        eng.search("q", "spark").column("doc_id").to_pylist()
    )
    assert not set(only_dup["doc_id"]) & spark_docs
    with pytest.raises(ValueError, match="at least one"):
        matched_queries_search(eng, "q", {})
    with pytest.raises(ValueError, match="must be a term or derived"):
        matched_queries_search(eng, "q", {"bad": "#range( n_chars 1 2 )"})


def test_runtime_fields_semantics(ray_session):
    """ES runtime_mappings: the computed column behaves like a stored
    doc-values column for #range and function_score; guards on bad
    specs and chaining; stored columns stay reachable."""
    import numpy as np

    from searchengine_ray.config import ModelParams
    from searchengine_ray.engine import SearchEngine
    from searchengine_ray.gate import index_for

    eng = SearchEngine(
        index_for(SF), ModelParams(model="bm25", top_k=1 << 30),
        docvalues_dir=SF,
        runtime_fields={"half_chars": ("n_chars", "floordiv", 2)},
    )
    docs = eng.index.all_doc_ids()[:50]
    half, hv = eng.index.docvalues_for_docs("half_chars", docs)
    full, fv = eng.index.docvalues_for_docs("n_chars", docs)
    assert np.array_equal(half, np.floor_divide(full, 2.0))
    assert np.array_equal(hv, fv)
    # range filter over the runtime field == manual predicate
    in_range = set(
        eng.index.docvalues_docs_in_range("half_chars", 80, 220).tolist()
    )
    alld = eng.index.all_doc_ids()
    av, avv = eng.index.docvalues_for_docs("n_chars", alld)
    want = set(alld[avv & (np.floor_divide(av, 2.0) >= 80)
                    & (np.floor_divide(av, 2.0) <= 220)].tolist())
    assert in_range == want
    with pytest.raises(ValueError, match="spec must be"):
        eng.index.set_runtime_fields({"x": ("n_chars", "pow", 2)})
    eng.index.set_runtime_fields(
        {"a": ("n_chars", "mul", 2), "b": ("a", "add", 1)}
    )
    with pytest.raises(ValueError, match="no chaining"):
        eng.index.docvalues_for_docs("b", docs)
    eng.index.set_runtime_fields({})  # reset for other tests


def test_sliced_scroll_partitions_exactly(ray_session):
    from searchengine_ray.esquery import sliced_scroll

    eng = _engine()
    full = eng.search("q", "dup spark")
    slices = [sliced_scroll(eng, "q", "dup spark", i, 4) for i in range(4)]
    all_docs = [d for s in slices for d in s.column("doc_id").to_pylist()]
    # disjoint and complete
    assert len(all_docs) == len(set(all_docs)) == full.num_rows
    assert set(all_docs) == set(full.column("doc_id").to_pylist())
    # scores untouched
    fmap = dict(zip(full.column("doc_id").to_pylist(),
                    full.column("score").to_pylist()))
    for s in slices:
        for d, sc in zip(s.column("doc_id").to_pylist(),
                         s.column("score_r").to_pylist()):
            assert sc == round(fmap[d], 6)
    # n_slices=1 is the identity slicing
    one = sliced_scroll(eng, "q", "dup spark", 0, 1)
    assert one.num_rows == full.num_rows
    with pytest.raises(ValueError, match="n_slices"):
        sliced_scroll(eng, "q", "dup", 0, 0)
    with pytest.raises(ValueError, match="slice_id"):
        sliced_scroll(eng, "q", "dup", 4, 4)
