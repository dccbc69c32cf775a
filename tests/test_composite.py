"""Composite aggregation (composite.py, ES composite-agg analog): the
tiling invariant (successive after-key pages cover every bucket exactly
once, in order), first-page/no-cursor behavior, cursor arity guard, and
oracle parity at sf0.001."""

import duckdb
import pytest


SF = "/root/testdata/sf0.001"


def _all_buckets():
    return duckdb.sql(
        f"""SELECT lang, source, count(*) AS doc_count,
                   CAST(sum(n_chars) AS BIGINT) AS sum_n_chars
            FROM read_parquet('{SF}/documents.parquet')
            GROUP BY lang, source ORDER BY lang, source"""
    ).df()


def test_pages_tile_all_buckets(ray_session):
    """Paging with after = last key of the previous page walks EVERY
    bucket exactly once, in (lang, source) order — no overlap, no gap,
    counts exact."""
    from searchengine_ray.composite import composite_agg

    exp = _all_buckets()
    got_rows = []
    after = None
    for _ in range(1000):  # bounded walk
        page = composite_agg(SF, size=7, after=after).to_pandas()
        if page.empty:
            break
        got_rows.append(page)
        after = (page.lang.iloc[-1], page.source.iloc[-1])
    else:
        pytest.fail("pagination did not terminate")
    import pandas as pd

    got = pd.concat(got_rows, ignore_index=True)
    assert got.lang.tolist() == exp.lang.tolist()
    assert got.source.tolist() == exp.source.tolist()
    assert got.doc_count.tolist() == exp.doc_count.tolist()
    assert got.sum_n_chars.tolist() == exp.sum_n_chars.tolist()


def test_first_page_is_prefix(ray_session):
    from searchengine_ray.composite import composite_agg

    exp = _all_buckets().head(5)
    got = composite_agg(SF, size=5).to_pandas()
    assert got.lang.tolist() == exp.lang.tolist()
    assert got.source.tolist() == exp.source.tolist()
    assert got.doc_count.tolist() == exp.doc_count.tolist()


def test_after_cursor_is_strict(ray_session):
    """The after bucket itself is excluded (strictly-greater semantics)."""
    from searchengine_ray.composite import composite_agg

    exp = _all_buckets()
    first = (exp.lang.iloc[0], exp.source.iloc[0])
    got = composite_agg(SF, size=3, after=first).to_pandas()
    assert (got.lang.iloc[0], got.source.iloc[0]) == (
        exp.lang.iloc[1],
        exp.source.iloc[1],
    )


def test_after_arity_guard(ray_session):
    from searchengine_ray.composite import composite_agg

    with pytest.raises(ValueError, match="arity"):
        composite_agg(SF, after=("en",))


def test_past_the_end_page_is_empty(ray_session):
    from searchengine_ray.composite import composite_agg

    exp = _all_buckets()
    last = (exp.lang.iloc[-1], exp.source.iloc[-1])
    got = composite_agg(SF, size=5, after=last)
    assert got.num_rows == 0


def test_top_hits_matches_oracle(ray_session):
    """Per-lang top-3 by (n_chars DESC, doc_id ASC) == the window-rank
    SQL, including cross-batch ties (n_chars collides heavily)."""
    from searchengine_ray.composite import top_hits

    got = top_hits(SF, bucket="lang", sort_col="n_chars", k=3).to_pandas()
    exp = duckdb.sql(
        f"""SELECT lang, doc_id, n_chars, rnk FROM (
              SELECT lang, doc_id, n_chars,
                     CAST(row_number() OVER (
                       PARTITION BY lang ORDER BY n_chars DESC, doc_id
                     ) AS BIGINT) AS rnk
              FROM read_parquet('{SF}/documents.parquet')) t
            WHERE rnk <= 3 ORDER BY lang, rnk"""
    ).df()
    assert got.lang.tolist() == exp.lang.tolist()
    assert got.doc_id.tolist() == exp.doc_id.tolist()
    assert got.rnk.tolist() == exp.rnk.tolist()
    assert got.n_chars.tolist() == exp.n_chars.tolist()


def test_group_topk_tie_break(ray_session):
    """Planted total tie: top-k must be the lowest doc_ids per bucket."""
    import pyarrow as pa

    from searchengine_ray.composite import _group_topk

    t = pa.table(
        {
            "lang": pa.array(["a"] * 5 + ["b"] * 4),
            "doc_id": pa.array([9, 3, 7, 1, 5, 8, 2, 6, 4], pa.int64()),
            "n_chars": pa.array([10] * 9, pa.int64()),
        }
    )
    out = _group_topk(t, "lang", "n_chars", 2).to_pandas()
    assert sorted(out[out.lang == "a"].doc_id) == [1, 3]
    assert sorted(out[out.lang == "b"].doc_id) == [2, 4]


def test_extended_stats_matches_oracle(ray_session):
    """Exact-integer partials + derived avg/variance == the SQL, column
    for column (the integer columns are hash-exact by construction; the
    doubles share the identical expression)."""
    from searchengine_ray.composite import extended_stats

    got = extended_stats(SF).to_pandas()
    exp = duckdb.sql(
        f"""SELECT lang, count(*) AS "count",
                   CAST(sum(n_chars) AS BIGINT) AS "sum",
                   min(n_chars) AS "min", max(n_chars) AS "max",
                   CAST(sum(n_chars*n_chars) AS BIGINT) AS sum_sq,
                   round(CAST(sum(n_chars) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) AS avg_r,
                   round((CAST(sum(n_chars*n_chars) AS DOUBLE)
                          - (CAST(sum(n_chars) AS DOUBLE)
                             * CAST(sum(n_chars) AS DOUBLE))
                            / CAST(count(*) AS DOUBLE))
                         / CAST(count(*) AS DOUBLE), 6) AS variance_r
            FROM read_parquet('{SF}/documents.parquet')
            GROUP BY lang ORDER BY lang"""
    ).df()
    for col in ("lang", "count", "sum", "min", "max", "sum_sq",
                "avg_r", "variance_r"):
        assert got[col].tolist() == exp[col].tolist(), col
