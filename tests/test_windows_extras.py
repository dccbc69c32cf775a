"""ES pipeline aggregations over the hourly date histogram
(windows.hourly_pipeline_aggs): oracle parity and the cumulative /
derivative invariants."""

import duckdb
import numpy as np


SF = "/root/testdata/sf0.001"


def test_pipeline_aggs_match_oracle(ray_session):
    from searchengine_ray.windows import hourly_pipeline_aggs

    got = hourly_pipeline_aggs(SF).to_pandas()
    exp = duckdb.sql(
        f"""WITH h AS (SELECT date_trunc('hour', ts) AS window_start,
                              count(*) AS n
                       FROM read_parquet('{SF}/events.parquet')
                       GROUP BY 1)
            SELECT window_start, n,
                   CAST(sum(n) OVER (ORDER BY window_start) AS BIGINT)
                     AS cum_n,
                   CAST(coalesce(n - lag(n) OVER (ORDER BY window_start),
                                 0) AS BIGINT) AS diff_n
            FROM h ORDER BY window_start"""
    ).df()
    assert got.window_start.tolist() == exp.window_start.tolist()
    assert got.n.tolist() == exp.n.tolist()
    assert got.cum_n.tolist() == exp.cum_n.tolist()
    assert got.diff_n.tolist() == exp.diff_n.tolist()


def test_pipeline_aggs_invariants(ray_session):
    """cum is monotone and ends at the total event count; diff telescopes
    back to n; first diff is the coalesced 0."""
    import pyarrow.parquet as pq

    from searchengine_ray.windows import hourly_pipeline_aggs

    t = hourly_pipeline_aggs(SF).to_pandas()
    total = pq.ParquetFile(f"{SF}/events.parquet").metadata.num_rows
    assert t.cum_n.iloc[-1] == total == t.n.sum()
    assert (np.diff(t.cum_n) == t.n.to_numpy()[1:]).all()
    assert t.diff_n.iloc[0] == 0
    assert (
        t.diff_n.to_numpy()[1:]
        == t.n.to_numpy()[1:] - t.n.to_numpy()[:-1]
    ).all()


def test_kmv_exact_below_k_and_accuracy(ray_session):
    """Windows with < k distinct users report the EXACT count; larger
    windows estimate within the sketch's error envelope."""
    import duckdb
    import numpy as np

    from searchengine_ray.sketch import kmv_distinct_users

    sf = "/root/testdata/sf0.001"
    got = kmv_distinct_users(sf, k=64).to_pandas()
    exact = duckdb.sql(
        f"""SELECT date_trunc('hour', ts) AS window_start,
               count(DISTINCT user_id) AS n
            FROM read_parquet('{sf}/events.parquet') GROUP BY 1"""
    ).df().set_index("window_start").n
    assert len(got) == len(exact)
    for _, r in got.iterrows():
        ex = int(exact.loc[r.window_start])
        if ex < 64:
            assert int(r.n_users_approx) == ex
        else:
            assert abs(r.n_users_approx - ex) <= max(3, 0.3 * ex)


def test_kmv_batch_size_invariant(ray_session):
    import ray.data

    from searchengine_ray.sketch import kmv_distinct_users

    sf = "/root/testdata/sf0.001"
    base = kmv_distinct_users(sf).to_pandas()
    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 8 * 1024
        small = kmv_distinct_users(sf).to_pandas()
    finally:
        ctx.target_max_block_size = old
    assert base.equals(small)


def test_kmv_k_guard(ray_session):
    import pytest as _pytest

    from searchengine_ray.sketch import kmv_distinct_users

    with _pytest.raises(ValueError, match="k >= 2"):
        kmv_distinct_users("/root/testdata/sf0.001", k=1)


def test_funnel_stepwise_vs_horizon(ray_session):
    """Per-step windows are strictly tighter than the 24h-horizon mode
    at W=1h, and the stepwise counts match a brute per-user replay."""
    import duckdb
    import numpy as np

    from searchengine_ray.windows import (
        FUNNEL_STEP_WINDOW_US, funnel_counts,
    )

    sf = "/root/testdata/sf0.001"
    base = funnel_counts(sf).to_pandas()
    step = funnel_counts(
        sf, per_step_window_us=FUNNEL_STEP_WINDOW_US
    ).to_pandas()
    assert (step.users <= base.users).all()
    assert (step.users.diff().fillna(0) <= 0).all()  # non-increasing
    ev = duckdb.sql(
        f"""SELECT user_id, event_type, epoch_us(ts) AS t
            FROM read_parquet('{sf}/events.parquet')
            WHERE event_type IN ('view','click','purchase')
            ORDER BY user_id, t"""
    ).df()
    W = FUNNEL_STEP_WINDOW_US
    counts = [0, 0, 0]
    for _, g in ev.groupby("user_id"):
        prev = None
        for i, s in enumerate(("view", "click", "purchase")):
            ts = g[g.event_type == s].t.to_numpy()
            if prev is None:
                cand = ts
            else:
                cand = ts[(ts > prev) & (ts <= prev + W)]
            if len(cand) == 0:
                break
            prev = int(cand.min())
            counts[i] += 1
    assert list(step.users) == counts


def test_dau_wau_brute_and_invariants(ray_session):
    import duckdb

    from searchengine_ray.windows import dau_wau

    sf = "/root/testdata/sf0.001"
    got = dau_wau(sf).to_pandas()
    exp = duckdb.sql(
        f"""WITH p AS (SELECT DISTINCT user_id,
              CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
            FROM read_parquet('{sf}/events.parquet')),
        days AS (SELECT DISTINCT day FROM p),
        dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
                FROM p GROUP BY day),
        w AS (SELECT d.day, CAST(count(DISTINCT p.user_id) AS BIGINT)
                AS wau FROM days d
              JOIN p ON p.day BETWEEN d.day - 6 AND d.day GROUP BY d.day)
        SELECT d.day AS epoch_day, dau.dau, w.wau FROM days d
        JOIN dau ON dau.day = d.day JOIN w ON w.day = d.day
        ORDER BY epoch_day"""
    ).df()
    assert got.epoch_day.tolist() == exp.epoch_day.tolist()
    assert got.dau.tolist() == exp.dau.tolist()
    assert got.wau.tolist() == exp.wau.tolist()
    assert (got.wau >= got.dau).all()


def test_dau_wau_window_guard(ray_session):
    import pytest as _pytest

    from searchengine_ray.windows import dau_wau

    with _pytest.raises(ValueError, match="window_days"):
        dau_wau("/root/testdata/sf0.001", window_days=0)
