"""Randomized as-of / range-join trials against pandas brute-force oracles.

Small synthetic event tables with deliberately nasty shapes: events at the
exact span start (the uint64-underflow edge), shared timestamps across
users, many events per user. Each trial writes a tmp parquet dir and runs
the real Ray pipelines.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, seed: int) -> str:
    rng = np.random.default_rng(seed)
    n = 400
    base = np.datetime64("2024-01-01T00:00:00", "us")
    # cluster timestamps tightly so windows overlap a lot; include t=0
    offs = rng.integers(0, 4 * 3600 * 1_000_000, size=n)
    offs[0] = 0  # an event exactly at the span start
    ts = base + offs.astype("timedelta64[us]")
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": rng.integers(0, 12, size=n).astype(np.int64),
            "event_type": rng.choice(
                ["purchase", "click", "error", "view"], size=n
            ),
            "value": rng.random(n),
            "props": ["{}"] * n,
        }
    )
    d = tmp_path / f"fuzz{seed}"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_range_join_fuzz(ray_session, tmp_path, seed):
    from searchengine_ray.windows import range_join_error_click

    sf = _write_events(tmp_path, seed)
    got = (
        range_join_error_click(sf, window_minutes=30)
        .to_pandas()
        .sort_values(["error_event_id", "click_event_id"])
        .reset_index(drop=True)
    )
    ev = pq.read_table(f"{sf}/events.parquet").to_pandas()
    e = ev[ev.event_type == "error"]
    c = ev[ev.event_type == "click"]
    m = e.merge(c, on="user_id", suffixes=("", "_c"))
    win = pd.Timedelta(minutes=30)
    m = m[(m.ts_c < m.ts) & (m.ts_c >= m.ts - win)]
    want = m.sort_values(["event_id", "event_id_c"]).reset_index(drop=True)
    assert got["error_event_id"].tolist() == want["event_id"].tolist()
    assert got["click_event_id"].tolist() == want["event_id_c"].tolist()


def test_asof_join_click_tie_rule(ray_session, tmp_path):
    """Two clicks by the same user at the SAME microsecond: the engine (and
    the deduped SQL oracle) must pick the max event_id."""
    from searchengine_ray.windows import asof_join_purchase_click

    base = np.datetime64("2024-01-01T00:00:00", "us")
    df = pd.DataFrame(
        {
            "event_id": np.array([0, 1, 2, 3], dtype=np.int64),
            "ts": [base, base, base + np.timedelta64(60, "s"), base],
            "user_id": np.array([7, 7, 7, 7], dtype=np.int64),
            # click ids 0 and 1 tie on ts; purchase id 2 later; a decoy view
            "event_type": ["click", "click", "purchase", "view"],
            "value": [0.0] * 4,
            "props": ["{}"] * 4,
        }
    )
    d = tmp_path / "ties"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(d / "events.parquet"))
    got = asof_join_purchase_click(str(d)).to_pandas()
    assert got["event_id"].tolist() == [2]
    assert got["click_event_id"].tolist() == [1]  # max event_id wins the tie


@pytest.mark.parametrize("seed", [4, 5])
def test_asof_join_fuzz(ray_session, tmp_path, seed):
    from searchengine_ray.windows import asof_join_purchase_click

    sf = _write_events(tmp_path, seed)
    got = (
        asof_join_purchase_click(sf)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ev = pq.read_table(f"{sf}/events.parquet").to_pandas()
    p = ev[ev.event_type == "purchase"].sort_values("ts", kind="mergesort")
    c = ev[ev.event_type == "click"].sort_values("ts", kind="mergesort")
    want = pd.merge_asof(
        p, c, on="ts", by="user_id", suffixes=("", "_c"),
        allow_exact_matches=False,
    ).dropna(subset=["event_id_c"])
    want = want.sort_values("event_id").reset_index(drop=True)
    assert got["event_id"].tolist() == want["event_id"].tolist()
    # note: among equal-ts clicks our rule is max event_id; the random us
    # timestamps make exact click-ts ties across these seeds improbable,
    # and merge_asof picks the latest-sorted row which coincides then
    assert got["click_event_id"].tolist() == (
        want["event_id_c"].astype(int).tolist()
    )


def test_range_join_long_span_and_negative_users(ray_session, tmp_path):
    """Regression (session review findings): the former fixed 42/22-bit
    packed key rejected logs spanning > ~51 days and silently WRAPPED
    negative user_ids under uint64. The adaptive dense-user-code layout
    must handle a 90-day span with negative ids and match brute force."""
    from searchengine_ray.windows import range_join_error_click

    rng = np.random.default_rng(9)
    n = 300
    base = np.datetime64("2024-01-01T00:00:00", "us")
    offs = rng.integers(0, 90 * 86_400 * 1_000_000, size=n)  # 90 days
    offs[0] = 0
    ts = base + offs.astype("timedelta64[us]")
    users = rng.integers(-6, 6, size=n).astype(np.int64)  # incl. negatives
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": ts,
        "user_id": users,
        "event_type": rng.choice(["click", "error"], size=n),
        "value": rng.random(n),
        "props": ["{}"] * n,
    })
    d = tmp_path / "long"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(d / "events.parquet"))
    got = (
        range_join_error_click(str(d), window_minutes=60 * 24)
        .to_pandas()
        .sort_values(["error_event_id", "click_event_id"])
        .reset_index(drop=True)
    )
    win = np.int64(60 * 24 * 60 * 1_000_000)
    e = df[df.event_type == "error"]
    c = df[df.event_type == "click"]
    m = e.merge(c, on="user_id", suffixes=("", "_c"))
    m = m[(m.ts_c < m.ts) & (m.ts_c >= m.ts - pd.Timedelta(int(win), "us"))]
    want = pd.DataFrame({
        "error_event_id": m.event_id.values,
        "click_event_id": m.event_id_c.values,
        "user_id": m.user_id.values,
        "gap_us": (m.ts.values - m.ts_c.values).astype("timedelta64[us]")
                  .astype(np.int64),
    }).sort_values(["error_event_id", "click_event_id"]).reset_index(drop=True)
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pm2_empty_intents_degenerates_to_original_order(ray_session):
    """Regression (session review finding): pm2 with no intents raised
    KeyError: None; it must emit the original rank order truncated with
    zero PM2 scores (PM2 scores only intent coverage), like xquad's
    degenerate behavior."""
    from searchengine_ray.diversity import DiversityConfig, pm2, xquad

    orig = [(1, 3.0), (2, 2.0), (3, 1.0)]
    cfg = DiversityConfig(algorithm="pm2", max_result_ranking_length=2)
    got = pm2(orig, {}, cfg)
    assert [d for d, _ in got] == [1, 2]
    assert all(s == 0.0 for _, s in got)
    # xquad on the same input keeps working (pre-existing behavior)
    xq = xquad(orig, {}, DiversityConfig(algorithm="xquad",
                                         max_result_ranking_length=2))
    assert [d for d, _ in xq] == [1, 2]
