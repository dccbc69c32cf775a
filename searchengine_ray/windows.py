"""Stream-shaped operators over the ordered `events` table.

Ray Data has no event-time windows; per the Ray guide we treat events as a
partitioned log: tumbling windows are a `map_batches` timestamp-truncate +
groupby aggregate, sessionization is `groupby(user).map_groups` over the
ts-sorted group (the ordering assumption: each group is sorted in-group
before gap detection — no cross-group ordering is needed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_counts(sf_dir: str, unit: str = "hour"):
    """Per (event_type, window): count + value total, tumbling calendar
    windows. Returns (event_type, window_start, n_events, sum_value_cents).

    Values are rounded to cents PER EVENT then summed as integers, so the
    aggregate is order-independent and bit-exact against the SQL oracle
    (a float Sum's result depends on accumulation order)."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def trunc(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t.column("value"), 100.0), round_mode="half_towards_infinity"), pa.int64()
        )
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "window_start": pc.floor_temporal(t.column("ts"), unit=unit),
                "cents": cents,
            }
        )

    return (
        ds.map_batches(trunc, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(
            Count(alias_name="n_events"), Sum("cents", alias_name="sum_value_cents")
        )
    )


def sessionize(sf_dir: str, gap_minutes: int = 30):
    """Per user: session count + max session size, sessions split on
    inactivity gaps > ``gap_minutes``. Returns (user_id, n_sessions,
    max_session_events)."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["ts"].to_numpy())
        if len(ts) == 0:
            return pd.DataFrame(
                {"user_id": [], "n_sessions": [], "max_session_events": []}
            )
        new_sess = np.ones(len(ts), dtype=bool)
        new_sess[1:] = (ts[1:] - ts[:-1]) > gap
        sess_id = np.cumsum(new_sess)
        sizes = np.bincount(sess_id)[1:]
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_sessions": [int(sess_id[-1])],
                "max_session_events": [int(sizes.max())],
            }
        )

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")
