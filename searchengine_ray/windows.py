"""Stream-shaped operators over the ordered `events` table.

Ray Data has no event-time windows; per the Ray guide we treat events as a
partitioned log: tumbling windows are a `map_batches` timestamp-truncate +
groupby aggregate, sessionization hash-partitions users into input-scaled buckets
(``partitioning.partition_count``: parquet-footer bytes / target bucket
size, floor 64) and gap-detects every user in a partition vectorized after
an in-partition (user, ts) sort — no cross-partition ordering is needed,
the Ray dispatch count stays bounded, and a bucket fits one worker at any
input size.
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


def hopping_counts(
    sf_dir: str, window_minutes: int = 60, hop_minutes: int = 30
):
    """Hopping (sliding) windows: each event lands in
    ``window/hop`` overlapping windows; per (event_type, window_start):
    count + integer-cent value total. Flat-map duplication inside
    ``map_batches`` (vectorized repeat) then one groupby aggregate — the
    streaming-window analog Ray Data lacks natively.
    """
    import ray.data
    from ray.data.aggregate import Count, Sum

    if window_minutes % hop_minutes != 0:
        raise ValueError(
            f"window ({window_minutes}m) must be a multiple of the hop "
            f"({hop_minutes}m)"
        )
    k = window_minutes // hop_minutes
    hop = np.timedelta64(hop_minutes * 60, "s")

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def explode(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(
                pc.multiply(t.column("value"), 100.0),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ).to_numpy()
        # hop-aligned truncation, then k backward-shifted window starts
        ts = t.column("ts").to_numpy().astype("datetime64[us]")
        base = (
            (ts.astype("datetime64[s]").astype(np.int64) // (hop_minutes * 60))
            * (hop_minutes * 60)
        ).astype("datetime64[s]").astype("datetime64[us]")
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        starts = np.concatenate(
            [base - np.uint64(i) * hop for i in range(k)]
        )
        return pa.table(
            {
                "event_type": pa.array(np.tile(et, k)),
                "window_start": pa.array(starts.astype("datetime64[us]")),
                "cents": pa.array(np.tile(cents, k), type=pa.int64()),
            }
        )

    return (
        ds.map_batches(explode, batch_format="pyarrow")
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

    from .partitioning import append_hash_bucket, partition_count

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    gap = np.timedelta64(gap_minutes * 60, "s")

    # one call per HASH PARTITION of the user space, all users inside it
    # vectorized — per-user map_groups would pay Ray's per-group dispatch
    # O(distinct users) times, which dominates at web scale. The bucket
    # count scales with input bytes (footer-only) so a bucket fits a worker.
    nparts = partition_count(f"{sf_dir}/events.parquet", ("user_id", "ts"))

    def add_ku(t: pa.Table) -> pa.Table:
        return append_hash_bucket(t, "user_id", nparts)

    def per_partition(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_sessions": pa.array([], pa.int64()),
                "max_session_events": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("user_id", "ascending"), ("ts", "ascending")])
        u = t.column("user_id").to_numpy()
        ts = t.column("ts").to_numpy()
        new_user = np.empty(len(u), dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        new_sess = new_user.copy()
        new_sess[1:] |= (ts[1:] - ts[:-1]) > gap
        sess_starts = np.flatnonzero(new_sess)
        sizes = np.diff(np.append(sess_starts, len(u)))
        user_starts = np.flatnonzero(new_user)
        # session index owned by each user's first session; sessions are
        # contiguous per user, so counts/maxes are reduceat slices
        sess_of = np.cumsum(new_sess) - 1
        s0 = sess_of[user_starts]
        n_sessions = np.diff(np.append(s0, len(sess_starts)))
        max_size = np.maximum.reduceat(sizes, s0)
        return pa.table(
            {
                "user_id": pa.array(u[user_starts], type=pa.int64()),
                "n_sessions": pa.array(n_sessions, type=pa.int64()),
                "max_session_events": pa.array(max_size, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(add_ku, batch_format="pyarrow")
        .groupby("ku")
        .map_groups(per_partition, batch_format="pyarrow")
    )


def asof_join_purchase_click(sf_dir: str):
    """As-of join, the classic event-stream operator Ray Data lacks: each
    'purchase' event joins to the SAME USER's most recent 'click' with a
    STRICTLY earlier timestamp (inner — unmatched purchases drop).

    Shape: hash-partition users into input-scaled buckets; in each, one
    (user, ts, event_id) sort + a running maximum over click row positions
    gives every row its as-of match in O(n) — per-group dispatch stays
    bounded regardless of user count. The strict-inequality semantics are
    handled exactly (equal-timestamp runs look up the running maximum just
    before their run starts). Returns
    (event_id, user_id, click_event_id, gap_us).
    """
    import ray.data

    from .partitioning import append_hash_bucket, partition_count

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    # input-scaled bucket count (footer bytes of the carried columns; the
    # type filter keeps ~2 of the event types, folded in as selectivity)
    nparts = partition_count(
        f"{sf_dir}/events.parquet",
        ("event_id", "ts", "user_id", "event_type"),
        selectivity=0.5,
    )

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t.column("event_type"),
            value_set=pa.array(["purchase", "click"]),
        )
        t = t.filter(keep)
        return append_hash_bucket(t, "user_id", nparts)

    def asof_partition(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "click_event_id": pa.array([], pa.int64()),
                "gap_us": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        t = t.sort_by(
            [
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ]
        )
        u = t.column("user_id").to_numpy()
        ts = t.column("ts").to_numpy()
        eid = t.column("event_id").to_numpy()
        is_click = pc.equal(t.column("event_type"), "click").to_numpy(
            zero_copy_only=False
        )
        n = len(u)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        user_start = np.repeat(
            np.flatnonzero(new_user),
            np.diff(np.append(np.flatnonzero(new_user), n)),
        )
        # last click position at-or-before each row (in sort order)
        acc = np.maximum.accumulate(
            np.where(is_click, np.arange(n), -1)
        )
        # strict ts inequality: look up acc just BEFORE this (user, ts) run
        new_run = new_user.copy()
        new_run[1:] |= ts[1:] != ts[:-1]
        run_start = np.repeat(
            np.flatnonzero(new_run),
            np.diff(np.append(np.flatnonzero(new_run), n)),
        )
        prev = run_start - 1
        cand = np.where(prev >= 0, acc[np.clip(prev, 0, None)], -1)
        is_purchase = ~is_click
        ok = is_purchase & (cand >= 0) & (cand >= user_start)
        rows = np.flatnonzero(ok)
        c = cand[rows]
        gap = (ts[rows] - ts[c]).astype("timedelta64[us]").astype(np.int64)
        return pa.table(
            {
                "event_id": pa.array(eid[rows], type=pa.int64()),
                "user_id": pa.array(u[rows], type=pa.int64()),
                "click_event_id": pa.array(eid[c], type=pa.int64()),
                "gap_us": pa.array(gap, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("ku")
        .map_groups(asof_partition, batch_format="pyarrow")
    )


def range_join_error_click(sf_dir: str, window_minutes: int = 60):
    """Range join, the interval cousin of the as-of join: every 'error'
    event pairs with ALL of the same user's 'click' events in the
    preceding ``window_minutes`` (strictly earlier, within the window).

    Shape: input-scaled user hash partitions; per partition clicks sort by
    a packed (user, relative-ts) uint64 key, each error binary-searches its
    window bounds (two vectorized searchsorted calls), and pair expansion
    is the standard repeat+range gather — no per-row Python. Returns
    (error_event_id, click_event_id, user_id, gap_us).

    Equal-timestamp clicks both emit (the window is a set, not a pick);
    the strict upper bound excludes clicks at exactly the error's ts.
    """
    import ray.data

    win = np.int64(window_minutes * 60 * 1_000_000)  # us

    from .partitioning import append_hash_bucket, partition_count

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    # input-scaled buckets; expansion > 1 because each error fans out to
    # every in-window click downstream of the shuffle
    nparts = partition_count(
        f"{sf_dir}/events.parquet",
        ("event_id", "ts", "user_id", "event_type"),
        selectivity=0.5,
        expansion=2.0,
    )

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t.column("event_type"), value_set=pa.array(["error", "click"])
        )
        t = t.filter(keep)
        return append_hash_bucket(t, "user_id", nparts)

    def join_partition(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "error_event_id": pa.array([], pa.int64()),
                "click_event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "gap_us": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        u = t.column("user_id").to_numpy()
        ts = t.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = t.column("event_id").to_numpy()
        is_click = pc.equal(t.column("event_type"), "click").to_numpy(
            zero_copy_only=False
        )
        rel = ts - ts.min()
        # pack (user, rel) into one uint64 sort key with an ADAPTIVE
        # layout: users remap to dense per-partition codes (np.unique),
        # so arbitrary — including negative — user_ids never overflow or
        # wrap, and the span field takes exactly the bits it needs. The
        # loud guard now only fires when bits(users-in-bucket) +
        # bits(span-µs) > 63, i.e. millions of co-bucketed users AND a
        # multi-decade log simultaneously.
        uniq_u, uinv = np.unique(u, return_inverse=True)
        shift = np.uint64(int(max(int(rel.max()), 1)).bit_length())
        if (len(uniq_u) - 1).bit_length() + int(shift) > 63:
            raise ValueError(
                "user-count x time-span exceeds the 63-bit packed range "
                "key; split the log by time range first"
            )
        key = (uinv.astype(np.uint64) << shift) | rel.astype(np.uint64)

        c_order = np.argsort(key[is_click], kind="stable")
        ck = key[is_click][c_order]
        c_eid = eid[is_click][c_order]
        e_key = key[~is_click]
        e_eid = eid[~is_click]
        e_u = u[~is_click]
        e_uinv = uinv[~is_click]
        e_rel = rel[~is_click].astype(np.uint64)
        if len(ck) == 0 or len(e_key) == 0:
            return empty
        # window = [ts - win, ts): inclusive lower bound (matches the
        # oracle's c.ts >= e.ts - win and the fuzz test), strict upper;
        # clamp at the user's own key-space base BEFORE subtracting —
        # uint64 e_key - win would wrap for errors within `win` of the
        # span start and poison searchsorted
        user_base = e_uinv.astype(np.uint64) << shift
        lo_key = np.where(
            e_rel >= np.uint64(win), e_key - np.uint64(win), user_base
        )
        lo = np.searchsorted(ck, lo_key, side="left")
        hi = np.searchsorted(ck, e_key, side="left")  # strict: clicks < ts
        counts = hi - lo
        tot = int(counts.sum())
        if tot == 0:
            return empty
        # repeat+range gather: click index for every emitted pair
        within = np.arange(tot) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        c_idx = np.repeat(lo, counts) + within
        e_rep = np.repeat(np.arange(len(e_key)), counts)
        gap = (e_key[e_rep] - ck[c_idx]).astype(np.int64)
        return pa.table(
            {
                "error_event_id": pa.array(e_eid[e_rep], type=pa.int64()),
                "click_event_id": pa.array(c_eid[c_idx], type=pa.int64()),
                "user_id": pa.array(e_u[e_rep], type=pa.int64()),
                "gap_us": pa.array(gap, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("ku")
        .map_groups(join_partition, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Funnel analysis + cohort retention — the two canonical product-analytics
# aggregations over an event log (beyond-reference operator family; the
# event-stream siblings of tumbling/hopping/sessionize).
# ---------------------------------------------------------------------------

FUNNEL_STEPS: tuple[str, ...] = ("view", "click", "purchase")
FUNNEL_HORIZON_US: int = 24 * 3600 * 1_000_000  # 24 h conversion window
_DAY_US = 86_400_000_000


FUNNEL_STEP_WINDOW_US: int = 3600 * 1_000_000  # 1 h between steps


def funnel_counts(
    sf_dir: str,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    horizon_us: int = FUNNEL_HORIZON_US,
    per_step_window_us: "int | None" = None,
):
    """Ordered-step conversion funnel with first-touch attribution: a user
    completes step i when an event of type steps[i] exists STRICTLY after
    their step-(i-1) completion time and within ``horizon_us`` of their
    FIRST step-0 event (greedy earliest-completion semantics — the
    first-touch rule product-analytics engines use, deterministic and
    SQL-replayable, unlike optimal-matching variants). Returns one row per
    step: (step, step_name, users), users non-increasing by construction.

    ``per_step_window_us`` switches to the PER-STEP conversion-window
    rule (the Amplitude "within W of the previous step" mode): step i
    must land within ``per_step_window_us`` of the step-(i-1) completion
    time instead of within one global horizon of the anchor — the cap
    re-anchors at every completed step.

    Scale shape: the read is pruned to the step event types at the parquet
    scan; users hash-partition into input-scaled buckets (ONE shuffle) and
    every user in a bucket advances through all L steps in L vectorized
    ``np.minimum.at`` passes — per-partition state is |users in bucket| × L
    int64s, the driver fold is L integers. All comparisons are integer
    microseconds, so the DuckDB oracle matches bit-for-bit.
    """
    import ray.data

    from .partitioning import append_hash_bucket, partition_count

    path = f"{sf_dir}/events.parquet"
    ds = ray.data.read_parquet(
        path,
        columns=["user_id", "ts", "event_type"],
        filter=pc.field("event_type").isin(list(steps)),
    )
    nparts = partition_count(path, ("user_id", "ts", "event_type"))
    n_steps = len(steps)
    INF = np.iinfo(np.int64).max

    def add_ku(t: pa.Table) -> pa.Table:
        return append_hash_bucket(t, "user_id", nparts)

    def per_partition(t: pa.Table) -> pa.Table:
        counts = np.zeros(n_steps, dtype=np.int64)
        if t.num_rows:
            u = t.column("user_id").to_numpy()
            ts = t.column("ts").to_numpy().astype("datetime64[us]").astype(
                np.int64
            )
            et = t.column("event_type")
            uniq, uinv = np.unique(u, return_inverse=True)
            t_prev = np.empty(0, np.int64)
            cap = np.empty(0, np.int64)
            for i, s in enumerate(steps):
                mask = pc.equal(et, s).to_numpy(zero_copy_only=False)
                if i > 0:
                    mask &= (ts > t_prev[uinv]) & (ts <= cap[uinv])
                ti = np.full(len(uniq), INF, np.int64)
                np.minimum.at(ti, uinv[mask], ts[mask])
                counts[i] = int((ti < INF).sum())
                if per_step_window_us is not None:
                    # per-step mode: the window re-anchors at every
                    # completed step (sentinel keeps INF from wrapping)
                    cap = ti.copy()
                    done = cap < INF
                    cap[done] += per_step_window_us
                    cap[~done] = np.iinfo(np.int64).min
                elif i == 0:
                    # conversion window anchors at the FIRST step-0 event;
                    # explicit sentinel keeps INF + horizon from wrapping
                    cap = ti.copy()
                    done = cap < INF
                    cap[done] += horizon_us
                    cap[~done] = np.iinfo(np.int64).min
                t_prev = ti
        return pa.table(
            {
                "step": pa.array(
                    np.arange(1, n_steps + 1, dtype=np.int64)
                ),
                "users": pa.array(counts, type=pa.int64()),
            }
        )

    total = np.zeros(n_steps, dtype=np.int64)
    parts = (
        ds.map_batches(add_ku, batch_format="pyarrow")
        .groupby("ku")
        .map_groups(per_partition, batch_format="pyarrow")
    )
    # driver fold over L-row partials — bounded state (L integers)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        st = b.column("step").to_numpy()
        # a batch may concatenate several partitions' partials — np.add.at
        # accumulates repeated step indices where fancy += would drop them
        np.add.at(total, st - 1, b.column("users").to_numpy())
    return pa.table(
        {
            "step": pa.array(np.arange(1, n_steps + 1, dtype=np.int64)),
            "step_name": pa.array(list(steps)),
            "users": pa.array(total, type=pa.int64()),
        }
    )


def retention_cohorts(sf_dir: str):
    """Classic cohort-retention triangle: cohort = the UTC day of a user's
    first event; a (cohort_day, offset_days) cell counts the cohort's users
    active offset_days after their first day. Returns
    (cohort_day, offset_days, users) with day numbers as integer
    days-since-epoch (floor of epoch microseconds / 86_400_000_000 — kept
    integer so the oracle comparison carries no date-type risk).

    Scale shape: users hash-partition into input-scaled buckets (ONE wide
    shuffle); each bucket computes per-user first days and deduplicates
    (user, day) pairs with one lexsort — a user lives in exactly one
    bucket, so per-bucket distinct IS global distinct — and pre-aggregates
    to (cohort_day, offset_days, partial count). The final groupby-Sum
    shuffles only cohort×offset cells (days², not events)."""
    import ray.data
    from ray.data.aggregate import Sum

    from .partitioning import append_hash_bucket, partition_count

    path = f"{sf_dir}/events.parquet"
    ds = ray.data.read_parquet(path, columns=["user_id", "ts"])
    nparts = partition_count(path, ("user_id", "ts"))

    def add_ku(t: pa.Table) -> pa.Table:
        return append_hash_bucket(t, "user_id", nparts)

    def per_partition(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cohort_day": pa.array([], pa.int64()),
                "offset_days": pa.array([], pa.int64()),
                "users_partial": pa.array([], pa.int64()),
            }
        )
        if not t.num_rows:
            return empty
        u = t.column("user_id").to_numpy()
        day = (
            t.column("ts").to_numpy().astype("datetime64[us]")
            .astype(np.int64) // _DAY_US
        )
        uniq, uinv = np.unique(u, return_inverse=True)
        cohort = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(cohort, uinv, day)
        offset = day - cohort[uinv]
        # distinct (user, offset) via one lexsort + boundary marker
        order = np.lexsort((offset, uinv))
        uu, oo = uinv[order], offset[order]
        first = np.empty(len(uu), dtype=bool)
        first[0] = True
        first[1:] = (uu[1:] != uu[:-1]) | (oo[1:] != oo[:-1])
        cd, od = cohort[uu[first]], oo[first]
        # pre-aggregate the bucket's cells before the tiny global shuffle
        if len(od) and int(od.max()) >= (1 << 20):
            raise ValueError(
                "retention_cohorts: cohort offset "
                f"{int(od.max())} days >= 2^20 would collide packed "
                "cells — the event span exceeds ~2.8k years (bad data?)"
            )
        key = cd * (1 << 20) + od  # offsets < 2^20 days ≈ 2.8k years
        cells, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "cohort_day": pa.array(cells >> 20, type=pa.int64()),
                "offset_days": pa.array(
                    cells & ((1 << 20) - 1), type=pa.int64()
                ),
                "users_partial": pa.array(cnt, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(add_ku, batch_format="pyarrow")
        .groupby("ku")
        .map_groups(per_partition, batch_format="pyarrow")
        .groupby(["cohort_day", "offset_days"])
        .aggregate(Sum("users_partial", alias_name="users"))
    )


def hourly_pipeline_aggs(sf_dir: str) -> pa.Table:
    """ES pipeline aggregations over a date histogram (``cumulative_sum``
    + ``derivative``): hourly event counts, then the running total and
    the first difference in bucket order. The first bucket's derivative
    coalesces to 0 — a dtype-stable spelling of ES's skipped-first-bucket
    (same information, no nullable column).

    Scale shape: the HISTOGRAM is the distributed part (per-batch Arrow
    group_by partials, one bucket-cardinality shuffle); the pipeline
    phase is a vectorized pass over n_buckets rows on the coordinator —
    exactly where ES runs parent pipeline aggs: they reduce the
    already-reduced bucket list, never the corpus."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {"window_start": pc.floor_temporal(t.column("ts"), unit="hour")}
            )
            .group_by(["window_start"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "window_start": g.column("window_start"),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()  # bounded: n_buckets rows (hours in the data span)
    )
    rows.sort(key=lambda r: r["window_start"])
    n = np.asarray([r["n"] for r in rows], dtype=np.int64)
    cum = np.cumsum(n)
    diff = np.concatenate(([0], n[1:] - n[:-1])).astype(np.int64)
    return pa.table(
        {
            "window_start": pa.array(
                [r["window_start"] for r in rows],
                type=pa.timestamp("us"),
            ),
            "n": pa.array(n),
            "cum_n": pa.array(cum),
            "diff_n": pa.array(diff),
        }
    )


def hourly_moving_aggs(
    sf_dir: str, window: int = 3, lag: int = 24
) -> pa.Table:
    """ES ``moving_fn`` (sum over a trailing window) + ``serial_diff``
    (lagged first difference) parent pipeline aggregations over the hourly
    date histogram. Window convention: trailing INCLUSIVE of the current
    bucket, truncated at the series head (SQL ``ROWS BETWEEN window-1
    PRECEDING AND CURRENT ROW``); serial_diff emits 0 for the first ``lag``
    buckets — the dtype-stable spelling of ES's skipped buckets, same
    convention as ``hourly_pipeline_aggs``'s derivative.

    Scale shape: identical to ``hourly_pipeline_aggs`` — the distributed
    part is the histogram (per-batch Arrow partials, one bucket-cardinality
    shuffle); the pipeline pass is vectorized over n_buckets rows on the
    coordinator, exactly where ES runs parent pipeline aggs."""
    import ray.data
    from ray.data.aggregate import Sum

    if window < 1 or lag < 1:
        raise ValueError("window and lag must be >= 1")

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {"window_start": pc.floor_temporal(t.column("ts"), unit="hour")}
            )
            .group_by(["window_start"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "window_start": g.column("window_start"),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()  # bounded: n_buckets rows (hours in the data span)
    )
    rows.sort(key=lambda r: r["window_start"])
    n = np.asarray([r["n"] for r in rows], dtype=np.int64)
    cum = np.concatenate(([0], np.cumsum(n)))
    idx = np.arange(len(n))
    mov = cum[idx + 1] - cum[np.maximum(idx + 1 - window, 0)]
    sd = np.zeros(len(n), dtype=np.int64)
    if len(n) > lag:
        sd[lag:] = n[lag:] - n[:-lag]
    return pa.table(
        {
            "window_start": pa.array(
                [r["window_start"] for r in rows], type=pa.timestamp("us")
            ),
            "n": pa.array(n),
            "moving_sum": pa.array(mov.astype(np.int64)),
            "serial_diff": pa.array(sd),
        }
    )


def dau_wau(sf_dir: str, window_days: int = 7):
    """DAU / WAU rolling distinct users per day: DAU(d) = distinct users
    active on day d; WAU(d) = distinct users active in the trailing
    ``window_days`` window [d-6, d]. The distributed identity: reduce
    events to DISTINCT (user, day) pairs first (one user-day shuffle of
    int pairs — never the raw events), then each pair contributes to
    ``window_days`` target days (a bounded x7 explode of the already
    thin pair stream), re-deduped by one more (user, target_day) groupby
    before the per-day count — the standard rolling-actives shape (MAU
    is the same pipeline at window_days=30). Target days outside the
    observed [min_day, max_day] span are dropped.

    Returns (epoch_day, dau, wau) for every active day, exact integers.
    """
    import ray.data
    from ray.data.aggregate import Sum

    if window_days < 1:
        raise ValueError("window_days must be >= 1")

    def pair_partial(t: pa.Table) -> pa.Table:
        d = pc.cast(t.column("ts"), pa.int64()).to_numpy() // _DAY_US
        g = (
            pa.table({"user_id": t.column("user_id"),
                      "day": pa.array(d, pa.int64())})
            .group_by(["user_id", "day"])
            .aggregate([([], "count_all")])
        )
        return g.select(["user_id", "day"])

    pairs = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
        )
        .map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .count()
        .drop_columns(["count()"])
        # both the DAU fold and the WAU explode consume this stream; the
        # deduped (user, day) pairs are the REDUCED intermediate (orders
        # of magnitude below the raw events), so materializing here runs
        # the expensive read+dedup shuffle once instead of twice
        .materialize()
    )

    def day_count(t: pa.Table, col: str) -> pa.Table:
        g = (
            pa.table({"day": t.column(col)})
            .group_by(["day"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {"day": g.column("day"),
             "n": g.column("count_all").cast(pa.int64())}
        )

    dau_rows = (
        pairs.map_batches(
            lambda t: day_count(t, "day"), batch_format="pyarrow"
        )
        .groupby("day")
        .aggregate(Sum("n", alias_name="dau"))
        .take_all()  # bounded: n_days
    )
    day_by = {r["day"]: r["dau"] for r in dau_rows}
    lo, hi = min(day_by), max(day_by)

    def explode(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy()
        d = t.column("day").to_numpy()
        uu = np.repeat(u, window_days)
        dd = np.repeat(d, window_days) + np.tile(
            np.arange(window_days, dtype=np.int64), len(d)
        )
        keep = (dd >= lo) & (dd <= hi)
        return pa.table(
            {
                "user_id": pa.array(uu[keep], pa.int64()),
                "day": pa.array(dd[keep], pa.int64()),
            }
        )

    wau_rows = (
        pairs.map_batches(explode, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .count()
        .map_batches(
            lambda t: day_count(t, "day"), batch_format="pyarrow"
        )
        .groupby("day")
        .aggregate(Sum("n", alias_name="wau"))
        .take_all()  # bounded: n_days
    )
    wau_by = {r["day"]: r["wau"] for r in wau_rows}
    days = sorted(day_by)
    return pa.table(
        {
            "epoch_day": pa.array(days, pa.int64()),
            "dau": pa.array([day_by[d] for d in days], pa.int64()),
            "wau": pa.array([wau_by.get(d, 0) for d in days], pa.int64()),
        }
    )
