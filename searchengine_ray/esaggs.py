"""ES bucket/metric aggregation analogs over the ``events`` table:
``histogram``, ``range``, ``filters``, ``adjacency_matrix``, ``rare_terms``,
and exact ``percentiles`` (ES runs t-digest; we compute the EXACT discrete
quantile over the bounded integer cents domain, which is both deterministic
and more accurate — the scale cost is a histogram shuffle, not a sort).

Exact-integer discipline (the repo-wide gate rule): ``value`` doubles are
rounded to cents PER EVENT (``round half away from zero``, matching DuckDB
``round()``) and every aggregate over them is an int64 sum/count, so results
are accumulation-order-independent and bit-exact against the SQL oracles.

Scale shape shared by every function here: a per-batch Arrow ``group_by``
partial (decomposable count/sum) inside ``map_batches`` keyed on a
bounded-cardinality bucket key, then ONE bucket-cardinality Ray shuffle
(``groupby().aggregate(Sum)``), driver sees n_buckets rows. No corpus-sized
driver fold anywhere; ``percentiles`` keeps its per-key reduction inside
``map_groups`` so the driver only ever sees n_keys x n_percents rows.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _cents(t: pa.Table) -> pa.Array:
    """value -> int64 cents, round-half-away-from-zero (DuckDB round())."""
    return pc.cast(
        pc.round(
            pc.multiply(t.column("value"), 100.0),
            round_mode="half_towards_infinity",
        ),
        pa.int64(),
    )


def _sum_by_key(ds, partial, key_cols: "list[str]"):
    """map_batches(partial) -> groupby(key).Sum(n, cents) -> sorted rows."""
    from ray.data.aggregate import Sum

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_cols if len(key_cols) > 1 else key_cols[0])
        .aggregate(
            Sum("n", alias_name="doc_count"),
            Sum("cents", alias_name="sum_value_cents"),
        )
        .take_all()  # bounded: n_buckets rows
    )
    rows.sort(key=lambda r: tuple(r[k] for k in key_cols))
    return rows


def histogram_agg(sf_dir: str, interval_cents: int = 2500) -> pa.Table:
    """ES ``histogram`` aggregation (fixed-interval numeric buckets,
    ``min_doc_count=1`` form — only non-empty buckets are returned, which
    keeps the engine a pure groupby; ES's zero-filled variant is a driver
    afterthought over the bounded bucket list). Bucket key is the FLOOR
    multiple of ``interval_cents`` — floor (not truncate) so negative
    values land in the bucket below zero exactly as ES documents.

    Returns (bucket_lo_cents, doc_count, sum_value_cents), all int64.
    """
    import ray.data

    if interval_cents <= 0:
        raise ValueError("histogram interval must be positive")

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t)
        lo = pc.multiply(
            _floor_div(c, interval_cents), np.int64(interval_cents)
        )
        g = (
            pa.table({"bucket_lo_cents": lo, "cents": c})
            .group_by(["bucket_lo_cents"])
            .aggregate([([], "count_all"), ("cents", "sum")])
        )
        return pa.table(
            {
                "bucket_lo_cents": g.column("bucket_lo_cents"),
                "n": g.column("count_all").cast(pa.int64()),
                "cents": g.column("cents_sum").cast(pa.int64()),
            }
        )

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    rows = _sum_by_key(ds, partial, ["bucket_lo_cents"])
    return pa.table(
        {
            "bucket_lo_cents": pa.array(
                [r["bucket_lo_cents"] for r in rows], pa.int64()
            ),
            "doc_count": pa.array([r["doc_count"] for r in rows], pa.int64()),
            "sum_value_cents": pa.array(
                [r["sum_value_cents"] for r in rows], pa.int64()
            ),
        }
    )


def _floor_div(arr: pa.Array, d: int) -> pa.Array:
    """int64 floor division (Arrow's divide truncates toward zero)."""
    a = arr.to_numpy(zero_copy_only=False)
    return pa.array(a // np.int64(d), type=pa.int64())


def range_agg(
    sf_dir: str, edges_cents: "tuple[int, ...]" = (0, 5000, 10000, 20000)
) -> pa.Table:
    """ES ``range`` aggregation: half-open ``[from, to)`` buckets over the
    cents domain, plus the two unbounded tails, keyed the ES way
    (``"*-0"``, ``"0-5000"``, ..., ``"20000-*"``). Buckets with zero docs
    are dropped (ES keeps them; the SQL-oracle gate pins the non-empty
    set, and the zero rows are a driver afterthought over len(edges)+1
    keys).

    Returns (range_key, doc_count, sum_value_cents).
    """
    import ray.data

    edges = np.asarray(sorted(edges_cents), dtype=np.int64)
    keys = (
        [f"*-{edges[0]}"]
        + [f"{a}-{b}" for a, b in zip(edges[:-1], edges[1:])]
        + [f"{edges[-1]}-*"]
    )

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(edges, c, side="right")  # 0 = below first edge
        n = np.bincount(idx, minlength=len(keys)).astype(np.int64)
        s = np.bincount(idx, weights=c, minlength=len(keys)).astype(np.int64)
        nz = np.flatnonzero(n)
        return pa.table(
            {
                "range_key": pa.array([keys[i] for i in nz], pa.string()),
                "n": pa.array(n[nz]),
                "cents": pa.array(s[nz]),
            }
        )

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    rows = _sum_by_key(ds, partial, ["range_key"])
    return pa.table(
        {
            "range_key": pa.array([r["range_key"] for r in rows], pa.string()),
            "doc_count": pa.array([r["doc_count"] for r in rows], pa.int64()),
            "sum_value_cents": pa.array(
                [r["sum_value_cents"] for r in rows], pa.int64()
            ),
        }
    )


def _named_masks(t: pa.Table) -> "dict[str, np.ndarray]":
    """The fixed named-filter set shared by ``filters`` and
    ``adjacency_matrix``: a term filter, a numeric-range filter, and a
    date-part filter — one of each ES filter species."""
    c = _cents(t).to_numpy(zero_copy_only=False)
    hour = pc.hour(t.column("ts")).to_numpy(zero_copy_only=False)
    et = t.column("event_type").to_numpy(zero_copy_only=False)
    return {
        "click": et == "click",
        "daytime": (hour >= 8) & (hour < 18),
        "high_value": c >= 10000,
    }


def filters_agg(sf_dir: str) -> pa.Table:
    """ES ``filters`` aggregation: one bucket per NAMED filter (an event can
    land in several — buckets overlap, unlike ``range``). Per bucket:
    doc_count + exact cents sum.

    Returns (filter_key, doc_count, sum_value_cents).
    """
    import ray.data

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t).to_numpy(zero_copy_only=False)
        ks, ns, ss = [], [], []
        for k, m in _named_masks(t).items():
            if m.any():
                ks.append(k)
                ns.append(int(m.sum()))
                ss.append(int(c[m].sum()))
        return pa.table(
            {
                "filter_key": pa.array(ks, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "cents": pa.array(ss, pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    rows = _sum_by_key(ds, partial, ["filter_key"])
    return pa.table(
        {
            "filter_key": pa.array([r["filter_key"] for r in rows], pa.string()),
            "doc_count": pa.array([r["doc_count"] for r in rows], pa.int64()),
            "sum_value_cents": pa.array(
                [r["sum_value_cents"] for r in rows], pa.int64()
            ),
        }
    )


def adjacency_matrix_agg(sf_dir: str) -> pa.Table:
    """ES ``adjacency_matrix`` aggregation: for named filters A,B,C emit the
    singleton buckets and every pairwise intersection keyed ``"A&B"``
    (names sorted, ES's separator), doc counts only, empty buckets dropped
    — exactly the ES response shape.

    Returns (key, doc_count).
    """
    import ray.data
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        masks = _named_masks(t)
        names = sorted(masks)
        ks, ns = [], []
        for i, a in enumerate(names):
            if masks[a].any():
                ks.append(a)
                ns.append(int(masks[a].sum()))
            for b in names[i + 1 :]:
                both = masks[a] & masks[b]
                if both.any():
                    ks.append(f"{a}&{b}")
                    ns.append(int(both.sum()))
        return pa.table(
            {"key": pa.array(ks, pa.string()), "n": pa.array(ns, pa.int64())}
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )
    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("n", alias_name="doc_count"))
        .take_all()  # bounded: <= k + k*(k-1)/2 rows
    )
    rows.sort(key=lambda r: r["key"])
    return pa.table(
        {
            "key": pa.array([r["key"] for r in rows], pa.string()),
            "doc_count": pa.array([r["doc_count"] for r in rows], pa.int64()),
        }
    )


def rare_terms_agg(
    sf_dir: str, field: str = "user_id", max_doc_count: int = 55
) -> pa.Table:
    """ES ``rare_terms`` aggregation: terms of ``field`` appearing in at
    most ``max_doc_count`` events, ordered by the term. ES approximates
    with a CuckooFilter to bound memory; we compute it exactly with one
    term-cardinality shuffle (count per term, filter) — the candidate set
    after the shuffle is already reduced to distinct terms, and the rare
    subset is strictly smaller.

    Returns (term, doc_count).
    """
    import ray.data
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select([field])
            .group_by([field])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "term": g.column(field),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=[field])
    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="doc_count"))
        .map_batches(
            lambda t: t.filter(
                pc.less_equal(t.column("doc_count"), max_doc_count)
            ),
            batch_format="pyarrow",
        )
    )
    rows = out.take_all()  # bounded: the rare subset
    rows.sort(key=lambda r: r["term"])
    return pa.table(
        {
            "term": pa.array([r["term"] for r in rows], pa.int64()),
            "doc_count": pa.array([r["doc_count"] for r in rows], pa.int64()),
        }
    )


def percentiles_agg(
    sf_dir: str,
    percents: "tuple[int, ...]" = (25, 50, 75, 90, 99),
    key: str = "event_type",
) -> pa.Table:
    """ES ``percentiles`` aggregation per ``key`` — EXACT, not t-digest:
    the discrete lower quantile over the bounded integer cents domain,
    matching DuckDB ``quantile_disc`` (the smallest element whose
    cumulative count reaches ``ceil(q*n)``; verified rule, see gate).

    Scale shape: pass 1 reduces the corpus to a per-(key, cents) count
    histogram (ONE shuffle whose cardinality is n_keys x |cents domain|,
    independent of corpus size); pass 2 selects ranks inside
    ``map_groups`` per key (sort + cumsum over the bounded histogram).
    The corpus itself is never sorted — the reduction IS the histogram,
    which is why exact beats t-digest here.

    Returns (key, percent, value_cents).
    """
    import ray.data
    from ray.data.aggregate import Sum

    ps = list(percents)
    if any(p < 0 or p > 100 for p in ps):
        raise ValueError("percents must be in [0, 100]")

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({key: t.column(key), "cents": _cents(t)})
            .group_by([key, "cents"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                key: g.column(key),
                "cents": g.column("cents"),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    def per_key(t: pa.Table) -> pa.Table:
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(cents, kind="stable")
        cents, n = cents[order], n[order]
        cum = np.cumsum(n)
        total = int(cum[-1])
        out_c = []
        for p in ps:
            # DuckDB quantile_disc: index ceil(q*n)-1 in the sorted
            # multiset, clamped at 0; q*n in IEEE double on both sides.
            rank = max(math.ceil((p / 100.0) * total), 1)
            out_c.append(int(cents[np.searchsorted(cum, rank, "left")]))
        k = t.column(key)[0].as_py()
        return pa.table(
            {
                key: pa.array([k] * len(ps), pa.string()),
                "percent": pa.array(ps, pa.int64()),
                "value_cents": pa.array(out_c, pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=[key, "value"]
    )
    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key, "cents"])
        .aggregate(Sum("n", alias_name="n"))
    )
    rows = (
        hist.groupby(key)
        .map_groups(per_key, batch_format="pyarrow")
        .take_all()  # bounded: n_keys x n_percents rows
    )
    rows.sort(key=lambda r: (r[key], r["percent"]))
    return pa.table(
        {
            key: pa.array([r[key] for r in rows], pa.string()),
            "percent": pa.array([r["percent"] for r in rows], pa.int64()),
            "value_cents": pa.array(
                [r["value_cents"] for r in rows], pa.int64()
            ),
        }
    )


def _civil_from_days(z: np.ndarray) -> "tuple[np.ndarray, np.ndarray, np.ndarray]":
    """Days-since-epoch -> (year, month, day), vectorized int64 — the
    standard proleptic-Gregorian civil_from_days algorithm (Howard
    Hinnant, "chrono-Compatible Low-Level Date Algorithms", public
    domain), exact integer arithmetic so calendar bucketing needs no
    datetime library and replays bit-for-bit against DuckDB year()/
    month() (both follow the same proleptic Gregorian calendar)."""
    z = z.astype(np.int64) + 719468
    era = np.floor_divide(z, 146097)
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = np.where(mp < 10, mp + 3, mp - 9)
    y = y + (m <= 2)
    return y, m, d


_US_PER_DAY = 86_400_000_000


def date_histogram_agg(
    sf_dir: str, calendar_interval: str = "month"
) -> pa.Table:
    """ES ``date_histogram`` with a CALENDAR interval — the variant a
    fixed-interval histogram can't express because buckets are unequal
    (months are 28-31 days; ES docs call this out as the reason
    ``calendar_interval`` exists). ``month`` buckets key as yyyymm;
    ``week`` buckets key as the epoch-day of the week's MONDAY (the ES
    default week start). Timestamps are taken as UTC wall-clock exactly
    like the repo's other event windows.

    Scale shape: per-batch integer civil-date math + Arrow group_by
    partial, then one bucket-cardinality shuffle (months over a decade =
    ~120 buckets). Returns (bucket, doc_count, sum_value_cents).
    """
    import ray.data
    from ray.data.aggregate import Sum

    if calendar_interval not in ("month", "week"):
        raise ValueError(
            f"unsupported calendar_interval {calendar_interval!r} "
            "(month | week)"
        )

    def partial(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        days = np.floor_divide(us, _US_PER_DAY)
        if calendar_interval == "month":
            y, m, _ = _civil_from_days(days)
            bucket = y * 100 + m
        else:
            # 1970-01-01 was a Thursday: weekday(Mon=0) = (days+3) mod 7
            bucket = days - np.mod(days + 3, 7)
        c = _cents(t)
        g = (
            pa.table({"bucket": pa.array(bucket, pa.int64()), "cents": c})
            .group_by(["bucket"])
            .aggregate([([], "count_all"), ("cents", "sum")])
        )
        return pa.table(
            {
                "bucket": g.column("bucket"),
                "n": g.column("count_all").cast(pa.int64()),
                "cents": g.column("cents_sum").cast(pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "value"]
    )
    rows = _sum_by_key(ds, partial, ["bucket"])
    return pa.table(
        {
            "bucket": pa.array([r["bucket"] for r in rows], pa.int64()),
            "doc_count": pa.array([r["doc_count"] for r in rows], pa.int64()),
            "sum_value_cents": pa.array(
                [r["sum_value_cents"] for r in rows], pa.int64()
            ),
        }
    )


def multi_terms_agg(sf_dir: str, size: int = 20) -> pa.Table:
    """ES ``multi_terms`` aggregation: buckets keyed by a TUPLE of fields
    ((event_type, user_id) here), ordered by doc_count descending with a
    deterministic total tie-break (event_type, user_id ascending — ES
    breaks count ties by key order too), truncated to ``size`` buckets.
    Unlike single-field ``terms``, the composite key space can explode,
    which is why ES caps it server-side; the engine keeps the same shape:
    per-batch Arrow group_by partial, ONE composite-key shuffle, and the
    size cut on the driver over the bucket list. NOTE the driver fold is
    bucket-cardinality-sized — exact, the ES single-shard semantics; at
    explosive cardinality the scale form is the per-shard-truncated
    ``terms_shard_error_agg`` below (reported counts + the ES
    doc_count_error_upper_bound), which never ships more than
    n_shards x size buckets to the driver.

    Returns (event_type, user_id, doc_count, sum_value_cents).
    """
    import ray.data

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t)
        g = (
            pa.table(
                {
                    "event_type": t.column("event_type"),
                    "user_id": t.column("user_id"),
                    "cents": c,
                }
            )
            .group_by(["event_type", "user_id"])
            .aggregate([([], "count_all"), ("cents", "sum")])
        )
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "user_id": g.column("user_id").cast(pa.int64()),
                "n": g.column("count_all").cast(pa.int64()),
                "cents": g.column("cents_sum").cast(pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "user_id", "value"],
    )
    rows = _sum_by_key(ds, partial, ["event_type", "user_id"])
    rows.sort(key=lambda r: (-r["doc_count"], r["event_type"], r["user_id"]))
    rows = rows[:size]
    return pa.table(
        {
            "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
            "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
            "doc_count": pa.array([r["doc_count"] for r in rows], pa.int64()),
            "sum_value_cents": pa.array(
                [r["sum_value_cents"] for r in rows], pa.int64()
            ),
        }
    )


_AUTO_LADDER = (
    1, 5, 10, 30, 60, 300, 600, 1800, 3600, 10800, 43200,
    86400, 604800, 2592000, 7776000, 31536000,
)


def auto_date_histogram_agg(sf_dir: str, target_buckets: int = 20) -> pa.Table:
    """ES ``auto_date_histogram``: the engine PICKS the interval — the
    smallest rung of a fixed rounding ladder (seconds through minutes/
    hours/days/weeks, then 30/90/365-day approximations of the calendar
    rungs, documented fixed subset of the ES ladder) whose aligned
    bucket count ``floor(max/i) - floor(min/i) + 1`` stays within
    ``target_buckets``; if even the top rung overflows, the top rung is
    used (ES merges upward the same way). Two passes: a min/max
    reduction (driver sees 2 scalars), then the usual one-shuffle
    bucket groupby keyed on the chosen interval.

    Returns (bucket_s, interval_s, doc_count, sum_value_cents) — the
    chosen interval rides along so the oracle re-verifies the SELECTION,
    not just the bucketing.
    """
    import ray.data
    from ray.data.aggregate import Max, Min

    if target_buckets < 1:
        raise ValueError("target_buckets must be >= 1")

    def to_s(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64())
        return pa.table({"s": pc.floor(pc.divide(us, 1_000_000)).cast(pa.int64())})

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])
    mm = ds.select_columns(["ts"]).map_batches(
        to_s, batch_format="pyarrow"
    ).aggregate(Min("s"), Max("s"))
    mn, mx = int(mm["min(s)"]), int(mm["max(s)"])
    iv = next(
        (i for i in _AUTO_LADDER if (mx // i) - (mn // i) + 1 <= target_buckets),
        _AUTO_LADDER[-1],
    )

    def partial(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        s = np.floor_divide(us, 1_000_000)
        bucket = (s // iv) * iv
        g = (
            pa.table({"bucket_s": pa.array(bucket, pa.int64()), "cents": _cents(t)})
            .group_by(["bucket_s"])
            .aggregate([([], "count_all"), ("cents", "sum")])
        )
        return pa.table(
            {
                "bucket_s": g.column("bucket_s"),
                "n": g.column("count_all").cast(pa.int64()),
                "cents": g.column("cents_sum").cast(pa.int64()),
            }
        )

    rows = _sum_by_key(ds, partial, ["bucket_s"])
    return pa.table(
        {
            "bucket_s": pa.array([r["bucket_s"] for r in rows], pa.int64()),
            "interval_s": pa.array([iv] * len(rows), pa.int64()),
            "doc_count": pa.array([r["doc_count"] for r in rows], pa.int64()),
            "sum_value_cents": pa.array(
                [r["sum_value_cents"] for r in rows], pa.int64()
            ),
        }
    )


def weighted_avg_agg(sf_dir: str) -> pa.Table:
    """ES ``weighted_avg`` aggregation per event_type: value cents
    weighted by the integer ``k`` extracted from the JSON ``props``
    column (the ES runtime-field / script-weight shape — the extraction
    itself is part of the contract and replays in SQL as a regex
    capture). Exact integer numerator/denominator (Σ cents·k, Σ k) and
    ONE double division at the end — accumulation-order-free, so the
    hash is stable. Zero total weight -> the group is dropped (ES
    returns null; a dropped row hashes deterministically, a NULL-vs-NaN
    column does not).

    Returns (event_type, w_sum_cents, w_total, weighted_avg).
    """
    import ray.data
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t)
        ext = pc.extract_regex(t.column("props"), r'"k":\s*(?P<k>-?\d+)')
        if ext.null_count:
            # a props row without an integer "k" would silently fall out
            # of an Arrow null-skipping sum while the SQL oracle's CAST
            # errors — fail loudly on BOTH sides instead of diverging
            first = pc.index(pc.is_null(ext), pa.scalar(True)).as_py()
            bad = t.column("props")[first].as_py()
            raise ValueError(
                f"weighted_avg: props row without an integer 'k': {bad!r}"
            )
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        g = (
            pa.table(
                {
                    "event_type": t.column("event_type"),
                    "wc": pc.multiply(c, k),
                    "w": k,
                }
            )
            .group_by(["event_type"])
            .aggregate([("wc", "sum"), ("w", "sum")])
        )
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "wc": g.column("wc_sum").cast(pa.int64()),
                "w": g.column("w_sum").cast(pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value", "props"]
    )
    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("wc", alias_name="w_sum_cents"),
                   Sum("w", alias_name="w_total"))
        .take_all()
    )
    rows = [r for r in rows if r["w_total"] != 0]
    rows.sort(key=lambda r: r["event_type"])
    return pa.table(
        {
            "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
            "w_sum_cents": pa.array([r["w_sum_cents"] for r in rows], pa.int64()),
            "w_total": pa.array([r["w_total"] for r in rows], pa.int64()),
            "weighted_avg": pa.array(
                [r["w_sum_cents"] / r["w_total"] for r in rows], pa.float64()
            ),
        }
    )


def mad_agg(sf_dir: str, key: str = "event_type") -> pa.Table:
    """ES ``median_absolute_deviation`` per ``key`` — EXACT, not
    t-digest: MAD = median(|x - median(x)|) with the interpolating
    median convention DuckDB uses (mean of the two middle elements for
    even counts). Medians of integer cents are exact halves, deviations
    exact halves, the outer median exact quarters — every intermediate
    is an exact double, so the result is deterministic and hashable.

    Scale shape: the percentiles_agg histogram trick — reduce to a
    per-(key, cents) count histogram (ONE bounded-cardinality shuffle),
    then both medians come from cumsums over the bounded histogram
    inside ``map_groups``; the corpus is never sorted.

    Returns (key, median_cents, mad_cents) — both DOUBLE.
    """
    import ray.data

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({key: t.column(key), "cents": _cents(t)})
            .group_by([key, "cents"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                key: g.column(key),
                "cents": g.column("cents"),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    def _wmedian(vals: np.ndarray, n: np.ndarray) -> float:
        """Interpolating median of the multiset (vals repeated n times):
        mean of ranks floor((N+1)/2) and floor(N/2)+1, 1-based."""
        order = np.argsort(vals, kind="stable")
        v, c = vals[order], n[order]
        cum = np.cumsum(c)
        total = int(cum[-1])
        ra, rb = (total + 1) // 2, total // 2 + 1
        a = v[np.searchsorted(cum, ra, "left")]
        b = v[np.searchsorted(cum, rb, "left")]
        return (float(a) + float(b)) / 2.0

    def per_key(t: pa.Table) -> pa.Table:
        cents = t.column("cents").to_numpy(zero_copy_only=False).astype(np.float64)
        n = t.column("n").to_numpy(zero_copy_only=False)
        med = _wmedian(cents, n)
        dev = np.abs(cents - med)  # exact halves
        # equal deviations from both sides of the median merge weights
        ud, inv = np.unique(dev, return_inverse=True)
        wd = np.zeros(len(ud), dtype=np.int64)
        np.add.at(wd, inv, n)
        mad = _wmedian(ud, wd)
        return pa.table(
            {
                key: pa.array([t.column(key)[0].as_py()], pa.string()),
                "median_cents": pa.array([med], pa.float64()),
                "mad_cents": pa.array([mad], pa.float64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=[key, "value"]
    )
    from ray.data.aggregate import Sum

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key, "cents"])
        .aggregate(Sum("n", alias_name="n"))
    )
    rows = (
        hist.groupby(key)
        .map_groups(per_key, batch_format="pyarrow")
        .take_all()  # bounded: n_keys rows
    )
    rows.sort(key=lambda r: r[key])
    return pa.table(
        {
            key: pa.array([r[key] for r in rows], pa.string()),
            "median_cents": pa.array(
                [r["median_cents"] for r in rows], pa.float64()
            ),
            "mad_cents": pa.array([r["mad_cents"] for r in rows], pa.float64()),
        }
    )


def matrix_stats_agg(sf_dir: str) -> pa.Table:
    """ES ``matrix_stats`` over (value cents, user_id) per event_type:
    the exact int64 second-moment sums (n, Σx, Σy, Σx², Σy², Σxy) from
    ONE decomposable groupby — the moments are what a multi-node
    reduction actually ships, and they hash exactly — plus the Pearson
    correlation derived from them in a FIXED double expression tree
    ((n·Σxy - Σx·Σy) / (sqrt(n·Σx² - Σx²ᵗᵉʳᵐ) · sqrt(n·Σy² - Σy²ᵗᵉʳᵐ)),
    every op correctly-rounded IEEE and replayed with the identical
    tree in SQL), rounded to 6.

    Returns (event_type, n, sum_x, sum_y, sum_xx, sum_yy, sum_xy,
    corr_r).
    """
    import ray.data
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t).to_numpy(zero_copy_only=False)
        u = t.column("user_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        g = (
            pa.table(
                {
                    "event_type": t.column("event_type"),
                    "x": pa.array(c, pa.int64()),
                    "y": pa.array(u, pa.int64()),
                    "xx": pa.array(c * c, pa.int64()),
                    "yy": pa.array(u * u, pa.int64()),
                    "xy": pa.array(c * u, pa.int64()),
                    "one": pa.array(np.ones(len(c), dtype=np.int64)),
                }
            )
            .group_by(["event_type"])
            .aggregate([("x", "sum"), ("y", "sum"), ("xx", "sum"),
                        ("yy", "sum"), ("xy", "sum"), ("one", "sum")])
        )
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "x": g.column("x_sum").cast(pa.int64()),
                "y": g.column("y_sum").cast(pa.int64()),
                "xx": g.column("xx_sum").cast(pa.int64()),
                "yy": g.column("yy_sum").cast(pa.int64()),
                "xy": g.column("xy_sum").cast(pa.int64()),
                "one": g.column("one_sum").cast(pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id", "value"]
    )
    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("one", alias_name="n"), Sum("x", alias_name="sum_x"),
            Sum("y", alias_name="sum_y"), Sum("xx", alias_name="sum_xx"),
            Sum("yy", alias_name="sum_yy"), Sum("xy", alias_name="sum_xy"),
        )
        .take_all()
    )
    rows.sort(key=lambda r: r["event_type"])
    corr = []
    for r in rows:
        n = np.float64(r["n"])
        sx, sy = np.float64(r["sum_x"]), np.float64(r["sum_y"])
        num = n * np.float64(r["sum_xy"]) - sx * sy
        dx = np.sqrt(n * np.float64(r["sum_xx"]) - sx * sx)
        dy = np.sqrt(n * np.float64(r["sum_yy"]) - sy * sy)
        corr.append(round(float(num / (dx * dy)), 6))
    return pa.table(
        {
            "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
            "n": pa.array([r["n"] for r in rows], pa.int64()),
            "sum_x": pa.array([r["sum_x"] for r in rows], pa.int64()),
            "sum_y": pa.array([r["sum_y"] for r in rows], pa.int64()),
            "sum_xx": pa.array([r["sum_xx"] for r in rows], pa.int64()),
            "sum_yy": pa.array([r["sum_yy"] for r in rows], pa.int64()),
            "sum_xy": pa.array([r["sum_xy"] for r in rows], pa.int64()),
            "corr_r": pa.array(corr, pa.float64()),
        }
    )


def terms_shard_error_agg(
    sf_dir: str, size: int = 5, n_shards: int = 4, seed: int = 97
) -> pa.Table:
    """ES ``terms`` aggregation with PER-SHARD truncation and the
    ``doc_count_error_upper_bound`` it reports — the distributed
    approximation semantics itself, reproduced deterministically:

    events shard by ``splitmix64(event_id, seed) % n_shards`` (a
    deterministic stand-in for ES's routing hash, replayable in SQL);
    each shard returns only its local top-``size`` user_ids by
    (count desc, user_id asc) — the information an ES data node
    actually ships; the coordinating merge sums ONLY reported counts
    (so ``doc_count`` can undercount, exactly like ES), and each
    merged term's error bound is the sum, over shards that did NOT
    report it, of that shard's smallest returned count — 0 for shards
    that returned their full term list (no truncation, nothing
    missed). Final cut: top-``size`` by (merged count desc, user asc).

    Scale shape: the per-(shard, user) count reduction is ONE
    decomposable groupby; per-shard ranking runs inside ``map_groups``
    over bounded per-shard term histograms; the driver merges
    n_shards x size rows.

    Returns (user_id, doc_count, doc_count_error_upper_bound).
    """
    import ray.data
    from ray.data.aggregate import Sum

    from .sketch import _hash64

    if size < 1 or n_shards < 1:
        raise ValueError("size and n_shards must be >= 1")

    def partial(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        shard = (_hash64(eid.astype(np.int64), seed)
                 % np.uint64(n_shards)).astype(np.int64)
        g = (
            pa.table(
                {
                    "shard": pa.array(shard, pa.int64()),
                    "user_id": t.column("user_id").cast(pa.int64()),
                }
            )
            .group_by(["shard", "user_id"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "shard": g.column("shard"),
                "user_id": g.column("user_id"),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    def per_shard(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((u, -n))[:size]
        truncated = len(u) > size
        cutoff = int(n[order[-1]]) if truncated else 0
        return pa.table(
            {
                "shard": pa.array(
                    [t.column("shard")[0].as_py()] * len(order), pa.int64()
                ),
                "user_id": pa.array(u[order], pa.int64()),
                "n": pa.array(n[order], pa.int64()),
                "cutoff": pa.array([cutoff] * len(order), pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
    )
    kept = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["shard", "user_id"])
        .aggregate(Sum("n", alias_name="n"))
        .groupby("shard")
        .map_groups(per_shard, batch_format="pyarrow")
        .take_all()  # bounded: n_shards x size rows
    )
    cutoffs = {r["shard"]: r["cutoff"] for r in kept}
    per_user: dict[int, dict[int, int]] = {}
    for r in kept:
        per_user.setdefault(r["user_id"], {})[r["shard"]] = r["n"]
    merged = []
    for user, by_shard in per_user.items():
        doc_count = sum(by_shard.values())
        err = sum(
            c for s, c in cutoffs.items() if s not in by_shard
        )
        merged.append((user, doc_count, err))
    merged.sort(key=lambda t: (-t[1], t[0]))
    merged = merged[:size]
    return pa.table(
        {
            "user_id": pa.array([m[0] for m in merged], pa.int64()),
            "doc_count": pa.array([m[1] for m in merged], pa.int64()),
            "doc_count_error_upper_bound": pa.array(
                [m[2] for m in merged], pa.int64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# aggregation extension surface — the §2.12 registry pattern
# (qryparse.register_operator / config.register_model) applied to the
# aggregation side: a user-defined aggregation is (partial, merge specs,
# finalize), exactly the decomposable map-combine-reduce shape every
# built-in agg above ships, so a registered agg inherits the same scale
# story (per-batch Arrow partials, ONE bounded-cardinality shuffle,
# bounded driver finalize) — the ES scripted_metric analog with the
# combine made explicit instead of a coordinator-side script.
# ---------------------------------------------------------------------------

AGG_REGISTRY: "dict[str, dict]" = {}


def register_aggregation(
    name: str,
    partial,
    merge: "list[tuple[str, str, str]]",
    finalize=None,
    columns: "list[str] | None" = None,
    key: str = "key",
) -> None:
    """Register a named aggregation over the events table.

    ``partial(batch: pa.Table) -> pa.Table`` emits per-batch partial rows
    (must include ``key``); ``merge`` lists (column, how, alias) with how
    in {sum, min, max} — the decomposable combine the shuffle runs;
    ``finalize(rows: list[dict]) -> list[dict]`` optionally derives
    output columns from the merged partials on the driver (bounded:
    n_keys rows). ``columns`` prunes the parquet read."""
    hows = {c[1] for c in merge}
    bad = hows - {"sum", "min", "max"}
    if bad:
        raise ValueError(f"unsupported merge kinds {sorted(bad)}")
    if name in AGG_REGISTRY:
        raise ValueError(f"aggregation {name!r} already registered")
    AGG_REGISTRY[name] = {
        "partial": partial,
        "merge": list(merge),
        "finalize": finalize,
        "columns": columns,
        "key": key,
    }


def run_aggregation(name: str, sf_dir: str) -> pa.Table:
    """Run a registered aggregation: read -> map_batches(partial) ->
    ONE groupby shuffle with the declared sum/min/max combines ->
    driver finalize over n_keys rows -> Arrow table sorted by key."""
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    if name not in AGG_REGISTRY:
        raise KeyError(
            f"unknown aggregation {name!r} "
            f"(registered: {sorted(AGG_REGISTRY)})"
        )
    spec = AGG_REGISTRY[name]
    kinds = {"sum": Sum, "min": Min, "max": Max}
    aggs = [kinds[how](col, alias_name=alias)
            for col, how, alias in spec["merge"]]
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=spec["columns"]
    )
    rows = (
        ds.map_batches(spec["partial"], batch_format="pyarrow")
        .groupby(spec["key"])
        .aggregate(*aggs)
        .take_all()  # bounded: n_keys rows
    )
    if spec["finalize"] is not None:
        rows = spec["finalize"](rows)
    rows.sort(key=lambda r: r[spec["key"]])
    if not rows:
        return pa.table({})
    cols = list(rows[0].keys())
    return pa.table({c: pa.array([r[c] for r in rows]) for c in cols})


def _spread_partial(t: pa.Table) -> pa.Table:
    """Built-in registered example: per event_type cents spread."""
    c = _cents(t)
    g = (
        pa.table({"key": t.column("event_type"), "cents": c})
        .group_by(["key"])
        .aggregate([("cents", "min"), ("cents", "max"), ([], "count_all")])
    )
    return pa.table(
        {
            "key": g.column("key"),
            "lo": g.column("cents_min").cast(pa.int64()),
            "hi": g.column("cents_max").cast(pa.int64()),
            "n": g.column("count_all").cast(pa.int64()),
        }
    )


def _spread_finalize(rows: "list[dict]") -> "list[dict]":
    return [
        {
            "key": r["key"],
            "doc_count": r["n"],
            "min_cents": r["lo"],
            "max_cents": r["hi"],
            "spread_cents": r["hi"] - r["lo"],
        }
        for r in rows
    ]


register_aggregation(
    "spread",
    _spread_partial,
    [("lo", "min", "lo"), ("hi", "max", "hi"), ("n", "sum", "n")],
    finalize=_spread_finalize,
    columns=["event_type", "value"],
)


def spread_agg(sf_dir: str) -> pa.Table:
    """The built-in REGISTERED 'spread' aggregation run through the
    registry surface end-to-end (the se_tfidf pattern: prove the
    extension point with a shipped registration): per event_type
    (doc_count, min_cents, max_cents, spread_cents)."""
    return run_aggregation("spread", sf_dir)


def percentile_ranks_agg(
    sf_dir: str,
    values_cents: "tuple[int, ...]" = (2500, 10000),
    key: str = "event_type",
) -> pa.Table:
    """ES ``percentile_ranks`` — the INVERSE of ``percentiles``: for each
    given value, the percentage of the key's observations <= it. EXACT
    (ES runs t-digest): rank = 100 * count(x <= v) / n with an integer
    numerator, ONE double division — replayable verbatim. Same
    histogram scale shape as percentiles_agg.

    Returns (key, value_cents, pct).
    """
    import ray.data
    from ray.data.aggregate import Sum

    vs = sorted(set(int(v) for v in values_cents))
    if not vs:
        raise ValueError("percentile_ranks needs at least one value")

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({key: t.column(key), "cents": _cents(t)})
            .group_by([key, "cents"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                key: g.column(key),
                "cents": g.column("cents"),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    def per_key(t: pa.Table) -> pa.Table:
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(cents, kind="stable")
        cents, n = cents[order], n[order]
        cum = np.cumsum(n)
        total = int(cum[-1])
        le = [
            int(cum[np.searchsorted(cents, v, "right") - 1])
            if np.searchsorted(cents, v, "right") > 0 else 0
            for v in vs
        ]
        k = t.column(key)[0].as_py()
        return pa.table(
            {
                key: pa.array([k] * len(vs), pa.string()),
                "value_cents": pa.array(vs, pa.int64()),
                "pct": pa.array(
                    [(100.0 * c) / total for c in le], pa.float64()
                ),
            }
        )

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=[key, "value"])
    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key, "cents"])
        .aggregate(Sum("n", alias_name="n"))
    )
    rows = hist.groupby(key).map_groups(
        per_key, batch_format="pyarrow"
    ).take_all()
    rows.sort(key=lambda r: (r[key], r["value_cents"]))
    return pa.table(
        {
            key: pa.array([r[key] for r in rows], pa.string()),
            "value_cents": pa.array([r["value_cents"] for r in rows],
                                    pa.int64()),
            "pct": pa.array([r["pct"] for r in rows], pa.float64()),
        }
    )


def boxplot_agg(sf_dir: str, key: str = "event_type") -> pa.Table:
    """ES ``boxplot`` aggregation — EXACT: min / q1 / q2 / q3 / max per
    key with the repo's pinned discrete-quantile rule (DuckDB
    ``quantile_disc``: smallest element whose cumulative count reaches
    ceil(q*n); ES approximates with t-digest). Histogram scale shape.

    Returns (key, min_cents, q1_cents, q2_cents, q3_cents, max_cents).
    """
    t = percentiles_agg(sf_dir, percents=(0, 25, 50, 75, 100), key=key)
    df = t.to_pandas().pivot(index=key, columns="percent",
                             values="value_cents").reset_index()
    return pa.table(
        {
            key: pa.array(df[key].tolist(), pa.string()),
            "min_cents": pa.array(df[0].tolist(), pa.int64()),
            "q1_cents": pa.array(df[25].tolist(), pa.int64()),
            "q2_cents": pa.array(df[50].tolist(), pa.int64()),
            "q3_cents": pa.array(df[75].tolist(), pa.int64()),
            "max_cents": pa.array(df[100].tolist(), pa.int64()),
        }
    )


def ttest_agg(
    sf_dir: str, group_a: str = "click", group_b: str = "view"
) -> pa.Table:
    """ES ``t_test`` aggregation (heteroscedastic / Welch, the ES
    default): the t statistic between two event_type groups' cents,
    derived from EXACT int64 moments (n, Σx, Σx²) in a FIXED double
    expression tree — sample variance v = (n·Σx² - Σx·Σx) / (n·(n-1)),
    t = (m1 - m2) / sqrt(v1/n1 + v2/n2) — every op correctly-rounded
    IEEE and replayed with the identical tree in SQL, rounded to 6.

    Returns one row (n_a, n_b, t_r) plus the raw moments.
    """
    import ray.data
    from ray.data.aggregate import Sum

    if group_a == group_b:
        raise ValueError("t_test needs two distinct groups")

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t).to_numpy(zero_copy_only=False)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        out = []
        for g in (group_a, group_b):
            m = et == g
            out.append((g, int(m.sum()), int(c[m].sum()),
                        int((c[m] * c[m]).sum())))
        return pa.table(
            {
                "grp": pa.array([o[0] for o in out], pa.string()),
                "n": pa.array([o[1] for o in out], pa.int64()),
                "sx": pa.array([o[2] for o in out], pa.int64()),
                "sxx": pa.array([o[3] for o in out], pa.int64()),
            }
        )

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])
    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("grp")
        .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                   Sum("sxx", alias_name="sxx"))
        .take_all()
    )
    mom = {r["grp"]: r for r in rows}
    a, b = mom[group_a], mom[group_b]
    if a["n"] < 2 or b["n"] < 2:
        raise ValueError("t_test needs >= 2 observations per group")

    def stats(r):
        n = np.float64(r["n"])
        sx = np.float64(r["sx"])
        m = sx / n
        v = (n * np.float64(r["sxx"]) - sx * sx) / (n * (n - 1.0))
        return n, m, v

    na, ma, va = stats(a)
    nb, mb, vb = stats(b)
    t_stat = (ma - mb) / np.sqrt(va / na + vb / nb)
    return pa.table(
        {
            "n_a": pa.array([a["n"]], pa.int64()),
            "n_b": pa.array([b["n"]], pa.int64()),
            "sx_a": pa.array([a["sx"]], pa.int64()),
            "sx_b": pa.array([b["sx"]], pa.int64()),
            "sxx_a": pa.array([a["sxx"]], pa.int64()),
            "sxx_b": pa.array([b["sxx"]], pa.int64()),
            "t_r": pa.array([round(float(t_stat), 6)], pa.float64()),
        }
    )


def _first_day_counts(t: pa.Table) -> pa.Table:
    g = (
        pa.table({"first_day": t.column("first_day")})
        .group_by(["first_day"])
        .aggregate([([], "count_all")])
    )
    return pa.table(
        {
            "first_day": g.column("first_day"),
            "n": g.column("count_all").cast(pa.int64()),
        }
    )


def cumulative_cardinality_agg(sf_dir: str) -> pa.Table:
    """ES ``cumulative_cardinality`` pipeline aggregation over a daily
    date_histogram of ``events``: per day, the number of distinct
    ``user_id`` seen so far (cumulative across buckets).

    Distributed identity that makes this shuffle-cheap at any scale:
    cumulative-distinct(day d) = Σ_{d' <= d} |{users whose FIRST day is
    d'}| — so the engine computes ``groupby(user_id).min(day)`` (one
    user-cardinality shuffle of (user, day) int pairs, never the raw
    events), bucket-counts the first days, and runs the cumulative sum
    on the driver over the bounded day list. A per-day HLL union (the ES
    mechanics) is the approximate sibling — this is the exact form.

    Returns (epoch_day, doc_count, n_new_users, n_cumulative_users).
    """
    import ray.data
    from ray.data.aggregate import Min, Sum

    def user_partial(t: pa.Table) -> pa.Table:
        d = pc.cast(t.column("ts"), pa.int64()).to_numpy() // US_DAY
        g = (
            pa.table(
                {"user_id": t.column("user_id"),
                 "day": pa.array(d, pa.int64())}
            )
            .group_by(["user_id"])
            .aggregate([("day", "min")])
        )
        return pa.table(
            {"user_id": g.column("user_id"), "day": g.column("day_min")}
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )
    # per-day doc counts: the shared daily-histogram machinery
    day_rows = [
        {"epoch_day": d, "doc_count": c} for d, c in _daily_counts(sf_dir)
    ]
    first_days = (
        ds.map_batches(user_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("day", alias_name="first_day"))
        .map_batches(_first_day_counts, batch_format="pyarrow")
        .groupby("first_day")
        .aggregate(Sum("n", alias_name="n_new_users"))
        .take_all()  # bounded: n_days rows
    )
    new_by_day = {r["first_day"]: r["n_new_users"] for r in first_days}
    day_rows.sort(key=lambda r: r["epoch_day"])
    days = [r["epoch_day"] for r in day_rows]
    new = [int(new_by_day.get(d, 0)) for d in days]
    cum = np.cumsum(new, dtype=np.int64) if days else np.empty(0, np.int64)
    return pa.table(
        {
            "epoch_day": pa.array(days, pa.int64()),
            "doc_count": pa.array(
                [r["doc_count"] for r in day_rows], pa.int64()
            ),
            "n_new_users": pa.array(new, pa.int64()),
            "n_cumulative_users": pa.array(cum, pa.int64()),
        }
    )


def top_metrics_agg(sf_dir: str) -> pa.Table:
    """ES ``top_metrics`` aggregation: per ``event_type`` bucket, the
    metric value carried by the top-sorted document — here sort =
    (ts DESC, event_id DESC) (the event_id leg makes the ES sort a total
    order), metric = the event's cents.

    Scale shape: per-batch argmax partial (one row per type per batch via
    a vectorized lexsort group-head pick), bounded driver fold over
    n_types x n_blocks rows. Returns
    (event_type, top_ts_us, top_event_id, top_value_cents).
    """
    import ray.data

    def partial(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        eid = t.column("event_id").to_numpy()
        c = _cents(t).to_numpy(zero_copy_only=False)
        # sort: type asc, ts desc, event_id desc -> first row per type
        order = np.lexsort((-eid, -ts, et))
        et, ts, eid, c = et[order], ts[order], eid[order], c[order]
        head = np.r_[True, et[1:] != et[:-1]]
        return pa.table(
            {
                "event_type": pa.array(et[head], pa.string()),
                "top_ts_us": pa.array(ts[head], pa.int64()),
                "top_event_id": pa.array(eid[head], pa.int64()),
                "top_value_cents": pa.array(c[head], pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "event_type", "value"],
    )
    best: "dict[str, tuple[int, int, int]]" = {}
    for b in (
        ds.map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ):
        for r in b.to_pylist():  # bounded: n_types rows per block
            key = (r["top_ts_us"], r["top_event_id"], r["top_value_cents"])
            cur = best.get(r["event_type"])
            if cur is None or key[:2] > cur[:2]:
                best[r["event_type"]] = key
    types = sorted(best)
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "top_ts_us": pa.array([best[t][0] for t in types], pa.int64()),
            "top_event_id": pa.array(
                [best[t][1] for t in types], pa.int64()
            ),
            "top_value_cents": pa.array(
                [best[t][2] for t in types], pa.int64()
            ),
        }
    )


def string_stats_agg(sf_dir: str) -> pa.Table:
    """ES ``string_stats`` aggregation over ``documents.text`` bucketed by
    ``source``: count, min/max/avg length (chars). ``avg_length`` is the
    single IEEE division of two exact int64s (DuckDB replays it
    bit-for-bit); the Shannon-entropy field is intentionally omitted —
    its Σ p·log p is an accumulation-order-dependent transcendental sum,
    the one thing the repo's exact-oracle discipline excludes.

    Scale shape: per-batch Arrow group_by partial, ONE source-cardinality
    shuffle, driver sees n_sources rows.
    """
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        ln = pc.utf8_length(t.column("text")).cast(pa.int64())
        g = (
            pa.table({"source": t.column("source"), "len": ln})
            .group_by(["source"])
            .aggregate(
                [([], "count_all"), ("len", "sum"), ("len", "min"),
                 ("len", "max")]
            )
        )
        return pa.table(
            {
                "source": g.column("source"),
                "n": g.column("count_all").cast(pa.int64()),
                "s": g.column("len_sum").cast(pa.int64()),
                "mn": g.column("len_min").cast(pa.int64()),
                "mx": g.column("len_max").cast(pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )
    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n", alias_name="count"),
            Sum("s", alias_name="sum_length"),
            Min("mn", alias_name="min_length"),
            Max("mx", alias_name="max_length"),
        )
        .take_all()  # bounded: n_sources rows
    )
    rows.sort(key=lambda r: r["source"])
    return pa.table(
        {
            "source": pa.array([r["source"] for r in rows], pa.string()),
            "count": pa.array([r["count"] for r in rows], pa.int64()),
            "min_length": pa.array(
                [r["min_length"] for r in rows], pa.int64()
            ),
            "max_length": pa.array(
                [r["max_length"] for r in rows], pa.int64()
            ),
            "sum_length": pa.array(
                [r["sum_length"] for r in rows], pa.int64()
            ),
            "avg_length": pa.array(
                [float(np.float64(r["sum_length"]) / np.float64(r["count"]))
                 for r in rows],
                pa.float64(),
            ),
        }
    )


def normalize_sort_agg(
    sf_dir: str, from_: int = 1, size: int = 3
) -> pa.Table:
    """ES ``normalize`` + ``bucket_sort`` pipeline aggregations composed
    over a terms(event_type) histogram: per bucket doc_count and cents
    sum, ``pct_of_total`` = doc_count / total (the percent_of_sum
    normalizer as the single IEEE division of two exact int64s), then
    bucket_sort(sort=[sum_value_cents DESC, event_type ASC], from=1,
    size=3) — ES's coordinator-side bucket pagination, applied on the
    driver over the bounded bucket list.

    Returns (event_type, doc_count, sum_value_cents, pct_of_total,
    bucket_rank) for the paginated buckets only.
    """

    import ray.data

    if from_ < 0 or size <= 0:
        raise ValueError("bucket_sort needs from >= 0 and size > 0")

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"event_type": t.column("event_type"),
                      "cents": _cents(t)})
            .group_by(["event_type"])
            .aggregate([([], "count_all"), ("cents", "sum")])
        )
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "n": g.column("count_all").cast(pa.int64()),
                "cents": g.column("cents_sum").cast(pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )
    rows = _sum_by_key(ds, partial, ["event_type"])
    total = sum(r["doc_count"] for r in rows)
    rows.sort(key=lambda r: (-r["sum_value_cents"], r["event_type"]))
    page = rows[from_:from_ + size]
    return pa.table(
        {
            "event_type": pa.array(
                [r["event_type"] for r in page], pa.string()
            ),
            "doc_count": pa.array(
                [r["doc_count"] for r in page], pa.int64()
            ),
            "sum_value_cents": pa.array(
                [r["sum_value_cents"] for r in page], pa.int64()
            ),
            "pct_of_total": pa.array(
                [float(np.float64(r["doc_count"]) / np.float64(total))
                 for r in page],
                pa.float64(),
            ),
            "bucket_rank": pa.array(
                list(range(from_ + 1, from_ + 1 + len(page))), pa.int32()
            ),
        }
    )


US_DAY = 86_400_000_000


def _daily_counts(sf_dir: str) -> "list[tuple[int, int]]":
    """Sorted (epoch_day, doc_count) bucket list — per-batch Arrow
    group_by partial, ONE day-cardinality shuffle, bounded driver rows
    (the date-histogram machinery the *_bucket pipeline aggs fold over).
    """
    import ray.data
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        d = pc.cast(t.column("ts"), pa.int64()).to_numpy() // US_DAY
        g = (
            pa.table({"epoch_day": pa.array(d, pa.int64())})
            .group_by(["epoch_day"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "epoch_day": g.column("epoch_day"),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    rows = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("epoch_day")
        .aggregate(Sum("n", alias_name="doc_count"))
        .take_all()  # bounded: n_days rows
    )
    return sorted((int(r["epoch_day"]), int(r["doc_count"])) for r in rows)


def bucket_stats_agg(sf_dir: str) -> pa.Table:
    """ES ``stats_bucket`` + ``max_bucket`` + ``min_bucket`` pipeline
    aggregations over the daily date histogram: min/max/sum/avg of the
    per-day doc counts plus the bucket KEYS holding the extremes
    (ES ties broken here by smallest epoch_day — a documented total
    order; ES returns a key list on ties). avg is the single IEEE
    division of two exact int64s. One row out.
    """
    days = _daily_counts(sf_dir)
    if not days:
        return pa.table({"n_buckets": pa.array([], pa.int64())})
    counts = np.array([c for _, c in days], dtype=np.int64)
    keys = np.array([d for d, _ in days], dtype=np.int64)
    return pa.table(
        {
            "n_buckets": pa.array([len(days)], pa.int64()),
            "min_count": pa.array([int(counts.min())], pa.int64()),
            "max_count": pa.array([int(counts.max())], pa.int64()),
            "sum_count": pa.array([int(counts.sum())], pa.int64()),
            "avg_count": pa.array(
                [float(np.float64(counts.sum()) / np.float64(len(days)))],
                pa.float64(),
            ),
            "argmax_day": pa.array(
                [int(keys[np.lexsort((keys, -counts))[0]])], pa.int64()
            ),
            "argmin_day": pa.array(
                [int(keys[np.lexsort((keys, counts))[0]])], pa.int64()
            ),
        }
    )


def percentiles_bucket_agg(
    sf_dir: str, percents: "tuple[int, ...]" = (25, 50, 75, 90)
) -> pa.Table:
    """ES ``percentiles_bucket`` pipeline aggregation: exact discrete
    percentiles OF the daily doc-count bucket values (DuckDB
    quantile_disc rule — sorted ascending, index ceil(p/100*n) clamped
    to >= 1, the same rule `percentiles_agg` uses on raw cents).
    Returns (percent, value).
    """
    import math

    days = _daily_counts(sf_dir)
    counts = sorted(c for _, c in days)
    n = len(counts)
    if n == 0:
        raise ValueError("percentiles_bucket: no buckets")
    vals = [
        counts[max(math.ceil((p / 100.0) * n), 1) - 1] for p in percents
    ]
    return pa.table(
        {
            "percent": pa.array(list(percents), pa.int64()),
            "value": pa.array(vals, pa.int64()),
        }
    )


def ohlc_agg(sf_dir: str) -> pa.Table:
    """Hourly OHLC bars over event cents (the classic time-series
    downsample): open = value at the (ts ASC, event_id ASC) head of the
    bucket, close = at the tail, high/low = exact int64 extremes. The
    open/close picks are decomposable argmin/argmax — per-batch partials
    carry one candidate row per bucket, the per-bucket merge re-applies
    the same total order. Returns (window_start, n_events, open_cents,
    high_cents, low_cents, close_cents).
    """
    import ray.data

    def partial(t: pa.Table) -> pa.Table:
        w = pc.cast(
            pc.floor_temporal(t.column("ts"), unit="hour"), pa.int64()
        ).to_numpy()
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        eid = t.column("event_id").to_numpy()
        c = _cents(t).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, w))
        w, ts, eid, c = w[order], ts[order], eid[order], c[order]
        starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
        ends = np.r_[starts[1:], len(w)] - 1
        lo = np.minimum.reduceat(c, starts)
        hi = np.maximum.reduceat(c, starts)
        n = np.diff(np.r_[starts, len(w)]).astype(np.int64)
        return pa.table(
            {
                "window_us": pa.array(w[starts], pa.int64()),
                "n": pa.array(n, pa.int64()),
                "ots": pa.array(ts[starts], pa.int64()),
                "oid": pa.array(eid[starts], pa.int64()),
                "open_c": pa.array(c[starts], pa.int64()),
                "cts": pa.array(ts[ends], pa.int64()),
                "cid": pa.array(eid[ends], pa.int64()),
                "close_c": pa.array(c[ends], pa.int64()),
                "lo": pa.array(lo, pa.int64()),
                "hi": pa.array(hi, pa.int64()),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        ots = g.column("ots").to_numpy()
        oid = g.column("oid").to_numpy()
        cts = g.column("cts").to_numpy()
        cid = g.column("cid").to_numpy()
        i = np.lexsort((oid, ots))[0]
        j = np.lexsort((-cid, -cts))[0]
        return pa.table(
            {
                "window_us": pa.array(
                    [g.column("window_us")[0].as_py()], pa.int64()
                ),
                "n_events": pa.array(
                    [int(g.column("n").to_numpy().sum())], pa.int64()
                ),
                "open_cents": pa.array(
                    [g.column("open_c")[int(i)].as_py()], pa.int64()
                ),
                "high_cents": pa.array(
                    [int(g.column("hi").to_numpy().max())], pa.int64()
                ),
                "low_cents": pa.array(
                    [int(g.column("lo").to_numpy().min())], pa.int64()
                ),
                "close_cents": pa.array(
                    [g.column("close_c")[int(j)].as_py()], pa.int64()
                ),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "value"]
    )
    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("window_us")
        .map_groups(merge, batch_format="pyarrow")
        .take_all()  # bounded: n_windows rows
    )
    rows.sort(key=lambda r: r["window_us"])
    return pa.table(
        {
            "window_start": pa.array(
                [r["window_us"] for r in rows], pa.int64()
            ).cast(pa.timestamp("us")),
            "n_events": pa.array([r["n_events"] for r in rows], pa.int64()),
            "open_cents": pa.array(
                [r["open_cents"] for r in rows], pa.int64()
            ),
            "high_cents": pa.array(
                [r["high_cents"] for r in rows], pa.int64()
            ),
            "low_cents": pa.array([r["low_cents"] for r in rows], pa.int64()),
            "close_cents": pa.array(
                [r["close_cents"] for r in rows], pa.int64()
            ),
        }
    )


def anomaly_3sigma_agg(sf_dir: str) -> pa.Table:
    """3-sigma bucket anomaly flags over the daily date histogram —
    entirely EXACT-INTEGER: with n buckets, count sum S and sum of
    squares Q, the population rule |c - S/n| > 3*sigma (sigma^2 =
    (n*Q - S*S)/n^2) squares and cross-multiplies to

        (n*c - S)^2  >  9 * (n*Q - S*S)

    — no division, no sqrt, no float anywhere. Returns
    (epoch_day, n_events, is_anomaly).
    """
    days = _daily_counts(sf_dir)
    n = len(days)
    if n == 0:
        raise ValueError("anomaly_3sigma: no buckets")
    counts = [c for _, c in days]
    S = sum(counts)
    Q = sum(c * c for c in counts)
    rhs = 9 * (n * Q - S * S)
    flags = [1 if (n * c - S) * (n * c - S) > rhs else 0 for c in counts]
    return pa.table(
        {
            "epoch_day": pa.array([d for d, _ in days], pa.int64()),
            "n_events": pa.array(counts, pa.int64()),
            "is_anomaly": pa.array(flags, pa.int64()),
        }
    )


def heatmap_agg(sf_dir: str) -> pa.Table:
    """Activity heatmap: event counts per (day-of-week, hour-of-day)
    cell — the classic dashboard downsample. Both coordinates derive by
    PURE INTEGER arithmetic from epoch microseconds (dow 0 = Monday via
    ``(epoch_day + 3) % 7`` — 1970-01-01 was a Thursday; hour via
    ``(epoch_us // 3600e6) % 24``), so no calendar library sits between
    the engine and the oracle. Per-batch bincount over the packed
    dow*24+hour cell, ONE 168-cell shuffle.

    Returns (dow, hour, n_events) for non-empty cells.
    """
    import ray.data
    from ray.data.aggregate import Sum

    US_HOUR = 3_600_000_000

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        day = us // US_DAY
        dow = (day + 3) % 7
        hour = (us // US_HOUR) % 24
        cell = dow * 24 + hour
        cnt = np.bincount(cell, minlength=168).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "cell": pa.array(nz, pa.int64()),
                "n": pa.array(cnt[nz], pa.int64()),
            }
        )

    rows = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n", alias_name="n_events"))
        .take_all()  # bounded: <= 168 rows
    )
    rows.sort(key=lambda r: r["cell"])
    return pa.table(
        {
            "dow": pa.array([r["cell"] // 24 for r in rows], pa.int64()),
            "hour": pa.array([r["cell"] % 24 for r in rows], pa.int64()),
            "n_events": pa.array(
                [r["n_events"] for r in rows], pa.int64()
            ),
        }
    )
