"""Relational pipelines over the TPC-H-ish tables: the generic groupby /
broadcast-join / sort-limit building blocks the engine composes, expressed
the Ray-Data-native way (column-pruned reads, vectorized pyarrow kernels,
partial aggregation before the shuffle, broadcast dimension joins)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def pricing_summary(sf_dir: str, cutoff: str = "1998-09-01"):
    """TPC-H Q1-shaped aggregate: per (returnflag, linestatus) sums/avgs over
    lineitem shipped before ``cutoff``. Doubles rounded to 4."""
    import ray.data
    from ray.data.aggregate import Count, Mean, Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("l_shipdate"), pa.scalar(pd.Timestamp(cutoff))))
        disc_price = pc.multiply(
            t.column("l_extendedprice"), pc.subtract(1.0, t.column("l_discount"))
        )
        # per-row integer quantization -> order-independent integer sums that
        # the SQL oracle reproduces exactly
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty": pc.cast(pc.round(t.column("l_quantity"), round_mode="half_towards_infinity"), pa.int64()),
                "disc_price_cents": pc.cast(
                    pc.round(pc.multiply(disc_price, 100.0), round_mode="half_towards_infinity"), pa.int64()
                ),
                "disc_centi": pc.cast(
                    pc.round(pc.multiply(t.column("l_discount"), 100.0), round_mode="half_towards_infinity"), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("disc_price_cents", alias_name="sum_disc_price_cents"),
            Sum("disc_centi", alias_name="sum_disc_centi"),
            Count(alias_name="count_order"),
        )
    )


def orders_by_nation(sf_dir: str):
    """orders ⨝ customer ⨝ nation rolled up to nation: broadcast the (small)
    dimension maps once with ray.put, join inside map_batches — no shuffle
    join for a dimension lookup. Returns (n_name, n_orders, total_price)."""
    import ray
    import ray.data
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count, Sum

    import numpy as np

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    # broadcast sorted numpy key/code arrays, not a Python dict: a dict of
    # 150k*sf boxed entries is slow to (de)serialize and to probe per row;
    # searchsorted over the sorted custkey array is one vectorized pass
    # (same pattern as shipping_priority's semi-join)
    order = np.argsort(cust.column("c_custkey").to_numpy())
    ckeys = cust.column("c_custkey").to_numpy()[order]
    cnation = cust.column("c_nationkey").to_numpy()[order].astype(np.int64)
    names = nation.column("n_name").to_numpy(zero_copy_only=False)
    nkeys = nation.column("n_nationkey").to_numpy()
    # nation codes indexed by position after an argsort lookup
    norder = np.argsort(nkeys)
    cref = ray.put((ckeys, cnation, nkeys[norder], names[norder]))

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def attach(t: pa.Table) -> pa.Table:
        ck, cn, nk, nm = ray.get(cref)
        c = t.column("o_custkey").to_numpy()
        loc = np.searchsorted(ck, c)
        if np.any((loc >= len(ck)) | (ck[np.clip(loc, 0, len(ck) - 1)] != c)):
            raise KeyError("order references unknown custkey")
        nat = cn[loc]
        nloc = np.searchsorted(nk, nat)
        return pa.table(
            {
                "n_name": pa.array(nm[nloc], type=pa.string()),
                "price_cents": pc.cast(
                    pc.round(pc.multiply(t.column("o_totalprice"), 100.0), round_mode="half_towards_infinity"), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(attach, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(
            Count(alias_name="n_orders"),
            Sum("price_cents", alias_name="total_price_cents"),
        )
    )


def revenue_by_order_priority(sf_dir: str):
    """Large-large hash join: lineitem ⨝ orders on orderkey, rolled up to
    order priority. Uses Ray's hash-partitioned ``Dataset.join`` (both sides
    too big to broadcast at scale); revenue quantized per row to cents so
    the aggregate is order-independent. Returns
    (o_orderpriority, n_items, revenue_cents)."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def prep(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t.column("l_extendedprice"), pc.subtract(1.0, t.column("l_discount"))
        )
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "rev_cents": pc.cast(
                    pc.round(
                        pc.multiply(rev, 100.0), round_mode="half_towards_infinity"
                    ),
                    pa.int64(),
                ),
            }
        )

    li = li.map_batches(prep, batch_format="pyarrow")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=16,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    return (
        joined.groupby("o_orderpriority")
        .aggregate(
            Count(alias_name="n_items"), Sum("rev_cents", alias_name="revenue_cents")
        )
    )


def top_parts(sf_dir: str, k: int = 10):
    """Top-k partkeys by total shipped quantity: partial aggregation inside
    map_batches (combiner) -> small groupby -> sort desc -> limit. Returns
    (l_partkey, sum_qty)."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_quantity"]
    )

    def partial(t: pa.Table) -> pa.Table:
        # combiner: collapse the batch to one row per key before the shuffle;
        # quantities quantized to ints so sums are order-independent
        t = pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "qty": pc.cast(pc.round(t.column("l_quantity"), round_mode="half_towards_infinity"), pa.int64()),
            }
        )
        g = t.group_by("l_partkey").aggregate([("qty", "sum")])
        return g.rename_columns(["l_partkey", "qty"])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("qty", alias_name="sum_qty"))
        .sort(["sum_qty", "l_partkey"], descending=[True, False])
        .limit(k)
    )
    return out


def shipping_priority(sf_dir: str, segment: str = "BUILDING", k: int = 10):
    """TPC-H-Q3-shaped composition: broadcast semi-join (customer segment)
    -> large-large hash join (orders x lineitem) -> grouped revenue ->
    top-k. Revenue per row is quantized to integer cents BEFORE summing so
    the aggregate is order-independent and bit-exact vs the SQL oracle.
    Returns (l_orderkey, o_orderdate, revenue_cents) for the k highest-
    revenue urgent orders (o_orderdate < 1998-01-01 < l_shipdate).
    """
    import numpy as np
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    cutoff = np.datetime64("1998-01-01T00:00:00", "us")

    # small side: the segment's customer keys, broadcast once
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    keys = cust.filter(
        pc.equal(cust.column("c_mktsegment"), segment)
    ).column("c_custkey").to_numpy()
    keys_ref = ray.put(np.sort(keys))

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def filter_orders(t: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        date_ok = pc.less(t.column("o_orderdate"), pa.scalar(cutoff))
        cust_ok = pa.array(
            np.isin(t.column("o_custkey").to_numpy(), ks, assume_unique=False)
        )
        return t.filter(pc.and_(date_ok, cust_ok)).select(
            ["o_orderkey", "o_orderdate"]
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep_li(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("l_shipdate"), pa.scalar(cutoff)))
        rev = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(t.column("l_extendedprice"), 100.0),
                    pc.subtract(pa.scalar(1.0), t.column("l_discount")),
                ),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table(
            {"l_orderkey": t.column("l_orderkey"), "rev_cents": rev}
        )

    joined = li.map_batches(prep_li, batch_format="pyarrow").join(
        orders.map_batches(filter_orders, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=16,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    return (
        joined.groupby(["l_orderkey", "o_orderdate"])
        .aggregate(Sum("rev_cents", alias_name="revenue_cents"))
        .sort(["revenue_cents", "l_orderkey"], descending=[True, False])
        .limit(k)
    )


def top_orders_per_customer(sf_dir: str, k: int = 2):
    """Windowed ranking: the k highest-value orders per customer
    (row_number() OVER (PARTITION BY custkey ORDER BY price DESC) <= k).
    Ray Data has no window functions; customers hash-partition into
    input-scaled buckets (``partitioning.partition_count``) and every
    customer in a partition ranks vectorized after one in-partition sort —
    bounded dispatch regardless of customer count, and a bucket fits one
    worker at any input size. Prices quantize to integer cents BEFORE
    ranking so the order (and the SQL oracle's) is exact. Returns
    (o_custkey, o_orderkey, total_price_cents, rn).
    """
    import numpy as np
    import ray.data

    from .partitioning import partition_count

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_totalprice"],
    )
    nparts = partition_count(
        f"{sf_dir}/orders.parquet", ("o_custkey", "o_orderkey", "o_totalprice")
    )

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(
                pc.multiply(t.column("o_totalprice"), 100.0),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        kc = (t.column("o_custkey").to_numpy() % nparts).astype(np.int32)
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "o_orderkey": t.column("o_orderkey"),
                "total_price_cents": cents,
                "kc": pa.array(kc),
            }
        )

    def rank_partition(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "o_custkey": pa.array([], pa.int64()),
                "o_orderkey": pa.array([], pa.int64()),
                "total_price_cents": pa.array([], pa.int64()),
                "rn": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        t = t.sort_by(
            [
                ("o_custkey", "ascending"),
                ("total_price_cents", "descending"),
                ("o_orderkey", "ascending"),
            ]
        )
        cust = t.column("o_custkey").to_numpy()
        new_c = np.empty(len(cust), dtype=bool)
        new_c[0] = True
        new_c[1:] = cust[1:] != cust[:-1]
        starts = np.flatnonzero(new_c)
        rn = np.arange(len(cust), dtype=np.int64)
        rn -= np.repeat(starts, np.diff(np.append(starts, len(cust))))
        keep = rn < k
        out = t.filter(pa.array(keep)).drop_columns(["kc"])
        return out.append_column(
            "rn", pa.array(rn[keep] + 1, type=pa.int64())
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("kc")
        .map_groups(rank_partition, batch_format="pyarrow")
    )


def customers_without_orders(sf_dir: str, priority: str = "1-URGENT"):
    """TPC-H Q22-style anti-join block ("global sales opportunity"):
    customers with above-average positive account balance who have never
    placed a ``priority`` order, rolled up per nation. Three scale-safe
    stages:

    1. a 2-integer stats pass (sum/count of positive balances, exact
       cents) — the above-average predicate is then the INTEGER
       cross-multiplication ``cents * n_pos > sum_pos`` (no float
       threshold, no rounding ambiguity at the boundary);
    2. Ray's hash-partitioned ``Dataset.join(join_type="left_anti")``
       against the priority-filtered orders custkeys (the predicate is
       pushed into the parquet read; both sides shuffle by key — neither
       is broadcast, the Q22 shape at any scale);
    3. a nation-cardinality groupby of count + exact cents sum.

    Returns (c_nationkey, n_custs, sum_acctbal_cents).
    """
    import ray.data
    from ray.data.aggregate import Count, Sum

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )

    def cents(t: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.round(
                pc.multiply(t.column("c_acctbal"), 100.0),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "c_nationkey": t.column("c_nationkey"),
                "bal_cents": c,
            }
        )

    cust = cust.map_batches(cents, batch_format="pyarrow")

    def pos_partial(t: pa.Table) -> pa.Table:
        b = t.column("bal_cents").to_numpy()
        pos = b[b > 0]
        return pa.table(
            {
                "s": pa.array([int(pos.sum())], pa.int64()),
                "n": pa.array([len(pos)], pa.int64()),
            }
        )

    stats = cust.map_batches(pos_partial, batch_format="pyarrow").take_all()
    sum_pos = sum(r["s"] for r in stats)
    n_pos = sum(r["n"] for r in stats)
    if n_pos == 0:
        raise ValueError("no positive balances — Q22 predicate undefined")

    def above_avg(t: pa.Table) -> pa.Table:
        b = t.column("bal_cents").to_numpy()
        # exact integer cross-multiplication: bal > sum_pos / n_pos
        keep = b * np.int64(n_pos) > np.int64(sum_pos)
        return t.filter(pa.array(keep))

    rich = cust.map_batches(above_avg, batch_format="pyarrow")
    okeys = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey"],
            filter=pc.field("o_orderpriority") == priority,
        )
        .groupby("o_custkey")
        .count()
    )
    anti = rich.join(
        okeys,
        join_type="left_anti",
        num_partitions=16,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )
    return (
        anti.groupby("c_nationkey")
        .aggregate(
            Count(alias_name="n_custs"),
            Sum("bal_cents", alias_name="sum_acctbal_cents"),
        )
    )


def promo_revenue_share(sf_dir: str, month: str = "1995-09"):
    """TPC-H Q14 (promotion effect): the share of one month's revenue
    coming from PROMO parts. The part side broadcasts (dimension table —
    one ``ray.put`` of a partkey -> is_promo bitmap read inside every
    task); lineitem is a pruned scan with the ship-month predicate pushed
    to the parquet read. Revenue stays exact int64 cents; the final
    promo share is the single IEEE division ``100 * promo / total`` of
    two exact integers. Returns one row
    (promo_revenue_cents, total_revenue_cents, promo_share_pct).
    """
    import datetime as _dt

    import pyarrow.parquet as pq
    import ray
    import ray.data

    y, m = (int(x) for x in month.split("-"))
    lo = _dt.date(y, m, 1)
    hi = _dt.date(y + (m == 12), m % 12 + 1, 1)

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    )
    keys = part.column("p_partkey").to_numpy()
    promo = pc.starts_with(part.column("p_type"), "PROMO").to_numpy(
        zero_copy_only=False
    )
    order = np.argsort(keys)
    ref = ray.put((keys[order], promo[order]))

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
    )

    def partial(t: pa.Table) -> pa.Table:
        k, isp = ray.get(ref)
        rev = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(
                        t.column("l_extendedprice"),
                        pc.subtract(1.0, t.column("l_discount")),
                    ),
                    100.0,
                ),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ).to_numpy()
        pk = t.column("l_partkey").to_numpy()
        idx = np.searchsorted(k, pk)
        hit = isp[np.clip(idx, 0, len(k) - 1)] & (k[np.clip(idx, 0, len(k) - 1)] == pk)
        return pa.table(
            {
                "promo": pa.array([int(rev[hit].sum())], pa.int64()),
                "total": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    promo_c = sum(r["promo"] for r in rows)
    total_c = sum(r["total"] for r in rows)
    if total_c == 0:
        raise ValueError(f"no lineitems shipped in {month}")
    share = float(
        100.0 * np.float64(promo_c) / np.float64(total_c)
    )
    return pa.table(
        {
            "promo_revenue_cents": pa.array([promo_c], pa.int64()),
            "total_revenue_cents": pa.array([total_c], pa.int64()),
            "promo_share_pct": pa.array([round(share, 6)], pa.float64()),
        }
    )


def orders_with_returns(sf_dir: str, quarter_start: str = "1996-01-01"):
    """TPC-H Q4-shaped semi-join block: orders placed in one quarter
    that have AT LEAST ONE returned lineitem (l_returnflag = 'R'),
    counted per order priority — the EXISTS form, executed as Ray's
    hash-partitioned ``Dataset.join(join_type="left_semi")`` (the semi
    sibling of rel_custs_without_orders' left_anti; together they gate
    both correlated-subquery shapes). Both reads are column-pruned with
    their predicates pushed into the parquet scan; dedup of the
    lineitem keys happens in the same hash-partitioned pass.

    Returns (o_orderpriority, n_orders).
    """
    import datetime as _dt

    import ray.data
    from ray.data.aggregate import Count

    y, m, d = (int(x) for x in quarter_start.split("-"))
    lo = _dt.date(y, m, d)
    hi = _dt.date(y + (m > 9), (m + 2) % 12 + 1, 1)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=(pc.field("o_orderdate") >= lo)
        & (pc.field("o_orderdate") < hi),
    )
    returned = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey"],
            filter=pc.field("l_returnflag") == "R",
        )
        .groupby("l_orderkey")
        .count()
    )
    semi = orders.join(
        returned,
        join_type="left_semi",
        num_partitions=16,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )
    return semi.groupby("o_orderpriority").aggregate(
        Count(alias_name="n_orders")
    )
