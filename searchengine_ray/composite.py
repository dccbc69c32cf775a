"""Composite aggregation — the Elasticsearch ``composite`` aggregation
analog: paginate the BUCKETS of a multi-source terms aggregation in
deterministic key order with an ``after`` cursor.

ES mandates composite (not ``terms`` with a huge ``size``) when a client
must stream ALL buckets of a high-cardinality aggregation: buckets come
back sorted by the source-key tuple, ``size`` at a time, and the client
resumes with ``after=<last key tuple>``. Page N+1 contains keys STRICTLY
greater than ``after`` (tuple order), so successive pages tile the full
bucket list with no overlap and no gap.

Scale shape (the reason ES designed it this way, reproduced here):
- the ``after`` cursor filter is applied INSIDE every scan task before
  anything aggregates — each shard drops its own before-cursor rows, so
  page depth never inflates the shuffle (search_after's argument, applied
  to buckets);
- rows pre-aggregate per batch with an Arrow ``group_by`` (combiner), so
  the one narrow shuffle carries at most (distinct keys per batch) rows,
  never corpus rows;
- the final sort + ``limit(size)`` runs over bucket-cardinality partials
  and only ``size`` buckets ever reach the driver.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _after_expr(keys: "list[str]", after: tuple):
    """Vectorized lexicographic (keys) > after as a pyarrow expression
    over dataset columns: k1>a1 OR (k1==a1 AND (k2>a2 OR ...))."""
    k, a = keys[0], after[0]
    gt = pc.field(k) > a
    if len(keys) == 1:
        return gt
    return gt | ((pc.field(k) == a) & _after_expr(keys[1:], after[1:]))


def composite_agg(
    sf_dir: str,
    sources: "tuple[str, ...]" = ("lang", "source"),
    value_col: str = "n_chars",
    size: int = 10,
    after: "tuple | None" = None,
) -> pa.Table:
    """One page of ``size`` buckets over ``documents``, keyed by the
    ``sources`` tuple in ascending order, each bucket carrying
    ``doc_count`` and ``sum_<value_col>``; pass the last returned key
    tuple as ``after`` to fetch the next page."""
    import ray.data
    from ray.data.aggregate import Sum

    keys = list(sources)
    if after is not None and len(after) != len(keys):
        raise ValueError(
            f"after key arity {len(after)} != sources arity {len(keys)}"
        )
    sum_name = f"sum_{value_col}"

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=keys + [value_col],
        # cursor pushdown: before-cursor rows never leave the scan
        **(
            {"filter": _after_expr(keys, after)}
            if after is not None
            else {}
        ),
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate(
            [(value_col, "sum"), (value_col, "count")]
        )
        return pa.table(
            {
                **{k: g.column(k) for k in keys},
                sum_name: g.column(f"{value_col}_sum").cast(pa.int64()),
                "doc_count": g.column(f"{value_col}_count").cast(
                    pa.int64()
                ),
            }
        )

    page = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(
            Sum(sum_name, alias_name=sum_name),
            Sum("doc_count", alias_name="doc_count"),
        )
        .sort(keys)
        .limit(size)
        .take_all()  # bounded: exactly the page's `size` bucket rows
    )
    return pa.table(
        {
            **{
                k: pa.array([r[k] for r in page], pa.string())
                for k in keys
            },
            "doc_count": pa.array(
                [r["doc_count"] for r in page], pa.int64()
            ),
            sum_name: pa.array([r[sum_name] for r in page], pa.int64()),
        }
    )


def _group_topk(
    t: pa.Table, bucket: str, sort_col: str, k: int
) -> pa.Table:
    """Vectorized per-bucket top-k of one table: rows ranked by
    (``sort_col`` DESC, doc_id ASC) within each ``bucket`` value, first
    ``k`` kept. One lexsort + one boundary scan — no Python per row."""
    import numpy as np

    if t.num_rows == 0:
        return t
    b = t.column(bucket).to_numpy(zero_copy_only=False)
    v = t.column(sort_col).to_numpy()
    d = t.column("doc_id").to_numpy()
    order = np.lexsort((d, -v, b))  # bucket asc, value desc, doc asc
    bs = b[order]
    starts = np.flatnonzero(
        np.concatenate(([True], bs[1:] != bs[:-1]))
    )
    rank = np.arange(len(bs)) - np.repeat(
        starts, np.diff(np.concatenate((starts, [len(bs)])))
    )
    keep = order[rank < k]
    return t.take(pa.array(np.sort(keep)))


def top_hits(
    sf_dir: str,
    bucket: str = "lang",
    sort_col: str = "n_chars",
    k: int = 3,
) -> pa.Table:
    """The ES ``top_hits`` sub-aggregation: for every ``bucket`` value,
    the top ``k`` documents by (``sort_col`` DESC, doc_id ASC), returned
    as (bucket, doc_id, sort_col, rnk).

    Scale shape: each batch reduces to at most k rows PER BUCKET VALUE
    seen in the batch (the same partial-top-k argument as ANN's
    _merge_topk — a candidate outside its batch's bucket top-k can never
    enter the global top-k), so the groupby shuffle moves k x
    buckets-per-batch rows, never the corpus; the final per-bucket cut
    runs distributed in map_groups over those partials."""
    import numpy as np
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=[bucket, "doc_id", sort_col],
    )

    def partial(t: pa.Table) -> pa.Table:
        return _group_topk(t, bucket, sort_col, k)

    def final(t: pa.Table) -> pa.Table:
        out = _group_topk(t, bucket, sort_col, k)
        b = out.column(bucket).to_numpy(zero_copy_only=False)
        v = out.column(sort_col).to_numpy()
        d = out.column("doc_id").to_numpy()
        order = np.lexsort((d, -v, b))
        out = out.take(pa.array(order))
        return out.append_column(
            "rnk",
            pa.array(np.arange(1, out.num_rows + 1, dtype=np.int64)),
        )

    hits = ds.map_batches(partial, batch_format="pyarrow").groupby(
        bucket
    ).map_groups(final, batch_format="pyarrow")
    # bounded driver fold: k x n_buckets rows, ordered by bucket
    parts = [
        pa.table(b) for b in hits.iter_batches(batch_format="pyarrow")
    ]
    if not parts:
        return pa.table({})
    return pa.concat_tables(parts).sort_by(
        [(bucket, "ascending"), ("rnk", "ascending")]
    )


def extended_stats(
    sf_dir: str, bucket: str = "lang", value_col: str = "n_chars"
) -> pa.Table:
    """The ES ``extended_stats`` aggregation per bucket: count, sum, min,
    max, sum_of_squares as EXACT int64 (value_col is integer; squares sum
    without float error — int64 holds ~9e12 rows of 1e3-char docs), plus
    avg and variance derived from those integers in one double expression
    each (variance = (sq - s*s/c)/c, the textbook population form ES
    documents), rounded to 6.

    Scale shape: per-batch Arrow group_by partials (count/sum/min/max/
    sumsq are all decomposable), one bucket-cardinality shuffle, driver
    sees n_buckets rows."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=[bucket, value_col]
    )

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col).cast(pa.int64())
        t2 = pa.table(
            {
                bucket: t.column(bucket),
                "v": v,
                "vsq": pc.multiply_checked(v, v),  # loud on overflow
            }
        )
        g = t2.group_by(bucket).aggregate(
            [("v", "count"), ("v", "sum"), ("v", "min"), ("v", "max"),
             ("vsq", "sum")]
        )
        return pa.table(
            {
                bucket: g.column(bucket),
                "count": g.column("v_count").cast(pa.int64()),
                "sum": g.column("v_sum").cast(pa.int64()),
                "min": g.column("v_min").cast(pa.int64()),
                "max": g.column("v_max").cast(pa.int64()),
                "sum_sq": g.column("vsq_sum").cast(pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(bucket)
        .aggregate(
            Sum("count", alias_name="count"),
            Sum("sum", alias_name="sum"),
            Min("min", alias_name="min"),
            Max("max", alias_name="max"),
            Sum("sum_sq", alias_name="sum_sq"),
        )
        .take_all()  # bounded: n_buckets rows
    )
    rows.sort(key=lambda r: r[bucket])
    c = np.array([r["count"] for r in rows], dtype=np.float64)
    s = np.array([r["sum"] for r in rows], dtype=np.float64)
    sq = np.array([r["sum_sq"] for r in rows], dtype=np.float64)
    avg = s / c
    variance = (sq - (s * s) / c) / c
    return pa.table(
        {
            bucket: pa.array([r[bucket] for r in rows], pa.string()),
            "count": pa.array([r["count"] for r in rows], pa.int64()),
            "sum": pa.array([r["sum"] for r in rows], pa.int64()),
            "min": pa.array([r["min"] for r in rows], pa.int64()),
            "max": pa.array([r["max"] for r in rows], pa.int64()),
            "sum_sq": pa.array([r["sum_sq"] for r in rows], pa.int64()),
            "avg_r": pc.round(pa.array(avg, pa.float64()), ndigits=6),
            "variance_r": pc.round(
                pa.array(variance, pa.float64()), ndigits=6
            ),
        }
    )
