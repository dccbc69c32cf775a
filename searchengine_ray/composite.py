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
