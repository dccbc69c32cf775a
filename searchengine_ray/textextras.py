"""Additional corpus/event analytics with exact SQL oracles: distinct-count
windows and n-gram frequency tables (the groupby-heavy shapes a training-
data pipeline reports on)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .analyze import tokenize


def hourly_unique_users(sf_dir: str):
    """Per hour: events + distinct users. Ray Data has no count-distinct
    aggregate, so dedupe (window, user) pairs first (a groupby), then count
    per window — two narrow shuffles instead of per-group sets."""
    import ray.data
    from ray.data.aggregate import Count

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def trunc(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": pc.floor_temporal(t.column("ts"), unit="hour"),
                "user_id": t.column("user_id"),
            }
        )

    pairs = (
        ds.map_batches(trunc, batch_format="pyarrow")
        .groupby(["window_start", "user_id"])
        .aggregate(Count(alias_name="n"))
    )
    return (
        pairs.groupby("window_start")
        .aggregate(Count(alias_name="n_users"))
    )


def top_bigrams(sf_dir: str, k: int = 20):
    """Top-k token bigrams corpus-wide (count desc, bigram asc on ties)."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def bigram_partials(t: pa.Table) -> pa.Table:
        # combiner: count bigrams within the batch before the shuffle
        counts: dict[str, int] = {}
        for text in t.column("text").to_pylist():
            toks = tokenize(text)
            for i in range(len(toks) - 1):
                bg = toks[i] + " " + toks[i + 1]
                counts[bg] = counts.get(bg, 0) + 1
        return pa.table(
            {
                "bigram": pa.array(list(counts), type=pa.string()),
                "n": pa.array(list(counts.values()), type=pa.int64()),
            }
        )

    return (
        ds.map_batches(bigram_partials, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "bigram"], descending=[True, False])
        .limit(k)
    )
