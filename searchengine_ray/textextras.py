"""Additional corpus/event analytics with exact SQL oracles: distinct-count
windows and n-gram frequency tables (the groupby-heavy shapes a training-
data pipeline reports on)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


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
    """Top-k token bigrams corpus-wide (count desc, bigram asc on ties).

    The pre-shuffle combiner is fully vectorized (no per-token Python): one
    Arrow lowercase+split over the batch (textstats._flat_tokens), a
    dictionary encode, adjacent-code pair keys masked to within-doc pairs,
    and ONE sort + run-length pass to count distinct pairs — the same
    kernel as curation.repetition_stats' bigram runs. Bigram strings are
    materialized only once per DISTINCT pair in the batch (dictionary
    take + binary_join), not once per occurrence."""
    import ray.data
    from ray.data.aggregate import Sum

    from .textstats import _flat_tokens

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    empty = pa.table(
        {
            "bigram": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
        }
    )

    def bigram_partials(t: pa.Table) -> pa.Table:
        _n, doc_idx, flat = _flat_tokens(t)
        if len(doc_idx) < 2:
            return empty
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        adj = doc_idx[1:] == doc_idx[:-1]
        v = np.int64(len(enc.dictionary))
        key = codes[:-1][adj] * v + codes[1:][adj]
        if not len(key):
            return empty
        key.sort(kind="stable")
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        counts = np.diff(np.r_[starts, len(key)]).astype(np.int64)
        uniq = key[starts]
        left = pc.take(enc.dictionary, pa.array(uniq // v))
        right = pc.take(enc.dictionary, pa.array(uniq % v))
        return pa.table(
            {
                "bigram": pc.binary_join_element_wise(left, right, " "),
                "n": pa.array(counts, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(bigram_partials, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "bigram"], descending=[True, False])
        .limit(k)
    )
