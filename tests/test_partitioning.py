"""Input-scaled partitioning for the bounded-dispatch groupby family, and
the MinHash candidate-materialization guard."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_ray.partitioning import (
    TARGET_GROUP_BYTES,
    partition_count,
    partition_count_for_rows,
    table_column_bytes,
)


def _write_events(path: str, n_rows: int, n_users: int, seed: int = 7) -> str:
    rng = np.random.default_rng(seed)
    os.makedirs(path, exist_ok=True)
    # skewed users: zipf-ish — user 0 owns ~30% of rows
    hot = rng.random(n_rows) < 0.3
    users = np.where(hot, 0, rng.integers(0, n_users, n_rows)).astype(np.int64)
    ts = np.datetime64("2024-01-01", "us") + (
        np.sort(rng.integers(0, 10**12, n_rows))
    ).astype("timedelta64[us]")
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n_rows), type=pa.int64()),
            "user_id": pa.array(users, type=pa.int64()),
            "ts": pa.array(ts),
            "event_type": pa.array(
                np.where(rng.random(n_rows) < 0.5, "click", "purchase")
            ),
            "value": pa.array(rng.random(n_rows)),
        }
    )
    pq.write_table(t, f"{path}/events.parquet")
    return path


def test_partition_count_floor_and_scaling(tmp_path):
    small = _write_events(str(tmp_path / "small"), 2_000, 50)
    big = _write_events(str(tmp_path / "big"), 400_000, 5_000)
    p_small = partition_count(f"{small}/events.parquet", ("user_id", "ts"))
    p_big = partition_count(
        f"{big}/events.parquet",
        ("user_id", "ts"),
        target_bytes=1 << 15,  # shrink the target so toy data exercises scaling
    )
    assert p_small == 64  # floor at toy scale
    assert p_big > 64  # grows with input
    # derived from footer bytes: P * target >= bytes
    b = table_column_bytes(f"{big}/events.parquet", ("user_id", "ts"))
    assert p_big * (1 << 15) >= b


def test_partition_count_respects_selectivity_and_expansion(tmp_path):
    d = _write_events(str(tmp_path / "d"), 400_000, 5_000)
    base = partition_count(
        f"{d}/events.parquet", ("user_id", "ts"), target_bytes=1 << 15
    )
    wider = partition_count(
        f"{d}/events.parquet", ("user_id", "ts"), target_bytes=1 << 15,
        expansion=4.0,
    )
    thinner = partition_count(
        f"{d}/events.parquet", ("user_id", "ts"), target_bytes=1 << 15,
        selectivity=0.25,
    )
    assert wider >= base >= thinner


def test_group_payloads_bounded_on_skewed_users(tmp_path):
    """Hash-bucketing with an input-scaled P keeps every bucket's payload
    under target * slack even with a hot user owning 30% of rows — as long
    as no single key alone exceeds the target (documented caveat)."""
    d = _write_events(str(tmp_path / "sk"), 300_000, 3_000)
    cols = ("user_id", "ts")
    target = 1 << 15  # 32 KiB, small enough to force many buckets
    P = partition_count(f"{d}/events.parquet", cols, target_bytes=target)
    t = pq.read_table(f"{d}/events.parquet", columns=list(cols))
    u = t.column("user_id").to_numpy()
    bytes_per_row = 16  # int64 + timestamp[us]
    counts = np.bincount((u % P).astype(np.int64), minlength=P)
    hot_rows = int((u == 0).sum())  # the hot key's own payload
    cap = max(target * 4, hot_rows * bytes_per_row + 4 * target)
    assert counts.max() * bytes_per_row <= cap


def test_partition_count_for_rows():
    assert partition_count_for_rows(0, 1000) == 64
    assert (
        partition_count_for_rows(10_000_000, TARGET_GROUP_BYTES // 1000) > 64
    )


def test_minhash_max_candidates_guard(tmp_path, ray_session):
    """Adversarial all-dup corpus: every doc pairs with every other; a tiny
    max_candidates must raise the documented error, not OOM the driver."""
    from searchengine_ray.dedup import minhash_lsh_pairs

    d = tmp_path / "alldup"
    d.mkdir()
    text = "the quick brown fox jumps over the lazy dog again and again"
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(40), type=pa.int64()),
            "text": pa.array([text] * 40),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    with pytest.raises(ValueError, match="max_candidates"):
        minhash_lsh_pairs(str(d), max_candidates=10)
    # with room it returns all C(40,2) identical pairs at jaccard 1.0
    out = minhash_lsh_pairs(str(d), max_candidates=10_000)
    assert out.num_rows == 40 * 39 // 2
    assert min(out.column("jaccard").to_pylist()) == 1.0
