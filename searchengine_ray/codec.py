"""Delta + varbyte (LEB128) posting-list compression, vectorized with numpy.

Replaces the reference's uncompressed in-RAM ``InvList``
(`Homeworks/HW6/QryEval/InvList.java:25-82`) with the standard compressed
layout an inverted index needs at 10^12-file scale: strictly-ascending id
sequences are delta-gapped then varbyte-encoded (7 data bits per byte, high
bit = continuation). Encode and decode are O(total_bytes) numpy kernels with
no per-value Python loop (the outer loops below run at most ~10 iterations —
one per possible byte length).
"""

from __future__ import annotations

import numpy as np


def varbyte_encode_with_lengths(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode a non-negative int array as LEB128 varbytes.

    Returns (byte_array uint8, per-value byte counts int64) — the counts let
    callers split one big encoded buffer into per-group slices without
    re-encoding (the vectorized posting-merge path relies on this)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    # bytes needed per value: ceil(bits/7), min 1
    bits = np.zeros(v.shape, dtype=np.int64)
    # bit_length via log2 on float is unsafe for >2^53; use a shift loop (<=10 iters)
    tmp = v.copy()
    while np.any(tmp > 0):
        bits[tmp > 0] += 1
        tmp >>= np.uint64(1)
    nbytes = np.maximum(1, (bits + 6) // 7)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    max_nb = int(nbytes.max())
    for k in range(max_nb):
        sel = nbytes > k
        byte_vals = ((v[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[sel] > k + 1).astype(np.uint8) << 7
        out[starts[sel] + k] = byte_vals | cont
    return out, nbytes


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a non-negative int array as LEB128 varbytes."""
    out, _ = varbyte_encode_with_lengths(values)
    return out.tobytes()


def varbyte_decode(buf: bytes | memoryview, dtype=np.int64) -> np.ndarray:
    """Decode LEB128 varbytes back to an int array.

    Byte-position-class decoding: at most ``max_len`` (<=10) vectorized
    passes, one per significance position — no per-element scatter
    (np.add.at is ~50x slower on multi-MB posting lists)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=dtype)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    n = len(ends)
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    payload = (b & np.uint8(0x7F)).astype(np.uint64)
    vals = np.zeros(n, dtype=np.uint64)
    for k in range(int(lens.max())):
        sel = lens > k
        vals[sel] |= payload[starts[sel] + k] << np.uint64(7 * k)
    return vals.astype(dtype)


def delta_encode(sorted_values: np.ndarray) -> np.ndarray:
    """Ascending ints -> gaps (first value kept absolute)."""
    v = np.asarray(sorted_values, dtype=np.int64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(gaps, dtype=np.int64))


def encode_sorted(values: np.ndarray) -> bytes:
    """delta + varbyte for one strictly/weakly ascending sequence."""
    return varbyte_encode(delta_encode(values))


def decode_sorted(buf: bytes | memoryview) -> np.ndarray:
    return delta_decode(varbyte_decode(buf))


def segmented_deltas(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Gap-encode many ascending runs at once: deltas within each run, run
    starts kept absolute. ``offsets`` (len = n_runs+1) delimits runs."""
    v = np.asarray(values, dtype=np.int64)
    offsets = np.asarray(offsets, dtype=np.int64)
    if v.size == 0:
        return v
    gaps = np.empty_like(v)
    gaps[0] = v[0]
    np.subtract(v[1:], v[:-1], out=gaps[1:])
    run_starts = offsets[:-1]
    run_starts = run_starts[run_starts < v.size]
    gaps[run_starts] = v[run_starts]  # reset delta chain at each run start
    return gaps


def encode_segmented(values: np.ndarray, offsets: np.ndarray) -> bytes:
    """Delta+varbyte many ascending runs at once (e.g. per-doc position
    lists); decode with :func:`decode_segmented` given the same offsets."""
    if np.asarray(values).size == 0:
        return b""
    return varbyte_encode(segmented_deltas(values, offsets))


def decode_segmented(buf: bytes | memoryview, offsets: np.ndarray) -> np.ndarray:
    """Inverse of :func:`encode_segmented`; returns the flat values array."""
    gaps = varbyte_decode(buf)
    if gaps.size == 0:
        return gaps
    offsets = np.asarray(offsets, dtype=np.int64)
    # Segmented cumsum: raw cumsum, then subtract each run's incoming prefix
    # (carry[i] = raw_csum[run_start(i) - 1], 0 for the first run).
    csum = np.cumsum(gaps)
    run_starts = offsets[:-1]
    run_starts = run_starts[(run_starts > 0) & (run_starts < gaps.size)]
    # zero-length runs duplicate a start index; keep it once or the fancy
    # assignment below drops all but the last write and the next run
    # inherits the previous run's prefix
    run_starts = np.unique(run_starts)
    if run_starts.size == 0:
        return csum
    seg_prefix = csum[run_starts - 1]
    adj = np.zeros_like(gaps)
    adj[run_starts] = np.diff(np.concatenate(([0], seg_prefix)))
    return csum - np.cumsum(adj)
