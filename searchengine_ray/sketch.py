"""Cardinality sketches: HyperLogLog distinct counting as a Ray Data
aggregate — the approximate path for distinct-count-per-window at scales
where exact dedup-then-count (textextras.hourly_unique_users) would shuffle
every (window, user) pair.

Flajolet et al.'s HyperLogLog with the standard bias corrections: m = 2^p
registers; each value's 64-bit hash splits into a register index (low p
bits) and rho = leading-zero rank of the remaining bits. Registers merge by
elementwise max, so per-batch partial register blocks combine associatively
— the exact shape Ray Data's map_batches + groupby wants:

    map_batches: (window, user) -> per-(batch, window) register arrays
    groupby(window).map_groups: elementwise-max merge -> estimate

Per-window state is m bytes (4 KiB at p=12) regardless of user count; the
shuffle moves one register block per (batch, window), not one row per
distinct user. Standard error ~= 1.04/sqrt(m) (~1.6% at p=12).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _hash64(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """splitmix64 over int64/uint64 input values (vectorized)."""
    v = values.astype(np.uint64) + np.uint64(seed) + np.uint64(
        0x9E3779B97F4A7C15
    )
    v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return v ^ (v >> np.uint64(31))


def registers_of(values: np.ndarray, p: int) -> np.ndarray:
    """Per-value HLL update collapsed to one register array (uint8, 2^p)."""
    m = 1 << p
    h = _hash64(values)
    idx = (h & np.uint64(m - 1)).astype(np.int64)
    rest = h >> np.uint64(p)
    # rho = position of the first 1-bit in the remaining 64-p bits (1-based)
    nbits = 64 - p
    rho = np.full(len(h), nbits + 1, dtype=np.uint8)
    found = np.zeros(len(h), dtype=bool)
    for b in range(nbits):
        hit = (~found) & ((rest >> np.uint64(b)) & np.uint64(1) == 1)
        rho[hit] = b + 1
        found |= hit
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def estimate(regs: np.ndarray) -> float:
    """HLL estimate with small-range (linear counting) correction.

    The harmonic denominator sum(2^-reg) is computed EXACTLY as an integer
    (sum of 2^(R-reg), R = max register) so the float operation sequence —
    one cast, four multiplies, one divide, libm log for the small-range
    branch — is fixed and reproducible bit-for-bit by the DuckDB oracle
    (`events_hourly_users_hll`), independent of summation order.
    """
    import math

    m = len(regs)
    r = int(regs.max(initial=0))
    cnt = np.bincount(regs.astype(np.int64), minlength=r + 1)
    denom = sum(int(c) << (r - v) for v, c in enumerate(cnt) if c)
    alpha = 0.7213 / (1.0 + 1.079 / float(m))
    raw = alpha * float(m) * float(m) * (2.0 ** r) / float(denom)
    zeros = int(cnt[0])
    if raw <= 2.5 * float(m) and zeros:
        return float(m) * math.log(float(m) / zeros)
    return raw


def _partial_fn(p: int):
    """map_batches stage: (ts, user_id) rows -> one 2^p-byte register block
    per (batch, window). Shared by the estimate and register-stats paths."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        win = pc.floor_temporal(t.column("ts"), unit="hour").to_numpy()
        users = t.column("user_id").to_numpy()
        order = np.argsort(win, kind="mergesort")
        win, users = win[order], users[order]
        if len(win) == 0:
            return pa.table(
                {
                    "window_start": pa.array([], pa.timestamp("us")),
                    "regs": pa.array([], pa.list_(pa.uint8())),
                }
            )
        change = np.empty(len(win), dtype=bool)
        change[0] = True
        change[1:] = win[1:] != win[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(win))
        blocks = [registers_of(users[s:e], p) for s, e in zip(starts, ends)]
        return pa.table(
            {
                "window_start": pa.array(win[starts]),
                "regs": pa.array(
                    [b for b in blocks], type=pa.list_(pa.uint8())
                ),
            }
        )

    return partial


def hll_register_stats(sf_dir: str, p: int = 12):
    """Per hour: the merged HLL REGISTER STATE as exact integers —
    (window_start, n_nonzero_registers, register_sum, max_rho).

    Same distributed pipeline as ``hll_distinct_users`` (per-batch partial
    register blocks, elementwise-max merge per window), but the output is
    the integer register summary instead of the float estimate, so a
    DuckDB oracle can reproduce it BIT-EXACTLY (splitmix64 in HUGEINT
    mod-2^64 arithmetic, rho via bit_count of the lowest-set-bit mask).
    This hash-checks the whole approximate path — hash, register split,
    rho, and the cross-batch max-merge — leaving only the final
    registers->estimate formula to the pytest error-bound test.
    """
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )
    part = _partial_fn(p)

    def stats(g: pa.Table) -> pa.Table:
        col = g.column("regs").combine_chunks()
        m = 1 << p
        regs = col.flatten().to_numpy().reshape(g.num_rows, m).max(axis=0)
        nz = regs[regs > 0]
        return pa.table(
            {
                "window_start": g.column("window_start").slice(0, 1),
                "n_nonzero_registers": pa.array(
                    [int(len(nz))], type=pa.int64()
                ),
                "register_sum": pa.array(
                    [int(nz.sum(dtype=np.int64))], type=pa.int64()
                ),
                "max_rho": pa.array(
                    [int(regs.max(initial=0))], type=pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("window_start")
        .map_groups(stats, batch_format="pyarrow")
    )


def hll_distinct_users(sf_dir: str, p: int = 12):
    """Per hour: approximate distinct users via HLL registers.

    Returns (window_start, n_users_approx int64). The shuffle carries one
    2^p-byte register block per (batch, window) — constant per window, not
    per distinct user. Compare textextras.hourly_unique_users (exact, two
    row-level shuffles); pytest bounds the relative error.
    """
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )
    partial = _partial_fn(p)

    def merge(g: pa.Table) -> pa.Table:
        col = g.column("regs").combine_chunks()
        m = 1 << p
        # flatten() honors a sliced block's offset; .values would not.
        mat = col.flatten().to_numpy().reshape(g.num_rows, m)
        regs = mat.max(axis=0)
        return pa.table(
            {
                "window_start": g.column("window_start").slice(0, 1),
                # floor(x+0.5): round-half-up, mirrored in the oracle
                # (Python round() is half-even; DuckDB round() half-away)
                "n_users_approx": pa.array(
                    [int(np.floor(estimate(regs) + 0.5))], type=pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("window_start")
        .map_groups(merge, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Count-min sketch: heavy-hitter term counts in sub-linear state
# ---------------------------------------------------------------------------

#: depth (independent hash rows) and log2 width of the default sketch
CMS_D = 4
CMS_LOG2_W = 10
#: per-row multiply-shift parameters (odd multipliers; fixed literals so the
#: DuckDB oracle inlines the SAME constants — Cormode & Muthukrishnan 2005).
#: Multipliers stay < 2^32 so hash*A fits DuckDB's signed-128 HUGEINT (a
#: 64x64 product would overflow it); the input key is already a uniform
#: 64-bit FNV, so 32-bit mixing rows lose nothing CMS needs.
CMS_A = (0x9E3779B9, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F)
CMS_B = (0x85EBCA6B, 0xC2B2AE35, 0x94D049BB, 0xBF58476D)


def cms_buckets(h: np.ndarray, d: int = CMS_D, log2w: int = CMS_LOG2_W) -> np.ndarray:
    """(d, n) bucket indices: ((h*A_i + B_i) mod 2^64) >> (64-log2w) —
    multiply-shift rows over an already-uniform 64-bit key (FNV-1a of the
    term, the hash every dedup/textstats kernel shares)."""
    out = np.empty((d, len(h)), dtype=np.int64)
    shift = np.uint64(64 - log2w)
    hh = h.astype(np.uint64)
    for i in range(d):
        out[i] = ((hh * np.uint64(CMS_A[i]) + np.uint64(CMS_B[i])) >> shift).astype(
            np.int64
        )
    return out


def cms_term_counts(
    sf_dir: str,
    probe_terms: "list[str] | None" = None,
    d: int = CMS_D,
    log2w: int = CMS_LOG2_W,
    max_probe_vocab: int = 1_000_000,
) -> pa.Table:
    """Approximate corpus term-occurrence counts via a count-min sketch:
    (term, est) per probe term, est = min over ``d`` rows of the summed
    register each row hashes the term into. One-sided error (est >= true
    count, overshoot bounded by total_tokens * 2/w per row w.h.p.) —
    pytest checks both; the DuckDB oracle recomputes the REGISTERS and the
    min EXACTLY (integer sums are order-invariant), so the whole hash ->
    bucket -> merge -> probe path is hash-gated, like the HLL register
    oracle.

    Scale shape: the per-batch partial is a (d x 2^log2w) int64 block (32
    KiB at the defaults) built by ONE dictionary-encode + bincount +
    scatter-add — register state through the reduce is CONSTANT in corpus
    size, the exact reason to prefer CMS over an exact groupby count at
    100 TB. Partials fold on the driver (metrics-sized: #batches x 32
    KiB). ``probe_terms=None`` derives the probe set from the corpus
    vocabulary carried alongside the partials — a gate/test convenience
    GUARDED by ``max_probe_vocab``: the driver-side set raises once it
    exceeds that many distinct terms (the minhash_lsh_pairs max_candidates
    pattern) instead of growing without bound; at web scale pass the
    explicit heavy-hitter candidate list you want estimates for.
    """
    import ray.data

    from .dedup import _term_hash64
    from .textstats import _flat_tokens

    w = 1 << log2w

    def partial(t: pa.Table) -> pa.Table:
        _, _, flat = _flat_tokens(t)
        if len(flat) == 0:
            return pa.table(
                {
                    "regs": pa.array([], pa.list_(pa.int64())),
                    "terms": pa.array([], pa.list_(pa.string())),
                }
            )
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        vocab = enc.dictionary.to_pylist()
        cnt = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
        vh = np.fromiter(
            (_term_hash64(x) for x in vocab), dtype=np.uint64, count=len(vocab)
        )
        bk = cms_buckets(vh, d, log2w)
        regs = np.zeros((d, w), dtype=np.int64)
        for i in range(d):
            np.add.at(regs[i], bk[i], cnt)
        return pa.table(
            {
                "regs": pa.array([regs.ravel()], type=pa.list_(pa.int64())),
                "terms": pa.array([vocab], type=pa.list_(pa.string())),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    ).map_batches(partial, batch_format="pyarrow")

    regs = np.zeros((d, w), dtype=np.int64)
    seen: set[str] = set()
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        for row in b.column("regs").to_pylist():
            regs += np.asarray(row, dtype=np.int64).reshape(d, w)
        if probe_terms is None:
            for ts in b.column("terms").to_pylist():
                seen.update(ts)
            if len(seen) > max_probe_vocab:
                raise ValueError(
                    f"cms_term_counts(probe_terms=None): corpus vocabulary "
                    f"exceeds max_probe_vocab={max_probe_vocab}; pass an "
                    f"explicit probe_terms list (or raise the cap) — the "
                    f"derived-probe path is a small-corpus convenience"
                )

    probes = sorted(seen) if probe_terms is None else list(probe_terms)
    if not probes:
        return pa.table(
            {"term": pa.array([], pa.string()), "est": pa.array([], pa.int64())}
        )
    ph = np.fromiter(
        (_term_hash64(x) for x in probes), dtype=np.uint64, count=len(probes)
    )
    bk = cms_buckets(ph, d, log2w)
    est = np.min(
        np.stack([regs[i, bk[i]] for i in range(d)], axis=0), axis=0
    )
    return pa.table(
        {
            "term": pa.array(probes, type=pa.string()),
            "est": pa.array(est, type=pa.int64()),
        }
    )


def kmv_distinct_users(sf_dir: str, k: int = 64):
    """KMV (k-minimum-values / bottom-k) distinct-count sketch per hourly
    window — the order-free counter sibling of HyperLogLog (Bar-Yossef et
    al. 2002): keep the k smallest DISTINCT 63-bit hashes of user_id;
    when a window holds fewer than k distinct hashes the sketch IS the
    exact distinct count, otherwise estimate (k-1) / U_(k) with U_(k)
    the k-th minimum normalized by 2^63.

    State is k integers per window regardless of user count, and the
    bottom-k union is associative: per-batch partials emit <= k rows per
    window, the per-window merge re-takes the k smallest of the union —
    the same partial/merge shape as the HLL register pipeline, with rows
    instead of register blocks.

    Determinism: hashes are splitmix64 >> 1 (63-bit, sign-safe int64,
    order-preserving), the estimate is ONE float division of exactly
    representable values plus floor(x + 0.5) — bit-replayable in SQL.

    Returns (window_start, n_users_approx).
    """
    import ray.data

    if k < 2:
        raise ValueError("kmv needs k >= 2")

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts")
        win = pa.compute.floor_temporal(ts, unit="hour")
        w = pa.compute.cast(win, pa.int64()).to_numpy()
        h = (
            _hash64(t.column("user_id").to_numpy()) >> np.uint64(1)
        ).astype(np.int64)
        order = np.lexsort((h, w))
        w, h = w[order], h[order]
        keep = np.empty(len(w), dtype=bool)
        if len(w):
            keep[0] = True
            keep[1:] = (w[1:] != w[:-1]) | (h[1:] != h[:-1])  # distinct
        w, h = w[keep], h[keep]
        starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]]) \
            if len(w) else np.empty(0, np.int64)
        rank = np.arange(len(w)) - np.repeat(
            starts, np.diff(np.append(starts, len(w)))
        ) if len(w) else np.empty(0, np.int64)
        m = rank < k
        return pa.table(
            {
                "window_us": pa.array(w[m], pa.int64()),
                "h63": pa.array(h[m], pa.int64()),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        h = np.unique(g.column("h63").to_numpy())  # sorted distinct
        nd = len(h)
        if nd < k:
            est = nd
        else:
            hk = float(np.float64(h[k - 1]))
            est = int(np.floor(
                (np.float64(k - 1) * np.float64(1 << 63)) / hk + 0.5
            ))
        return pa.table(
            {
                "window_us": pa.array(
                    [g.column("window_us")[0].as_py()], pa.int64()
                ),
                "n_users_approx": pa.array([est], pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )
    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("window_us")
        .map_groups(merge, batch_format="pyarrow")
        .take_all()  # bounded: n_windows rows
    )
    out.sort(key=lambda r: r["window_us"])
    return pa.table(
        {
            "window_start": pa.array(
                [r["window_us"] for r in out], pa.int64()
            ).cast(pa.timestamp("us")),
            "n_users_approx": pa.array(
                [r["n_users_approx"] for r in out], pa.int64()
            ),
        }
    )
