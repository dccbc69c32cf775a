"""Deduplication operators for large-scale training-data pipelines.

All Ray-Data-first over the documents table `(doc_id, text, ...)`:

- :func:`exact_dedup` — content-hash groupby, keep lowest doc_id.
- :func:`ngram_jaccard_pairs` — exact n-gram-shingle Jaccard for candidate
  pairs sharing a (non-ubiquitous) shingle; oracle-SQL-expressible.
- :func:`minhash_lsh_pairs` — MinHash signatures + banded LSH candidate
  generation, exact-Jaccard verification. The scale path for near-dup.
- :func:`simhash_pairs` — 64-bit SimHash, 4x16-bit block blocking,
  Hamming-distance verification.
- :func:`embedding_dup_pairs` — cosine near-dup over the embeddings table
  (broadcast matrix, per-batch matmul; exact baseline).
- :func:`embedding_dup_pairs_lsh` — random-hyperplane-bucketed cosine
  near-dup, the scale path.

Scale notes (10^12-file ambitions): every candidate generator here is a
``groupby`` on a bounded-cardinality key (hash / band / block), the classic
skew hazard being ubiquitous shingles — handled by a df cap that drops
shingles occurring in more than ``shingle_df_cap`` docs (mirrored in the
oracle SQL so results stay comparable). MinHash verification is fully
distributed: only the candidate-pair CSR index broadcasts (LSH-bounded),
per-doc shingle sets stream through one narrow int64 shuffle keyed by
pair — no per-doc state ever sits on the driver.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .analyze import tokenize


def _read_docs(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(sf_dir: str):
    """One row per distinct content: (doc_id = min over the group, n_dups).

    Built-in Min/Count aggregates, not per-group map_groups: the group
    count is O(distinct contents) ~ O(N), and Ray's per-group dispatch at
    that cardinality would dominate; aggregates combine inside each block
    before the shuffle."""
    from ray.data.aggregate import Count, Min

    ds = _read_docs(sf_dir)

    def add_hash(t: pa.Table) -> pa.Table:
        h = [hashlib.sha256(x.encode()).hexdigest() for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"), "h": pa.array(h)})

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("h")
        .aggregate(
            Min("doc_id", alias_name="doc_id"), Count(alias_name="n_dups")
        )
        .select_columns(["doc_id", "n_dups"])
    )


# ---------------------------------------------------------------------------
# shingling helpers
# ---------------------------------------------------------------------------


_term_hash_memo: dict[str, int] = {}


def _term_hash64(term: str) -> int:
    """FNV-1a 64 of a token, memoized (process-stable, vocabulary is tiny
    relative to the token stream)."""
    h = _term_hash_memo.get(term)
    if h is None:
        v = 14695981039346656037
        for b in term.encode():
            v = ((v ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
        h = v
        _term_hash_memo[term] = h
    return h


#: odd position-mixing constants for the n-gram combiner
_POS_MIX = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
     0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63], dtype=np.uint64,
)


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    """Distinct n-gram shingle hashes, vectorized: hash each UNIQUE token
    once (memoized FNV), then combine the n token-hash streams with odd
    multipliers mod 2^64 — no per-shingle Python/md5 loop."""
    toks = tokenize(text)
    if len(toks) < n:
        return np.empty(0, dtype=np.uint64)
    seq = np.fromiter(
        (_term_hash64(t) for t in toks), dtype=np.uint64, count=len(toks)
    )
    m = len(toks) - n + 1
    h = np.zeros(m, dtype=np.uint64)
    for k in range(n):
        h = h * _POS_MIX[k % len(_POS_MIX)] + seq[k : k + m]  # wraps mod 2^64
    return np.unique(h)


def _batch_shingles(
    t: pa.Table, n: int, distinct: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """Batch-flat shingler: a whole text batch -> (doc_row, shingle_hash)
    arrays, bit-identical to per-doc :func:`_shingle_hashes` but with ONE
    Arrow tokenize + dictionary encode + global n-gram combine per batch
    (the winnow_fingerprints doc-boundary pattern, 3.3x measured there) —
    no per-document Python re-drive. Grams crossing a doc boundary are
    computed then masked; ``distinct`` dedupes per doc via one lexsort.
    ``doc_row`` indexes rows of ``t`` (nondecreasing)."""
    from .textstats import _flat_tokens

    _n_docs, doc_idx, flat = _flat_tokens(t)
    if len(doc_idx) < n:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
    enc = flat.dictionary_encode()
    uniq = enc.dictionary.to_pylist()
    uh = np.fromiter(
        (_term_hash64(x) for x in uniq), dtype=np.uint64, count=len(uniq)
    )
    seq = uh[enc.indices.to_numpy()]
    m = len(seq) - n + 1
    h = np.zeros(m, dtype=np.uint64)
    for k in range(n):
        h = h * _POS_MIX[k % len(_POS_MIX)] + seq[k : k + m]  # wraps mod 2^64
    valid = doc_idx[:m] == doc_idx[n - 1 :]
    gdoc = doc_idx[:m][valid]
    gh = h[valid]
    if distinct and len(gh):
        order = np.lexsort((gh, gdoc))
        gdoc, gh = gdoc[order], gh[order]
        first = np.empty(len(gh), dtype=bool)
        first[0] = True
        first[1:] = (gdoc[1:] != gdoc[:-1]) | (gh[1:] != gh[:-1])
        gdoc, gh = gdoc[first], gh[first]
    return gdoc, gh


class ShingleRows:
    """map_batches stage: doc -> distinct (doc_id, sh, nsh, kh) rows.

    ``sh`` is the 64-bit shingle hash (the vectorized token-hash combine
    from :func:`_shingle_hashes`) — the SHUFFLE KEY IS THE HASH, never the
    joined shingle string: an int64 is ~10x narrower than the string it
    replaces and needs no per-position Python dict. 64-bit collisions are
    negligible at any realistic shingle-universe size (and the DuckDB
    oracle, which builds pairs from the actual strings, would catch one).
    ``nsh`` is the doc's distinct-shingle count (carried per row so pair
    scoring needs no driver-side size lookup); ``kh`` is the bounded
    shuffle partition of the shingle space."""

    def __init__(self, n: int, partitions: int = 64):
        self.n = n
        self.partitions = partitions

    def __call__(self, t: pa.Table) -> pa.Table:
        gdoc, sh = _batch_shingles(t, self.n)  # distinct per doc, batch-flat
        if not len(sh):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "sh": pa.array([], pa.int64()),
                    "nsh": pa.array([], pa.int64()),
                    "kh": pa.array([], pa.int32()),
                }
            )
        # gdoc is nondecreasing -> per-doc counts via one run-length pass
        starts = np.flatnonzero(np.r_[True, gdoc[1:] != gdoc[:-1]])
        per_doc = np.diff(np.r_[starts, len(gdoc)])
        nsh = np.repeat(per_doc, per_doc).astype(np.int64)
        doc_ids = t.column("doc_id").to_numpy()[gdoc]
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "sh": pa.array(sh.view(np.int64), type=pa.int64()),
                "nsh": pa.array(nsh, type=pa.int64()),
                "kh": pa.array(
                    (sh % np.uint64(self.partitions)).astype(np.int32)
                ),
            }
        )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (oracle-SQL-expressible)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    sf_dir: str,
    n: int = 3,
    threshold: float = 0.6,
    shingle_df_cap: int = 100,
):
    """Pairs (a < b) with distinct-``n``-gram Jaccard >= threshold.

    Candidate pairs come from co-occurrence in a shared shingle's posting
    group; shingles present in more than ``shingle_df_cap`` docs are dropped
    before pairing (skew guard, mirrored in the oracle SQL). Returns
    (doc_id_a, doc_id_b, inter, union_sz, jaccard).
    """
    import ray.data
    from ray.data.aggregate import Count

    from .partitioning import partition_count

    ds = _read_docs(sf_dir)
    # shingle rows are ~(28 bytes x token count) — wider than the text they
    # come from, hence expansion > 1; bucket count scales with input bytes
    nparts = partition_count(
        f"{sf_dir}/documents.parquet", ("doc_id", "text"), expansion=4.0
    )
    sh = ds.map_batches(ShingleRows(n, partitions=nparts), batch_format="pyarrow")

    # pair generation per HASH PARTITION of the shingle space (not per
    # shingle group: Ray's per-group dispatch would dominate at millions of
    # distinct shingles) — each call handles all its shingles vectorized.
    # Per-doc sizes ride along as (sza, szb) columns so scoring needs no
    # driver-side lookup (no O(N) driver memory).
    def pairs_of_partition(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                "sza": pa.array([], pa.int64()), "szb": pa.array([], pa.int64()),
            }
        )
        t = t.sort_by([("sh", "ascending"), ("doc_id", "ascending")])
        s_idx = t.column("sh").to_numpy()
        docs = t.column("doc_id").to_numpy()
        szs = t.column("nsh").to_numpy()
        if len(s_idx) == 0:
            return empty
        change = np.empty(len(s_idx), dtype=bool)
        change[0] = True
        change[1:] = s_idx[1:] != s_idx[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(s_idx))
        out_a, out_b, out_sza, out_szb = [], [], [], []
        for s, e in zip(starts, ends):
            g = e - s
            if g < 2 or g > shingle_df_cap:
                continue
            d = docs[s:e]
            z = szs[s:e]
            ia, ib = np.triu_indices(g, k=1)
            out_a.append(d[ia])
            out_b.append(d[ib])
            out_sza.append(z[ia])
            out_szb.append(z[ib])
        if not out_a:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a), type=pa.int64()),
                "b": pa.array(np.concatenate(out_b), type=pa.int64()),
                "sza": pa.array(np.concatenate(out_sza), type=pa.int64()),
                "szb": pa.array(np.concatenate(out_szb), type=pa.int64()),
            }
        )

    # sza/szb are functions of a/b, so grouping by them too is a no-op on
    # group identity but keeps the sizes attached through the shuffle
    pair_counts = (
        sh.groupby("kh")
        .map_groups(pairs_of_partition, batch_format="pyarrow")
        .groupby(["a", "b", "sza", "szb"])
        .aggregate(Count(alias_name="inter"))
    )

    def score(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy().astype(np.int64)
        b = t.column("b").to_numpy().astype(np.int64)
        inter = t.column("inter").to_numpy().astype(np.int64)
        union = (
            t.column("sza").to_numpy().astype(np.int64)
            + t.column("szb").to_numpy().astype(np.int64)
            - inter
        )
        jac = inter / union
        keep = jac >= threshold
        # integer micro-units (floor division) so the DuckDB oracle can
        # reproduce the value exactly — library float rounding modes differ
        jac_micro = (inter[keep] * 1_000_000) // union[keep]
        return pa.table(
            {
                "doc_id_a": pa.array(a[keep], type=pa.int64()),
                "doc_id_b": pa.array(b[keep], type=pa.int64()),
                "inter": pa.array(inter[keep], type=pa.int64()),
                "union_sz": pa.array(union[keep], type=pa.int64()),
                "jaccard_micro": pa.array(jac_micro, type=pa.int64()),
            }
        )

    return pair_counts.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


class MinHashSignatures:
    """Actor stage: doc -> (doc_id, sig list<uint64>). Permutation parameters
    are seeded in __init__ (once per actor)."""

    def __init__(self, n: int, num_perm: int, seed: int):
        rng = np.random.default_rng(seed)
        # multiply-shift hashing mod 2^64: odd multipliers + wraparound give
        # genuinely order-scrambling permutations. (A bounded a*h+b that never
        # wraps the modulus is ORDER-PRESERVING — every perm would pick the
        # same smallest shingle and LSH degenerates; caught by recall tests.)
        self.a = (
            rng.integers(1, (1 << 63) - 1, size=num_perm, dtype=np.uint64)
            | np.uint64(1)
        )
        self.b = rng.integers(0, (1 << 63) - 1, size=num_perm, dtype=np.uint64)
        self.n = n
        self.num_perm = num_perm

    def sig(self, text: str) -> np.ndarray:
        """Single-doc reference form (tests); __call__ is the batch-flat
        equivalent (bit-identical: min over a multiset == min over its
        distinct set, so per-doc dedup is unnecessary for signatures)."""
        h = _shingle_hashes(text, self.n)
        if len(h) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        v = self.a[:, None] * h[None, :] + self.b[:, None]  # wraps mod 2^64
        return np.min(v, axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        n_docs = t.num_rows
        sig_mat = np.full(
            (n_docs, self.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64
        )
        # distinct=False: the min is dedup-invariant, skip the lexsort
        gdoc, gh = _batch_shingles(t, self.n, distinct=False)
        if len(gh):
            starts = np.flatnonzero(np.r_[True, gdoc[1:] != gdoc[:-1]])
            present = gdoc[starts]
            # one vectorized pass per permutation over ALL the batch's
            # grams (segmented min via reduceat) — O(num_perm) numpy calls
            # per batch instead of O(docs) Python re-drives
            for p in range(self.num_perm):
                v = self.a[p] * gh + self.b[p]  # wraps mod 2^64
                sig_mat[present, p] = np.minimum.reduceat(v, starts)
        flat = sig_mat.view(np.int64).ravel()
        offsets = np.arange(0, (n_docs + 1) * self.num_perm, self.num_perm)
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "sig": pa.ListArray.from_arrays(
                    pa.array(offsets, type=pa.int32()),
                    pa.array(flat, type=pa.int64()),
                ),
            }
        )


def minhash_lsh_pairs(
    sf_dir: str,
    n: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    threshold: float = 0.6,
    seed: int = 1234,
    max_candidates: int = 2_000_000,
):
    """Near-dup pairs via MinHash banding, verified with exact Jaccard.

    shingle -> 128-perm MinHash signature (actor pool) -> explode to
    (band_id, band_hash, doc_id) -> groupby band bucket -> candidate pairs
    -> exact-Jaccard verify (broadcast shingle-hash sets) -> pairs >= t.

    ``max_candidates`` guards the one driver touch point: the DISTINCT
    candidate-pair set must fit a broadcast object (band buckets capped at
    200 docs bound it by construction, but an adversarial all-dup corpus
    can still blow it up). Band-fired duplicates dedupe DISTRIBUTED (a
    groupby inside the same pipeline), so driver memory is bounded by the
    distinct count alone, and exceeding ``max_candidates`` raises with the
    partitioning assumption spelled out instead of OOMing.
    """
    import ray
    import ray.data

    rows_per_band = num_perm // bands
    ds = _read_docs(sf_dir)
    # TASK pool, not actors: the stage's only state is 2*num_perm seeded
    # ints (cheap to pickle per task), so an actor pool would pay ~1.5s of
    # pool startup for nothing and cap concurrency at its size; tasks use
    # every free core immediately
    sigs = ds.map_batches(
        MinHashSignatures(n=n, num_perm=num_perm, seed=seed),
        batch_format="pyarrow",
        batch_size=256,
    )

    def explode_bands(t: pa.Table) -> pa.Table:
        """Vectorized banding: every doc's signature rows reshape to a
        (n_docs, num_perm) matrix; a band's bucket key is a multiplicative
        mix of its rows_per_band minhash values (mod 2^64) — any stable
        hash of the band vector works for LSH bucketing, and this one needs
        no per-doc Python/md5 loop and ships an int64 key, not a hex
        string, through the shuffle."""
        n_docs = t.num_rows
        col = t.column("sig").combine_chunks()
        # flatten() honors a sliced block's offset; .values would not.
        sig = col.flatten().to_numpy().view(np.uint64).reshape(n_docs, num_perm)
        ids = t.column("doc_id").to_numpy()
        mix = (
            np.arange(1, rows_per_band + 1, dtype=np.uint64)
            * np.uint64(0x9E3779B97F4A7C15)
        ) | np.uint64(1)
        out = []
        for bi in range(bands):
            chunk = sig[:, bi * rows_per_band : (bi + 1) * rows_per_band]
            bh = (chunk * mix[None, :]).sum(axis=1)  # wraps mod 2^64
            out.append(
                pa.table(
                    {
                        "band": pa.array(
                            np.full(n_docs, bi, dtype=np.int32)
                        ),
                        "bh": pa.array(bh.view(np.int64), type=pa.int64()),
                        "doc_id": pa.array(ids, type=pa.int64()),
                    }
                )
            )
        return pa.concat_tables(out)

    def pairs_of_band(t: pa.Table) -> pa.Table:
        # one call per band: bucket by band-hash, vectorized pair expansion
        t = t.sort_by([("bh", "ascending"), ("doc_id", "ascending")])
        bh = t.column("bh").combine_chunks().dictionary_encode().indices.to_numpy()
        docs = t.column("doc_id").to_numpy()
        if len(bh) == 0:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        change = np.empty(len(bh), dtype=bool)
        change[0] = True
        change[1:] = bh[1:] != bh[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(bh))
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            g = e - s
            if g < 2 or g > 200:  # band-bucket skew guard
                continue
            d = docs[s:e]
            ia, ib = np.triu_indices(g, k=1)
            out_a.append(d[ia])
            out_b.append(d[ib])
        if not out_a:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a), type=pa.int64()),
                "b": pa.array(np.concatenate(out_b), type=pa.int64()),
            }
        )

    cand = (
        sigs.map_batches(explode_bands, batch_format="pyarrow")
        .groupby("band")
        .map_groups(pairs_of_band, batch_format="pyarrow")
    )

    # Verification, distributed: broadcast the candidate-pair INDEX only
    # (two int64 arrays + a doc->pair-slots CSR — LSH-bounded, orders of
    # magnitude smaller than per-doc shingle sets), stream the corpus once
    # emitting (pair_id, shingle_hash) rows for candidate docs, then ONE
    # narrow int64 shuffle keyed by hash(pair_id) counts per-pair duplicate
    # hashes = |A∩B|; |A∪B| = rows_in_group − inter. No per-doc state ever
    # sits on the driver. Partitioning assumption: the DISTINCT LSH
    # candidate-pair set fits a broadcast object; band-fired duplicates
    # (up to `bands` copies per pair) fold out in a STREAMING driver
    # dedupe — batches arrive with backpressure, the running unique set
    # never exceeds max_candidates (checked each fold; a groupby here
    # would pay seconds of all-to-all setup to sort output-sized data).
    a_run = np.empty(0, dtype=np.int64)
    b_run = np.empty(0, dtype=np.int64)
    for batch in cand.iter_batches(batch_format="pyarrow", batch_size=None):
        if batch.num_rows == 0:
            continue
        a = np.concatenate([a_run, batch.column("a").to_numpy()])
        b = np.concatenate([b_run, batch.column("b").to_numpy()])
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = np.empty(len(a), dtype=bool)
        first[0] = True
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        a_run, b_run = a[first], b[first]
        if len(a_run) > max_candidates:
            raise ValueError(
                f"MinHash-LSH produced more than max_candidates="
                f"{max_candidates} distinct candidate pairs; the broadcast "
                "verify index no longer fits the driver. Tighten the LSH "
                "(more rows per band / higher threshold), raise the "
                "band-bucket cap guard, or raise max_candidates if the "
                "driver has the memory."
            )
    if len(a_run) == 0:
        return pa.table(
            {
                "doc_id_a": pa.array([], pa.int64()),
                "doc_id_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    pa_arr, pb_arr = a_run, b_run
    P = len(pa_arr)
    # CSR: doc -> indices of pairs it participates in
    docs_all = np.concatenate([pa_arr, pb_arr])
    pidx_all = np.concatenate([np.arange(P), np.arange(P)])
    order = np.argsort(docs_all, kind="stable")
    docs_sorted = docs_all[order]
    pidx_sorted = pidx_all[order]
    uniq_docs, first = np.unique(docs_sorted, return_index=True)
    offs = np.append(first, len(docs_sorted))
    bcast = ray.put((uniq_docs, offs, pidx_sorted, pa_arr, pb_arr))

    # verify-shuffle bucket count scales with the candidate set: each pair
    # ships ~2 docs' worth of (pid, sh) rows (~3-7x the raw text bytes)
    import pyarrow.parquet as pq

    from .partitioning import partition_count_for_rows, table_column_bytes

    n_docs_total = max(
        1, pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    )
    avg_doc_bytes = table_column_bytes(
        f"{sf_dir}/documents.parquet", ("text",)
    ) // n_docs_total
    nparts_v = partition_count_for_rows(
        P, bytes_per_row=max(64, 7 * avg_doc_bytes)
    )

    def pair_shingle_rows(t: pa.Table) -> pa.Table:
        """doc batch -> (pair_id, sh, kp) rows for every (pair containing
        doc, distinct shingle of doc); non-candidate docs emit nothing.
        ray.get of the broadcast runs WORKER-side per batch (a local object
        store lookup after the first), so the pair index ships once per
        node, not inside the pickled transform."""
        uniq, offs, pidx, _, _ = ray.get(bcast)
        ids = t.column("doc_id").to_numpy()
        if len(uniq):
            locc = np.clip(np.searchsorted(uniq, ids), 0, len(uniq) - 1)
            cand_rows = np.flatnonzero(uniq[locc] == ids)
        else:
            locc = np.zeros(len(ids), dtype=np.int64)
            cand_rows = np.empty(0, dtype=np.int64)
        out_p, out_h = [], []
        if len(cand_rows):
            sub = t.take(pa.array(cand_rows))
            gdoc, gh = _batch_shingles(sub, n)  # distinct per doc, batch-flat
            if len(gh):
                starts = np.flatnonzero(np.r_[True, gdoc[1:] != gdoc[:-1]])
                bounds = np.r_[starts, len(gdoc)]
                for si, sj in zip(bounds[:-1], bounds[1:]):
                    h = gh[si:sj]
                    lo = locc[cand_rows[gdoc[si]]]
                    pairs = pidx[offs[lo] : offs[lo + 1]]
                    out_p.append(np.repeat(pairs, len(h)))
                    out_h.append(np.tile(h.view(np.int64), len(pairs)))
        if not out_p:
            return pa.table(
                {
                    "pid": pa.array([], pa.int64()),
                    "sh": pa.array([], pa.int64()),
                    "kp": pa.array([], pa.int32()),
                }
            )
        pid = np.concatenate(out_p).astype(np.int64)
        return pa.table(
            {
                "pid": pa.array(pid, type=pa.int64()),
                "sh": pa.array(np.concatenate(out_h), type=pa.int64()),
                "kp": pa.array((pid % nparts_v).astype(np.int32)),
            }
        )

    def verify_partition(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id_a": pa.array([], pa.int64()),
                "doc_id_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        _, _, _, a_of, b_of = ray.get(bcast)
        t = t.sort_by([("pid", "ascending"), ("sh", "ascending")])
        pid = t.column("pid").to_numpy()
        sh = t.column("sh").to_numpy()
        new_pair = np.empty(len(pid), dtype=bool)
        new_pair[0] = True
        new_pair[1:] = pid[1:] != pid[:-1]
        starts = np.flatnonzero(new_pair)
        ends = np.append(starts[1:], len(pid))
        # a hash appears at most once per side -> a within-pair duplicate
        # is exactly one shared shingle
        dup = np.zeros(len(pid), dtype=np.int64)
        dup[1:] = ((sh[1:] == sh[:-1]) & ~new_pair[1:]).astype(np.int64)
        inter = np.add.reduceat(dup, starts)
        union = (ends - starts) - inter
        jac = inter / np.maximum(union, 1)
        keep = jac >= threshold
        sel = pid[starts][keep]
        return pa.table(
            {
                "doc_id_a": pa.array(a_of[sel], type=pa.int64()),
                "doc_id_b": pa.array(b_of[sel], type=pa.int64()),
                "jaccard": pa.array(np.round(jac[keep], 6), type=pa.float64()),
            }
        )

    verified = (
        _read_docs(sf_dir)
        .map_batches(pair_shingle_rows, batch_format="pyarrow")
        .groupby("kp")
        .map_groups(verify_partition, batch_format="pyarrow")
    )
    # the verified pair list is output-sized (small); hand back a pa.Table
    out = verified.to_pandas()
    if out.empty:  # an all-empty Dataset loses its schema in to_pandas
        return pa.table(
            {
                "doc_id_a": pa.array([], pa.int64()),
                "doc_id_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    out = out.sort_values(["doc_id_a", "doc_id_b"])
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash64(text: str) -> int:
    """64-bit SimHash over tf-weighted term hashes, fully vectorized (one
    (n_terms x 64) unpack + signed sum; integer math, order-independent)."""
    toks = tokenize(text)
    if not toks:
        return 0
    counter: dict[str, int] = {}
    for t in toks:
        counter[t] = counter.get(t, 0) + 1
    hs = np.fromiter(
        (_term_hash64(t) for t in counter), dtype=np.uint64, count=len(counter)
    )
    tf = np.fromiter(counter.values(), dtype=np.int64, count=len(counter))
    bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    acc = ((2 * bits.astype(np.int64) - 1) * tf[:, None]).sum(axis=0)
    out = 0
    for i in np.flatnonzero(acc > 0):
        out |= 1 << int(i)
    return out


def simhash_pairs(sf_dir: str, max_hamming: int = 6):
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.

    Blocking: 4 x 16-bit blocks (a pair within distance 3 must agree on at
    least one block; with max_hamming up to 6 this is a recall-oriented
    heuristic) -> groupby block bucket -> verified Hamming distance.
    """
    import ray.data

    ds = _read_docs(sf_dir)

    def add_simhash(t: pa.Table) -> pa.Table:
        """ONE batch pass (bit-identical to _simhash64 per doc): Arrow
        tokenize -> dictionary codes -> per-(doc,term) tf via lexsort ->
        per-unique-term bit signs -> one scatter-add into a (n_docs, 64)
        vote matrix."""
        from .textstats import _flat_tokens

        n, doc_idx, flat = _flat_tokens(t)
        out = np.zeros(n, dtype=np.uint64)
        if len(doc_idx):
            d = flat.dictionary_encode()
            codes = d.indices.to_numpy()
            uniq = d.dictionary.to_pylist()
            uh = np.fromiter(
                (_term_hash64(x) for x in uniq), dtype=np.uint64,
                count=len(uniq),
            )
            order = np.lexsort((codes, doc_idx))
            dd, cc = doc_idx[order], codes[order]
            first = np.empty(len(dd), dtype=bool)
            first[0] = True
            first[1:] = (dd[1:] != dd[:-1]) | (cc[1:] != cc[:-1])
            starts = np.flatnonzero(first)
            tf = np.diff(np.append(starts, len(dd))).astype(np.int64)
            gd, gc = dd[starts], cc[starts]
            shifts = np.arange(64, dtype=np.uint64)
            sign = (
                2 * ((uh[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
                - 1
            )  # (U, 64)
            acc = np.zeros((n, 64), dtype=np.int64)
            np.add.at(acc, gd, tf[:, None] * sign[gc])
            out = (
                (acc > 0).astype(np.uint64) << shifts[None, :]
            ).sum(axis=1, dtype=np.uint64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "simhash": pa.array(out.astype(np.int64)),
            }
        )

    sh = ds.map_batches(add_simhash, batch_format="pyarrow")

    def explode_blocks(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        hs = t.column("simhash").to_numpy()
        uh = hs.view(np.uint64)
        n = len(ids)
        parts = []
        for bi in range(4):
            val = ((uh >> np.uint64(16 * bi)) & np.uint64(0xFFFF)).astype(
                np.int64
            )
            parts.append(
                pa.table(
                    {
                        "blk": pa.array(np.full(n, bi, dtype=np.int32)),
                        "val": pa.array(val, type=pa.int64()),
                        "doc_id": pa.array(ids, type=pa.int64()),
                        "simhash": pa.array(hs, type=pa.int64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    def pairs_of_block(t: pa.Table) -> pa.Table:
        # one call per 16-bit block position: bucket by value, vectorized
        t = t.sort_by([("val", "ascending"), ("doc_id", "ascending")])
        val = t.column("val").to_numpy()
        docs = t.column("doc_id").to_numpy()
        hashes = t.column("simhash").to_numpy()
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                "ha": pa.array([], pa.int64()), "hb": pa.array([], pa.int64()),
            }
        )
        if len(val) == 0:
            return empty
        change = np.empty(len(val), dtype=bool)
        change[0] = True
        change[1:] = val[1:] != val[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(val))
        oa, ob, oha, ohb = [], [], [], []
        for s, e in zip(starts, ends):
            g = e - s
            if g < 2 or g > 500:
                continue
            ia, ib = np.triu_indices(g, k=1)
            oa.append(docs[s:e][ia])
            ob.append(docs[s:e][ib])
            oha.append(hashes[s:e][ia])
            ohb.append(hashes[s:e][ib])
        if not oa:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(oa), type=pa.int64()),
                "b": pa.array(np.concatenate(ob), type=pa.int64()),
                "ha": pa.array(np.concatenate(oha), type=pa.int64()),
                "hb": pa.array(np.concatenate(ohb), type=pa.int64()),
            }
        )

    cand = (
        sh.map_batches(explode_blocks, batch_format="pyarrow")
        .groupby("blk")
        .map_groups(pairs_of_block, batch_format="pyarrow")
    )

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id_a": pa.array([], type=pa.int64()),
                    "doc_id_b": pa.array([], type=pa.int64()),
                    "hamming": pa.array([], type=pa.int64()),
                }
            )
        a = t.column("a").to_numpy().astype(np.int64)
        b = t.column("b").to_numpy().astype(np.int64)
        x = t.column("ha").to_numpy().astype(np.uint64) ^ t.column(
            "hb"
        ).to_numpy().astype(np.uint64)
        ham = np.zeros(len(x), dtype=np.int64)
        xx = x.copy()
        for _ in range(64):
            ham += (xx & np.uint64(1)).astype(np.int64)
            xx >>= np.uint64(1)
        keep = ham <= max_hamming
        return pa.table(
            {
                "doc_id_a": pa.array(a[keep], type=pa.int64()),
                "doc_id_b": pa.array(b[keep], type=pa.int64()),
                "hamming": pa.array(ham[keep], type=pa.int64()),
            }
        )

    out = cand.map_batches(verify, batch_format="pyarrow").to_pandas()
    if out.empty:  # an all-empty Dataset loses its schema in to_pandas
        return pa.table(
            {
                "doc_id_a": pa.array([], pa.int64()),
                "doc_id_b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int64()),
            }
        )
    out = out.drop_duplicates(["doc_id_a", "doc_id_b"]).sort_values(
        ["doc_id_a", "doc_id_b"]
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.4):
    """Pairs (a < b) of embeddings with cosine similarity >= threshold.

    Brute-force per-batch matmul against the broadcast full matrix (fine at
    <=1e5 rows; the ANN module's LSH/IVF variants are the scale path).
    """
    import ray
    import ray.data

    import pyarrow.parquet as pq

    from .ann import batch_matrix

    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = tbl.column("vec_id").to_numpy()
    mat = batch_matrix(tbl)
    ref = ray.put((ids, mat))

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def batch_pairs(t: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        bids = t.column("vec_id").to_numpy()
        bm = batch_matrix(t)
        sims = bm @ all_mat.T
        # vectorized: a < b keeps each symmetric pair once
        ii, jj = np.nonzero((sims >= threshold) & (bids[:, None] < all_ids[None, :]))
        return pa.table(
            {
                "vec_id_a": pa.array(bids[ii], type=pa.int64()),
                "vec_id_b": pa.array(all_ids[jj], type=pa.int64()),
                "cosine": pa.array(np.round(sims[ii, jj], 6), type=pa.float64()),
            }
        )

    return ds.map_batches(batch_pairs, batch_format="pyarrow")


def _semdedup_greedy(
    ids: np.ndarray, mat: np.ndarray, eps: float
) -> tuple[np.ndarray, np.ndarray]:
    """The SemDeDup within-cluster sequential greedy, shared by
    :func:`semantic_dedup` and :func:`semantic_dedup_kmeans` (only their
    keep-priority SORT differs; rows arrive here already in scan order):
    row i is KEPT iff its cosine to every already-kept row is <= eps,
    else dup_of its most-similar kept row (ties -> earliest-kept,
    np.argmax first-hit). ``mat`` rows are L2-normalized float64."""
    n = len(ids)
    sims = mat @ mat.T
    kept = np.zeros(n, dtype=bool)
    dup_of = np.full(n, -1, dtype=np.int64)
    for i in range(n):
        ki = np.flatnonzero(kept[:i])
        if len(ki):
            s = sims[i, ki]
            j = int(np.argmax(s))
            if s[j] > eps:
                dup_of[i] = ids[ki[j]]
                continue
        kept[i] = True
    return kept, dup_of


def semantic_dedup(
    sf_dir: str,
    eps: float = 0.4,
    n_cells: int = 16,
    seed: int = 99,
    sample_rows: int = 4096,
):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings and pruning within-cluster
    near-duplicates, keeping the member FARTHEST from its centroid (the
    paper's keep-low-centroid-similarity choice, which retains the most
    diverse exemplar of each duplicate neighborhood).

    Pipeline shape (the paper's own design, which is exactly the
    partition-then-quadratic pattern that scales): centroids train
    driver-side on a bounded hash-thinned sample (``ann._sample_matrix``);
    one ``map_batches`` assigns (cell, centroid_sim) with the centroids
    broadcast once; one ``groupby(cell).map_groups`` runs the deterministic
    greedy per cluster. Within a cluster, members sorted by (centroid_sim
    ASC, vec_id ASC) are scanned greedily: an item is KEPT iff its cosine
    to every already-kept member is <= eps, else DROPPED as a duplicate of
    its most-similar kept member. Cost is O(|cluster|^2) sims per cluster —
    bounded by choosing ``n_cells`` proportional to N (the partitioning
    assumption this operator relies on; the paper used 11k clusters for
    LAION-440M).

    Returns (vec_id, cell, kept, dup_of, centroid_sim) — ``dup_of`` = -1
    for kept rows, else the kept representative's vec_id.
    """
    import ray
    import ray.data

    from .ann import _kmeans, _sample_matrix, batch_matrix

    centers = _kmeans(_sample_matrix(sf_dir, seed, sample_rows), n_cells, seed)
    cref = ray.put(centers)

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def assign(t: pa.Table) -> pa.Table:
        cen = ray.get(cref)
        bm = batch_matrix(t)
        if len(bm):
            sims = bm @ cen.T
            cells = np.argmax(sims, axis=1).astype(np.int32)
            csim = sims[np.arange(len(bm)), cells]
        else:
            cells = np.zeros(0, dtype=np.int32)
            csim = np.zeros(0, dtype=np.float64)
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "embedding": t.column("embedding"),
                "cell": pa.array(cells, type=pa.int32()),
                "centroid_sim": pa.array(csim, type=pa.float64()),
            }
        )

    def dedup_cluster(g: pa.Table) -> pa.Table:
        ids = g.column("vec_id").to_numpy()
        csim = g.column("centroid_sim").to_numpy()
        mat = batch_matrix(g)
        order = np.lexsort((ids, csim))  # keep-priority: farthest first
        ids, csim, mat = ids[order], csim[order], mat[order]
        n = len(ids)
        kept, dup_of = _semdedup_greedy(ids, mat, eps)
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "cell": pa.array(
                    np.full(n, g.column("cell")[0].as_py(), dtype=np.int32),
                    type=pa.int32(),
                ),
                "kept": pa.array(kept),
                "dup_of": pa.array(dup_of, type=pa.int64()),
                "centroid_sim": pa.array(np.round(csim, 6), type=pa.float64()),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(dedup_cluster, batch_format="pyarrow")
    )


def semantic_dedup_kmeans(
    sf_dir: str,
    eps: float = 0.4,
    k: int = 8,
    iters: int = 2,
    scale: int = 256,
):
    """SemDeDup with cells from the FULL-CORPUS exact-integer Lloyd's
    k-means (``kmeans.kmeans_fit``) instead of :func:`semantic_dedup`'s
    sampled float trainer — the composition the paper actually runs at
    scale (train real clusters, dedup within each), and the literal-free
    gate variant: the whole cell chain (init → assignments → trunc-div
    updates) is SQL-derivable, so the oracle carries NO centroid literals.
    Precision contract: the CELL half (cells, dist2, keep-priority order)
    is exact-integer and bit-for-bit vs SQL; the within-cell greedy's
    cosine is float64 with the same caveat as :func:`semantic_dedup` —
    the engine computes normalize-then-dot while DuckDB's
    list_cosine_similarity does dot-then-divide, so a pair sitting within
    a few ulps of ``eps`` (or two kept members near-tied as most-similar)
    could in principle flip; the gate corpus has no such knife-edge pair.

    Keep-priority follows the paper's keep-low-centroid-similarity choice
    translated to the integer metric: within a cell, members scan in
    (dist2 DESC, vec_id ASC) order — farthest from centroid first — and an
    item is KEPT iff its cosine to every already-kept member is <= eps,
    else DROPPED as a duplicate of its most-similar kept member. Same
    partition-then-quadratic shape as :func:`semantic_dedup`: one
    ``map_batches`` assignment with the k×dim int64 centroids broadcast
    once, one ``groupby(cell).map_groups`` greedy, O(|cell|²) sims per
    cell bounded by choosing k ∝ N.

    Returns (vec_id, cell, kept, dup_of, dist2) — ``dup_of`` = -1 for kept
    rows; ``dist2`` the exact int64 squared-L2 to the final centroid.
    """
    import ray
    import ray.data

    from .ann import batch_matrix
    from .kmeans import _assign, _quant_matrix, kmeans_fit

    cents = kmeans_fit(sf_dir, k, iters, scale)
    cref = ray.put(cents)

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def assign(t: pa.Table) -> pa.Table:
        q = _quant_matrix(t, scale)
        lab, d2 = _assign(q, ray.get(cref))
        return pa.table(
            {
                "vec_id": t.column("vec_id").cast(pa.int64()),
                "embedding": t.column("embedding"),
                "cell": pa.array(lab.astype(np.int64), pa.int64()),
                "dist2": pa.array(d2, pa.int64()),
            }
        )

    def dedup_cluster(g: pa.Table) -> pa.Table:
        ids = g.column("vec_id").to_numpy()
        d2 = g.column("dist2").to_numpy()
        mat = batch_matrix(g)
        order = np.lexsort((ids, -d2))  # dist2 DESC, vec_id ASC
        ids, d2, mat = ids[order], d2[order], mat[order]
        n = len(ids)
        kept, dup_of = _semdedup_greedy(ids, mat, eps)
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "cell": pa.array(
                    np.full(n, g.column("cell")[0].as_py(), dtype=np.int64),
                    type=pa.int64(),
                ),
                "kept": pa.array(kept),
                "dup_of": pa.array(dup_of, type=pa.int64()),
                "dist2": pa.array(d2, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(dedup_cluster, batch_format="pyarrow")
    )


def embedding_dup_pairs_lsh(
    sf_dir: str,
    threshold: float = 0.4,
    n_bits: int = 32,
    bands: int = 8,
    seed: int = 314,
):
    """Scale path for cosine near-dup: random-hyperplane LSH bucketing.

    sign(R @ v) gives an ``n_bits`` signature (R broadcast, n_bits x dim);
    signatures split into ``bands`` bands — two vectors land in the same
    band bucket iff all that band's bits agree, which happens with
    probability (1 - theta/pi)^(bits/band) per band. Candidates verify with
    exact cosine inside the bucket group; pairs dedupe on the driver
    (output-sized). Nothing holds the full matrix: only R (tiny) is
    broadcast and each bucket group sees just its own vectors.
    """
    import ray
    import ray.data

    bits_per_band = n_bits // bands
    rng = np.random.default_rng(seed)
    # hyperplanes drawn once; dim read from the parquet schema's first row
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    if pf.metadata.num_rows == 0:  # mirror the exact path: empty in, empty out
        return pa.table(
            {
                "vec_id_a": pa.array([], pa.int64()),
                "vec_id_b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    first = pf.read_row_group(0)
    dim = len(first.column("embedding")[0].as_py())
    R = rng.standard_normal((n_bits, dim))
    rref = ray.put(R)

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")

    def explode_bands(t: pa.Table) -> pa.Table:
        from .ann import batch_matrix

        Rm = ray.get(rref)
        ids = t.column("vec_id").to_numpy()
        mat = batch_matrix(t)
        bits = (mat @ Rm.T) > 0  # (n, n_bits)
        weights = 1 << np.arange(bits_per_band, dtype=np.int64)
        out = []
        for bi in range(bands):
            chunk = bits[:, bi * bits_per_band : (bi + 1) * bits_per_band]
            bh = chunk @ weights
            out.append(
                pa.table(
                    {
                        "band": pa.array(np.full(len(ids), bi, dtype=np.int32)),
                        "bh": pa.array(bh, type=pa.int64()),
                        "vec_id": pa.array(ids, type=pa.int64()),
                        "embedding": t.column("embedding"),
                    }
                )
            )
        return pa.concat_tables(out)

    def pairs_of_band(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "vec_id_a": pa.array([], pa.int64()),
                "vec_id_b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        from .ann import batch_matrix

        t = t.sort_by([("bh", "ascending"), ("vec_id", "ascending")])
        bh = t.column("bh").to_numpy()
        ids = t.column("vec_id").to_numpy()
        mat = batch_matrix(t)
        change = np.empty(len(bh), dtype=bool)
        change[0] = True
        change[1:] = bh[1:] != bh[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(bh))
        oa, ob, oc = [], [], []
        for s, e in zip(starts, ends):
            g = e - s
            if g < 2 or g > 1000:  # bucket skew guard
                continue
            sub = mat[s:e]
            sims = sub @ sub.T
            ia, ib = np.triu_indices(g, k=1)
            keep = sims[ia, ib] >= threshold
            oa.append(ids[s:e][ia[keep]])
            ob.append(ids[s:e][ib[keep]])
            oc.append(sims[ia[keep], ib[keep]])
        if not oa:
            return empty
        return pa.table(
            {
                "vec_id_a": pa.array(np.concatenate(oa), type=pa.int64()),
                "vec_id_b": pa.array(np.concatenate(ob), type=pa.int64()),
                "cosine": pa.array(
                    np.round(np.concatenate(oc), 6), type=pa.float64()
                ),
            }
        )

    cand = (
        ds.map_batches(explode_bands, batch_format="pyarrow")
        .groupby("band")
        .map_groups(pairs_of_band, batch_format="pyarrow")
    )
    out = cand.to_pandas()
    if out.empty:  # an all-empty Dataset loses its schema in to_pandas
        return pa.table(
            {
                "vec_id_a": pa.array([], pa.int64()),
                "vec_id_b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    out = (
        out.drop_duplicates(["vec_id_a", "vec_id_b"])  # a pair fires in many bands
        .sort_values(["vec_id_a", "vec_id_b"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def dedup_components(
    sf_dir: str,
    n: int = 3,
    threshold: float = 0.6,
    max_driver_pairs: int = 2_000_000,
):
    """The "so what" of near-dup detection: connected components over the
    exact n-gram-Jaccard pair graph, one row per clustered doc with its
    canonical representative (min doc_id in the component).

    The pair list is normally output-scale (near-dups are a small fraction
    of any corpus), so components resolve with a vectorized hash-min
    iteration over the pair arrays — each pass is pure numpy; convergence
    needs O(component diameter) passes. A pathological near-all-dup corpus
    makes the pair graph corpus-sized, so the public name is scale-safe by
    default: when the pair count exceeds ``max_driver_pairs`` the resolve
    automatically reroutes to :func:`dedup_components_distributed` (same
    result, label state kept distributed) instead of pulling the graph to
    the driver. Returns (doc_id, rep_id) for docs in components of
    size >= 2.
    """
    pairs_ds = ngram_jaccard_pairs(sf_dir, n=n, threshold=threshold)
    pairs_ds = pairs_ds.materialize()  # pair graph is reused: count + resolve
    if pairs_ds.count() > max_driver_pairs:
        return dedup_components_distributed(sf_dir, n=n, threshold=threshold,
                                            pairs=pairs_ds)
    pairs = pairs_ds.to_pandas()
    if pairs.empty:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "rep_id": pa.array([], pa.int64()),
            }
        )
    a = pairs["doc_id_a"].to_numpy().astype(np.int64)
    b = pairs["doc_id_b"].to_numpy().astype(np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    label = nodes.copy()  # start: own id
    ia = np.searchsorted(nodes, a)
    ib = np.searchsorted(nodes, b)
    while True:
        # hash-min: every edge pulls both endpoints to the smaller label
        m = np.minimum(label[ia], label[ib])
        new = label.copy()
        np.minimum.at(new, ia, m)
        np.minimum.at(new, ib, m)
        # pointer-jump: labels are always node ids, so chase one hop
        # (label <- label of the label's node) to halve long chains
        new = np.minimum(new, new[np.searchsorted(nodes, new)])
        if np.array_equal(new, label):
            break
        label = new
    return pa.table(
        {
            "doc_id": pa.array(nodes, type=pa.int64()),
            "rep_id": pa.array(label, type=pa.int64()),
        }
    )


def dedup_components_distributed(
    sf_dir: str,
    n: int = 3,
    threshold: float = 0.6,
    max_iters: int = 64,
    pairs=None,
):
    """Connected components with the label state DISTRIBUTED — the scale
    path :func:`dedup_components` documents: iterative hash-min label
    propagation where each round is two hash joins (attach both endpoints'
    labels) + one ``groupby(node).min`` — no driver-side arrays at any
    point; the edge list and per-round label table are Datasets.

    Convergence: labels only decrease, so the label SUM is stationary iff
    the round changed nothing (one cheap aggregate per round). Rounds
    needed = O(component diameter) — near-dup components are dense and
    shallow, so this is small; a pointer-jumping variant would cut it to
    O(log d) at the cost of an extra self-join. Returns (doc_id, rep_id),
    identical to :func:`dedup_components` (pytest + same SQL oracle).

    ``pairs`` lets a caller that already materialized the pair Dataset
    (the :func:`dedup_components` auto-reroute) skip re-running the
    shingle pipeline.
    """
    import ray.data
    from ray.data.aggregate import Min, Sum

    from .partitioning import partition_count_for_rows

    if pairs is None:
        pairs = ngram_jaccard_pairs(sf_dir, n=n, threshold=threshold)

    def to_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {"a": t.column("doc_id_a"), "b": t.column("doc_id_b")}
        )

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "rep_id": pa.array([], pa.int64())}
    )
    # the pair graph is output-scale; materialize it ONCE so iterations
    # don't re-run the shingle pipeline
    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return empty
    nparts = max(2, min(64, partition_count_for_rows(n_edges, 16) // 8))

    def nodes_of(t: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate([t.column("a").to_numpy(), t.column("b").to_numpy()])
        )
        return pa.table({"node": pa.array(u, type=pa.int64())})

    labels = (
        edges.map_batches(nodes_of, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("node", alias_name="label"))
        .materialize()
    )

    def relabel_b(t: pa.Table) -> pa.Table:
        return pa.table({"node_b": t.column("node"), "lb": t.column("label")})

    def emit_min(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy()
        b = t.column("b").to_numpy()
        m = np.minimum(t.column("label").to_numpy(), t.column("lb").to_numpy())
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b]), type=pa.int64()),
                "lab": pa.array(np.concatenate([m, m]), type=pa.int64()),
            }
        )

    prev_sum = None
    for _ in range(max_iters):
        lb = labels.map_batches(relabel_b, batch_format="pyarrow")
        e2 = edges.join(
            labels, "inner", nparts, on=("a",), right_on=("node",)
        ).join(lb, "inner", nparts, on=("b",), right_on=("node_b",))
        labels = (
            e2.map_batches(emit_min, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("lab", alias_name="label"))
            .materialize()
        )
        cur = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if cur == prev_sum:
            break
        prev_sum = cur

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t.column("node"), "rep_id": t.column("label")}
        )

    out = labels.map_batches(rename, batch_format="pyarrow").to_pandas()
    if out.empty:
        return empty
    out = out.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def keep_best_in_cluster(sf_dir: str, n: int = 3, threshold: float = 0.6):
    """Canonical-selection policy over near-dup clusters: keep the BEST
    member, not the lowest id — the RefinedWeb/CCNet production rule
    (keep the longest, least-boilerplate copy) composed from two
    hash-verified building blocks: the distributed connected components
    (:func:`dedup_components_distributed`) and the integer quality
    signals (:func:`textstats.quality_score`).

    Keep key per cluster: n_tokens DESC, stop_ratio_micro ASC, doc_id
    ASC — pure INTEGER comparisons end to end (micro-unit ratios via
    floor division), so the oracle replay has zero float risk.

    Scale shape: the cluster table is output-scale (near-dups are a small
    fraction); quality is computed ONLY for clustered docs via a pushdown
    id-filtered read (``quality_score(doc_ids=...)``), and the winner
    rank is a vectorized lexsort + run-length pass per rep — no shuffle
    beyond what the two verified inputs already did. Returns one row per
    clustered doc: (doc_id, rep_id, n_tokens, stop_ratio_micro, keep).
    """
    from .textstats import quality_score

    comp = dedup_components_distributed(sf_dir, n=n, threshold=threshold)
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("rep_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("stop_ratio_micro", pa.int64()),
            ("keep", pa.bool_()),
        ]
    )
    if comp.num_rows == 0:
        return schema.empty_table()
    doc = comp.column("doc_id").to_numpy()
    rep = comp.column("rep_id").to_numpy()

    q = quality_score(sf_dir, doc_ids=doc).to_pandas()  # clustered docs only
    qd = q.set_index("doc_id")
    ntok = qd.loc[doc, "n_tokens"].to_numpy().astype(np.int64)
    srat = qd.loc[doc, "stop_ratio_micro"].to_numpy().astype(np.int64)

    # winner per rep: n_tokens desc, stop_ratio asc, doc_id asc
    order = np.lexsort((doc, srat, -ntok, rep))
    rs = rep[order]
    first = np.empty(len(rs), dtype=bool)
    first[0] = True
    first[1:] = rs[1:] != rs[:-1]
    keep_sorted = first
    keep = np.empty(len(rs), dtype=bool)
    keep[order] = keep_sorted
    return pa.table(
        {
            "doc_id": pa.array(doc, type=pa.int64()),
            "rep_id": pa.array(rep, type=pa.int64()),
            "n_tokens": pa.array(ntok, type=pa.int64()),
            "stop_ratio_micro": pa.array(srat, type=pa.int64()),
            "keep": pa.array(keep, type=pa.bool_()),
        }
    ).cast(schema)


def winnow_pairs(
    sf_dir: str,
    k: int = 3,
    w: int = 4,
    min_shared: int = 5,
    max_df: int = 50,
    max_pairs: int = 2_000_000,
):
    """Near-dup candidate pairs via shared winnowing fingerprints (the
    MOSS design, Schleimer et al. 2003) — the fourth dedup family beside
    MinHash-LSH / SimHash / n-gram Jaccard, built on the SAME bit-exact
    fingerprint stream `textstats.winnow_fingerprints` gates: two docs
    pair when they share >= ``min_shared`` distinct fingerprints, and a
    fingerprint shared by more than ``max_df`` docs is dropped first
    (boilerplate suppression — MOSS's "too common to be evidence" rule,
    which also bounds every bucket's pair fan-out at max_df^2).

    Pipeline: per-batch distinct (doc, fp) rows (the shared winnowing
    kernel; fingerprints travel as int64 two's-complement views — a
    bijection, and only equality matters downstream) -> ONE fp-keyed
    shuffle -> per-bucket pair explosion under the df cap -> ONE
    pair-keyed count shuffle -> pairs with n_shared >= min_shared.
    ``max_pairs`` guards the bounded driver collect.

    Returns (doc_a, doc_b, n_shared).
    """
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Sum

    from .textstats import _read_docs as _read_docs_ts, _winnow_doc_fps

    if min_shared < 1 or max_df < 2:
        raise ValueError("winnow_pairs needs min_shared >= 1, max_df >= 2")

    def fp_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        dd, mm = _winnow_doc_fps(t, k, w)
        return pa.table(
            {
                "fp": pa.array(mm.view(np.int64), pa.int64()),
                "doc_id": pa.array(ids[dd], pa.int64()),
            }
        )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids = np.sort(g.column("doc_id").to_numpy())
        if len(ids) < 2 or len(ids) > max_df:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        ai, bi = np.triu_indices(len(ids), 1)
        return pa.table(
            {
                "doc_a": pa.array(ids[ai], pa.int64()),
                "doc_b": pa.array(ids[bi], pa.int64()),
                "n": pa.array(np.ones(len(ai), np.int64), pa.int64()),
            }
        )

    counted = (
        _read_docs_ts(sf_dir)
        .map_batches(fp_rows, batch_format="pyarrow")
        .groupby("fp")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Sum("n", alias_name="n_shared"))
    )
    out_rows = []
    for b in counted.iter_batches(batch_format="pyarrow", batch_size=None):
        keep = pc.greater_equal(b.column("n_shared"), min_shared)
        kept = b.filter(keep)
        out_rows.append(kept)
        if sum(t.num_rows for t in out_rows) > max_pairs:
            raise ValueError(
                f"winnow_pairs: over {max_pairs} qualifying pairs — "
                "raise min_shared or lower max_df (near-all-dup corpus)"
            )
    if not out_rows:
        t = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "n_shared": pa.array([], pa.int64()),
            }
        )
        return t
    t = pa.concat_tables(out_rows)
    order = pc.sort_indices(
        t, sort_keys=[("doc_a", "ascending"), ("doc_b", "ascending")]
    )
    return t.take(order).select(["doc_a", "doc_b", "n_shared"])
