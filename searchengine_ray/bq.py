"""Binary-quantization ANN (the Lucene/ES "BBQ" direction, reduced to its
classic deterministic core): 1 BIT per dimension — a 64-dim vector becomes
ONE uint64 word, a 512x-smaller scan than float64 — with Hamming-distance
shortlisting and an exact-integer rescoring pass over the shortlist.

Two-phase shape (exactly what ES ``knn`` over BBQ-quantized vectors runs):

1. **Coarse scan**: corpus codes are sign bits (``x > 0`` of the
   L2-normalized vector; sign is scale-invariant, so this equals the raw
   sign). Hamming distance to each query code = ``popcount(xor)`` —
   pure integer ops, vectorized via an 8-bit popcount table. Per batch,
   each query keeps a ``shortlist``-sized candidate set ordered by
   (hamming ASC, vec_id ASC) — a decomposable selection, so the union of
   batch shortlists always contains the global shortlist.
2. **Rescore**: shortlist candidates are re-scored with the SQ8
   exact-integer surrogate dot (``sq8.sq_encode`` codes x the query's
   int64 weight vector) — order-free int64 arithmetic, no float
   accumulation on any corpus-sized path. Final rank: (score DESC,
   neighbor_id ASC) over the global shortlist.

Scale shape: broadcast (query codes, weights, train stats) once via
``ray.put``; ONE shuffle-free ``map_batches`` scan emitting
<= n_queries x shortlist rows per batch; a bounded streaming driver fold
(never more than n_queries x shortlist resident rows). Determinism: the
only floats are elementwise normalize/affine ops that DuckDB replays
bit-for-bit; selection keys are total orders on integers.

Reference scope analog: beyond-reference ANN family (SURVEY §2
LLM-pipeline operators); sibling of ``annpq.pq_topk`` (code compression)
and ``sq8.sq8_topk`` (scalar quantization); composition mirrors
``annpq.pq_refine_topk``'s shortlist-then-rerank design.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import _query_matrix, _sample_matrix, batch_matrix
from .sq8 import SQ_SCALE, SQ_SEED, sq_encode, sq_train

# 8-bit popcount lookup table (numpy 1.26 has no bitwise_count)
_POP8 = np.array(
    [bin(i).count("1") for i in range(256)], dtype=np.uint8
)

_BQ_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("neighbor_id", pa.int64()),
        ("hamming", pa.int64()),
        ("score", pa.int64()),
        ("rank", pa.int32()),
    ]
)


def bq_pack(mat: np.ndarray) -> np.ndarray:
    """(n, dim) float matrix -> (n,) uint64 sign codes; bit d is set iff
    ``x_d > 0``. Requires dim <= 64 (one machine word — the point of BQ)."""
    n, dim = mat.shape if mat.ndim == 2 else (0, 0)
    if dim > 64:
        raise ValueError(f"bq_pack packs into one uint64; dim={dim} > 64")
    bits = (mat > 0.0).astype(np.uint64)
    weights = np.uint64(1) << np.arange(dim, dtype=np.uint64)
    return bits @ weights  # (n,) uint64


def hamming_matrix(q_codes: np.ndarray, c_codes: np.ndarray) -> np.ndarray:
    """(nq,) x (nc,) uint64 codes -> (nq, nc) int64 Hamming distances via
    byte-wise popcount table lookup."""
    x = np.bitwise_xor(q_codes[:, None], c_codes[None, :])  # (nq, nc) u64
    b = x.view(np.uint8).reshape(x.shape[0], x.shape[1], 8)
    return _POP8[b].sum(axis=2, dtype=np.int64)


def _shortlist_cols(
    qi: np.ndarray,
    ham: np.ndarray,
    bids: np.ndarray,
    shortlist: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-query (hamming ASC, vec_id ASC) selection of ``shortlist``
    candidates, vectorized along the query axis via a packed composite
    key (hamming < 2^8 always; vec_id must fit 52 bits — asserted)."""
    nq, nb = ham.shape
    if nq == 0 or nb == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e, np.empty((0,), dtype=np.intp)
    if bids.size and int(bids.max()) >= (1 << 52):
        raise ValueError("bq shortlist packing requires vec_id < 2^52")
    key = (ham << np.int64(52)) + bids[None, :].astype(np.int64)
    kk = min(shortlist, nb)
    top = np.argpartition(key, kk - 1, axis=1)[:, :kk]  # (nq, kk) col idx
    rows = np.repeat(qi.astype(np.int64), kk)
    cols = top.ravel()
    return (
        rows,
        bids[cols].astype(np.int64),
        np.take_along_axis(ham, top, axis=1).ravel(),
        cols,
    )


def bq_topk(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 10,
    shortlist: int = 50,
    seed: int = SQ_SEED,
    sample_rows: int = 4096,
) -> pa.Table:
    """Top-k neighbors of the first ``n_queries`` vectors: Hamming
    shortlist over 1-bit sign codes, SQ8 exact-integer rescoring pass.
    Returns (query_id, neighbor_id, hamming, score, rank) with ``score``
    the int64 surrogate dot and rank by (score DESC, neighbor_id ASC)
    within the (hamming ASC, vec_id ASC) global shortlist."""
    import ray
    import ray.data

    mins, spans = sq_train(_sample_matrix(sf_dir, seed, sample_rows))
    q_ids, q_mat = _query_matrix(sf_dir, n_queries)
    q_codes = bq_pack(q_mat)
    w = np.floor(
        q_mat * spans[None, :] * float(SQ_SCALE) / 255.0 + 0.5
    ).astype(np.int64)
    w[:, spans <= 0] = 0
    ref = ray.put((q_ids, q_codes, w, mins, spans))

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def batch_scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "hamming": pa.array([], pa.int64()),
                    "score": pa.array([], pa.int64()),
                }
            )
        qi, qc, wm, mn, sp = ray.get(ref)
        bids = t.column("vec_id").to_numpy()
        mat = batch_matrix(t)
        ham = hamming_matrix(qc, bq_pack(mat))
        # self-exclusion: force past any real distance so it never shortlists
        ham[qi[:, None] == bids[None, :]] = np.int64(1 << 10)
        rows_q, cand_ids, cand_ham, cols = _shortlist_cols(
            qi, ham, bids, shortlist
        )
        keep = cand_ham < (1 << 10)
        rows_q, cand_ids, cand_ham, cols = (
            rows_q[keep], cand_ids[keep], cand_ham[keep], cols[keep]
        )
        # rescore ONLY the batch-shortlisted rows (<= nq x shortlist)
        ucols, inv = np.unique(cols, return_inverse=True)
        codes = sq_encode(mat[ucols], mn, sp).astype(np.int64)
        dots = wm @ codes.T  # (nq, nu) int64, exact
        qpos = {int(q): i for i, q in enumerate(qi)}
        qrow = np.array([qpos[int(q)] for q in rows_q], dtype=np.intp)
        return pa.table(
            {
                "query_id": pa.array(rows_q, type=pa.int64()),
                "neighbor_id": pa.array(cand_ids, type=pa.int64()),
                "hamming": pa.array(cand_ham, type=pa.int64()),
                "score": pa.array(dots[qrow, inv], type=pa.int64()),
            }
        )

    cand = ds.map_batches(batch_scan, batch_format="pyarrow")

    # streaming driver fold: running per-query shortlist by
    # (hamming ASC, vec_id ASC), never more than n_queries x shortlist rows
    q_run = np.empty(0, dtype=np.int64)
    n_run = np.empty(0, dtype=np.int64)
    h_run = np.empty(0, dtype=np.int64)
    s_run = np.empty(0, dtype=np.int64)
    for batch in cand.iter_batches(batch_format="pyarrow", batch_size=None):
        if batch.num_rows == 0:
            continue
        q = np.concatenate([q_run, batch.column("query_id").to_numpy()])
        nid = np.concatenate([n_run, batch.column("neighbor_id").to_numpy()])
        h = np.concatenate([h_run, batch.column("hamming").to_numpy()])
        s = np.concatenate([s_run, batch.column("score").to_numpy()])
        order = np.lexsort((nid, h, q))  # query asc, hamming asc, id asc
        q, nid, h, s = q[order], nid[order], h[order], s[order]
        starts = np.flatnonzero(np.r_[True, q[1:] != q[:-1]])
        rank = np.arange(len(q)) - np.repeat(
            starts, np.diff(np.append(starts, len(q)))
        )
        keep = rank < shortlist
        q_run, n_run, h_run, s_run = q[keep], nid[keep], h[keep], s[keep]

    if len(q_run) == 0:
        return _BQ_SCHEMA.empty_table()
    # rescore rank within the global shortlist: (score DESC, id ASC)
    order = np.lexsort((n_run, -s_run, q_run))
    q, nid, h, s = q_run[order], n_run[order], h_run[order], s_run[order]
    starts = np.flatnonzero(np.r_[True, q[1:] != q[:-1]])
    rank = np.arange(len(q)) - np.repeat(
        starts, np.diff(np.append(starts, len(q)))
    )
    keep = rank < k
    return pa.table(
        {
            "query_id": pa.array(q[keep], type=pa.int64()),
            "neighbor_id": pa.array(nid[keep], type=pa.int64()),
            "hamming": pa.array(h[keep], type=pa.int64()),
            "score": pa.array(s[keep], type=pa.int64()),
            "rank": pa.array((rank[keep] + 1).astype(np.int32), pa.int32()),
        }
    ).cast(_BQ_SCHEMA)


def lsh_multiprobe_topk(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 10,
    n_bits: int = 8,
) -> pa.Table:
    """LSH-bucketed ANN with multiprobe (the other classic scale path
    beside IVF): vectors bucket by an ``n_bits`` sign code over the
    FIRST n_bits dimensions (axis-aligned hyperplanes — deterministic
    and literal-free, the 16x-coarser cousin of `bq_topk`'s full code),
    a query probes its own bucket plus all ``n_bits`` Hamming-1
    neighbor buckets (the multiprobe trick: one extra flip recovers
    most of the recall a single-bucket lookup loses), and probed
    candidates re-rank by EXACT cosine. Returns
    (query_id, neighbor_id, cosine, rank) — cosine rounded to 6, rank
    by (cosine DESC, neighbor_id ASC), self excluded.

    Scale shape: at scale the corpus is hive-partitioned by code (the
    ann_ivf pattern — probed buckets prune the read); at gate scale one
    shuffle-free scan filters per batch. Probe sets broadcast once;
    driver fold is the bounded `_merge_topk`.
    """
    import ray
    import ray.data

    from .ann import _candidate_rows, _merge_topk

    if not (1 <= n_bits <= 16):
        raise ValueError("n_bits must be in [1, 16]")
    q_ids, q_mat = _query_matrix(sf_dir, n_queries)
    weights = np.int64(1) << np.arange(n_bits, dtype=np.int64)
    q_codes = ((q_mat[:, :n_bits] > 0.0).astype(np.int64) @ weights)
    # probe set per query: own bucket + every Hamming-1 flip
    flips = np.concatenate(
        [np.zeros(1, np.int64), np.int64(1) << np.arange(n_bits)]
    )
    probes = q_codes[:, None] ^ flips[None, :]  # (nq, n_bits+1)
    ref = ray.put((q_ids, q_mat, probes))

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def batch_scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        qi, qm, pr = ray.get(ref)
        bids = t.column("vec_id").to_numpy()
        mat = batch_matrix(t)
        codes = ((mat[:, :n_bits] > 0.0).astype(np.int64) @ weights)
        # candidate mask FIRST, exact cosine only for probed columns —
        # the prune must precede the matmul or it saves nothing (the
        # rescore-only-the-shortlist design bq_topk uses above)
        member = (codes[None, :, None] == pr[:, None, :]).any(axis=2)
        cols = np.flatnonzero(member.any(axis=0))
        if len(cols) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        sims = np.full((len(qi), len(mat)), -np.inf)
        sims[:, cols] = qm @ mat[cols].T  # exact rerank metric
        sims[~member] = -np.inf
        sims[qi[:, None] == bids[None, :]] = -np.inf
        return _candidate_rows(qi, sims, bids, k)

    return _merge_topk(ds.map_batches(batch_scan, batch_format="pyarrow"), k)
