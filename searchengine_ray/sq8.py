"""Scalar-quantization ANN (SQ8 — the faiss ScalarQuantizer / Lucene int8
HNSW storage scheme): per-dimension affine int8 codes, 8× smaller scans
than float64 (4× vs float32), the OTHER standard compressed-domain path
beside product quantization (``annpq``). PQ wins at extreme compression
(16 B/vector); SQ8 keeps one code per dimension (64 B/vector here) with
near-exact recall — production engines ship both.

Determinism design: scoring is EXACT-INTEGER. Per query the engine builds
an int64 weight vector w_d = floor(q_d·span_d·2^20/255 + 0.5) once
(model-sized), and every corpus vector scores as the int64 dot
``codes · w`` — order-free integer arithmetic, no float accumulation
anywhere on the corpus path. The affine bias Σ q_d·min_d is constant per
query, so dropping it leaves the RANKING identical — the score column IS
the integer surrogate. Training (per-dim min/span over the bounded
deterministic sample) and encoding (floor((x-min)·255/span + 0.5),
clamped) are elementwise IEEE ops DuckDB replays bit-for-bit, so the
oracle re-derives train + encode + weights + integer dot + top-k
end-to-end with no literals.

Scale shape: identical to ``ann.brute_topk`` — broadcast (query weights,
mins, spans) via one ``ray.put``, shuffle-free ``map_batches`` scan with
vectorized per-batch partial top-k, bounded streaming driver fold
(≤ n_queries × k rows).

Reference scope analog: beyond-reference ANN family (SURVEY §2
LLM-pipeline operators); sibling of ``annpq.pq_topk``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import (
    _candidate_rows, _merge_topk, _query_matrix, _sample_matrix, batch_matrix,
)

SQ_SCALE = 1 << 20
SQ_LEVELS = 255
SQ_SEED = 7


def sq_train(mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (mins, spans) over an L2-normalized sample matrix —
    order-free exact reductions, so the oracle recomputes them from the
    same rows."""
    mins = mat.min(axis=0)
    return mins, mat.max(axis=0) - mins


def sq_encode(mat: np.ndarray, mins: np.ndarray, spans: np.ndarray) -> np.ndarray:
    """(n, dim) float64 -> uint8 codes: floor((x-min)·255/span + 0.5)
    clamped to [0, 255]; zero-span dimensions encode 0."""
    safe = np.where(spans > 0, spans, 1.0)
    c = np.floor((mat - mins) * 255.0 / safe + 0.5)
    c = np.clip(c, 0.0, 255.0)
    c[:, spans <= 0] = 0.0
    return c.astype(np.uint8)


def sq8_topk(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 10,
    seed: int = SQ_SEED,
    sample_rows: int = 4096,
) -> pa.Table:
    """Top-k neighbors of the first ``n_queries`` vectors under the SQ8
    integer surrogate score (self excluded). Returns
    (query_id, neighbor_id, score, rank) with ``score`` the exact int64
    ``codes · w`` dot and (score DESC, neighbor_id ASC) ranks."""
    import ray
    import ray.data

    mins, spans = sq_train(_sample_matrix(sf_dir, seed, sample_rows))
    q_ids, q_mat = _query_matrix(sf_dir, n_queries)
    # model-sized float work, elementwise IEEE ops only (no accumulation):
    # ((q*span)*2^20)/255 + 0.5 left-assoc, mirrored literally in SQL
    w = np.floor(
        q_mat * spans[None, :] * float(SQ_SCALE) / 255.0 + 0.5
    ).astype(np.int64)
    w[:, spans <= 0] = 0
    ref = ray.put((q_ids, w, mins, spans))

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def batch_topk(t: pa.Table) -> pa.Table:
        qi, wm, mn, sp = ray.get(ref)
        bids = t.column("vec_id").to_numpy()
        codes = sq_encode(batch_matrix(t), mn, sp).astype(np.int64)
        # exact int64 matmul; scores < 255·2^20·dim << 2^53, so the float
        # view used by the shared candidate/fold helpers stays exact
        sims = (wm @ codes.T).astype(np.float64)
        sims[qi[:, None] == bids[None, :]] = -np.inf
        return _candidate_rows(qi, sims, bids, k)

    out = _merge_topk(ds.map_batches(batch_topk, batch_format="pyarrow"), k)
    return pa.table(
        {
            "query_id": out.column("query_id"),
            "neighbor_id": out.column("neighbor_id"),
            "score": out.column("cosine").cast(pa.int64()),
            "rank": out.column("rank"),
        }
    )
