"""Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998).

MMR greedily re-orders a relevance-ranked candidate list to trade
relevance against novelty: at each step it picks

    argmax_d  lam * rel(d) - (1 - lam) * max_{s in S} sim(d, s)

over the not-yet-selected candidates (``S`` = already selected; the max
term is 0 while ``S`` is empty), ties -> lowest id. It is the
similarity-based sibling of the intent-aware diversifiers in
:mod:`.diversity` (xQuAD / PM2, reference ``Homeworks/HW5``): those need
intent judgments, MMR needs only the embedding column — which is why it
is the standard de-duplicating re-rank for RAG retrieval and
training-data selection.

Scale shape (the xQuAD/PM2/hybrid_rrf contract): candidate generation is
the DISTRIBUTED hash-verified ann scan (``ann.brute_topk`` — per-block
partial top-k, bounded driver fold); only the ``n_candidates`` winners'
embeddings are then re-read with a pushdown id filter, and the greedy
itself runs coordinator-side over an ``n_candidates x n_candidates``
similarity matrix — output-scale by construction, never the corpus. The
float arithmetic (``lam * rel - (1-lam) * maxsim``, running max over the
kept set) uses one fixed expression so the DuckDB oracle replays it
(see ``__ray_entry__._mmr_sql``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SCHEMA = pa.schema(
    [("vec_id", pa.int64()), ("mmr", pa.float64()), ("rank", pa.int32())]
)


def mmr_greedy(
    vids: np.ndarray,
    rel: np.ndarray,
    sims: np.ndarray,
    k: int,
    lam: float,
) -> pa.Table:
    """Greedy MMR over an in-memory candidate set: ``vids`` (ids),
    ``rel`` (relevance per candidate), ``sims`` (pairwise candidate
    similarity, square). Score expression and the running kept-set max
    mirror the SQL oracle term for term; argmax ties -> lowest id."""
    n = len(vids)
    k = min(k, n)
    oml = 1.0 - lam
    # -inf = "no kept member yet": the max over a NON-empty kept set may
    # legitimately be negative (cosines), so a zero floor would be wrong;
    # only the empty-set case substitutes 0 (the oracle's coalesce)
    maxsim = np.full(n, -np.inf)
    taken = np.zeros(n, dtype=bool)
    out_id = np.empty(k, dtype=np.int64)
    out_s = np.empty(k, dtype=np.float64)
    for step in range(k):
        pen = np.where(np.isfinite(maxsim), maxsim, 0.0)
        score = lam * rel - oml * pen
        score[taken] = -np.inf
        pick = np.lexsort((vids, -score))[0]
        out_id[step] = vids[pick]
        out_s[step] = score[pick]
        taken[pick] = True
        maxsim = np.maximum(maxsim, sims[pick])
    return pa.table(
        {
            "vec_id": pa.array(out_id, type=pa.int64()),
            "mmr": pa.array(np.round(out_s, 6), type=pa.float64()),
            "rank": pa.array(np.arange(1, k + 1, dtype=np.int32), type=pa.int32()),
        }
    ).cast(_SCHEMA)


def mmr_rerank(
    sf_dir: str,
    query_vec_id: int = 0,
    n_candidates: int = 50,
    k: int = 10,
    lam: float = 0.7,
) -> pa.Table:
    """MMR over the exact-cosine top-``n_candidates`` of one query
    embedding. The corpus-wide scan is the distributed ``brute_topk``
    path; candidate vectors are re-read with a pushdown id filter
    (bounded: ``n_candidates`` rows) and rel / pairwise sims recomputed
    in float64 on the normalized matrix — the exact quantities the
    oracle derives with ``list_cosine_similarity``."""
    import pyarrow.compute as pc
    import ray.data

    from .ann import _query_matrix, brute_topk

    cand = brute_topk(sf_dir, n_queries=query_vec_id + 1, k=n_candidates)
    cand = cand.filter(pc.equal(cand.column("query_id"), query_vec_id))
    cand_ids = np.sort(cand.column("neighbor_id").to_numpy())

    rows = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filter=pc.field("vec_id").isin(pa.array(cand_ids)),
    ).take_all()  # bounded: exactly the n_candidates shortlist rows
    rows.sort(key=lambda r: r["vec_id"])
    vids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    cmat = np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    norms = np.linalg.norm(cmat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    cmat = cmat / norms

    q_ids, q_mat = _query_matrix(sf_dir, query_vec_id + 1)
    q = q_mat[int(np.flatnonzero(q_ids == query_vec_id)[0])]
    rel = cmat @ q
    sims = cmat @ cmat.T
    return mmr_greedy(vids, rel, sims, k=k, lam=lam)
