"""Hybrid lexical+vector retrieval via reciprocal rank fusion (the
Elasticsearch/OpenSearch ``rrf`` retriever): fuse per-leg TOP-N RANKINGS —
a BM25 ranking from the inverted index and a cosine ranking over the
embeddings table — into one list scored

    rrf(doc) = sum over legs ranking doc of 1 / (rrf_k + rank_leg(doc))

(Cormack, Clarke & Buettcher 2009, SIGIR). RRF only consumes RANKS, never
scores, which is what makes it the standard way to combine incomparable
scoring scales (BM25 logs vs cosine in [-1, 1]).

Scale shape: each leg is already a distributed top-N in this repo (BM25
MaxScore serving, ANN brute/IVF scan with per-block candidate merge); the
fusion itself touches at most ``n_candidates x legs`` (id, rank) int rows —
driver/coordinator-sized by construction, the same reduce ES's coordinating
node performs. Floating-point determinism: each leg contributes exactly one
``1/(rrf_k + rank)`` term added in FIXED leg order onto a zero accumulator,
so a DuckDB oracle reproduces the sum bitwise (``coalesce(t1,0) +
coalesce(t2,0)`` is the identical op sequence).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("rrf", pa.float64()), ("rank", pa.int64())]
)


def rrf_fuse(
    legs: "list[tuple[np.ndarray, np.ndarray]]",
    rrf_k: int = 60,
    k: int = 10,
) -> pa.Table:
    """Fuse ``legs`` = [(doc_ids, ranks 1-based), ...] (leg order = FP
    accumulation order); returns top ``k`` by (rrf desc, doc_id asc)."""
    if not legs or all(len(ids) == 0 for ids, _ in legs):
        return _SCHEMA.empty_table()
    ids = np.unique(
        np.concatenate([np.asarray(i, dtype=np.int64) for i, _ in legs])
    )
    tot = np.zeros(len(ids), dtype=np.float64)
    for lid, lrank in legs:
        lid = np.asarray(lid, dtype=np.int64)
        idx = np.searchsorted(ids, lid)
        tot[idx] += 1.0 / (rrf_k + np.asarray(lrank, dtype=np.float64))
    order = np.lexsort((ids, -tot))[:k]
    return pa.table(
        {
            "doc_id": pa.array(ids[order], type=pa.int64()),
            "rrf": pa.array(tot[order], type=pa.float64()),
            "rank": pa.array(
                np.arange(1, len(order) + 1, dtype=np.int64), type=pa.int64()
            ),
        }
    )


_LIN_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("score_r", pa.float64()), ("rank", pa.int64())]
)


def linear_fuse(
    legs: "list[tuple[np.ndarray, np.ndarray]]",
    weights: "list[float]",
    k: int = 10,
) -> pa.Table:
    """The ES ``linear`` retriever with the ``minmax`` normalizer: each
    leg's scores normalize to [0, 1] over THAT leg's own candidate set
    (``(s - min) / (max - min)``; a zero-span leg normalizes to all 1.0 —
    every candidate is equally best), then fuse as ``sum w_i * norm_i``
    with 0 contribution for docs a leg didn't return, accumulated in fixed
    leg order onto a zero vector so a SQL ``coalesce(w*norm, 0) + ...``
    reproduces the doubles bitwise. Top-``k`` by (score desc, doc_id asc).
    Unlike :func:`rrf_fuse` this consumes SCORES, so it preserves margin
    information within a leg at the cost of needing the minmax rescale to
    make BM25-log and cosine scales commensurable."""
    if not legs or all(len(ids) == 0 for ids, _ in legs):
        return _LIN_SCHEMA.empty_table()
    ids = np.unique(
        np.concatenate([np.asarray(i, dtype=np.int64) for i, _ in legs])
    )
    tot = np.zeros(len(ids), dtype=np.float64)
    for (lid, ls), w in zip(legs, weights):
        lid = np.asarray(lid, dtype=np.int64)
        if len(lid) == 0:
            continue
        ls = np.asarray(ls, dtype=np.float64)
        mn, mx = ls.min(), ls.max()
        norm = (ls - mn) / (mx - mn) if mx > mn else np.ones(len(ls))
        tot[np.searchsorted(ids, lid)] += w * norm
    order = np.lexsort((ids, -tot))[:k]
    return pa.table(
        {
            "doc_id": pa.array(ids[order], type=pa.int64()),
            "score_r": pa.array(np.round(tot[order], 6), type=pa.float64()),
            "rank": pa.array(
                np.arange(1, len(order) + 1, dtype=np.int64), type=pa.int64()
            ),
        }
    )


def hybrid_linear(
    engine,
    sf_dir: str,
    query: str,
    n_candidates: int = 50,
    k: int = 10,
    w_lex: float = 0.7,
    w_vec: float = 0.3,
    query_vec_id: int = 0,
) -> pa.Table:
    """Score-normalized BM25 + embedding-cosine hybrid (the ES ``linear``
    retriever; :func:`hybrid_rrf`'s score-aware sibling). Lexical leg =
    ``engine``'s ranking of ``query`` cut to ``n_candidates`` (the engine's
    own score-desc/external-id-asc order); vector leg = exact cosine
    top-``n_candidates`` of ``embeddings[query_vec_id]`` (self excluded),
    vec_id keyed to doc_id; legs minmax-normalize independently and fuse
    ``w_lex * lex + w_vec * vec`` in (lexical, vector) order."""
    from .ann import brute_topk

    lex = engine.search("q", query)
    n_lex = min(n_candidates, lex.num_rows)
    lex_ids = lex.column("doc_id").to_numpy()[:n_lex]
    lex_scores = lex.column("score").to_numpy()[:n_lex]

    vec = brute_topk(sf_dir, n_queries=query_vec_id + 1, k=n_candidates)
    mine = vec.filter(
        pa.compute.equal(vec.column("query_id"), query_vec_id)
    )
    vec_ids = mine.column("neighbor_id").to_numpy()
    vec_scores = mine.column("cosine").to_numpy()

    return linear_fuse(
        [(lex_ids, lex_scores), (vec_ids, vec_scores)],
        [w_lex, w_vec],
        k=k,
    )


def hybrid_rrf(
    engine,
    sf_dir: str,
    query: str,
    n_candidates: int = 100,
    rrf_k: int = 60,
    k: int = 10,
    query_vec_id: int = 0,
) -> pa.Table:
    """BM25 + embedding-cosine hybrid: lexical leg = ``engine``'s ranking
    of ``query`` truncated to ``n_candidates`` (score desc, external_id
    asc — the engine's global comparator); vector leg = exact cosine
    top-``n_candidates`` neighbors of ``embeddings[query_vec_id]`` (self
    excluded, sim desc / vec_id asc), vec_id keyed to doc_id. Legs fuse in
    (lexical, vector) order."""
    from .ann import brute_topk

    lex = engine.search("q", query)
    n_lex = min(n_candidates, lex.num_rows)
    lex_ids = lex.column("doc_id").to_numpy()[:n_lex]
    lex_ranks = np.arange(1, n_lex + 1, dtype=np.int64)

    vec = brute_topk(sf_dir, n_queries=query_vec_id + 1, k=n_candidates)
    mine = vec.filter(
        pa.compute.equal(vec.column("query_id"), query_vec_id)
    )
    vec_ids = mine.column("neighbor_id").to_numpy()
    vec_ranks = mine.column("rank").to_numpy()

    return rrf_fuse(
        [(lex_ids, lex_ranks), (vec_ids, vec_ranks)], rrf_k=rrf_k, k=k
    )
