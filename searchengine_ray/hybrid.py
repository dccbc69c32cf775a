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
