"""Top-k pruning for flat BM25 queries: vectorized MaxScore with block-max
term bounds (the document-at-a-time block-max WAND family, re-expressed for
vectorized in-memory postings).

The default query shape — ``#sum(#score(t1) ... #score(tn))`` after the
model wraps a bare query (`QryEval.java:121-122`) — does not need the full
DAAT operator machinery. This fast path:

1. drops terms whose idf clamps to 0 (``max(0, ln((N-df+.5)/(df+.5)))``,
   `QrySopScore.java:131`): their contribution is identically 0, and at
   df > N/2 they are precisely the most expensive lists;
2. computes a per-term upper bound from the index's block-max skip metadata
   (max over blocks of ``idf * mtf/(mtf + k1(1-b+b*min_dl/ave))`` — score is
   increasing in tf and decreasing in dl, so (block max tf, block min dl)
   bounds every doc in the block) WITHOUT decoding postings;
3. seeds a threshold theta by fully scoring the candidates of the
   highest-bound term, then excludes every term set whose bound suffix-sum
   is strictly below theta (MaxScore): docs appearing only in excluded
   lists cannot reach the top k;
4. scores the surviving candidate union with the same per-term gather/add
   in query order as the general evaluator -> bitwise-identical scores.

EXACTNESS: if fewer than k positive-score candidates exist, zero-score
matching docs participate in the tail by the external-id tie-break; the
fast path detects this and falls back to full evaluation. Verified
rank-identical to the general path by pytest across fixtures.
"""

from __future__ import annotations

import numpy as np

from .config import ModelParams
from .indexio import InvertedIndex
from .qryparse import Op, Term


def flat_bm25_terms(tree) -> "list[Term] | None":
    """The [Term] list if the tree is a flat BM25 sum, else None."""
    if isinstance(tree, Term):
        return None
    if tree.name == "#score":
        a = tree.args[0]
        return [a] if isinstance(a, Term) else None
    if tree.name != "#sum":
        return None
    out = []
    for c in tree.args:
        if isinstance(c, Op) and c.name == "#score" and isinstance(c.args[0], Term):
            out.append(c.args[0])
        else:
            return None
    return out


def _idf(index: InvertedIndex, field: str, term: str) -> float:
    df = index.postings(field, term, need_positions=False).stat_df
    N = float(index.num_docs)
    return max(0.0, np.log((N - df + 0.5) / (df + 0.5)))


def term_upper_bound(
    index: InvertedIndex, field: str, term: str, p: ModelParams
) -> float:
    """Block-max bound: no doc in the list can score above this."""
    idf = _idf(index, field, term)
    if idf == 0.0:
        return 0.0
    blocks = index.block_metadata(field, term)
    if blocks is None:
        return 0.0
    _, max_tf, min_dl = blocks
    ave = float(index.sum_field_lengths(field)) / float(index.doc_count(field))
    tf = max_tf.astype(np.float64)
    dl = min_dl.astype(np.float64)
    ub = idf * tf / (tf + p.k1 * (1.0 - p.b + p.b * dl / ave))
    return float(ub.max())


def _score_candidates(
    index: InvertedIndex, terms: list[Term], cand: np.ndarray, p: ModelParams
) -> np.ndarray:
    """Sum of per-term BM25 contributions over cand, in query order (same
    accumulation order as the general evaluator -> identical floats)."""
    scores = np.zeros(len(cand), np.float64)
    N = float(index.num_docs)
    for t in terms:
        post = index.postings(t.field, t.term, need_positions=False)
        if post.df == 0:
            continue
        idf = max(0.0, np.log((N - post.stat_df + 0.5) / (post.stat_df + 0.5)))
        pos = np.searchsorted(post.doc_ids, cand)
        pos_c = np.clip(pos, 0, post.df - 1)
        hit = post.doc_ids[pos_c] == cand
        if not hit.any():
            continue
        dl = index.doclen(t.field, cand[hit]).astype(np.float64)
        ave = float(index.sum_field_lengths(t.field)) / float(
            index.doc_count(t.field)
        )
        tf = post.tfs[pos_c[hit]].astype(np.float64)
        scores[hit] += idf * tf / (tf + p.k1 * (1.0 - p.b + p.b * dl / ave))
    return scores


def flat_bm25_topk(
    index: InvertedIndex, terms: list[Term], p: ModelParams
) -> "tuple[np.ndarray, np.ndarray] | None":
    """(docs, scores) of the exact top-k candidate set, or None to signal
    'fall back to full evaluation' (exactness not provable here)."""
    k = p.top_k
    scoring = [t for t in terms if _idf(index, t.field, t.term) > 0.0]
    if not scoring:
        return None
    bounds = np.array(
        [term_upper_bound(index, t.field, t.term, p) for t in scoring]
    )
    order = np.argsort(-bounds, kind="stable")
    scoring = [scoring[i] for i in order]
    bounds = bounds[order]

    # theta seed: take the k docs with the highest SINGLE-TERM contribution
    # of the top-bound term (vectorized over one list), fully score only
    # those k. The kth full score of any doc subset lower-bounds the true
    # kth -> theta stays safe, and the seed costs O(df + k*n_terms).
    t0 = scoring[0]
    post0 = index.postings(t0.field, t0.term, need_positions=False)
    if post0.df < k:
        theta = 0.0
    else:
        N = float(index.num_docs)
        idf0 = max(0.0, np.log((N - post0.stat_df + 0.5) / (post0.stat_df + 0.5)))
        dl0 = index.doclen(t0.field, post0.doc_ids).astype(np.float64)
        ave0 = float(index.sum_field_lengths(t0.field)) / float(
            index.doc_count(t0.field)
        )
        tf0 = post0.tfs.astype(np.float64)
        own = idf0 * tf0 / (tf0 + p.k1 * (1.0 - p.b + p.b * dl0 / ave0))
        top_idx = np.argpartition(-own, k - 1)[:k]
        seed_scores = _score_candidates(index, terms, post0.doc_ids[top_idx], p)
        theta = float(seed_scores.min())

    # MaxScore split: suffix of terms whose bounds sum strictly below theta
    suffix = np.cumsum(bounds[::-1])[::-1]
    keep = suffix >= theta if theta > 0 else np.ones(len(bounds), bool)
    keep[0] = True
    essential = [t for t, kp in zip(scoring, keep) if kp]

    cand = np.unique(
        np.concatenate(
            [index.postings(t.field, t.term, need_positions=False).doc_ids for t in essential]
        )
    )
    if len(cand) < k:
        return None  # zero-score docs would participate via tie-break
    scores = _score_candidates(index, terms, cand, p)
    return cand, scores
