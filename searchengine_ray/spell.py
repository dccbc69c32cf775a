"""Spelling suggestions from the index dictionary — Lucene's
DirectSpellChecker analog (public API: ``suggestSimilar(term, n)`` ranks
dictionary terms within ``maxEdits`` of the input by edit distance, then
document frequency, then term order; no external dictionary, the INDEX is
the dictionary).

Re-expressed on this engine's structures: candidates come from the shard's
vocabulary (sharding note: a shard-local expansion is the local restriction
of the global one, exactly like operators._eval_expansion), distances from
the vectorized Wagner-Fischer DP already used by #FUZZY
(`operators._levenshtein_all`), and df from the index statistics
(``Postings.stat_df`` — the same stale-until-merge Lucene docFreq every
scoring path uses, so suggestions rank consistently with retrieval while
deletes are tombstoned).

Determinism contract (gate-checked in SQL): for each query term the
suggestions are the top-k candidates by (distance ASC, df DESC,
suggestion ASC); the query term itself is never suggested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .indexio import InvertedIndex
from .operators import _levenshtein_all


def suggest(
    index: InvertedIndex,
    terms: list[str],
    field: str = "body",
    max_edits: int = 2,
    k: int = 3,
    suggest_mode: str = "always",
) -> pa.Table:
    """Top-k spelling suggestions per input term.

    ``suggest_mode`` is the ES term-suggester knob (the Lucene
    DirectSpellChecker thresholds behind it): ``always`` (default, the
    original surface), ``missing`` — suggest only for terms ABSENT from
    the dictionary (df = 0; the ES default mode), ``popular`` — keep
    only suggestions strictly MORE frequent than the input term (the
    "did you mean the common spelling" rule; for an absent input every
    candidate qualifies).

    Returns ``(qterm, suggestion, dist, df)`` rows, ≤k per qterm, in
    deterministic (qterm, rank) order.
    """
    if suggest_mode not in ("always", "missing", "popular"):
        raise ValueError(
            f"unknown suggest_mode {suggest_mode!r} "
            "(always | missing | popular)"
        )
    vocab = sorted(t for (_f, t) in index.vocabulary(field))
    vocab_set = set(vocab)
    out_q: list[str] = []
    out_s: list[str] = []
    out_d: list[int] = []
    out_df: list[int] = []
    for q in terms:
        qdf = (
            index.postings(field, q, need_positions=False).stat_df
            if q in vocab_set
            else 0
        )
        if suggest_mode == "missing" and qdf > 0:
            continue
        d = _levenshtein_all(q, vocab)
        cand = [
            (t, int(dd)) for t, dd in zip(vocab, d) if dd <= max_edits and t != q
        ]
        if suggest_mode == "popular":
            cand = [
                (t, dd) for t, dd in cand
                if index.postings(field, t, need_positions=False).stat_df > qdf
            ]
        if not cand:
            continue
        dfs = np.asarray(
            [
                index.postings(field, t, need_positions=False).stat_df
                for t, _ in cand
            ],
            dtype=np.int64,
        )
        dists = np.asarray([dd for _, dd in cand], dtype=np.int64)
        # rank = (dist ASC, df DESC, suggestion ASC); cand is already
        # suggestion-ascending, so a stable sort on (-df, dist) finishes it
        order = np.lexsort((-dfs, dists))
        for i in order[:k]:
            out_q.append(q)
            out_s.append(cand[i][0])
            out_d.append(int(dists[i]))
            out_df.append(int(dfs[i]))
    return pa.table(
        {
            "qterm": pa.array(out_q, pa.string()),
            "suggestion": pa.array(out_s, pa.string()),
            "dist": pa.array(out_d, pa.int64()),
            "df": pa.array(out_df, pa.int64()),
        }
    )


def complete(
    index: InvertedIndex,
    prefixes: list[str],
    field: str = "body",
    k: int = 5,
) -> pa.Table:
    """Prefix completion from the index dictionary — the Lucene suggest
    module's AnalyzingSuggester/completion analog (rank dictionary terms
    under a prefix by weight; here weight = docFreq, the index-native
    default). Returns ``(prefix, suggestion, df)`` rows, ≤k per prefix,
    ranked (df DESC, suggestion ASC); a term equal to the bare prefix IS
    a valid completion (Lucene returns it too).

    The candidate cut is a binary-search range over the sorted
    vocabulary (prefix order == lexicographic interval), so cost is
    O(log V + matches) per prefix — no vocabulary scan; df comes from
    ``Postings.stat_df``, the same stale-until-merge Lucene docFreq every
    scoring path uses. Sharding note: as with #PREFIX expansion, a
    shard-local completion is the local restriction of the global one.
    """
    vocab = sorted(t for (_f, t) in index.vocabulary(field))
    varr = np.asarray(vocab, dtype=object)
    out_p: list[str] = []
    out_s: list[str] = []
    out_df: list[int] = []
    for p in prefixes:
        lo = np.searchsorted(varr, p)
        hi = np.searchsorted(varr, p + "￿")
        cand = vocab[int(lo):int(hi)]
        if not cand:
            continue
        dfs = np.asarray(
            [
                index.postings(field, t, need_positions=False).stat_df
                for t in cand
            ],
            dtype=np.int64,
        )
        # cand is suggestion-ascending; stable sort on -df finishes the
        # (df DESC, suggestion ASC) rank
        order = np.argsort(-dfs, kind="stable")
        for i in order[:k]:
            out_p.append(p)
            out_s.append(cand[int(i)])
            out_df.append(int(dfs[int(i)]))
    return pa.table(
        {
            "prefix": pa.array(out_p, pa.string()),
            "suggestion": pa.array(out_s, pa.string()),
            "df": pa.array(out_df, pa.int64()),
        }
    )
