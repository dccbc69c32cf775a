"""BM25F — field-weighted BM25 (Robertson, Zaragoza & Taylor, CIKM 2004;
the Elasticsearch ``combined_fields`` query semantics).

The reference combines fields at the SCORE level — ``#wsum( 0.4
t.keywords 0.6 t.body )`` sums per-field BM25 scores
(`QrySopWSum.java`, gate ``se_bm25_wsum_fields``). BM25F is the
principled alternative: combine the WEIGHTED, LENGTH-NORMALIZED term
frequencies across fields FIRST, then saturate once —

    tf~(t, d) = sum_f  w_f * tf_{t,f,d} / (1 - b + b * len_f(d)/avglen_f)
    score(d)  = sum_t  idf(t) * tf~ / (k1 + tf~)

with ``idf`` the BM25 idf (clamped at 0) over the UNION document
frequency: docs containing ``t`` in ANY weighted field. Because the
saturation is applied to the combined tf, a term matching twice across
two fields scores less than twice a single-field match — the property
score-level #WSUM cannot express.

All accumulation orders are fixed so the DuckDB oracle replays the
arithmetic: field contributions add in ``field_weights`` iteration order
onto a zero accumulator, term scores add in query order, and every
expression (``(1.0 - b) + b * dl / avglen``, ``idf * tf / (k1 + tf)``)
is written with the same association the SQL uses. Stats come from the
same ``InvertedIndex`` surface every scoring path uses (stale-until-
merge ``stat_df`` semantics via ``postings()``'s live-docs decode).

Scale shape: identical to BM25 serving — per-shard postings decode,
model-sized per-term stats, output is matching docs only. Nothing new
crosses shards: the union-df is the sum of per-shard dfs exactly like
the sharded two-phase BM25 stats (`engine.py:378`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .indexio import InvertedIndex

_SCHEMA = pa.schema([("doc_id", pa.int64()), ("score_r", pa.float64())])


def bm25f_search(
    index: InvertedIndex,
    terms: list[str],
    field_weights: dict[str, float],
    k1: float = 1.2,
    b: float = 0.75,
) -> pa.Table:
    """Score every doc matching ANY term in ANY weighted field.

    Returns (doc_id, score_r) with the score rounded to 6dp — the gate
    table shape shared with every other scoring entry."""
    avglen = {
        f: float(index.sum_field_lengths(f)) / float(index.doc_count(f))
        for f in field_weights
    }
    n_total = float(index.num_docs)

    all_docs: np.ndarray | None = None
    per_term: list[tuple[np.ndarray, np.ndarray]] = []
    for t in terms:
        parts = []
        for f, w in field_weights.items():  # fixed field order
            p = index.postings(f, t, need_positions=False)
            if p.df == 0:
                continue
            dl = index.doclen(f, p.doc_ids).astype(np.float64)
            x = w * p.tfs.astype(np.float64) / ((1.0 - b) + b * dl / avglen[f])
            parts.append((p.doc_ids, x))
        if not parts:
            continue
        docs = np.unique(np.concatenate([d for d, _ in parts]))
        tft = np.zeros(len(docs), dtype=np.float64)
        for d, x in parts:  # field order = FP accumulation order
            tft[np.searchsorted(docs, d)] += x
        df = len(docs)  # union df across the weighted fields
        idf = max(0.0, np.log((n_total - df + 0.5) / (df + 0.5)))
        s = idf * tft / (k1 + tft)
        per_term.append((docs, s))
        all_docs = (
            docs if all_docs is None else np.union1d(all_docs, docs)
        )

    if all_docs is None:
        return _SCHEMA.empty_table()
    total = np.zeros(len(all_docs), dtype=np.float64)
    for docs, s in per_term:  # term order = FP accumulation order
        total[np.searchsorted(all_docs, docs)] += s
    return pa.table(
        {
            "doc_id": pa.array(all_docs, type=pa.int64()),
            "score_r": pa.array(np.round(total, 6), type=pa.float64()),
        }
    ).cast(_SCHEMA)
