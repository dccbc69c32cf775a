"""Index-native snippet windows (Lucene unified-highlighter analog).

The reference serves ranked lists only; any UI on top of it runs Lucene's
highlighter to show WHERE a document matched. Lucene's unified highlighter
can work purely off postings positions/offsets (``IndexOptions
.DOCS_AND_FREQS_AND_POSITIONS``) without re-analyzing stored text — this
reproduces that design on the Ray index: :func:`best_windows` finds, for
every document matching >= 1 query term, the window of ``window``
consecutive token positions covering the MOST DISTINCT query terms
(earliest such window on ties), reading nothing but the decoded posting
lists. No document text is touched (the index stores none; a caller with
the corpus parquet can slice tokens ``[win_start, win_start+window)`` to
render).

Scale shape: candidate starts are the query terms' own positions, so work
and output are O(sum of the query terms' ctf) — matched-docs-sized, never
corpus-sized. Postings are doc-sharded, a window never crosses documents,
so in sharded serving this runs per shard with NO cross-shard exchange
(same partitioning assumption as every positional operator; the two-phase
df/ctf protocol is irrelevant here because no scoring statistics are
used). The kernel is fully vectorized: one lexsort over (doc, pos), one
searchsorted for every window end, and per-term prefix sums turned into a
distinct-count bitset — no per-document Python loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .indexio import InvertedIndex

_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("win_start", pa.int64()),
        ("n_terms", pa.int64()),
    ]
)


def best_windows(
    index: InvertedIndex,
    terms: list[str],
    window: int = 8,
    field: str = "body",
) -> pa.Table:
    """Best snippet window per matching doc: (doc_id, win_start, n_terms).

    ``terms`` are index tokens (analyze query text first, as the engine's
    parser does). A window is ``[win_start, win_start + window)`` in the
    field's token-position space (stopword positions count, matching the
    index and the reference's Lucene position contract). Ties: max
    n_terms, then smallest win_start — the deterministic choice Lucene's
    passage scorer makes for equal-scoring passages.
    """
    terms = list(dict.fromkeys(terms))  # dedupe, keep query order
    docs_l, pos_l, tid_l = [], [], []
    for tid, term in enumerate(terms):
        p = index.postings(field, term, need_positions=True)
        if p.df == 0:
            continue
        docs_l.append(np.repeat(p.doc_ids, p.tfs))
        pos_l.append(p.positions)
        tid_l.append(np.full(int(p.ctf), tid, dtype=np.int64))
    if not docs_l:
        return _SCHEMA.empty_table()
    doc = np.concatenate(docs_l)
    pos = np.concatenate(pos_l)
    tid = np.concatenate(tid_l)
    order = np.lexsort((pos, doc))
    doc, pos, tid = doc[order], pos[order], tid[order]

    # packed (doc, pos) keys: window fits below the doc stride, so one
    # searchsorted yields every window's end index
    stride = int(pos.max()) + window + 1
    key = doc * stride + pos
    right = np.searchsorted(key, key + window)
    idx = np.arange(len(key))
    distinct = np.zeros(len(key), dtype=np.int64)
    for t in range(len(terms)):
        pref = np.zeros(len(key) + 1, dtype=np.int64)
        np.cumsum(tid == t, out=pref[1:])
        distinct += pref[right] > pref[idx]

    # per doc: max distinct, then earliest start (doc,pos-sorted order
    # means stable first-hit per doc after sorting by -distinct)
    best = np.lexsort((pos, -distinct, doc))
    doc_b = doc[best]
    first = np.empty(len(doc_b), dtype=bool)
    first[0] = True
    first[1:] = doc_b[1:] != doc_b[:-1]
    sel = best[first]
    out_order = np.argsort(doc[sel])
    sel = sel[out_order]
    return pa.table(
        {
            "doc_id": pa.array(doc[sel], type=pa.int64()),
            "win_start": pa.array(pos[sel], type=pa.int64()),
            "n_terms": pa.array(distinct[sel], type=pa.int64()),
        }
    )
