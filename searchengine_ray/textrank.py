"""TextRank keyword extraction (Mihalcea & Tarau 2004, "TextRank:
Bringing Order into Texts") — the graph-based unsupervised keyword tagger:
vertices are a document's non-stopword terms, edges connect terms adjacent
in the stop-filtered token stream (the window-2 adjacency variant; the
stopword filter stands in for the paper's part-of-speech syntactic filter,
which needs a tagger this corpus has no signal for), and scores come from
the damped PageRank power iteration. Complements RAKE (degree/frequency
heuristic) with the iterative-graph sibling — together they are the two
classic per-document keyword extractors a curation pipeline runs.

Determinism design (the repo's bit-exact float rule): the entire power
iteration runs in FIXED-POINT INT64 — scores start at 2^20, each iteration
is s'_v = (15*2^20)//100 + (85 * sum_{(u,v) in E} (s_u // deg_u)) // 100
with integer floor division throughout — so the DuckDB oracle replays every
iteration with `//` and zero float risk, and integer sums are
order-independent (no accumulation-order mirroring needed).

Scale shape: TextRank is per-document by definition, so the operator is ONE
embarrassingly-parallel shuffle-free ``map_batches`` scan with no driver
state — the ideal 100-TB shape — and every step inside the batch is
batch-global vectorized: one ``_flat_tokens`` tokenize, one Arrow ``is_in``
stop mask, edge building and dedup via one lexsort over packed (doc, lo,
hi) keys, vertex degrees via ``bincount``, and the L power iterations are
L pairs of ``np.add.at`` scatter-adds over the flat edge arrays — never a
per-document or per-vertex Python loop.

Reference scope analog: beyond-reference text-analysis family (SURVEY §2
LLM-pipeline operators); sibling of ``rake.rake_keyphrases``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .analyze import STOPWORDS
from .textstats import _flat_tokens, _read_docs

TEXTRANK_SCALE = 1 << 20
TEXTRANK_DAMP_NUM = 85   # d = 0.85 as the exact rational 85/100
TEXTRANK_DAMP_DEN = 100
TEXTRANK_ITERS = 5
TEXTRANK_K = 5


def textrank_keywords(
    docs,
    k: int = TEXTRANK_K,
    iters: int = TEXTRANK_ITERS,
):
    """Top-``k`` TextRank keywords per document by (score DESC, term ASC).

    ``docs`` is an sf_dir path or a zero-arg callable returning the corpus
    Dataset (the ``rake_keyphrases`` dual surface). Returns (doc_id, term,
    score, rnk) — ``score`` is the fixed-point int64 after ``iters`` damped
    iterations; documents whose stop-filtered stream has no adjacent
    distinct-term pair build no graph and emit no rows (mirrored by the
    oracle, which derives vertices from edges).
    """
    ds = _read_docs(docs) if isinstance(docs, str) else docs()
    stop_arr = pa.array(sorted(STOPWORDS))
    scale = TEXTRANK_SCALE
    base = (
        (TEXTRANK_DAMP_DEN - TEXTRANK_DAMP_NUM) * scale
    ) // TEXTRANK_DAMP_DEN

    def rank_batch(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "score": pa.array([], pa.int64()),
                "rnk": pa.array([], pa.int64()),
            }
        )
        n, doc_idx, flat = _flat_tokens(t)
        if len(doc_idx) == 0:
            return empty
        keep = pc.invert(
            pc.is_in(flat, value_set=stop_arr)
        ).to_numpy(zero_copy_only=False)
        d = doc_idx[keep]
        toks = flat.filter(pa.array(keep))
        if len(d) < 2:
            return empty
        enc = toks.dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        dvals = enc.dictionary.to_numpy(zero_copy_only=False)
        # lexicographic sort-rank per dictionary code (terms are ascii
        # [a-z0-9_], so numpy unicode order == DuckDB binary collation)
        code_rank = np.empty(len(dvals), dtype=np.int64)
        code_rank[np.argsort(dvals, kind="stable")] = np.arange(len(dvals))
        # edges: adjacent positions in the SAME doc's stop-filtered stream,
        # self-loops dropped, undirected-deduped via packed (doc, lo, hi)
        adj = (d[1:] == d[:-1]) & (codes[1:] != codes[:-1])
        if not adj.any():
            return empty
        a, b = codes[:-1][adj], codes[1:][adj]
        ed = d[:-1][adj]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        ncodes = np.int64(len(dvals))
        ekey = (ed * ncodes + lo) * ncodes + hi
        ekey = np.unique(ekey)
        ed = ekey // (ncodes * ncodes)
        rem = ekey % (ncodes * ncodes)
        lo, hi = rem // ncodes, rem % ncodes
        # vertices = edge endpoints; map endpoints to vertex slots
        vkey = np.unique(np.concatenate([ed * ncodes + lo, ed * ncodes + hi]))
        vi_lo = np.searchsorted(vkey, ed * ncodes + lo)
        vi_hi = np.searchsorted(vkey, ed * ncodes + hi)
        nv = len(vkey)
        deg = np.bincount(vi_lo, minlength=nv) + np.bincount(
            vi_hi, minlength=nv
        )
        s = np.full(nv, scale, dtype=np.int64)
        for _ in range(iters):
            give = s // deg
            contrib = np.zeros(nv, dtype=np.int64)
            np.add.at(contrib, vi_lo, give[vi_hi])
            np.add.at(contrib, vi_hi, give[vi_lo])
            s = base + (TEXTRANK_DAMP_NUM * contrib) // TEXTRANK_DAMP_DEN
        vdoc = vkey // ncodes
        vcode = vkey % ncodes
        # top-k per doc by (score DESC, term ASC): one lexsort + cumcount
        order = np.lexsort((code_rank[vcode], -s, vdoc))
        sd = vdoc[order]
        first = np.empty(nv, dtype=bool)
        first[0] = True
        first[1:] = sd[1:] != sd[:-1]
        starts = np.flatnonzero(first)
        pos_in_doc = np.arange(nv) - np.repeat(
            starts, np.diff(np.append(starts, nv))
        )
        cut = pos_in_doc < k
        sel = order[cut]
        doc_ids = t.column("doc_id").to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[vdoc[sel]], type=pa.int64()),
                "term": enc.dictionary.take(pa.array(vcode[sel])),
                "score": pa.array(s[sel], type=pa.int64()),
                "rnk": pa.array(pos_in_doc[cut] + 1, type=pa.int64()),
            }
        )

    return ds.map_batches(rank_batch, batch_format="pyarrow")
