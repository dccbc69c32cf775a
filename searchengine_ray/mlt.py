"""MoreLikeThis (Lucene MLT analog): find documents similar to a given
one by turning its most-informative terms into an ordinary query.

Lucene's ``MoreLikeThis`` re-analyzes a source document, scores each of
its terms by tf x idf against the index statistics, keeps the top
``max_query_terms``, and runs the resulting boolean query. This module
reproduces that pipeline on the Ray index: :func:`select_terms` does the
tf·idf selection (idf = ln(N/df), the classic MLT form; df is the index's
``stat_df``, so tombstoned deletes keep counting until merge exactly like
every other scoring statistic), :func:`more_like_this` runs the selected
terms through the engine's normal BM25 path and drops the source doc —
so the search leg reuses the fully hash-verified scoring machinery and
MLT adds only the selection layer.

Scale shape: selection touches one document's analyzed terms (document-
sized) and |terms| df lookups (dictionary point reads, no positions); the
search is a standard engine query. Nothing is corpus-sized on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .analyze import STOPWORDS, tokenize
from .indexio import InvertedIndex

_SCHEMA = pa.schema([("term", pa.string()), ("score", pa.float64())])


def select_terms(
    index: InvertedIndex,
    text: str,
    top_n: int = 10,
    field: str = "body",
) -> pa.Table:
    """Top ``top_n`` (term, tf*ln(N/df)) of ``text`` against ``index``.

    Ties: score desc, then term asc. The analysis chain (stoplist, then
    the stemmer the index records in its stats) matches the build side
    exactly, like every query leaf. Terms absent from the index (df=0)
    are skipped — they cannot retrieve anything.
    """
    from .stem import get_stemmer

    stemmer = get_stemmer(index.stemmer_name)
    terms = [t for t in tokenize(text) if t not in STOPWORDS]
    if stemmer is not None:
        terms = [stemmer(t) for t in terms]
    if not terms:
        return _SCHEMA.empty_table()
    uniq, tfs = np.unique(np.asarray(terms, dtype=object), return_counts=True)
    n_docs = float(index.num_docs)
    names, scores = [], []
    for term, tf in zip(uniq, tfs):
        p = index.postings(field, str(term), need_positions=False)
        if p.stat_df == 0:
            continue
        names.append(str(term))
        scores.append(float(tf) * float(np.log(n_docs / p.stat_df)))
    if not names:
        return _SCHEMA.empty_table()
    order = sorted(range(len(names)), key=lambda i: (-scores[i], names[i]))
    order = order[:top_n]
    return pa.table(
        {
            "term": pa.array([names[i] for i in order], type=pa.string()),
            "score": pa.array([scores[i] for i in order], type=pa.float64()),
        }
    )


def more_like_this(
    engine,
    text: str,
    top_n: int = 10,
    exclude_doc_id: "int | None" = None,
    qid: str = "mlt",
) -> pa.Table:
    """Search the engine with the source doc's top terms (its model's
    default operator — BM25 #SUM by default) and drop the source doc."""
    sel = select_terms(engine.index, text, top_n=top_n)
    if sel.num_rows == 0:
        return engine.search(qid, "zzz_mlt_no_terms")
    query = " ".join(sel.column("term").to_pylist())
    t = engine.search(qid, query)
    if exclude_doc_id is not None:
        import pyarrow.compute as pc

        t = t.filter(pc.not_equal(t.column("doc_id"), exclude_doc_id))
    return t
