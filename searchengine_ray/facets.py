"""Faceted result counts — the Solr/Elasticsearch terms-aggregation
analog over a ranked/boolean result set.

The reference serves ranked lists only; every search UI on top of a
Lucene index also shows per-facet hit counts (Solr ``facet.field`` / ES
``terms`` aggregation), computed from the index's own postings rather
than the stored documents. :func:`facet_counts` reproduces that design:
for each term of a low-cardinality facet field (e.g. the ``keywords``
field this engine builds from the corpus ``lang`` column), count how many
matched docs its posting list contains — one vectorized sorted-membership
check per facet value, no document data touched.

Scale shape (ES's own): facet fields are low-cardinality BY CONTRACT
(each shard loops over the facet vocabulary, not the corpus), postings
are doc-sharded so each shard counts its own matched docs, and the
global answer is a facet-value-sized integer sum — the coordinating-node
merge. With tombstoned deletes the counts follow the live-docs view
automatically (postings() filters dead docs at decode).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .indexio import InvertedIndex

_SCHEMA = pa.schema([("facet", pa.string()), ("n", pa.int64())])


def facet_counts(
    index: InvertedIndex,
    matched_doc_ids: np.ndarray,
    field: str = "keywords",
) -> pa.Table:
    """(facet, n) for every facet-field term with >= 1 matched doc."""
    matched = np.unique(np.asarray(matched_doc_ids, dtype=np.int64))
    names, counts = [], []
    for _f, term in index.vocabulary(field):
        p = index.postings(field, term, need_positions=False)
        if p.df == 0 or len(matched) == 0:
            continue
        pos = np.searchsorted(matched, p.doc_ids)
        pos = np.minimum(pos, len(matched) - 1)
        n = int(np.sum(matched[pos] == p.doc_ids))
        if n:
            names.append(term)
            counts.append(n)
    if not names:
        return _SCHEMA.empty_table()
    order = np.argsort(np.asarray(names, dtype=object))
    return pa.table(
        {
            "facet": pa.array([names[i] for i in order], type=pa.string()),
            "n": pa.array(
                np.asarray(counts, dtype=np.int64)[order], type=pa.int64()
            ),
        }
    )
