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


_COLLAPSE_SCHEMA = pa.schema(
    [
        ("facet", pa.string()),
        ("doc_id", pa.int64()),
        ("score", pa.float64()),
    ]
)


def collapse_top1(
    index: InvertedIndex,
    doc_ids: np.ndarray,
    scores: np.ndarray,
    field: str = "keywords",
) -> pa.Table:
    """Field collapsing — the Lucene grouping-module / ES ``collapse``
    analog: from a scored result set, keep the single BEST doc per facet
    value (score desc, external_id asc on ties — the engine's global
    result comparator), groups ordered the same way. Membership comes from
    the facet postings (live-docs-aware), never the stored documents.

    Scale shape: facet fields are low-cardinality by contract, so each
    doc shard collapses its own matched docs with one vectorized
    membership + argmin per facet value, and the global merge compares
    ONE row per (shard, facet) — the ES coordinating-node reduce. Docs
    carrying several facet terms appear under each (ES collapse
    multi-valued semantics are undefined; this engine documents
    best-per-term)."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    scores = np.asarray(scores, dtype=np.float64)
    order = np.argsort(doc_ids, kind="stable")
    d_sorted, s_sorted = doc_ids[order], scores[order]
    rows: list[tuple[str, int, float]] = []
    for _f, term in index.vocabulary(field):
        p = index.postings(field, term, need_positions=False)
        if p.df == 0 or len(d_sorted) == 0:
            continue
        pos = np.searchsorted(d_sorted, p.doc_ids)
        pos = np.minimum(pos, len(d_sorted) - 1)
        hit = pos[d_sorted[pos] == p.doc_ids]
        if len(hit) == 0:
            continue
        cand_d, cand_s = d_sorted[hit], s_sorted[hit]
        # best = (score desc, external-id rank asc): integer lexsort, no
        # string materialization for the non-winners
        best = np.lexsort((index.ext_ranks(cand_d), -cand_s))[0]
        rows.append((term, int(cand_d[best]), float(cand_s[best])))
    if not rows:
        return _COLLAPSE_SCHEMA.empty_table()
    facets = np.asarray([r[0] for r in rows], dtype=object)
    docs = np.asarray([r[1] for r in rows], dtype=np.int64)
    scs = np.asarray([r[2] for r in rows], dtype=np.float64)
    order = np.lexsort((index.ext_ranks(docs), -scs))
    return pa.table(
        {
            "facet": pa.array(facets[order], type=pa.string()),
            "doc_id": pa.array(docs[order], type=pa.int64()),
            "score": pa.array(scs[order], type=pa.float64()),
        }
    )


def collapse_topn(
    index: InvertedIndex,
    doc_ids: np.ndarray,
    scores: np.ndarray,
    field: str = "keywords",
    inner_size: int = 2,
) -> pa.Table:
    """Field collapsing with ``inner_hits`` (ES collapse.inner_hits /
    Lucene grouping's groupDocs): the top ``inner_size`` docs per facet
    value under the engine's (score desc, external_id asc) comparator,
    each with its 1-based rank within the group. ``collapse_top1`` is
    the ``inner_size=1`` special case kept for its driver-verified
    surface. Same scale shape: per-shard vectorized membership + partial
    top-m per facet, global merge compares m rows per (shard, facet).

    Returns (facet, doc_id, score, rn) ordered (facet asc, rn asc).
    """
    if inner_size < 1:
        raise ValueError(f"inner_size must be >= 1, got {inner_size}")
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    scores = np.asarray(scores, dtype=np.float64)
    order = np.argsort(doc_ids, kind="stable")
    d_sorted, s_sorted = doc_ids[order], scores[order]
    facets, docs, scs, rns = [], [], [], []
    for _f, term in sorted(index.vocabulary(field), key=lambda ft: ft[1]):
        p = index.postings(field, term, need_positions=False)
        if p.df == 0 or len(d_sorted) == 0:
            continue
        pos = np.searchsorted(d_sorted, p.doc_ids)
        pos = np.minimum(pos, len(d_sorted) - 1)
        hit = pos[d_sorted[pos] == p.doc_ids]
        if len(hit) == 0:
            continue
        cand_d, cand_s = d_sorted[hit], s_sorted[hit]
        top = np.lexsort((index.ext_ranks(cand_d), -cand_s))[:inner_size]
        for r, i in enumerate(top, 1):
            facets.append(term)
            docs.append(int(cand_d[i]))
            scs.append(float(cand_s[i]))
            rns.append(r)
    return pa.table(
        {
            "facet": pa.array(facets, pa.string()),
            "doc_id": pa.array(docs, pa.int64()),
            "score": pa.array(scs, pa.float64()),
            "rn": pa.array(rns, pa.int64()),
        }
    )


def sampler_facets(
    engine, query: str, shard_size: int = 100, field: str = "keywords"
) -> pa.Table:
    """ES ``sampler`` aggregation: run the sub-aggregation (here a
    ``terms``/facet count) over only the best-scoring ``shard_size``
    docs of the query instead of the full match set — the ES recipe for
    focusing an aggregation on relevant docs and bounding its cost. The
    cut uses the engine's global (score desc, external_id asc) order,
    so the sampled set is deterministic and the oracle replays it as a
    rank window. Returns (facet, n) like facet_counts."""
    if shard_size < 1:
        raise ValueError(f"shard_size must be >= 1, got {shard_size}")
    t = engine.search("sampler", query)
    top = t.slice(0, shard_size)
    return facet_counts(
        engine.index, top.column("doc_id").to_numpy(), field
    )
