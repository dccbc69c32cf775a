"""Significant-terms aggregation — the Elasticsearch ``significant_terms``
analog with the JLH heuristic.

Given a matched result set, score every term that occurs in it by how
much MORE frequent it is there than in the background corpus:

    fg_pct = fg / fg_total        (docs in the result set containing t)
    bg_pct = bg / bg_total        (corpus docFreq of t / corpus size)
    jlh    = (fg_pct - bg_pct) * (fg_pct / bg_pct)      [ES's JLH score]

keeping only terms with ``fg_pct > bg_pct`` (ES's uncommonly-common
filter), ranked (score desc, term asc), top-k. Unlike MoreLikeThis
(``mlt.py``, per-document tf*idf), this is a SET-level contrast: "what
is this result set about, relative to the corpus".

Scale shape (ES's own sampler/terms design): the foreground counts come
from re-analyzing ONLY the matched documents — a pushdown id-filtered
read bounded by the result set, never the corpus — with the exact
analyzer the index was built with; the background counts are per-
candidate ``stat_df`` lexicon lookups (model-sized; the same
stale-until-merge Lucene docFreq every scoring path uses), and the
final score table is candidate-vocabulary-sized. Nothing corpus-scale
moves.

Determinism: the JLH arithmetic is multiplication/division only — no
``ln`` — so the DuckDB oracle reproduces it with the literal expression
``(fg/fgt - bg/bgt) * ((fg/fgt) / (bg/bgt))`` (DuckDB ``/`` on BIGINTs
is DOUBLE division, numpy true division likewise), identical
associations on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .indexio import InvertedIndex

_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("fg", pa.int64()),
        ("bg", pa.int64()),
        ("score_r", pa.float64()),
        ("rank", pa.int32()),
    ]
)


def significant_terms(
    index: InvertedIndex,
    sf_dir: str,
    matched_doc_ids: np.ndarray,
    field: str = "body",
    k: int = 10,
) -> pa.Table:
    """Top-``k`` JLH-significant terms of ``matched_doc_ids`` vs the corpus."""
    from .analyze import analyze_batch
    from .stem import get_stemmer

    matched = np.unique(np.asarray(matched_doc_ids, dtype=np.int64))
    fg_total = len(matched)
    bg_total = int(index.num_docs)
    if fg_total == 0:
        return _SCHEMA.empty_table()

    # foreground: re-analyze ONLY the matched docs (pushdown id filter —
    # result-set-sized read) with the index's own analyzer profile
    import pyarrow.compute as pc
    import ray.data

    rows = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filter=pc.field("doc_id").isin(pa.array(matched)),
    ).take_all()
    ab = analyze_batch(
        [r["text"] for r in rows], stemmer=get_stemmer(index.stemmer_name)
    )
    # distinct (doc, term) groups are exactly analyze_batch's groups
    cand, fg = np.unique(np.asarray(ab.term, dtype=object), return_counts=True)

    # background: one lexicon stat_df lookup per candidate (model-sized)
    bg = np.array(
        [index.postings(field, str(t), need_positions=False).stat_df for t in cand],
        dtype=np.int64,
    )
    keep = bg > 0  # candidates must exist in the index lexicon
    cand, fg, bg = cand[keep], fg[keep].astype(np.int64), bg[keep]

    fgp = fg / fg_total
    bgp = bg / bg_total
    score = (fgp - bgp) * (fgp / bgp)
    sel = fgp > bgp  # ES's uncommonly-common filter (strict)
    cand, fg, bg, score = cand[sel], fg[sel], bg[sel], score[sel]
    order = np.lexsort((cand, -score))[:k]
    return pa.table(
        {
            "term": pa.array(cand[order].astype(str), type=pa.string()),
            "fg": pa.array(fg[order], type=pa.int64()),
            "bg": pa.array(bg[order], type=pa.int64()),
            "score_r": pa.array(np.round(score[order], 6), type=pa.float64()),
            "rank": pa.array(
                np.arange(1, len(order) + 1, dtype=np.int32), type=pa.int32()
            ),
        }
    ).cast(_SCHEMA)


def significant_text(
    index: InvertedIndex,
    sf_dir: str,
    matched_doc_ids: np.ndarray,
    field: str = "body",
    k: int = 10,
    filter_duplicate_text: bool = True,
) -> pa.Table:
    """ES ``significant_text`` — the free-text sibling of
    ``significant_terms`` whose defining feature is
    ``filter_duplicate_text``: duplicate documents (boilerplate copied
    verbatim across the result set) are counted ONCE, so mass-duplicated
    text cannot masquerade as significant. Dedup is exact by the
    docmap's ``sha256(text)`` (the build invariant the dedup gates pin),
    keeping the lowest doc id per digest; fg_total becomes the UNIQUE
    count, which shifts every fg_pct — the visible contract vs
    significant_terms. With ``filter_duplicate_text=False`` this IS
    significant_terms. Same scale shape (result-set-sized pushdown read,
    lexicon-sized background)."""
    matched = np.unique(np.asarray(matched_doc_ids, dtype=np.int64))
    if filter_duplicate_text and len(matched):
        rows = index._rows_for(matched)
        shas = index._sha256[rows]
        _, first = np.unique(shas, return_index=True)
        matched = matched[np.sort(first)]
    return significant_terms(index, sf_dir, matched, field=field, k=k)
