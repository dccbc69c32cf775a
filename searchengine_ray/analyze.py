"""Shared text analyzer: lowercase -> tokenize -> stoplist.

The SAME functions process corpus text at index-build time and query terms at
parse time (mirrors the reference's single ``EnglishAnalyzerConfigurable``
used in both places, `Homeworks/HW6/QryEval/QryParser.java:40-51, 442-459`).

Reference semantics preserved exactly (SURVEY.md §2.4):
- lowercase, word characters only (our tokenizer: ``[a-z0-9_]+`` runs),
  no stemming (the HW6 profile uses StemmerType.NONE,
  `Homeworks/HW6/QryEval/QryParser.java:48-50`);
- stopwords are REMOVED from the indexed terms and from query terms, but
  they OCCUPY POSITIONS and count toward field length
  (`Homeworks/HW6/QryEval/TermVector.java:17-19`, `Idx.java:94-116`) —
  so #NEAR/#WINDOW distances and BM25 length normalization see them.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

TOKEN_RE = re.compile(r"[a-z0-9_]+")

# Lucene's default English stopword set (public; EnglishAnalyzer.ENGLISH_STOP_WORDS_SET).
STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)

_STOP_SORTED = np.array(sorted(STOPWORDS))


def tokenize(text: str) -> list[str]:
    """All tokens (stopwords included), lowercased. Position i = token i."""
    return TOKEN_RE.findall(text.lower())


def field_length(text: str) -> int:
    """Token count INCLUDING stopword positions (doclen for BM25/Indri)."""
    return len(tokenize(text))


def analyze_query_token(token: str, stemmer=None) -> list[str]:
    """Query-side analysis of one raw token -> 0..k index terms.

    A token may split into several terms (e.g. ``near-death`` -> ``near``,
    ``death``) and stopword terms vanish (which can empty an operator; the
    optimizer then deletes it, `QryParser.java:233-275`). ``stemmer`` (a
    ``str -> str``, applied after the stoplist like Lucene's chain) must be
    the one the target index was built with.
    """
    terms = [t for t in tokenize(token) if t not in STOPWORDS]
    if stemmer is not None:
        terms = [stemmer(t) for t in terms]
    return terms


@dataclass
class AnalyzedBatch:
    """Vectorized per-(doc, term) postings for a batch of documents.

    Group g covers rows doc_index[g] / term[g]; its in-document positions are
    ``positions[pos_offsets[g]:pos_offsets[g+1]]`` (ascending). ``doc_lens``
    aligns with the input batch rows and includes stopword positions.
    """

    doc_index: np.ndarray  # int64, index into the input batch rows
    term: np.ndarray  # str
    tf: np.ndarray  # int64
    pos_offsets: np.ndarray  # int64, len = n_groups + 1
    positions: np.ndarray  # int32, flat
    doc_lens: np.ndarray  # int64, one per input row


def analyze_batch(
    texts: "list[str] | np.ndarray", stemmer=None
) -> AnalyzedBatch:
    """Tokenize a batch of documents into grouped (doc, term) postings.

    Vectorized across the whole batch: one lexsort over all token instances
    instead of per-document dict building. ``stemmer`` runs after the
    stoplist and only over the UNIQUE vocabulary of the batch (not every
    instance), then instances regroup under the stemmed terms — positions
    and doc lengths are stemmer-independent.
    """
    n_docs = len(texts)
    doc_lens = np.zeros(n_docs, dtype=np.int64)
    tok_chunks: list[list[str]] = []
    doc_chunks: list[np.ndarray] = []
    pos_chunks: list[np.ndarray] = []
    for i in range(n_docs):
        toks = tokenize(texts[i])
        doc_lens[i] = len(toks)
        if toks:
            tok_chunks.append(toks)
            doc_chunks.append(np.full(len(toks), i, dtype=np.int64))
            pos_chunks.append(np.arange(len(toks), dtype=np.int32))
    if not tok_chunks:
        empty_i = np.empty(0, dtype=np.int64)
        return AnalyzedBatch(
            empty_i, np.empty(0, dtype=object), empty_i,
            np.zeros(1, dtype=np.int64), np.empty(0, dtype=np.int32), doc_lens,
        )

    toks = np.concatenate([np.asarray(c, dtype=object) for c in tok_chunks])
    docs = np.concatenate(doc_chunks)
    poss = np.concatenate(pos_chunks)

    # Drop stopword instances (they already counted toward doc_lens/positions).
    vocab, inv = np.unique(toks.astype(str), return_inverse=True)
    stop_hit = np.searchsorted(_STOP_SORTED, vocab)
    stop_hit = np.clip(stop_hit, 0, len(_STOP_SORTED) - 1)
    vocab_is_stop = _STOP_SORTED[stop_hit] == vocab
    keep = ~vocab_is_stop[inv]
    term_ids = inv[keep]
    docs = docs[keep]
    poss = poss[keep]

    if stemmer is not None and len(vocab):
        # stem each unique surface form once; instances remap and merge
        # under the stemmed vocabulary (e.g. runs/running -> run)
        stemmed = np.array([stemmer(v) for v in vocab], dtype=object).astype(str)
        vocab, remap = np.unique(stemmed, return_inverse=True)
        term_ids = remap[term_ids]

    # Group by (term, doc); positions stay ascending within each group.
    order = np.lexsort((poss, docs, term_ids))
    term_ids = term_ids[order]
    docs = docs[order]
    poss = poss[order]

    if len(term_ids) == 0:
        empty_i = np.empty(0, dtype=np.int64)
        return AnalyzedBatch(
            empty_i, np.empty(0, dtype=object), empty_i,
            np.zeros(1, dtype=np.int64), np.empty(0, dtype=np.int32), doc_lens,
        )

    boundary = np.empty(len(term_ids), dtype=bool)
    boundary[0] = True
    boundary[1:] = (term_ids[1:] != term_ids[:-1]) | (docs[1:] != docs[:-1])
    starts = np.flatnonzero(boundary)
    tf = np.diff(np.append(starts, len(term_ids))).astype(np.int64)
    pos_offsets = np.zeros(len(starts) + 1, dtype=np.int64)
    np.cumsum(tf, out=pos_offsets[1:])

    return AnalyzedBatch(
        doc_index=docs[starts],
        term=vocab[term_ids[starts]],
        tf=tf,
        pos_offsets=pos_offsets,
        positions=poss,
        doc_lens=doc_lens,
    )
