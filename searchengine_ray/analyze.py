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
    # Incremental dict vocabulary: hashing each surface form once beats the
    # former object-array np.unique (a string SORT over every instance —
    # profiled as the hottest part of the build's tokenize stage). -1 marks
    # stopword instances (they already counted toward doc_lens/positions).
    vocab_ids: dict[str, int] = {}  # raw token -> final term id (or -1 stop)
    term_id_of: dict[str, int] = {}  # final (post-stem) term -> id
    vocab_list: list[str] = []
    id_chunks: list[list[int]] = []
    doc_chunks: list[np.ndarray] = []
    pos_chunks: list[np.ndarray] = []
    stop = STOPWORDS
    for i in range(n_docs):
        toks = tokenize(texts[i])
        doc_lens[i] = len(toks)
        if not toks:
            continue
        ids = []
        for tok in toks:
            tid = vocab_ids.get(tok)
            if tid is None:
                if tok in stop:
                    tid = -1
                else:
                    # term_ids maps FINAL terms (post-stem) so distinct
                    # surface forms merge; raw tokens and final terms live
                    # in separate dicts, so a stem that equals a stopword
                    # token can't collide with its -1 marker
                    term = tok if stemmer is None else stemmer(tok)
                    tid = term_id_of.get(term)
                    if tid is None:
                        tid = len(vocab_list)
                        vocab_list.append(term)
                        term_id_of[term] = tid
                vocab_ids[tok] = tid
            ids.append(tid)
        id_chunks.append(ids)
        doc_chunks.append(np.full(len(toks), i, dtype=np.int64))
        pos_chunks.append(np.arange(len(toks), dtype=np.int32))
    if not id_chunks:
        empty_i = np.empty(0, dtype=np.int64)
        return AnalyzedBatch(
            empty_i, np.empty(0, dtype=object), empty_i,
            np.zeros(1, dtype=np.int64), np.empty(0, dtype=np.int32), doc_lens,
        )

    term_ids = np.concatenate(
        [np.asarray(c, dtype=np.int64) for c in id_chunks]
    )
    docs = np.concatenate(doc_chunks)
    poss = np.concatenate(pos_chunks)
    keep = term_ids >= 0
    term_ids = term_ids[keep]
    docs = docs[keep]
    poss = poss[keep]

    # canonicalize to the sorted vocabulary (insertion order -> lexical),
    # preserving the exact group ordering of the previous implementation
    vocab = np.asarray(vocab_list, dtype=object).astype(str)
    order = np.argsort(vocab)
    vocab = vocab[order]
    remap = np.empty(len(order), dtype=np.int64)
    remap[order] = np.arange(len(order))
    if len(term_ids):
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
