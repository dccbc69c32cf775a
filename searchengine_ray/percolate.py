"""Percolation — reverse search (the Elasticsearch ``percolate`` query):
match a STREAM of documents against a registry of STORED queries, the
primitive behind alerting, saved searches, and rule-based document
routing/tagging in a training-data pipeline ("tag every doc matching
these topic rules as it flows past").

Design: the stored queries parse ONCE per actor (``__init__`` — the
actor-pool contract), and each batch is matched by the repo's REAL
query machinery, not a reimplementation: ``analyze_batch`` tokenizes the
batch with the index analyzer profile, a :class:`_BatchPostings` adapter
exposes the batch's (term -> docid-ascending positional postings) view
through the exact ``InvertedIndex.postings`` surface, and the verified
:class:`operators.Evaluator` runs each stored tree under
``unrankedboolean`` (percolation is MEMBERSHIP — no corpus statistics
are consulted, which is what makes per-batch evaluation equal to
whole-corpus evaluation; pytest pins that equality). Every operator the
query language supports — #AND/#OR/#NEAR/#WINDOW/#SYN/#ANDNOT, stopword
semantics, the optimizer — therefore percolates with zero semantics
drift from the serving path.

Scale shape: queries are model-sized broadcast state; matching is a
pure ``map_batches`` over the document stream (no shuffle, no index on
disk); output is match-pair-scale (doc_id, query_id). Docs never leave
their batch, so results are partition-invariant by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .analyze import analyze_batch, analyze_query_token
from .config import DEFAULT_OP, ModelParams
from .indexio import EMPTY_POSTINGS, Postings
from .operators import Evaluator
from .qryparse import parse_query

_SCHEMA = pa.schema([("doc_id", pa.int64()), ("query_id", pa.string())])


class _BatchPostings:
    """Batch-local positional postings exposing the InvertedIndex.postings
    surface the Evaluator consumes. Built fully vectorized: one lexsort
    of analyze_batch's groups by (term, doc), one flat gather that lays
    every group's positions out in that order, then per-term views are
    searchsorted slices — no per-token Python."""

    def __init__(self, ab) -> None:
        n_groups = len(ab.term)
        self._n_docs = len(ab.doc_lens)
        if n_groups == 0:
            self._terms = np.empty(0, dtype=object)
            return
        terms = np.asarray(ab.term, dtype=object)
        order = np.lexsort((ab.doc_index, terms))
        self._g_doc = ab.doc_index[order]
        self._g_tf = ab.tf[order]
        g_terms = terms[order]
        # distinct-term slices over the sorted group axis
        first = np.empty(n_groups, dtype=bool)
        first[0] = True
        first[1:] = g_terms[1:] != g_terms[:-1]
        starts = np.flatnonzero(first)
        self._terms = g_terms[starts]
        self._t_bounds = np.append(starts, n_groups)
        # flat positions in sorted-group order (one global gather)
        lens = self._g_tf
        gstart = ab.pos_offsets[order]
        total = int(lens.sum())
        base = np.repeat(gstart, lens)
        within = np.arange(total) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        self._pos = ab.positions[(base + within).astype(np.int64)].astype(
            np.int64
        )
        self._p_offsets = np.concatenate(
            [[0], np.cumsum(lens)]
        ).astype(np.int64)

    @property
    def num_docs(self) -> int:
        return self._n_docs

    def postings(
        self, field: str, term: str, need_positions: bool = True
    ) -> Postings:
        if field != "body":
            raise NotImplementedError(
                "percolation matches the document text stream (body); "
                "multi-field percolation needs per-field batch columns"
            )
        if len(self._terms) == 0:
            return EMPTY_POSTINGS
        i = np.searchsorted(self._terms, term)
        if i >= len(self._terms) or self._terms[i] != term:
            return EMPTY_POSTINGS
        lo, hi = self._t_bounds[i], self._t_bounds[i + 1]
        docs = self._g_doc[lo:hi].astype(np.int64)
        tfs = self._g_tf[lo:hi].astype(np.int64)
        offs = self._p_offsets[lo : hi + 1] - self._p_offsets[lo]
        pos = self._pos[self._p_offsets[lo] : self._p_offsets[hi]]
        return Postings(docs, tfs, offs, pos, len(docs), int(tfs.sum()))

    def vocabulary(self, field: "str | None" = None):
        return [("body", str(t)) for t in self._terms]


class Percolator:
    """Actor-pool callable: parse stored queries once, match per batch.

    ``queries`` = [(query_id, query_string), ...]; batches are
    (doc_id, text) tables; emits (doc_id, query_id) match pairs."""

    def __init__(self, queries, stemmer_name: str = "none") -> None:
        from .stem import get_stemmer

        stemmer = get_stemmer(stemmer_name)
        analyze = lambda tok: analyze_query_token(tok, stemmer)  # noqa: E731
        self.params = ModelParams(model="unrankedboolean", top_k=1 << 62)
        self.trees = [
            (qid, parse_query(q, DEFAULT_OP["unrankedboolean"], analyze))
            for qid, q in queries
        ]

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_ids = t.column("doc_id").to_numpy()
        texts = t.column("text").to_pylist()
        idx = _BatchPostings(analyze_batch(texts))
        out_doc, out_q = [], []
        for qid, tree in self.trees:
            ev = Evaluator(idx, self.params)
            rows, _scores = ev.evaluate(tree)
            out_doc.append(doc_ids[rows])
            out_q.extend([qid] * len(rows))
        docs = (
            np.concatenate(out_doc) if out_doc else np.empty(0, np.int64)
        )
        return pa.table(
            {
                "doc_id": pa.array(docs.astype(np.int64), type=pa.int64()),
                "query_id": pa.array(out_q, type=pa.string()),
            }
        ).cast(_SCHEMA)


def percolate(sf_dir: str, queries, stemmer_name: str = "none"):
    """Match every corpus document against the stored queries: one
    actor-pool ``map_batches`` pass, output (doc_id, query_id) pairs."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(
        Percolator,
        fn_constructor_args=(list(queries), stemmer_name),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
