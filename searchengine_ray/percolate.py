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

        # ONE profile for both sides: queries stem at parse, the document
        # stream stems in __call__ — a query-only stem would silently
        # never match on a stemmed profile
        self._stemmer = get_stemmer(stemmer_name)
        analyze = lambda tok: analyze_query_token(tok, self._stemmer)  # noqa: E731
        self.params = ModelParams(model="unrankedboolean", top_k=1 << 62)
        self.trees = [
            (qid, parse_query(q, DEFAULT_OP["unrankedboolean"], analyze))
            for qid, q in queries
        ]

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_ids = t.column("doc_id").to_numpy()
        texts = t.column("text").to_pylist()
        idx = _BatchPostings(analyze_batch(texts, stemmer=self._stemmer))
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


# ---------------------------------------------------------------------------
# Scored percolation (the ES percolate query WITH _score): each matching
# (document, stored query) pair carries the retrieval-model score the doc
# WOULD receive from the attached serving index — tf/positions/doclen come
# from the streaming document, corpus statistics (N, avgdl, per-node
# df/ctf) come from the index, captured ONCE at actor construction via the
# same stats_override mechanism the sharded two-phase serving path uses.
# For documents that are in the corpus this equals the serving engine's
# score EXACTLY (pytest-pinned), which is the semantic contract: "score
# this stream as if served". ES scores percolation against a one-document
# MemoryIndex (degenerate idf); scoring with live-index statistics is the
# production variant for alerting-with-relevance next to a serving index.
# ---------------------------------------------------------------------------

_SCORED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("query_id", pa.string()),
        ("score", pa.float64()),
    ]
)


class _ScoredBatchPostings(_BatchPostings):
    """Batch postings + the index-surface statistics the scoring leaves
    consult: global N / field sums from the attached index, per-doc
    lengths from the analyzed batch."""

    def __init__(self, ab, n_docs: int, sum_len: int, doc_count: int):
        super().__init__(ab)
        self._batch_doc_lens = ab.doc_lens.astype(np.float64)
        self._g_n_docs = n_docs
        self._g_sum_len = sum_len
        self._g_doc_count = doc_count

    @property
    def num_docs(self) -> int:
        return self._g_n_docs

    def doclen(self, field: str, docs: np.ndarray) -> np.ndarray:
        if field != "body":
            raise NotImplementedError("scored percolation is body-only")
        return self._batch_doc_lens[np.asarray(docs, np.int64)]

    def sum_field_lengths(self, field: str) -> int:
        return self._g_sum_len

    def doc_count(self, field: str) -> int:
        return self._g_doc_count


class ScoredPercolator:
    """Actor-pool callable: stored queries parse once with the INDEX's
    analyzer profile, per-node global (df, ctf) capture once from the
    index (model-sized — the index itself is NOT retained in the actor),
    then every batch scores through the real :class:`Evaluator` with the
    stats injected. Emits (doc_id, query_id, score) for every match."""

    def __init__(self, index_dir: str, queries, params=None):
        from .engine import SearchEngine
        from .operators import collect_iop_nodes
        from .stem import get_stemmer

        eng = SearchEngine(index_dir, params)
        if eng.params.model != "bm25":
            raise ValueError("scored percolation currently scores BM25")
        self.params = eng.params
        # the STREAM must be analyzed with the index's recorded stemmer
        # profile — queries are parsed through eng.parse (which stems), so
        # an unstemmed batch analysis would silently never match stemmed
        # terms on a stemmed index
        self.stemmer_name = eng.index.stemmer_name
        self._stemmer = get_stemmer(self.stemmer_name)
        self.globals_ = (
            eng.index.num_docs,
            eng.index.sum_field_lengths("body"),
            eng.index.doc_count("body"),
        )
        ev = Evaluator(eng.index, self.params)
        self.trees = []
        for qid, q in queries:
            tree = eng.parse(q)
            nodes = collect_iop_nodes(tree)
            stats = [
                (p.stat_df, p.stat_ctf)
                for p in (ev.iop(n) for n in nodes)
            ]
            self.trees.append((qid, tree, stats))
        # the actor keeps only model-sized state; the index reader (and
        # its postings cache) is dropped here
        del ev, eng

    def __call__(self, t: pa.Table) -> pa.Table:
        from .operators import collect_iop_nodes

        doc_ids = t.column("doc_id").to_numpy()
        texts = t.column("text").to_pylist()
        idx = _ScoredBatchPostings(
            analyze_batch(texts, stemmer=self._stemmer), *self.globals_
        )
        out_doc, out_q, out_s = [], [], []
        for qid, tree, stats in self.trees:
            ev = Evaluator(idx, self.params)
            ev.stats_override = {
                id(n): s for n, s in zip(collect_iop_nodes(tree), stats)
            }
            rows, scores = ev.evaluate(tree)
            out_doc.append(doc_ids[rows])
            out_s.append(scores)
            out_q.extend([qid] * len(rows))
        docs = (
            np.concatenate(out_doc) if out_doc else np.empty(0, np.int64)
        )
        scores = (
            np.concatenate(out_s) if out_s else np.empty(0, np.float64)
        )
        return pa.table(
            {
                "doc_id": pa.array(docs.astype(np.int64), type=pa.int64()),
                "query_id": pa.array(out_q, type=pa.string()),
                "score": pa.array(scores, type=pa.float64()),
            }
        ).cast(_SCORED_SCHEMA)


def percolate_scored(sf_dir: str, index_dir: str, queries, params=None):
    """Score every corpus document against the stored queries with the
    attached index's statistics: one actor-pool ``map_batches`` pass,
    output (doc_id, query_id, score) match rows."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(
        ScoredPercolator,
        fn_constructor_args=(index_dir, list(queries)),
        fn_constructor_kwargs={"params": params},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
