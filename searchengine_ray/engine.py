"""Query serving: actor-pool evaluation, top-k merge, trec_eval output.

Two execution modes over the same operator library:

- :func:`run_queries` — query-parallel: a Ray Data pipeline over the
  (qid, query) Dataset with a stateful actor pool; each
  :class:`QueryEvalActor` loads the index ONCE in ``__init__`` (the
  reference's static ``Idx.INDEXREADER``, `Idx.java:32-37`, re-homed as
  actor state) and evaluates whole queries per batch. This is the
  high-QPS path when queries >> shards.
- :class:`ShardedQueryService` / :func:`evaluate_sharded` — doc-parallel
  two-phase: each doc-range shard evaluates the query tree locally,
  shards' derived-list df/ctf are all-reduced, then scoring runs with
  GLOBAL statistics and per-shard top-k merges on the driver. This is the
  path a 10^12-doc corpus needs (no single node holds the index), and the
  part a naive shard-and-score design gets wrong: BM25/Indri score a
  derived #NEAR/#WINDOW/#SYN list with its global df/ctf
  (`QrySopScore.java:123-124, 89-90`).

Result ordering everywhere: score DESC, external_id ASC on ties
(`ScoreList.java:87-106`); output format `qid Q0 extid rank score runid`
with score %.18f and a `dummy` row for empty results (`QryEval.java:212-232`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .analyze import analyze_query_token
from .config import DEFAULT_OP, ModelParams
from .indexio import InvertedIndex
from .operators import Evaluator, collect_iop_nodes
from .qryparse import parse_query

RESULT_SCHEMA = pa.schema(
    [
        ("qid", pa.string()),
        ("doc_id", pa.int64()),
        ("external_id", pa.string()),
        ("score", pa.float64()),
        ("rank", pa.int32()),
    ]
)


def top_k(
    docs: np.ndarray, scores: np.ndarray, external_ids: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Reference sort: score desc, externalId asc (string compare) on ties."""
    if len(docs) == 0:
        return docs, scores, external_ids
    order = np.lexsort((external_ids.astype(str), -scores))
    order = order[:k]
    return docs[order], scores[order], external_ids[order]


def select_top_k(index: InvertedIndex, docs, scores, k):
    """Top-k with the exact comparator, but cheap at large result sets:
    partial-select candidates by score first, and when the k-th score ties
    massively (e.g. idf-clamped all-zero scores over 10^5+ docs) partial-
    select the tie set by external id too — the full string sort runs on
    O(k) candidates, never the whole result."""
    n = len(docs)
    if n == 0:
        return docs, scores, np.empty(0, dtype=object)
    if n > 4 * k and k > 0:
        kth = np.partition(scores, n - k)[n - k]  # k-th largest score
        strictly = np.flatnonzero(scores > kth)
        need = k - len(strictly)
        ties = np.flatnonzero(scores == kth)
        if need > 0 and len(ties) > 4 * need:
            # smallest `need` tie-break ranks among the ties (integer select)
            rank_t = index.ext_ranks(docs[ties])
            sel_t = np.argpartition(rank_t, need - 1)[:need]
            cand = np.concatenate([strictly, ties[sel_t]])
        else:
            cand = np.concatenate([strictly, ties])
    else:
        cand = np.arange(n)
    order = np.lexsort((index.ext_ranks(docs[cand]), -scores[cand]))[:k]
    sel = cand[order]
    return docs[sel], scores[sel], index.external_ids(docs[sel])


class SearchEngine:
    """Single-process engine over one built index (all shards)."""

    def __init__(
        self,
        index_dir: str,
        params: ModelParams | None = None,
        parts: list[int] | None = None,
        docvalues_dir: str | None = None,
        synonyms: "dict[str, list[str]] | None" = None,
        runtime_fields: "dict[str, tuple[str, str, float]] | None" = None,
    ):
        from .stem import get_stemmer

        self.index = InvertedIndex(index_dir, parts=parts)
        if docvalues_dir is not None:
            self.index.attach_docvalues(docvalues_dir)
        if runtime_fields:
            # ES runtime_mappings: computed doc values named per engine
            # (see InvertedIndex.set_runtime_fields) — usable by #range,
            # function_score and field sorts like any stored column
            self.index.set_runtime_fields(runtime_fields)
        self.params = params or ModelParams()
        stemmer = get_stemmer(self.index.stemmer_name)
        self._analyze = lambda tok: analyze_query_token(tok, stemmer)
        # Query-time synonym expansion (ES synonym filter analog):
        # normalize the user's surface forms through THIS index's analyzer
        # once, so the mapping lives in index-term space — multi-term
        # entries raise (single-token synonyms only, the non-graph filter),
        # stopword entries vanish like any analyzed token.
        self._synonyms: "dict[str, list[str]]" = {}
        for k, vals in (synonyms or {}).items():
            kk = self._analyze(k)
            if len(kk) != 1:
                raise ValueError(
                    f"synonym key {k!r} analyzes to {kk} — single-token "
                    f"keys only"
                )
            out = []
            for v in vals:
                vv = self._analyze(v)
                if len(vv) > 1:
                    raise ValueError(
                        f"synonym {v!r} analyzes to {vv} — single-token "
                        f"synonyms only (no graph filter)"
                    )
                if vv and vv[0] != kk[0] and vv[0] not in out:
                    out.append(vv[0])
            if out:
                self._synonyms[kk[0]] = out

    def parse(self, query: str):
        tree = parse_query(
            query, DEFAULT_OP[self.params.model], self._analyze
        )
        if self._synonyms and tree is not None:
            from .qryparse import expand_synonyms

            tree = expand_synonyms(tree, self._synonyms)
        return tree

    def search(self, qid: str, query: str) -> pa.Table:
        tree = self.parse(query)
        docs = scores = None
        if self.params.model == "bm25" and self.params.use_maxscore:
            from .wand import flat_bm25_terms, flat_bm25_topk

            terms = flat_bm25_terms(tree) if tree is not None else None
            if terms:
                fast = flat_bm25_topk(self.index, terms, self.params)
                if fast is not None:
                    docs, scores = fast
        if docs is None:
            ev = Evaluator(self.index, self.params)
            docs, scores = ev.evaluate(tree)
        docs, scores, ext = select_top_k(self.index, docs, scores, self.params.top_k)
        n = len(docs)
        return pa.table(
            {
                "qid": pa.array([qid] * n, type=pa.string()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "external_id": pa.array(ext.astype(str), type=pa.string()),
                "score": pa.array(scores, type=pa.float64()),
                "rank": pa.array(np.arange(1, n + 1, dtype=np.int32)),
            }
        )

    def explain(self, qid: str, query: str) -> pa.Table:
        """Lucene ``IndexSearcher.explain`` / ES ``_explain`` analog (the
        Explanation tree flattened to rows) for flat BM25 #SUM queries: one
        row per (matching doc, term leaf) carrying every input of that
        leaf's score — tf, df (the ``stat_df`` scoring actually uses, stale
        under tombstones exactly like serving), doclen — plus the leaf
        score itself, computed by the SAME ``Evaluator._score_leaf`` the
        serving path runs, so explain output is bitwise-consistent with
        ``search`` (sum of a doc's rows == its served score under #SUM).
        Structured operators have no per-leaf additive decomposition under
        every model, so non-flat trees raise (Lucene's explain likewise
        only decomposes sum-of-clauses scorers clause-by-clause). No
        QryEval counterpart — the course engine never explains scores."""
        from .wand import flat_bm25_terms

        if self.params.model != "bm25":
            raise ValueError("explain() supports the BM25 model only")
        tree = self.parse(query)
        leaves: list = []
        if tree is not None:
            if flat_bm25_terms(tree) is None:
                raise ValueError(
                    "explain() supports flat BM25 term queries only "
                    "(#SUM of plain terms)"
                )
            leaves = [tree] if tree.name == "#score" else list(tree.args)
        ev = Evaluator(self.index, self.params)
        parts: list[pa.Table] = []
        for leaf in leaves:
            term_node = leaf.args[0]
            p = ev.iop(term_node)
            if p.df == 0:
                continue
            docs, scores = ev._score_leaf(leaf)
            df, _ = ev._iop_stats(term_node)
            dl = self.index.doclen(term_node.field, docs)
            n = len(docs)
            parts.append(
                pa.table(
                    {
                        "qid": pa.array([qid] * n, type=pa.string()),
                        "doc_id": pa.array(docs, type=pa.int64()),
                        "term": pa.array([term_node.term] * n, type=pa.string()),
                        "field": pa.array([term_node.field] * n, type=pa.string()),
                        "tf": pa.array(p.tfs, type=pa.int64()),
                        "df": pa.array(np.full(n, df, dtype=np.int64)),
                        "dl": pa.array(dl, type=pa.int64()),
                        "score": pa.array(scores, type=pa.float64()),
                    }
                )
            )
        if not parts:
            return pa.table(
                {
                    "qid": pa.array([], type=pa.string()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "term": pa.array([], type=pa.string()),
                    "field": pa.array([], type=pa.string()),
                    "tf": pa.array([], type=pa.int64()),
                    "df": pa.array([], type=pa.int64()),
                    "dl": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        return pa.concat_tables(parts)

    def search_after(
        self,
        qid: str,
        query: str,
        after: "tuple[float, str] | None",
        k: int,
    ) -> pa.Table:
        """Deep pagination with a (score, external_id) cursor — the Lucene
        ``IndexSearcher.searchAfter(FieldDoc, query, n)`` analog: return the
        next ``k`` results STRICTLY after ``after`` in the global result
        order (score desc, external_id asc), so successive pages tile the
        full ranking with no overlap and no gap even across score ties.

        Unlike OFFSET paging, the cursor filter is shard-local (each doc
        shard drops its own before-cursor rows, then ships only its top-k)
        — page depth never inflates the per-shard merge fan-in, which is
        why Lucene/ES mandate search_after for deep paging. Evaluation
        takes the exhaustive path; a block-max cursor-seeded WAND (seed the
        pruning threshold at ``after[0]``) is the known optimization and
        would only shrink the candidate set, never change it.
        """
        tree = self.parse(query)
        ev = Evaluator(self.index, self.params)
        docs, scores = ev.evaluate(tree)
        if after is not None and len(docs):
            s0, e0 = after
            keep = scores < s0
            ties = np.flatnonzero(scores == s0)
            if len(ties):
                ext_t = self.index.external_ids(docs[ties]).astype(str)
                keep[ties[ext_t > e0]] = True
            docs, scores = docs[keep], scores[keep]
        docs, scores, ext = select_top_k(self.index, docs, scores, k)
        n = len(docs)
        return pa.table(
            {
                "qid": pa.array([qid] * n, type=pa.string()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "external_id": pa.array(ext.astype(str), type=pa.string()),
                "score": pa.array(scores, type=pa.float64()),
                "rank": pa.array(np.arange(1, n + 1, dtype=np.int32)),
            }
        )

    def search_min_should_match(
        self, qid: str, query: str, m: "int | str"
    ) -> pa.Table:
        """ES ``minimum_should_match`` for a flat disjunctive query:
        evaluate the usual disjunction, then drop docs matching fewer
        than ``m`` distinct query clauses — scoring is UNTOUCHED (ES
        semantics: msm constrains the clause count, it never alters the
        per-clause scores or their statistics, so a surviving doc scores
        exactly what plain search() gives it). ``m`` is an int or an ES
        percentage string like ``'75%'`` (floor of the clause count).

        Clauses may be terms or derived lists (#NEAR/#SYN/...); a
        structured tree (nested score ops) raises, mirroring ES where
        msm attaches to a bool query's flat should-clause list."""
        tree = self.parse(query)
        from .qryparse import Op, Term

        leaves = []
        if isinstance(tree, Op) and tree.name in ("#sum", "#or", "#wsum"):
            for c in tree.args:
                inner = (
                    c.args[0]
                    if isinstance(c, Op) and c.name == "#score"
                    else c
                )
                if not getattr(inner, "is_iop", False):
                    raise ValueError(
                        "minimum_should_match needs a flat clause list; "
                        f"nested score operator {c!r} is not a clause"
                    )
                leaves.append(inner)
        else:
            raise ValueError(
                "minimum_should_match applies to a flat disjunction "
                f"(#SUM/#OR/#WSUM), got {tree!r}"
            )
        if isinstance(m, str):
            if not m.endswith("%"):
                raise ValueError(f"bad minimum_should_match {m!r}")
            need = (len(leaves) * int(m[:-1])) // 100
        else:
            need = int(m)
        ev = Evaluator(self.index, self.params)
        docs, scores = ev.evaluate(tree)
        if len(leaves) and len(docs):
            matched = np.concatenate(
                [ev.iop(lf).doc_ids for lf in leaves]
            )
            u, cnt = np.unique(matched, return_counts=True)
            ok = u[cnt >= need]
            keep = np.isin(docs, ok)
            docs, scores = docs[keep], scores[keep]
        docs, scores, ext = select_top_k(
            self.index, docs, scores, self.params.top_k
        )
        n = len(docs)
        return pa.table(
            {
                "qid": pa.array([qid] * n, type=pa.string()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "external_id": pa.array(ext.astype(str), type=pa.string()),
                "score": pa.array(scores, type=pa.float64()),
                "rank": pa.array(np.arange(1, n + 1, dtype=np.int32)),
            }
        )

    def _parse_clause(self, clause: str):
        """Parse one bool-query clause to its inverted-list node (the
        #score wrapper the default-op pipeline adds is unwrapped; a
        clause that is not a single inverted list raises)."""
        from .qryparse import Op

        tree = self.parse(clause)
        if isinstance(tree, Op) and tree.name == "#score":
            tree = tree.args[0]
        if tree is None or not (
            getattr(tree, "is_iop", False)
            or (isinstance(tree, Op) and tree.name == "#range")
        ):
            raise ValueError(
                f"bool clause {clause!r} must be a single term, derived "
                f"inverted list, or #range leaf"
            )
        return tree

    def bool_search(
        self,
        qid: str,
        must: "list[str] | None" = None,
        should: "list[str] | None" = None,
        must_not: "list[str] | None" = None,
        filter: "list[str] | None" = None,
        minimum_should_match: "int | None" = None,
    ) -> pa.Table:
        """The ES ``bool`` query: ``must`` and ``should`` clauses score
        (their BM25 sum, statistics untouched); ``must`` / ``filter``
        clauses are required, ``must_not`` excludes, and ``should``
        requires ``minimum_should_match`` matches (ES default: 1 when
        the query has no must/filter, else 0). ``filter`` and
        ``must_not`` run in filter context — they never touch scoring,
        the documented ES semantics. Clauses are query-language strings
        (terms, #NEAR/#SYN derived lists, #RANGE doc-values leaves...).

        With no scoring clauses at all, matching docs come back with the
        constant score 0.0 (ES's filter-only boost-neutral case)."""
        from .qryparse import Op

        must = [self._parse_clause(c) for c in (must or [])]
        should = [self._parse_clause(c) for c in (should or [])]
        must_not = [self._parse_clause(c) for c in (must_not or [])]
        filt = [self._parse_clause(c) for c in (filter or [])]
        for lf in must + should:
            if isinstance(lf, Op) and lf.name == "#range":
                raise ValueError(
                    "#range is a pure filter leaf (constant score) — "
                    "put it in filter/must_not, not must/should"
                )
        if minimum_should_match is None:
            minimum_should_match = 0 if (must or filt) else 1
        ev = Evaluator(self.index, self.params)

        def clause_docs(lf) -> np.ndarray:
            if isinstance(lf, Op) and lf.name == "#range":
                return ev.sop(lf)[0]  # constant-score filter leaf
            return ev.iop(lf).doc_ids

        scoring = must + should
        if scoring:
            tree = Op(
                "#sum",
                args=[Op("#score", args=[leaf]) for leaf in scoring],
            )
            docs, scores = ev.evaluate(tree)
        else:
            if not filt:
                # a must_not-only bool is unbounded negation; like
                # #ANDNOT, require a positive clause
                raise ValueError(
                    "bool_search needs at least one must/should/filter "
                    "clause"
                )
            base = [clause_docs(lf) for lf in filt]
            docs = np.unique(np.concatenate(base))
            scores = np.zeros(len(docs))
        keep = np.ones(len(docs), dtype=bool)
        for lf in must + filt:
            keep &= np.isin(docs, clause_docs(lf))
        for lf in must_not:
            keep &= ~np.isin(docs, clause_docs(lf))
        if should and minimum_should_match > 0:
            matched = np.concatenate(
                [clause_docs(lf) for lf in should]
            )
            u, cnt = np.unique(matched, return_counts=True)
            keep &= np.isin(docs, u[cnt >= minimum_should_match])
        docs, scores = docs[keep], scores[keep]
        docs, scores, ext = select_top_k(
            self.index, docs, scores, self.params.top_k
        )
        n = len(docs)
        return pa.table(
            {
                "qid": pa.array([qid] * n, type=pa.string()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "external_id": pa.array(ext.astype(str), type=pa.string()),
                "score": pa.array(scores, type=pa.float64()),
                "rank": pa.array(np.arange(1, n + 1, dtype=np.int32)),
            }
        )

    def simple_query_string(
        self, qid: str, query: str, default_operator: str = "and"
    ) -> pa.Table:
        """The ES ``simple_query_string`` query: parse the +/|/-/"..."/
        term* syntax (`qryparse.parse_simple_query`) and evaluate it with
        the documented ES scoring split — every positive (non-negated)
        leaf scores through the model's #SUM in appearance order with
        full-corpus statistics, and the boolean structure decides
        MEMBERSHIP only (set algebra over the leaves' inverted lists).
        A stopword leaf the analyzer drops prunes like the reference
        optimizer's empty-drop: ignored in AND/OR, its negation a no-op.

        Negation is only valid inside a conjunction with at least one
        positive sibling (the #ANDNOT boundedness rule); a top-level or
        OR-side ``-`` raises.

        Scale shape: identical to `bool_search` — per-shard postings
        decode for every leaf, membership is numpy set algebra over
        matching doc-id arrays (match-sized, never corpus-sized)."""
        from .qryparse import Op, parse_simple_query

        ast = parse_simple_query(query, default_operator)
        ev = Evaluator(self.index, self.params)

        def prune(node):
            kind = node[0]
            if kind == "leaf":
                tree = self.parse(node[1])
                if isinstance(tree, Op) and tree.name == "#score":
                    tree = tree.args[0]
                if tree is None or not getattr(tree, "is_iop", False):
                    return None
                return ("leaf", tree)
            if kind == "not":
                child = prune(node[1])
                return None if child is None else ("not", child)
            ch = [c for c in (prune(c) for c in node[1]) if c is not None]
            if not ch:
                return None
            return ch[0] if len(ch) == 1 else (kind, ch)

        ast = prune(ast)
        if ast is None:
            raise ValueError(
                "simple_query_string: every clause was dropped by analysis"
            )

        pos_leaves: list = []

        def collect(node, negated: bool):
            kind = node[0]
            if kind == "leaf":
                if not negated:
                    pos_leaves.append(node[1])
            elif kind == "not":
                collect(node[1], True)
            else:
                for c in node[1]:
                    collect(c, negated)

        collect(ast, False)
        if not pos_leaves:
            raise ValueError(
                "simple_query_string needs at least one positive clause"
            )
        tree = Op(
            "#sum", args=[Op("#score", args=[leaf]) for leaf in pos_leaves]
        )
        docs, scores = ev.evaluate(tree)

        def mask(node) -> np.ndarray:
            kind = node[0]
            if kind == "leaf":
                return np.isin(docs, ev.iop(node[1]).doc_ids)
            if kind == "not":
                raise ValueError(
                    "simple_query_string: negation needs a positive "
                    "conjunction sibling (unbounded NOT)"
                )
            if kind == "or":
                m = np.zeros(len(docs), dtype=bool)
                for c in node[1]:
                    m |= mask(c)  # "not" under OR raises above
                return m
            m = np.ones(len(docs), dtype=bool)
            positives = 0
            for c in node[1]:
                if c[0] == "not":
                    m &= ~mask(c[1])
                else:
                    positives += 1
                    m &= mask(c)
            if positives == 0:
                raise ValueError(
                    "simple_query_string: conjunction of only negations"
                )
            return m

        keep = mask(ast)
        docs, scores = docs[keep], scores[keep]
        docs, scores, ext = select_top_k(
            self.index, docs, scores, self.params.top_k
        )
        n = len(docs)
        return pa.table(
            {
                "qid": pa.array([qid] * n, type=pa.string()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "external_id": pa.array(ext.astype(str), type=pa.string()),
                "score": pa.array(scores, type=pa.float64()),
                "rank": pa.array(np.arange(1, n + 1, dtype=np.int32)),
            }
        )

    def rescore_topn(
        self,
        qid: str,
        base_query: str,
        rescore_query: str,
        window: int = 50,
        query_weight: float = 1.0,
        rescore_weight: float = 2.0,
        k: int = 10,
    ) -> pa.Table:
        """Window rescoring — the Elasticsearch ``rescore`` API analog
        (score_mode=total, the default): re-rank only the top ``window``
        hits of the base ranking with a second, more expensive query,
        ``combined = query_weight*base + rescore_weight*second`` (docs
        the rescore query does not match contribute 0), then return the
        top ``k`` of the window by (combined DESC, external_id ASC) —
        the engine's standard tie-break.

        Scale shape: both legs run through the (sharded, actor-pool)
        serving path; the combine itself is window-sized coordinator
        work, exactly where ES runs its rescore phase. The second query
        is evaluated once here; at real scale it would be restricted to
        the window's docids (an intersection the Evaluator supports) —
        the semantics are identical because only window docs combine."""
        base = self.search(qid, base_query)
        bwin = base.slice(0, window)
        bd = bwin.column("doc_id").to_numpy()
        bs = bwin.column("score").to_numpy()
        bext = bwin.column("external_id").to_numpy(zero_copy_only=False)
        resc = self.search(qid, rescore_query)
        rd = resc.column("doc_id").to_numpy()
        rs = resc.column("score").to_numpy()
        o = np.argsort(rd)
        rd, rs = rd[o], rs[o]
        if len(rd):
            pos = np.searchsorted(rd, bd)
            posc = np.minimum(pos, len(rd) - 1)
            hit = (pos < len(rd)) & (rd[posc] == bd)
            ns = np.where(hit, rs[posc], 0.0)
        else:
            ns = np.zeros(len(bd))
        # mirror the oracle's expression exactly:
        # query_weight*s + rescore_weight*coalesce(n.s, 0)
        comb = query_weight * bs + rescore_weight * ns
        order = np.lexsort((bext, -comb))[:k]
        n = len(order)
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": pa.array(bd[order], pa.int64()),
                "score_r": pc.round(
                    pa.array(comb[order], pa.float64()), ndigits=6
                ),
                "rn": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            }
        )

    def search_many(self, items: list[tuple[str, str]]) -> pa.Table:
        tables = [self.search(qid, q) for qid, q in items]
        tables = [t for t in tables if t.num_rows] or [
            pa.table(
                {f.name: pa.array([], type=f.type) for f in RESULT_SCHEMA}
            )
        ]
        return pa.concat_tables(tables)


class QueryEvalActor:
    """map_batches actor: (qid, query) batch -> ranked-results batch.

    Index + stats load once per actor (``concurrency=N`` pool); per batch
    work is pure evaluation. Pass ``parts`` to pin an actor to a doc shard.
    """

    def __init__(
        self,
        index_dir: str,
        params: ModelParams | None = None,
        parts: list[int] | None = None,
        docvalues_dir: str | None = None,
    ):
        self.engine = SearchEngine(
            index_dir, params, parts=parts, docvalues_dir=docvalues_dir
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        items = list(
            zip(
                batch.column("qid").to_pylist(),
                batch.column("query").to_pylist(),
            )
        )
        return self.engine.search_many(items)


def run_queries(
    index_dir: str,
    queries: "list[tuple[str, str]] | object",
    params: ModelParams | None = None,
    concurrency: int = 4,
    docvalues_dir: str | None = None,
) -> pa.Table:
    """Evaluate a query set with an actor pool; returns the full result table
    (small: n_queries x top_k rows), ordered by (qid, rank)."""
    import ray.data

    if isinstance(queries, list):
        qds = ray.data.from_items(
            [{"qid": q, "query": s} for q, s in queries]
        )
    else:
        qds = queries
    n = qds.count()
    out = qds.map_batches(
        QueryEvalActor,
        fn_constructor_kwargs={
            "index_dir": index_dir, "params": params,
            "docvalues_dir": docvalues_dir,
        },
        batch_format="pyarrow",
        batch_size=max(1, -(-n // max(1, concurrency))),
        concurrency=min(concurrency, max(1, n)),
        num_cpus=1,
    )
    parts = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in out.iter_batches(batch_format="pyarrow")
    ]
    tbl = (
        pa.concat_tables(parts, promote_options="default")
        if parts
        else RESULT_SCHEMA.empty_table()
    )
    if tbl.num_rows:
        tbl = tbl.sort_by([("qid", "ascending"), ("rank", "ascending")])
    return tbl.cast(RESULT_SCHEMA)


class _EngineActor:
    """Plain Ray actor wrapping SearchEngine (long-lived serving pool)."""

    def __init__(
        self,
        index_dir: str,
        params: ModelParams | None,
        docvalues_dir: "str | None" = None,
    ):
        self.engine = SearchEngine(
            index_dir, params, docvalues_dir=docvalues_dir
        )

    def ping(self) -> bool:
        return True

    def search_many(self, items: list[tuple[str, str]]) -> pa.Table:
        return self.engine.search_many(items)


class QueryService:
    """Long-lived query-serving pool: N actors, each holding the full index
    (or a shard via ``parts``), queries round-robined in chunks.

    This is the serving-path counterpart to :func:`run_queries` (which spins
    a fresh Ray Data actor pool per call — fine for batch jobs, wrong for
    measuring steady-state QPS)."""

    def __init__(
        self,
        index_dir: str,
        params: ModelParams | None = None,
        num_actors: int = 8,
        docvalues_dir: "str | None" = None,
    ):
        import ray

        Actor = ray.remote(num_cpus=1)(_EngineActor)
        self.actors = [
            Actor.remote(index_dir, params, docvalues_dir)
            for _ in range(num_actors)
        ]
        ray.get([a.ping.remote() for a in self.actors])  # block until loaded

    def warm(self, items: list[tuple[str, str]]) -> None:
        """Broadcast the query set to EVERY actor once (parallel, blocking).

        With dynamic dispatch an actor may serve any chunk, so a single
        shared pass no longer guarantees each actor has decoded each
        query's postings — measured cold-start: the first post-"warm"
        batches ran at 14-50 QPS climbing to ~85 once every actor had
        seen every term, a cache ramp masquerading as steal noise. One
        broadcast pass puts the pool in steady state immediately; in
        production the same effect comes from sustained traffic."""
        import ray

        ray.get([a.search_many.remote(items) for a in self.actors])

    def search_batch(
        self, items: list[tuple[str, str]], chunk_size: "int | None" = None
    ) -> pa.Table:
        """Dynamic dispatch: the batch splits into ~4 chunk waves per actor
        and freed actors pull the next chunk (ray.wait loop), so one
        expensive structured query can't turn its whole statically-assigned
        chunk into the straggler tail — query cost is highly skewed
        (#NEAR/#WINDOW decode positions, flat BM25 doesn't), and with
        static 1/N chunks that tail is exactly what caps query-side
        scaling efficiency. Result order is (qid, rank) regardless of
        which actor served what."""
        import ray

        n = len(self.actors)
        if chunk_size is None:
            chunk_size = max(1, len(items) // (4 * n))
        chunks = [
            items[i : i + chunk_size]
            for i in range(0, len(items), chunk_size)
        ]
        it = iter(chunks)
        fut2actor: dict = {}
        for a in self.actors:
            c = next(it, None)
            if c is None:
                break
            fut2actor[a.search_many.remote(c)] = a
        tables = []
        while fut2actor:
            done, _ = ray.wait(list(fut2actor), num_returns=1)
            actor = fut2actor.pop(done[0])
            t = ray.get(done[0])
            if t.num_rows:
                tables.append(t)
            c = next(it, None)
            if c is not None:
                fut2actor[actor.search_many.remote(c)] = actor
        if not tables:
            return pa.table(
                {f.name: pa.array([], type=f.type) for f in RESULT_SCHEMA}
            )
        out = pa.concat_tables(tables)
        return out.sort_by([("qid", "ascending"), ("rank", "ascending")])

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []


# ---------------------------------------------------------------------------
# Doc-sharded two-phase evaluation (the at-scale path)
# ---------------------------------------------------------------------------


class _ShardWorker:
    """Holds one doc-range shard; phase 1 returns derived-list stats, phase 2
    scores with the globally-merged stats injected."""

    def __init__(
        self,
        index_dir: str,
        part: "int | list[int]",
        params: ModelParams,
        docvalues_dir: "str | None" = None,
    ):
        parts = [part] if isinstance(part, int) else list(part)
        self.index = InvertedIndex(index_dir, parts=parts)
        if docvalues_dir is not None:
            # per-shard lazy numeric doc values (#range): each worker
            # loads only its own doc span's column slices
            self.index.attach_docvalues(docvalues_dir)
        self.params = params

    def ping(self) -> bool:
        return True

    def local_stats(self, tree) -> list[tuple[int, int]]:
        ev = Evaluator(self.index, self.params)
        return [
            # stat_*: shard-summed statistics stay Lucene-stale under
            # tombstoned deletes (see indexio.Postings)
            (p.stat_df, p.stat_ctf)
            for p in (ev.iop(n) for n in collect_iop_nodes(tree))
        ]

    def score_with(self, tree, merged: list[tuple[int, int]]) -> pa.Table:
        ev = Evaluator(self.index, self.params)
        nodes = collect_iop_nodes(tree)
        ev.stats_override = {id(n): s for n, s in zip(nodes, merged)}
        docs, scores = ev.evaluate(tree)
        # shard-local truncation to top_k: safe, the global merge re-sorts
        docs, scores, ext = select_top_k(
            self.index, docs, scores, self.params.top_k
        )
        return pa.table(
            {
                "doc_id": pa.array(docs, type=pa.int64()),
                "external_id": pa.array(ext.astype(str), type=pa.string()),
                "score": pa.array(scores, type=pa.float64()),
            }
        )


def balanced_shards(index_dir: str, n_shards: int) -> list[list[int]]:
    """Length-aware shard assignment for :class:`ShardedQueryService`
    (north_rule "length-aware repartitioning"): doc-range partitions are
    packed into ``n_shards`` groups balanced by Σ len_body, not partition
    COUNT — long documents dominate positional-operator (NEAR/WINDOW)
    decode cost, so count-balanced shards skew tail latency whenever doc
    lengths are skewed (they always are at web scale). Greedy LPT:
    partitions sorted by descending load, each into the lightest bin;
    ties break toward the lower partition id so the assignment is
    deterministic. Planning-time cost: one pruned single-column parquet
    read (len_body) per partition."""
    import os

    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from .build import index_partitions

    parts = index_partitions(index_dir)
    if not parts:
        return []
    loads = []
    for p in parts:
        d = pads.dataset(os.path.join(index_dir, "docmap", f"part_{p:05d}"))
        s = int(pc.sum(d.to_table(columns=["len_body"]).column("len_body")).as_py() or 0)
        loads.append((s, p))
    n_shards = max(1, min(n_shards, len(parts)))
    bins: list[list] = [[0, i, []] for i in range(n_shards)]  # load, idx, parts
    for s, p in sorted(loads, key=lambda t: (-t[0], t[1])):
        b = min(bins, key=lambda b: (b[0], b[1]))
        b[0] += s
        b[2].append(p)
    return [sorted(b[2]) for b in bins if b[2]]


class ShardedQueryService:
    """Long-lived doc-sharded serving pool: one actor per doc-range shard,
    created once; every query runs the TWO-PHASE protocol against the same
    pool. This is the architecture for indexes too large for one node:
    shard actors hold disjoint doc ranges, phase 1 all-reduces the derived
    inverted lists' (df, ctf) so BM25/Indri score with GLOBAL statistics
    (`QrySopScore.java:123-124, 89-90` — the thing a naive shard-and-score
    gets wrong), phase 2 scores and returns per-shard top-k for the exact
    k-way driver merge."""

    def __init__(
        self,
        index_dir: str,
        parts: list[int],
        params: ModelParams | None = None,
        docvalues_dir: "str | None" = None,
    ):
        import json as _json
        import os as _os

        import ray

        from .stem import get_stemmer

        self.params = params or ModelParams()
        with open(_os.path.join(index_dir, "stats.json")) as f:
            _stemmer = get_stemmer(_json.load(f).get("stemmer", "none"))
        self._analyze = lambda tok: analyze_query_token(tok, _stemmer)
        Worker = ray.remote(num_cpus=1)(_ShardWorker)
        self.workers = [
            Worker.remote(index_dir, p, self.params, docvalues_dir)
            for p in parts
        ]
        ray.get([w.ping.remote() for w in self.workers])

    def search(self, qid: str, query: str) -> pa.Table:
        import ray

        params = self.params
        tree = parse_query(query, DEFAULT_OP[params.model], self._analyze)
        per_shard = ray.get(
            [w.local_stats.remote(tree) for w in self.workers]
        )
        n_nodes = len(per_shard[0]) if per_shard else 0
        merged = [
            (
                sum(s[i][0] for s in per_shard),
                sum(s[i][1] for s in per_shard),
            )
            for i in range(n_nodes)
        ]
        shard_tables = ray.get(
            [w.score_with.remote(tree, merged) for w in self.workers]
        )
        all_t = pa.concat_tables(
            [t for t in shard_tables if t.num_rows] or shard_tables[:1]
        )
        docs = all_t.column("doc_id").to_numpy()
        scores = all_t.column("score").to_numpy()
        ext = np.asarray(all_t.column("external_id").to_pylist(), dtype=object)
        docs, scores, ext = top_k(docs, scores, ext, params.top_k)
        n = len(docs)
        return pa.table(
            {
                "qid": pa.array([qid] * n, type=pa.string()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "external_id": pa.array(ext.astype(str), type=pa.string()),
                "score": pa.array(scores, type=pa.float64()),
                "rank": pa.array(np.arange(1, n + 1, dtype=np.int32)),
            }
        )

    def shutdown(self) -> None:
        import ray

        for w in self.workers:
            ray.kill(w)
        self.workers = []


def evaluate_sharded(
    index_dir: str,
    qid: str,
    query: str,
    parts: list[int],
    params: ModelParams | None = None,
) -> pa.Table:
    """One-shot two-phase doc-sharded evaluation (see ShardedQueryService
    for the long-lived pool)."""
    svc = ShardedQueryService(index_dir, parts, params)
    try:
        return svc.search(qid, query)
    finally:
        svc.shutdown()


# ---------------------------------------------------------------------------
# trec_eval output
# ---------------------------------------------------------------------------


def _as_table(results) -> pa.Table:
    """Normalize a result container (pa.Table / pandas.DataFrame /
    ray Dataset) to an Arrow table. Output-bounded: results are already
    top-k x n_queries."""
    import pandas as pd

    if isinstance(results, pa.Table):
        return results
    if isinstance(results, pd.DataFrame):
        return pa.Table.from_pandas(results, preserve_index=False)
    return pa.Table.from_pandas(results.to_pandas(), preserve_index=False)


def format_trec(
    results: pa.Table, run_id: str = "reference", style: str = "hw6"
) -> str:
    """trec_eval output.

    ``style="hw6"`` (default): `qid Q0 extId rank score runid`
    space-separated, %.18f scores, rank FROM 1
    (`Homeworks/HW6/QryEval/QryEval.java:212-232`).
    ``style="hw1"``: TAB-separated, %f scores, rank FROM 0
    (`Homeworks/HW1/QryEval/QryEval.java:226-243`).
    Dummy rows for queries with EMPTY result sets are emitted by
    :func:`write_trec` via ``all_qids`` (a results table carries no row at
    all for an empty query, so only the caller knows the full qid set).
    """
    hw1 = style == "hw1"
    sep = "\t" if hw1 else " "
    t = _as_table(results).sort_by(
        [("qid", "ascending"), ("rank", "ascending")]
    )
    off = 1 if hw1 else 0
    lines = [
        sep.join(
            (
                str(q),
                "Q0",
                str(e),
                str(int(r) - off),
                f"{s:f}" if hw1 else f"{s:.18f}",
                run_id,
            )
        )
        for q, e, r, s in zip(
            t.column("qid").to_pylist(),
            t.column("external_id").to_pylist(),
            t.column("rank").to_pylist(),
            t.column("score").to_pylist(),
        )
    ]
    return "\n".join(lines) + "\n"


def write_trec(
    results: pa.Table,
    path: str,
    all_qids: list[str] | None = None,
    run_id: str = "reference",
    style: str = "hw6",
) -> None:
    results = _as_table(results)
    text = format_trec(results, run_id, style=style)
    if all_qids:
        present = set(results.column("qid").to_pylist())
        if style == "hw1":
            dummy = f"\tQ0\tdummy\t1\t{0.0:f}\t{run_id}"
            extra = [f"{q}{dummy}" for q in all_qids if q not in present]
        else:
            extra = [
                f"{q} Q0 dummy 1 {0.0:.18f} {run_id}"
                for q in all_qids
                if q not in present
            ]
        if extra:
            text += "\n".join(extra) + "\n"
    with open(path, "w") as f:
        f.write(text)


def read_queries_file(path: str) -> list[tuple[str, str]]:
    """One query per line, `qid:querystring` (`QryEval.java:152-195`)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            qid, q = line.split(":", 1)
            out.append((qid.strip(), q.strip()))
    return out
