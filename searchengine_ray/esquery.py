"""ES query-DSL analogs beyond the bool family: ``pinned``,
``terms_set`` and ``match_phrase_prefix``.

The reference engine (QryEval) has none of these; they are
beyond-reference serving features built from the same primitives every
gated operator uses — the structured-query Evaluator, the term
dictionary, numeric doc values and the (score DESC, external_id ASC)
comparator — so each is exactly SQL-replayable:

- ``pinned_search``: the ES ``pinned`` query. Given external ids pinned
  in caller order ahead of every organic match; pinned docs appear even
  when they don't match the organic query, and are removed from the
  organic section (each doc at most once, the ES contract).
- ``terms_set_search``: the ES ``terms_set`` query (Lucene
  ``CoveringQuery``): a disjunction whose minimum-should-match is
  PER-DOCUMENT, read from a numeric doc-values column (optionally
  scaled by an integer divisor — the ``minimum_should_match_script``
  analog). Scoring is untouched (the msm rule): survivors score their
  plain disjunction sum.
- ``match_phrase_prefix``: the ES ``match_phrase_prefix`` query (Lucene
  ``MultiPhraseQuery`` over a prefix expansion): the last analyzed term
  expands against the term dictionary in sorted order, capped at
  ``max_expansions`` (the ES cap), and the phrase evaluates as
  ``#NEAR/1(prefix-terms..., #SYN(expansions))`` with derived-list
  statistics — the same machinery the gated #NEAR/#SYN/#PREFIX paths
  prove.

Sharding note: all three are doc-local given the usual derived-list
df/ctf all-reduce; prefix expansion against a shard-local dictionary
equals the local restriction of the global expansion (a term absent
from a shard has no local postings), the same argument operators.py
makes for #PREFIX — EXCEPT the ``max_expansions`` cap, which must be
computed from the merged dictionary to be deterministic; a sharded
serving path would all-gather the (bounded, sorted) candidate term
lists first, exactly like the existing derived-stats all-reduce.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def pinned_search(
    engine, qid: str, query: str, ids: list[str], k: int = 10
) -> pa.Table:
    """ES ``pinned`` query: ``ids`` (external ids, caller order) rank
    first — rows 1..len(ids) regardless of organic score or even
    organic membership — then organic results (pinned removed) in the
    engine's standard (score DESC, external_id ASC) order. Unknown ids
    raise (the docmap is authoritative). Returns (doc_id, is_pinned,
    rn) truncated to ``k``; organic scores are intentionally absent
    from the output because ES replaces pinned scores with rank
    constants (1.7014124e38 - slot) and the contract is the ORDER."""
    index = engine.index
    rev = getattr(index, "_esq_ext_rev", None)
    if rev is None:
        rev = {e: d for d, e in zip(index.all_doc_ids(),
                                    index.external_ids(index.all_doc_ids()))}
        index._esq_ext_rev = rev
    pinned: list[int] = []
    for e in ids:
        if e not in rev:
            raise KeyError(f"pinned id {e!r} not in the index docmap")
        d = int(rev[e])
        if d not in pinned:  # ES dedupes repeated pins, first slot wins
            pinned.append(d)
    organic = engine.search(qid, query)
    odocs = organic.column("doc_id").to_numpy()
    keep = ~np.isin(odocs, np.asarray(pinned, dtype=np.int64))
    out_docs = pinned + [int(d) for d in odocs[keep]]
    out_docs = out_docs[:k]
    n = len(out_docs)
    return pa.table(
        {
            "doc_id": pa.array(out_docs, pa.int64()),
            "is_pinned": pa.array(
                [1 if i < len(pinned) else 0 for i in range(n)], pa.int64()
            ),
            "rn": pa.array(np.arange(1, n + 1, dtype=np.int64)),
        }
    )


def terms_set_search(
    engine,
    qid: str,
    terms: list[str],
    msm_field: str,
    msm_divisor: int = 1,
) -> pa.Table:
    """ES ``terms_set`` (Lucene ``CoveringQuery``): match docs whose
    count of DISTINCT matched terms is >= a per-doc threshold read from
    the numeric doc-values column ``msm_field`` (floor-divided by
    ``msm_divisor`` — the minimum_should_match_script analog; ES's
    plain field form is divisor=1). The effective threshold floors at 1
    (the union iterator never visits zero-match docs) and a doc whose
    threshold exceeds ``len(terms)`` can never match — ES does NOT
    clamp, and neither does this. Docs missing the field don't match.
    Scoring is the untouched flat disjunction sum (the msm rule), so
    the oracle is the plain score SQL + a HAVING over distinct matched
    terms vs the replayed threshold."""
    from .engine import Evaluator, select_top_k
    from .qryparse import Op

    if msm_divisor < 1:
        raise ValueError(f"msm_divisor must be >= 1, got {msm_divisor}")
    leaves = [engine._parse_clause(t) for t in terms]
    for lf, t in zip(leaves, terms):
        if not getattr(lf, "is_iop", False):
            raise ValueError(f"terms_set clause {t!r} is not a term leaf")
    ev = Evaluator(engine.index, engine.params)
    tree = Op("#sum", args=[Op("#score", args=[lf]) for lf in leaves])
    docs, scores = ev.evaluate(tree)
    if len(docs):
        matched = np.concatenate([ev.iop(lf).doc_ids for lf in leaves])
        u, cnt = np.unique(matched, return_counts=True)
        nmatch = cnt[np.searchsorted(u, docs)]
        vals, valid = engine.index.docvalues_for_docs(msm_field, docs)
        need = np.floor_divide(
            vals, float(msm_divisor), where=valid, out=np.full_like(vals, np.inf)
        )
        keep = valid & (nmatch >= np.maximum(need, 1.0))
        docs, scores = docs[keep], scores[keep]
    docs, scores, _ext = select_top_k(
        engine.index, docs, scores, engine.params.top_k
    )
    return pa.table(
        {
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pc.round(pa.array(scores, pa.float64()), ndigits=6),
        }
    )


def match_phrase_prefix(
    engine, qid: str, phrase: str, max_expansions: int = 50
) -> pa.Table:
    """ES ``match_phrase_prefix``: analyze the phrase, expand the LAST
    token as a prefix against the term dictionary in sorted term order
    capped at ``max_expansions`` (the ES cap; Lucene enumerates the
    term dictionary in exactly this order), and evaluate the phrase as
    ``#NEAR/1(t1..tn-1, #SYN(expansions))`` — the Lucene
    ``MultiPhraseQuery`` shape, scored under the engine's model with
    derived-list statistics. Stopwords analyze away and the surviving
    tokens form the adjacency chain (the repo-wide phrase convention).
    No expansion -> an empty result, like ES. The final token must
    survive analysis (a stopword prefix raises: nothing to expand)."""
    if max_expansions < 1:
        raise ValueError(f"max_expansions must be >= 1, got {max_expansions}")
    raw = phrase.split()
    if not raw:
        raise ValueError("empty phrase")
    head: list[str] = []
    for tok in raw[:-1]:
        head.extend(engine._analyze(tok))
    last = engine._analyze(raw[-1])
    if len(last) != 1:
        raise ValueError(
            f"phrase-prefix token {raw[-1]!r} analyzes to {last} — the "
            "prefix must survive analysis as one token"
        )
    prefix = last[0]
    field = "body"
    vocab = sorted(
        t for (_f, t) in engine.index.vocabulary(field)
        if t.startswith(prefix)
    )[:max_expansions]
    n = 0
    if vocab:
        syn = "#syn( " + " ".join(vocab) + " )"
        q = (
            f"#near/1( {' '.join(head)} {syn} )" if head else syn
        )
        t = engine.search(qid, q)
        n = t.num_rows
    if n == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "score_r": pa.array([], pa.float64()),
            }
        )
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "score_r": pc.round(t.column("score"), ndigits=6),
        }
    )


def multi_match(
    engine,
    qid: str,
    query: str,
    fields: list[str],
    match_type: str = "best_fields",
    tie_breaker: float = 0.0,
) -> pa.Table:
    """ES ``multi_match``: one analyzed query run against several fields.

    - ``best_fields`` (the ES default): a per-FIELD leg (the query's
      #SUM against that field) combined under dis_max with
      ``tie_breaker`` — desugars to
      ``#DISMAX/t(#SUM(q.f1...), #SUM(q.f2...))``, the gated #DISMAX
      machinery.
    - ``most_fields``: the per-field legs simply sum —
      ``#SUM(t1.f1 t1.f2 t2.f1 ...)`` in (term, field) order, each leg
      scored with its own field statistics (the documented ES behavior).
    - ``cross_fields``: blended per-term statistics ACROSS fields is a
      different scoring model, implemented (and gated) as BM25F in
      ``bm25f.py`` — requesting it here raises with that pointer rather
      than shipping a subtly-wrong desugaring.

    The tie_breaker rides the #DISMAX integer-percent suffix, so only
    multiples of 0.01 in [0, 1] are representable — exactly the gated
    operator's contract."""
    toks: list[str] = []
    for raw in query.split():
        toks.extend(engine._analyze(raw))
    if not toks:
        raise ValueError(f"query {query!r} analyzes to nothing")
    if not fields:
        raise ValueError("multi_match needs at least one field")
    if match_type == "cross_fields":
        raise ValueError(
            "cross_fields blends term statistics across fields — use "
            "bm25f.bm25f_search (the gated BM25F implementation)"
        )
    if match_type == "best_fields":
        tie = int(round(tie_breaker * 100))
        if not 0 <= tie <= 100 or abs(tie - tie_breaker * 100) > 1e-9:
            raise ValueError(
                f"tie_breaker {tie_breaker} must be a multiple of 0.01 "
                "in [0, 1] (#DISMAX integer-percent suffix)"
            )
        legs = []
        for f in fields:
            inner = " ".join(f"{t}.{f}" for t in toks)
            legs.append(f"#sum( {inner} )" if len(toks) > 1 else inner)
        q = f"#dismax/{tie}( {' '.join(legs)} )"
    elif match_type == "most_fields":
        inner = " ".join(f"{t}.{f}" for t in toks for f in fields)
        q = f"#sum( {inner} )"
    else:
        raise ValueError(
            f"unknown multi_match type {match_type!r} "
            "(best_fields | most_fields | cross_fields)"
        )
    return engine.search(qid, q)


def has_child_search(
    engine,
    qid: str,
    query: str,
    score_mode: str = "max",
    min_children: int = 1,
    max_children: "int | None" = None,
) -> pa.Table:
    """ES ``has_child`` over a join field: documents are the children,
    their ``source`` (from the corpus doc values / docmap derivation) is
    the parent entity — return PARENTS whose matching-child count lies
    in [min_children, max_children], scored by the children's scores
    under ``score_mode`` (max | sum | avg | min | none, the ES set;
    ``none`` scores 0.0 — the filter form). This is the JOIN-FIELD
    (same-shard routed) semantics, not Lucene nested block-join: parents
    are routed with their children (here: derived from them), so the
    aggregation is shard-local per parent — the documented ES routing
    requirement for join fields.

    avg is computed as the one double division sum/n after an exact
    child-order sum (children sort by doc_id before folding, so the
    accumulation order is deterministic and the oracle replays it).

    Returns (parent, n_children, score_r) ordered (score desc, parent
    asc)."""
    if score_mode not in ("max", "sum", "avg", "min", "none"):
        raise ValueError(
            f"unknown score_mode {score_mode!r} (max|sum|avg|min|none)"
        )
    if min_children < 1:
        raise ValueError("min_children must be >= 1")
    t = engine.search(qid, query)
    docs = t.column("doc_id").to_numpy()
    scores = t.column("score").to_numpy()
    order = np.argsort(docs, kind="stable")
    docs, scores = docs[order], scores[order]
    parents = _parent_keys(engine.index, docs)
    up, inv = np.unique(parents, return_inverse=True)
    n = np.bincount(inv, minlength=len(up))
    out_p, out_n, out_s = [], [], []
    for i, p in enumerate(up):
        if n[i] < min_children:
            continue
        if max_children is not None and n[i] > max_children:
            continue
        cs = scores[inv == i]  # doc_id-ascending within the parent
        if score_mode == "max":
            s = float(np.max(cs))
        elif score_mode == "min":
            s = float(np.min(cs))
        elif score_mode == "none":
            s = 0.0
        else:
            acc = 0.0
            for v in cs:  # fixed child order -> exact replay
                acc += float(v)
            s = acc / len(cs) if score_mode == "avg" else acc
        out_p.append(str(p))
        out_n.append(int(n[i]))
        out_s.append(round(s, 6))
    idx = sorted(range(len(out_p)), key=lambda i: (-out_s[i], out_p[i]))
    return pa.table(
        {
            "parent": pa.array([out_p[i] for i in idx], pa.string()),
            "n_children": pa.array([out_n[i] for i in idx], pa.int64()),
            "score_r": pa.array([out_s[i] for i in idx], pa.float64()),
        }
    )


def has_parent_search(
    engine, qid: str, query: str, parent_min_children: int
) -> pa.Table:
    """ES ``has_parent``: return CHILD documents whose parent satisfies
    a parent-level predicate — here "the parent has at least
    ``parent_min_children`` children matching the query" (parent
    attributes in this corpus are aggregates of their children; a
    parent-field predicate would be the same shape with a docvalues
    read). Child scores are UNTOUCHED (the ES default score=false form:
    parent matching is a filter). Returns (doc_id, parent, score_r) in
    (score desc, doc_id asc) order."""
    if parent_min_children < 1:
        raise ValueError("parent_min_children must be >= 1")
    t = engine.search(qid, query)
    docs = t.column("doc_id").to_numpy()
    scores = t.column("score").to_numpy()
    parents = _parent_keys(engine.index, docs)
    up, inv = np.unique(parents, return_inverse=True)
    n = np.bincount(inv, minlength=len(up))
    keep = n[inv] >= parent_min_children
    docs, scores, parents = docs[keep], scores[keep], parents[keep]
    order = np.lexsort((docs, -scores))
    return pa.table(
        {
            "doc_id": pa.array(docs[order], pa.int64()),
            "parent": pa.array(
                [str(p) for p in parents[order]], pa.string()
            ),
            "score_r": pc.round(
                pa.array(scores[order], pa.float64()), ndigits=6
            ),
        }
    )


def _parent_keys(index, docs: np.ndarray) -> np.ndarray:
    """The join-field parent of each doc: its corpus ``source`` value,
    read through the docmap external-id derivation (external ids embed
    the source prefix — '<source>/...'), so no extra I/O."""
    exts = index.external_ids(np.asarray(docs, dtype=np.int64))
    return np.asarray([str(e).split("/", 1)[0] for e in exts], dtype=object)


def matched_queries_search(
    engine, qid: str, clauses: "dict[str, str]"
) -> pa.Table:
    """ES named queries / ``matched_queries``: every should-clause
    carries a ``_name``; each hit reports WHICH named clauses it matched
    alongside its normal disjunction score (scoring untouched — names
    are pure metadata, the ES rule). Clauses are query-language strings
    (terms or derived lists, the msm clause contract). The matched-name
    list is rendered in sorted-name order as a comma-joined string so
    the column hashes deterministically and the oracle rebuilds it with
    a fixed concat_ws over per-name membership predicates.

    Returns (doc_id, score_r, matched) for the full match set."""
    from .engine import Evaluator, select_top_k
    from .qryparse import Op

    if not clauses:
        raise ValueError("matched_queries needs at least one named clause")
    names = sorted(clauses)
    leaves = []
    for nm in names:
        lf = engine._parse_clause(clauses[nm])
        if not getattr(lf, "is_iop", False):
            raise ValueError(
                f"named clause {nm!r} must be a term or derived list"
            )
        leaves.append(lf)
    ev = Evaluator(engine.index, engine.params)
    tree = Op("#sum", args=[Op("#score", args=[lf]) for lf in leaves])
    docs, scores = ev.evaluate(tree)
    docs, scores, _ext = select_top_k(
        engine.index, docs, scores, engine.params.top_k
    )
    # membership on the final (post-top-k) doc order; iop() is cached
    member = [
        np.isin(docs, ev.iop(lf).doc_ids) for lf in leaves
    ]
    matched = [
        ",".join(nm for nm, m in zip(names, row) if m)
        for row in zip(*[m.tolist() for m in member])
    ]
    return pa.table(
        {
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pc.round(pa.array(scores, pa.float64()), ndigits=6),
            "matched": pa.array(matched, pa.string()),
        }
    )


def sliced_scroll(
    engine, qid: str, query: str, slice_id: int, n_slices: int
) -> pa.Table:
    """ES sliced scroll (the parallel-export / reindex primitive): the
    query's match set split into ``n_slices`` disjoint slices by a
    deterministic hash of the document id — slice i can stream
    independently on its own worker, and the union of all slices is
    exactly the full result (no duplicates, no gaps; ES slices on
    murmur3(_id), here splitmix64(doc_id, seed=n_slices) so the routing
    replays in SQL via the pinned hash chain). Scores ride along
    untouched. Returns (doc_id, slice_id, score_r) in (score desc,
    doc_id asc) order within the slice."""
    from .sketch import _hash64

    if n_slices < 1:
        raise ValueError(f"n_slices must be >= 1, got {n_slices}")
    if not 0 <= slice_id < n_slices:
        raise ValueError(f"slice_id {slice_id} not in [0, {n_slices})")
    t = engine.search(qid, query)
    docs = t.column("doc_id").to_numpy()
    scores = t.column("score").to_numpy()
    sl = (_hash64(docs.astype(np.int64), n_slices)
          % np.uint64(n_slices)).astype(np.int64)
    keep = sl == slice_id
    docs, scores = docs[keep], scores[keep]
    order = np.lexsort((docs, -scores))
    return pa.table(
        {
            "doc_id": pa.array(docs[order], pa.int64()),
            "slice_id": pa.array(
                np.full(int(keep.sum()), slice_id, dtype=np.int64)
            ),
            "score_r": pc.round(
                pa.array(scores[order], pa.float64()), ndigits=6
            ),
        }
    )
