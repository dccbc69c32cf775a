"""Index sorting + early-terminating field-sorted collection — the
Lucene index-sorting / ``TopFieldCollector`` early-termination analog
(Lucene ``IndexWriterConfig.setIndexSort`` + sorted-segment early
termination; ES ``sort`` with ``index.sort.field``).

Lucene computes a per-SEGMENT doc order from doc values at flush time
and stores it so query-time field sorts become first-k scans instead of
per-query sorts. The analog here: :func:`sort_order` computes (once per
(field, direction), cached on the opened ``InvertedIndex`` — the flush
analog; a build-time persisted sortmap would be the same array written
to parquet) the shard's doc ids ordered by (value, external-id rank),
missing-field docs last (the ES ``missing: _last`` default). Query-time
field sort then:

- evaluates the query membership as usual (the batch evaluator already
  produces the full match set),
- walks the precomputed order in CHUNKS, membership-testing each chunk
  and stopping as soon as k hits are collected — the early-termination
  visit count is ~k·n/|matches| rather than n, and no per-query sort
  ever happens (``visited`` is returned so tests can assert the
  early-out actually bites),
- merges per-shard first-k lists by (value, ext rank) and cuts k — the
  per-segment collect + coordinator merge Lucene/ES run, exact because
  each shard's unvisited docs sort strictly after its k collected ones.

``sorted_search_after`` adds the ES sort+search_after combo: a
(value, external_id) cursor filters strictly-after rows BEFORE the
first-k scan, so deep pagination stays a k-bounded scan per page.

Scale shape: the order array is per-shard state (bounded by the shard's
doc count, same as the docmap arrays already held), built from the lazy
doc-values loader; queries do no sorting and ship k rows per shard.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_CHUNK = 4096


def sort_order(index, field: str, descending: bool = True) -> np.ndarray:
    """Shard doc ids ordered by (field value asc|desc, external-id rank
    asc), missing-field docs LAST (by ext rank among themselves) — the
    per-segment sorted-doc-id array Lucene stores for index sorts.
    Cached on the index per (field, direction)."""
    return _sortmap(index, field, descending)[0]


def _sortmap(
    index, field: str, descending: bool
) -> "tuple[np.ndarray, np.ndarray, int]":
    """(sorted doc ids, their values aligned, count of docs WITH the
    field) — the values ride along so cursor pagination can binary-search
    the sort order instead of re-reading doc values O(n) per page."""
    cache = getattr(index, "_sortmap_cache", None)
    if cache is None:
        cache = index._sortmap_cache = {}
    key = (field, descending)
    if key not in cache:
        docs = index.all_doc_ids()
        vals, valid = index.docvalues_for_docs(field, docs)
        ext = index.ext_ranks(docs)
        v = np.where(valid, vals, 0.0)
        primary = -v if descending else v
        # lexsort: last key is most significant — missing-last, then
        # value, then ext rank
        order = np.lexsort((ext, primary, (~valid).astype(np.int8)))
        cache[key] = (docs[order], vals[order], int(valid.sum()))
    return cache[key]


def _first_k_matches(
    sorted_ids: np.ndarray, member_sorted: np.ndarray, k: int
) -> "tuple[np.ndarray, int]":
    """First k ids of ``sorted_ids`` present in ``member_sorted`` (a
    SORTED id array), scanning in chunks and stopping early. Returns
    (hits in sorted order, number of ids visited)."""
    hits: list[np.ndarray] = []
    got = 0
    visited = 0
    for lo in range(0, len(sorted_ids), _CHUNK):
        chunk = sorted_ids[lo: lo + _CHUNK]
        visited += len(chunk)
        pos = np.searchsorted(member_sorted, chunk)
        pos_c = np.minimum(pos, max(len(member_sorted) - 1, 0))
        m = (
            (pos < len(member_sorted)) & (member_sorted[pos_c] == chunk)
            if len(member_sorted)
            else np.zeros(len(chunk), dtype=bool)
        )
        if m.any():
            h = chunk[m]
            hits.append(h[: k - got])
            got += min(len(h), k - got)
            if got >= k:
                break
    if not hits:
        return np.empty(0, np.int64), visited
    return np.concatenate(hits), visited


def sorted_search(
    engine,
    qid: str,
    query: str,
    field: str,
    descending: bool = True,
    k: int = 10,
    _after: "tuple[float, str] | None" = None,
) -> pa.Table:
    """Field-sorted top-k of the query's match set — ES ``sort`` on a
    numeric field (score ignored; ES computes none unless asked), ties
    by external id, missing-field docs last. Returns (doc_id, sort_val,
    rn) with ``sort_val`` the doc-values number as int64 (the corpus
    numeric columns are integral; a fractional value raises loudly
    rather than hashing a float).

    ``_after`` is the (value, external_id) cursor used by
    :func:`sorted_search_after`."""
    from .engine import Evaluator

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    index = engine.index
    tree = engine.parse(query)
    ev = Evaluator(index, engine.params)
    docs, _scores = ev.evaluate(tree)
    member = np.sort(np.asarray(docs, dtype=np.int64))
    order_ids, order_vals, n_valid = _sortmap(index, field, descending)
    if _after is not None:
        # Cursor positioning is a BINARY SEARCH over the cached sorted
        # values (k-bounded page cost, no O(n) doc-values re-read):
        # find the cursor's value run, linear-scan only that tie run for
        # external_id > cursor (run length = duplicate count), and slice
        # the order past it. Missing-field docs sit beyond n_valid and
        # are never paginated into (they have no cursor value).
        av, aext = float(_after[0]), str(_after[1])
        srt = -order_vals[:n_valid] if descending else order_vals[:n_valid]
        pivot = -av if descending else av
        run_lo = int(np.searchsorted(srt, pivot, side="left"))
        run_hi = int(np.searchsorted(srt, pivot, side="right"))
        start = run_hi  # default: cursor value absent or run exhausted
        if run_lo < run_hi:
            run_exts = index.external_ids(
                order_ids[run_lo:run_hi]
            ).astype(str)
            after_in_run = np.flatnonzero(run_exts > aext)
            if len(after_in_run):
                start = run_lo + int(after_in_run[0])
        order_ids = order_ids[start:n_valid]
    hits, visited = _first_k_matches(order_ids, member, k)
    vals, valid = index.docvalues_for_docs(field, hits)
    if len(hits) and not valid.all():
        # missing-field docs only appear when matches < k; their sort
        # value has no number — represent as NULL-free sentinel raise,
        # the gate queries keep k within the valid span
        raise ValueError(
            f"sorted_search: top-{k} window reached docs missing "
            f"{field!r}; shrink k or filter the query"
        )
    ints = vals.astype(np.int64)
    if len(hits) and not np.array_equal(ints.astype(np.float64), vals):
        raise ValueError(f"doc-values column {field!r} is not integral")
    t = pa.table(
        {
            "doc_id": pa.array(hits, pa.int64()),
            "sort_val": pa.array(ints, pa.int64()),
            "rn": pa.array(np.arange(1, len(hits) + 1, dtype=np.int64)),
        }
    )
    t = t.replace_schema_metadata({b"visited": str(visited).encode()})
    return t


def sorted_search_after(
    engine,
    qid: str,
    query: str,
    field: str,
    after_value: float,
    after_external_id: str,
    descending: bool = True,
    k: int = 10,
) -> pa.Table:
    """ES ``sort`` + ``search_after``: the page strictly after the
    (after_value, after_external_id) cursor in (field desc|asc,
    external_id asc) order — deep pagination as a k-bounded scan of the
    precomputed sort order, no offset accumulation."""
    return sorted_search(
        engine, qid, query, field, descending=descending, k=k,
        _after=(after_value, after_external_id),
    )
