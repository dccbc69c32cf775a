"""Query evaluation: inverted-list operators + score operators, vectorized.

Re-expresses the reference's document-at-a-time machinery (`Homeworks/HW6/
QryEval/Qry.java:255-355`, QryIop*/QrySop*) as numpy array algebra over
decoded posting lists. Semantics are ported exactly, including the flagged
quirks (SURVEY.md §7 "hard parts"):

- #NEAR/n: ordered, each arg position consumed once per match, fail test is
  ``cur - prev > n`` (`QryIopNear.java:63`), emitted position = last arg's
  (`QryIopNear.java:71`);
- #WINDOW/n: unordered, match iff ``max - min < n`` STRICT
  (`QryIopWindow.java:60`), emit max, advance all, else advance past min;
- #SYN: positional union, positions concatenated then sorted
  (`QryIopSyn.java:56-69`);
- Indri #OR returns ``prod(1 - s_i)`` — the conventional complement is
  missing in the reference (`QrySopOr.java:75-95`); reproduced as-is;
- BM25 k_3 is read but never applied (`QrySopScore.java:114-133`);
- score accumulation follows argument order (Java loop order) so floats are
  bit-reproducible against the pure-Python oracle.

Derived inverted lists (#NEAR/#WINDOW/#SYN outputs) carry their own df/ctf,
used by BM25/Indri scoring (`QrySopScore.java:123-124, 89-90`) — at
multi-shard scale those statistics must be globally aggregated before
scoring (two-phase evaluation; see engine.evaluate_sharded).
"""

from __future__ import annotations

from functools import reduce

import numpy as np

from .config import ModelParams
from .indexio import EMPTY_POSTINGS, InvertedIndex, Postings
from .qryparse import Op, Term

# ---------------------------------------------------------------------------
# Inverted-list (QryIop) evaluation -> Postings
# ---------------------------------------------------------------------------


def eval_iop(node, index: InvertedIndex, need_positions: bool = True) -> Postings:
    """``need_positions=False`` lets pure-scoring consumers (#SCORE leaves —
    tf/df/ctf only) skip position decode/merge; positional parents always
    request their children's positions."""
    if isinstance(node, Term):
        return index.postings(node.field, node.term, need_positions=need_positions)
    if node.name == "#syn":
        return _eval_syn(
            [eval_iop(a, index, need_positions) for a in node.args],
            need_positions,
        )
    if node.name == "#near":
        return _eval_near([eval_iop(a, index, True) for a in node.args], node.dist)
    if node.name == "#window":
        return _eval_window_vectorized(
            [eval_iop(a, index, True) for a in node.args], node.dist
        )
    if node.name in ("#fuzzy", "#dfuzzy", "#prefix", "#wildcard", "#regexp"):
        return _eval_expansion(node, index, need_positions)
    if node.name == "#ordered":
        return _eval_ordered(
            [eval_iop(a, index, True) for a in node.args], node.dist
        )
    if node.name == "#unordered":
        return _eval_unordered(
            [eval_iop(a, index, True) for a in node.args], node.dist
        )
    if node.name == "#spanfirst":
        return _eval_spanfirst(eval_iop(node.args[0], index, True), node.dist)
    if node.name == "#spannot":
        return _eval_spannot(
            [eval_iop(a, index, True) for a in node.args], node.dist
        )
    raise ValueError(f"not an inverted-list operator: {node.name}")


def _levenshtein_all(q: str, terms: list[str]) -> np.ndarray:
    """Edit distance from ``q`` to EVERY term at once: Wagner-Fischer with
    the candidate axis vectorized (the big axis — a term dictionary), DP
    cells looped (bounded by max term length). Returns int64 distances."""
    if not terms:
        return np.zeros(0, dtype=np.int64)
    lens = np.asarray([len(t) for t in terms], dtype=np.int64)
    L = int(lens.max())
    arr = np.zeros((len(terms), L), dtype=np.uint32)
    for i, t in enumerate(terms):
        arr[i, : len(t)] = np.frombuffer(
            t.encode("utf-32-le"), dtype=np.uint32
        )
    prev = np.tile(np.arange(L + 1, dtype=np.int64), (len(terms), 1))
    for i, ch in enumerate(q, 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        sub = prev[:, :-1] + (arr != ord(ch))
        dele = prev[:, 1:] + 1
        for j in range(1, L + 1):  # cur[j-1] dependency is inherently serial
            cur[:, j] = np.minimum(
                np.minimum(dele[:, j - 1], sub[:, j - 1]), cur[:, j - 1] + 1
            )
        prev = cur
    return prev[np.arange(len(terms)), lens]


def _damerau(a: str, b: str) -> int:
    """UNRESTRICTED Damerau-Levenshtein (Lowrance-Wagner: transposition
    of ADJACENT-after-deletions characters counts 1, unlike the
    restricted/OSA variant) — chosen because it is exactly what DuckDB's
    ``damerau_levenshtein`` computes, so the #DFUZZY oracle replays the
    distance function verbatim. Per-pair O(|a|·|b|); the dictionary axis
    stays bounded like every expansion op (shard vocabulary scan)."""
    da: dict[str, int] = {}
    maxdist = len(a) + len(b)
    d = np.zeros((len(a) + 2, len(b) + 2), dtype=np.int64)
    d[0, 0] = maxdist
    for i in range(len(a) + 1):
        d[i + 1, 0] = maxdist
        d[i + 1, 1] = i
    for j in range(len(b) + 1):
        d[0, j + 1] = maxdist
        d[1, j + 1] = j
    for i in range(1, len(a) + 1):
        db = 0
        for j in range(1, len(b) + 1):
            k = da.get(b[j - 1], 0)
            l = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1, j + 1] = min(
                d[i, j] + cost,          # substitute / match
                d[i + 1, j] + 1,         # insert
                d[i, j + 1] + 1,         # delete
                d[k, l] + (i - k - 1) + 1 + (j - l - 1),  # transpose
            )
        da[a[i - 1]] = i
    return int(d[len(a) + 1, len(b) + 1])


def _damerau_all(q: str, terms: list[str]) -> np.ndarray:
    return np.asarray([_damerau(q, t) for t in terms], dtype=np.int64)


def _wildcard_to_regex(pat: str) -> str:
    """Lucene WildcardQuery syntax -> RE2: ``*`` = any sequence, ``?`` = one
    char, everything else literal (escaped)."""
    import re as _re

    out = []
    for ch in pat:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(_re.escape(ch))
    return "".join(out)


def _regex_matches(pattern: str, vocab: list[str]) -> list[str]:
    """Full-match ``pattern`` against the vocabulary with RE2 (pyarrow's
    regex engine — the SAME engine DuckDB uses, so the oracle's
    ``regexp_full_match`` agrees on every corner of the syntax)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if not vocab:
        return []
    mask = pc.match_substring_regex(
        pa.array(vocab, type=pa.string()), f"^(?:{pattern})$"
    )
    return [t for t, m in zip(vocab, mask.to_pylist()) if m]


def _eval_expansion(node, index: InvertedIndex, need_positions: bool) -> Postings:
    """#FUZZY/n, #PREFIX, #WILDCARD, #REGEXP: Lucene's FuzzyQuery /
    PrefixQuery / WildcardQuery / RegexpQuery as dictionary expansions
    rewritten onto #SYN (Lucene rewrites these
    MultiTermQueries against the term dictionary the same way; the
    analyzed arg expands against INDEXED terms, so stopwords and
    stemming behave identically to any other leaf). ``#fuzzy`` matches
    vocabulary terms within Levenshtein distance n (n=0 or omitted ->
    Lucene's default maxEdits=2); ``#prefix`` matches terms starting
    with the arg; ``#wildcard`` matches ``*``/``?`` glob patterns and
    ``#regexp`` anchored RE2 regular expressions (raw, un-analyzed
    patterns — see qryparse.RAW_PATTERN_OPS — matched with pyarrow's RE2,
    the same engine as the DuckDB oracle's ``regexp_full_match``).
    Multi-arg = bag union of every arg's expansion (tf
    sums where expansions overlap, like #SYN of duplicate terms).

    Sharding note: expansion against a shard's local vocabulary equals
    the local restriction of the global expansion — a term missing from
    a shard's dictionary has no local postings by definition — so
    doc-sharded serving needs no extra coordination beyond the derived-
    list df/ctf all-reduce every #SYN-shaped list already gets.
    """
    parts: list[Postings] = []
    for a in node.args:
        if not isinstance(a, Term):
            raise ValueError(f"{node.name} takes plain term arguments")
        vocab = [t for (_f, t) in index.vocabulary(a.field)]
        if node.name == "#prefix":
            matched = [t for t in vocab if t.startswith(a.term)]
        elif node.name == "#wildcard":
            matched = _regex_matches(_wildcard_to_regex(a.term), vocab)
        elif node.name == "#regexp":
            matched = _regex_matches(a.term, vocab)
        else:
            # #fuzzy: classic Levenshtein (Lucene FuzzyQuery's historical
            # default); #dfuzzy: unrestricted Damerau (the ES `fuzziness`
            # transpositions=true semantics, distance == DuckDB's
            # damerau_levenshtein so the oracle replays it verbatim)
            max_edits = node.dist if node.dist > 0 else 2
            dist_fn = (
                _damerau_all if node.name == "#dfuzzy" else _levenshtein_all
            )
            d = dist_fn(a.term, vocab)
            matched = [t for t, dd in zip(vocab, d) if dd <= max_edits]
        parts.extend(
            index.postings(a.field, t, need_positions=need_positions)
            for t in sorted(matched)
        )
    if not parts:
        return EMPTY_POSTINGS
    return _eval_syn(parts, need_positions)


def _refilter_positions(p: Postings, keep: np.ndarray) -> Postings:
    """Rebuild a derived posting list keeping only the flat positions where
    ``keep`` is True (per-doc tf recount, empty docs dropped). The result's
    df/ctf are the derived list's own statistics, like every other iop."""
    if p.df == 0:
        return EMPTY_POSTINGS
    new_tfs = np.add.reduceat(keep.astype(np.int64), p.pos_offsets[:-1])
    live = new_tfs > 0
    if not live.any():
        return EMPTY_POSTINGS
    tfs = new_tfs[live]
    pos_offsets = np.zeros(len(tfs) + 1, dtype=np.int64)
    np.cumsum(tfs, out=pos_offsets[1:])
    return _make_postings(
        p.doc_ids[live], tfs, pos_offsets, p.positions[keep]
    )


def _eval_spanfirst(p: Postings, end: int) -> Postings:
    """#SPANFIRST/n — Lucene ``SpanFirstQuery`` analog
    (`SpanFirstQuery`/`SpanPositionRangeQuery`, lucene.apache.org docs):
    keep only match positions strictly below ``n`` (term positions are the
    raw analyzer slots, stopword positions included, exactly as stored).
    Per-doc tf becomes the count of early positions; docs whose matches all
    sit at position >= n drop out. Doc-local, so doc-sharded serving needs
    no coordination beyond the usual derived df/ctf all-reduce."""
    if end < 1:
        raise ValueError("#spanfirst/n requires n >= 1")
    if p.df == 0:
        return EMPTY_POSTINGS
    return _refilter_positions(p, p.positions < end)


def _pack_doc_pos(p: Postings) -> np.ndarray:
    """Flat (doc_id << 32 | pos) uint64 keys, globally ascending (postings
    are doc- then position-ascending). Loud guard against key collision —
    internal doc ids and positions are both far below 2^31 in practice."""
    if int(p.doc_ids[-1]) >= (1 << 31) or int(p.positions.max()) >= (1 << 31):
        raise ValueError("#spannot packed key would overflow (doc/pos >= 2^31)")
    return (_as_u64(np.repeat(p.doc_ids, p.tfs)) << np.uint64(32)) | _as_u64(
        p.positions
    )


def _eval_spannot(parts: list[Postings], dist: int) -> Postings:
    """#SPANNOT/n — Lucene ``SpanNotQuery`` analog with symmetric pre/post
    slop ``n``: positions of the INCLUDE list (args[0]) survive unless some
    position of ANY exclude list (args[1:]) in the same doc lies within
    ``n`` slots (``/0`` = exact-overlap exclusion only, the SpanNot
    default). Vectorized as one packed-key (doc_id << 32 | pos) double
    searchsorted per exclude list — both lists are doc- then
    position-ascending so the packed keys are globally sorted."""
    inc = parts[0]
    if inc.df == 0:
        return EMPTY_POSTINGS
    keep = np.ones(len(inc.positions), dtype=bool)
    ki = _pack_doc_pos(inc)
    for exc in parts[1:]:
        if exc.df == 0:
            continue
        ke = _pack_doc_pos(exc)
        d = np.uint64(dist)
        # the probe window [ki-dist, ki+dist] can only underflow into doc-1's
        # key space (pos < dist), never overflow into doc+1 (pos+dist < 2^32),
        # so candidates sort as [doc-1 keys..., doc keys...]: a same-doc hit
        # exists iff the LAST candidate in range belongs to this doc
        lo = np.searchsorted(ke, np.where(ki >= d, ki - d, np.uint64(0)), "left")
        hi = np.searchsorted(ke, ki + d, "right")
        hit = hi > lo
        if hit.any():
            h = np.flatnonzero(hit)
            same_doc = (ke[hi[h] - 1] >> np.uint64(32)) == (ki[h] >> np.uint64(32))
            keep[h[same_doc]] = False
    return _refilter_positions(inc, keep)


def _eval_window_vectorized(parts: list[Postings], dist: int) -> Postings:
    """#WINDOW/n, lock-step vectorized across ALL common docs at once.

    Exactly equivalent to the reference sweep (`QryIopWindow.java:27-77`):
    per round, docs whose max-min spread is < n (strict) emit the max and
    advance every list one step; other docs advance every list whose current
    position equals the min (positions ascend within a list, so one step IS
    "advance past min"; duplicate positions — possible under #SYN(x x) —
    just take one extra round). Rounds are numpy ops over the active docs,
    so total work is O(sum of positions), not O(docs x python-loop).
    """
    if not parts or any(p.df == 0 for p in parts):
        return EMPTY_POSTINGS
    common = reduce(np.intersect1d, [p.doc_ids for p in parts])
    if len(common) == 0:
        return EMPTY_POSTINGS
    k = len(parts)
    D = len(common)
    ptr = np.empty((D, k), dtype=np.int64)
    end = np.empty((D, k), dtype=np.int64)
    for j, p in enumerate(parts):
        ix = np.searchsorted(p.doc_ids, common)
        ptr[:, j] = p.pos_offsets[ix]
        end[:, j] = p.pos_offsets[ix + 1]
    seg = [p.positions for p in parts]

    active = np.arange(D)
    out_rows: list[np.ndarray] = []
    out_pos: list[np.ndarray] = []
    cur = np.empty((D, k), dtype=np.int64)
    while len(active):
        pa_ = ptr[active]
        for j in range(k):
            cur[: len(active), j] = seg[j][pa_[:, j]]
        c = cur[: len(active)]
        mn = c.min(axis=1)
        mx = c.max(axis=1)
        matched = (mx - mn) < dist
        if matched.any():
            out_rows.append(active[matched])
            out_pos.append(mx[matched])
        adv = matched[:, None] | (c == mn[:, None])
        pa_ = pa_ + adv
        ptr[active] = pa_
        alive = (pa_ < end[active]).all(axis=1)
        active = active[alive]
    if not out_rows:
        return EMPTY_POSTINGS
    rows = np.concatenate(out_rows)
    poss = np.concatenate(out_pos)
    order = np.argsort(rows, kind="stable")  # per-doc emit order is ascending
    rows, poss = rows[order], poss[order]
    doc_rows, tfs = np.unique(rows, return_counts=True)
    pos_offsets = np.zeros(len(doc_rows) + 1, dtype=np.int64)
    np.cumsum(tfs, out=pos_offsets[1:])
    return _make_postings(
        common[doc_rows], tfs.astype(np.int64), pos_offsets, poss
    )


def _make_postings(doc_ids, tfs, pos_offsets, positions) -> Postings:
    return Postings(
        doc_ids=doc_ids,
        tfs=tfs,
        pos_offsets=pos_offsets,
        positions=positions,
        df=len(doc_ids),
        ctf=int(tfs.sum()) if len(tfs) else 0,
    )


def _as_u64(a: np.ndarray) -> np.ndarray:
    """Zero-copy uint64 reinterpret when possible (non-negative int64)."""
    return a.view(np.uint64) if a.dtype == np.int64 else a.astype(np.uint64)


def _eval_syn(parts: list[Postings], need_positions: bool = True) -> Postings:
    """Union; per-doc positions = concatenation of all args', sorted.

    One radix-friendly sort of packed (doc << 32 | pos) keys instead of a
    two-key lexsort + gather (positions fit 32 bits by construction). When
    the caller only scores (tf/df/ctf), the position merge is skipped
    entirely — a doc/tf union via bincount."""
    parts = [p for p in parts if p.df > 0]
    if not parts:
        return EMPTY_POSTINGS
    if not need_positions:
        doc_all = np.concatenate([p.doc_ids for p in parts])
        tf_all = np.concatenate([p.tfs for p in parts])
        docs, inv = np.unique(doc_all, return_inverse=True)
        tfs = np.bincount(inv, weights=tf_all.astype(np.float64)).astype(np.int64)
        return Postings(
            doc_ids=docs, tfs=tfs, pos_offsets=None, positions=None,
            df=len(docs), ctf=int(tfs.sum()),
        )
    max_doc = max(int(p.doc_ids[-1]) for p in parts)
    if max_doc < 1 << 32:
        # .view (not .astype): doc ids/positions are non-negative int64, so
        # reinterpreting as uint64 is free — astype copies were >60% of the
        # runtime on 1M-doc unions
        key = np.concatenate(
            [
                (np.repeat(p.doc_ids, p.tfs).view(np.uint64) << np.uint64(32))
                | _as_u64(p.positions)
                for p in parts
            ]
        )
        key.sort(kind="stable")  # timsort gallops over the pre-sorted runs
        doc_all = (key >> np.uint64(32)).view(np.int64)
        pos_all = (key & np.uint64(0xFFFFFFFF)).view(np.int64)
    else:
        # shard-local ids normally fit 32 bits; past that the packed-key
        # radix trick would truncate, so fall back to a two-key lexsort
        doc_all = np.concatenate([np.repeat(p.doc_ids, p.tfs) for p in parts])
        pos_all = np.concatenate([p.positions.astype(np.int64) for p in parts])
        order = np.lexsort((pos_all, doc_all))
        doc_all = doc_all[order]
        pos_all = pos_all[order]
    change = np.empty(len(doc_all), dtype=bool)
    change[0] = True
    change[1:] = doc_all[1:] != doc_all[:-1]
    starts = np.flatnonzero(change)
    tfs = np.diff(np.append(starts, len(doc_all))).astype(np.int64)
    pos_offsets = np.zeros(len(starts) + 1, dtype=np.int64)
    np.cumsum(tfs, out=pos_offsets[1:])
    return _make_postings(doc_all[starts], tfs, pos_offsets, pos_all)


def _eval_ordered(parts: list[Postings], max_gaps: int) -> Postings:
    """#ORDERED/g — the Lucene/ES ``intervals`` query's ``ordered`` rule
    with ``max_gaps`` (intervals docs, lucene.apache.org ``IntervalsSource``;
    MINIMAL-interval semantics per Clarke et al. / Vigna): enumerate the
    minimal intervals [s, e] containing the k args IN ORDER (an interval
    is minimal iff it contains no smaller qualifying interval), keep those
    whose gap count (e - s + 1 - k) <= g. Differs from #NEAR/n, which
    bounds each ADJACENT pair's distance and consumes positions; a
    "hash X Y join" span matches #ORDERED/2 but not #NEAR/1.

    Enumeration is the standard two-pass walk per doc: forward-chain the
    smallest end, backward-tighten the start, emit, restart past the
    start — each args' positions are visited once, O(total positions)
    per doc. Docs = the k-way intersection (bounded), so the per-doc loop
    runs on candidate docs only; emitted positions are interval ENDS
    (the #NEAR convention), df/ctf are the derived list's own.

    ``max_gaps=0`` (bare #ORDERED) is the exact-phrase special case.
    """
    if max_gaps < 0:
        raise ValueError(f"#ORDERED/{max_gaps}: max_gaps must be >= 0")
    if not parts or any(p.df == 0 for p in parts):
        return EMPTY_POSTINGS
    if len(parts) < 2:
        raise ValueError("#ORDERED needs at least 2 arguments")
    common = reduce(np.intersect1d, [p.doc_ids for p in parts])
    if len(common) == 0:
        return EMPTY_POSTINGS
    rows = [np.searchsorted(p.doc_ids, common) for p in parts]
    k = len(parts)
    out_docs: list[int] = []
    out_tfs: list[int] = []
    out_pos: list[np.ndarray] = []
    for di in range(len(common)):
        pos = [p.positions_for(int(rows[j][di])) for j, p in enumerate(parts)]
        ends: list[int] = []
        i0 = 0
        p0 = pos[0]
        while i0 < len(p0):
            # forward: smallest qualifying end for a chain starting >= p0[i0]
            prev = p0[i0]
            ok = True
            chain_end = prev
            for j in range(1, k):
                nxt = np.searchsorted(pos[j], prev, side="right")
                if nxt >= len(pos[j]):
                    ok = False
                    break
                prev = pos[j][nxt]
                chain_end = prev
            if not ok:
                break
            # backward: tighten each arg to its largest position < the
            # successor's, making the interval minimal
            b = chain_end
            for j in range(k - 2, -1, -1):
                t = np.searchsorted(pos[j], b, side="left") - 1
                b = pos[j][t]
                if j == 0:
                    start = int(b)
            if (int(chain_end) - start + 1 - k) <= max_gaps:
                ends.append(int(chain_end))
            # restart strictly past the tightened start
            i0 = int(np.searchsorted(p0, start, side="right"))
        if ends:
            out_docs.append(int(common[di]))
            out_tfs.append(len(ends))
            out_pos.append(np.asarray(ends, dtype=np.int64))
    if not out_docs:
        return EMPTY_POSTINGS
    tfs = np.asarray(out_tfs, dtype=np.int64)
    pos_offsets = np.zeros(len(tfs) + 1, dtype=np.int64)
    np.cumsum(tfs, out=pos_offsets[1:])
    return _make_postings(
        np.asarray(out_docs, dtype=np.int64), tfs, pos_offsets,
        np.concatenate(out_pos),
    )


def _eval_unordered(parts: list[Postings], max_gaps: int) -> Postings:
    """#UNORDERED/g — the Lucene/ES ``intervals`` query's ``unordered``
    rule with ``max_gaps``, minimal-interval semantics: minimal windows
    [s, e] containing one position of EVERY arg in any order, kept where
    (e - s + 1 - k) <= g. Differs from #WINDOW/n (the reference's strict
    max-min < n rule with consume-all-and-advance): #UNORDERED counts
    every minimal window (overlaps allowed, non-minimal enclosing windows
    never count) — for 2 args it is exactly the union of the two directed
    #ORDERED minimal sets, the identity the SQL oracle uses.

    Enumeration: the classic advance-the-minimum sweep generates one
    candidate window per step (O(total positions) per candidate doc with
    a k-ary argmin); candidates have strictly increasing starts, so the
    minimal ones are exactly those whose END is strictly below the
    running minimum of later ends (a suffix-min filter). Emits window
    ENDS; derived df/ctf; docs = the k-way intersection."""
    if max_gaps < 0:
        raise ValueError(f"#UNORDERED/{max_gaps}: max_gaps must be >= 0")
    if not parts or any(p.df == 0 for p in parts):
        return EMPTY_POSTINGS
    if len(parts) < 2:
        raise ValueError("#UNORDERED needs at least 2 arguments")
    common = reduce(np.intersect1d, [p.doc_ids for p in parts])
    if len(common) == 0:
        return EMPTY_POSTINGS
    rows = [np.searchsorted(p.doc_ids, common) for p in parts]
    k = len(parts)
    out_docs: list[int] = []
    out_tfs: list[int] = []
    out_pos: list[np.ndarray] = []
    for di in range(len(common)):
        pos = [p.positions_for(int(rows[j][di])) for j, p in enumerate(parts)]
        idx = [0] * k
        cands: list[tuple[int, int]] = []
        while True:
            cur = [pos[j][idx[j]] for j in range(k)]
            s, e = int(min(cur)), int(max(cur))
            cands.append((s, e))
            jmin = int(np.argmin(cur))
            idx[jmin] += 1
            if idx[jmin] >= len(pos[jmin]):
                break
        # starts strictly increase, so [s,e] is minimal iff no LATER
        # candidate has end <= e: suffix-min filter on ends
        ends: list[int] = []
        later_min = None
        for s, e in reversed(cands):
            if later_min is None or e < later_min:
                if (e - s + 1 - k) <= max_gaps:
                    ends.append(e)
                later_min = e
        if ends:
            ends.sort()
            out_docs.append(int(common[di]))
            out_tfs.append(len(ends))
            out_pos.append(np.asarray(ends, dtype=np.int64))
    if not out_docs:
        return EMPTY_POSTINGS
    tfs = np.asarray(out_tfs, dtype=np.int64)
    pos_offsets = np.zeros(len(tfs) + 1, dtype=np.int64)
    np.cumsum(tfs, out=pos_offsets[1:])
    return _make_postings(
        np.asarray(out_docs, dtype=np.int64), tfs, pos_offsets,
        np.concatenate(out_pos),
    )


def _eval_near(parts: list[Postings], dist: int) -> Postings:
    """#NEAR/n over common docs, lock-step vectorized for any arity (exact
    `QryIopNear.java:27-83` state machine, one transition per round across
    every active doc)."""
    if not parts or any(p.df == 0 for p in parts):
        return EMPTY_POSTINGS
    if len(parts) == 2:
        return _eval_near2_vectorized(parts, dist)
    return _eval_neark_vectorized(parts, dist)


def _eval_neark_vectorized(parts: list[Postings], dist: int) -> Postings:
    """k-arg #NEAR/n, lock-step vectorized across all common docs.

    Per-doc state is (k pointers, current stage s in 1..k-1, prev = the
    position the stage must beat). Each round applies ONE transition of
    `QryIopNear.java:27-83` to every active doc:
      stage-arg exhausted      -> doc done (locIteratorFinish)
      cur <= prev              -> advance stage arg one step
      cur - prev > dist        -> advance arg0, restart at stage 1
      else, stage+1 < k        -> prev = cur, next stage
      else (stage+1 == k)      -> match: emit cur, advance ALL args,
                                  restart at stage 1 (consume-once)
    Docs group by stage inside a round so every gather is a flat numpy
    fancy-index (k is small; the per-stage loop is O(k) python ops/round).
    """
    common = reduce(np.intersect1d, [p.doc_ids for p in parts])
    if len(common) == 0:
        return EMPTY_POSTINGS
    k = len(parts)
    m = len(common)
    idx = [np.searchsorted(p.doc_ids, common) for p in parts]
    PTR = np.vstack([p.pos_offsets[ix] for p, ix in zip(parts, idx)]).astype(
        np.int64
    )  # (k, m), mutable
    END = np.vstack([p.pos_offsets[ix + 1] for p, ix in zip(parts, idx)])
    P = [p.positions for p in parts]

    stage = np.ones(m, dtype=np.int64)
    prev = P[0][PTR[0]].astype(np.int64)
    active = np.arange(m)
    out_rows: list[np.ndarray] = []
    out_pos: list[np.ndarray] = []
    while len(active):
        s_arr = stage[active]
        cur_ptr = PTR[s_arr, active]
        alive = cur_ptr < END[s_arr, active]  # stage arg exhausted -> done
        active = active[alive]
        if not len(active):
            break
        s_arr = s_arr[alive]
        cur_ptr = cur_ptr[alive]
        cur = np.empty(len(active), dtype=np.int64)
        for s in range(1, k):
            ms = s_arr == s
            if ms.any():
                cur[ms] = P[s][cur_ptr[ms]]
        pv = prev[active]
        behind = cur <= pv
        fail = (~behind) & (cur - pv > dist)
        passed = ~(behind | fail)
        matched = passed & (s_arr + 1 == k)
        ok = passed & ~matched
        if matched.any():
            out_rows.append(active[matched])
            out_pos.append(cur[matched])
            PTR[:, active[matched]] += 1
        PTR[s_arr[behind], active[behind]] += 1
        PTR[0, active[fail]] += 1
        prev[active[ok]] = cur[ok]
        stage[active[ok]] = s_arr[ok] + 1
        restart = fail | matched
        if restart.any():
            d = active[restart]
            a0_alive = PTR[0, d] < END[0, d]  # outer `while ptr0 < len0`
            d = d[a0_alive]
            stage[d] = 1
            prev[d] = P[0][PTR[0, d]]
            dead = active[restart][~a0_alive]
            if len(dead):
                keep = ~np.isin(active, dead, assume_unique=True)
                active = active[keep]
    if not out_rows:
        return EMPTY_POSTINGS
    rows = np.concatenate(out_rows)
    poss = np.concatenate(out_pos)
    order = np.argsort(rows, kind="stable")
    rows, poss = rows[order], poss[order]
    doc_rows, tfs = np.unique(rows, return_counts=True)
    pos_offsets = np.zeros(len(doc_rows) + 1, dtype=np.int64)
    np.cumsum(tfs, out=pos_offsets[1:])
    return _make_postings(common[doc_rows], tfs.astype(np.int64), pos_offsets, poss)


def _eval_near2_vectorized(parts: list[Postings], dist: int) -> Postings:
    """2-arg #NEAR/n, lock-step vectorized across all common docs.

    Exact state machine of `QryIopNear.java:27-83` for two args, advanced
    one transition per round for every active doc:
      B <= A            -> advance B one step ("advance past prev", stepwise)
      B - A > n         -> advance A one step (distance fail)
      else              -> match: emit B, advance both (consume-once)
    Doc goes inactive when either list is exhausted (reference finishes the
    doc when the second list runs out).
    """
    pa_, pb_ = parts
    common = np.intersect1d(pa_.doc_ids, pb_.doc_ids)
    if len(common) == 0:
        return EMPTY_POSTINGS
    ia = np.searchsorted(pa_.doc_ids, common)
    ib = np.searchsorted(pb_.doc_ids, common)
    ap = pa_.pos_offsets[ia].copy()
    ae = pa_.pos_offsets[ia + 1]
    bp = pb_.pos_offsets[ib].copy()
    be = pb_.pos_offsets[ib + 1]
    A, B = pa_.positions, pb_.positions

    active = np.arange(len(common))
    out_rows: list[np.ndarray] = []
    out_pos: list[np.ndarray] = []
    while len(active):
        ca = A[ap[active]]
        cb = B[bp[active]]
        b_behind = cb <= ca
        fail = (~b_behind) & (cb - ca > dist)
        match = ~(b_behind | fail)
        if match.any():
            out_rows.append(active[match])
            out_pos.append(cb[match])
        ap[active] += (fail | match).astype(np.int64)
        bp[active] += (b_behind | match).astype(np.int64)
        alive = (ap[active] < ae[active]) & (bp[active] < be[active])
        active = active[alive]
    if not out_rows:
        return EMPTY_POSTINGS
    rows = np.concatenate(out_rows)
    poss = np.concatenate(out_pos)
    order = np.argsort(rows, kind="stable")
    rows, poss = rows[order], poss[order]
    doc_rows, tfs = np.unique(rows, return_counts=True)
    pos_offsets = np.zeros(len(doc_rows) + 1, dtype=np.int64)
    np.cumsum(tfs, out=pos_offsets[1:])
    return _make_postings(common[doc_rows], tfs.astype(np.int64), pos_offsets, poss)


def _near_positions(plists: list[np.ndarray], dist: int) -> list[int]:
    """Exact `QryIopNear.java:27-83` pointer sweep (stateful loc iterators)."""
    k = len(plists)
    ptr = [0] * k
    lens = [len(p) for p in plists]
    out: list[int] = []
    while ptr[0] < lens[0]:
        prev_id = plists[0][ptr[0]]
        found = True
        for i in range(1, k):
            pi = plists[i]
            while ptr[i] < lens[i] and pi[ptr[i]] <= prev_id:
                ptr[i] += 1
            if ptr[i] >= lens[i]:
                ptr[0] = lens[0]  # locIteratorFinish on first arg
                found = False
                break
            cur = pi[ptr[i]]
            if cur - prev_id > dist:
                ptr[0] += 1  # advance only the first arg, retry
                found = False
                break
            prev_id = cur
        if found:
            out.append(int(plists[k - 1][ptr[k - 1]]))
            for i in range(k):
                ptr[i] += 1
    return out


# ---------------------------------------------------------------------------
# Score (QrySop) evaluation -> (matching doc_ids, scores)
# ---------------------------------------------------------------------------

_MIN_DOUBLE = 4.9e-324  # Java Double.MIN_VALUE, the RankedBoolean OR seed


class Evaluator:
    """Evaluates a parsed query tree against one index under one model."""

    def __init__(self, index: InvertedIndex, params: ModelParams):
        self.index = index
        self.p = params
        self.model = params.model
        self._iop_cache: dict[int, Postings] = {}
        #: optional {(field, id(node) key): (df, ctf)} override used by the
        #: sharded two-phase path to inject GLOBAL derived-list statistics
        self.stats_override: dict = {}

    # -- inverted lists (cached per tree node) --
    def iop(self, node, need_positions: bool = False) -> Postings:
        """Score leaves only need (docs, tfs, df, ctf), so positions default
        to lazy; a cached positionless entry upgrades on demand."""
        key = id(node)
        p = self._iop_cache.get(key)
        if p is None or (need_positions and p.positions is None and p.df > 0):
            p = eval_iop(node, self.index, need_positions)
            self._iop_cache[key] = p
        return p

    def _iop_stats(self, node) -> tuple[int, int]:
        """(df, ctf) of a (possibly derived) inverted list; the sharded path
        overrides these with globally-aggregated values."""
        if id(node) in self.stats_override:
            return self.stats_override[id(node)]
        p = self.iop(node)
        # stat_* not df/ctf: with tombstoned deletes the scoring statistics
        # stay stale until expunge (Lucene docFreq semantics)
        return p.stat_df, p.stat_ctf

    # -- public entry --
    def evaluate(self, root) -> tuple[np.ndarray, np.ndarray]:
        if root is None:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        docs, scores = self.sop(root)
        return docs, scores

    # -- score-operator dispatch --
    def sop(self, node) -> tuple[np.ndarray, np.ndarray]:
        name = node.name
        model = self.model
        if name == "#score":
            return self._score_leaf(node)
        if name == "#range":
            # numeric doc-values range filter (ES range query in filter
            # context / Lucene NumericDocValues; no reference counterpart
            # — QryEval has no numeric fields): matches LIVE docs whose
            # corpus doc value lies in [lo, hi], constant score 1.0 under
            # every model (a pure filter leaf, meant for #filreq/#filrej
            # / boolean legs; values ride the CORPUS table per shard, see
            # InvertedIndex.docvalues_docs_in_range). Shard-safe: each
            # shard consults only its own doc span.
            col, lo, hi = node.args
            try:
                lo_f, hi_f = float(lo), float(hi)
            except ValueError as e:
                raise ValueError(f"#range bounds must be numeric: {e}")
            docs = self.index.docvalues_docs_in_range(col, lo_f, hi_f)
            return docs, np.ones(len(docs), np.float64)
        if name in ("#filreq", "#filrej"):
            # Indri filter operators (#filreq/#filrej, the Indri query
            # language's filter-require/filter-reject; no reference
            # counterpart — QryEval has no filters): args = (filter,
            # query), match = query docs that do (#filreq) / do not
            # (#filrej) match the filter, scores UNTOUCHED from the query
            # leg — the Elasticsearch bool-filter-context semantics (the
            # filter never contributes to the score). The query leg must
            # itself match (Indri's smoothed-belief scoring of
            # query-non-matching filter docs is deliberately not
            # reproduced — documented divergence). Shard-safe: the
            # filter test is doc-local, no cross-shard state.
            if len(node.args) != 2:
                raise ValueError(f"{name} takes exactly (filter, query)")
            fd, _ = self.sop(node.args[0])
            docs, scores = self.sop(node.args[1])
            if len(docs):
                m = np.isin(docs, fd)
                keep = m if name == "#filreq" else ~m
                docs, scores = docs[keep], scores[keep]
            return docs, scores
        if name == "#dismax":
            # Elasticsearch dis_max / multi_match best_fields analog (no
            # reference counterpart — QryEval has no disjunction-max):
            # match = union of children; score = best matching child +
            # tie * (sum of the OTHER matching children). The Indri-style
            # `/n` suffix carries the tie-breaker as an integer
            # percentage: #DISMAX/30(...) -> tie_breaker 0.30; bare
            # #DISMAX is the ES default 0 (pure best-field). Supported
            # under BM25 / RankedBoolean (child scores) / UnrankedBoolean
            # (constant 1.0) and registered models; Indri raises like the
            # reference's unsupported model/operator ladders (geo-mean
            # belief has no max-of-fields analog). Shard-safe: the
            # combine is doc-local over child scores.
            if model == "indri":
                raise ValueError("indri doesn't support the #DISMAX operator")
            if not 0 <= node.dist <= 100:
                raise ValueError(
                    f"#DISMAX/{node.dist}: tie-breaker must be 0..100 "
                    "(integer percent)"
                )
            results = [self.sop(c) for c in node.args]
            docs = reduce(np.union1d, [r[0] for r in results])
            if len(docs) == 0:
                return docs.astype(np.int64), np.empty(0, np.float64)
            if model == "unrankedboolean":
                return docs, np.ones(len(docs), np.float64)
            vals = [
                self._align(child, docs, cdocs, cscores)
                for child, (cdocs, cscores) in zip(node.args, results)
            ]
            tie = node.dist / 100.0
            best = np.full(len(docs), -np.inf)
            total = np.zeros(len(docs), np.float64)
            for v, matched in vals:
                best = np.maximum(best, np.where(matched, v, -np.inf))
                total += np.where(matched, v, 0.0)
            return docs, best + tie * (total - best)
        if name == "#constscore":
            # Elasticsearch constant_score query analog (no reference
            # counterpart): the child's match set with every score replaced
            # by a constant boost. The `/n` suffix carries the boost as an
            # integer percent (#CONSTSCORE/250 -> 2.5); bare #CONSTSCORE is
            # the ES default boost 1.0. Composes under every model — inside
            # a scoring #SUM it contributes a flat additive term, inside
            # #filreq/#andnot legs only its membership matters. Shard-safe:
            # purely doc-local.
            if node.dist < 0:
                raise ValueError("#CONSTSCORE/n: boost percent must be >= 0")
            docs, _ = self.sop(node.args[0])
            boost = (node.dist / 100.0) if node.dist else 1.0
            return docs, np.full(len(docs), boost, np.float64)
        if name == "#boosting":
            # Elasticsearch boosting query analog (no reference
            # counterpart): match set and scores of the POSITIVE leg
            # (args[0]), with docs matching ANY negative leg multiplied by
            # negative_boost — demotion without exclusion (#andnot's softer
            # sibling). The `/n` suffix carries negative_boost as an
            # integer percent in 0..100 (#BOOSTING/40 -> 0.4); bare
            # #BOOSTING is 0 (full demotion, ES's hardest allowed value).
            # Works under every model — scores are scaled post-combine, so
            # the per-model ladders never see it. Shard-safe: demotion is
            # doc-local membership against shard-local negative matches.
            if not 0 <= node.dist <= 100:
                raise ValueError(
                    f"#BOOSTING/{node.dist}: negative_boost must be 0..100 "
                    "(integer percent)"
                )
            docs, scores = self.sop(node.args[0])
            nb = node.dist / 100.0
            # union of negative matches FIRST — a doc matching several
            # negative legs demotes ONCE, like ES's single negative query
            neg = reduce(
                np.union1d, [self.sop(c)[0] for c in node.args[1:]]
            )
            if len(neg) and len(docs):
                m = np.isin(docs, neg)
                scores = np.where(m, scores * nb, scores)
            return docs, scores
        if name == "#andnot":
            # Lucene BooleanQuery MUST/MUST_NOT analog (no reference
            # counterpart — QryEval has no negation): docs of the first
            # child minus docs of every other child, scores untouched from
            # the positive leg, so it composes under all four models.
            # Shard-safe: exclusion is doc-local, no cross-shard state.
            docs, scores = self.sop(node.args[0])
            for c in node.args[1:]:
                nd, _ = self.sop(c)
                if len(nd) and len(docs):
                    keep = ~np.isin(docs, nd)
                    docs, scores = docs[keep], scores[keep]
            return docs, scores
        from .config import MODEL_REGISTRY

        if model in MODEL_REGISTRY:
            return self._sop_registered(node, MODEL_REGISTRY[model])
        # per-model operator support, matching the reference getScore
        # instanceof ladders (unsupported combinations throw there too)
        if name == "#sum" and model != "bm25":
            raise ValueError(f"{model} doesn't support the #SUM operator")
        if model == "bm25" and name in ("#and", "#or", "#wand"):
            raise ValueError(f"BM25 doesn't support the {name} operator")
        children = node.args
        results = [self.sop(c) for c in children]
        if self._is_match_all(name):
            docs = reduce(np.intersect1d, [r[0] for r in results])
        else:
            docs = reduce(np.union1d, [r[0] for r in results])
        if len(docs) == 0:
            return docs.astype(np.int64), np.empty(0, np.float64)

        if model == "unrankedboolean":
            return docs, np.ones(len(docs), np.float64)

        # per child: (scores aligned to docs, matched mask); unmatched slots
        # hold the Indri default score under Indri, 0 otherwise
        vals = [
            self._align(child, docs, cdocs, cscores)
            for child, (cdocs, cscores) in zip(children, results)
        ]

        if model == "rankedboolean":
            if name == "#or":
                res = np.full(len(docs), _MIN_DOUBLE)
                for v, matched in vals:
                    res[matched] = np.maximum(res[matched], v[matched])
                return docs, res
            if name in ("#and", "#wand", "#wsum"):
                res = np.full(len(docs), np.finfo(np.float64).max)
                for v, _ in vals:
                    res = np.minimum(res, v)
                return docs, res
            raise ValueError(f"RankedBoolean doesn't support {name}")

        if model == "bm25":
            # sum and wsum: plain sum of MATCHING children (weights unused
            # under BM25, `QrySopWSum.java:116-127`)
            res = np.zeros(len(docs), np.float64)
            for v, matched in vals:
                res[matched] += v[matched]
            return docs, res

        if model == "indri":
            n = len(children)
            if name == "#and":
                res = np.ones(len(docs), np.float64)
                for v, _ in vals:
                    res = res * v
                return docs, np.power(res, 1.0 / n)
            if name == "#or":
                # reference quirk: returns prod(1-s) WITHOUT the final
                # complement (`QrySopOr.java:75-87`) — reproduced as-is
                res = np.ones(len(docs), np.float64)
                for v, _ in vals:
                    res = res * (1.0 - v)
                return docs, res
            if name == "#wand":
                total = float(sum(node.weights))
                res = np.ones(len(docs), np.float64)
                for w, (v, _) in zip(node.weights, vals):
                    res = res * np.power(v, w / total)
                return docs, res
            if name == "#wsum":
                total = float(sum(node.weights))
                res = np.zeros(len(docs), np.float64)
                for w, (v, _) in zip(node.weights, vals):
                    res = res + v * (w / total)
                return docs, res
            raise ValueError(f"Indri doesn't support the {name} operator")

        raise ValueError(f"unknown retrieval model {self.model}")

    def _sop_registered(self, node, spec: dict) -> tuple[np.ndarray, np.ndarray]:
        """Registered-model combinator: generic reducer over children
        ("min" -> conjunctive match, "sum"/"max" -> disjunctive)."""
        reducer = spec["combine"].get(node.name)
        if reducer is None:
            raise ValueError(
                f"model {self.model} doesn't support the {node.name} operator"
            )
        results = [self.sop(c) for c in node.args]
        if reducer == "min":
            docs = reduce(np.intersect1d, [r[0] for r in results])
        else:
            docs = reduce(np.union1d, [r[0] for r in results])
        if len(docs) == 0:
            return docs.astype(np.int64), np.empty(0, np.float64)
        vals = [
            self._align(child, docs, cdocs, cscores)
            for child, (cdocs, cscores) in zip(node.args, results)
        ]
        if reducer == "min":
            res = np.full(len(docs), np.finfo(np.float64).max)
            for v, _ in vals:
                res = np.minimum(res, v)
        elif reducer == "max":
            res = np.full(len(docs), -np.finfo(np.float64).max)
            for v, matched in vals:
                res[matched] = np.maximum(res[matched], v[matched])
        elif reducer == "prod":
            # product over matching children (disjunctive match like sum:
            # unmatched children contribute the multiplicative identity).
            # Child order = query order onto a ones accumulator; 1.0*x == x
            # exactly in IEEE, so a one-term product is the bare leaf.
            res = np.ones(len(docs), np.float64)
            for v, matched in vals:
                res[matched] *= v[matched]
        else:  # sum over matching children
            res = np.zeros(len(docs), np.float64)
            for v, matched in vals:
                res[matched] += v[matched]
        return docs, res

    def _is_match_all(self, name: str) -> bool:
        # QrySop*.docIteratorHasMatch dispatch ladders
        if name in ("#or", "#sum"):
            return False
        if name in ("#and", "#wand", "#wsum"):
            return self.model != "indri"
        raise ValueError(name)

    def _align(self, child, docs, cdocs, cscores):
        """Child scores gathered onto ``docs``; unmatched docs get the Indri
        default score (other models never read unmatched slots).
        Returns (values, matched_mask)."""
        out = np.zeros(len(docs), np.float64)
        if len(cdocs):
            pos = np.searchsorted(cdocs, docs)
            pos_c = np.clip(pos, 0, len(cdocs) - 1)
            matched = cdocs[pos_c] == docs
            out[matched] = cscores[pos_c[matched]]
        else:
            matched = np.zeros(len(docs), bool)
        if self.model == "indri" and not matched.all():
            out[~matched] = self.default_scores(child, docs[~matched])
        return out, matched

    # -- leaves --
    def _score_leaf(self, node) -> tuple[np.ndarray, np.ndarray]:
        iop_node = node.args[0]
        p = self.iop(iop_node)
        docs = p.doc_ids
        if p.df == 0:
            return docs, np.empty(0, np.float64)
        model = self.model
        if model == "unrankedboolean":
            return docs, np.ones(len(docs), np.float64)
        if model == "rankedboolean":
            return docs, p.tfs.astype(np.float64)
        field = _iop_field(iop_node)
        dl = self.index.doclen(field, docs).astype(np.float64)
        if model == "bm25":
            df, _ = self._iop_stats(iop_node)
            N = float(self.index.num_docs)
            avelen = float(self.index.sum_field_lengths(field)) / float(
                self.index.doc_count(field)
            )
            idf = max(0.0, np.log((N - df + 0.5) / (df + 0.5)))
            tf = p.tfs.astype(np.float64)
            k1, b = self.p.k1, self.p.b
            return docs, idf * tf / (tf + k1 * (1.0 - b + b * dl / avelen))
        if model == "indri":
            _, ctf = self._iop_stats(iop_node)
            mu, lam = self.p.mu, self.p.lam
            clen = float(self.index.sum_field_lengths(field))
            prob = float(ctf) / clen
            tf = p.tfs.astype(np.float64)
            return docs, (1.0 - lam) * (tf + mu * prob) / (dl + mu) + lam * prob
        from .config import MODEL_REGISTRY

        if model in MODEL_REGISTRY:
            from types import SimpleNamespace

            df, ctf = self._iop_stats(iop_node)
            stats = SimpleNamespace(
                df=df,
                ctf=ctf,
                n_docs=self.index.num_docs,
                doc_count=self.index.doc_count(field),
                sum_len=self.index.sum_field_lengths(field),
            )
            scores = MODEL_REGISTRY[model]["score_leaf"](
                p.tfs.astype(np.float64), dl, stats, self.p
            )
            return docs, np.asarray(scores, dtype=np.float64)
        raise ValueError(f"unknown retrieval model {model}")

    def default_scores(self, node, docs: np.ndarray) -> np.ndarray:
        """Indri absent-doc scores (`QrySopScore.java:98-112` and the
        combinator getDefaultScore methods)."""
        if node.name == "#score":
            iop_node = node.args[0]
            field = _iop_field(iop_node)
            _, ctf = self._iop_stats(iop_node)
            ctf_eff = 0.5 if ctf < 1 else float(ctf)
            mu, lam = self.p.mu, self.p.lam
            clen = float(self.index.sum_field_lengths(field))
            prob = ctf_eff / clen
            dl = self.index.doclen(field, docs).astype(np.float64)
            return (1.0 - lam) * (mu * prob) / (dl + mu) + lam * prob
        if node.name == "#and":
            res = np.ones(len(docs), np.float64)
            for c in node.args:
                res = res * self.default_scores(c, docs)
            return np.power(res, 1.0 / len(node.args))
        if node.name == "#or":
            res = np.ones(len(docs), np.float64)
            for c in node.args:
                res = res * (1.0 - self.default_scores(c, docs))
            return res
        if node.name == "#wand":
            total = float(sum(node.weights))
            res = np.ones(len(docs), np.float64)
            for w, c in zip(node.weights, node.args):
                res = res * np.power(self.default_scores(c, docs), w / total)
            return res
        if node.name == "#wsum":
            total = float(sum(node.weights))
            res = np.zeros(len(docs), np.float64)
            for w, c in zip(node.weights, node.args):
                res = res + self.default_scores(c, docs) * (w / total)
            return res
        raise ValueError(f"{node.name} has no Indri default score")


def _iop_field(node) -> str:
    return node.field if isinstance(node, Term) else node.field or "body"


def collect_iop_nodes(root, out=None) -> list:
    """All inverted-list nodes under score leaves, in tree order (used by the
    sharded two-phase path to aggregate derived-list df/ctf globally)."""
    if out is None:
        out = []
    if root is None:
        return out
    if isinstance(root, Term):
        out.append(root)
        return out
    if root.name == "#score":
        out.append(root.args[0])
        return out
    for a in root.args:
        collect_iop_nodes(a, out)
    return out
