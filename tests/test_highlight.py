"""Index-native snippet windows (highlight.best_windows): the vectorized
(lexsort + searchsorted + per-term prefix-sum) kernel vs a transparent
per-doc brute force over the same decoded positions, plus planted
tie-break and edge cases."""

import numpy as np
import pytest

from searchengine_ray.config import ModelParams
from searchengine_ray.engine import SearchEngine
from searchengine_ray.highlight import best_windows


def _brute(index, terms, window, field="body"):
    """Per-doc nested-loop reference: candidate starts are query-term
    positions; score = distinct terms in [s, s+window); max, earliest."""
    per_doc: dict[int, list[tuple[int, int]]] = {}
    for tid, term in enumerate(dict.fromkeys(terms)):
        p = index.postings(field, term, need_positions=True)
        for i, d in enumerate(p.doc_ids):
            for pos in p.positions_for(i):
                per_doc.setdefault(int(d), []).append((int(pos), tid))
    out = {}
    for d, hits in per_doc.items():
        hits.sort()
        best = None
        for s, _ in hits:
            n = len({t for q, t in hits if s <= q < s + window})
            if best is None or n > best[1]:
                best = (s, n)
        out[d] = best
    return out


@pytest.fixture(scope="module")
def index(built_index):
    return SearchEngine(built_index, ModelParams(model="bm25")).index


@pytest.mark.parametrize(
    "terms,window",
    [
        (["mutex", "lock"], 8),
        (["read", "write", "open"], 5),
        (["mutex", "lock", "mutex"], 3),  # duplicate query term dedupes
        (["uniqueterm_only_here"], 1),
        (["never_in_corpus_zzz", "mutex"], 4),  # empty list contributes 0
    ],
)
def test_matches_brute_force(index, terms, window):
    got = best_windows(index, terms, window=window)
    want = _brute(index, terms, window)
    assert got.num_rows == len(want)
    for d, s, n in zip(
        got.column("doc_id").to_pylist(),
        got.column("win_start").to_pylist(),
        got.column("n_terms").to_pylist(),
    ):
        assert want[d] == (s, n), d


def test_no_match_returns_empty(index):
    t = best_windows(index, ["never_in_corpus_zzz"], window=8)
    assert t.num_rows == 0 and t.schema.names == [
        "doc_id", "win_start", "n_terms",
    ]


def test_window_semantics_planted(ray_session, tmp_path_factory):
    """Planted doc: 'a b ... a c' — window 2 can cover (a,c) at the tail
    but the EARLIEST max-coverage window wins only if coverage ties."""
    import ray.data

    from searchengine_ray.build import build_index
    from searchengine_ray.config import BuildConfig
    from searchengine_ray.corpus import synthesize_corpus
    import pyarrow as pa

    base = synthesize_corpus(n_docs=2, seed=3).slice(0, 2)
    planted = base.set_column(
        base.schema.get_field_index("content"),
        "content",
        pa.array(["alpha beta gamma alpha delta", "beta beta beta"]),
    )
    out = str(tmp_path_factory.mktemp("hl") / "idx")
    build_index(
        lambda: ray.data.from_arrow(planted), out,
        BuildConfig(num_partitions=1),
    )
    eng = SearchEngine(out, ModelParams(model="bm25"))
    t = best_windows(eng.index, ["alpha", "delta"], window=2)
    rows = {
        d: (s, n)
        for d, s, n in zip(
            t.column("doc_id").to_pylist(),
            t.column("win_start").to_pylist(),
            t.column("n_terms").to_pylist(),
        )
    }
    # doc 0: window 2 starting at pos 3 covers alpha+delta (2 terms);
    # the earlier alpha at pos 0 covers only 1 -> max wins, not earliest
    assert rows[0] == (3, 2)
    # tie-break: both alphas alone would tie at 1 -> earliest start
    t1 = best_windows(eng.index, ["alpha"], window=1)
    one = {
        d: (s, n)
        for d, s, n in zip(
            t1.column("doc_id").to_pylist(),
            t1.column("win_start").to_pylist(),
            t1.column("n_terms").to_pylist(),
        )
    }
    assert one[0] == (0, 1)
