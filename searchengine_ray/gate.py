"""Correctness-gate entries for the search engine over the documents-derived
corpus: each returns a table DuckDB SQL can reproduce exactly (columns named
identically to the matching oracle_sql aliases in ``__ray_entry__``).

An index per sf_dir is built once per process into /tmp and reused by every
entry (build is the expensive step; the manifest makes re-entry a no-op).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from .build import build_index
from .config import BuildConfig, ModelParams
from .engine import SearchEngine

_INDEX_CACHE: dict[str, str] = {}
_ENGINE_CACHE: dict[tuple[str, str], SearchEngine] = {}


def index_for(sf_dir: str) -> str:
    key = os.path.abspath(sf_dir)
    if key not in _INDEX_CACHE:
        out = os.path.join(
            "/tmp/se_ray_index", hashlib.md5(key.encode()).hexdigest()[:12]
        )
        build_index(sf_dir, out, BuildConfig())
        _INDEX_CACHE[key] = out
    return _INDEX_CACHE[key]


def engine_for(sf_dir: str, model: str) -> SearchEngine:
    key = (os.path.abspath(sf_dir), model)
    if key not in _ENGINE_CACHE:
        _ENGINE_CACHE[key] = SearchEngine(
            index_for(sf_dir), ModelParams(model=model, top_k=1 << 30)
        )
    return _ENGINE_CACHE[key]


def _score_table(sf_dir: str, model: str, query: str, as_int: bool = False, r: int = 6):
    t = engine_for(sf_dir, model).search("q", query)
    score = t.column("score")
    if as_int:
        score = pc.cast(score, pa.int64())
        return pa.table({"doc_id": t.column("doc_id"), "score": score})
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "score_r": pc.round(score, ndigits=r),
        }
    )


# ---- search entries (all matching docs; no top-k truncation so no rank
# boundary nondeterminism in the gate; the tie-break itself is pytest-tested)


def se_bm25_term(sf_dir: str):
    """BM25 single-term query 'dup' (df<<N so the idf is non-degenerate)."""
    return _score_table(sf_dir, "bm25", "dup")


def se_bm25_flat(sf_dir: str):
    """BM25 flat two-term query (#SUM default-op wrap; one term idf-clamps)."""
    return _score_table(sf_dir, "bm25", "dup spark")


def se_bm25_near(sf_dir: str):
    """BM25 over the DERIVED #near/1 list — exercises derived df stats."""
    return _score_table(sf_dir, "bm25", "#near/1( hash join )")


def se_near_tf(sf_dir: str):
    """#near/1 adjacency tf (RankedBoolean score = tf of the derived list)."""
    return _score_table(sf_dir, "rankedboolean", "#near/1( hash join )", as_int=True)


def se_window_docs(sf_dir: str):
    """#window/8 match set (UnrankedBoolean -> membership only)."""
    t = engine_for(sf_dir, "unrankedboolean").search(
        "q", "#window/8( vector scan )"
    )
    return pa.table({"doc_id": t.column("doc_id")})


def se_syn_tf(sf_dir: str):
    return _score_table(sf_dir, "rankedboolean", "#syn( scan sort )", as_int=True)


def se_ranked_and(sf_dir: str):
    return _score_table(sf_dir, "rankedboolean", "#and( spark join )", as_int=True)


def se_ranked_or(sf_dir: str):
    return _score_table(sf_dir, "rankedboolean", "#or( spark join )", as_int=True)


def se_indri_and(sf_dir: str):
    return _score_table(sf_dir, "indri", "#and( spark join )")


def se_bm25_wsum_fields(sf_dir: str):
    """BM25 #wsum across two fields (keywords<-lang, body<-text); match-ALL
    semantics under BM25 (`QrySopWSum.java:26-28`), weights unused."""
    return _score_table(sf_dir, "bm25", "#wsum( 0.4 en.keywords 0.6 dup.body )")


def se_docmap(sf_dir: str):
    """The per-row sha256(content) invariant + external ids, from the BUILT
    index's docmap (not recomputed from the input)."""
    t = pads.dataset(
        _walk_parquet(os.path.join(index_for(sf_dir), "docmap"))
    ).to_table()
    return t.select(["doc_id", "external_id", "sha256", "len_body"])


def se_lexicon(sf_dir: str):
    """Global (term, df, ctf) for the body field from the built lexicon."""
    t = pads.dataset(
        _walk_parquet(os.path.join(index_for(sf_dir), "lexicon"))
    ).to_table()
    t = t.filter(pc.equal(t.column("field"), "body"))
    return t.select(["term", "df", "ctf"])


def _walk_parquet(d: str) -> list[str]:
    out = []
    for root, _dirs, names in os.walk(d):
        out.extend(os.path.join(root, n) for n in names if n.endswith(".parquet"))
    return sorted(out)
