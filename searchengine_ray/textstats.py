"""Text-analysis operators: token stats, language id, quality scoring,
winnowing fingerprints. All vectorized `map_batches` stages over the
documents table, each with an exact DuckDB-SQL oracle formulation
(tokenization = the engine's shared analyzer regex `[a-z0-9_]+`).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .analyze import STOPWORDS, tokenize

#: per-language marker words for the n-gram-free language-id heuristic
#: (deterministic; ties broken by this ordering)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est"),
    "es": ("el", "la", "los", "de", "y", "que", "es", "una"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "zh": ("de5", "shi4", "le5", "zai4", "you3", "wo3", "ta1", "men5"),
}


def _read_docs(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )


def token_stats(sf_dir: str):
    """(doc_id, n_tokens, n_unique, n_stop) — exact integers."""
    ds = _read_docs(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id")
        n_tok, n_uniq, n_stop = [], [], []
        for text in t.column("text").to_pylist():
            toks = tokenize(text)
            n_tok.append(len(toks))
            n_uniq.append(len(set(toks)))
            n_stop.append(sum(1 for x in toks if x in STOPWORDS))
        return pa.table(
            {
                "doc_id": ids,
                "n_tokens": pa.array(n_tok, type=pa.int64()),
                "n_unique": pa.array(n_uniq, type=pa.int64()),
                "n_stop": pa.array(n_stop, type=pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def lang_id(sf_dir: str):
    """(doc_id, lang_pred) via marker-word counts; argmax with deterministic
    tie order = LANG_MARKERS insertion order; 'und' when all counts are 0."""
    ds = _read_docs(sf_dir)
    langs = list(LANG_MARKERS)
    marker_sets = {lg: frozenset(ws) for lg, ws in LANG_MARKERS.items()}

    def classify(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id")
        preds = []
        for text in t.column("text").to_pylist():
            toks = tokenize(text)
            counts = [sum(1 for x in toks if x in marker_sets[lg]) for lg in langs]
            best = max(counts)
            preds.append(langs[counts.index(best)] if best > 0 else "und")
        return pa.table(
            {"doc_id": ids, "lang_pred": pa.array(preds, type=pa.string())}
        )

    return ds.map_batches(classify, batch_format="pyarrow")


def quality_score(sf_dir: str, min_tokens: int = 20):
    """(doc_id, n_tokens, stop_ratio_micro, mean_token_len_micro, passes)
    quality gate (Gopher-rules-style length/stopword filter).

    Ratios are integer micro-units via floor division so the DuckDB oracle
    reproduces them bit-exactly (float rounding modes differ between
    libraries); ``passes`` = n_tokens >= min AND 2*n_stop <= n_tokens
    (stopword ratio <= 0.5, integer comparison).
    """
    ds = _read_docs(sf_dir)

    def score(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id")
        n_tok, ratio, mean_len, passes = [], [], [], []
        for text in t.column("text").to_pylist():
            toks = tokenize(text)
            n = len(toks)
            n_stop = sum(1 for x in toks if x in STOPWORDS)
            n_chars = sum(len(x) for x in toks)
            n_tok.append(n)
            ratio.append((n_stop * 1_000_000) // n if n else 0)
            mean_len.append((n_chars * 1_000_000) // n if n else 0)
            passes.append(bool(n >= min_tokens and 2 * n_stop <= n))
        return pa.table(
            {
                "doc_id": ids,
                "n_tokens": pa.array(n_tok, type=pa.int64()),
                "stop_ratio_micro": pa.array(ratio, type=pa.int64()),
                "mean_token_len_micro": pa.array(mean_len, type=pa.int64()),
                "passes": pa.array(passes, type=pa.bool_()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def winnow_fingerprints(sf_dir: str, k: int = 3, w: int = 4):
    """Winnowing document fingerprints (Schleimer et al. local fingerprinting):
    md5 of each k-gram, minimum per sliding window of w, distinct minima.

    Returns (doc_id, n_fingerprints, min_fp). The md5-hex minima compare
    lexicographically, so the DuckDB oracle reproduces them with a windowed
    MIN over the same hashes.
    """
    ds = _read_docs(sf_dir)

    def fp(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id")
        n_fp, min_fp = [], []
        for text in t.column("text").to_pylist():
            toks = tokenize(text)
            grams = [
                hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()
                for i in range(max(0, len(toks) - k + 1))
            ]
            if not grams:
                n_fp.append(0)
                min_fp.append("")
                continue
            sel = {
                min(grams[i : i + w]) for i in range(len(grams))
            }  # windows ROWS BETWEEN CURRENT AND w-1 FOLLOWING
            n_fp.append(len(sel))
            min_fp.append(min(sel))
        return pa.table(
            {
                "doc_id": ids,
                "n_fingerprints": pa.array(n_fp, type=pa.int64()),
                "min_fp": pa.array(min_fp, type=pa.string()),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")
