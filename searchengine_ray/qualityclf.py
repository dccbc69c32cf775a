"""Trained document-quality classifier (the CCNet / FineWeb-Edu pattern:
distill a quality rule into a linear model, then score the whole corpus
with the model). A logistic regression over five exact-integer text
signals, trained by deterministic full-batch gradient descent on
pseudo-labels from a reference rule — the stand-in for "Wikipedia vs
crawl" reference corpora this sandbox cannot ship, exactly as the LeToR /
DRMM gates stand in trained rerankers (trained-weights-as-SQL-literals,
`__ray_entry__._ltr_rerank_sql` precedent).

Features per doc (all exact int64, independently re-derivable in SQL):
    f1 n_tokens   f2 n_unique   f3 n_stop
    f4 n_distinct_bigrams       f5 n_chars

Pseudo-label rule (integer cross-multiplied, no floats):
    y = 1  iff  n_tokens >= 30  AND  100*n_unique >= 45*n_tokens

Determinism design: training never calls BLAS (no matmul — per-feature
np.sum reductions only, fixed iteration count, zero init), so weights
derive from the corpus alone; the feature scaling (/128, an exact
power-of-two float op) is FOLDED into the exported weights so the
scoring expression is a plain literal-weighted sum. Scoring accumulates
z per feature in fixed order (left-assoc), prob = 1/(1+exp(-z)) — every
op replayed identically by DuckDB.

Scale shape: training reads a BOUNDED corpus sample (loud guard);
scoring is a shuffle-free vectorized map_batches scan with the weights
broadcast once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import (
    STOPWORDS, _distinct_bigram_counts, _flat_tokens, _read_docs,
)

QC_ITERS = 5000
QC_LR = 2.0
QC_SCALE = 128.0  # power of two: f/128 is exact, folds into weights
QC_MAX_TRAIN_ROWS = 4096

_FEATS = ("n_tokens", "n_unique", "n_stop", "n_distinct_bigrams", "n_chars")


def features_batch(t: pa.Table) -> pa.Table:
    """(doc_id, f1..f5) exact int64 per doc — one tokenize pass."""
    n, doc_idx, flat = _flat_tokens(t)
    n_tok = np.bincount(doc_idx, minlength=n).astype(np.int64)
    stop_np = pc.is_in(
        flat, value_set=pa.array(sorted(STOPWORDS))
    ).to_numpy(zero_copy_only=False)
    n_stop = np.bincount(doc_idx[stop_np], minlength=n).astype(np.int64)
    codes = flat.dictionary_encode().indices.to_numpy().astype(np.int64)
    if len(codes):
        order = np.lexsort((codes, doc_idx))
        dd, cc = doc_idx[order], codes[order]
        first = np.empty(len(dd), dtype=bool)
        first[0] = True
        first[1:] = (dd[1:] != dd[:-1]) | (cc[1:] != cc[:-1])
        n_uniq = np.bincount(dd[first], minlength=n).astype(np.int64)
    else:
        n_uniq = np.zeros(n, dtype=np.int64)
    _, n_bg = _distinct_bigram_counts(doc_idx, codes, n)
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_unique": pa.array(n_uniq, pa.int64()),
            "n_stop": pa.array(n_stop, pa.int64()),
            "n_distinct_bigrams": pa.array(n_bg, pa.int64()),
            "n_chars": pc.utf8_length(t.column("text")).cast(pa.int64()),
        }
    )


def label_rule(F: np.ndarray) -> np.ndarray:
    """Integer pseudo-label: n_tokens >= 30 and unique/tokens >= 0.45."""
    return (
        (F[:, 0] >= 30) & (100 * F[:, 1] >= 45 * F[:, 0])
    ).astype(np.float64)


def train_quality_classifier(
    sf_dir: str, iters: int = QC_ITERS, lr: float = QC_LR
) -> tuple[float, np.ndarray]:
    """Deterministic full-batch logistic GD on the bounded corpus sample
    (full corpus up to QC_MAX_TRAIN_ROWS docs, splitmix-thinned above —
    deterministic either way). Returns (bias, w_eff) with the /QC_SCALE
    feature scaling already folded into ``w_eff`` (elementwise exact
    division by a power of 2)."""
    import pyarrow.parquet as pq

    from .sketch import _hash64

    n_rows = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    if n_rows <= QC_MAX_TRAIN_ROWS:
        thresh = np.uint64(0xFFFFFFFF)
    else:
        # splitmix-thinned deterministic sample (the _sample_matrix
        # convention): bounded driver rows at any corpus size, and at
        # gate scale (<= cap) every row survives so the SQL-literal
        # oracle's weights derive from the full corpus
        thresh = np.uint64(
            max(1, int(QC_MAX_TRAIN_ROWS / n_rows * 0xFFFFFFFF))
        )

    def thin(t: pa.Table) -> pa.Table:
        keep = (
            _hash64(t.column("doc_id").to_numpy(), 97)
            & np.uint64(0xFFFFFFFF)
        ) <= thresh
        return t.filter(pa.array(keep))

    rows = (
        _read_docs(sf_dir)
        .map_batches(thin, batch_format="pyarrow")
        .map_batches(features_batch, batch_format="pyarrow")
        .take_all()  # bounded: ~QC_MAX_TRAIN_ROWS rows by construction
    )
    rows.sort(key=lambda r: r["doc_id"])
    F = np.array(
        [[r[f] for f in _FEATS] for r in rows], dtype=np.int64
    )
    y = label_rule(F)
    X = F.astype(np.float64) / QC_SCALE
    n, k = X.shape
    w = np.zeros(k, dtype=np.float64)
    b = 0.0
    for _ in range(iters):
        # z accumulated per feature — no BLAS, deterministic reductions
        z = np.full(n, b, dtype=np.float64)
        for j in range(k):
            z += w[j] * X[:, j]
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        for j in range(k):
            w[j] -= lr * (np.sum(g * X[:, j]) / n)
        b -= lr * (np.sum(g) / n)
    return b, w / QC_SCALE


def quality_scores(
    sf_dir: str, bias: float, w_eff: np.ndarray
):
    """Score every doc: z = bias + Σ_j w_eff[j]*f_j accumulated in fixed
    feature order, prob = 1/(1+exp(-z)); returns a Dataset of
    (doc_id, prob_r, label_pred)."""
    import ray

    ref = ray.put((float(bias), np.asarray(w_eff, dtype=np.float64)))

    def score(t: pa.Table) -> pa.Table:
        b, w = ray.get(ref)
        ft = features_batch(t)
        z = np.full(ft.num_rows, b, dtype=np.float64)
        for j, name in enumerate(_FEATS):
            z = z + w[j] * ft.column(name).to_numpy().astype(np.float64)
        prob = 1.0 / (1.0 + np.exp(-z))
        return pa.table(
            {
                "doc_id": ft.column("doc_id"),
                "prob_r": pa.array(np.round(prob, 6), pa.float64()),
                "label_pred": pa.array(
                    (prob >= 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    return _read_docs(sf_dir).map_batches(score, batch_format="pyarrow")
