"""Pseudo-relevance-feedback query expansion (reference HW3 ``QryExpand``,
`Homeworks/HW3/QryEval/QryExpand.java` — HW6 copy cited below).

Semantics ported exactly (`Homeworks/HW6/QryEval/QryExpand.java:70-150`):

- take the top ``fb_docs`` documents of an initial ranking (provided, or a
  fresh run of the feedback model);
- candidate terms = all body terms of those docs, excluding terms containing
  ``.`` or ``,`` (line 95-97);
- score(t) = sum over top docs of  p(t|d) * doc_score * idf  with
  ``p(t|d) = (tf + mu*ctf/C) / (doclen + mu)`` and ``idf = ln(C/ctf)``
  (lines 113-123), C = total body length;
- expansion query = ``#wand(w1 t1 ... )`` (Indri) / ``#wsum(...)`` (BM25)
  with weights formatted %.4f (lines 137-142); the final query is
  ``fbOp(origWeight defaultOp(orig) 1-origWeight fbQuery)`` (line 148-149).

Deliberate determinization (flagged): the reference sorts candidate terms by
score via a HashMap entry list, so equal-score ordering is JVM hash order;
we tie-break by term ascending.

Doc term vectors come from the corpus (the index never stores content): a
batched, filtered read of the top-k docs only — a small gather, exactly the
reference's top-fbDocs ``TermVector`` cache (`QryExpand.java:85-98`).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass
import math

import numpy as np

from .analyze import STOPWORDS, tokenize
from .config import DEFAULT_OP, ModelParams
from .indexio import InvertedIndex


@dataclass
class ExpandConfig:
    fb: str = "indri"  # 'indri' -> #wand, 'bm25' -> #wsum
    fb_docs: int = 10
    fb_terms: int = 10
    fb_mu: float = 0.0
    fb_orig_weight: float = 0.5

    @property
    def fb_op(self) -> str:
        return "#wand" if self.fb == "indri" else "#wsum"


def doc_tokens_from_sf(
    sf_dir: str, doc_ids: list[int], stemmer=None
) -> dict[int, Counter]:
    """Gather body term frequencies for a small doc set (filtered read).
    ``stemmer`` must be the target index's profile so candidate terms match
    its vocabulary (ctf lookups)."""
    import pyarrow.dataset as pads

    ds = pads.dataset(f"{sf_dir}/documents.parquet")
    tbl = ds.to_table(
        columns=["doc_id", "text"],
        filter=pads.field("doc_id").isin(list(map(int, doc_ids))),
    )
    out: dict[int, Counter] = {}
    for d, text in zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()):
        toks = (t for t in tokenize(text) if t not in STOPWORDS)
        if stemmer is not None:
            toks = (stemmer(t) for t in toks)
        out[int(d)] = Counter(toks)
    return out


def expansion_terms(
    index: InvertedIndex,
    ranking: list[tuple[int, float]],
    doc_tokens: dict[int, Counter],
    cfg: ExpandConfig,
) -> list[tuple[str, float]]:
    """Top fb_terms (term, score), score per the reference formula."""
    top = ranking[: cfg.fb_docs]
    C = float(index.sum_field_lengths("body"))
    terms: set[str] = set()
    for d, _ in top:
        for t in doc_tokens.get(d, ()):  # noqa: B007
            if "." not in t and "," not in t:
                terms.add(t)
    doclens = {
        d: float(index.doclen("body", np.array([d]))[0]) for d, _ in top
    }
    scores: dict[str, float] = {}
    for t in terms:
        ctf = float(index.postings("body", t).stat_ctf)
        if ctf <= 0:
            continue
        idf = math.log(C / ctf)
        s = 0.0
        for d, doc_score in top:
            tf = float(doc_tokens.get(d, {}).get(t, 0))
            ptd = (tf + cfg.fb_mu * ctf / C) / (doclens[d] + cfg.fb_mu)
            s += ptd * doc_score * idf
        scores[t] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[: cfg.fb_terms]


def expansion_query(terms: list[tuple[str, float]], cfg: ExpandConfig) -> str:
    inner = " ".join(f"{w:.4f} {t}" for t, w in terms)
    return f"{cfg.fb_op}({inner} )"


def expand_query_line(
    qid: str,
    query: str,
    fb_query: str,
    cfg: ExpandConfig,
    model: str,
) -> str:
    """`QryExpand.java:148-149` — the combined query line."""
    default_op = DEFAULT_OP[model]
    return (
        f"{qid}: {cfg.fb_op}({cfg.fb_orig_weight:f} {default_op}({query}) "
        f"{1.0 - cfg.fb_orig_weight:f} {fb_query})"
    )


def expand(
    index: InvertedIndex,
    sf_dir: str,
    qid: str,
    query: str,
    ranking: list[tuple[int, float]],
    cfg: ExpandConfig | None = None,
    model: str = "indri",
) -> tuple[str, list[tuple[str, float]]]:
    """Full PRF step: returns (expanded qLine, the expansion terms)."""
    from .stem import get_stemmer

    cfg = cfg or ExpandConfig()
    doc_ids = [d for d, _ in ranking[: cfg.fb_docs]]
    toks = doc_tokens_from_sf(
        sf_dir, doc_ids, stemmer=get_stemmer(index.stemmer_name)
    )
    terms = expansion_terms(index, ranking, toks, cfg)
    fb_query = expansion_query(terms, cfg)
    return expand_query_line(qid, query, fb_query, cfg, model), terms
