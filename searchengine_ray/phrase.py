"""Phrase suggestion ("did you mean") — the Elasticsearch *phrase
suggester* analog: correct a WHOLE query phrase, not one term at a time,
by combining an edit-distance error channel with a bigram language model
trained on the corpus, so context picks the right correction ("bat agg"
-> "batch agg", not "big agg") where a per-term checker cannot.

This composes two pieces this repo has already hash-verified:

- **Candidate generation** is ``spell.suggest``'s contract (Lucene
  DirectSpellChecker, reference ``QryIopTerm``-adjacent dictionary
  surface): per query token, dictionary terms within ``max_edits`` ranked
  (dist ASC, df DESC, term ASC), cut to ``cand_k`` — except that here the
  token ITSELF is a dist-0 candidate when it is in the dictionary (the
  suggester must be able to keep a correct word). Stopword tokens pass
  through unchanged (the dictionary never holds them, and "the" must not
  be "corrected" to "then"); an out-of-dictionary token with no candidate
  falls back to itself at dist 0.
- **Context scoring** is ``curation.lm_perplexity``'s add-one bigram LM
  (CCNet-style) over the RAW token stream (stopwords included, exactly
  the oracle's ``tok`` CTE): phrase score_q = sum over positions of
  ``PEN_Q * dist`` (the quantized error channel, -ln(ERR_P) per edit)
  plus, for every adjacent pair, the quantized NLL
  ``floor(-ln((c12+1)/(c1+V)) * 2^20 + 0.5)`` with c12 = corpus count of
  the bigram, c1 = corpus count of the prefix as a bigram start, and
  V = dictionary size + 1 (OOV). Lower is better; ties break
  (dist ASC, suggestion ASC). All ln/float arithmetic is model-sized and
  scalar libm ``math.log`` (np.log's SIMD path diverges from libm and
  therefore from DuckDB ``ln`` — the repo-wide bit-parity rule).

Scale shape: candidates come from the index dictionary (model-sized,
already resident); the ONLY corpus-scale work is one shuffle-free
``map_batches`` counting pass that emits per-batch partial counts
RESTRICTED to the candidate set (|C| <= phrases x positions x cand_k, so
each partial is at most |C|^2 + |C| rows) and a bounded driver fold —
the brute_topk pattern, no groupby. Combination enumeration and scoring
happen on the coordinator over <= cand_k^len combos per phrase (guarded),
which is exactly where Elasticsearch runs its suggester too.
"""

from __future__ import annotations

import itertools
import math
import re

import numpy as np
import pyarrow as pa

from .analyze import STOPWORDS
from .curation import LM_Q
from .indexio import InvertedIndex
from .operators import _levenshtein_all
from .textstats import _flat_tokens

TOKEN_RE = re.compile(r"[a-z0-9_]+")

ERR_P = 0.05  # error-channel probability per unit edit distance
# quantized per-edit penalty; integer constant shared verbatim with the SQL
# oracle (inlined as a literal there, like the ann_ivf centroid literals)
PEN_Q = int(math.floor(-math.log(ERR_P) * LM_Q + 0.5))

MAX_PHRASE_TOKENS = 8       # guard: combos grow as cand_k**len
MAX_COMBOS = 20_000         # guard: per-phrase enumeration bound


def _nll_q(c12: int, c1: int, V: int) -> int:
    """Quantized add-one bigram NLL — the EXACT float expression of
    ``curation.lm_perplexity`` / ``_lm_ppl_sql`` (libm ln, left-assoc)."""
    p = (1.0 + float(c12)) / (float(c1) + float(V))
    return int(math.floor((0.0 - math.log(p)) * float(LM_Q) + 0.5))


def _candidates(
    vocab: list[str],
    dfs: np.ndarray,
    qtok: str,
    max_edits: int,
    cand_k: int,
) -> list[tuple[str, int]]:
    """Per-token candidate list [(term, dist)], <= cand_k entries.

    Dictionary ranking (dist ASC, df DESC, term ASC) as in spell.suggest,
    identity INCLUDED at dist 0; stopwords and no-candidate tokens fall
    back to [(qtok, 0)].
    """
    if qtok in STOPWORDS:
        return [(qtok, 0)]
    d = np.asarray(_levenshtein_all(qtok, vocab), dtype=np.int64)
    sel = np.flatnonzero(d <= max_edits)
    if len(sel) == 0:
        return [(qtok, 0)]
    # vocab is sorted ascending, so a stable lexsort on (-df, dist)
    # finishes the (dist ASC, df DESC, term ASC) rank
    order = sel[np.lexsort((-dfs[sel], d[sel]))][:cand_k]
    return [(vocab[int(i)], int(d[int(i)])) for i in order]


def suggest_phrases(
    index: InvertedIndex,
    docs,
    phrases: list[str],
    field: str = "body",
    max_edits: int = 2,
    cand_k: int = 3,
    k: int = 3,
) -> pa.Table:
    """Top-k whole-phrase corrections per input phrase.

    ``docs`` is an sf_dir path (documents.parquet with a ``text`` column)
    or a zero-arg callable returning the corpus ``ray.data.Dataset`` —
    the same dual surface as ``build.build_index``. Returns
    (input, suggestion, dist, score_q, rn) rows, rn = 1..k ranked
    (score_q ASC, dist ASC, suggestion ASC).
    """
    import ray
    import ray.data

    vocab = sorted(t for (_f, t) in index.vocabulary(field))
    dfs = np.asarray(
        [index.postings(field, t, need_positions=False).stat_df for t in vocab],
        dtype=np.int64,
    )
    V = len(vocab) + 1  # + OOV, matching the oracle's count(*)+1

    # --- per-position candidates (coordinator, model-sized) ---------------
    per_phrase: list[tuple[str, list[list[tuple[str, int]]]]] = []
    cand_terms: set[str] = set()
    for phrase in phrases:
        toks = TOKEN_RE.findall(phrase.lower())
        if not toks:
            continue
        if len(toks) > MAX_PHRASE_TOKENS:
            raise ValueError(
                f"phrase has {len(toks)} tokens > MAX_PHRASE_TOKENS="
                f"{MAX_PHRASE_TOKENS}; split the query or raise the guard"
            )
        cands = [_candidates(vocab, dfs, t, max_edits, cand_k) for t in toks]
        n_combos = 1
        for c in cands:
            n_combos *= len(c)
        if n_combos > MAX_COMBOS:
            raise ValueError(
                f"{n_combos} candidate combinations > MAX_COMBOS="
                f"{MAX_COMBOS}; lower cand_k or shorten the phrase"
            )
        per_phrase.append((phrase, cands))
        for c in cands:
            cand_terms.update(t for t, _ in c)

    if not per_phrase:
        return pa.table({
            "input": pa.array([], pa.string()),
            "suggestion": pa.array([], pa.string()),
            "dist": pa.array([], pa.int64()),
            "score_q": pa.array([], pa.int64()),
            "rn": pa.array([], pa.int64()),
        })

    # --- corpus counting pass: bigram c12 over C x C, start counts c1 over
    # C; shuffle-free map_batches partials + bounded driver fold ----------
    carr = np.sort(np.asarray(sorted(cand_terms), dtype=object))

    def partial(t: pa.Table) -> pa.Table:
        _n, doc_idx, flat = _flat_tokens(t)
        empty = pa.table({
            "w1": pa.array([], pa.string()),
            "w2": pa.array([], pa.string()),
            "c": pa.array([], pa.int64()),
        })
        if len(doc_idx) < 2:
            return empty
        toks = flat.to_numpy(zero_copy_only=False).astype(object)
        m = doc_idx[1:] == doc_idx[:-1]
        w1, w2 = toks[:-1][m], toks[1:][m]
        if len(w1) == 0:
            return empty
        i1 = np.searchsorted(carr, w1)
        i1c = np.minimum(i1, len(carr) - 1)
        in1 = carr[i1c] == w1
        # start counts: every bigram start whose w1 is a candidate
        sc = np.bincount(i1c[in1], minlength=len(carr)).astype(np.int64)
        nz = np.flatnonzero(sc)
        # pair counts: both endpoints candidates
        i2 = np.searchsorted(carr, w2)
        i2c = np.minimum(i2, len(carr) - 1)
        both = in1 & (carr[i2c] == w2)
        key = i1c[both] * len(carr) + i2c[both]
        uk, kc = np.unique(key, return_counts=True)
        return pa.table({
            "w1": pa.array(
                np.concatenate([carr[uk // len(carr)], carr[nz]]).astype(str),
                pa.string(),
            ),
            "w2": pa.array(
                np.concatenate(
                    [carr[uk % len(carr)], np.full(len(nz), "", dtype=object)]
                ).astype(str),
                pa.string(),
            ),
            "c": pa.array(
                np.concatenate([kc.astype(np.int64), sc[nz]]), pa.int64()
            ),
        })

    if callable(docs):
        ds = docs()
    else:
        ds = ray.data.read_parquet(f"{docs}/documents.parquet",
                                   columns=["text"])
    c12: dict[tuple[str, str], int] = {}
    c1: dict[str, int] = {}
    for b in (
        ds.map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ):
        bw1 = b.column("w1").to_pylist()
        bw2 = b.column("w2").to_pylist()
        bc = b.column("c").to_pylist()
        for a, bb, c in zip(bw1, bw2, bc):
            if bb == "":
                c1[a] = c1.get(a, 0) + c
            else:
                c12[(a, bb)] = c12.get((a, bb), 0) + c

    # --- enumerate + score (coordinator, bounded) -------------------------
    out_i: list[str] = []
    out_s: list[str] = []
    out_d: list[int] = []
    out_q: list[int] = []
    out_r: list[int] = []
    for phrase, cands in per_phrase:
        scored: list[tuple[int, int, str]] = []
        for combo in itertools.product(*cands):
            terms = [t for t, _ in combo]
            dist = sum(d for _, d in combo)
            q = PEN_Q * dist
            for a, bb in zip(terms, terms[1:]):
                q += _nll_q(c12.get((a, bb), 0), c1.get(a, 0), V)
            scored.append((q, dist, " ".join(terms)))
        scored.sort()
        for rn, (q, dist, s) in enumerate(scored[:k], start=1):
            out_i.append(phrase)
            out_s.append(s)
            out_d.append(dist)
            out_q.append(q)
            out_r.append(rn)
    return pa.table({
        "input": pa.array(out_i, pa.string()),
        "suggestion": pa.array(out_s, pa.string()),
        "dist": pa.array(out_d, pa.int64()),
        "score_q": pa.array(out_q, pa.int64()),
        "rn": pa.array(out_r, pa.int64()),
    })
