"""RAKE keyphrase extraction (Rose et al. 2010, "Automatic Keyword
Extraction from Individual Documents") — the classic unsupervised
document tagger a training-data pipeline runs to label/route documents.

Semantics (per DOCUMENT, exactly the original's co-occurrence scoring):
candidate phrases are maximal runs of consecutive non-stopword tokens in
the analyzer stream (stopwords are the delimiters; the raw tokenizer
already drops punctuation so token adjacency defines runs). Within a
document, freq(w) = occurrences of w inside candidate phrases and
deg(w) = sum over those occurrences of the containing phrase's length
(self co-occurrence included, the standard formulation). The word score
is deg/freq kept EXACT-INTEGER as ``floor(deg * 2^20 / freq)`` and a
phrase scores the sum of its word scores with multiplicity — so the
DuckDB oracle replays the whole chain with ``//`` and carries zero float
risk. Duplicate phrase texts within a doc collapse (their scores are
equal by construction); output is the top-k per doc ranked
(score_q DESC, phrase ASC).

Scale shape: RAKE is per-document by definition, so the operator is ONE
embarrassingly-parallel ``map_batches`` scan — no shuffle, no driver
state. Every step is batch-global vectorized: one `_flat_tokens`
tokenize, one Arrow ``is_in`` stop mask, run/phrase ids by cumsum over
boundary markers, per-(doc,word) freq/deg via dictionary-encode +
``np.add.at``, phrase strings assembled with ONE Arrow
``binary_join`` over a ListArray rebuilt from the phrase offsets — no
per-token or per-phrase Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .analyze import STOPWORDS
from .curation import _read_docs
from .textstats import _flat_tokens

RAKE_Q = 1 << 20   # fixed-point scale for the deg/freq word score
RAKE_K = 5         # phrases kept per document


def rake_keyphrases(docs, k: int = RAKE_K):
    """(doc_id, phrase, score_q, rn) — top-k RAKE keyphrases per doc.

    ``docs`` is an sf_dir path or a zero-arg callable returning the
    corpus Dataset (the ``build_index``/``suggest_phrases`` dual
    surface)."""
    stop_arr = pa.array(sorted(STOPWORDS))

    empty = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "phrase": pa.array([], pa.string()),
        "score_q": pa.array([], pa.int64()),
        "rn": pa.array([], pa.int64()),
    })

    def extract(t: pa.Table) -> pa.Table:
        _n, doc_idx, flat = _flat_tokens(t)
        if len(doc_idx) == 0:
            return empty
        ids = t.column("doc_id").to_numpy()
        stop = pc.is_in(flat, value_set=stop_arr).to_numpy(
            zero_copy_only=False
        )
        keep = ~stop
        if not keep.any():
            return empty
        # phrase ids: a new run starts at every non-stop token whose
        # predecessor is a stopword, a different doc, or absent
        prev_same = np.zeros(len(doc_idx), dtype=bool)
        prev_same[1:] = (doc_idx[1:] == doc_idx[:-1]) & ~stop[:-1]
        boundary = keep & ~prev_same
        pid_all = np.cumsum(boundary) - 1          # valid where keep
        pid = pid_all[keep]                        # per kept occurrence
        kdoc = doc_idx[keep]
        ktok = flat.filter(pa.array(keep))
        if isinstance(ktok, pa.ChunkedArray):
            ktok = ktok.combine_chunks()
        n_ph = int(pid[-1]) + 1
        plen = np.bincount(pid, minlength=n_ph).astype(np.int64)

        # per-(doc, word) freq / deg via batch dictionary-encode
        denc = ktok.dictionary_encode()
        codes = denc.indices.to_numpy().astype(np.int64)
        nd = len(denc.dictionary)
        wkey = kdoc * nd + codes
        uw, winv = np.unique(wkey, return_inverse=True)
        freq = np.bincount(winv).astype(np.int64)
        deg = np.zeros(len(uw), dtype=np.int64)
        np.add.at(deg, winv, plen[pid])
        wscore = deg * RAKE_Q // freq

        # phrase score: sum of word scores over occurrences, by phrase
        pscore = np.zeros(n_ph, dtype=np.int64)
        np.add.at(pscore, pid, wscore[winv])
        pdoc = np.zeros(n_ph, dtype=np.int64)
        pdoc[pid] = kdoc                            # constant within pid

        # phrase text: ONE Arrow join over the ListArray rebuilt from
        # the per-phrase token counts
        offsets = np.zeros(n_ph + 1, dtype=np.int32)
        np.cumsum(plen, out=offsets[1:])
        lists = pa.ListArray.from_arrays(pa.array(offsets), ktok)
        ptext = pc.binary_join(lists, " ").to_numpy(zero_copy_only=False)

        # collapse duplicate phrase texts within a doc (equal scores by
        # construction), then rank top-k per doc (score DESC, phrase ASC)
        order = np.lexsort((ptext, -pscore, pdoc))
        sd, st = pdoc[order], ptext[order]
        first = np.ones(n_ph, dtype=bool)
        first[1:] = (sd[1:] != sd[:-1]) | (st[1:] != st[:-1])
        order, sd = order[first], sd[first]
        new_doc = np.ones(len(sd), dtype=bool)
        new_doc[1:] = sd[1:] != sd[:-1]
        starts = np.flatnonzero(new_doc)
        rn = np.arange(len(sd), dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, len(sd)))
        ) + 1
        cut = rn <= k
        sel = order[cut]
        return pa.table({
            "doc_id": pa.array(ids[pdoc[sel]], pa.int64()),
            "phrase": pa.array(ptext[sel].astype(str), pa.string()),
            "score_q": pa.array(pscore[sel], pa.int64()),
            "rn": pa.array(rn[cut], pa.int64()),
        })

    ds = docs() if callable(docs) else _read_docs(docs, ["doc_id", "text"])
    return ds.map_batches(extract, batch_format="pyarrow")
