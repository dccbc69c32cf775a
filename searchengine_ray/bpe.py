"""Byte-pair-encoding tokenizer (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") — the tokenization step a
training-data pipeline runs after curation, implemented Ray-Data-first:

- TRAIN on a small deterministic reference slice of the corpus
  (splitmix64(doc_id, seed) %% 100 < ref_pct — the stand-in for a curated
  tokenizer-training set): word frequencies via one per-batch combiner +
  groupby-sum whose output is vocabulary-sized, collected to the driver
  under an explicit ``max_words`` guard; then the classic greedy merge
  loop — most frequent adjacent symbol pair, ties to the
  lexicographically smallest (left, right) pair — except every counting
  and merging step is a flat numpy pass over ALL words at once, never a
  per-word Python loop.
- APPLY to the full corpus as an embarrassingly-parallel ``map_batches``
  scan: batch-dictionary-encode the token stream, BPE the batch-DISTINCT
  words with the same vectorized merge passes, then one gather + segment
  sum per doc. The merge table broadcasts once via ``ray.put``.

Merge-application semantics (identical in training, application, and the
DuckDB oracle): one merge rank at a time, taking matches LEFT-TO-RIGHT
NON-OVERLAPPING within each word — for a pair (a, a) a run of k equal
symbols merges floor(k/2) times leftmost-first; for a != b matches can
never overlap. This is exactly SQL ``replace()``'s scan-and-skip
behaviour on the double-separator string encoding the oracle uses
(``__ray_entry__._bpe_sql``), so the gate checks the whole apply chain
with the trained merge table inlined as literals (the engine-state-as-
literals pattern of the IVF/SemDeDup/LeToR oracles; the merges derive
from (seed, corpus) alone). Pair COUNTING during training follows
Sennrich: every adjacent position counts, so 'aaa' contributes (a, a)
twice; only the chosen merge's application uses the non-overlap rule.

Reference anchor: the reference engine tokenizes with Lucene analyzers
(HW1-6 QryEval `DocLengthStore`/analyzer chain); BPE is the
beyond-reference tokenization operator mandated by the LLM-pipeline
surface (token counting next to `textstats.token_counts`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .sketch import _hash64

#: fixed base-symbol alphabet — analyzer tokens only ever contain these.
ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789_"
BPE_SEED = 29
BPE_REF_PCT = 5
BPE_N_MERGES = 80
BPE_MAX_WORDS = 2_000_000  # guard: max distinct words collected to driver

_CHAR_ID = {c: i for i, c in enumerate(ALPHABET)}


def _encode_words(words: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Words -> (flat base-symbol ids int64, word index per symbol)."""
    if not words:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    lens = np.fromiter((len(w) for w in words), np.int64, count=len(words))
    flat = "".join(words)
    try:
        raw = flat.encode("ascii")
    except UnicodeEncodeError as e:
        raise ValueError(
            "word contains character outside [a-z0-9_]"
        ) from e
    sym = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
    lut = np.full(128, -1, np.int64)
    for c, i in _CHAR_ID.items():
        lut[ord(c)] = i
    sym = lut[sym]
    if (sym < 0).any():
        raise ValueError("word contains character outside [a-z0-9_]")
    widx = np.repeat(np.arange(len(words), dtype=np.int64), lens)
    return sym, widx


def _merge_pass(
    sym: np.ndarray, widx: np.ndarray, a: int, b: int, new_id: int
) -> tuple[np.ndarray, np.ndarray]:
    """One vectorized left-to-right non-overlapping merge of (a, b) ->
    new_id across the whole flat symbol array (word-boundary aware)."""
    if len(sym) < 2:
        return sym, widx
    m = (sym[:-1] == a) & (sym[1:] == b) & (widx[:-1] == widx[1:])
    if not m.any():
        return sym, widx
    if a == b:
        # overlap chains only exist for equal pairs: within each run of
        # consecutive matches keep every other one (leftmost first)
        start = m.copy()
        start[1:] &= ~m[:-1]
        run_id = np.cumsum(start) - 1
        idx = np.arange(len(m))
        first_idx = idx[start]
        pos_in_run = idx - first_idx[np.maximum(run_id, 0)]
        keep = m & (pos_in_run % 2 == 0)
    else:
        keep = m
    p = np.flatnonzero(keep)
    sym = sym.copy()
    sym[p] = new_id
    drop = np.zeros(len(sym), dtype=bool)
    drop[p + 1] = True
    return sym[~drop], widx[~drop]


def train_bpe(
    words: list[str], freqs: np.ndarray, n_merges: int = BPE_N_MERGES
) -> list[tuple[str, str]]:
    """Greedy BPE training over a (word, frequency) vocabulary. Returns
    the ordered merge list as (left_str, right_str) pairs. Deterministic:
    max total pair frequency, ties to the lexicographically smallest
    (left, right); stops when no pair occurs in >= 2 weighted positions.
    Every iteration is flat numpy over all words (unique + bincount), not
    a per-word loop."""
    sym, widx = _encode_words(words)
    freqs = np.asarray(freqs, dtype=np.int64)
    symtab = list(ALPHABET)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if len(sym) < 2:
            break
        m = widx[:-1] == widx[1:]
        if not m.any():
            break
        k = len(symtab)
        key = sym[:-1][m] * k + sym[1:][m]
        w = freqs[widx[:-1][m]]
        uk, inv = np.unique(key, return_inverse=True)
        cnt = np.bincount(inv, weights=w.astype(np.float64)).astype(np.int64)
        top = int(cnt.max())
        if top < 2:
            break
        cand = uk[cnt == top]
        pair = min(
            (symtab[int(c) // k], symtab[int(c) % k]) for c in cand
        )
        a, b = symtab.index(pair[0]), symtab.index(pair[1])
        new_id = len(symtab)
        symtab.append(pair[0] + pair[1])
        merges.append(pair)
        sym, widx = _merge_pass(sym, widx, a, b, new_id)
    return merges


def apply_bpe_counts(
    words: list[str], merges: list[tuple[str, str]]
) -> np.ndarray:
    """Per-word BPE token counts after applying the ordered merge list —
    the same vectorized passes as training, over all words at once."""
    sym, widx = _encode_words(words)
    symtab = {c: i for i, c in enumerate(ALPHABET)}
    for left, right in merges:
        a, b = symtab[left], symtab[right]
        new_id = len(symtab)
        symtab[left + right] = new_id
        sym, widx = _merge_pass(sym, widx, a, b, new_id)
    return np.bincount(widx, minlength=len(words)).astype(np.int64)


def bpe_token_counts(
    sf_dir: str, ref_pct: int = BPE_REF_PCT, seed: int = BPE_SEED,
    n_merges: int = BPE_N_MERGES, max_words: int = BPE_MAX_WORDS,
):
    """(doc_id, n_tokens, n_bpe_tokens) over the full corpus, with the
    BPE merge table trained on the reference slice. Model-sized broadcast
    state, corpus-sized streaming — the apply scan is dictionary-encoded
    per batch so the merge passes run over batch-DISTINCT words only."""
    import pyarrow.compute as pc
    import ray
    import ray.data

    from .textstats import _flat_tokens

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    empty = pa.table({
        "w": pa.array([], pa.string()),
        "c": pa.array([], pa.int64()),
    })

    def word_counts(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        keep = (_hash64(ids, seed) % np.uint64(100)).astype(np.int64) < ref_pct
        sub = t.filter(pa.array(keep))
        if sub.num_rows == 0:
            return empty
        _, _, flat = _flat_tokens(sub)
        if len(flat) == 0:
            return empty
        denc = flat.dictionary_encode()
        cnt = np.bincount(
            denc.indices.to_numpy(), minlength=len(denc.dictionary)
        ).astype(np.int64)
        return pa.table({
            "w": denc.dictionary,
            "c": pa.array(cnt, type=pa.int64()),
        })

    vocab_ds = (
        ds.map_batches(word_counts, batch_format="pyarrow")
        .groupby("w").sum("c")
    )
    words: list[str] = []
    freqs: list[np.ndarray] = []
    n_rows = 0
    for b in vocab_ds.iter_batches(batch_format="pyarrow", batch_size=None):
        n_rows += b.num_rows
        if n_rows > max_words:
            raise ValueError(
                f"BPE training vocabulary exceeds max_words={max_words}; "
                f"shrink ref_pct or pre-filter rare words"
            )
        words.extend(b.column("w").to_pylist())
        freqs.append(b.column("sum(c)").to_numpy())
    if n_rows == 0:
        raise ValueError("BPE reference slice selected zero documents")
    merges = train_bpe(
        words, np.concatenate(freqs), n_merges=n_merges
    )
    merges_ref = ray.put(merges)

    def score(t: pa.Table) -> pa.Table:
        merges = ray.get(merges_ref)
        nd = t.num_rows
        n_tok = np.zeros(nd, dtype=np.int64)
        n_bpe = np.zeros(nd, dtype=np.int64)
        _, doc_idx, flat = _flat_tokens(t)
        if len(doc_idx):
            denc = flat.dictionary_encode()
            codes = denc.indices.to_numpy()
            per_word = apply_bpe_counts(denc.dictionary.to_pylist(), merges)
            n_tok = np.bincount(doc_idx, minlength=nd).astype(np.int64)
            # exact: counts < 2^25, per-doc sums far below 2^53
            n_bpe = np.bincount(
                doc_idx, weights=per_word[codes].astype(np.float64),
                minlength=nd,
            ).astype(np.int64)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pa.array(n_tok, type=pa.int64()),
            "n_bpe_tokens": pa.array(n_bpe, type=pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")
