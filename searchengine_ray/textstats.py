"""Text-analysis operators: token stats, language id, quality scoring,
winnowing fingerprints. All vectorized `map_batches` stages over the
documents table, each with an exact DuckDB-SQL oracle formulation
(tokenization = the engine's shared analyzer regex `[a-z0-9_]+`).

Vectorization shape: ONE Arrow-kernel tokenization per batch
(`utf8_lower` + `split_pattern_regex` — no per-doc Python regex), then
every statistic is a numpy `bincount`/`lexsort`/`reduceat` over the flat
token stream. Winnowing replaces the former per-k-gram `hashlib.md5`
Python loop with the SAME vectorized FNV-1a-64 token hash + positional
combine the dedup shinglers use (`dedup._shingle_hashes` machinery); the
DuckDB oracle reproduces that hash exactly with a
`list_reduce`-over-codepoints FNV and HUGEINT mod-2^64 arithmetic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .analyze import STOPWORDS

#: per-language marker words for the n-gram-free language-id heuristic
#: (deterministic; ties broken by this ordering)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est"),
    "es": ("el", "la", "los", "de", "y", "que", "es", "una"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "zh": ("de5", "shi4", "le5", "zai4", "you3", "wo3", "ta1", "men5"),
}


def _read_docs(sf_dir: str, doc_ids=None):
    """Streaming (doc_id, text) read; ``doc_ids`` pushes an id filter into
    the parquet scan (row-group pruning) for result-set-sized consumers
    like dedup.keep_best_in_cluster."""
    import ray.data

    kwargs = {}
    if doc_ids is not None:
        import pyarrow.compute as _pc

        kwargs["filter"] = _pc.field("doc_id").isin(
            pa.array(np.asarray(doc_ids, dtype=np.int64))
        )
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"], **kwargs
    )


def flatten_list_column(
    lists, n: int, drop_empty: bool = True
) -> tuple[np.ndarray, pa.Array]:
    """Pre-split ListArray (or ChunkedArray) over ``n`` rows ->
    (row_idx int64 per element, flat element array). The SINGLE copy of
    the offsets/flatten/repeat scaffolding every flat-stream kernel uses
    (tokens, whitespace words, lines): slice-offset-safe
    (``offsets - offsets[0]``), optionally dropping empty-string elements
    (the leading/trailing/consecutive-separator artifacts of splits)."""
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    offsets = lists.offsets.to_numpy()
    offsets = offsets - offsets[0]  # slice-offset-safe
    flat = lists.flatten()
    row_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    if not drop_empty:
        return row_idx, flat
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return row_idx[keep], flat.filter(pa.array(keep))


def _flat_tokens(t: pa.Table) -> tuple[int, np.ndarray, pa.Array]:
    """Batch -> (n_docs, doc_idx int64 per token, flat token StringArray).

    One Arrow lowercase + regex-split over the whole column; empty splits
    (leading/trailing/consecutive separators) are dropped, making the token
    stream identical to ``TOKEN_RE.findall`` per doc.
    """
    n = t.num_rows
    low = pc.utf8_lower(t.column("text"))
    lists = pc.split_pattern_regex(low, pattern="[^a-z0-9_]+")
    doc_idx, flat = flatten_list_column(lists, n)
    return n, doc_idx, flat


def token_stats(sf_dir: str):
    """(doc_id, n_tokens, n_unique, n_stop) — exact integers."""
    ds = _read_docs(sf_dir)
    stop_arr = pa.array(sorted(STOPWORDS))

    def stats(t: pa.Table) -> pa.Table:
        n, doc_idx, flat = _flat_tokens(t)
        n_tok = np.bincount(doc_idx, minlength=n).astype(np.int64)
        stop_np = pc.is_in(flat, value_set=stop_arr).to_numpy(
            zero_copy_only=False
        )
        n_stop = np.bincount(doc_idx[stop_np], minlength=n).astype(np.int64)
        # distinct per doc: dictionary codes, one lexsort, boundary count
        codes = flat.dictionary_encode().indices.to_numpy()
        if len(codes):
            order = np.lexsort((codes, doc_idx))
            dd, cc = doc_idx[order], codes[order]
            first = np.empty(len(dd), dtype=bool)
            first[0] = True
            first[1:] = (dd[1:] != dd[:-1]) | (cc[1:] != cc[:-1])
            n_uniq = np.bincount(dd[first], minlength=n).astype(np.int64)
        else:
            n_uniq = np.zeros(n, dtype=np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
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
    marker_arrs = [pa.array(sorted(LANG_MARKERS[lg])) for lg in langs]

    def classify(t: pa.Table) -> pa.Table:
        n, doc_idx, flat = _flat_tokens(t)
        counts = np.zeros((len(langs), n), dtype=np.int64)
        for li, arr in enumerate(marker_arrs):
            hit = pc.is_in(flat, value_set=arr).to_numpy(zero_copy_only=False)
            counts[li] = np.bincount(doc_idx[hit], minlength=n)
        best = counts.max(axis=0)
        # argmax picks the FIRST max -> LANG_MARKERS insertion-order ties
        pick = np.argmax(counts, axis=0)
        preds = np.where(
            best > 0, np.asarray(langs, dtype=object)[pick], "und"
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang_pred": pa.array(preds, type=pa.string()),
            }
        )

    return ds.map_batches(classify, batch_format="pyarrow")


def quality_score(sf_dir: str, min_tokens: int = 20, doc_ids=None):
    """(doc_id, n_tokens, stop_ratio_micro, mean_token_len_micro, passes)
    quality gate (Gopher-rules-style length/stopword filter).

    Ratios are integer micro-units via floor division so the DuckDB oracle
    reproduces them bit-exactly (float rounding modes differ between
    libraries); ``passes`` = n_tokens >= min AND 2*n_stop <= n_tokens
    (stopword ratio <= 0.5, integer comparison).
    """
    ds = _read_docs(sf_dir, doc_ids=doc_ids)
    stop_arr = pa.array(sorted(STOPWORDS))

    def score(t: pa.Table) -> pa.Table:
        n, doc_idx, flat = _flat_tokens(t)
        n_tok = np.bincount(doc_idx, minlength=n).astype(np.int64)
        stop_np = pc.is_in(flat, value_set=stop_arr).to_numpy(
            zero_copy_only=False
        )
        n_stop = np.bincount(doc_idx[stop_np], minlength=n).astype(np.int64)
        tlen = pc.utf8_length(flat).to_numpy().astype(np.int64)
        n_chars = np.bincount(doc_idx, weights=tlen, minlength=n).astype(
            np.int64
        )
        nz = np.maximum(n_tok, 1)  # guard empty docs; ratios stay 0 via * 0
        has = (n_tok > 0).astype(np.int64)
        ratio = (n_stop * 1_000_000) // nz * has
        mean_len = (n_chars * 1_000_000) // nz * has
        passes = (n_tok >= min_tokens) & (2 * n_stop <= n_tok)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(n_tok, type=pa.int64()),
                "stop_ratio_micro": pa.array(ratio, type=pa.int64()),
                "mean_token_len_micro": pa.array(mean_len, type=pa.int64()),
                "passes": pa.array(passes, type=pa.bool_()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


#: BPE-ish pre-tokenizer (GPT-2-style contraction/letter-run/digit-run/
#: punctuation-run pieces, lookahead-free so RE2 — pyarrow AND DuckDB —
#: and Python `re` agree on it exactly)
BPE_PIECE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+|\s"


def token_counts(sf_dir: str):
    """(doc_id, n_ws_tokens, n_bpe_pieces): whitespace token count and a
    BPE-ish piece count — the cheap length signals an LLM data pipeline
    filters/buckets on before real tokenization.

    Both counts are single Arrow ``count_substring_regex`` kernels (RE2),
    and the DuckDB oracle runs the IDENTICAL patterns, so the gate is
    bit-exact with zero per-row Python."""
    ds = _read_docs(sf_dir)

    def count(t: pa.Table) -> pa.Table:
        text = t.column("text")
        low = pc.utf8_lower(text)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_ws_tokens": pc.cast(
                    pc.count_substring_regex(text, r"\S+"), pa.int64()
                ),
                "n_bpe_pieces": pc.cast(
                    pc.count_substring_regex(low, BPE_PIECE_RE), pa.int64()
                ),
            }
        )

    return ds.map_batches(count, batch_format="pyarrow")


def winnow_fingerprints(sf_dir: str, k: int = 3, w: int = 4):
    """Winnowing document fingerprints (Schleimer et al. local fingerprinting):
    FNV-combined hash of each k-gram, minimum per sliding window of w,
    distinct minima.

    Returns (doc_id, n_fingerprints, min_fp). ``min_fp`` is the minimum
    fingerprint as a 16-digit zero-padded hex string, so lexicographic and
    numeric (uint64) order agree and the DuckDB oracle (same FNV-1a-64 per
    token via list_reduce, same positional combine mod 2^64) reproduces it
    bit-exactly. The per-k-gram hash is the dedup shingler's vectorized
    combine — token hashes memoized per unique surface form, gram hashes and
    window minima ONE numpy pass per batch (scatter into a doc-boundary
    max-padded array + sliding_window_view; the former implementation
    md5'd every k-gram in Python per doc).
    """
    ds = _read_docs(sf_dir)

    def fp(t: pa.Table) -> pa.Table:
        n = t.num_rows
        n_fp = np.zeros(n, dtype=np.int64)
        min_fp = np.full(n, "", dtype=object)
        dd, mm = _winnow_doc_fps(t, k, w)
        if len(dd):
            n_fp = np.bincount(dd, minlength=n).astype(np.int64)
            doc_first = np.empty(len(dd), dtype=bool)
            doc_first[0] = True
            doc_first[1:] = dd[1:] != dd[:-1]
            for di, v in zip(dd[doc_first], mm[doc_first]):
                min_fp[di] = f"{int(v):016x}"
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_fingerprints": pa.array(n_fp, type=pa.int64()),
                "min_fp": pa.array(min_fp, type=pa.string()),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")


def _winnow_doc_fps(
    t: pa.Table, k: int, w: int
) -> "tuple[np.ndarray, np.ndarray]":
    """Shared winnowing kernel: distinct (doc_row_index, fingerprint)
    pairs for a batch, sorted by (doc_row_index, fingerprint) — the
    vectorized scatter/sliding-window pass `winnow_fingerprints`
    documents, factored out so `dedup.winnow_pairs` joins on the same
    bit-exact fingerprint stream."""
    from .dedup import _POS_MIX, _term_hash64

    pad = np.iinfo(np.uint64).max
    n, doc_idx, flat = _flat_tokens(t)
    empty = (np.empty(0, np.int64), np.empty(0, np.uint64))
    if len(doc_idx) >= k:
            # hash only the UNIQUE surface forms, broadcast through codes
            d = flat.dictionary_encode()
            uniq = d.dictionary.to_pylist()
            uh = np.fromiter(
                (_term_hash64(x) for x in uniq), dtype=np.uint64,
                count=len(uniq),
            )
            seq = uh[d.indices.to_numpy()]
            # ONE global k-gram combine over the whole batch; grams that
            # cross a doc boundary are computed then discarded (cheaper
            # than segmenting the token stream first)
            m = len(seq) - k + 1
            h = np.zeros(m, dtype=np.uint64)
            for j in range(k):
                h = h * _POS_MIX[j % len(_POS_MIX)] + seq[j : j + m]
            valid = doc_idx[:m] == doc_idx[k - 1 :]
            gram_doc = doc_idx[:m][valid]
            gh = h[valid]
            if len(gh):
                # per-doc truncated trailing windows via (w-1) max-pads
                # between docs: gram i scatters to i + doc*(w-1);
                # sliding_window_view minima at those positions == the
                # oracle's ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING
                # partitioned by doc_id
                pos = (
                    np.arange(len(gh), dtype=np.int64) + gram_doc * (w - 1)
                )
                padded = np.full(int(pos[-1]) + w, pad, dtype=np.uint64)
                padded[pos] = gh
                mins = np.lib.stride_tricks.sliding_window_view(
                    padded, w
                ).min(axis=1)[pos]
                # distinct minima per doc: one lexsort + boundary scan
                order = np.lexsort((mins, gram_doc))
                dd, mm = gram_doc[order], mins[order]
                first = np.empty(len(dd), dtype=bool)
                first[0] = True
                first[1:] = (dd[1:] != dd[:-1]) | (mm[1:] != mm[:-1])
                return dd[first], mm[first]
    return empty




def _distinct_bigram_counts(
    doc_idx: np.ndarray, codes: np.ndarray, n: int
) -> "tuple[np.ndarray, np.ndarray]":
    """Per-doc (n_bigrams, n_distinct_bigrams) from batch-local
    dictionary codes — the collision-free int64 pack (a * V + b) + one
    lexsort + boundary count. Shared by `distinct_ngrams` and
    `qualityclf.features_batch` so the kernel and its DuckDB oracle stay
    bit-identical in one place."""
    if len(codes) == 0:
        z = np.zeros(n, dtype=np.int64)
        return z, z.copy()
    vocab = int(codes.max()) + 1
    adj = np.flatnonzero(doc_idx[1:] == doc_idx[:-1])
    n_bg = np.bincount(doc_idx[adj], minlength=n).astype(np.int64)
    if len(adj):
        key = codes[adj] * np.int64(vocab) + codes[adj + 1]
        dd = doc_idx[adj]
        order = np.lexsort((key, dd))
        dd, kk = dd[order], key[order]
        first = np.empty(len(dd), dtype=bool)
        first[0] = True
        first[1:] = (dd[1:] != dd[:-1]) | (kk[1:] != kk[:-1])
        n_dist = np.bincount(dd[first], minlength=n).astype(np.int64)
    else:
        n_dist = np.zeros(n, dtype=np.int64)
    return n_bg, n_dist


def distinct_ngrams(sf_dir: str):
    """(doc_id, n_bigrams, n_distinct_bigrams) — the distinct-n-gram
    diversity signal (type/token ratio at n=2; the self-repetition
    measure generation-data curation pairs with `token_stats`'s unigram
    n_unique). Exact integers, shuffle-free per-doc scan.

    Vectorization: batch-local dictionary codes pack each bigram into
    ONE int64 key (a * V + b with V the batch vocab size — exact, no
    hash collisions), one lexsort + boundary count per batch.
    """
    ds = _read_docs(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        n, doc_idx, flat = _flat_tokens(t)
        codes = flat.dictionary_encode().indices.to_numpy().astype(np.int64)
        n_bg, n_dist = _distinct_bigram_counts(doc_idx, codes, n)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_bigrams": pa.array(n_bg, type=pa.int64()),
                "n_distinct_bigrams": pa.array(n_dist, type=pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


FEATURE_HASH_DIM = 64


def feature_hashing(sf_dir: str, dim: int = FEATURE_HASH_DIM):
    """Feature-hashing term-frequency vectors (the hashing trick —
    sklearn HashingVectorizer / Spark HashingTF): each token maps to
    bucket ``fnv1a64(token) % dim`` and per-doc bucket counts form a
    fixed-width sparse vector regardless of vocabulary size — the
    stateless vectorizer a 100 TB corpus wants (no vocabulary build, no
    broadcast dictionary, re-partition/resume-stable).

    Returns nonzero entries only: (doc_id, bucket, n). Shuffle-free
    per-doc scan; hashes are computed once per UNIQUE batch surface form
    and broadcast through dictionary codes.
    """
    from .dedup import _term_hash64

    if dim < 2:
        raise ValueError("feature_hashing needs dim >= 2")
    ds = _read_docs(sf_dir)

    def vec(t: pa.Table) -> pa.Table:
        n, doc_idx, flat = _flat_tokens(t)
        if len(doc_idx) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        d = flat.dictionary_encode()
        uniq = d.dictionary.to_pylist()
        ub = np.fromiter(
            (_term_hash64(x) % dim for x in uniq), dtype=np.int64,
            count=len(uniq),
        )
        bucket = ub[d.indices.to_numpy()]
        ids = t.column("doc_id").to_numpy()
        key = doc_idx * np.int64(dim) + bucket
        cnt = np.bincount(key, minlength=n * dim).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "doc_id": pa.array(ids[nz // dim], pa.int64()),
                "bucket": pa.array(nz % dim, pa.int64()),
                "n": pa.array(cnt[nz], pa.int64()),
            }
        )

    return ds.map_batches(vec, batch_format="pyarrow")
