"""Training-data curation operators: the selection / scrubbing passes a
large-scale LLM data pipeline runs between dedup and tokenization —
deterministic train/valid/test splitting, per-stratum sampling, per-source
caps, PII redaction, and Gopher-style repetition statistics.

All of them are single vectorized ``map_batches`` passes (Arrow / numpy
kernels, no per-row Python) except the per-source cap, which is the
bounded-dispatch hash-partition + in-partition vectorized rank pattern
shared with ``relational.top_orders_per_customer``. Every operator has an
exact DuckDB oracle in ``__ray_entry__.oracle_sql`` — randomness is
replaced by the splitmix64 hash of a key column (``sketch._hash64``),
which the oracle reproduces with HUGEINT mod-2^64 arithmetic, so sampling
decisions are bit-reproducible AND embarrassingly parallel: a row's fate
depends only on (key, seed), never on which worker or batch saw it. That
is the property that makes the pass restartable and shardable at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .sketch import _hash64

#: default per-language keep-rates (micro-units, 1e6 = keep everything) for
#: stratified sampling — downsample the over-represented head language,
#: keep the tail. Mirrored literally in the oracle SQL.
STRATA_RATES_MICRO: dict[str, int] = {
    "en": 100_000,
    "fr": 500_000,
    "es": 500_000,
    "de": 500_000,
    "zh": 250_000,
}
DEFAULT_RATE_MICRO = 1_000_000

SPLIT_SEED = 7
SAMPLE_SEED = 11

#: PII patterns (RE2 — the SAME engine behind pyarrow.compute and DuckDB's
#: regexp_* functions, so replacements and counts agree bit-exactly).
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PHONE_RE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{1,4}"
IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def _read_docs(sf_dir: str, columns: list[str]):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def split_train_test(
    sf_dir: str, train_pct: int = 80, valid_pct: int = 10,
    seed: int = SPLIT_SEED,
):
    """Deterministic hash split: bucket = splitmix64(doc_id, seed) % 100;
    train/valid/test by bucket range. Returns (doc_id, bucket, split).

    Hash-of-key (not modulo-of-rowindex, not RNG) so the assignment is
    stable under re-partitioning, resumption, and incremental reruns —
    a document keeps its split forever, on any cluster layout.
    """

    def assign(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        bucket = (_hash64(ids, seed) % np.uint64(100)).astype(np.int64)
        split = np.where(
            bucket < train_pct,
            "train",
            np.where(bucket < train_pct + valid_pct, "valid", "test"),
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "bucket": pa.array(bucket, type=pa.int64()),
                "split": pa.array(split, type=pa.string()),
            }
        )

    return _read_docs(sf_dir, ["doc_id"]).map_batches(
        assign, batch_format="pyarrow"
    )


MIXTURE_SEED = 23
#: target corpus-mixture shares in micro-units (DoReMi / The Pile-style
#: domain weights): what fraction of the OUTPUT character budget each
#: language should get. en is down-weighted vs its natural ~43% share;
#: de/es targets exceed their natural share, so their keep rate caps at
#: 1e6 (you cannot over-sample without repetition — this operator only
#: drops; the cap is the honest budget shortfall).
MIXTURE_TARGETS_MICRO: dict[str, int] = {
    "en": 400_000,
    "zh": 150_000,
    "es": 150_000,
    "de": 150_000,
    "fr": 100_000,
}


def mixture_sample(
    sf_dir: str,
    targets_micro: dict[str, int] | None = None,
    seed: int = MIXTURE_SEED,
):
    """Target-mixture rebalancing (the DoReMi / Pile domain-weights
    controller, subsample-only): measure each language's ACTUAL share of
    the character budget, derive the per-language keep rate that moves
    the output toward the target shares, then keep each doc by the usual
    splitmix64 micro-rate draw. Unlike :func:`sample_stratified` (fixed
    operator-constant rates) the rates here are DATA-DERIVED:

        keep_micro[l] = min(1e6, targets_micro[l] * total_chars
                                 // chars[l])

    in exact arbitrary-precision integers (the oracle re-derives them in
    HUGEINT — no rate literals). Languages absent from ``targets_micro``
    drop entirely. Returns the kept (doc_id, lang, n_chars) rows.

    Scale shape: pass 1 is a shuffle-free per-batch (lang, chars) partial
    fold — driver state = n_languages rows, guarded; pass 2 is the same
    stateless hash-filter scan as sample_stratified. Decisions replay
    identically on any re-run or re-shard.
    """
    targets = MIXTURE_TARGETS_MICRO if targets_micro is None else targets_micro

    def partial(t: pa.Table) -> pa.Table:
        langs = t.column("lang").combine_chunks().dictionary_encode()
        chars = pc.utf8_length(t.column("text")).to_numpy().astype(np.int64)
        codes = langs.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # int64 scatter-add (bincount's float weights would round past 2^53)
        sums = np.zeros(len(langs.dictionary), dtype=np.int64)
        np.add.at(sums, codes, chars)
        return pa.table(
            {
                "lang": langs.dictionary,
                "chars": pa.array(sums, pa.int64()),
            }
        )

    rows = (
        _read_docs(sf_dir, ["lang", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    )
    if len(rows) > 100_000:
        raise ValueError(
            f"mixture_sample: {len(rows)} partial rows — lang cardinality "
            "x blocks exceeds the driver-fold guard; pre-bucket languages"
        )
    chars: dict[str, int] = {}
    for r in rows:
        chars[r["lang"]] = chars.get(r["lang"], 0) + int(r["chars"])
    total = sum(chars.values())
    # Python ints: targets*total can pass 2^63 at corpus scale
    rates = {
        lg: min(1_000_000, (targets.get(lg, 0) * total) // c)
        for lg, c in chars.items()
        if c > 0 and targets.get(lg, 0) > 0
    }

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        draw = (_hash64(ids, seed) % np.uint64(1_000_000)).astype(np.int64)
        langs = t.column("lang").to_numpy(zero_copy_only=False)
        thresh = np.fromiter(
            (rates.get(lg, 0) for lg in langs), dtype=np.int64,
            count=len(langs),
        )
        n_chars = pc.utf8_length(t.column("text")).cast(pa.int64())
        out = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang": t.column("lang"),
                "n_chars": n_chars,
            }
        )
        return out.filter(pa.array(draw < thresh))

    return _read_docs(sf_dir, ["doc_id", "lang", "text"]).map_batches(
        keep, batch_format="pyarrow"
    )


def sample_stratified(
    sf_dir: str,
    rates_micro: dict[str, int] | None = None,
    seed: int = SAMPLE_SEED,
):
    """Per-stratum deterministic sampling: keep a row iff
    splitmix64(doc_id, seed) % 1e6 < rate_micro[lang]. Returns the kept
    (doc_id, lang) rows.

    A pure filter — no shuffle, no state, no coordination; the expected
    kept fraction per language is rate/1e6 and the decision replays
    identically on any re-run or re-shard.
    """
    rates = STRATA_RATES_MICRO if rates_micro is None else rates_micro

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        draw = (_hash64(ids, seed) % np.uint64(1_000_000)).astype(np.int64)
        langs = t.column("lang").to_numpy(zero_copy_only=False)
        thresh = np.fromiter(
            (rates.get(lg, DEFAULT_RATE_MICRO) for lg in langs),
            dtype=np.int64,
            count=len(langs),
        )
        return t.filter(pa.array(draw < thresh))

    return _read_docs(sf_dir, ["doc_id", "lang"]).map_batches(
        keep, batch_format="pyarrow"
    )


def _ranked_per_source(sf_dir: str, k: int, order_col: str):
    """Shared bounded-dispatch rank machinery: hash sources into
    input-scaled buckets, ONE vectorized sort + run-length rank per bucket,
    keep rows with rank <= k ordered by ``order_col`` (ties by doc_id).
    Emits (doc_id, source, rn)."""
    import ray.data  # noqa: F401

    from .dedup import _term_hash64
    from .partitioning import partition_count

    ds = _read_docs(sf_dir, ["doc_id", "source"])
    nparts = partition_count(
        f"{sf_dir}/documents.parquet", ("doc_id", "source")
    )

    def prep(t: pa.Table) -> pa.Table:
        d = t.column("source").combine_chunks().dictionary_encode()
        uh = np.fromiter(
            (_term_hash64(s) for s in d.dictionary.to_pylist()),
            dtype=np.uint64,
            count=len(d.dictionary),
        )
        kc = (uh[d.indices.to_numpy()] % np.uint64(nparts)).astype(np.int32)
        return t.append_column("kc", pa.array(kc))

    def rank_partition(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "source": pa.array([], pa.string()),
                "rn": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        t = t.sort_by(
            [
                ("source", "ascending"),
                (order_col, "ascending"),
                ("doc_id", "ascending"),
            ]
        )
        src = t.column("source").to_numpy(zero_copy_only=False)
        new_s = np.empty(len(src), dtype=bool)
        new_s[0] = True
        new_s[1:] = src[1:] != src[:-1]
        starts = np.flatnonzero(new_s)
        rn = np.arange(len(src), dtype=np.int64)
        rn -= np.repeat(starts, np.diff(np.append(starts, len(src))))
        sel = rn < k
        out = t.filter(pa.array(sel)).select(["doc_id", "source"])
        return out.append_column("rn", pa.array(rn[sel] + 1, type=pa.int64()))

    return ds, prep, rank_partition


def cap_per_source(sf_dir: str, k: int = 5):
    """Per-source document cap (the C4/RefinedWeb "at most k documents per
    domain" rule): keep the k lowest-doc_id docs of each source. Returns
    (doc_id, source, rn) with rn in 1..k.

    row_number() OVER (PARTITION BY source ORDER BY doc_id) via the
    bounded-dispatch pattern: sources hash into input-scaled buckets
    (``partitioning.partition_count``), each bucket ranks every source it
    owns in ONE vectorized sort + run-length pass.
    """
    ds, prep, rank_partition = _ranked_per_source(sf_dir, k, "doc_id")
    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("kc")
        .map_groups(rank_partition, batch_format="pyarrow")
    )


RESERVOIR_SEED = 13


def sample_per_source(sf_dir: str, k: int = 3, seed: int = RESERVOIR_SEED):
    """Deterministic per-source reservoir sample: k UNIFORM pseudo-random
    docs per source — rank by splitmix64(doc_id, seed) instead of doc_id,
    so the "random" pick is reproducible, subset-stable, and
    coordination-free (the distributed equivalent of reservoir sampling
    with a fixed seed). Returns (doc_id, source, rn); rn orders the sample
    by draw value.
    """
    ds, _, rank_partition = _ranked_per_source(sf_dir, k, "draw")

    from .dedup import _term_hash64
    from .partitioning import partition_count

    nparts = partition_count(
        f"{sf_dir}/documents.parquet", ("doc_id", "source")
    )

    def prep(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        # int64-safe draw: clear the top bit so Arrow stores plain int64
        draw = (_hash64(ids, seed) >> np.uint64(1)).astype(np.int64)
        d = t.column("source").combine_chunks().dictionary_encode()
        uh = np.fromiter(
            (_term_hash64(s) for s in d.dictionary.to_pylist()),
            dtype=np.uint64,
            count=len(d.dictionary),
        )
        kc = (uh[d.indices.to_numpy()] % np.uint64(nparts)).astype(np.int32)
        t = t.append_column("draw", pa.array(draw, type=pa.int64()))
        return t.append_column("kc", pa.array(kc))

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("kc")
        .map_groups(rank_partition, batch_format="pyarrow")
    )


def _with_contact(t: pa.Table) -> pa.Array:
    """text + a deterministic synthetic contact line derived from doc_id.

    The sf corpora contain no real PII (closed 29-word vocabulary), so the
    gate entry plants one email, one phone, and one IPv4 per document —
    derived from doc_id, mirrored by `||`-concatenation in the oracle SQL —
    and the redactor must find and replace exactly those.
    """
    ids = t.column("doc_id")
    s = pc.cast(ids, pa.string())
    s4 = pc.cast(pc.bit_wise_and(ids, pa.scalar(4095)), pa.string())
    s8 = pc.cast(pc.bit_wise_and(ids, pa.scalar(255)), pa.string())
    return pc.binary_join_element_wise(
        t.column("text"),
        " contact user", s, "@example.com phone +1-555-", s4,
        " host 10.", s8, ".0.1 end",
        "",
    )


def redact_batch(text: pa.Array) -> dict[str, pa.Array]:
    """Redact emails, then phones, then IPv4s (fixed order — patterns are
    applied to the output of the previous replacement). Counts are
    non-overlapping leftmost matches on the ORIGINAL text. All four outputs
    are single Arrow RE2 kernels."""
    n_email = pc.cast(pc.count_substring_regex(text, EMAIL_RE), pa.int64())
    n_phone = pc.cast(pc.count_substring_regex(text, PHONE_RE), pa.int64())
    n_ip = pc.cast(pc.count_substring_regex(text, IP_RE), pa.int64())
    red = pc.replace_substring_regex(text, EMAIL_RE, "<EMAIL>")
    red = pc.replace_substring_regex(red, PHONE_RE, "<PHONE>")
    red = pc.replace_substring_regex(red, IP_RE, "<IP>")
    return {
        "redacted": red,
        "n_email": n_email,
        "n_phone": n_phone,
        "n_ip": n_ip,
    }


def pii_redact(sf_dir: str):
    """PII scrub over the documents table (with planted deterministic PII,
    see _with_contact). Returns (doc_id, redacted, n_email, n_phone, n_ip).
    """

    def scrub(t: pa.Table) -> pa.Table:
        full = _with_contact(t)
        out = redact_batch(full)
        return pa.table({"doc_id": t.column("doc_id"), **out})

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        scrub, batch_format="pyarrow"
    )


def repetition_stats(sf_dir: str):
    """Gopher-style repetition signals: per doc, the total and
    most-frequent-element counts for unigrams and bigrams — the inputs to
    "fraction of tokens in the top n-gram" repetition filters. Returns
    (doc_id, n_tokens, top_token_count, n_bigrams, top_bigram_count), all
    exact int64 (ratio thresholds are the consumer's choice; integers keep
    the oracle bit-exact).

    One flat-token pass per batch: dictionary codes + ONE lexsort for
    unigram runs, adjacent-pair keys + ONE lexsort for bigram runs.
    """
    from .textstats import _flat_tokens

    def stats(t: pa.Table) -> pa.Table:
        n, doc_idx, flat = _flat_tokens(t)
        n_tok = np.bincount(doc_idx, minlength=n).astype(np.int64)
        top_tok = np.zeros(n, dtype=np.int64)
        n_big = np.zeros(n, dtype=np.int64)
        top_big = np.zeros(n, dtype=np.int64)
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        if len(codes):
            top_tok = _top_run_count(doc_idx, codes, n)
        if len(codes) > 1:
            adj = doc_idx[1:] == doc_idx[:-1]
            big_doc = doc_idx[:-1][adj]
            v = len(enc.dictionary)
            big_key = codes[:-1][adj] * np.int64(v) + codes[1:][adj]
            n_big = np.bincount(big_doc, minlength=n).astype(np.int64)
            if len(big_key):
                top_big = _top_run_count(big_doc, big_key, n)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(n_tok, type=pa.int64()),
                "top_token_count": pa.array(top_tok, type=pa.int64()),
                "n_bigrams": pa.array(n_big, type=pa.int64()),
                "top_bigram_count": pa.array(top_big, type=pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow"
    )


QUANTILE_PCTS = (50, 90, 99)


def length_quantiles(sf_dir: str):
    """Exact per-language length quantiles (p50/p90/p99 of n_chars) — the
    corpus-profiling pass that sizes batch/token budgets downstream.

    Scale-safe EXACT algorithm for integer-valued bounded-domain columns:
    per-batch partial (lang, n_chars) counts (combiner BEFORE the shuffle)
    -> one small groupby(lang, n_chars) Sum -> per-lang quantiles off the
    value histogram. The shuffle carries at most |langs| x |distinct
    lengths| rows regardless of corpus size — never a row per document.
    Quantile definition (mirrored in the oracle): ascending value at index
    (n-1)*pct//100 (lower interpolation, pure integers). Returns
    (lang, n_docs, p50_chars, p90_chars, p99_chars).
    """
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )

    def partial(t: pa.Table) -> pa.Table:
        enc = t.column("lang").combine_chunks().dictionary_encode()
        langs = enc.dictionary
        lc = enc.indices.to_numpy().astype(np.int64)
        nc = t.column("n_chars").to_numpy()
        # combine (lang, n_chars) inside the batch: one lexsort + run count
        order = np.lexsort((nc, lc))
        ls, vs = lc[order], nc[order]
        new = np.empty(len(ls), dtype=bool)
        if len(ls) == 0:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "n_chars": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        new[0] = True
        new[1:] = (ls[1:] != ls[:-1]) | (vs[1:] != vs[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(ls)))
        return pa.table(
            {
                "lang": langs.take(pa.array(ls[starts])),
                "n_chars": pa.array(vs[starts], type=pa.int64()),
                "cnt": pa.array(cnt, type=pa.int64()),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def quantiles(g: pa.Table) -> pa.Table:
        g = g.sort_by([("n_chars", "ascending")])
        vals = g.column("n_chars").to_numpy()
        cnt = g.column("cnt").to_numpy()
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        out = {"lang": g.column("lang").slice(0, 1),
               "n_docs": pa.array([n], type=pa.int64())}
        for pct in QUANTILE_PCTS:
            idx = (n - 1) * pct // 100
            v = int(vals[np.searchsorted(cum, idx + 1)])
            out[f"p{pct}_chars"] = pa.array([v], type=pa.int64())
        return pa.table(out)

    return hist.groupby("lang").map_groups(quantiles, batch_format="pyarrow")


DECONTAM_N = 8


def decontaminate(sf_dir: str, n: int = DECONTAM_N,
                  train_pct: int = 80, valid_pct: int = 10,
                  seed: int = SPLIT_SEED):
    """Benchmark decontamination (the GPT-3 appendix-C / PaLM rule): flag
    every non-test document that shares at least one n-gram with the held-out
    test split, so evaluation data can be scrubbed from the training set.
    Returns the contaminated docs as (doc_id, n_hits) where n_hits is the
    doc's count of DISTINCT n-grams also present in the benchmark side.

    Scale shape: the benchmark side is small BY CONSTRUCTION (it's an eval
    set), so its distinct shingle hashes stream to a bounded driver fold
    (per-batch ``np.unique`` partials -> one merge) and broadcast ONCE via
    ``ray.put`` as a sorted int64 array; the 100-TB training side is then a
    single embarrassingly-parallel ``map_batches`` scan — per-batch
    vectorized ``searchsorted`` membership, no shuffle at all. Shingles are
    the 64-bit token-hash combines from :func:`dedup._shingle_hashes`
    (never strings); the oracle builds the same pairs from the actual
    n-gram strings, which also guards against hash collisions.
    Split assignment reuses :func:`split_train_test`'s splitmix64 bucket,
    so a doc's benchmark/train side is stable under any re-partitioning.
    """
    import ray

    from .dedup import _batch_shingles

    test_lo = np.uint64(train_pct + valid_pct)
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def bench_partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        is_test = (_hash64(ids, seed) % np.uint64(100)) >= test_lo
        sub = t.filter(pa.array(is_test))
        # batch-flat shingler (one Arrow tokenize per batch, no per-doc
        # Python); batch-wide distinct for the fold
        _gdoc, gh = _batch_shingles(sub, n, distinct=False)
        u = np.unique(gh)
        return pa.table({"sh": pa.array(u.view(np.int64), type=pa.int64())})

    parts = [
        b.column("sh").to_numpy()
        for b in ds.map_batches(bench_partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    bench = (np.unique(np.concatenate(parts)) if parts
             else np.empty(0, dtype=np.int64))
    bench_ref = ray.put(bench)  # sorted; zero-copy reads in every task

    def scan(t: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        ids = t.column("doc_id").to_numpy()
        nontest = (_hash64(ids, seed) % np.uint64(100)) < test_lo
        rows = np.flatnonzero(nontest)
        gdoc, gh = _batch_shingles(t.filter(pa.array(nontest)), n)
        if not len(gh):
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_hits": pa.array([], pa.int64())}
            )
        h = gh.view(np.int64)
        ow = rows[gdoc]  # back to original batch row indices
        idx = np.searchsorted(bench, h)
        ok = idx < len(bench)
        hit = np.zeros(len(h), dtype=bool)
        hit[ok] = bench[idx[ok]] == h[ok]
        cnt = np.bincount(ow[hit], minlength=len(ids))
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "doc_id": pa.array(ids[nz], type=pa.int64()),
                "n_hits": pa.array(cnt[nz], type=pa.int64()),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow")


PACK_SEED = 13
PACK_BUDGET = 512


def pack_sequences(sf_dir: str, budget: int = PACK_BUDGET, parts: int = 8,
                   seed: int = PACK_SEED):
    """Sequence packing (the T5/GPT training-data step): greedily pack
    documents into fixed ``budget``-token windows so training batches waste
    no pad tokens. Returns (doc_id, part, bin_id, tok_offset, n_tokens).

    Packing is sequential by nature (each placement depends on the running
    fill), so the scale shape is hash-partition parallelism: docs shard by
    splitmix64(doc_id) into ``parts`` independent packing streams, each
    packed by a deterministic in-order greedy (doc_id ascending; a doc
    opens a new bin iff it doesn't fit the current fill; over-budget docs
    occupy a bin alone). Shard count is part of the OUTPUT contract (bin
    ids are per-shard), so it is an explicit parameter, not input-derived:
    at 100 TB you pick parts ~ cluster width and each stream stays an O(n)
    integer scan. Only (doc_id, n_tokens, part) ever shuffles — token
    counts come from one vectorized Arrow RE2 pass; text never leaves the
    count stage.
    """
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def count_and_part(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        n = pc.count_substring_regex(
            pc.utf8_lower(t.column("text")), "[a-z0-9_]+"
        ).to_numpy().astype(np.int64)
        part = (_hash64(ids, seed) % np.uint64(parts)).astype(np.int32)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "part": pa.array(part, type=pa.int32()),
                "n_tokens": pa.array(n, type=pa.int64()),
            }
        )

    def pack(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy()
        n = g.column("n_tokens").to_numpy()
        o = np.argsort(ids)
        ids, n = ids[o], n[o]
        bins = np.empty(len(ids), dtype=np.int64)
        offs = np.empty(len(ids), dtype=np.int64)
        b = 0
        fill = 0
        for i in range(len(ids)):  # O(n) int ops; sequential by definition
            if i and fill + n[i] <= budget:
                offs[i] = fill
                fill += n[i]
            else:
                if i:
                    b += 1
                offs[i] = 0
                fill = n[i]
            bins[i] = b
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "part": pa.array(
                    np.full(len(ids), g.column("part")[0].as_py(),
                            dtype=np.int32),
                    type=pa.int32(),
                ),
                "bin_id": pa.array(bins, type=pa.int64()),
                "tok_offset": pa.array(offs, type=pa.int64()),
                "n_tokens": pa.array(n, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(count_and_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pack, batch_format="pyarrow")
    )


def _top_run_count(doc_idx: np.ndarray, keys: np.ndarray, n: int) -> np.ndarray:
    """max run length per doc after sorting by (doc, key) — i.e. the count
    of the most frequent key within each doc. Vectorized: one lexsort, run
    boundaries, scatter-max."""
    order = np.lexsort((keys, doc_idx))
    dd, kk = doc_idx[order], keys[order]
    new = np.empty(len(dd), dtype=bool)
    new[0] = True
    new[1:] = (dd[1:] != dd[:-1]) | (kk[1:] != kk[:-1])
    starts = np.flatnonzero(new)
    run_len = np.diff(np.append(starts, len(dd)))
    out = np.zeros(n, dtype=np.int64)
    np.maximum.at(out, dd[starts], run_len)
    return out


# ---------------------------------------------------------------------------
# cross-document boilerplate n-gram scrub (CCNet / RefinedWeb-style) and
# within-document duplicate-n-gram character coverage (Gopher rule)
# ---------------------------------------------------------------------------

#: scrub defaults: trigrams, boilerplate iff df > num_docs // SCRUB_DF_DEN
SCRUB_N = 3
SCRUB_DF_DEN = 100
#: hard cap on the broadcast frequent-gram set (see scale note below)
SCRUB_MAX_FREQUENT = 2_000_000


def _positional_gram_hashes(
    doc_idx: np.ndarray, flat: pa.Array, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Positional (non-deduplicated) n-gram hashes over a batch-flat token
    stream: returns (hash uint64, flat start position int64) for every
    n-gram that lies entirely inside one document. The hash is the SAME
    token-FNV + ``_POS_MIX`` combine as :func:`dedup._shingle_hashes`, but
    computed batch-wide: each UNIQUE token is FNV-hashed once (dictionary
    encode), then the n shifted hash streams combine mod 2^64 — no per-doc
    Python loop. Doc boundaries are respected by masking start positions
    whose window crosses into the next doc_idx."""
    from .dedup import _POS_MIX, _term_hash64

    m = len(doc_idx) - n + 1
    if m <= 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy().astype(np.int64)
    vocab = enc.dictionary.to_pylist()
    vh = np.fromiter(
        (_term_hash64(t) for t in vocab), dtype=np.uint64, count=len(vocab)
    )
    seq = vh[codes]
    h = np.zeros(m, dtype=np.uint64)
    for k in range(n):
        h = h * _POS_MIX[k % len(_POS_MIX)] + seq[k : k + m]  # wraps mod 2^64
    valid = doc_idx[:m] == doc_idx[n - 1 :]
    return h[valid], np.flatnonzero(valid).astype(np.int64)


def _cover_mask(starts: np.ndarray, n: int, total: int) -> np.ndarray:
    """Union of [s, s+n) intervals as a bool mask over ``total`` positions,
    via a difference array — O(starts + total), no per-interval loop."""
    d = np.zeros(total + 1, dtype=np.int64)
    np.add.at(d, starts, 1)
    np.add.at(d, starts + n, -1)
    return np.cumsum(d[:total]) > 0


def scrub_frequent_ngrams(
    sf_dir: str, n: int = SCRUB_N, df_den: int = SCRUB_DF_DEN,
    max_frequent: int = SCRUB_MAX_FREQUENT,
):
    """Cross-corpus boilerplate removal (the CCNet / RefinedWeb duplicated-
    span rule, over analyzer tokens): an n-gram is boilerplate iff its
    document frequency exceeds ``num_docs // df_den``; every token covered
    by at least one boilerplate n-gram occurrence is dropped, and the doc
    is re-emitted as (doc_id, n_tokens, n_removed, clean_text) with
    clean_text = the surviving tokens joined by single spaces ('' when
    everything was boilerplate).

    Scale shape — two passes, ONE narrow shuffle, ONE bounded broadcast:
    pass 1 ships only distinct (gram-hash, partial-df) int rows per batch
    into a groupby-sum (never strings, never positions); the frequent set
    is then provably bounded INDEPENDENT of corpus size: grams with
    df > N/df_den number at most df_den * mean_grams_per_doc (total gram
    occurrences / threshold), so it broadcasts once via ``ray.put`` as a
    sorted uint64 array (guarded by ``max_frequent``). Pass 2 is an
    embarrassingly-parallel scan: vectorized searchsorted membership,
    difference-array coverage, Arrow list-rebuild + ``binary_join`` — no
    per-row Python in either pass. Gram identity is the 64-bit token-hash
    combine; the DuckDB oracle uses the literal n-gram strings, which also
    guards against hash collisions."""
    import ray

    from .textstats import _flat_tokens

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    num_docs = ds.count()
    thresh = num_docs // df_den

    def partial_df(t: pa.Table) -> pa.Table:
        _, doc_idx, flat = _flat_tokens(t)
        h, pos = _positional_gram_hashes(doc_idx, flat, n)
        if len(h) == 0:
            return pa.table({
                "sh": pa.array([], pa.int64()),
                "pdf": pa.array([], pa.int64()),
            })
        # distinct (doc, gram) pairs; docs never span batches, so batch
        # partials sum to the exact global document frequency
        d = doc_idx[pos]
        order = np.lexsort((d, h))
        hh, dd = h[order], d[order]
        first = np.empty(len(hh), dtype=bool)
        first[0] = True
        first[1:] = (hh[1:] != hh[:-1]) | (dd[1:] != dd[:-1])
        uh, cnt = np.unique(hh[first], return_counts=True)
        return pa.table({
            "sh": pa.array(uh.view(np.int64), type=pa.int64()),
            "pdf": pa.array(cnt, type=pa.int64()),
        })

    df_tbl = (
        ds.map_batches(partial_df, batch_format="pyarrow")
        .groupby("sh")
        .sum("pdf")
    )

    def keep_frequent(t: pa.Table) -> pa.Table:
        keep = pc.greater(t.column("sum(pdf)"), thresh)
        return t.filter(keep).select(["sh"])

    parts = [
        b.column("sh").to_numpy()
        for b in df_tbl.map_batches(keep_frequent, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    freq = (np.unique(np.concatenate(parts)) if parts
            else np.empty(0, dtype=np.int64))
    if len(freq) > max_frequent:
        raise ValueError(
            f"frequent n-gram set {len(freq)} exceeds max_frequent="
            f"{max_frequent}; raise the df threshold (df_den={df_den})"
        )
    freq_ref = ray.put(freq)  # sorted int64 view; zero-copy in every task

    def scrub(t: pa.Table) -> pa.Table:
        freq = ray.get(freq_ref)
        nd, doc_idx, flat = _flat_tokens(t)
        total = len(doc_idx)
        h, pos = _positional_gram_hashes(doc_idx, flat, n)
        if len(h) and len(freq):
            i = np.searchsorted(freq, h.view(np.int64))
            hit = (i < len(freq)) & (freq[np.minimum(i, len(freq) - 1)]
                                     == h.view(np.int64))
            covered = _cover_mask(pos[hit], n, total)
        else:
            covered = np.zeros(total, dtype=bool)
        n_tok = np.bincount(doc_idx, minlength=nd).astype(np.int64)
        n_rm = np.bincount(doc_idx[covered], minlength=nd).astype(np.int64)
        kept = ~covered
        # per-doc list rebuild from kept counts, then one Arrow join kernel
        kept_cnt = np.bincount(doc_idx[kept], minlength=nd)
        offsets = np.zeros(nd + 1, dtype=np.int32)
        np.cumsum(kept_cnt, out=offsets[1:])
        lists = pa.ListArray.from_arrays(
            pa.array(offsets), flat.filter(pa.array(kept))
        )
        clean = pc.binary_join(lists, " ")
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pa.array(n_tok, type=pa.int64()),
            "n_removed": pa.array(n_rm, type=pa.int64()),
            "clean_text": clean,
        })

    return ds.map_batches(scrub, batch_format="pyarrow")


def dup_ngram_chars(sf_dir: str, n: int = SCRUB_N):
    """Within-document duplicate-n-gram character coverage (the Gopher /
    MassiveText repetition rule "fraction of characters in duplicate
    n-grams"): per doc, sum the character lengths of tokens covered by any
    n-gram that occurs >= 2 times WITHIN that doc. Returns (doc_id,
    n_tokens, total_chars, dup_chars) — all exact int64, so the ratio
    threshold stays the consumer's choice and the oracle is bit-exact.

    One embarrassingly-parallel pass, no shuffle: batch-flat tokenization,
    vectorized positional gram hashes, ONE lexsort per batch for
    within-doc occurrence counts, difference-array coverage union."""
    from .textstats import _flat_tokens

    def stats(t: pa.Table) -> pa.Table:
        nd, doc_idx, flat = _flat_tokens(t)
        total = len(doc_idx)
        tok_len = pc.utf8_length(flat).to_numpy().astype(np.int64)
        h, pos = _positional_gram_hashes(doc_idx, flat, n)
        if len(h):
            d = doc_idx[pos]
            order = np.lexsort((h, d))
            dd, hh, pp = d[order], h[order], pos[order]
            new = np.empty(len(dd), dtype=bool)
            new[0] = True
            new[1:] = (dd[1:] != dd[:-1]) | (hh[1:] != hh[:-1])
            run_id = np.cumsum(new) - 1
            run_len = np.bincount(run_id)
            dup_starts = pp[run_len[run_id] >= 2]
            covered = _cover_mask(dup_starts, n, total)
        else:
            covered = np.zeros(total, dtype=bool)
        n_tok = np.bincount(doc_idx, minlength=nd).astype(np.int64)
        tot_ch = np.bincount(
            doc_idx, weights=tok_len, minlength=nd
        ).astype(np.int64)
        dup_ch = np.bincount(
            doc_idx[covered], weights=tok_len[covered], minlength=nd
        ).astype(np.int64)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pa.array(n_tok, type=pa.int64()),
            "total_chars": pa.array(tot_ch, type=pa.int64()),
            "dup_chars": pa.array(dup_ch, type=pa.int64()),
        })

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow"
    )


#: bloom-filter decontamination defaults: 4 hash rows x 2^16 bits each
#: (partitioned Bloom) — k * 2^log2m bits = 32 KiB of state regardless of
#: benchmark size
BLOOM_LOG2M = 16
BLOOM_K = 4


def decontaminate_bloom(
    sf_dir: str, n: int = SCRUB_N,
    train_pct: int = 80, valid_pct: int = 10, seed: int = SPLIT_SEED,
    log2m: int = BLOOM_LOG2M, k: int = BLOOM_K,
):
    """Benchmark decontamination through a BLOOM FILTER — the scale path
    for :func:`decontaminate`: where the exact version broadcasts the full
    sorted benchmark-shingle hash array (fine for eval-set-sized
    benchmarks, linear in their size), this one folds the benchmark side
    into a PARTITIONED Bloom filter — ``k`` independent ``2^log2m``-bit
    rows (32 KiB total at the defaults — CONSTANT in benchmark size) whose
    per-batch partials OR together, and the 100-TB training-side scan
    probes one multiply-shift bucket per row (the count-min rows,
    :func:`sketch.cms_buckets`) per distinct shingle. One-sided: every
    exactly-contaminated doc is flagged with at least its exact n_hits
    (pytest asserts the superset), plus a bounded false-positive tail
    (~(1 - e^(-B/m))^k per probe at B benchmark shingles). Output shape matches :func:`decontaminate`:
    (doc_id, n_hits) over non-test docs, n_hits = distinct shingles whose
    k bits are ALL set. The DuckDB oracle rebuilds the same filter
    bit-for-bit (FNV shingle chain + literal row constants), so the gate
    hash-checks the false positives too, not just the true hits.

    Uses n=3 shingles (the oracle's positional-combine SQL chain); the
    exact entry keeps the GPT-3-style n=8.
    """
    import ray

    from .dedup import _batch_shingles
    from .sketch import cms_buckets

    m = 1 << log2m
    test_lo = np.uint64(train_pct + valid_pct)
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def bench_partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        is_test = (_hash64(ids, seed) % np.uint64(100)) >= test_lo
        # PARTITIONED Bloom: each hash row owns its own m-bit block, so a
        # probe's row-i bucket can only be satisfied by a row-i set bit —
        # the variant the SQL oracle's (row, bucket) pair set reproduces
        # (classic shared-array Bloom would let row j's bits answer row
        # i's probes, slightly changing the false-positive pattern)
        bits = np.zeros((k, m), dtype=bool)
        # batch-flat shingler; bit-sets are dedup-invariant, skip distinct
        _gdoc, h = _batch_shingles(t.filter(pa.array(is_test)), n, distinct=False)
        if len(h):
            bk = cms_buckets(h, d=k, log2w=log2m)
            for i in range(k):
                bits[i, bk[i]] = True
        return pa.table(
            {"bits": pa.array([np.packbits(bits.ravel())], pa.list_(pa.uint8()))}
        )

    packed = np.zeros(k * m // 8, dtype=np.uint8)
    for b in ds.map_batches(bench_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for row in b.column("bits").to_pylist():
            packed |= np.asarray(row, dtype=np.uint8)
    bits_ref = ray.put(np.unpackbits(packed).astype(bool).reshape(k, m))

    def scan(t: pa.Table) -> pa.Table:
        bits = ray.get(bits_ref)
        ids = t.column("doc_id").to_numpy()
        nontest = (_hash64(ids, seed) % np.uint64(100)) < test_lo
        rows = np.flatnonzero(nontest)
        gdoc, h = _batch_shingles(t.filter(pa.array(nontest)), n)
        if not len(h):
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_hits": pa.array([], pa.int64())}
            )
        ow = rows[gdoc]  # back to original batch row indices
        bk = cms_buckets(h, d=k, log2w=log2m)
        hit = bits[np.arange(k)[:, None], bk].all(axis=0)
        cnt = np.bincount(ow[hit], minlength=len(ids))
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "doc_id": pa.array(ids[nz], type=pa.int64()),
                "n_hits": pa.array(cnt[nz], type=pa.int64()),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow")


#: cross-doc span rule: duplicated iff the n-gram appears in >= 2 distinct
#: docs; grams in more docs than SPAN_MAX_DF are boilerplate — that regime
#: belongs to scrub_frequent_ngrams, and the cap (mirrored in the oracle)
#: keeps any one gram's bucket from concentrating corpus-scale payload
SPAN_N = 10
SPAN_MAX_DF = 100


def cross_dup_spans(sf_dir: str, n: int = SPAN_N, max_df: int = SPAN_MAX_DF):
    """Cross-document duplicate-span coverage — the fixed-window
    approximation of Lee et al. 2022's substring dedup ("Deduplicating
    Training Data Makes Language Models Better"): per doc, the number of
    tokens covered by an ``n``-gram that also occurs in at least one OTHER
    doc (2 <= distinct-doc frequency <= ``max_df``). Returns
    (doc_id, n_tokens, dup_tokens) for docs with dup_tokens >= 1.

    Scale shape — two bounded hash hops, no broadcast (the dup-gram set is
    corpus-scale, so the scrub operator's broadcast trick is structurally
    unavailable here):
    1. gram hop: positional (gram-hash, doc, pos, dl) int rows bucket by
       gh %% P1 (``partitioning.partition_count``); every occurrence of a
       gram lands in ONE bucket, so one lexsort marks the 2..max_df
       distinct-doc runs and only THEIR rows survive — output is
       duplicated-occurrence-scale, not corpus-scale.
    2. doc hop: surviving (doc, pos, dl) rows bucket by doc %% P2; one
       lexsort + difference-array union per bucket yields exact per-doc
       covered-token counts, all docs in a bucket vectorized together.
    Hot-key caveat (partitioning.py): a single gram with up to max_df
    distinct docs still concentrates its occurrences in one bucket — the
    cap bounds that payload, and beyond-cap grams are the scrub
    operator's domain by design."""
    from .partitioning import partition_count
    from .textstats import _flat_tokens

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    p1 = partition_count(
        f"{sf_dir}/documents.parquet", ("doc_id", "text")
    )

    def gram_rows(t: pa.Table) -> pa.Table:
        nd, doc_idx, flat = _flat_tokens(t)
        ids = t.column("doc_id").to_numpy()
        h, fpos = _positional_gram_hashes(doc_idx, flat, n)
        dl = np.bincount(doc_idx, minlength=nd).astype(np.int64)
        starts = np.zeros(nd + 1, dtype=np.int64)
        np.cumsum(dl, out=starts[1:])
        d = doc_idx[fpos]
        return pa.table(
            {
                "gh": pa.array(h.view(np.int64), type=pa.int64()),
                "doc_id": pa.array(ids[d], type=pa.int64()),
                "pos": pa.array(fpos - starts[d], type=pa.int64()),
                "dl": pa.array(dl[d], type=pa.int64()),
                "kg": pa.array(
                    (h % np.uint64(p1)).astype(np.int32), type=pa.int32()
                ),
            }
        )

    def mark_dups(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "dl": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        g = t.column("gh").to_numpy()
        d = t.column("doc_id").to_numpy()
        order = np.lexsort((d, g))
        gg, dd = g[order], d[order]
        new_g = np.empty(len(gg), dtype=bool)
        new_g[0] = True
        new_g[1:] = gg[1:] != gg[:-1]
        new_gd = new_g.copy()
        new_gd[1:] |= dd[1:] != dd[:-1]
        gid = np.cumsum(new_g) - 1
        docs_per = np.bincount(gid[new_gd])
        keep = (docs_per[gid] >= 2) & (docs_per[gid] <= max_df)
        if not keep.any():
            return empty
        sel = order[keep]
        return pa.table(
            {
                "doc_id": t.column("doc_id").take(pa.array(sel)),
                "pos": t.column("pos").take(pa.array(sel)),
                "dl": t.column("dl").take(pa.array(sel)),
            }
        )

    marked = (
        ds.map_batches(gram_rows, batch_format="pyarrow")
        .groupby("kg")
        .map_groups(mark_dups, batch_format="pyarrow")
    )
    p2 = max(64, p1 // 4)

    def add_kd(t: pa.Table) -> pa.Table:
        kd = (t.column("doc_id").to_numpy() % p2).astype(np.int32)
        return t.append_column("kd", pa.array(kd))

    def coverage(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "dup_tokens": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        d = t.column("doc_id").to_numpy()
        pos = t.column("pos").to_numpy()
        dl = t.column("dl").to_numpy()
        order = np.lexsort((pos, d))
        dd, pp, ll = d[order], pos[order], dl[order]
        new_d = np.empty(len(dd), dtype=bool)
        new_d[0] = True
        new_d[1:] = dd[1:] != dd[:-1]
        docs = dd[new_d]
        doc_len = ll[new_d]
        base = np.zeros(len(docs) + 1, dtype=np.int64)
        np.cumsum(doc_len, out=base[1:])
        d_idx = np.cumsum(new_d) - 1
        mask = _cover_mask(base[d_idx] + pp, n, int(base[-1]))
        seg = np.repeat(np.arange(len(docs)), doc_len)
        dup = np.bincount(seg[mask], minlength=len(docs))
        return pa.table(
            {
                "doc_id": pa.array(docs, type=pa.int64()),
                "n_tokens": pa.array(doc_len, type=pa.int64()),
                "dup_tokens": pa.array(dup, type=pa.int64()),
            }
        )

    return (
        marked.map_batches(add_kd, batch_format="pyarrow")
        .groupby("kd")
        .map_groups(coverage, batch_format="pyarrow")
    )


# --- n-gram LM perplexity scoring (CCNet-style quality filter) -----------

LM_SEED = 23          # splitmix seed selecting the LM reference slice
LM_REF_PCT = 5        # % of docs forming the "quality reference" corpus
LM_Q = 1 << 20        # fixed-point scale for quantized per-pair NLL
LM_MAX_MODEL = 4_000_000  # guard: max (bigram + unigram) model rows


def lm_perplexity(
    sf_dir: str, ref_pct: int = LM_REF_PCT, seed: int = LM_SEED,
    max_model: int = LM_MAX_MODEL,
):
    """CCNet-style language-model document scoring (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data"): train an add-one-smoothed bigram LM on a small deterministic
    reference slice of the corpus (splitmix64(doc_id, seed) %% 100 <
    ``ref_pct`` — the stand-in for CCNet's curated Wikipedia LM), then
    score EVERY document's token stream under it. Returns one row per
    document: (doc_id, n_bigrams, nll_q) where nll_q is the integer sum of
    per-bigram quantized negative log-probs, q = floor(-ln(p) * 2^20 +
    0.5), p = (c12 + 1) / (c1 + V); c12 = reference count of the bigram,
    c1 = reference count of the prefix as a bigram-start, V = distinct
    reference vocabulary + 1 (OOV). Docs with < 2 tokens score (0, 0).
    Downstream filters rank by nll_q / n_bigrams (mean NLL ==
    log-perplexity) and keep the head/middle the way CCNet does.

    Scale shape — model-sized state, corpus-sized streaming:
    1. Counting pass over the REFERENCE SLICE only: per-batch bigram +
       vocab partials via dictionary-encode + int64 key run-length (no
       per-token Python), ONE groupby-sum whose output is model-sized
       (distinct reference bigrams), collected to the driver under an
       explicit ``max_model`` guard that raises instead of OOMing — at
       real scale the reference corpus is a fixed curated set and the
       model is pruned (KenLM-style), so model-sized ≠ corpus-sized by
       construction.
    2. ALL log/float arithmetic happens HERE, once per model row, with
       scalar libm ``math.log`` — measured: numpy's SIMD ``np.log``
       diverges from libm (and therefore from DuckDB's ``ln``) on ~21%% of
       doubles, so the corpus-side path must never touch a float kernel.
       The broadcast model is (sorted vocab, sorted bigram keys,
       quantized int64 NLLs, per-prefix unseen NLLs).
    3. Scoring pass over the FULL corpus: ``ray.put`` the model once,
       then an embarrassingly-parallel ``map_batches`` scan — tokenize,
       batch-dictionary lookup into the vocab (searchsorted), bigram key
       gather, two integer gathers + one segment sum per batch. Pure
       int64 end to end, hence bit-reproducible on any shard layout.

    The DuckDB oracle (``__ray_entry__._lm_ppl_sql``) re-derives the
    reference slice, counts, V, and the exact float expression per pair;
    ln == libm log on both sides, so the gate checks the whole chain
    (split, tokenizer, counts, smoothing arithmetic, quantization).
    """
    import math

    import ray

    from .textstats import _flat_tokens

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    empty_counts = pa.table({
        "gk": pa.array([], pa.string()),
        "c": pa.array([], pa.int64()),
    })

    def partial_counts(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        keep = (_hash64(ids, seed) % np.uint64(100)).astype(np.int64) < ref_pct
        sub = t.filter(pa.array(keep))
        if sub.num_rows == 0:
            return empty_counts
        _, doc_idx, flat = _flat_tokens(sub)
        if len(doc_idx) == 0:
            return empty_counts
        denc = flat.dictionary_encode()
        codes = denc.indices.to_numpy().astype(np.int64)
        dvals = denc.dictionary
        nd = len(dvals)
        # unigram rows (vocab membership; w2 = "" sentinel — tokens are
        # never empty so the key space cannot collide with bigrams)
        ucnt = np.bincount(codes, minlength=nd).astype(np.int64)
        # bigram rows: adjacent pairs within a doc, batch-local run-length
        m = doc_idx[1:] == doc_idx[:-1]
        k1, k2 = codes[:-1][m], codes[1:][m]
        key = k1 * nd + k2
        uk, kc = np.unique(key, return_counts=True)
        w1 = dvals.take(pa.array(uk // nd))
        w2 = dvals.take(pa.array(uk % nd))
        gk_big = pc.binary_join_element_wise(w1, w2, "\x00")
        gk_uni = pc.binary_join_element_wise(
            dvals, pa.array([""] * nd, pa.string()), "\x00"
        )
        return pa.table({
            "gk": pa.concat_arrays([
                gk_big.combine_chunks() if isinstance(gk_big, pa.ChunkedArray)
                else gk_big,
                gk_uni.combine_chunks() if isinstance(gk_uni, pa.ChunkedArray)
                else gk_uni,
            ]),
            "c": pa.array(np.concatenate([kc.astype(np.int64), ucnt]),
                          type=pa.int64()),
        })

    model_ds = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("gk")
        .sum("c")
    )
    gks: list[pa.Array] = []
    cnts: list[np.ndarray] = []
    n_rows = 0
    for b in model_ds.iter_batches(batch_format="pyarrow", batch_size=None):
        n_rows += b.num_rows
        if n_rows > max_model:
            raise ValueError(
                f"LM model rows exceed max_model={max_model}; shrink "
                f"ref_pct or prune counts (KenLM-style) before broadcast"
            )
        gks.append(b.column("gk").combine_chunks())
        cnts.append(b.column("sum(c)").to_numpy())
    if n_rows == 0:
        raise ValueError("LM reference slice selected zero documents")
    gk_all = pa.concat_arrays(gks)
    c_all = np.concatenate(cnts)
    split = pc.split_pattern(gk_all, "\x00")
    flat_terms = split.flatten()
    w1_np = flat_terms.take(
        pa.array(np.arange(0, 2 * n_rows, 2))
    ).to_numpy(zero_copy_only=False).astype(str)
    w2_np = flat_terms.take(
        pa.array(np.arange(1, 2 * n_rows, 2))
    ).to_numpy(zero_copy_only=False).astype(str)
    is_uni = w2_np == ""
    vocab = np.sort(w1_np[is_uni])
    V = len(vocab) + 1  # + OOV
    i1 = np.searchsorted(vocab, w1_np[~is_uni])
    i2 = np.searchsorted(vocab, w2_np[~is_uni])
    c12 = c_all[~is_uni]
    c1 = np.zeros(V, dtype=np.int64)
    np.add.at(c1, i1, c12)
    big_keys = i1 * V + i2
    order = np.argsort(big_keys)
    big_keys = big_keys[order]
    bc12, bi1 = c12[order], i1[order]
    # the ONLY float/log arithmetic in the operator: model-sized, one-time,
    # scalar libm ln for bit-parity with DuckDB's ln (np.log's SIMD path
    # measurably diverges from libm) — identical expression to the oracle:
    # floor((0 - ln((1 + c12) / (c1 + V))) * 2^20 + 0.5)
    def _q(cc12: int, cc1: int) -> int:
        p = (1.0 + float(cc12)) / (float(cc1) + float(V))
        return int(math.floor((0.0 - math.log(p)) * float(LM_Q) + 0.5))

    q_big = np.fromiter(
        (_q(int(c), int(c1[j])) for c, j in zip(bc12, bi1)),
        dtype=np.int64, count=len(bc12),
    )
    q_unseen = np.fromiter(
        (_q(0, int(c1[j])) for j in range(V)), dtype=np.int64, count=V,
    )
    model_ref = ray.put((vocab, V, big_keys, q_big, q_unseen))

    def score(t: pa.Table) -> pa.Table:
        vocab, V, big_keys, q_big, q_unseen = ray.get(model_ref)
        nd = t.num_rows
        n_big = np.zeros(nd, dtype=np.int64)
        nll = np.zeros(nd, dtype=np.int64)
        _, doc_idx, flat = _flat_tokens(t)
        if len(doc_idx):
            denc = flat.dictionary_encode()
            codes = denc.indices.to_numpy().astype(np.int64)
            dvals = denc.dictionary.to_numpy(zero_copy_only=False).astype(str)
            # batch-distinct -> global vocab id; misses -> OOV id V-1
            gd = np.searchsorted(vocab, dvals)
            gdc = np.minimum(gd, max(len(vocab) - 1, 0))
            ok = ((gd < len(vocab)) & (vocab[gdc] == dvals)
                  if len(vocab) else np.zeros(len(dvals), dtype=bool))
            gd = np.where(ok, gdc, V - 1)
            gids = gd[codes]
            m = doc_idx[1:] == doc_idx[:-1]
            k1, k2, pd = gids[:-1][m], gids[1:][m], doc_idx[1:][m]
            if len(pd):
                keys = k1 * V + k2
                pos = np.searchsorted(big_keys, keys)
                posc = np.minimum(pos, max(len(big_keys) - 1, 0))
                hit = ((pos < len(big_keys)) & (big_keys[posc] == keys)
                       if len(big_keys) else np.zeros(len(keys), dtype=bool))
                q = np.where(hit, q_big[posc], q_unseen[k1])
                n_big = np.bincount(pd, minlength=nd).astype(np.int64)
                # float64 bincount accumulation is exact: q < 2^25 and
                # per-doc sums stay far below 2^53
                nll = np.bincount(
                    pd, weights=q.astype(np.float64), minlength=nd
                ).astype(np.int64)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_bigrams": pa.array(n_big, type=pa.int64()),
            "nll_q": pa.array(nll, type=pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def curation_pipeline(
    sf_dir: str, min_tokens: int = 20, n: int = DECONTAM_N,
    train_pct: int = 80, valid_pct: int = 10, seed: int = SPLIT_SEED,
):
    """The composed end-to-end curation pass a training run actually
    executes — quality gate AND exact-dedup canonicalization AND
    train-side selection AND benchmark decontamination in ONE chained Ray
    pipeline, built from the individually hash-verified kernels. Returns
    the kept (doc_id, n_tokens) rows.

    A document survives iff ALL of:
    - quality: n_tokens >= ``min_tokens`` and stopwords are at most half
      the tokens (textstats.quality_score's ``passes`` rule);
    - canonical: it is the min-doc_id holder of its exact text (so if the
      canonical copy of a duplicated text sits in the TEST split, every
      train-side duplicate dies too — the correct decontamination
      interaction, mirrored exactly in the oracle's min-over-all-docs);
    - train-side: splitmix bucket < train_pct + valid_pct;
    - clean: shares no ``n``-gram with the test split (decontaminate's
      broadcast-bench rule).

    Scale shape: pass 0 folds the benchmark-side shingles to a bounded
    driver set (eval sets are small by construction) and broadcasts once;
    pass 1 is one tokenize per batch computing EVERY per-doc signal
    (quality, split bucket, contamination, sha256) — pure functions of the
    row, no coordination. The ONLY shuffle is the exact-dedup winner
    groupby, and it needs no follow-up join: each doc's payload packs into
    one int64 key ``doc_id << 23 | n_tokens << 1 | ok`` whose group-Min
    IS the winner row (doc_id occupies the high bits, so argmin(pack) ==
    argmin(doc_id), and the winner's own payload rides along in the low
    bits). ``text`` never crosses the shuffle — only (sha256-hex, int64)
    rows do — and the final unpack+filter is a stateless scan over
    distinct-content-scale rows. Bounds are guarded, not clipped:
    doc_id < 2^40 and n_tokens < 2^22, raising with the remedy (widen the
    pack or switch to a two-stage join) rather than corrupting output."""
    import hashlib as _hashlib

    import ray
    from ray.data.aggregate import Min

    from .analyze import STOPWORDS
    from .dedup import _batch_shingles
    from .textstats import _flat_tokens

    test_lo = np.uint64(train_pct + valid_pct)
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def bench_partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        is_test = (_hash64(ids, seed) % np.uint64(100)) >= test_lo
        sub = t.filter(pa.array(is_test))
        _gdoc, gh = _batch_shingles(sub, n, distinct=False)
        u = np.unique(gh)
        return pa.table({"sh": pa.array(u.view(np.int64), type=pa.int64())})

    parts = [
        b.column("sh").to_numpy()
        for b in ds.map_batches(bench_partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    bench = (np.unique(np.concatenate(parts)) if parts
             else np.empty(0, dtype=np.int64))
    bench_ref = ray.put(bench)

    stop_arr = pa.array(sorted(STOPWORDS))

    def enrich(t: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        nd = t.num_rows
        ids = t.column("doc_id").to_numpy()
        train_side = (_hash64(ids, seed) % np.uint64(100)) < test_lo
        _, doc_idx, flat = _flat_tokens(t)
        n_tok = np.bincount(doc_idx, minlength=nd).astype(np.int64)
        stop_np = pc.is_in(flat, value_set=stop_arr).to_numpy(
            zero_copy_only=False
        )
        n_stop = np.bincount(doc_idx[stop_np], minlength=nd).astype(np.int64)
        ok_q = (n_tok >= min_tokens) & (2 * n_stop <= n_tok)
        contam = np.zeros(nd, dtype=bool)
        gdoc, gh = _batch_shingles(t, n)
        if len(gh) and len(bench):
            i = np.searchsorted(bench, gh.view(np.int64))
            hit = (i < len(bench)) & (
                bench[np.minimum(i, len(bench) - 1)] == gh.view(np.int64)
            )
            contam[gdoc[hit]] = True
        h = [
            _hashlib.sha256(x.encode()).hexdigest()
            for x in t.column("text").to_pylist()
        ]
        ok = train_side & ok_q & ~contam
        if len(ids) and (ids.max() >= (1 << 40) or n_tok.max() >= (1 << 22)):
            raise ValueError(
                "curation_pipeline pack overflow: requires doc_id < 2^40 "
                "and n_tokens < 2^22 — widen the pack layout or switch "
                "the winner resolution to a two-stage join"
            )
        pack = (ids << 23) | (n_tok << 1) | ok.astype(np.int64)
        return pa.table({
            "h": pa.array(h),
            "pack": pa.array(pack, type=pa.int64()),
        })

    winners = (
        ds.map_batches(enrich, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("pack", alias_name="w"))
    )

    def final(t: pa.Table) -> pa.Table:
        w = t.column("w").to_numpy()
        keep = (w & 1).astype(bool)
        w = w[keep]
        return pa.table({
            "doc_id": pa.array(w >> 23, type=pa.int64()),
            "n_tokens": pa.array((w >> 1) & ((1 << 22) - 1),
                                 type=pa.int64()),
        })

    return winners.map_batches(final, batch_format="pyarrow")


# --- DSIR hashed n-gram importance weights (Xie et al. 2023) -------------

DSIR_SEED = 31
DSIR_REF_PCT = 5
DSIR_BUCKETS = 4096
DSIR_N = 2


def dsir_weights(
    sf_dir: str, ref_pct: int = DSIR_REF_PCT, seed: int = DSIR_SEED,
    n_buckets: int = DSIR_BUCKETS, n: int = DSIR_N,
):
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    how much more likely its hashed n-gram features are under a TARGET
    (quality reference) distribution than under the RAW corpus
    distribution — log w(x) = Σ_features (ln p_target(f) - ln p_raw(f)),
    add-one smoothed over ``n_buckets`` hash buckets. The target is the
    splitmix reference slice (the stand-in for DSIR's curated target
    set); raw is the whole corpus. Returns (doc_id, n_grams, logw_q) with
    logw_q the integer sum of per-occurrence quantized log-ratios
    (floor(x * 2^20 + 0.5), negative values allowed); downstream
    selection keeps the top logw_q/n_grams mass.

    Scale shape — CONSTANT model state, one pass + one scan:
    pass 1 folds per-batch bucket histograms (two ``n_buckets``-long
    int64 vectors per batch: raw and target occurrence counts of
    gram-hash %% n_buckets) to the driver — state is O(n_buckets),
    independent of corpus size, the same shape as the CMS/HLL sketches.
    The per-bucket quantized log-ratio table is then computed ONCE with
    scalar libm ln (the lm_perplexity rule: numpy's SIMD log diverges
    from libm/DuckDB) and broadcast; pass 2 is an embarrassingly-parallel
    scan — gram hash, bucket, one int64 gather + segment sum per batch.
    Feature identity is the 64-bit shingle-hash combine
    (``dedup._batch_shingles``), which the oracle rebuilds bit-for-bit
    with the parametric shingle-hash CTE chain."""
    import math

    import ray

    from .dedup import _batch_shingles

    B = n_buckets
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        is_ref = (_hash64(ids, seed) % np.uint64(100)).astype(np.int64) < ref_pct
        gdoc, gh = _batch_shingles(t, n, distinct=False)
        b = (gh % np.uint64(B)).astype(np.int64)
        raw = np.bincount(b, minlength=B).astype(np.int64)
        tgt = np.bincount(b[is_ref[gdoc]], minlength=B).astype(np.int64)
        nz = np.flatnonzero(raw)  # histograms are sparse per batch
        return pa.table({
            "b": pa.array(nz, type=pa.int64()),
            "raw": pa.array(raw[nz], type=pa.int64()),
            "tgt": pa.array(tgt[nz], type=pa.int64()),
        })

    raw = np.zeros(B, dtype=np.int64)
    tgt = np.zeros(B, dtype=np.int64)
    for blk in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        # explicit bucket column: the fold never assumes block boundaries
        # align to the histogram length
        bcol = blk.column("b").to_numpy()
        np.add.at(raw, bcol, blk.column("raw").to_numpy())
        np.add.at(tgt, bcol, blk.column("tgt").to_numpy())
    T, R = int(tgt.sum()), int(raw.sum())
    if T == 0:
        raise ValueError("DSIR target slice contains zero n-grams")

    # the only float/ln arithmetic: n_buckets-sized, one-time, scalar libm
    # ln for bit-parity with DuckDB — identical expression to the oracle:
    # floor((ln((tgt+1)/(T+B)) - ln((raw+1)/(R+B))) * 2^20 + 0.5)
    lr_q = np.fromiter(
        (
            int(math.floor(
                (math.log((float(tgt[i]) + 1.0) / (float(T) + float(B)))
                 - math.log((float(raw[i]) + 1.0) / (float(R) + float(B))))
                * float(LM_Q) + 0.5
            ))
            for i in range(B)
        ),
        dtype=np.int64, count=B,
    )
    lr_ref = ray.put(lr_q)

    def score(t: pa.Table) -> pa.Table:
        lr = ray.get(lr_ref)
        nd = t.num_rows
        n_grams = np.zeros(nd, dtype=np.int64)
        logw = np.zeros(nd, dtype=np.int64)
        gdoc, gh = _batch_shingles(t, n, distinct=False)
        if len(gh):
            q = lr[(gh % np.uint64(B)).astype(np.int64)]
            n_grams = np.bincount(gdoc, minlength=nd).astype(np.int64)
            # |q| < 2^26 and per-doc sums stay far below 2^53: float64
            # bincount accumulation is exact
            logw = np.bincount(
                gdoc, weights=q.astype(np.float64), minlength=nd
            ).astype(np.int64)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_grams": pa.array(n_grams, type=pa.int64()),
            "logw_q": pa.array(logw, type=pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


DSIR_GUMBEL_SEED = 37
DSIR_GUMBEL_BITS = 16


def dsir_select(
    sf_dir: str, k: int = 100, ref_pct: int = DSIR_REF_PCT,
    seed: int = DSIR_SEED, n_buckets: int = DSIR_BUCKETS, n: int = DSIR_N,
    gumbel_seed: int = DSIR_GUMBEL_SEED,
):
    """DSIR selection — the Gumbel-top-k resampling step that turns
    :func:`dsir_weights` into an actual dataset cut (Xie et al. 2023 §2:
    sampling without replacement ∝ w is exactly top-k over
    log w + Gumbel(0,1) noise). Deterministic: the per-doc noise comes
    from splitmix64(doc_id, gumbel_seed) bucketed to ``2^DSIR_GUMBEL_BITS``
    uniform levels, so the draw is a pure function of (doc_id, seed) and
    replays identically on any shard layout. Returns the selected
    (doc_id, logw_q, key_q) rows, ordered by (key_q desc, doc_id).

    The per-row ln the Gumbel transform needs would be a corpus-sized
    float kernel — numpy's SIMD log diverges from libm, and a scalar loop
    is per-row Python — so the noise table g(u) = -ln(-ln(u)) is
    PRECOMPUTED once over the 2^16 bucketed u levels with scalar libm
    (65k entries, one-time driver cost) and broadcast; the corpus path is
    splitmix + shift + one int64 gather. key_q = logw_q + gq adds the
    quantized noise in the same nat×2^20 fixed-point scale. Selection is
    a per-batch partial top-k + bounded driver fold (the ann.brute_topk
    shape — O(blocks × k) driver memory, no shuffle)."""
    import math

    import ray

    scored = dsir_weights(
        sf_dir, ref_pct=ref_pct, seed=seed, n_buckets=n_buckets, n=n
    )
    levels = 1 << DSIR_GUMBEL_BITS
    shift = np.uint64(64 - DSIR_GUMBEL_BITS)
    # identical expression to the oracle per u level:
    # floor((0 - ln(0 - ln((i + 0.5) / levels))) * 2^20 + 0.5)
    gq_table = np.fromiter(
        (
            int(math.floor(
                (0.0 - math.log(0.0 - math.log(
                    (float(i) + 0.5) / float(levels)
                ))) * float(LM_Q) + 0.5
            ))
            for i in range(levels)
        ),
        dtype=np.int64, count=levels,
    )
    gq_ref = ray.put(gq_table)

    def partial_topk(t: pa.Table) -> pa.Table:
        gq = ray.get(gq_ref)
        ids = t.column("doc_id").to_numpy()
        lvl = (_hash64(ids, gumbel_seed) >> shift).astype(np.int64)
        key = t.column("logw_q").to_numpy() + gq[lvl]
        if len(ids) > k:
            # partial top-k with the exact (key desc, doc_id asc) order
            order = np.lexsort((ids, -key))[:k]
        else:
            order = np.arange(len(ids))
        return pa.table({
            "doc_id": pa.array(ids[order], type=pa.int64()),
            "logw_q": t.column("logw_q").take(pa.array(order)),
            "key_q": pa.array(key[order], type=pa.int64()),
        })

    cand_ids: list[np.ndarray] = []
    cand_lw: list[np.ndarray] = []
    cand_key: list[np.ndarray] = []
    for b in scored.map_batches(
        partial_topk, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        cand_ids.append(b.column("doc_id").to_numpy())
        cand_lw.append(b.column("logw_q").to_numpy())
        cand_key.append(b.column("key_q").to_numpy())
    ids = np.concatenate(cand_ids) if cand_ids else np.empty(0, np.int64)
    lw = np.concatenate(cand_lw) if cand_lw else np.empty(0, np.int64)
    key = np.concatenate(cand_key) if cand_key else np.empty(0, np.int64)
    order = np.lexsort((ids, -key))[:k]
    return pa.table({
        "doc_id": pa.array(ids[order], type=pa.int64()),
        "logw_q": pa.array(lw[order], type=pa.int64()),
        "key_q": pa.array(key[order], type=pa.int64()),
    })


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, "Scaling Language Models: ...
# Gopher", Appendix A1.1) — the composite document-quality filter every
# large-scale curation pipeline runs before tokenization. Reference scope
# analog: the quality gate of the curation pass (beyond-reference operator
# family; sibling of textstats.quality_score).
# ---------------------------------------------------------------------------

#: Gopher's own required-stopword list (the paper's 8 words). The default
#: for the rule below is the engine's shared analyzer stoplist instead
#: (analyze.STOPWORDS — the Lucene list every scoring path uses) because a
#: corpus-specific stoplist is exactly the kind of knob a curation run
#: tunes; pass this tuple to reproduce the paper's configuration.
GOPHER_PAPER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3
GOPHER_MAX_MEAN_WORD_LEN = 10
GOPHER_MAX_SYMBOL_PCT = 10       # symbol-to-word ratio <= 0.1
GOPHER_MIN_ALPHA_PCT = 80        # >= 80% of words contain an alphabetic char
GOPHER_MIN_STOP_HITS = 2         # >= 2 distinct required stopwords
GOPHER_MAX_BULLET_PCT = 90       # <= 90% of lines start with a bullet
GOPHER_MAX_ELLIPSIS_PCT = 30     # <= 30% of lines end with an ellipsis


def _flat_words(t: pa.Table) -> tuple[int, np.ndarray, pa.Array]:
    """Batch -> (n_docs, doc_idx per word, flat whitespace-split words).

    Words are raw ``\\S+`` runs (NOT lowercased, NOT the analyzer token
    stream) because Gopher's symbol/alpha rules inspect raw words; one
    Arrow regex split over the whole column, empties dropped.
    """
    from .textstats import flatten_list_column

    n = t.num_rows
    lists = pc.split_pattern_regex(t.column("text"), pattern=r"\s+")
    doc_idx, flat = flatten_list_column(lists, n)
    return n, doc_idx, flat


def gopher_rules(
    docs,
    min_words: int = GOPHER_MIN_WORDS,
    max_words: int = GOPHER_MAX_WORDS,
    min_mwl: int = GOPHER_MIN_MEAN_WORD_LEN,
    max_mwl: int = GOPHER_MAX_MEAN_WORD_LEN,
    max_symbol_pct: int = GOPHER_MAX_SYMBOL_PCT,
    min_alpha_pct: int = GOPHER_MIN_ALPHA_PCT,
    min_stop_hits: int = GOPHER_MIN_STOP_HITS,
    max_bullet_pct: int = GOPHER_MAX_BULLET_PCT,
    max_ellipsis_pct: int = GOPHER_MAX_ELLIPSIS_PCT,
    stopwords: "tuple[str, ...] | None" = None,
):
    """Per-doc Gopher quality signals + the composite pass/fail verdict.

    ``docs`` is an sf_dir path or a zero-arg callable returning the corpus
    Dataset (the ``rake_keyphrases`` dual surface).
    Every rule is evaluated in EXACT INTEGER arithmetic (ratio bounds as
    cross-multiplications, the reported mean word length as a floor-division
    micro-unit), so the DuckDB oracle replays the verdict with zero float
    risk. Scale shape: ONE shuffle-free ``map_batches`` scan — per-document
    rules are embarrassingly parallel, the ideal 100-TB operator — and every
    signal inside the batch is one Arrow kernel + one ``np.add.at`` /
    ``bincount`` over the flat word/line/token streams (no per-doc Python).

    Rules (Rae et al. 2021 A1.1): word count in [min_words, max_words];
    mean word length in [min_mwl, max_mwl]; symbol-to-word ratio
    (``#`` / ``...`` words) <= max_symbol_pct%; >= min_alpha_pct% of words
    contain an alphabetic character; >= min_stop_hits distinct required
    stopwords appear as analyzer tokens; <= max_bullet_pct% of lines start
    with a bullet; <= max_ellipsis_pct% of lines end with an ellipsis.

    Returns (doc_id, n_words, mean_word_len_micro, alpha_words,
    symbol_words, stop_hits, n_lines, bullet_lines, ellipsis_lines, passes).
    """
    from .analyze import STOPWORDS
    from .textstats import _flat_tokens

    stop = tuple(sorted(STOPWORDS)) if stopwords is None else stopwords
    stop_arr = pa.array(sorted(stop))

    def rules(t: pa.Table) -> pa.Table:
        n = t.num_rows
        # --- word rules (raw \S+ words) ---
        _, widx, words = _flat_words(t)
        n_words = np.bincount(widx, minlength=n).astype(np.int64)
        tot_chars = np.zeros(n, dtype=np.int64)
        np.add.at(
            tot_chars, widx,
            pc.utf8_length(words).to_numpy(zero_copy_only=False)
            .astype(np.int64),
        )
        alpha = pc.match_substring_regex(words, "[a-zA-Z]").to_numpy(
            zero_copy_only=False
        )
        alpha_words = np.bincount(widx[alpha], minlength=n).astype(np.int64)
        symbol = pc.match_substring_regex(words, r"#|\.\.\.").to_numpy(
            zero_copy_only=False
        )
        symbol_words = np.bincount(widx[symbol], minlength=n).astype(np.int64)
        # --- line rules (split on \n, empties KEPT — they are lines) ---
        from .textstats import flatten_list_column

        lines = pc.split_pattern(t.column("text"), pattern="\n")
        lidx, lflat = flatten_list_column(lines, n, drop_empty=False)
        n_lines = np.bincount(lidx, minlength=n).astype(np.int64)
        bullet = pc.match_substring_regex(lflat, "^[-*•]").to_numpy(
            zero_copy_only=False
        )
        bullet_lines = np.bincount(lidx[bullet], minlength=n).astype(np.int64)
        ell = pc.match_substring_regex(
            lflat, r"(\.\.\.|…)$"
        ).to_numpy(zero_copy_only=False)
        ellipsis_lines = np.bincount(lidx[ell], minlength=n).astype(np.int64)
        # --- stopword rule (analyzer tokens; distinct required-stop hits)
        # ONE is_in pass + a distinct-(doc, code) count over the stop
        # subset (the token_stats n_unique kernel) — not |stoplist|
        # full-column scans, which would multiply the dominant per-batch
        # traffic and degrade with caller-supplied stoplists ---
        _, tidx, toks = _flat_tokens(t)
        stop_hits = np.zeros(n, dtype=np.int64)
        smask = pc.is_in(toks, value_set=stop_arr).to_numpy(
            zero_copy_only=False
        )
        if smask.any():
            codes = toks.dictionary_encode().indices.to_numpy()
            sd, sc = tidx[smask], codes[smask]
            order = np.lexsort((sc, sd))
            sd, sc = sd[order], sc[order]
            first = np.empty(len(sd), dtype=bool)
            first[0] = True
            first[1:] = (sd[1:] != sd[:-1]) | (sc[1:] != sc[:-1])
            stop_hits = np.bincount(sd[first], minlength=n).astype(np.int64)
        # --- composite verdict: all-integer cross-multiplied bounds ---
        ok = (n_words >= min_words) & (n_words <= max_words)
        ok &= (min_mwl * n_words <= tot_chars) & (
            tot_chars <= max_mwl * n_words
        )
        ok &= 100 * symbol_words <= max_symbol_pct * n_words
        ok &= 100 * alpha_words >= min_alpha_pct * n_words
        ok &= stop_hits >= min_stop_hits
        ok &= 100 * bullet_lines <= max_bullet_pct * n_lines
        ok &= 100 * ellipsis_lines <= max_ellipsis_pct * n_lines
        mwl_micro = np.where(
            n_words > 0, tot_chars * 1_000_000 // np.maximum(n_words, 1), 0
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_words": pa.array(n_words, type=pa.int64()),
                "mean_word_len_micro": pa.array(mwl_micro, type=pa.int64()),
                "alpha_words": pa.array(alpha_words, type=pa.int64()),
                "symbol_words": pa.array(symbol_words, type=pa.int64()),
                "stop_hits": pa.array(stop_hits, type=pa.int64()),
                "n_lines": pa.array(n_lines, type=pa.int64()),
                "bullet_lines": pa.array(bullet_lines, type=pa.int64()),
                "ellipsis_lines": pa.array(ellipsis_lines, type=pa.int64()),
                "passes": pa.array(ok, type=pa.bool_()),
            }
        )

    ds = _read_docs(docs, ["doc_id", "text"]) if isinstance(docs, str) else docs()
    return ds.map_batches(rules, batch_format="pyarrow")


def decontaminate_near(
    sf_dir: str,
    n: int = DECONTAM_N,
    num_perm: int = 128,
    bands: int = 32,
    threshold_pct: int = 60,
    sig_seed: int = 1234,
    train_pct: int = 80,
    valid_pct: int = 10,
    seed: int = SPLIT_SEED,
    max_bench_docs: int = 100_000,
    max_pairs: int = 2_000_000,
):
    """NEAR-duplicate benchmark decontamination (the fuzzy sibling of
    :func:`decontaminate`, the rule Dolma/FineWeb-class pipelines apply):
    flag every non-test document whose n-gram JACCARD similarity with some
    test-split document reaches ``threshold_pct``/100, with candidates
    generated by MinHash-LSH banding against the benchmark side — exact
    n-gram overlap misses an eval item leaked with small edits; this
    catches it.

    Returns exact-INTEGER verdict rows ``(doc_id, bench_id, n_inter,
    n_union)`` for verified pairs (``100*n_inter >= threshold_pct *
    n_union``) — similarity never becomes a float anywhere in the output.

    Scale shape: the benchmark side is eval-sized by construction
    (guarded by ``max_bench_docs`` — it must fit one broadcast object):
    ONE pass computes its per-doc distinct shingle-hash sets and MinHash
    band hashes (:class:`dedup.MinHashSignatures` — the same seeded
    permutations and band mix the near-dup pipeline uses), folded on the
    driver and broadcast ONCE via ``ray.put`` as per-band sorted arrays +
    a concatenated shingle store. The 100-TB training side is then a
    single shuffle-free ``map_batches`` scan: per batch, signatures ->
    band hashes -> ``searchsorted`` membership against each band's bench
    index -> candidate (train doc, bench doc) pairs -> exact-Jaccard
    verify against the broadcast shingle sets. No all-to-all exchange at
    any point; driver ingest is the verified-pair stream, guarded by
    ``max_pairs``. Docs with fewer than ``n`` tokens have no shingles and
    are skipped on BOTH sides (Jaccard is undefined on an empty set; the
    exact-dedup operator owns identical-empty handling).

    Split assignment reuses :func:`split_train_test`'s splitmix64 bucket
    (re-partitioning/re-run stable); "non-test" includes the validation
    slice, mirroring :func:`decontaminate`.
    """
    import ray

    from .dedup import MinHashSignatures, _batch_shingles

    rows_per_band = num_perm // bands
    mix = (
        np.arange(1, rows_per_band + 1, dtype=np.uint64)
        * np.uint64(0x9E3779B97F4A7C15)
    ) | np.uint64(1)
    test_lo = np.uint64(train_pct + valid_pct)
    signer = MinHashSignatures(n=n, num_perm=num_perm, seed=sig_seed)
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def _band_hashes(sig_mat: np.ndarray) -> np.ndarray:
        """(n_docs, num_perm) -> (n_docs, bands) multiplicative band mix —
        the identical kernel minhash_lsh_pairs' explode_bands runs."""
        out = np.empty((sig_mat.shape[0], bands), dtype=np.uint64)
        for bi in range(bands):
            chunk = sig_mat[:, bi * rows_per_band : (bi + 1) * rows_per_band]
            out[:, bi] = (chunk * mix[None, :]).sum(axis=1)  # wraps mod 2^64
        return out

    def _sigs_and_shingles(sub: pa.Table):
        """(ids, sig matrix, per-doc sorted shingle lists) for docs WITH
        shingles; shingle-less docs are dropped (see docstring)."""
        ids = sub.column("doc_id").to_numpy()
        gdoc, gh = _batch_shingles(sub, n)  # distinct per doc, doc-grouped
        if not len(gh):
            return (np.empty(0, np.int64), np.empty((0, num_perm), np.uint64),
                    [], np.empty(0, np.int64))
        starts = np.flatnonzero(np.r_[True, gdoc[1:] != gdoc[:-1]])
        present = gdoc[starts]
        ends = np.append(starts[1:], len(gh))
        sig_tbl = signer(sub)
        sig = (
            sig_tbl.column("sig").combine_chunks().flatten().to_numpy()
            .view(np.uint64).reshape(sub.num_rows, num_perm)
        )
        sets = [np.sort(gh[s:e]) for s, e in zip(starts, ends)]
        counts = (ends - starts).astype(np.int64)
        return ids[present], sig[present], sets, counts

    # ---- pass 1: the benchmark (test-split) side, folded + broadcast ----
    def bench_partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        is_test = (_hash64(ids, seed) % np.uint64(100)) >= test_lo
        sub = t.filter(pa.array(is_test))
        bids, sig, sets, counts = _sigs_and_shingles(sub)
        flat = (np.concatenate(sets).view(np.int64) if sets
                else np.empty(0, np.int64))
        offs = np.zeros(len(bids) + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        return pa.table(
            {
                "bench_id": pa.array(bids, type=pa.int64()),
                "sig": pa.ListArray.from_arrays(
                    pa.array(
                        np.arange(0, (len(bids) + 1) * num_perm, num_perm),
                        type=pa.int32(),
                    ),
                    pa.array(sig.view(np.int64).ravel(), type=pa.int64()),
                ),
                "sh": pa.ListArray.from_arrays(
                    pa.array(offs, type=pa.int32()), pa.array(flat, pa.int64())
                ),
            }
        )

    bench_ids_l, bench_sig_l, bench_sets = [], [], []
    for b in ds.map_batches(bench_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        b = pa.table(b)
        if b.num_rows == 0:
            continue
        bench_ids_l.append(b.column("bench_id").to_numpy())
        bench_sig_l.append(
            b.column("sig").combine_chunks().flatten().to_numpy()
            .view(np.uint64).reshape(b.num_rows, num_perm)
        )
        col = b.column("sh").combine_chunks()
        flat = col.flatten().to_numpy().view(np.uint64)
        offs = col.offsets.to_numpy()
        bench_sets.extend(
            flat[offs[i]:offs[i + 1]] for i in range(b.num_rows)
        )
    if bench_ids_l:
        bench_ids = np.concatenate(bench_ids_l)
        bench_sig = np.vstack(bench_sig_l)
    else:
        bench_ids = np.empty(0, np.int64)
        bench_sig = np.empty((0, num_perm), np.uint64)
    if len(bench_ids) > max_bench_docs:
        raise ValueError(
            f"benchmark side has {len(bench_ids)} docs > max_bench_docs="
            f"{max_bench_docs}; near-decontamination broadcasts the bench "
            "shingle store, so the eval set must stay broadcast-sized"
        )
    bench_bh = _band_hashes(bench_sig) if len(bench_ids) else np.empty(
        (0, bands), np.uint64
    )
    band_index = []
    for bi in range(bands):
        order = np.argsort(bench_bh[:, bi], kind="stable")
        band_index.append((bench_bh[order, bi], order.astype(np.int64)))
    bench_flat = (
        np.concatenate(bench_sets) if bench_sets else np.empty(0, np.uint64)
    )
    bench_offs = np.zeros(len(bench_ids) + 1, dtype=np.int64)
    if bench_sets:
        np.cumsum([len(s) for s in bench_sets], out=bench_offs[1:])
    bench_ref = ray.put(
        (bench_ids, band_index, bench_flat, bench_offs)
    )

    # ---- pass 2: the training-side scan --------------------------------
    thr = int(threshold_pct)

    def scan(t: pa.Table) -> pa.Table:
        bench_ids, band_index, bench_flat, bench_offs = ray.get(bench_ref)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "bench_id": pa.array([], pa.int64()),
                "n_inter": pa.array([], pa.int64()),
                "n_union": pa.array([], pa.int64()),
            }
        )
        if not len(bench_ids):
            return empty
        ids_all = t.column("doc_id").to_numpy()
        nontest = (_hash64(ids_all, seed) % np.uint64(100)) < test_lo
        sub = t.filter(pa.array(nontest))
        tids, sig, sets, counts = _sigs_and_shingles(sub)
        if not len(tids):
            return empty
        tbh = _band_hashes(sig)
        cand_t, cand_b = [], []
        for bi in range(bands):
            sb, srows = band_index[bi]
            if not len(sb):
                continue
            lo = np.searchsorted(sb, tbh[:, bi], side="left")
            hi = np.searchsorted(sb, tbh[:, bi], side="right")
            m = hi > lo
            if not m.any():
                continue
            reps = (hi - lo)[m]
            trow = np.repeat(np.flatnonzero(m), reps)
            # flatten the per-doc [lo, hi) bench ranges
            brow = np.concatenate(
                [srows[l:h] for l, h in zip(lo[m], hi[m])]
            )
            cand_t.append(trow)
            cand_b.append(brow)
        if not cand_t:
            return empty
        ct = np.concatenate(cand_t)
        cb = np.concatenate(cand_b)
        packed = ct.astype(np.uint64) * np.uint64(len(bench_ids)) + cb.astype(
            np.uint64
        )
        _, first = np.unique(packed, return_index=True)
        ct, cb = ct[first], cb[first]
        out_t, out_b, out_i, out_u = [], [], [], []
        for ti, bi_ in zip(ct, cb):
            a = sets[ti]
            bset = bench_flat[bench_offs[bi_]:bench_offs[bi_ + 1]]
            idx = np.searchsorted(bset, a)
            idx_c = np.minimum(idx, max(0, len(bset) - 1))
            inter = int((bset[idx_c] == a).sum()) if len(bset) else 0
            union = int(counts[ti]) + (len(bset) - inter)
            if union > 0 and 100 * inter >= thr * union:
                out_t.append(int(tids[ti]))
                out_b.append(int(bench_ids[bi_]))
                out_i.append(inter)
                out_u.append(union)
        return pa.table(
            {
                "doc_id": pa.array(out_t, pa.int64()),
                "bench_id": pa.array(out_b, pa.int64()),
                "n_inter": pa.array(out_i, pa.int64()),
                "n_union": pa.array(out_u, pa.int64()),
            }
        )

    parts, total = [], 0
    for b in ds.map_batches(scan, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        total += b.num_rows
        if total > max_pairs:
            raise ValueError(
                f"near-decontamination exceeded max_pairs={max_pairs}; "
                "the corpus is pathologically contaminated — raise the "
                "guard or the threshold"
            )
        parts.append(pa.table(b))
    if not parts:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "bench_id": pa.array([], pa.int64()),
                "n_inter": pa.array([], pa.int64()),
                "n_union": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(parts)


TEMPERATURE_SEED = 41
TEMPERATURE_BUDGET_MICRO = 500_000


def temperature_sample(
    sf_dir: str,
    budget_micro: int = TEMPERATURE_BUDGET_MICRO,
    seed: int = TEMPERATURE_SEED,
):
    """Temperature-scaled multilingual sampling (the XLM-R / mC4
    alpha-sampling rule at alpha = 1/2, subsample-only): target language
    shares proportional to chars^alpha instead of chars — low-resource
    languages are boosted relative to their raw share, high-resource
    ones damped. ``mixture_sample``'s sibling with DATA-DERIVED targets
    (no operator constants at all):

        s_l      = isqrt(chars_l)            (exact integer chars^0.5)
        S        = sum_l s_l
        B        = budget_micro * total // 1e6   (kept-char budget)
        target_l = s_l * B // S
        keep_micro[l] = min(1e6, target_l * 1e6 // chars_l)

    — every step exact arbitrary-precision integer arithmetic (isqrt is
    the floor square root; the oracle re-derives it in HUGEINT with a
    float-sqrt seed plus the two-sided neighbor correction, so double
    rounding can never change the result). Keep decision = the usual
    splitmix64 micro-rate draw. Returns kept (doc_id, lang, n_chars).

    Scale shape: identical to mixture_sample — a shuffle-free (lang,
    chars) partial fold (n_languages driver rows, guarded), then a
    stateless hash-filter scan; decisions are re-partition/resume-stable.
    """
    import math

    if not (0 < budget_micro <= 1_000_000):
        raise ValueError("budget_micro must be in (0, 1e6]")

    def partial(t: pa.Table) -> pa.Table:
        langs = t.column("lang").combine_chunks().dictionary_encode()
        chars = pc.utf8_length(t.column("text")).to_numpy().astype(np.int64)
        codes = langs.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        sums = np.zeros(len(langs.dictionary), dtype=np.int64)
        np.add.at(sums, codes, chars)
        return pa.table(
            {"lang": langs.dictionary, "chars": pa.array(sums, pa.int64())}
        )

    rows = (
        _read_docs(sf_dir, ["lang", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    )
    if len(rows) > 100_000:
        raise ValueError(
            f"temperature_sample: {len(rows)} partial rows — lang "
            "cardinality x blocks exceeds the driver-fold guard"
        )
    chars: dict[str, int] = {}
    for r in rows:
        chars[r["lang"]] = chars.get(r["lang"], 0) + int(r["chars"])
    chars = {lg: c for lg, c in chars.items() if c > 0}
    total = sum(chars.values())
    sroot = {lg: math.isqrt(c) for lg, c in chars.items()}
    s_sum = sum(sroot.values())
    budget = (budget_micro * total) // 1_000_000
    rates = {
        lg: min(1_000_000, ((sroot[lg] * budget) // s_sum) * 1_000_000 // c)
        for lg, c in chars.items()
    }

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        draw = (_hash64(ids, seed) % np.uint64(1_000_000)).astype(np.int64)
        langs = t.column("lang").to_numpy(zero_copy_only=False)
        thresh = np.fromiter(
            (rates.get(lg, 0) for lg in langs), dtype=np.int64,
            count=len(langs),
        )
        out = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang": t.column("lang"),
                "n_chars": pc.utf8_length(t.column("text")).cast(pa.int64()),
            }
        )
        return out.filter(pa.array(draw < thresh))

    return _read_docs(sf_dir, ["doc_id", "lang", "text"]).map_batches(
        keep, batch_format="pyarrow"
    )


SPAN_CORRUPT_SEED = 53
SPAN_CORRUPT_RATE_MICRO = 150_000  # 15% token mask rate


def span_corruption_stats(
    sf_dir: str,
    rate_micro: int = SPAN_CORRUPT_RATE_MICRO,
    seed: int = SPAN_CORRUPT_SEED,
):
    """T5-style span-corruption PREVIEW (Raffel et al. 2020 §3.1.4): mask
    each token iid at ``rate_micro``/1e6 by a splitmix64 draw keyed on
    (doc_id, pos) — runs of consecutive masked tokens form the corruption
    spans (each span becomes one sentinel in the real objective). Emits
    the per-doc accounting a data pipeline needs to size the objective
    (mask budget per doc, expected span length): (doc_id, n_tokens,
    n_masked, n_spans).

    Decisions are re-partition/resume-stable (pure function of
    (doc_id, pos, seed); the key packs as ``doc_id * 2^32 + pos`` in
    WRAPPING uint64 arithmetic, replayed mod 2^64 in HUGEINT by the
    oracle). Shuffle-free per-doc scan, exact integers out.
    """
    if not (0 < rate_micro < 1_000_000):
        raise ValueError("rate_micro must be in (0, 1e6)")

    from .textstats import _flat_tokens, _read_docs

    def stats(t: pa.Table) -> pa.Table:
        n, doc_idx, flat = _flat_tokens(t)
        ids = t.column("doc_id").to_numpy()
        n_tok = np.bincount(doc_idx, minlength=n).astype(np.int64)
        if len(doc_idx):
            pos_in_doc = np.arange(len(doc_idx), dtype=np.int64)
            starts = np.flatnonzero(np.r_[True, doc_idx[1:] != doc_idx[:-1]])
            pos_in_doc -= np.repeat(
                pos_in_doc[starts],
                np.diff(np.append(starts, len(doc_idx))),
            )
            key = (
                ids[doc_idx].astype(np.uint64) << np.uint64(32)
            ) + pos_in_doc.astype(np.uint64)
            masked = (
                _hash64(key, seed) % np.uint64(1_000_000)
            ).astype(np.int64) < rate_micro
            n_masked = np.bincount(
                doc_idx[masked], minlength=n
            ).astype(np.int64)
            span_start = masked & np.r_[
                True, (~masked[:-1]) | (doc_idx[1:] != doc_idx[:-1])
            ]
            n_spans = np.bincount(
                doc_idx[span_start], minlength=n
            ).astype(np.int64)
        else:
            n_masked = np.zeros(n, dtype=np.int64)
            n_spans = np.zeros(n, dtype=np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_masked": pa.array(n_masked, pa.int64()),
                "n_spans": pa.array(n_spans, pa.int64()),
            }
        )

    return _read_docs(sf_dir).map_batches(stats, batch_format="pyarrow")


OVERSAMPLE_SEED = 59
OVERSAMPLE_BOOST_MICRO: dict[str, int] = {
    # epochs x 1e6 per language: >1e6 upsamples (fractional part by
    # hash draw), <1e6 subsamples — both directions of data mixing
    "fr": 2_500_000,
    "zh": 1_700_000,
    "es": 1_200_000,
    "de": 1_000_000,
    "en": 600_000,
}


def oversample_boost(
    sf_dir: str,
    boosts_micro: "dict[str, int] | None" = None,
    seed: int = OVERSAMPLE_SEED,
):
    """Repeat-factor sampling (the multi-epoch data-mixing primitive —
    e.g. running Wikipedia for ~3 epochs while crawl runs once): each
    doc emits ``floor(boost)`` copies plus one more when the splitmix64
    draw lands under the fractional part — so boost 2.5e6 micro means
    "2 copies always, a 3rd with p=0.5", and boost < 1e6 degrades to the
    usual subsample keep-draw. The missing half of the sampling surface
    beside the subsample-only mixers (`mixture_sample`,
    `temperature_sample`, `sample_stratified`).

    Decisions are pure functions of (doc_id, seed) — re-partition and
    resume stable; output rows carry ``copy_idx`` (0-based) so a
    downstream shuffle/pack can treat copies as distinct examples.
    Returns (doc_id, lang, copy_idx). Shuffle-free vectorized scan
    (np.repeat + per-doc arange); languages absent from the boost map
    drop entirely.
    """
    boosts = OVERSAMPLE_BOOST_MICRO if boosts_micro is None else boosts_micro
    if any(b < 0 for b in boosts.values()):
        raise ValueError("boost micros must be >= 0")

    def expand(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        langs = t.column("lang").to_numpy(zero_copy_only=False)
        micro = np.fromiter(
            (boosts.get(lg, 0) for lg in langs), dtype=np.int64,
            count=len(langs),
        )
        draw = (_hash64(ids, seed) % np.uint64(1_000_000)).astype(np.int64)
        copies = micro // 1_000_000 + (draw < micro % 1_000_000)
        total = int(copies.sum())
        if total == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "lang": pa.array([], pa.string()),
                    "copy_idx": pa.array([], pa.int64()),
                }
            )
        rep_ids = np.repeat(ids, copies)
        rep_lang = np.repeat(langs, copies)
        starts = np.cumsum(copies) - copies
        copy_idx = np.arange(total, dtype=np.int64) - np.repeat(
            starts, copies
        )
        return pa.table(
            {
                "doc_id": pa.array(rep_ids, pa.int64()),
                "lang": pa.array(rep_lang, pa.string()),
                "copy_idx": pa.array(copy_idx, pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "lang"]).map_batches(
        expand, batch_format="pyarrow"
    )


def ngram_novelty(sf_dir: str):
    """Streaming n-gram novelty (the dedup-pressure signal a crawl
    pipeline tracks as it ingests): per doc, how many of its DISTINCT
    token bigrams appear here for the FIRST time in doc_id order —
    novelty 1.0 means all-new content, ~0 means the doc's phrasing is
    entirely recycled from earlier documents. First-occurrence ownership
    is a pure min-reduction (gram -> min(doc_id)), so the result is
    ingestion-order-deterministic and re-partition-stable.

    Scale shape: distinct (gram_hash, doc) rows (uint64 shingle hashes,
    never strings) -> ONE gram-keyed min shuffle -> ONE hash-partitioned
    join back -> per-doc counts. No driver state beyond the output.
    Returns (doc_id, n_distinct_bigrams, n_novel_bigrams).
    """
    import ray.data
    from ray.data.aggregate import Min, Sum

    from .dedup import _POS_MIX, _term_hash64
    from .textstats import _flat_tokens, _read_docs

    def gram_rows(t: pa.Table) -> pa.Table:
        n, doc_idx, flat = _flat_tokens(t)
        ids = t.column("doc_id").to_numpy()
        empty = pa.table(
            {
                "gh": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
            }
        )
        if len(doc_idx) < 2:
            return empty
        d = flat.dictionary_encode()
        uniq = d.dictionary.to_pylist()
        uh = np.fromiter(
            (_term_hash64(x) for x in uniq), dtype=np.uint64,
            count=len(uniq),
        )
        seq = uh[d.indices.to_numpy()]
        # positional 2-gram combine — EXACTLY the shingle kernel at k=2
        # (h_0 = seq0, h_1 = h_0 * _POS_MIX[1] + seq1), so the oracle
        # reuses the winnow SQL's mulmod constants
        h = seq[:-1] * _POS_MIX[1] + seq[1:]
        valid = doc_idx[:-1] == doc_idx[1:]
        gh = (h[valid] >> np.uint64(1)).astype(np.int64)  # sign-safe
        gd = doc_idx[:-1][valid]
        if len(gh) == 0:
            return empty
        order = np.lexsort((gh, gd))
        gd, gh = gd[order], gh[order]
        first = np.empty(len(gd), dtype=bool)
        first[0] = True
        first[1:] = (gd[1:] != gd[:-1]) | (gh[1:] != gh[:-1])
        return pa.table(
            {
                "gh": pa.array(gh[first], pa.int64()),
                "doc_id": pa.array(ids[gd[first]], pa.int64()),
            }
        )

    rows = _read_docs(sf_dir).map_batches(gram_rows, batch_format="pyarrow")
    firsts = (
        rows.groupby("gh").aggregate(Min("doc_id", alias_name="first_doc"))
    )
    joined = rows.join(
        firsts, join_type="inner", num_partitions=16, on=("gh",),
    )

    def count_partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        novel = (
            t.column("first_doc").to_numpy() == ids
        ).astype(np.int64)
        g = (
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "one": pa.array(np.ones(len(ids), np.int64)),
                    "nov": pa.array(novel, pa.int64()),
                }
            )
            .group_by(["doc_id"])
            .aggregate([("one", "sum"), ("nov", "sum")])
        )
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "nd": g.column("one_sum").cast(pa.int64()),
                "nn": g.column("nov_sum").cast(pa.int64()),
            }
        )

    per_doc = (
        joined.map_batches(count_partial, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("nd", alias_name="n_distinct_bigrams"),
            Sum("nn", alias_name="n_novel_bigrams"),
        )
    )
    return per_doc
