"""Additional corpus/event analytics with exact SQL oracles: distinct-count
windows and n-gram frequency tables (the groupby-heavy shapes a training-
data pipeline reports on)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def hourly_unique_users(sf_dir: str):
    """Per hour: events + distinct users. Ray Data has no count-distinct
    aggregate, so dedupe (window, user) pairs first (a groupby), then count
    per window — two narrow shuffles instead of per-group sets."""
    import ray.data
    from ray.data.aggregate import Count

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def trunc(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": pc.floor_temporal(t.column("ts"), unit="hour"),
                "user_id": t.column("user_id"),
            }
        )

    pairs = (
        ds.map_batches(trunc, batch_format="pyarrow")
        .groupby(["window_start", "user_id"])
        .aggregate(Count(alias_name="n"))
    )
    return (
        pairs.groupby("window_start")
        .aggregate(Count(alias_name="n_users"))
    )


def top_bigrams(sf_dir: str, k: int = 20):
    """Top-k token bigrams corpus-wide (count desc, bigram asc on ties).

    The pre-shuffle combiner is fully vectorized (no per-token Python): one
    Arrow lowercase+split over the batch (textstats._flat_tokens), a
    dictionary encode, adjacent-code pair keys masked to within-doc pairs,
    and ONE sort + run-length pass to count distinct pairs — the same
    kernel as curation.repetition_stats' bigram runs. Bigram strings are
    materialized only once per DISTINCT pair in the batch (dictionary
    take + binary_join), not once per occurrence."""
    import ray.data
    from ray.data.aggregate import Sum

    from .textstats import _flat_tokens

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    empty = pa.table(
        {
            "bigram": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
        }
    )

    def bigram_partials(t: pa.Table) -> pa.Table:
        _n, doc_idx, flat = _flat_tokens(t)
        if len(doc_idx) < 2:
            return empty
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        adj = doc_idx[1:] == doc_idx[:-1]
        v = np.int64(len(enc.dictionary))
        key = codes[:-1][adj] * v + codes[1:][adj]
        if not len(key):
            return empty
        key.sort(kind="stable")
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        counts = np.diff(np.r_[starts, len(key)]).astype(np.int64)
        uniq = key[starts]
        left = pc.take(enc.dictionary, pa.array(uniq // v))
        right = pc.take(enc.dictionary, pa.array(uniq % v))
        return pa.table(
            {
                "bigram": pc.binary_join_element_wise(left, right, " "),
                "n": pa.array(counts, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(bigram_partials, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "bigram"], descending=[True, False])
        .limit(k)
    )


def pmi_collocations(
    sf_dir: str,
    k: int = 15,
    min_count: int = 5,
    max_candidates: int = 200_000,
):
    """Top-k collocations by pointwise mutual information (Church & Hanks
    1990): for adjacent within-doc token pairs,

        pmi(a,b) = ln( (c_ab/N_bi) / ((c_a/N_uni)*(c_b/N_uni)) )

    over pairs with ``c_ab >= min_count``, ranked (pmi desc, bigram asc).

    ONE corpus pass computes every count: the batch combiner emits bigram
    partials ("a b" keys, the top_bigrams kernel), unigram partials (bare
    term keys — disjoint from bigrams, which always contain a space) and
    two reserved total rows ("\\x00uni" tokens, "\\x00bi" pairs) into a
    single narrow (key, n) groupby-Sum shuffle. The grouped table is then
    consumed by two STREAMING driver folds (candidates+totals, then member
    unigram counts restricted to the bounded candidate vocabulary) — the
    driver never holds the corpus vocabulary, and ``max_candidates``
    raises instead of truncating (the minhash guard pattern).

    Determinism: counts are exact ints; the model-sized pmi of each
    candidate is one scalar ``math.log`` (libm == DuckDB ``ln``) over the
    fixed DOUBLE expression ``((cab*nu)*nu) / ((nb*ca)*cb)`` — identical
    association in the oracle.
    """
    import math

    import ray.data
    from ray.data.aggregate import Sum

    from .textstats import _flat_tokens

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    empty = pa.table(
        {"key": pa.array([], type=pa.string()), "n": pa.array([], type=pa.int64())}
    )

    def partials(t: pa.Table) -> pa.Table:
        _n, doc_idx, flat = _flat_tokens(t)
        if len(doc_idx) == 0:
            return empty
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy().astype(np.int64)
        # unigram partials: one count per distinct code
        ucodes, ucounts = np.unique(codes, return_counts=True)
        uni_keys = pc.take(enc.dictionary, pa.array(ucodes))
        # bigram partials: within-doc adjacent pairs (top_bigrams kernel)
        adj = doc_idx[1:] == doc_idx[:-1]
        v = np.int64(len(enc.dictionary))
        key = codes[:-1][adj] * v + codes[1:][adj]
        n_pairs = int(len(key))
        if n_pairs:
            key.sort(kind="stable")
            starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
            bcounts = np.diff(np.r_[starts, len(key)]).astype(np.int64)
            uniq = key[starts]
            left = pc.take(enc.dictionary, pa.array(uniq // v))
            right = pc.take(enc.dictionary, pa.array(uniq % v))
            bi_keys = pc.binary_join_element_wise(left, right, " ")
        else:
            bcounts = np.empty(0, dtype=np.int64)
            bi_keys = pa.array([], type=pa.string())
        keys = pa.concat_arrays(
            [
                uni_keys.combine_chunks() if hasattr(uni_keys, "combine_chunks") else uni_keys,
                bi_keys,
                pa.array(["\x00uni", "\x00bi"], type=pa.string()),
            ]
        )
        counts = np.concatenate(
            [ucounts.astype(np.int64), bcounts, [len(codes), n_pairs]]
        )
        return pa.table({"key": keys, "n": pa.array(counts, type=pa.int64())})

    grp = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )

    # fold 1: candidates + totals. Each batch is filtered with Arrow
    # kernels FIRST; only the bounded survivors ever become Python objects
    cand: dict[str, int] = {}
    nu = nb = 0
    for batch in grp.iter_batches(batch_format="pyarrow", batch_size=None):
        keys = batch.column("key")
        ns = batch.column("n")
        tot = batch.filter(pc.starts_with(keys, "\x00"))
        for key_s, n in zip(
            tot.column("key").to_pylist(), tot.column("n").to_pylist()
        ):
            if key_s == "\x00uni":
                nu = int(n)
            elif key_s == "\x00bi":
                nb = int(n)
        sel = batch.filter(
            pc.and_(
                pc.match_substring(keys, " "),
                pc.greater_equal(ns, pa.scalar(min_count, pa.int64())),
            )
        )
        cand.update(
            zip(sel.column("key").to_pylist(), map(int, sel.column("n").to_pylist()))
        )
        if len(cand) > max_candidates:
            raise ValueError(
                f"pmi_collocations: >{max_candidates} candidate bigrams at "
                f"min_count={min_count}; raise min_count or max_candidates"
            )
    out_schema = pa.schema(
        [
            ("bigram", pa.string()),
            ("n", pa.int64()),
            ("pmi_r", pa.float64()),
            ("rank", pa.int32()),
        ]
    )
    if not cand or nu == 0 or nb == 0:
        return out_schema.empty_table()

    # fold 2: unigram counts restricted to the candidate member vocabulary
    members = set()
    for bg in cand:
        a, b = bg.split(" ")
        members.add(a)
        members.add(b)
    uc: dict[str, int] = {}
    member_arr = pa.array(sorted(members), type=pa.string())
    for batch in grp.iter_batches(batch_format="pyarrow", batch_size=None):
        sel = batch.filter(pc.is_in(batch.column("key"), value_set=member_arr))
        uc.update(
            zip(sel.column("key").to_pylist(), map(int, sel.column("n").to_pylist()))
        )

    rows = []
    for bg, cab in cand.items():
        a, b = bg.split(" ")
        num = (float(cab) * float(nu)) * float(nu)
        den = (float(nb) * float(uc[a])) * float(uc[b])
        rows.append((bg, cab, math.log(num / den)))
    rows.sort(key=lambda r: (-r[2], r[0]))
    rows = rows[:k]
    return pa.table(
        {
            "bigram": pa.array([r[0] for r in rows], type=pa.string()),
            "n": pa.array([r[1] for r in rows], type=pa.int64()),
            "pmi_r": pa.array(
                [round(r[2], 6) for r in rows], type=pa.float64()
            ),
            "rank": pa.array(
                np.arange(1, len(rows) + 1, dtype=np.int32), type=pa.int32()
            ),
        }
    ).cast(out_schema)


def term_burstiness(sf_dir: str, min_df: int = 50):
    """Per-term burstiness (Church & Gale 1995 / Katz's K-mixture input):
    for every term with df >= ``min_df``, the exact int64 moments of its
    per-document tf over ALL documents — df, ctf (= S), sum of squared
    tf (= Q) — plus the variance-to-mean ratio over the N-doc corpus,
    VMR = (N*Q - S*S) / (N*S), as ONE fixed double expression of exact
    integers (VMR >> 1 marks bursty/topical terms, VMR ~= 1 Poisson-like
    function words — a classic vocabulary-quality signal).

    Scale shape: one tokenize scan, per-batch (term, tf, tf^2) Arrow
    partials, ONE vocab-cardinality shuffle, bounded driver rows (terms
    above the df floor). Returns (term, df, ctf, sum_tf_sq, vmr_r).
    """
    import ray.data
    from ray.data.aggregate import Sum

    from .textstats import _flat_tokens, _read_docs

    import pyarrow.parquet as pq_

    n_docs = pq_.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    if n_docs == 0:
        raise ValueError("term_burstiness: empty corpus")

    def partial(t: pa.Table) -> pa.Table:
        n, doc_idx, flat = _flat_tokens(t)
        if len(doc_idx) == 0:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                    "q": pa.array([], pa.int64()),
                }
            )
        d = flat.dictionary_encode()
        codes = d.indices.to_numpy().astype(np.int64)
        nv = len(d.dictionary)
        key = doc_idx * np.int64(nv) + codes
        ukey, tf = np.unique(key, return_counts=True)
        tcode = (ukey % nv).astype(np.int64)
        g = (
            pa.table(
                {
                    "tcode": pa.array(tcode, pa.int64()),
                    "one": pa.array(np.ones(len(tcode), np.int64)),
                    "tf": pa.array(tf.astype(np.int64)),
                    "tf2": pa.array((tf * tf).astype(np.int64)),
                }
            )
            .group_by(["tcode"])
            .aggregate([("one", "sum"), ("tf", "sum"), ("tf2", "sum")])
        )
        terms = d.dictionary.take(g.column("tcode"))
        return pa.table(
            {
                "term": terms,
                "df": g.column("one_sum").cast(pa.int64()),
                "s": g.column("tf_sum").cast(pa.int64()),
                "q": g.column("tf2_sum").cast(pa.int64()),
            }
        )

    rows = (
        _read_docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(
            Sum("df", alias_name="df"),
            Sum("s", alias_name="ctf"),
            Sum("q", alias_name="sum_tf_sq"),
        )
        .take_all()  # bounded: vocabulary rows (post-floor output below)
    )
    rows = [r for r in rows if r["df"] >= min_df]
    rows.sort(key=lambda r: r["term"])
    N = np.float64(n_docs)
    vmr = [
        float(
            (N * np.float64(r["sum_tf_sq"])
             - np.float64(r["ctf"]) * np.float64(r["ctf"]))
            / (N * np.float64(r["ctf"]))
        )
        for r in rows
    ]
    return pa.table(
        {
            "term": pa.array([r["term"] for r in rows], pa.string()),
            "df": pa.array([r["df"] for r in rows], pa.int64()),
            "ctf": pa.array([r["ctf"] for r in rows], pa.int64()),
            "sum_tf_sq": pa.array(
                [r["sum_tf_sq"] for r in rows], pa.int64()
            ),
            "vmr_r": pa.array(np.round(vmr, 6), pa.float64()),
        }
    )
