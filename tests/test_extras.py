"""Dedup / ANN / textstats / windows operators on the sf0.001 testdata,
including the checks the SQL gate can't express (LSH recall vs exact
Jaccard, IVF recall vs brute force)."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def test_exact_dedup_counts():
    from searchengine_ray.dedup import exact_dedup

    df = exact_dedup(SF).to_pandas()
    assert df["n_dups"].sum() == 500  # every doc accounted for
    assert df["doc_id"].is_unique


def test_ngram_jaccard_finds_planted_dups():
    from searchengine_ray.dedup import ngram_jaccard_pairs

    df = ngram_jaccard_pairs(SF).to_pandas()
    # sf0.001 plants 25 near-dup docs (originals + ' dup'-token insertions)
    assert len(df) >= 20
    assert (df["jaccard_micro"] >= 600000).all()


def test_dedup_components_invariants():
    from searchengine_ray.dedup import dedup_components, ngram_jaccard_pairs

    comp = dedup_components(SF).to_pandas()
    pairs = ngram_jaccard_pairs(SF).to_pandas()
    rep = dict(zip(comp["doc_id"], comp["rep_id"]))
    # both endpoints of every dup pair share a representative
    for a, b in zip(pairs["doc_id_a"], pairs["doc_id_b"]):
        assert rep[a] == rep[b]
    # the representative is a member of its own component
    assert (comp["rep_id"] <= comp["doc_id"]).all()
    assert set(comp["rep_id"]) <= set(comp["doc_id"])


def test_batch_shingles_bitwise_matches_per_doc():
    """_batch_shingles (one Arrow tokenize + global combine per batch) must
    be bit-identical to per-doc _shingle_hashes, including empty/short docs
    and the distinct=False multiset form; MinHashSignatures.__call__ must
    equal the per-doc sig() reference."""
    import numpy as np
    import pyarrow as pa

    from searchengine_ray.dedup import (
        MinHashSignatures, _batch_shingles, _shingle_hashes,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "",
        "one two",  # shorter than n=3 -> no shingles
        "dup dup dup dup dup",
        "a b c d e f g a b c d e",
    ]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
    )
    gdoc, gh = _batch_shingles(t, 3)
    per_doc = {i: _shingle_hashes(x, 3) for i, x in enumerate(texts)}
    for i, want in per_doc.items():
        got = np.sort(gh[gdoc == i])
        assert np.array_equal(got, np.sort(want)), i
    # multiset form preserves per-doc gram counts
    gdoc2, _gh2 = _batch_shingles(t, 3, distinct=False)
    for i, x in enumerate(texts):
        n_tok = len(x.split())
        assert (gdoc2 == i).sum() == max(0, n_tok - 2), i
    m = MinHashSignatures(n=3, num_perm=16, seed=9)
    batch_sigs = m(t).column("sig").to_pylist()
    for i, x in enumerate(texts):
        want = m.sig(x).view(np.int64).tolist()
        assert batch_sigs[i] == want, i


def test_minhash_recall_vs_exact():
    from searchengine_ray.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = ngram_jaccard_pairs(SF, threshold=0.6)
    exact_pairs = {
        (a, b)
        for a, b in zip(
            exact.to_pandas()["doc_id_a"], exact.to_pandas()["doc_id_b"]
        )
    }
    mh = minhash_lsh_pairs(SF, threshold=0.6)
    mh_pairs = set(
        zip(mh.column("doc_id_a").to_pylist(), mh.column("doc_id_b").to_pylist())
    )
    # candidates are verified with exact Jaccard -> no false positives beyond
    # the shingle-universe difference; recall must be high
    assert len(mh_pairs & exact_pairs) >= 0.9 * len(exact_pairs)


def test_simhash_finds_near_dups():
    from searchengine_ray.dedup import simhash_pairs

    t = simhash_pairs(SF, max_hamming=6)
    assert t.num_rows >= 10  # planted dups are within a few bits
    assert all(h <= 6 for h in t.column("hamming").to_pylist())


def test_minhash_empty_candidates(ray_session, tmp_path):
    """A corpus with no near-dups must return an empty typed table, not
    crash on the schema-less empty candidate Dataset."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_ray.dedup import minhash_lsh_pairs

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(4000)]
    texts = [
        " ".join(rng.choice(vocab, size=40, replace=False)) for _ in range(40)
    ]
    d = tmp_path / "nodup"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(40), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    t = minhash_lsh_pairs(str(d))
    assert t.num_rows == 0
    assert t.column_names == ["doc_id_a", "doc_id_b", "jaccard"]


def test_embedding_lsh_recall_vs_brute():
    from searchengine_ray.dedup import embedding_dup_pairs, embedding_dup_pairs_lsh

    exact = embedding_dup_pairs(SF, threshold=0.4).to_pandas()
    exact_pairs = set(zip(exact["vec_id_a"], exact["vec_id_b"]))
    assert exact_pairs  # sf0.001 plants near-dup embeddings above 0.4
    lsh = embedding_dup_pairs_lsh(SF, threshold=0.4).to_pandas()
    lsh_pairs = set(zip(lsh["vec_id_a"], lsh["vec_id_b"]))
    # verified with exact cosine inside buckets -> no false positives
    assert lsh_pairs <= exact_pairs
    if exact_pairs:
        assert len(lsh_pairs & exact_pairs) >= 0.7 * len(exact_pairs)


def test_ann_brute_matches_numpy():
    from searchengine_ray.ann import _load_matrix, brute_topk

    t = brute_topk(SF, n_queries=5, k=8).to_pandas()
    ids, mat = _load_matrix(SF)
    sims = mat @ mat.T
    for q in range(5):
        s = sims[q].copy()
        s[q] = -np.inf
        order = np.lexsort((ids, -s))[:8]
        got = t[t["query_id"] == q]["neighbor_id"].tolist()
        assert got == [int(ids[i]) for i in order]


def test_ann_hard_negatives_match_numpy():
    import pyarrow.parquet as pq

    from searchengine_ray.ann import _load_matrix, hard_negative_topk

    t = hard_negative_topk(SF, n_queries=5, k=8).to_pandas()
    ids, mat = _load_matrix(SF)
    labels = (
        pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "label"])
        .to_pandas()
        .set_index("vec_id")["label"]
        .reindex(ids)
        .to_numpy()
    )
    sims = mat @ mat.T
    for q in range(5):
        s = sims[q].copy()
        s[labels == labels[q]] = -np.inf  # same class (incl. self): excluded
        order = np.lexsort((ids, -s))[:8]
        want = [int(ids[i]) for i in order if np.isfinite(s[i])]
        got = t[t["query_id"] == q]["neighbor_id"].tolist()
        assert got == want
        # every returned neighbor really is a different class
        assert all(labels[ids == n][0] != labels[q] for n in got)


def test_ann_ivf_recall():
    from searchengine_ray.ann import brute_topk, ivf_topk

    brute = brute_topk(SF, n_queries=10, k=10).to_pandas()
    ivf = ivf_topk(SF, n_queries=10, k=10, n_cells=8, nprobe=4).to_pandas()
    recalls = []
    for q in brute["query_id"].unique():
        b = set(brute[brute["query_id"] == q]["neighbor_id"])
        i = set(ivf[ivf["query_id"] == q]["neighbor_id"])
        recalls.append(len(b & i) / len(b))
    assert np.mean(recalls) >= 0.6  # nprobe=4 of 8 cells


def test_token_stats_and_quality():
    from searchengine_ray.textstats import quality_score, token_stats

    ts = token_stats(SF).to_pandas()
    assert (ts["n_unique"] <= ts["n_tokens"]).all()
    q = quality_score(SF).to_pandas()
    assert set(q.columns) == {
        "doc_id", "n_tokens", "stop_ratio_micro", "mean_token_len_micro", "passes",
    }
    assert (q["stop_ratio_micro"] <= 1_000_000).all()


def test_asof_join_semantics():
    """Every purchase matches its user's most recent STRICTLY-earlier
    click; verified per-row against a pandas merge_asof oracle."""
    import pandas as pd
    import pyarrow.parquet as pq

    from searchengine_ray.windows import asof_join_purchase_click

    got = (
        asof_join_purchase_click(SF)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ev = pq.read_table(
        f"{SF}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    ).to_pandas()
    p = ev[ev.event_type == "purchase"].sort_values("ts")
    c = ev[ev.event_type == "click"].sort_values("ts")
    want = pd.merge_asof(
        p, c, on="ts", by="user_id", suffixes=("", "_c"),
        allow_exact_matches=False,
    ).dropna(subset=["event_id_c"])
    want = want.sort_values("event_id").reset_index(drop=True)
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert got["click_event_id"].tolist() == want["event_id_c"].astype(int).tolist()
    assert (got["gap_us"] > 0).all()


def test_range_join_vs_bruteforce():
    """Every (error, click) pair within the strictly-preceding window, per
    user — verified row-for-row against a pandas brute-force oracle on the
    smoke-scale data (which includes errors near the span start, the
    uint64-underflow edge)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from searchengine_ray.windows import range_join_error_click

    got = (
        range_join_error_click(SF, window_minutes=60)
        .to_pandas()
        .sort_values(["error_event_id", "click_event_id"])
        .reset_index(drop=True)
    )
    ev = pq.read_table(
        f"{SF}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    ).to_pandas()
    e = ev[ev.event_type == "error"]
    c = ev[ev.event_type == "click"]
    m = e.merge(c, on="user_id", suffixes=("", "_c"))
    win = pd.Timedelta(minutes=60)
    m = m[(m.ts_c < m.ts) & (m.ts_c >= m.ts - win)]
    want = m.sort_values(["event_id", "event_id_c"]).reset_index(drop=True)
    assert got["error_event_id"].tolist() == want["event_id"].tolist()
    assert got["click_event_id"].tolist() == want["event_id_c"].tolist()
    gap = ((want["ts"] - want["ts_c"]).dt.total_seconds() * 1e6).round().astype(int)
    assert got["gap_us"].tolist() == gap.tolist()


def test_hll_sketch_accuracy():
    """HLL register math on known cardinalities + the windowed pipeline vs
    the exact distinct-count operator (per-window relative error bounded)."""
    from searchengine_ray.sketch import estimate, registers_of
    from searchengine_ray.textextras import hourly_unique_users
    from searchengine_ray.sketch import hll_distinct_users

    # pure register math: 3 disjoint cardinalities, merged = union
    for n in (50, 1000, 20000):
        vals = np.arange(n, dtype=np.int64) * 7919 + 13
        est = estimate(registers_of(vals, p=12))
        assert abs(est - n) / n < 0.06, (n, est)
    a = registers_of(np.arange(0, 5000, dtype=np.int64), 12)
    b = registers_of(np.arange(2500, 7500, dtype=np.int64), 12)
    merged = np.maximum(a, b)
    assert abs(estimate(merged) - 7500) / 7500 < 0.06

    exact = hourly_unique_users(SF).to_pandas().set_index("window_start")
    approx = hll_distinct_users(SF).to_pandas().set_index("window_start")
    assert set(exact.index) == set(approx.index)
    joined = exact.join(approx)
    rel = (
        (joined["n_users_approx"] - joined["n_users"]).abs()
        / joined["n_users"]
    )
    assert rel.max() < 0.1  # p=12 -> ~1.6% typical; generous bound


def test_hopping_window_invariants():
    """Each event lands in exactly window/hop = 2 hopping windows, so the
    hopping totals are exactly 2x the per-type event counts."""
    from ray.data.aggregate import Count

    import ray.data

    from searchengine_ray.windows import hopping_counts

    hop = hopping_counts(SF).to_pandas()
    ev = (
        ray.data.read_parquet(f"{SF}/events.parquet", columns=["event_type"])
        .groupby("event_type")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    got = hop.groupby("event_type")["n_events"].sum().sort_index()
    want = (ev.set_index("event_type")["n"] * 2).sort_index()
    assert got.equals(want.astype(got.dtype))


def test_sessionize_invariants():
    from searchengine_ray.windows import sessionize

    s = sessionize(SF).to_pandas()
    assert (s["n_sessions"] >= 1).all()
    assert (s["max_session_events"] >= 1).all()


def test_driver_contract_shapes():
    """queries() and oracle_sql() stay consistent: every oracle key has a
    query, callables are callable."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m

    qs, sql = m.queries(), m.oracle_sql()
    assert set(sql) <= set(qs)
    assert len(qs) >= 25
    for name, fn in qs.items():
        assert callable(fn), name


def test_token_counts_bpe_vs_ws(tmp_path, ray_session):
    """BPE-ish piece count vs whitespace count on punctuation-rich text —
    the engine's Arrow RE2 kernel must agree with Python re on the shared
    pattern (and the DuckDB oracle runs the identical pattern)."""
    import re

    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_ray.textstats import BPE_PIECE_RE, token_counts

    texts = [
        "Hello, world! It's a test-case with 42 numbers and  double spaces.",
        "tab\tnewline\nmixed CASE and don't-stop... 3.14 x_y",
        "plain lowercase words only",
        "",
    ]
    d = tmp_path / "tc"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts),
            }
        ),
        str(d / "documents.parquet"),
    )
    out = token_counts(str(d)).to_pandas().sort_values("doc_id")
    for i, t in enumerate(texts):
        assert out.iloc[i]["n_ws_tokens"] == len(t.split())
        assert out.iloc[i]["n_bpe_pieces"] == len(
            re.findall(BPE_PIECE_RE, t.lower())
        )
    # the two signals genuinely differ on punctuation-rich text
    assert out.iloc[0]["n_bpe_pieces"] > out.iloc[0]["n_ws_tokens"]


def test_simhash_batch_kernel_matches_scalar(tmp_path, ray_session):
    """The vectorized add_simhash scatter-add is bit-identical to the
    scalar _simhash64 reference on punctuation/unicode-ish text."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_ray.dedup import _simhash64, simhash_pairs

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",  # exact dup: ham 0
        "the quick brown fox jumped over the lazy dogs",
        "completely different content about databases and queries",
        "",
        "a a a a b",
    ]
    d = tmp_path / "sh"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts),
            }
        ),
        str(d / "documents.parquet"),
    )
    # drive through the pipeline but recompute hashes scalar-side: pairs
    # must match a brute-force scalar-hash + blocking computation
    out = simhash_pairs(str(d), max_hamming=10)
    hs = [_simhash64(t) for t in texts]

    def blocks(h):
        return [(h >> (16 * i)) & 0xFFFF for i in range(4)]

    expect = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            x = hs[i] ^ hs[j]
            ham = bin(x).count("1")
            share = any(a == b for a, b in zip(blocks(hs[i]), blocks(hs[j])))
            if ham <= 10 and share:
                expect.add((i, j))
    got = set(
        zip(out.column("doc_id_a").to_pylist(), out.column("doc_id_b").to_pylist())
    )
    assert got == expect and len(expect) > 0


def test_dedup_components_distributed_equals_driver(ray_session):
    """The fully-distributed hash-min label propagation returns exactly the
    driver-side resolver's components."""
    from searchengine_ray.dedup import (
        dedup_components,
        dedup_components_distributed,
    )

    a = (
        dedup_components(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        dedup_components_distributed(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(a) > 0 and a.equals(b)


def test_ivf_scan_pruning(tmp_path, ray_session):
    """The IVF index REALLY prunes: per-query scored pairs ~= nprobe/n_cells
    of brute force, and the partitioned layout exposes per-cell row counts
    that sum to the corpus."""
    from searchengine_ray import ann

    index_dir = str(tmp_path / "ivf")
    ann.ivf_build(SF, index_dir, n_cells=8)
    q_ids, q_mat = ann._query_matrix(SF, 10)
    stats = ann.ivf_scan_stats(index_dir, q_mat, nprobe=2)
    assert stats["total_rows"] == 500
    assert stats["rows_read"] <= stats["total_rows"]
    ratio = stats["pairs_scored"] / stats["pairs_brute"]
    # expected nprobe/n_cells = 0.25; allow slack for uneven cells
    assert ratio <= 0.6
    # and the pruned search still returns full top-k rows
    out = ann.ivf_search(index_dir, q_ids, q_mat, k=5, nprobe=2)
    assert out.num_rows == 50


def test_semantic_dedup_properties_and_reference():
    """SemDeDup greedy: (a) kept set is an eps-independent set within each
    cluster, (b) every dropped item is > eps similar to its recorded kept
    representative, (c) the whole output matches a local reference
    re-implementation (same centroids, same ordering) exactly."""
    from searchengine_ray.ann import _kmeans, _load_matrix, _sample_matrix
    from searchengine_ray.dedup import semantic_dedup

    eps = 0.4
    out = semantic_dedup(SF, eps=eps).to_pandas().sort_values("vec_id")
    ids, mat = _load_matrix(SF)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    assert list(out["vec_id"]) == list(ids)

    centers = _kmeans(_sample_matrix(SF, 99, 4096), 16, 99)
    sims_c = mat @ centers.T
    cell = np.argmax(sims_c, axis=1)
    csim = sims_c[np.arange(len(ids)), cell]
    assert list(out["cell"]) == list(cell.astype(np.int32))

    by_id = out.set_index("vec_id")
    for c in np.unique(cell):
        m = cell == c
        cids, cmat, ccs = ids[m], mat[m], csim[m]
        o = np.lexsort((cids, ccs))
        cids, cmat = cids[o], cmat[o]
        S = cmat @ cmat.T
        kept_idx = []
        for i in range(len(cids)):
            row = by_id.loc[cids[i]]
            if kept_idx:
                s = S[i, kept_idx]
                j = int(np.argmax(s))
                if s[j] > eps:
                    assert not row["kept"]
                    assert row["dup_of"] == cids[kept_idx[j]]
                    continue
            assert row["kept"] and row["dup_of"] == -1
            kept_idx.append(i)
        # (a) independent set among kept
        K = S[np.ix_(kept_idx, kept_idx)]
        np.fill_diagonal(K, 0.0)
        assert (K <= eps).all()
    # at least one planted near-dup neighborhood collapses
    assert (~out["kept"]).sum() > 0


def test_dedup_keep_best_in_cluster(ray_session):
    """keep_best_in_cluster: same cluster membership as the distributed
    components, exactly one winner per cluster, and the winner maximizes
    (n_tokens DESC, stop_ratio ASC, doc_id ASC) — recounted from the
    returned integer columns themselves."""
    from searchengine_ray.dedup import (
        dedup_components_distributed,
        keep_best_in_cluster,
    )

    kb = keep_best_in_cluster(SF).to_pandas()
    comp = dedup_components_distributed(SF).to_pandas()
    assert set(zip(kb["doc_id"], kb["rep_id"])) == set(
        zip(comp["doc_id"], comp["rep_id"])
    )
    assert len(kb)
    for rep, g in kb.groupby("rep_id"):
        assert int(g["keep"].sum()) == 1
        rows = sorted(
            g.itertuples(),
            key=lambda r: (-r.n_tokens, r.stop_ratio_micro, r.doc_id),
        )
        assert rows[0].keep and not any(r.keep for r in rows[1:])


def test_pmi_collocations_scalar_recount(ray_session):
    """pmi_collocations vs a dict recount with plain Python floats over
    the same expression; the planted 'hash join'/'unit test' style
    bigrams must surface with positive PMI."""
    import math

    from searchengine_ray.textextras import pmi_collocations

    got = pmi_collocations(SF, k=10, min_count=5).to_pandas()

    import duckdb

    con = duckdb.connect()
    texts = [
        r[0]
        for r in con.sql(
            f"SELECT text FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id"
        ).fetchall()
    ]
    import re as _re

    tokenize = _re.compile(r"[a-z0-9_]+").findall
    uni, bi = {}, {}
    nu = nb = 0
    for tx in texts:
        toks = tokenize(tx.lower())
        nu += len(toks)
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
            nb += 1
    rows = []
    for (a, b), cab in bi.items():
        if cab >= 5:
            num = (float(cab) * float(nu)) * float(nu)
            den = (float(nb) * float(uni[a])) * float(uni[b])
            rows.append((f"{a} {b}", cab, math.log(num / den)))
    rows.sort(key=lambda r: (-r[2], r[0]))
    rows = rows[:10]
    assert got["bigram"].tolist() == [r[0] for r in rows]
    assert got["n"].tolist() == [r[1] for r in rows]
    for g, w in zip(got["pmi_r"], rows):
        assert abs(g - w[2]) < 5e-7
    assert all(got["pmi_r"] > 0)  # top collocations are positively associated


def test_funnel_matches_scalar_greedy_and_is_monotone():
    """Engine funnel == a per-user plain-Python greedy first-touch recount
    over the raw events; counts non-increasing by step."""
    import collections

    import duckdb

    from searchengine_ray.windows import (
        FUNNEL_HORIZON_US, FUNNEL_STEPS, funnel_counts,
    )

    got = funnel_counts(SF).to_pandas().sort_values("step")
    ev = duckdb.sql(
        f"SELECT user_id, epoch_us(ts) AS us, event_type "
        f"FROM '{SF}/events.parquet' ORDER BY user_id, us"
    ).fetchall()
    by_user = collections.defaultdict(list)
    for uid, us, et in ev:
        by_user[uid].append((us, et))
    want = [0] * len(FUNNEL_STEPS)
    for evs in by_user.values():
        t_prev, cap = None, None
        for i, step in enumerate(FUNNEL_STEPS):
            cands = [
                us for us, et in evs
                if et == step
                and (i == 0 or (us > t_prev and us <= cap))
            ]
            if not cands:
                break
            t_prev = min(cands)
            if i == 0:
                cap = t_prev + FUNNEL_HORIZON_US
            want[i] += 1
    assert list(got["users"]) == want
    assert list(got["step_name"]) == list(FUNNEL_STEPS)
    u = got["users"].to_numpy()
    assert (u[1:] <= u[:-1]).all()


def test_funnel_horizon_and_strict_order(tmp_path):
    """Planted log: a click at the exact view timestamp does NOT count
    (strict >), a purchase outside the horizon of the FIRST view does NOT
    count, and a complete in-window chain counts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_ray.windows import funnel_counts

    H = 3_600_000_000  # 1 h horizon for the test
    base = 1_700_000_000_000_000  # epoch us
    rows = [
        # user 1: full chain inside the horizon -> completes all 3
        (1, base, "view"), (1, base + 10, "click"), (1, base + 20, "purchase"),
        # user 2: click at SAME us as view -> strict > excludes it
        (2, base, "view"), (2, base, "click"),
        # user 3: purchase after the horizon anchored at the FIRST view
        # (the second view does NOT re-anchor the window)
        (3, base, "view"), (3, base + H - 5, "click"),
        (3, base + H + 100, "view"), (3, base + H + 200, "purchase"),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    got = funnel_counts(str(d), horizon_us=H).to_pandas().sort_values("step")
    assert list(got["users"]) == [3, 2, 1]


def test_retention_offset_zero_is_every_user_and_matches_brute():
    """Every user is active on their cohort day (offset 0 sums to the
    distinct-user count), and the whole triangle equals a DuckDB-computed
    brute recount."""
    import duckdb

    from searchengine_ray.windows import retention_cohorts

    got = (
        retention_cohorts(SF).to_pandas()
        .sort_values(["cohort_day", "offset_days"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.execute(f"""
        WITH ud AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day
                    FROM '{SF}/events.parquet'),
        c AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY 1),
        a AS (SELECT DISTINCT ud.user_id, c.cohort_day,
                     ud.day - c.cohort_day AS offset_days
              FROM ud JOIN c USING (user_id))
        SELECT cohort_day, offset_days, CAST(count(*) AS BIGINT) AS users
        FROM a GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    assert got.equals(want)
    n_users = con.execute(
        f"SELECT count(DISTINCT user_id) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert got[got["offset_days"] == 0]["users"].sum() == n_users
    assert (got["users"] > 0).all() and (got["offset_days"] >= 0).all()


def test_retention_guard_on_packed_cell_overflow(tmp_path):
    """ADVICE r4: an anomalous future-dated event that widens a user's
    offset span past 2^20 days must raise loudly instead of silently
    colliding packed (cohort, offset) cells."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchengine_ray.windows import retention_cohorts

    day_us = 86_400_000_000
    ts = pa.array(
        [0, (1 << 20) * day_us],  # same user, offset exactly 2^20 days
        type=pa.timestamp("us"),
    )
    t = pa.table({
        "event_id": pa.array([0, 1], pa.int64()),
        "ts": ts,
        "user_id": pa.array([7, 7], pa.int64()),
        "event_type": pa.array(["a", "a"]),
        "value": pa.array([0.0, 0.0]),
        "props": pa.array(["", ""]),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    with pytest.raises(Exception, match="2\\^20|collide"):
        retention_cohorts(str(d)).to_pandas()


def test_dedup_components_autoroutes_to_distributed(ray_session):
    """VERDICT r4 item 2: above max_driver_pairs the public name must route
    through the distributed label propagation (no driver-side pair arrays)
    and return the identical labeling."""
    from searchengine_ray.dedup import dedup_components

    driver = (
        dedup_components(SF).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    rerouted = (
        dedup_components(SF, max_driver_pairs=0).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert driver.equals(rerouted)
    assert len(driver) > 0


def test_ivf_incremental_equals_monolithic_same_centroids(tmp_path, ray_session):
    """Appending the second half with ivf_add (frozen centroids) must
    serve results IDENTICAL to a monolithic index built over the full
    corpus with those same centroids — the segment layout is invisible to
    search. Also: re-adding the same segment is a no-op (idempotent), and
    scan stats count both segments."""
    import pyarrow.parquet as pq_

    from searchengine_ray import ann

    path = f"{SF}/embeddings.parquet"
    split = pq_.ParquetFile(path).metadata.num_rows // 2

    import os as os_

    half_dir = str(tmp_path / "half")
    os_.makedirs(half_dir)
    head = pq_.read_table(
        path, columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", split)],
    )
    pq_.write_table(head, f"{half_dir}/embeddings.parquet")

    incr_dir = str(tmp_path / "incr")
    centers = ann.ivf_build(half_dir, incr_dir, n_cells=8)
    seg = ann.ivf_add(incr_dir, SF, min_vec_id=split, segment="tail")
    assert ann.ivf_add(incr_dir, SF, min_vec_id=split, segment="tail") == seg

    mono_dir = str(tmp_path / "mono")
    ann.ivf_build(SF, mono_dir, n_cells=8, centers=centers)

    q_ids, q_mat = ann._query_matrix(SF, 6)
    a = ann.ivf_search(incr_dir, q_ids, q_mat, k=5, nprobe=3).to_pandas()
    b = ann.ivf_search(mono_dir, q_ids, q_mat, k=5, nprobe=3).to_pandas()
    key = ["query_id", "rank"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)

    si = ann.ivf_scan_stats(incr_dir, q_mat, nprobe=3)
    sm = ann.ivf_scan_stats(mono_dir, q_mat, nprobe=3)
    assert si == sm  # same per-cell row counts across the two layouts


def test_ivf_delete_tombstone_equals_expunged(tmp_path, ray_session):
    """ivf_delete (tombstone phase) and ivf_expunge (segment compaction)
    must serve IDENTICAL search results, no deleted id may appear as a
    neighbor in either, and expunge physically drops exactly the
    tombstoned rows then clears the tombstone file."""
    import os as os_

    import pyarrow.parquet as pq_

    from searchengine_ray import ann

    idx = str(tmp_path / "idx")
    ann.ivf_build(SF, idx, n_cells=8)
    total = pq_.ParquetFile(f"{SF}/embeddings.parquet").metadata.num_rows
    ids = np.arange(total, dtype=np.int64)
    dead = ids[ids % 7 == 3]
    ann.ivf_delete(idx, dead)

    q_ids, q_mat = ann._query_matrix(SF, 6)
    key = ["query_id", "rank"]
    a = (
        ann.ivf_search(idx, q_ids, q_mat, k=5, nprobe=3)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    dropped = ann.ivf_expunge(idx)
    assert dropped == len(dead)
    assert not os_.path.exists(os_.path.join(idx, "tombstones.json"))
    b = (
        ann.ivf_search(idx, q_ids, q_mat, k=5, nprobe=3)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert not a.neighbor_id.isin(dead).any()
    # idempotent: expunging again drops nothing
    assert ann.ivf_expunge(idx) == 0


def test_ivf_mutation_crash_retry_consistency(tmp_path, ray_session):
    """Crash/retry regressions from the late-r5 review: (a) a pre-commit
    leftover segment dir must be cleared on ivf_add retry, not appended
    into; (b) re-adding a segment AFTER an expunge renamed its dir is a
    no-op (applied_adds keys the idempotency, so compacted deletes stay
    dead); (c) expunge reclaims the old segment dirs."""
    import json as json_
    import os as os_
    import shutil as shutil_

    import pyarrow.parquet as pq_

    from searchengine_ray import ann

    path = f"{SF}/embeddings.parquet"
    split = pq_.ParquetFile(path).metadata.num_rows // 2
    half_dir = str(tmp_path / "half")
    os_.makedirs(half_dir)
    pq_.write_table(
        pq_.read_table(path, columns=["vec_id", "embedding"],
                       filters=[("vec_id", "<", split)]),
        f"{half_dir}/embeddings.parquet",
    )
    idx = str(tmp_path / "idx")
    ann.ivf_build(half_dir, idx, n_cells=8)

    # (a) simulate a died-before-meta-commit add: data written, meta not
    ann.ivf_add(idx, SF, min_vec_id=split, segment="tail")
    meta_path = os_.path.join(idx, "meta.json")
    with open(meta_path) as f:
        committed = json_.load(f)
    uncommitted = dict(committed)
    uncommitted["segments"] = ["vectors"]
    uncommitted["applied_adds"] = []
    with open(meta_path, "w") as f:
        json_.dump(uncommitted, f)  # roll meta back; seg dir remains
    ann.ivf_add(idx, SF, min_vec_id=split, segment="tail")  # the retry
    rows = sum(
        pq_.ParquetFile(os_.path.join(r, fn)).metadata.num_rows
        for r, _d, fs in os_.walk(os_.path.join(idx, "vectors_seg_tail"))
        for fn in fs if fn.endswith(".parquet")
    )
    total = pq_.ParquetFile(path).metadata.num_rows
    assert rows == total - split  # each tail row exactly once

    # (b) delete some tail ids, expunge (renames dirs), then re-add
    ids = np.arange(total, dtype=np.int64)
    dead = ids[(ids >= split) & (ids % 5 == 0)]
    ann.ivf_delete(idx, dead)
    dropped = ann.ivf_expunge(idx)
    assert dropped == len(dead)
    assert ann.ivf_add(idx, SF, min_vec_id=split, segment="tail") \
        == "vectors_seg_tail"  # no-op: applied_adds remembers it
    q_ids, q_mat = ann._query_matrix(SF, 6)
    out = ann.ivf_search(idx, q_ids, q_mat, k=5, nprobe=3).to_pandas()
    assert not out.neighbor_id.isin(dead).any()
    assert not out.duplicated(["query_id", "neighbor_id"]).any()

    # (c) the pre-compaction dirs are gone; the committed segments exist
    assert not os_.path.exists(os_.path.join(idx, "vectors"))
    assert not os_.path.exists(os_.path.join(idx, "vectors_seg_tail"))
    with open(meta_path) as f:
        segs = json_.load(f)["segments"]
    for s in segs:
        assert os_.path.exists(os_.path.join(idx, s))


def test_ivf_merge_segments_preserves_search(tmp_path, ray_session):
    """ivf_merge_segments coalesces base + appended segments (and pending
    tombstones) into ONE layout with identical search results — the
    forceMerge(1) analog; a second merge with nothing pending is a no-op."""
    import json as json_
    import os as os_

    import pyarrow.parquet as pq_

    from searchengine_ray import ann

    path = f"{SF}/embeddings.parquet"
    total = pq_.ParquetFile(path).metadata.num_rows
    split = total // 2
    half_dir = str(tmp_path / "half")
    os_.makedirs(half_dir)
    pq_.write_table(
        pq_.read_table(path, columns=["vec_id", "embedding"],
                       filters=[("vec_id", "<", split)]),
        f"{half_dir}/embeddings.parquet",
    )
    idx = str(tmp_path / "idx")
    ann.ivf_build(half_dir, idx, n_cells=8)
    ann.ivf_add(idx, SF, min_vec_id=split, segment="tail")
    ids = np.arange(total, dtype=np.int64)
    dead = ids[ids % 11 == 4]
    ann.ivf_delete(idx, dead)

    q_ids, q_mat = ann._query_matrix(SF, 6)
    key = ["query_id", "rank"]
    before = (
        ann.ivf_search(idx, q_ids, q_mat, k=5, nprobe=3)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    assert ann.ivf_merge_segments(idx) == 2  # base + tail
    with open(os_.path.join(idx, "meta.json")) as f:
        meta = json_.load(f)
    assert meta["segments"] == ["vectors_m1"]
    assert not os_.path.exists(os_.path.join(idx, "tombstones.json"))
    after = (
        ann.ivf_search(idx, q_ids, q_mat, k=5, nprobe=3)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    assert before.equals(after)
    assert not after.neighbor_id.isin(dead).any()
    # physical row count = live rows exactly once
    rows = sum(
        pq_.ParquetFile(os_.path.join(r, fn)).metadata.num_rows
        for r, _d, fs in os_.walk(os_.path.join(idx, "vectors_m1"))
        for fn in fs if fn.endswith(".parquet")
    )
    assert rows == total - len(dead)
    assert ann.ivf_merge_segments(idx) == 1  # no-op on one clean segment


def test_suggest_modes(ray_session):
    """ES term-suggester modes: missing suppresses in-dictionary inputs,
    popular keeps only strictly-more-frequent suggestions, always is the
    original surface; bad mode raises."""
    import pytest as _pytest

    from searchengine_ray.gate import engine_for
    from searchengine_ray.spell import suggest

    idx = engine_for("/root/testdata/sf0.001", "bm25").index
    always = suggest(idx, ["scan", "stram"]).to_pandas()
    missing = suggest(idx, ["scan", "stram"], suggest_mode="missing").to_pandas()
    # 'scan' is in the dictionary -> dropped under missing; 'stram' kept
    assert "scan" not in set(missing["qterm"])
    assert set(missing["qterm"]) == {"stram"}
    # missing rows equal always rows for the absent input
    a_rows = always[always["qterm"] == "stram"].reset_index(drop=True)
    import pandas as _pd

    _pd.testing.assert_frame_equal(a_rows, missing.reset_index(drop=True))
    popular = suggest(idx, ["scan"], suggest_mode="popular").to_pandas()
    qdf = idx.postings("body", "scan", need_positions=False).stat_df
    assert (popular["df"] > qdf).all()
    with _pytest.raises(ValueError, match="suggest_mode"):
        suggest(idx, ["scan"], suggest_mode="sometimes")


def test_significant_text_dedupes_foreground(ray_session, tmp_path):
    """filter_duplicate_text counts duplicate docs once: fg counts and
    fg_total shrink vs plain significant_terms on a corpus with PLANTED
    exact dups; filter off == significant_terms exactly."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from searchengine_ray.build import build_index
    from searchengine_ray.config import BuildConfig, ModelParams
    from searchengine_ray.engine import SearchEngine
    from searchengine_ray.sigterms import significant_terms, significant_text

    base = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    df = base.to_pandas().head(60)
    # plant 3 exact copies of each of the first 5 'dup'-containing docs
    dup_rows = df[df.text.str.contains("dup")].head(5)
    assert len(dup_rows) == 5
    extra = pd.concat([dup_rows] * 3, ignore_index=True)
    extra["doc_id"] = np.arange(1000, 1000 + len(extra))
    corpus = pd.concat([df, extra], ignore_index=True)
    d = tmp_path / "sigtext"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(corpus), str(d / "documents.parquet"))
    idx = str(d / "idx")
    build_index(str(d), idx, BuildConfig())
    eng = SearchEngine(idx, ModelParams(model="unrankedboolean",
                                        top_k=1 << 30))
    matched = eng.search("q", "dup").column("doc_id").to_numpy()
    rows = eng.index._rows_for(np.unique(matched))
    shas = eng.index._sha256[rows]
    assert len(shas) > len(set(shas))  # the dups matched
    plain = significant_terms(eng.index, str(d), matched, k=10).to_pandas()
    text = significant_text(eng.index, str(d), matched, k=10).to_pandas()
    off = significant_text(
        eng.index, str(d), matched, k=10, filter_duplicate_text=False
    ).to_pandas()
    pd.testing.assert_frame_equal(off, plain)
    # dedupe shrinks the foreground count for at least one shared term
    shared = set(plain.term) & set(text.term)
    assert shared
    p = plain.set_index("term")
    t = text.set_index("term")
    assert any(int(t.loc[x, "fg"]) < int(p.loc[x, "fg"]) for x in shared)


def test_distinct_ngrams_oracle_parity(ray_session):
    import duckdb

    import pandas as pd

    from searchengine_ray.textstats import distinct_ngrams

    sf = "/root/testdata/sf0.001"
    got = (
        distinct_ngrams(sf).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""WITH docs AS (SELECT * FROM
              read_parquet('{sf}/documents.parquet')),
        tok AS (SELECT doc_id,
          unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term,
          unnest(range(len(regexp_extract_all(lower(text),
            '[a-z0-9_]+')))) AS pos FROM docs),
        bg AS (SELECT a.doc_id, a.term AS t1, b.term AS t2 FROM tok a
               JOIN tok b ON a.doc_id=b.doc_id AND b.pos=a.pos+1),
        c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
              CAST(count(DISTINCT t1 || chr(31) || t2) AS BIGINT)
                AS n_distinct_bigrams FROM bg GROUP BY doc_id)
        SELECT d.doc_id,
          CAST(coalesce(c.n_bigrams, 0) AS BIGINT) AS n_bigrams,
          CAST(coalesce(c.n_distinct_bigrams, 0) AS BIGINT)
            AS n_distinct_bigrams
        FROM docs d LEFT JOIN c USING (doc_id) ORDER BY doc_id"""
    ).df()
    assert (got.n_distinct_bigrams <= got.n_bigrams).all()
    pd.testing.assert_frame_equal(got, exp)


def test_feature_hashing_brute_and_guard(ray_session):
    """Bucket counts equal a scalar FNV recount; dim guard raises."""
    from collections import Counter

    import pyarrow.parquet as pq

    from searchengine_ray.analyze import TOKEN_RE
    from searchengine_ray.dedup import _term_hash64
    from searchengine_ray.textstats import feature_hashing

    sf = "/root/testdata/sf0.001"
    got = feature_hashing(sf).to_pandas()
    t = pq.read_table(sf + "/documents.parquet",
                      columns=["doc_id", "text"])
    exp = Counter()
    for did, text in zip(t.column("doc_id").to_pylist(),
                         t.column("text").to_pylist()):
        for tok in TOKEN_RE.findall(text.lower()):
            exp[(did, _term_hash64(tok) % 64)] += 1
    assert Counter(
        {(d, b): n for d, b, n in
         zip(got.doc_id, got.bucket, got.n)}
    ) == exp
    with pytest.raises(ValueError, match="dim"):
        feature_hashing(sf, dim=1)


def test_anomaly_3sigma_matches_float_rule(ray_session):
    """The integer cross-multiplication agrees with the float 3-sigma
    rule away from exact boundaries."""
    import numpy as np

    from searchengine_ray.esaggs import _daily_counts, anomaly_3sigma_agg

    sf = "/root/testdata/sf0.001"
    got = anomaly_3sigma_agg(sf).to_pandas()
    counts = np.array([c for _, c in _daily_counts(sf)], dtype=np.float64)
    mu, sig = counts.mean(), counts.std()
    exp = (np.abs(counts - mu) > 3 * sig).astype(int)
    assert got.is_anomaly.tolist() == exp.tolist()


def test_term_burstiness_brute(ray_session):
    """Moments equal a pandas recount; stopword-ish uniform terms sit
    near VMR ~= 1 while no term falls below the Poisson floor wildly."""
    from collections import Counter

    import pyarrow.parquet as pq

    from searchengine_ray.analyze import TOKEN_RE
    from searchengine_ray.textextras import term_burstiness

    sf = "/root/testdata/sf0.001"
    got = term_burstiness(sf, min_df=30).to_pandas()
    t = pq.read_table(sf + "/documents.parquet",
                      columns=["doc_id", "text"])
    df_c, s_c, q_c = Counter(), Counter(), Counter()
    for text in t.column("text").to_pylist():
        c = Counter(TOKEN_RE.findall(text.lower()))
        for term, tf in c.items():
            df_c[term] += 1
            s_c[term] += tf
            q_c[term] += tf * tf
    for _, r in got.iterrows():
        assert df_c[r.term] == r.df >= 30
        assert s_c[r.term] == r.ctf
        assert q_c[r.term] == r.sum_tf_sq
        n = float(t.num_rows)
        vmr = (n * r.sum_tf_sq - r.ctf * r.ctf) / (n * r.ctf)
        assert abs(vmr - r.vmr_r) < 1e-6
