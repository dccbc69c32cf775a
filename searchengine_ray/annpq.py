"""Product-quantization ANN — the compressed-domain scale path beside IVF.

PQ (Jegou, Douze & Schmid 2011, "Product Quantization for Nearest
Neighbor Search") splits the embedding into ``m_sub`` subspaces, trains a
``k_codes``-centroid codebook per subspace on a bounded deterministic
sample, and stores every vector as ``m_sub`` uint8 codes — here 16 bytes
per 64-dim vector vs 256 bytes float32, a 16x compression that is the
whole point at 100 TB: the ADC scan reads the code parquet (not the
vectors) and scores a query against a batch with ``m_sub`` table-gather
adds instead of a ``dim``-wide matmul.

Search is ADC (asymmetric distance computation): per query, a
``(m_sub, k_codes)`` inner-product table against the codebooks is
computed ONCE driver-side (it is model-sized), broadcast via ``ray.put``,
and every batch's approximate score is a pure integer gather
``sum_m T[m, code_m(x)]`` accumulated left-associatively in subspace
order — the fixed float op order that lets the DuckDB oracle replay the
exact arithmetic (see ``__ray_entry__._pq_sql``). Candidate emission and
the bounded streaming driver fold are shared with :mod:`.ann`
(``_candidate_rows`` / ``_merge_topk``): per-block partial top-k, no
shuffle, driver state never exceeds ``n_queries * k`` rows.

Scale shape: only the codebooks (``m_sub * k_codes * ds`` floats), the
query matrix and the per-query tables ever sit on the driver/broadcast;
codes stream through ``map_batches``. Composes with IVF by writing the
code parquet with the same ``cell=<c>/`` partitioning (see
:func:`ivfpq_topk`) so the partition filter prunes unprobed cells' CODE
bytes — I/O pruning on already-16x-smaller files.

The reference repo has no vector search; this is a mandated
beyond-reference similarity-search operator (SURVEY.md "Beyond-reference
training-data operators"), sibling of ``ann.ivf_*``.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from .ann import (
    _candidate_rows,
    _merge_topk,
    _query_matrix,
    _sample_matrix,
    batch_matrix,
)


def _kmeans_l2(mat: np.ndarray, k: int, seed: int, iters: int = 10) -> np.ndarray:
    """Seeded Lloyd k-means under squared-L2 (PQ subspaces are NOT unit
    vectors, so the cosine/argmax-dot variant in ann._kmeans does not
    apply). Distances are computed the direct way — ``((x - c)**2).sum``
    — the same per-element expression the oracle's list_distance uses,
    not the expanded |x|^2 - 2xc + |c|^2 form, to keep near-tie argmins
    aligned. Empty clusters keep their previous centroid."""
    rng = np.random.default_rng(seed)
    centers = mat[rng.choice(len(mat), size=min(k, len(mat)), replace=False)].copy()
    for _ in range(iters):
        d = ((mat[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        for c in range(len(centers)):
            members = mat[assign == c]
            if len(members):
                centers[c] = members.mean(axis=0)
    return centers


def pq_train(
    sample_mat: np.ndarray, m_sub: int = 16, k_codes: int = 16, seed: int = 7
) -> np.ndarray:
    """Train per-subspace codebooks on the (bounded, deterministic) sample.

    Returns ``(m_sub, k_codes, ds)`` float64. Each subspace trains with
    its own derived seed so codebooks are independent draws."""
    n, dim = sample_mat.shape
    if dim % m_sub != 0:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    ds = dim // m_sub
    return np.stack(
        [
            _kmeans_l2(sample_mat[:, m * ds : (m + 1) * ds], k_codes, seed + m)
            for m in range(m_sub)
        ]
    )


def encode_matrix(mat: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """L2-normalized (n, dim) matrix -> (n, m_sub) uint8 codes.

    Per subspace: argmin over squared-L2 distance to the codebook rows,
    ties -> lowest code (np.argmin semantics == the oracle's
    row_number ORDER BY dist, code). Fully vectorized: one (n, k, ds)
    broadcast subtract per subspace, no per-row Python."""
    m_sub, k_codes, ds = codebooks.shape
    if mat.shape[0] == 0:
        return np.zeros((0, m_sub), dtype=np.uint8)
    codes = np.empty((len(mat), m_sub), dtype=np.uint8)
    for m in range(m_sub):
        sub = mat[:, m * ds : (m + 1) * ds]
        d = ((sub[:, None, :] - codebooks[m][None, :, :]) ** 2).sum(axis=2)
        codes[:, m] = np.argmin(d, axis=1).astype(np.uint8)
    return codes


def pq_build(
    sf_dir: str,
    index_dir: str,
    m_sub: int = 16,
    k_codes: int = 16,
    seed: int = 7,
    sample_rows: int = 4096,
) -> np.ndarray:
    """Train codebooks on the seeded hash-thinned sample (bounded — never
    the full matrix) and stream-encode the corpus to a code parquet:
    ``vec_id`` + one uint8 column ``c<m>`` per subspace (dict/RLE-friendly,
    16x smaller than the float32 vectors at the default 64-dim/16-sub
    layout). Codebooks broadcast once via ``ray.put``; returns them
    (also saved to ``index_dir/codebooks.npy``)."""
    import ray
    import ray.data

    codebooks = pq_train(_sample_matrix(sf_dir, seed, sample_rows), m_sub, k_codes, seed)
    os.makedirs(index_dir, exist_ok=True)
    np.save(os.path.join(index_dir, "codebooks.npy"), codebooks)
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump({"m_sub": m_sub, "k_codes": k_codes, "seed": seed}, f)
    cref = ray.put(codebooks)

    def enc(t: pa.Table) -> pa.Table:
        cb = ray.get(cref)
        codes = encode_matrix(batch_matrix(t), cb)
        out = {"vec_id": t.column("vec_id")}
        for m in range(cb.shape[0]):
            out[f"c{m}"] = pa.array(codes[:, m], type=pa.uint8())
        return pa.table(out)

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(enc, batch_format="pyarrow")
    # codes are ~16 B/row, so a "block-sized" output file would hold tens
    # of millions of rows; floor the file size so per-column-chunk header
    # overhead (16 uint8 chunks per file) never dominates the payload
    ds.write_parquet(os.path.join(index_dir, "codes"), min_rows_per_file=65536)
    return codebooks


def adc_tables(q_mat: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Per-query ADC inner-product tables: ``(nq, m_sub, k_codes)`` where
    ``T[q, m, k] = dot(q_sub_m, codebook[m][k])``. Model-sized (never
    corpus-sized); computed once driver-side and broadcast."""
    m_sub, k_codes, ds = codebooks.shape
    nq = len(q_mat)
    t = np.empty((nq, m_sub, k_codes))
    for m in range(m_sub):
        t[:, m, :] = q_mat[:, m * ds : (m + 1) * ds] @ codebooks[m].T
    return t


def pq_search(
    index_dir: str,
    q_ids: np.ndarray,
    q_mat: np.ndarray,
    k: int = 10,
) -> pa.Table:
    """ADC scan over the code parquet: per batch the approximate score is
    ``T[:, 0, c0] + T[:, 1, c1] + ...`` — m_sub uint8 gathers and
    left-associative adds in subspace order (the oracle replays the same
    association), never touching the original vectors. Self matches are
    excluded by id. Merge is the shared bounded streaming driver fold."""
    import ray
    import ray.data

    codebooks = np.load(os.path.join(index_dir, "codebooks.npy"))
    m_sub = codebooks.shape[0]
    tables = adc_tables(q_mat, codebooks)
    ref = ray.put((q_ids, tables))

    ds = ray.data.read_parquet(os.path.join(index_dir, "codes"))

    def scan(t: pa.Table) -> pa.Table:
        qi, tabs = ray.get(ref)
        bids = t.column("vec_id").to_numpy()
        if t.num_rows == 0:
            return _candidate_rows(qi, np.zeros((len(qi), 0)), bids, k)
        # left-assoc accumulate in subspace order (fixed float op order)
        acc = tabs[:, 0, :][:, t.column("c0").to_numpy()]
        for m in range(1, m_sub):
            acc = acc + tabs[:, m, :][:, t.column(f"c{m}").to_numpy()]
        acc[qi[:, None] == bids[None, :]] = -np.inf  # exclude self
        return _candidate_rows(qi, acc, bids, k)

    out = _merge_topk(ds.map_batches(scan, batch_format="pyarrow"), k)
    return out.rename_columns(["query_id", "neighbor_id", "adc_score", "rank"])


def _cached_index(sf_dir: str, m_sub: int, k_codes: int, seed: int, sample_rows: int) -> str:
    """Stable /tmp index location keyed by input identity + params (the
    ivf_topk pattern — md5 of stat, not salted hash())."""
    import hashlib

    path = f"{sf_dir}/embeddings.parquet"
    st = os.stat(path)
    key = hashlib.md5(
        repr(
            (os.path.abspath(path), st.st_mtime_ns, st.st_size, m_sub, k_codes,
             seed, sample_rows)
        ).encode()
    ).hexdigest()[:16]
    return os.path.join("/tmp", "se_ray_pq", key)


def pq_topk_rerank(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 10,
    rerank: int = 4,
    m_sub: int = 16,
    k_codes: int = 16,
    seed: int = 7,
    sample_rows: int = 4096,
) -> pa.Table:
    """ADC retrieve + exact re-rank — the standard production PQ recipe
    (FAISS IVFPQR shape): the compressed scan shortlists ``rerank * k``
    candidates per query (bounded: nq * rerank * k ids), then ONLY those
    rows' original vectors are re-read with a pushdown id filter and
    exact-cosine re-scored driver-side (candidate-set-sized, never the
    corpus). Recall approaches brute-force while the corpus-wide scan
    stays 16x compressed; pytest checks the recall lift over plain ADC."""
    import pyarrow.compute as pc
    import ray.data

    index_dir = _cached_index(sf_dir, m_sub, k_codes, seed, sample_rows)
    if not os.path.exists(os.path.join(index_dir, "codebooks.npy")):
        pq_build(sf_dir, index_dir, m_sub=m_sub, k_codes=k_codes, seed=seed,
                 sample_rows=sample_rows)
    q_ids, q_mat = _query_matrix(sf_dir, n_queries)
    shortlist = pq_search(index_dir, q_ids, q_mat, k=rerank * k)
    cand_ids = np.unique(shortlist.column("neighbor_id").to_numpy())

    # pushdown filter read of ONLY the shortlisted vectors (bounded)
    cand = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filter=pc.field("vec_id").isin(pa.array(cand_ids)),
        )
        .take_all()
    )
    cid = np.array([r["vec_id"] for r in cand], dtype=np.int64)
    cmat = np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in cand])
    norms = np.linalg.norm(cmat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    cmat = cmat / norms

    # exact cosine restricted to each query's OWN shortlist
    sq = shortlist.column("query_id").to_numpy()
    sn = shortlist.column("neighbor_id").to_numpy()
    order = np.argsort(cid)
    pos = order[np.searchsorted(cid[order], sn)]
    qpos_of = {int(q): i for i, q in enumerate(q_ids)}
    qrow = np.array([qpos_of[int(q)] for q in sq])
    exact = np.einsum("ij,ij->i", q_mat[qrow], cmat[pos])

    so = np.lexsort((sn, -exact, sq))  # query asc, cosine desc, id asc
    sq, sn, exact = sq[so], sn[so], exact[so]
    newq = np.empty(len(sq), dtype=bool)
    newq[0] = True
    newq[1:] = sq[1:] != sq[:-1]
    starts = np.flatnonzero(newq)
    rank = np.arange(len(sq)) - np.repeat(
        starts, np.diff(np.append(starts, len(sq)))
    )
    keep = rank < k
    return pa.table(
        {
            "query_id": pa.array(sq[keep], type=pa.int64()),
            "neighbor_id": pa.array(sn[keep], type=pa.int64()),
            "cosine": pa.array(np.round(exact[keep], 6), type=pa.float64()),
            "rank": pa.array((rank[keep] + 1).astype(np.int32), type=pa.int32()),
        }
    )


def ivfpq_build(
    sf_dir: str,
    index_dir: str,
    n_cells: int = 16,
    m_sub: int = 16,
    k_codes: int = 16,
    seed: int = 7,
    cell_seed: int = 99,
    sample_rows: int = 4096,
) -> None:
    """IVF x PQ composition: ONE pass assigns every vector to its nearest
    coarse cell (ann's cosine k-means centroids, broadcast once) AND
    encodes it to PQ codes, landing as code parquet partitioned by
    ``cell=<c>/`` — so a search prunes unprobed cells' bytes at
    file-listing time (the ann.ivf_search partition filter) AND each
    probed byte is 16x smaller than the raw vector. This is the standard
    web-scale layout (FAISS IVFPQ / ADC, Jegou et al. 2011 SS V)."""
    import ray
    import ray.data

    from .ann import _kmeans

    sample = _sample_matrix(sf_dir, cell_seed, sample_rows)
    centers = _kmeans(sample, n_cells, cell_seed)
    codebooks = pq_train(
        _sample_matrix(sf_dir, seed, sample_rows), m_sub, k_codes, seed
    )
    os.makedirs(index_dir, exist_ok=True)
    np.save(os.path.join(index_dir, "centroids.npy"), centers)
    np.save(os.path.join(index_dir, "codebooks.npy"), codebooks)
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(
            {"n_cells": int(len(centers)), "m_sub": m_sub, "k_codes": k_codes,
             "seed": seed, "cell_seed": cell_seed}, f,
        )
    ref = ray.put((centers, codebooks))

    def enc(t: pa.Table) -> pa.Table:
        cen, cb = ray.get(ref)
        bm = batch_matrix(t)
        cells = (
            np.argmax(bm @ cen.T, axis=1).astype(np.int32)
            if len(bm)
            else np.zeros(0, dtype=np.int32)
        )
        codes = encode_matrix(bm, cb)
        out = {"vec_id": t.column("vec_id")}
        for m in range(cb.shape[0]):
            out[f"c{m}"] = pa.array(codes[:, m], type=pa.uint8())
        out["cell"] = pa.array(cells, type=pa.int32())
        return pa.table(out)

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(enc, batch_format="pyarrow")
    ds.write_parquet(
        os.path.join(index_dir, "codes"),
        partition_cols=["cell"],
        min_rows_per_file=65536,
    )


def ivfpq_search(
    index_dir: str,
    q_ids: np.ndarray,
    q_mat: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
) -> pa.Table:
    """Probed-cells-only ADC scan: the partition filter prunes unprobed
    ``cell=<c>/`` code directories at listing time (I/O pruning), and per
    batch each query scores only rows in cells it probes (FLOP pruning) —
    the ann.ivf_search shape with the dim-wide matmul replaced by m_sub
    uint8 gathers."""
    import ray
    import ray.data
    from ray.data.datasource.partitioning import (
        Partitioning,
        PathPartitionFilter,
        PathPartitionParser,
    )

    centers = np.load(os.path.join(index_dir, "centroids.npy"))
    codebooks = np.load(os.path.join(index_dir, "codebooks.npy"))
    m_sub = codebooks.shape[0]
    n_cells = len(centers)
    nprobe = min(nprobe, n_cells)
    probe = np.argsort(-(q_mat @ centers.T), axis=1)[:, :nprobe]
    probe_mask = np.zeros((len(q_ids), n_cells), dtype=bool)
    probe_mask[np.arange(len(q_ids))[:, None], probe] = True
    probed = set(int(c) for c in np.flatnonzero(probe_mask.any(axis=0)))
    tables = adc_tables(q_mat, codebooks)
    ref = ray.put((q_ids, tables, probe_mask))

    code_dir = os.path.join(index_dir, "codes")
    part = Partitioning("hive", base_dir=code_dir, field_types={"cell": int})
    ds = ray.data.read_parquet(
        code_dir,
        partitioning=part,
        partition_filter=PathPartitionFilter(
            PathPartitionParser(part),
            lambda kv: int(kv.get("cell", -1)) in probed,
        ),
    )

    def scan(t: pa.Table) -> pa.Table:
        qi, tabs, pmask = ray.get(ref)
        cells = np.asarray(t.column("cell").to_numpy(), dtype=np.int64)
        outs = []
        for c in np.unique(cells):
            qsel = np.flatnonzero(pmask[:, c])
            if len(qsel) == 0:
                continue
            sub = t.filter(pa.array(cells == c))
            bids = sub.column("vec_id").to_numpy()
            acc = tabs[qsel, 0, :][:, sub.column("c0").to_numpy()]
            for m in range(1, m_sub):
                acc = acc + tabs[qsel, m, :][:, sub.column(f"c{m}").to_numpy()]
            acc[qi[qsel][:, None] == bids[None, :]] = -np.inf
            outs.append(_candidate_rows(qi[qsel], acc, bids, k))
        if not outs:
            return _candidate_rows(
                np.zeros(0, dtype=np.int64), np.zeros((0, 0)), np.zeros(0), k
            )
        return pa.concat_tables(outs)

    out = _merge_topk(ds.map_batches(scan, batch_format="pyarrow"), k)
    return out.rename_columns(["query_id", "neighbor_id", "adc_score", "rank"])


def ivfpq_topk(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    m_sub: int = 16,
    k_codes: int = 16,
    seed: int = 7,
    cell_seed: int = 99,
    sample_rows: int = 4096,
) -> pa.Table:
    """Build (under a caller-managed or /tmp-cached dir) + search. With
    ``nprobe == n_cells`` this equals :func:`pq_topk` exactly (pytest-
    checked); with ``nprobe < n_cells`` the probed-cell cut composes the
    hash-gated ivf cell semantics with the hash-gated PQ scoring."""
    import hashlib

    path = f"{sf_dir}/embeddings.parquet"
    st = os.stat(path)
    key = hashlib.md5(
        repr(
            (os.path.abspath(path), st.st_mtime_ns, st.st_size, n_cells, m_sub,
             k_codes, seed, cell_seed, sample_rows)
        ).encode()
    ).hexdigest()[:16]
    index_dir = os.path.join("/tmp", "se_ray_ivfpq", key)
    if not os.path.exists(os.path.join(index_dir, "codebooks.npy")):
        ivfpq_build(
            sf_dir, index_dir, n_cells=n_cells, m_sub=m_sub, k_codes=k_codes,
            seed=seed, cell_seed=cell_seed, sample_rows=sample_rows,
        )
    q_ids, q_mat = _query_matrix(sf_dir, n_queries)
    return ivfpq_search(index_dir, q_ids, q_mat, k=k, nprobe=nprobe)


def pq_topk(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 10,
    m_sub: int = 16,
    k_codes: int = 16,
    seed: int = 7,
    sample_rows: int = 4096,
) -> pa.Table:
    """PQ ANN gate entry: build (cached per input+params) then ADC-search
    the first ``n_queries`` vectors. Recall vs :func:`ann.brute_topk` is
    pytest-checked; the full train/encode/table/scan path is re-derived
    in DuckDB by ``_pq_sql``."""
    index_dir = _cached_index(sf_dir, m_sub, k_codes, seed, sample_rows)
    if not os.path.exists(os.path.join(index_dir, "codebooks.npy")):
        pq_build(sf_dir, index_dir, m_sub=m_sub, k_codes=k_codes, seed=seed,
                 sample_rows=sample_rows)
    q_ids, q_mat = _query_matrix(sf_dir, n_queries)
    return pq_search(index_dir, q_ids, q_mat, k=k)
