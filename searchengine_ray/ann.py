"""Approximate-nearest-neighbor search over an embedding column.

- :func:`brute_topk` — exact cosine top-k: broadcast the query matrix once
  (``ray.put``), every batch does one float64 matmul emitting per-batch
  candidates (top-k per query selected vectorized along the query axis),
  final per-query top-k reduced by a bounded streaming driver fold
  (:func:`_merge_topk`). The correctness baseline.
- :func:`hard_negative_topk` — DPR-style hard-negative mining: the same
  scan with same-label (query, row) pairs masked to ``-inf``, so each
  query's top-k is its most-similar OTHER-class vectors.
- :func:`ivf_build` / :func:`ivf_search` / :func:`ivf_topk` — IVF that
  actually PRUNES: a seeded k-means trained on a BOUNDED deterministic
  sample assigns every vector to a cell; the index is written as
  cell-partitioned parquet (``cell=<c>/`` directories), and a search reads
  ONLY the union of the queries' ``nprobe`` probed cells — I/O pruning —
  and computes similarities only for (query, row) pairs whose cell the
  query probes — FLOP pruning, ~``nprobe/n_cells`` of brute force.
  ``tools/bench_ivf.py`` measures both ratios.

Scale shape: only the query matrix (n_queries × dim), the centroids
(n_cells × dim) and the training sample (≤ ``sample_rows`` × dim) ever sit
on the driver / in the broadcast; the data matrix streams through
``map_batches`` and the merge is a per-query groupby whose output is
exactly n_queries × k rows. All math in float64 on L2-normalized vectors;
ties broken by ascending id. Batches decode the list<float> column
zero-copy-ish via ``flatten().to_numpy().reshape`` — no per-row Python.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_TOPK_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("neighbor_id", pa.int64()),
        ("cosine", pa.float64()),
        ("rank", pa.int32()),
    ]
)


def batch_matrix(t: pa.Table, col: str = "embedding") -> np.ndarray:
    """Vectorized list<float> column -> L2-normalized (n, dim) float64
    matrix. flatten() honors sliced-block offsets; assumes fixed-length
    lists (the embedding contract)."""
    c = t.column(col).combine_chunks()
    flat = c.flatten().to_numpy()
    n = t.num_rows
    if n == 0:
        return np.zeros((0, 0))
    mat = flat.reshape(n, -1).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _load_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Full-matrix driver load — TEST ORACLE ONLY, never on the query path."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = tbl.column("vec_id").to_numpy()
    return ids, batch_matrix(tbl)


def _query_matrix(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """Load ONLY the query vectors (row-group predicate pushdown)."""
    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n_queries)],
    )
    ids = tbl.column("vec_id").to_numpy()
    mat = batch_matrix(tbl)
    order = np.argsort(ids)
    return ids[order], mat[order]


def _sample_matrix(sf_dir: str, seed: int, sample_rows: int = 4096) -> np.ndarray:
    """Deterministic hash-thinned sample of the embedding matrix, bounded at
    ~``sample_rows`` rows regardless of dataset size (splitmix on vec_id, so
    the sample is stable across partitionings and cluster sizes)."""
    import ray.data

    path = f"{sf_dir}/embeddings.parquet"
    total = pq.ParquetFile(path).metadata.num_rows  # footer only
    if total <= sample_rows:
        thresh = np.uint64(0xFFFFFFFF)
    else:
        # clamp >=1: at extreme scale the ratio can floor to 0 and keep ~no rows
        thresh = np.uint64(max(1, int(sample_rows / total * 0xFFFFFFFF)))

    def pick(t: pa.Table) -> pa.Table:
        v = t.column("vec_id").to_numpy().astype(np.uint64) + np.uint64(seed)
        v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        v ^= v >> np.uint64(31)
        keep = (v & np.uint64(0xFFFFFFFF)) <= thresh
        return t.filter(pa.array(keep))

    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"]).map_batches(
        pick, batch_format="pyarrow"
    )
    rows = ds.take_all()  # bounded: ~sample_rows rows by construction
    if not rows:
        # unlucky thin sample: fall back to the first sample_rows rows
        rows = ray.data.read_parquet(path, columns=["vec_id", "embedding"]).take(
            sample_rows
        )
    # sort by vec_id: block arrival order varies with partitioning /
    # parallelism, and _kmeans' seeded init indexes into this matrix — an
    # unsorted sample would train different centroids per cluster size
    rows.sort(key=lambda r: r["vec_id"])
    mat = np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _candidate_rows(
    qi: np.ndarray, sims: np.ndarray, bids: np.ndarray, k: int
) -> pa.Table:
    """(nq_sub x nb) sims -> per-query top-k candidate rows, vectorized along
    the query axis (argpartition axis=1; no per-query Python loop)."""
    nq, nb = sims.shape
    if nq == 0 or nb == 0:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    kk = min(k, nb)
    top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]  # (nq, kk)
    vals = np.take_along_axis(sims, top, axis=1)
    keep = np.isfinite(vals).ravel()
    return pa.table(
        {
            "query_id": pa.array(
                np.repeat(qi.astype(np.int64), kk)[keep], type=pa.int64()
            ),
            "neighbor_id": pa.array(
                bids[top].ravel().astype(np.int64)[keep], type=pa.int64()
            ),
            "cosine": pa.array(vals.ravel()[keep], type=pa.float64()),
        }
    )


def _merge_topk(cand, k: int) -> pa.Table:
    """Per-batch candidate Dataset -> final per-query top-k (score desc,
    id asc), via a STREAMING driver reduce: iterate candidate batches
    (each block already reduced to <= n_queries*k rows by its producer)
    and fold into a running best-of table that never exceeds n_queries*k
    rows. Bounded driver memory at any input size; no all-to-all shuffle —
    a groupby(query_id) here costs seconds of fixed AllToAll setup to sort
    what is already output-sized data. Driver ingest is n_blocks*nq*k rows,
    streamed with backpressure."""
    q_run = np.empty(0, dtype=np.int64)
    n_run = np.empty(0, dtype=np.int64)
    s_run = np.empty(0, dtype=np.float64)
    for batch in cand.iter_batches(batch_format="pyarrow", batch_size=None):
        if batch.num_rows == 0:
            continue
        q = np.concatenate([q_run, batch.column("query_id").to_numpy()])
        nid = np.concatenate([n_run, batch.column("neighbor_id").to_numpy()])
        s = np.concatenate([s_run, batch.column("cosine").to_numpy()])
        order = np.lexsort((nid, -s, q))  # query asc, score desc, id asc
        q, nid, s = q[order], nid[order], s[order]
        newq = np.empty(len(q), dtype=bool)
        newq[0] = True
        newq[1:] = q[1:] != q[:-1]
        rank = np.arange(len(q)) - np.repeat(
            np.flatnonzero(newq), np.diff(np.append(np.flatnonzero(newq), len(q)))
        )
        keep = rank < k
        q_run, n_run, s_run = q[keep], nid[keep], s[keep]
    if len(q_run) == 0:
        return _TOPK_SCHEMA.empty_table()
    newq = np.empty(len(q_run), dtype=bool)
    newq[0] = True
    newq[1:] = q_run[1:] != q_run[:-1]
    starts = np.flatnonzero(newq)
    rank = np.arange(len(q_run)) - np.repeat(
        starts, np.diff(np.append(starts, len(q_run)))
    )
    return pa.table(
        {
            "query_id": pa.array(q_run, type=pa.int64()),
            "neighbor_id": pa.array(n_run, type=pa.int64()),
            "cosine": pa.array(np.round(s_run, 6), type=pa.float64()),
            "rank": pa.array((rank + 1).astype(np.int32), type=pa.int32()),
        }
    ).cast(_TOPK_SCHEMA)


def brute_topk(
    sf_dir: str, n_queries: int = 10, k: int = 10, filter=None
) -> pa.Table:
    """Exact top-k cosine neighbors of the first ``n_queries`` vectors
    (self excluded). ``filter`` (a pyarrow compute expression) pushes a
    metadata predicate into the parquet READ — pre-filtering semantics:
    the candidate set is restricted BEFORE top-k, so k survivors are
    guaranteed; non-matching row groups never leave storage."""
    import ray
    import ray.data

    q_ids, q_mat = _query_matrix(sf_dir, n_queries)
    qref = ray.put((q_ids, q_mat))

    read_kwargs = {} if filter is None else {"filter": filter}
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        **read_kwargs,
    )

    def batch_topk(t: pa.Table) -> pa.Table:
        qi, qm = ray.get(qref)
        bids = t.column("vec_id").to_numpy()
        bm = batch_matrix(t)
        sims = qm @ bm.T  # (n_queries x batch)
        sims[qi[:, None] == bids[None, :]] = -np.inf  # exclude self
        return _candidate_rows(qi, sims, bids, k)

    return _merge_topk(ds.map_batches(batch_topk, batch_format="pyarrow"), k)


def range_search(
    sf_dir: str,
    n_queries: int = 10,
    threshold: float = 0.3,
    max_results: int = 2_000_000,
) -> pa.Table:
    """Similarity RANGE search (FAISS ``range_search`` / Lucene
    ``VectorSimilarityQuery`` analog): ALL (query, neighbor) pairs with
    cosine >= ``threshold``, self excluded — set semantics, no rank, no k.

    Shape is :func:`brute_topk`'s broadcast scan, but the per-batch
    reduction is a threshold filter instead of a partial top-k, so the
    result size is DATA-dependent: ``max_results`` guards the driver fold
    (raise loudly instead of OOMing when a low threshold makes the output
    corpus-scale — the ``max_candidates`` pattern from dedup). Output
    (query_id, neighbor_id, cosine) with cosine rounded like the top-k
    gates."""
    import ray
    import ray.data

    q_ids, q_mat = _query_matrix(sf_dir, n_queries)
    qref = ray.put((q_ids, q_mat))

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def batch_range(t: pa.Table) -> pa.Table:
        qi, qm = ray.get(qref)
        bids = t.column("vec_id").to_numpy()
        bm = batch_matrix(t)
        sims = qm @ bm.T
        sims[qi[:, None] == bids[None, :]] = -np.inf  # exclude self
        hit_q, hit_b = np.nonzero(sims >= threshold)
        return _range_pairs_table(
            qi[hit_q], bids[hit_b], sims[hit_q, hit_b]
        )

    return _guarded_range_fold(
        ds.map_batches(batch_range, batch_format="pyarrow"),
        max_results,
        f"range_search(threshold={threshold})",
    )


def _range_pairs_table(q, n, s) -> pa.Table:
    """(query_id, neighbor_id, cosine) rows; the shared range-search row
    schema (empty-safe)."""
    return pa.table(
        {
            "query_id": pa.array(np.asarray(q, dtype=np.int64)),
            "neighbor_id": pa.array(np.asarray(n, dtype=np.int64)),
            "cosine": pa.array(np.asarray(s, dtype=np.float64)),
        }
    )


def _guarded_range_fold(ds, max_results: int, name: str) -> pa.Table:
    """Driver fold for range-search variants: concat batches under the
    ``max_results`` guard (raise loudly instead of OOMing when a low
    threshold makes the output corpus-scale — the ``max_candidates``
    pattern from dedup), then round cosine like the top-k gates."""
    import pyarrow.compute as _pc

    parts, total = [], 0
    for b in ds.iter_batches(batch_format="pyarrow"):
        total += b.num_rows
        if total > max_results:
            raise ValueError(
                f"{name} exceeded max_results={max_results}; raise the "
                f"threshold or the guard"
            )
        parts.append(pa.table(b))
    if not parts:
        return _range_pairs_table([], [], [])
    out = pa.concat_tables(parts)
    return out.set_column(
        out.schema.get_field_index("cosine"),
        "cosine",
        _pc.round(out.column("cosine"), ndigits=6),
    )


def filtered_topk(
    sf_dir: str, n_queries: int = 10, k: int = 10, label: int = 3
) -> pa.Table:
    """FILTERED vector search (the ES ``knn`` query's ``filter`` clause /
    Lucene KnnVectorQuery-with-filter analog): exact top-k cosine
    neighbors restricted to rows whose ``label`` equals ``label`` —
    :func:`brute_topk` with the label predicate pushed into the read
    (pre-filtering, the semantics ES applies). Queries still come from
    the unfiltered table; a query matching the filter is self-excluded
    like brute_topk."""
    import pyarrow.compute as _pc

    return brute_topk(
        sf_dir,
        n_queries=n_queries,
        k=k,
        filter=_pc.field("label") == label,
    )


def hard_negative_topk(sf_dir: str, n_queries: int = 10, k: int = 10) -> pa.Table:
    """Hard-negative mining: per query vector, the top-k most-similar
    vectors whose ``label`` DIFFERS from the query's — the standard
    candidate generator for contrastive retrieval training (DPR, Karpukhin
    et al. 2020 §4.2: "other passages ... that are not the gold" ranked by
    similarity), where near-but-wrong neighbors make the informative
    negatives.

    Shape is exactly :func:`brute_topk` with one extra broadcast column:
    the query labels ride the same ``ray.put`` as the query matrix, each
    batch masks same-label (query, row) pairs to ``-inf`` before the
    per-batch partial top-k (the self pair shares its own label, so self
    exclusion is implied), and the merge is the same bounded streaming
    driver fold — no shuffle, driver state <= n_queries * k rows. Output
    (query_id, neighbor_id, cosine, rank) matches the ANN gate schema."""
    import ray
    import ray.data

    path = f"{sf_dir}/embeddings.parquet"
    tbl = pq.read_table(
        path,
        columns=["vec_id", "embedding", "label"],
        filters=[("vec_id", "<", n_queries)],
    )
    q_ids = tbl.column("vec_id").to_numpy()
    q_mat = batch_matrix(tbl)
    q_lab = tbl.column("label").to_numpy().astype(np.int64)
    order = np.argsort(q_ids)
    qref = ray.put((q_ids[order], q_mat[order], q_lab[order]))

    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding", "label"])

    def batch_topk(t: pa.Table) -> pa.Table:
        qi, qm, ql = ray.get(qref)
        bids = t.column("vec_id").to_numpy()
        blab = t.column("label").to_numpy().astype(np.int64)
        bm = batch_matrix(t)
        sims = qm @ bm.T  # (n_queries x batch)
        sims[ql[:, None] == blab[None, :]] = -np.inf  # same class: not a negative
        return _candidate_rows(qi, sims, bids, k)

    return _merge_topk(ds.map_batches(batch_topk, batch_format="pyarrow"), k)


def _kmeans(mat: np.ndarray, n_cells: int, seed: int, iters: int = 10) -> np.ndarray:
    rng = np.random.default_rng(seed)
    centers = mat[rng.choice(len(mat), size=min(n_cells, len(mat)), replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ centers.T, axis=1)
        for c in range(len(centers)):
            members = mat[assign == c]
            if len(members):
                m = members.mean(axis=0)
                centers[c] = m / (np.linalg.norm(m) or 1.0)
    return centers


def _ivf_assigner(centers_ref):
    """Shared assign-to-nearest-centroid map_batches fn (build + add)."""
    import ray

    def assign(t: pa.Table) -> pa.Table:
        cen = ray.get(centers_ref)
        bm = batch_matrix(t)
        cells = (
            np.argmax(bm @ cen.T, axis=1).astype(np.int32)
            if len(bm)
            else np.zeros(0, dtype=np.int32)
        )
        return t.append_column("cell", pa.array(cells, type=pa.int32()))

    return assign


def ivf_build(
    sf_dir: str,
    index_dir: str,
    n_cells: int = 16,
    seed: int = 99,
    sample_rows: int = 4096,
    centers: "np.ndarray | None" = None,
) -> np.ndarray:
    """Build a cell-partitioned IVF index under ``index_dir``.

    Centroids train driver-side on a seeded hash-thinned sample (bounded —
    never the full matrix) unless a precomputed ``centers`` matrix is
    passed; assignment streams through ``map_batches`` with the centroids
    broadcast once; vectors land as parquet partitioned by ``cell=<c>/``
    so a search can open only probed cells. Returns the centroid matrix
    (also saved to ``index_dir/centroids.npy``). ``meta.json`` records the
    segment list — :func:`ivf_add` appends further segments (the Lucene
    addDocument analog on the vector side: new vectors assign to the
    EXISTING centroids, no retrain — standard production IVF behavior,
    with centroid drift accepted until the next rebuild)."""
    import ray
    import ray.data

    if centers is None:
        centers = _kmeans(
            _sample_matrix(sf_dir, seed, sample_rows), n_cells, seed
        )
    os.makedirs(index_dir, exist_ok=True)
    np.save(os.path.join(index_dir, "centroids.npy"), centers)
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(
            {"n_cells": int(len(centers)), "seed": seed,
             "segments": ["vectors"]},
            f,
        )
    cref = ray.put(centers)
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(_ivf_assigner(cref), batch_format="pyarrow")
    ds.write_parquet(os.path.join(index_dir, "vectors"), partition_cols=["cell"])
    return centers


def ivf_add(
    index_dir: str,
    sf_dir: str,
    min_vec_id: int | None = None,
    max_vec_id: int | None = None,
    segment: str | None = None,
) -> str:
    """Append vectors to a built IVF index WITHOUT retraining: assign the
    new rows to the saved centroids and write them as a fresh
    ``vectors_seg_<name>/`` hive layout; ``meta.json`` commits the add
    (data lands first, the meta rewrite is the commit point) and the
    ``applied_adds`` name list makes it IDEMPOTENT — across retries
    (a pre-commit leftover dir is cleared before rewriting, never
    appended into) and across later expunges (which rename segment dirs
    but preserve ``applied_adds``). Search reads every listed segment
    with the same probed-cell partition filter."""
    import shutil

    import pyarrow.dataset as pads
    import ray
    import ray.data

    seg = segment or f"{min_vec_id}_{max_vec_id}"
    seg_dir_name = f"vectors_seg_{seg}"
    meta_path = os.path.join(index_dir, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    segments = meta.get("segments", ["vectors"])
    applied = meta.get("applied_adds", [])
    # idempotency keys on the ADD name, not the dir name — ivf_expunge
    # renames dirs to <seg>_x, and a re-add after expunge must still be a
    # no-op (it would otherwise resurrect compacted-away deletes)
    if seg in applied or seg_dir_name in segments:
        return seg_dir_name  # already applied
    centers = np.load(os.path.join(index_dir, "centroids.npy"))
    cref = ray.put(centers)
    flt = None
    if min_vec_id is not None:
        flt = pads.field("vec_id") >= min_vec_id
    if max_vec_id is not None:
        f2 = pads.field("vec_id") < max_vec_id
        flt = f2 if flt is None else flt & f2
    seg_dir = os.path.join(index_dir, seg_dir_name)
    if os.path.exists(seg_dir):
        # leftover from a run that died before the meta commit: clear it,
        # or the retry's write_parquet would APPEND alongside the stale
        # files and commit every row twice
        shutil.rmtree(seg_dir)
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filter=flt,
    ).map_batches(_ivf_assigner(cref), batch_format="pyarrow")
    ds.write_parquet(seg_dir, partition_cols=["cell"])
    meta["segments"] = segments + [seg_dir_name]
    meta["applied_adds"] = applied + [seg]
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)
    return seg_dir_name


def ivf_delete(index_dir: str, vec_ids) -> int:
    """Tombstone vectors in a built IVF index (the live-docs analog on
    the vector side): ids append to ``tombstones.json`` (sorted,
    deduplicated); search drops them before scoring. Tombstone state is
    driver/broadcast-sized and grows with deletes — :func:`ivf_expunge`
    is the compaction path that folds them into the data. Returns the
    total tombstone count."""
    tpath = os.path.join(index_dir, "tombstones.json")
    cur: set[int] = set()
    if os.path.exists(tpath):
        with open(tpath) as f:
            cur = set(json.load(f))
    cur.update(int(v) for v in vec_ids)
    tmp = tpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(sorted(cur), f)
    os.replace(tmp, tpath)
    return len(cur)


def ivf_expunge(index_dir: str) -> int:
    """Compact tombstones out of every segment (expungeDeletes analog):
    each segment is re-read in full, live rows rewrite into a fresh
    ``<segment>_x/`` hive layout (cells KEPT — no reassignment, centroids
    stay frozen), the meta segment list swaps atomically, and the
    tombstone file clears. Search results are identical before and after
    (pytest-pinned). Returns the number of rows dropped."""
    import ray
    import ray.data

    tpath = os.path.join(index_dir, "tombstones.json")
    if not os.path.exists(tpath):
        return 0
    with open(tpath) as f:
        tomb = np.array(sorted(json.load(f)), dtype=np.int64)
    if len(tomb) == 0:
        os.remove(tpath)
        return 0
    import shutil

    tref = ray.put(tomb)
    meta_path = os.path.join(index_dir, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)

    def footer_rows(d: str) -> int:
        return sum(
            pq.ParquetFile(os.path.join(r, fn)).metadata.num_rows
            for r, _d, fs in os.walk(d)
            for fn in fs
            if fn.endswith(".parquet")
        )

    def live_only(t: pa.Table) -> pa.Table:
        tb = ray.get(tref)
        ids = t.column("vec_id").to_numpy()
        return t.filter(pa.array(~np.isin(ids, tb)))

    dropped = 0
    old_segments = meta.get("segments", ["vectors"])
    new_segments = []
    for seg in old_segments:
        src = os.path.join(index_dir, seg)
        dst = os.path.join(index_dir, seg + "_x")
        if os.path.exists(dst):
            # leftover from a run that died before the meta commit; a
            # retry's write_parquet would APPEND beside the stale files
            shutil.rmtree(dst)
        before = footer_rows(src)  # parquet footers only, no Dataset
        ds = ray.data.read_parquet(src).map_batches(
            live_only, batch_format="pyarrow"
        )  # hive cell column comes back from the partitioned layout
        ds.write_parquet(dst, partition_cols=["cell"])
        dropped += before - footer_rows(dst)
        new_segments.append(seg + "_x")
    meta["segments"] = new_segments
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)  # <- the swap commits here
    os.remove(tpath)
    for seg in old_segments:  # reclaim the pre-compaction data
        shutil.rmtree(os.path.join(index_dir, seg), ignore_errors=True)
    return int(dropped)


def ivf_merge_segments(index_dir: str) -> int:
    """forceMerge(1) analog on the vector side: coalesce every segment
    (base + ivf_add appends) into ONE fresh ``vectors_m<n>/`` hive layout
    — a pure row redistribution, cells kept, centroids untouched, any
    pending tombstones compacted in the same pass (so merge implies
    expunge, like Lucene's forceMerge). Retry-safe the same way as
    ivf_expunge: a pre-commit leftover destination is cleared, the meta
    swap is the commit point, old segment dirs reclaim after it. Search
    results are identical before and after (pytest-pinned). Returns the
    number of segments merged."""
    import shutil

    import ray
    import ray.data

    meta_path = os.path.join(index_dir, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    old_segments = meta.get("segments", ["vectors"])
    tomb = _ivf_tombstones(index_dir)
    if len(old_segments) <= 1 and len(tomb) == 0:
        return len(old_segments)  # already one segment, nothing pending
    tref = ray.put(tomb)
    gen = meta.get("merge_gen", 0) + 1
    dst_name = f"vectors_m{gen}"
    dst = os.path.join(index_dir, dst_name)
    if os.path.exists(dst):
        shutil.rmtree(dst)

    def live_only(t: pa.Table) -> pa.Table:
        tb = ray.get(tref)
        if len(tb) == 0:
            return t
        ids = t.column("vec_id").to_numpy()
        return t.filter(pa.array(~np.isin(ids, tb)))

    ds = None
    for seg in old_segments:
        seg_ds = ray.data.read_parquet(os.path.join(index_dir, seg))
        ds = seg_ds if ds is None else ds.union(seg_ds)
    ds.map_batches(live_only, batch_format="pyarrow").write_parquet(
        dst, partition_cols=["cell"]
    )
    meta["segments"] = [dst_name]
    meta["merge_gen"] = gen
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)  # <- commit
    tpath = os.path.join(index_dir, "tombstones.json")
    if os.path.exists(tpath):
        os.remove(tpath)
    for seg in old_segments:
        shutil.rmtree(os.path.join(index_dir, seg), ignore_errors=True)
    return len(old_segments)


def _ivf_tombstones(index_dir: str) -> np.ndarray:
    tpath = os.path.join(index_dir, "tombstones.json")
    if os.path.exists(tpath):
        with open(tpath) as f:
            return np.array(sorted(json.load(f)), dtype=np.int64)
    return np.zeros(0, dtype=np.int64)


def _ivf_segments(index_dir: str) -> list[str]:
    """Segment dirs recorded in meta.json; pre-segment indexes (no
    'segments' key) fall back to the single base layout."""
    meta_path = os.path.join(index_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f).get("segments", ["vectors"])
    return ["vectors"]


def _probed_ivf_dataset(index_dir: str, q_ids, q_mat, nprobe: int):
    """Shared IVF probing front half: assign each query its ``nprobe``
    nearest centroids, broadcast (q_ids, q_mat, probe_mask, tombstones)
    once via ``ray.put``, and build ONE streaming Dataset over all index
    segments (base build + ivf_add appends) whose partition filter prunes
    unprobed ``cell=<c>/`` directories at file-listing time — their bytes
    never leave storage. Returns ``(ds, ref)``."""
    import ray
    import ray.data

    from ray.data.datasource.partitioning import (
        Partitioning,
        PathPartitionFilter,
        PathPartitionParser,
    )

    centers = np.load(os.path.join(index_dir, "centroids.npy"))
    n_cells = len(centers)
    nprobe = min(nprobe, n_cells)
    probe = np.argsort(-(q_mat @ centers.T), axis=1)[:, :nprobe]
    probe_mask = np.zeros((len(q_ids), n_cells), dtype=bool)
    probe_mask[np.arange(len(q_ids))[:, None], probe] = True
    probed = set(int(c) for c in np.flatnonzero(probe_mask.any(axis=0)))
    ref = ray.put((q_ids, q_mat, probe_mask, _ivf_tombstones(index_dir)))

    # The hive "cell" column comes back typed int32.
    ds = None
    for seg in _ivf_segments(index_dir):
        vec_dir = os.path.join(index_dir, seg)
        part = Partitioning(
            "hive", base_dir=vec_dir, field_types={"cell": int}
        )
        seg_ds = ray.data.read_parquet(
            vec_dir,
            columns=["vec_id", "embedding", "cell"],
            partitioning=part,
            partition_filter=PathPartitionFilter(
                PathPartitionParser(part),
                lambda kv: int(kv.get("cell", -1)) in probed,
            ),
        )
        ds = seg_ds if ds is None else ds.union(seg_ds)
    return ds, ref


def _ivf_cell_sims(t: pa.Table, ref):
    """Shared IVF batch-scan back half: drop tombstoned rows (live-docs),
    then per cell in the batch yield ``(probing_q_ids, bids, sims)`` with
    self-pairs already at -inf. A block is normally single-cell (one
    partition dir per file) but mixed batches are handled generally."""
    import ray

    qi, qm, pmask, tomb = ray.get(ref)
    if len(tomb):
        ids = t.column("vec_id").to_numpy()
        t = t.filter(pa.array(~np.isin(ids, tomb)))
    cells = np.asarray(t.column("cell").to_numpy(), dtype=np.int64)
    for c in np.unique(cells):
        qsel = np.flatnonzero(pmask[:, c])
        if len(qsel) == 0:
            continue
        sub = t.filter(pa.array(cells == c))
        bids = sub.column("vec_id").to_numpy()
        bm = batch_matrix(sub)
        sims = qm[qsel] @ bm.T  # only probing queries x only this cell
        sims[qi[qsel][:, None] == bids[None, :]] = -np.inf  # exclude self
        yield qi[qsel], bids, sims


def ivf_search(
    index_dir: str,
    q_ids: np.ndarray,
    q_mat: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
) -> pa.Table:
    """Search a built IVF index: read ONLY the probed cells' partitions.

    Each query scores only rows whose cell it probes (FLOP pruning); the
    read lists only ``cell=<c>`` directories in the union of probed cells
    (I/O pruning — unprobed partitions never leave storage).
    """
    ds, ref = _probed_ivf_dataset(index_dir, q_ids, q_mat, nprobe)

    def scan(t: pa.Table) -> pa.Table:
        outs = [
            _candidate_rows(qids, sims, bids, k)
            for qids, bids, sims in _ivf_cell_sims(t, ref)
        ]
        if not outs:
            return _candidate_rows(
                np.zeros(0, dtype=np.int64), np.zeros((0, 0)), np.zeros(0), k
            )
        return pa.concat_tables(outs)

    return _merge_topk(ds.map_batches(scan, batch_format="pyarrow"), k)


def ivf_range(
    index_dir: str,
    q_ids: np.ndarray,
    q_mat: np.ndarray,
    threshold: float,
    nprobe: int = 4,
    max_results: int = 2_000_000,
) -> pa.Table:
    """RANGE search over a built IVF index (FAISS ``range_search`` on an
    IVF layout): every (query, neighbor) pair at cosine >= ``threshold``
    AMONG THE PROBED CELLS — the scale path for :func:`range_search`,
    trading the same bounded recall as IVF top-k (a qualifying neighbor
    in an unprobed cell is missed; ``nprobe=n_cells`` makes it exact) for
    the same I/O pruning: unprobed ``cell=`` partitions never leave
    storage. Output ⊆ the brute :func:`range_search` pairs by
    construction. ``max_results`` guards the driver fold like the brute
    variant."""
    ds, ref = _probed_ivf_dataset(index_dir, q_ids, q_mat, nprobe)

    def scan(t: pa.Table) -> pa.Table:
        out_q, out_n, out_s = [], [], []
        for qids, bids, sims in _ivf_cell_sims(t, ref):
            hq, hb = np.nonzero(sims >= threshold)
            out_q.append(qids[hq].astype(np.int64))
            out_n.append(bids[hb].astype(np.int64))
            out_s.append(sims[hq, hb])
        if not out_q:
            return _range_pairs_table([], [], [])
        return _range_pairs_table(
            np.concatenate(out_q),
            np.concatenate(out_n),
            np.concatenate(out_s),
        )

    return _guarded_range_fold(
        ds.map_batches(scan, batch_format="pyarrow"),
        max_results,
        f"ivf_range(threshold={threshold})",
    )


def ivf_scan_stats(
    index_dir: str, q_mat: np.ndarray, nprobe: int = 4
) -> dict[str, int]:
    """Footer-only accounting for the pruning micro-bench: rows the search
    will read (union of probed cells) and (query, row) pairs it will score,
    vs brute force's n_queries * total_rows."""
    centers = np.load(os.path.join(index_dir, "centroids.npy"))
    n_cells = len(centers)
    nprobe = min(nprobe, n_cells)
    probe = np.argsort(-(q_mat @ centers.T), axis=1)[:, :nprobe]
    sizes = np.zeros(n_cells, dtype=np.int64)
    for seg in _ivf_segments(index_dir):
        for c in range(n_cells):
            cdir = os.path.join(index_dir, seg, f"cell={c}")
            if os.path.isdir(cdir):
                for fn in os.listdir(cdir):
                    if fn.endswith(".parquet"):
                        sizes[c] += pq.ParquetFile(
                            os.path.join(cdir, fn)
                        ).metadata.num_rows
    total = int(sizes.sum())
    union = np.zeros(n_cells, dtype=bool)
    union[probe.ravel()] = True
    return {
        "total_rows": total,
        "rows_read": int(sizes[union].sum()),
        "pairs_scored": int(sizes[probe].sum()),
        "pairs_brute": total * len(q_mat),
    }


def ivf_topk(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 99,
    sample_rows: int = 4096,
) -> pa.Table:
    """IVF ANN gate entry: build (cached per input+params) then search.

    The index lands under /tmp keyed by the input file's identity and the
    build parameters, so repeated gate runs reuse it; recall vs
    :func:`brute_topk` is pytest-checked.
    """
    import hashlib

    path = f"{sf_dir}/embeddings.parquet"
    st = os.stat(path)
    key = hashlib.md5(
        repr(
            (os.path.abspath(path), st.st_mtime_ns, st.st_size, n_cells, seed,
             sample_rows)
        ).encode()
    ).hexdigest()[:16]  # stable across processes (hash() is salted)
    index_dir = os.path.join("/tmp", "se_ray_ivf", key)
    if not os.path.exists(os.path.join(index_dir, "centroids.npy")):
        ivf_build(sf_dir, index_dir, n_cells=n_cells, seed=seed, sample_rows=sample_rows)
    q_ids, q_mat = _query_matrix(sf_dir, n_queries)
    return ivf_search(index_dir, q_ids, q_mat, k=k, nprobe=nprobe)


def ivf_deleted_topk(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 99,
    sample_rows: int = 4096,
) -> pa.Table:
    """Deletion gate entry (the se_bm25_deleted/expunged analog on the
    vector side): build over the full corpus, tombstone ``vec_id % 7 ==
    3`` (ivf_delete), COMPACT them out (ivf_expunge — so the gate covers
    the tombstone bookkeeping AND the segment rewrite; tombstone-phase ==
    post-expunge equality is pytest-pinned), then search. Centroids stay
    the frozen pre-deletion training — stale-stats semantics, like the
    text index's deleted gate. The staged-dir rename makes the cached
    index crash-consistent across gate re-runs."""
    import hashlib
    import shutil

    path = f"{sf_dir}/embeddings.parquet"
    total = pq.ParquetFile(path).metadata.num_rows
    st = os.stat(path)
    key = hashlib.md5(
        repr(
            (os.path.abspath(path), st.st_mtime_ns, st.st_size, n_cells,
             seed, sample_rows, "del")
        ).encode()
    ).hexdigest()[:16]
    index_dir = os.path.join("/tmp", "se_ray_ivf_del", key)
    if not os.path.exists(index_dir):
        stage = index_dir + ".build"
        if os.path.exists(stage):
            shutil.rmtree(stage)
        ivf_build(
            sf_dir, stage, n_cells=n_cells, seed=seed,
            sample_rows=sample_rows,
        )
        ids = np.arange(total, dtype=np.int64)
        ivf_delete(stage, ids[ids % 7 == 3])  # gate-scale id list; at
        # corpus scale deletes arrive as bounded batches from a Dataset
        ivf_expunge(stage)
        os.rename(stage, index_dir)
    q_ids, q_mat = _query_matrix(sf_dir, n_queries)
    return ivf_search(index_dir, q_ids, q_mat, k=k, nprobe=nprobe)


def ivf_incremental_topk(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 99,
    sample_rows: int = 4096,
) -> pa.Table:
    """Incremental-IVF gate entry: build the index over the FIRST HALF of
    the corpus (centroids train on that half alone), :func:`ivf_add` the
    second half against those frozen centroids, then search the segmented
    index — the vector-side analog of the text index's base-build +
    appended-segment gate (``se_bm25_incremental``). The half-corpus
    staging write is gate plumbing only (a real user calls ivf_add on
    their new rows directly); the add itself is the scale path: one
    filtered pruned read, one broadcast-assign pass, one hive write.
    Idempotent across gate re-runs (segment list in meta.json)."""
    import hashlib

    path = f"{sf_dir}/embeddings.parquet"
    split = pq.ParquetFile(path).metadata.num_rows // 2
    st = os.stat(path)
    key = hashlib.md5(
        repr(
            (os.path.abspath(path), st.st_mtime_ns, st.st_size, n_cells,
             seed, sample_rows, split, "incr")
        ).encode()
    ).hexdigest()[:16]
    index_dir = os.path.join("/tmp", "se_ray_ivf_incr", key)
    if not os.path.exists(index_dir):
        # staged-dir rename: centroids.npy lands BEFORE the vectors, so a
        # build interrupted mid-write must not look cached (same pattern
        # as ivf_deleted_topk)
        import shutil

        stage = index_dir + ".build"
        if os.path.exists(stage):
            shutil.rmtree(stage)
        half_dir = stage + "_corpus"
        os.makedirs(half_dir, exist_ok=True)
        head = pq.read_table(
            path,
            columns=["vec_id", "embedding"],
            filters=[("vec_id", "<", split)],
        )
        pq.write_table(head, os.path.join(half_dir, "embeddings.parquet"))
        ivf_build(
            half_dir, stage, n_cells=n_cells, seed=seed,
            sample_rows=sample_rows,
        )
        shutil.rmtree(half_dir)  # staging copy, needed only for the build
        os.makedirs(os.path.dirname(index_dir), exist_ok=True)
        os.rename(stage, index_dir)
    ivf_add(index_dir, sf_dir, min_vec_id=split, segment="tail")
    q_ids, q_mat = _query_matrix(sf_dir, n_queries)
    return ivf_search(index_dir, q_ids, q_mat, k=k, nprobe=nprobe)
