"""Approximate-nearest-neighbor search over an embedding column.

- :func:`brute_topk` — exact cosine top-k: broadcast the query matrix once
  (``ray.put``), every batch does one float64 matmul emitting per-batch
  candidates, final per-query top-k reduced by a ``groupby(query_id)``
  inside the pipeline. The correctness baseline.
- :func:`ivf_topk` — IVF variant: a seeded k-means trained on a BOUNDED
  deterministic sample (hash-thinned, never the full matrix) partitions
  vectors into cells; queries probe the ``nprobe`` closest cells. The scale
  path (prunes the scan to a cell subset).

Scale shape: only the query matrix (n_queries × dim), the centroids
(n_cells × dim) and the training sample (≤ ``sample_rows`` × dim) ever sit
on the driver / in the broadcast; the data matrix streams through
``map_batches`` and the merge is a per-query groupby whose output is
exactly n_queries × k rows. All math in float64 on L2-normalized vectors;
ties broken by ascending id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def _load_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Full-matrix driver load — TEST ORACLE ONLY, never on the query path."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = tbl.column("vec_id").to_numpy()
    mat = np.vstack(
        [np.asarray(v, dtype=np.float64) for v in tbl.column("embedding").to_pylist()]
    )
    return ids, mat / np.linalg.norm(mat, axis=1, keepdims=True)


def _query_matrix(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """Load ONLY the query vectors (row-group predicate pushdown)."""
    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n_queries)],
    )
    ids = tbl.column("vec_id").to_numpy()
    mat = np.vstack(
        [np.asarray(v, dtype=np.float64) for v in tbl.column("embedding").to_pylist()]
    )
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    return ids, mat / np.linalg.norm(mat, axis=1, keepdims=True)


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
        rows = ray.data.read_parquet(
            path, columns=["vec_id", "embedding"]
        ).take(sample_rows)
    mat = np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    return mat / np.linalg.norm(mat, axis=1, keepdims=True)


def _merge_topk(cand, k: int) -> pa.Table:
    """Per-batch candidate Dataset -> final per-query top-k (score desc,
    id asc), reduced inside the pipeline; only n_queries*k rows reach the
    driver."""

    def topk_of_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int32)
        df["cosine"] = df["cosine"].round(6)
        return df

    out = (
        cand.groupby("query_id")
        .map_groups(topk_of_group, batch_format="pandas")
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False).cast(_TOPK_SCHEMA)


def brute_topk(sf_dir: str, n_queries: int = 10, k: int = 10) -> pa.Table:
    """Exact top-k cosine neighbors of the first ``n_queries`` vectors
    (self excluded)."""
    import ray
    import ray.data

    q_ids, q_mat = _query_matrix(sf_dir, n_queries)
    qref = ray.put((q_ids, q_mat))

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")

    def batch_topk(t: pa.Table) -> pa.Table:
        qi, qm = ray.get(qref)
        bids = t.column("vec_id").to_numpy()
        bm = np.vstack(
            [
                np.asarray(v, dtype=np.float64)
                for v in t.column("embedding").to_pylist()
            ]
        )
        bm = bm / np.linalg.norm(bm, axis=1, keepdims=True)
        sims = qm @ bm.T  # (n_queries x batch)
        rows_q, rows_n, rows_s = [], [], []
        kk = min(k, sims.shape[1])
        for i, q in enumerate(qi):
            s = sims[i].copy()
            s[bids == q] = -np.inf  # exclude self
            top = np.argpartition(-s, kk - 1)[:kk]
            for j in top:
                if np.isfinite(s[j]):
                    rows_q.append(int(q))
                    rows_n.append(int(bids[j]))
                    rows_s.append(float(s[j]))
        return pa.table(
            {
                "query_id": pa.array(rows_q, type=pa.int64()),
                "neighbor_id": pa.array(rows_n, type=pa.int64()),
                "cosine": pa.array(rows_s, type=pa.float64()),
            }
        )

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


def ivf_topk(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 99,
    sample_rows: int = 4096,
) -> pa.Table:
    """IVF-style ANN: scan only the ``nprobe`` cells closest to each query.

    Centroids are trained driver-side on a seeded hash-thinned sample of at
    most ``sample_rows`` vectors (deterministic, bounded — never the full
    matrix); cell assignment + the pruned scan run inside the Ray pipeline
    with centroids and query matrix broadcast once. Recall vs
    :func:`brute_topk` is pytest-checked.
    """
    import ray
    import ray.data

    centers = _kmeans(_sample_matrix(sf_dir, seed, sample_rows), n_cells, seed)
    q_ids, q_mat = _query_matrix(sf_dir, n_queries)
    # (n_queries x n_cells) probe mask for vectorized cell filtering
    probe = np.argsort(-(q_mat @ centers.T), axis=1)[:, :nprobe]
    probe_mask = np.zeros((len(q_ids), len(centers)), dtype=bool)
    probe_mask[np.arange(len(q_ids))[:, None], probe] = True
    ref = ray.put((q_ids, q_mat, centers, probe_mask))

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")

    def batch_scan(t: pa.Table) -> pa.Table:
        qi, qm, cen, pmask = ray.get(ref)
        bids = t.column("vec_id").to_numpy()
        bm = np.vstack(
            [
                np.asarray(v, dtype=np.float64)
                for v in t.column("embedding").to_pylist()
            ]
        )
        bm = bm / np.linalg.norm(bm, axis=1, keepdims=True)
        cells = np.argmax(bm @ cen.T, axis=1)
        sims = qm @ bm.T
        rows_q, rows_n, rows_s = [], [], []
        for i, q in enumerate(qi):
            ok = pmask[i, cells] & (bids != q)
            cand = np.flatnonzero(ok)
            if len(cand) == 0:
                continue
            kk = min(k, len(cand))
            s = sims[i]
            top = cand[np.argpartition(-s[cand], kk - 1)[:kk]]
            rows_q.extend([int(q)] * len(top))
            rows_n.extend(int(x) for x in bids[top])
            rows_s.extend(float(x) for x in s[top])
        return pa.table(
            {
                "query_id": pa.array(rows_q, type=pa.int64()),
                "neighbor_id": pa.array(rows_n, type=pa.int64()),
                "cosine": pa.array(rows_s, type=pa.float64()),
            }
        )

    return _merge_topk(ds.map_batches(batch_scan, batch_format="pyarrow"), k)
