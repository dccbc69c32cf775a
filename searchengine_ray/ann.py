"""Approximate-nearest-neighbor search over an embedding column.

- :func:`brute_topk` — exact cosine top-k: broadcast the query matrix once
  (``ray.put``), every batch does one float64 matmul, per-batch candidates
  k-way merge on the driver. The correctness baseline.
- :func:`ivf_topk` — IVF variant: a seeded k-means (driver-side numpy over a
  sample) partitions vectors into cells; queries probe the ``nprobe``
  closest cells. The scale path (prunes the scan to a cell subset).

All math in float64 on L2-normalized vectors; ties broken by ascending id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _load_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = tbl.column("vec_id").to_numpy()
    mat = np.vstack(
        [np.asarray(v, dtype=np.float64) for v in tbl.column("embedding").to_pylist()]
    )
    return ids, mat / np.linalg.norm(mat, axis=1, keepdims=True)


def _merge_topk(parts: list[pa.Table], k: int) -> pa.Table:
    """Per-batch candidates -> final per-query top-k (score desc, id asc)."""
    import pandas as pd

    df = pa.concat_tables(parts).to_pandas()
    df = df.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df["cosine"] = df["cosine"].round(6)
    return pa.Table.from_pandas(df, preserve_index=False).cast(
        pa.schema(
            [
                ("query_id", pa.int64()),
                ("neighbor_id", pa.int64()),
                ("cosine", pa.float64()),
                ("rank", pa.int32()),
            ]
        )
    )


def brute_topk(sf_dir: str, n_queries: int = 10, k: int = 10) -> pa.Table:
    """Exact top-k cosine neighbors of the first ``n_queries`` vectors
    (self excluded)."""
    import ray
    import ray.data

    ids, mat = _load_matrix(sf_dir)
    qmask = ids < n_queries
    q_ids, q_mat = ids[qmask], mat[qmask]
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

    parts = _collect(ds.map_batches(batch_topk, batch_format="pyarrow"))
    return _merge_topk(parts, k)


def _collect(ds) -> list[pa.Table]:
    """iter_batches yields Tables or RecordBatches depending on Ray version."""
    out = []
    for b in ds.iter_batches(batch_format="pyarrow"):
        out.append(b if isinstance(b, pa.Table) else pa.Table.from_batches([b]))
    return out


def _kmeans(mat: np.ndarray, n_cells: int, seed: int, iters: int = 10) -> np.ndarray:
    rng = np.random.default_rng(seed)
    centers = mat[rng.choice(len(mat), size=n_cells, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ centers.T, axis=1)
        for c in range(n_cells):
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
) -> pa.Table:
    """IVF-style ANN: scan only the ``nprobe`` cells closest to each query.

    Centroids are trained driver-side on a sample (seeded, deterministic);
    cell assignment + scan run as a Ray pipeline with the centroids and
    query matrix broadcast. Recall vs :func:`brute_topk` is pytest-checked.
    """
    import ray
    import ray.data

    ids, mat = _load_matrix(sf_dir)
    centers = _kmeans(mat, n_cells, seed)
    qmask = ids < n_queries
    q_ids, q_mat = ids[qmask], mat[qmask]
    # per query: which cells to probe
    probe = np.argsort(-(q_mat @ centers.T), axis=1)[:, :nprobe]
    probe_sets = {int(q): set(map(int, row)) for q, row in zip(q_ids, probe)}
    ref = ray.put((q_ids, q_mat, centers, probe_sets))

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")

    def batch_scan(t: pa.Table) -> pa.Table:
        qi, qm, cen, psets = ray.get(ref)
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
            ok = np.fromiter(
                (int(c) in psets[int(q)] for c in cells), bool, len(cells)
            )
            ok &= bids != q
            s = sims[i]
            cand = np.flatnonzero(ok)
            if len(cand) == 0:
                continue
            kk = min(k, len(cand))
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

    parts = _collect(ds.map_batches(batch_scan, batch_format="pyarrow"))
    return _merge_topk(parts, k)
