"""Distributed exact-integer k-means (Lloyd's) over the embedding column.

The training-data-pipeline clustering primitive (document clustering for
curriculum/mixture construction, the trainer behind IVF coarse quantizers,
the cell builder SemDeDup-style semantic dedup starts from). The repo
already ships a FLOAT k-means trained on a bounded sample for IVF
(``ann._kmeans``); this module is the other half: FULL-CORPUS Lloyd's
iterations as distributed Ray Data passes, with arithmetic designed so the
entire chain — init, every assignment, every centroid update, the final
labels — replays bit-for-bit in DuckDB as a hash-gated oracle.

Determinism design (everything exact-integer):
- vectors quantize once per pass as ``floor(float64(x) * SCALE)`` int64 —
  float32→float64 is exact and ×2^8 is a power-of-two scale, so DuckDB's
  ``floor(CAST(x AS DOUBLE) * 256)`` reproduces it bit-for-bit;
- distances are int64 squared-L2 (order-free integer sums);
- assignment ties go to the smallest centroid index (numpy ``argmin``
  first-hit == SQL ``ORDER BY d2, j``);
- centroid update is TRUNCATING integer division (toward zero) to match
  DuckDB's ``//`` — numpy's ``//`` floors, so :func:`_trunc_div` adjusts;
- empty clusters keep their previous centroid (SQL ``COALESCE`` on a left
  join);
- init = the vectors of the ``k`` smallest vec_ids (deterministic under
  any partitioning).

Scale shape: centroid state is k×dim int64 — broadcast once per iteration
via ``ray.put``; each Lloyd iteration is ONE shuffle-free ``map_batches``
pass emitting ≤k partial (sum, count) rows per batch, folded on the
driver (bounded: blocks × k, guarded); the final pass streams labels out
as a Dataset. Nothing corpus-sized ever sits on the driver and no
all-to-all shuffle exists anywhere. iters more passes = iters more reads
of a column-pruned parquet scan — the streaming-friendly trade vs pinning
a materialized quantized copy in the object store.

Reference scope analog: beyond-reference LLM-pipeline operator family
(SURVEY §2 extension); sibling of ``ann.ivf_topk`` (sampled float trainer)
and ``dedup.semantic_dedup`` (LSH cells).
"""

from __future__ import annotations

from math import isqrt

import numpy as np
import pyarrow as pa

KM_SCALE = 256  # 2^8: power-of-two so float64 multiply is exact
KM_K = 8
KM_ITERS = 2
# |quantized coordinate| bound so dist2 sums stay far below 2^63
_COORD_BOUND = 1 << 24
# driver-fold guard: partial rows are blocks × k; at k=8 this allows 25k
# blocks per pass before failing loudly instead of accreting driver state
_MAX_PARTIAL_ROWS = 200_000


def _quant_matrix(t: pa.Table, scale: int) -> np.ndarray:
    """list<float> column -> (n, dim) int64 ``floor(float64(x)*scale)``.
    No normalization (unlike ``ann.batch_matrix``) — the oracle quantizes
    the raw stored floats."""
    c = t.column("embedding").combine_chunks()
    flat = c.flatten().to_numpy()
    n = t.num_rows
    if n == 0:
        return np.zeros((0, 0), dtype=np.int64)
    q = np.floor(flat.reshape(n, -1).astype(np.float64) * float(scale))
    dim = q.shape[1]
    # dist2 = sum over dim of diff^2 with |diff| <= 2*max|q|, so int64
    # safety needs 4*dim*max|q|^2 < 2^63 — the bound must SCALE with the
    # dimension, capped by the flat 2^24 used in the SQL contract.
    # Inverted comparison so NaN (all comparisons False) also trips the
    # guard instead of silently casting to garbage int64.
    bound = min(_COORD_BOUND, isqrt((1 << 61) // max(dim, 1)))
    if not np.abs(q).max(initial=0.0) < bound:
        raise ValueError(
            "kmeans: quantized coordinate is NaN or exceeds the int64-safe "
            f"bound {bound} (dim={dim}); clean or rescale this embedding "
            "column"
        )
    return q.astype(np.int64)


def _trunc_div(s: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Integer division truncating toward zero (DuckDB ``//``); numpy's
    ``//`` floors, so bump negative inexact quotients by one."""
    q = s // c
    return q + ((s % c != 0) & (s < 0))


def _assign(q: np.ndarray, cents: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, dim) int64 × (k, dim) int64 -> (labels, dist2), ties to the
    smallest centroid index. Expanded ||q||²-2qc+||c||² would need care
    with overflow ordering; the direct (n,k,d) diff is exact and the batch
    bounds keep it small (n×k×d int64 = a few MB at batch 1024). Empty
    batches (Ray Data can yield zero-row blocks) short-circuit — the (0,0)
    matrix from _quant_matrix would not broadcast against (k, dim)."""
    if q.shape[0] == 0:
        return (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64))
    diff = q[:, None, :] - cents[None, :, :]
    d2 = np.einsum("nkd,nkd->nk", diff, diff)
    lab = np.argmin(d2, axis=1)
    return lab, d2[np.arange(q.shape[0]), lab]


def kmeans_fit(
    sf_dir: str,
    k: int = KM_K,
    iters: int = KM_ITERS,
    scale: int = KM_SCALE,
) -> np.ndarray:
    """Run ``iters`` full-corpus Lloyd iterations from the k-smallest-id
    init and return the final (k, dim) int64 centroid matrix. Each
    iteration is one shuffle-free ``map_batches`` pass; see the module
    docstring for the determinism contract."""
    import ray
    import ray.data

    path = f"{sf_dir}/embeddings.parquet"

    def scan():
        return ray.data.read_parquet(path, columns=["vec_id", "embedding"])

    # --- init: vectors of the k smallest vec_ids ------------------------
    def init_cands(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy()
        take = np.argsort(ids, kind="stable")[:k]
        # quantize ONLY the selected rows — the full batch gets quantized
        # (and guard-checked) anyway in every assignment pass
        q = _quant_matrix(t.take(pa.array(take)), scale)
        return pa.table(
            {
                "vec_id": pa.array(ids[take], pa.int64()),
                "v": pa.array(
                    [q[i].tolist() for i in range(len(take))],
                    pa.list_(pa.int64()),
                ),
            }
        )

    cands = scan().map_batches(init_cands, batch_format="pyarrow").take_all()
    if len(cands) > _MAX_PARTIAL_ROWS:
        raise ValueError(
            f"kmeans: {len(cands)} init-candidate rows exceeds the "
            f"driver-fold guard {_MAX_PARTIAL_ROWS}; raise batch/block size"
        )
    if len(cands) < k:
        raise ValueError(f"kmeans: need at least k={k} vectors, got {len(cands)}")
    cands.sort(key=lambda r: r["vec_id"])
    cents = np.array([r["v"] for r in cands[:k]], dtype=np.int64)

    # --- Lloyd iterations: one shuffle-free pass each -------------------
    for _ in range(iters):
        ref = ray.put(cents)

        def partials(t: pa.Table) -> pa.Table:
            c = ray.get(ref)
            q = _quant_matrix(t, scale)
            lab, _ = _assign(q, c)
            js, sums, cnts = [], [], []
            for j in np.unique(lab):
                m = lab == j
                js.append(int(j))
                sums.append(q[m].sum(axis=0).tolist())
                cnts.append(int(m.sum()))
            return pa.table(
                {
                    "j": pa.array(js, pa.int64()),
                    "s": pa.array(sums, pa.list_(pa.int64())),
                    "cnt": pa.array(cnts, pa.int64()),
                }
            )

        rows = scan().map_batches(partials, batch_format="pyarrow").take_all()
        if len(rows) > _MAX_PARTIAL_ROWS:
            raise ValueError(
                f"kmeans: {len(rows)} partial rows exceeds the driver-fold "
                f"guard {_MAX_PARTIAL_ROWS}; raise batch/block size"
            )
        tot = np.zeros_like(cents)
        cnt = np.zeros(k, dtype=np.int64)
        for r in rows:
            tot[r["j"]] += np.asarray(r["s"], dtype=np.int64)
            cnt[r["j"]] += r["cnt"]
        nz = cnt > 0
        new = cents.copy()  # empty clusters keep their previous centroid
        new[nz] = _trunc_div(tot[nz], cnt[nz, None])
        cents = new

    return cents


def kmeans_assign(
    sf_dir: str,
    k: int = KM_K,
    iters: int = KM_ITERS,
    scale: int = KM_SCALE,
):
    """:func:`kmeans_fit` + one labeling pass: stream out the final
    assignment as a Dataset with columns (vec_id, cluster, dist2) — dist2
    the exact int64 squared-L2 to the final centroid."""
    import ray
    import ray.data

    cents = kmeans_fit(sf_dir, k, iters, scale)

    # --- final assignment pass (streams; never materialized) ------------
    fref = ray.put(cents)

    def label(t: pa.Table) -> pa.Table:
        c = ray.get(fref)
        q = _quant_matrix(t, scale)
        lab, d2 = _assign(q, c)
        return pa.table(
            {
                "vec_id": t.column("vec_id").cast(pa.int64()),
                "cluster": pa.array(lab.astype(np.int64), pa.int64()),
                "dist2": pa.array(d2, pa.int64()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(label, batch_format="pyarrow")


def cluster_exemplars(
    sf_dir: str,
    m: int = 5,
    k: int = KM_K,
    iters: int = KM_ITERS,
    scale: int = KM_SCALE,
) -> pa.Table:
    """Prototype selection: per final cluster, the ``m`` members closest
    to the centroid — rank 1..m by (dist2 ASC, vec_id ASC). The standard
    follow-up to clustering (cluster labeling, medoid-ish summaries,
    few-shot exemplar picks for curriculum buckets).

    Scale shape: one labeling ``map_batches`` pass emits each batch's own
    per-cluster top-m candidates (≤ k·m rows per batch), folded by a
    bounded driver merge (output-sized: exactly ≤ k·m rows survive) — the
    same partial-top-k + driver-fold pattern as ``ann.brute_topk``, never
    a corpus-wide sort. Returns (cluster, vec_id, dist2, rank)."""
    import ray
    import ray.data

    cents = kmeans_fit(sf_dir, k, iters, scale)
    fref = ray.put(cents)

    def partial(t: pa.Table) -> pa.Table:
        c = ray.get(fref)
        ids = t.column("vec_id").to_numpy().astype(np.int64)
        q = _quant_matrix(t, scale)
        lab, d2 = _assign(q, c)
        keep = np.zeros(len(ids), dtype=bool)
        order = np.lexsort((ids, d2))  # dist2 ASC, vec_id ASC
        lab_o = lab[order]
        for j in np.unique(lab_o):
            keep[order[np.flatnonzero(lab_o == j)[:m]]] = True
        return pa.table(
            {
                "cluster": pa.array(lab[keep].astype(np.int64), pa.int64()),
                "vec_id": pa.array(ids[keep], pa.int64()),
                "dist2": pa.array(d2[keep], pa.int64()),
            }
        )

    rows = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    )
    if len(rows) > _MAX_PARTIAL_ROWS:
        raise ValueError(
            f"cluster_exemplars: {len(rows)} candidate rows exceeds the "
            f"driver-fold guard {_MAX_PARTIAL_ROWS}; raise batch/block size"
        )
    rows.sort(key=lambda r: (r["cluster"], r["dist2"], r["vec_id"]))
    out = {"cluster": [], "vec_id": [], "dist2": [], "rank": []}
    prev, rk = None, 0
    for r in rows:
        rk = rk + 1 if r["cluster"] == prev else 1
        prev = r["cluster"]
        if rk > m:
            continue
        out["cluster"].append(r["cluster"])
        out["vec_id"].append(r["vec_id"])
        out["dist2"].append(r["dist2"])
        out["rank"].append(rk)
    return pa.table(
        {
            "cluster": pa.array(out["cluster"], pa.int64()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "dist2": pa.array(out["dist2"], pa.int64()),
            "rank": pa.array(out["rank"], pa.int64()),
        }
    )
