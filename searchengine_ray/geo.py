"""Geo queries over the corpus — the Elasticsearch geo family analog
(``geo_bounding_box`` / ``geo_distance`` queries, ``geo_distance`` sort,
``geohash_grid`` aggregation; www.elastic.co/docs query-dsl geo queries).

The reference corpus is text-only, so document coordinates are DERIVED
deterministically from ``doc_id`` — micro-degree integers via the same
splitmix64 the curation samplers use (``sketch._hash64``), which the DuckDB
oracle reproduces bit-exactly in HUGEINT arithmetic. Every kernel is
integer-exact:

- distances are squared planar micro-degree integers (the monotone
  surrogate of the real haversine kernel — ranking and radius membership
  are what the operators define; a production corpus with real lat/lon
  columns would swap :func:`derive_coords` for a column read and the
  comparator for haversine metres),
- grid cells are right-shifts of the shifted coordinates (the integer
  analog of geohash base-32 prefixes).

Scale shape: the documents scan reads ONLY ``doc_id`` (column pruning —
coordinates are derived, never stored); bbox/radius filters and grid
pre-aggregation run inside ``map_batches``; the grid groupby shuffles
cell-count partials (thousands of cells), never rows; top-k uses the same
bounded streaming driver fold as :func:`ann._merge_topk` (per-block
candidates are already <= n_origins*k rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .sketch import _hash64

GEO_SEED_LON = 71
GEO_SEED_LAT = 72
_LON_SPAN = 360_000_000  # micro-degrees
_LAT_SPAN = 180_000_000


def derive_coords(doc_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (lon, lat) micro-degree int64 coordinates per doc:
    lon in [-180e6, 180e6), lat in [-90e6, 90e6)."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    lon = (_hash64(ids, GEO_SEED_LON) % np.uint64(_LON_SPAN)).astype(
        np.int64
    ) - _LON_SPAN // 2
    lat = (_hash64(ids, GEO_SEED_LAT) % np.uint64(_LAT_SPAN)).astype(
        np.int64
    ) - _LAT_SPAN // 2
    return lon, lat


def _docs_ids(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )


def geo_bounding_box(
    sf_dir: str, lon_lo: int, lon_hi: int, lat_lo: int, lat_hi: int
):
    """ES ``geo_bounding_box`` query: docs whose derived point lies in the
    closed micro-degree box. Returns (doc_id, lon, lat)."""

    def inbox(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        lon, lat = derive_coords(ids)
        m = (lon >= lon_lo) & (lon <= lon_hi) & (lat >= lat_lo) & (lat <= lat_hi)
        return pa.table(
            {
                "doc_id": pa.array(ids[m], pa.int64()),
                "lon": pa.array(lon[m], pa.int64()),
                "lat": pa.array(lat[m], pa.int64()),
            }
        )

    return _docs_ids(sf_dir).map_batches(inbox, batch_format="pyarrow")


def geo_distance_filter(sf_dir: str, lon0: int, lat0: int, radius: int):
    """ES ``geo_distance`` query: docs within ``radius`` micro-degrees
    (planar) of the origin — membership by exact integer squared distance.
    Returns (doc_id, dist2)."""
    r2 = int(radius) * int(radius)

    def within(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        lon, lat = derive_coords(ids)
        d2 = (lon - lon0) ** 2 + (lat - lat0) ** 2
        m = d2 <= r2
        return pa.table(
            {
                "doc_id": pa.array(ids[m], pa.int64()),
                "dist2": pa.array(d2[m], pa.int64()),
            }
        )

    return _docs_ids(sf_dir).map_batches(within, batch_format="pyarrow")


def geo_knn(sf_dir: str, origins: list[tuple[int, int]], k: int) -> pa.Table:
    """ES ``geo_distance`` sort with size=k, one result set per origin:
    the k nearest docs to each (lon, lat) origin by exact integer squared
    planar distance, ties by ascending doc_id. Per-batch vectorized
    (n_origins × batch) distance matrix reduced to per-origin top-k inside
    the task; bounded streaming driver fold (origin count and k are both
    request-sized constants). Returns (origin_id, doc_id, dist2, rank)."""
    O = np.asarray(origins, dtype=np.int64)  # (m, 2) lon,lat

    def cand(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        if not len(ids):
            return _KNN_SCHEMA.empty_table()
        lon, lat = derive_coords(ids)
        d2 = (lon[None, :] - O[:, 0:1]) ** 2 + (lat[None, :] - O[:, 1:2]) ** 2
        kk = min(k, d2.shape[1])
        part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
        m = O.shape[0]
        oid = np.repeat(np.arange(m, dtype=np.int64), kk)
        sel = part.ravel()
        return pa.table(
            {
                "origin_id": pa.array(oid, pa.int64()),
                "doc_id": pa.array(ids[sel], pa.int64()),
                "dist2": pa.array(d2[np.repeat(np.arange(m), kk), sel], pa.int64()),
            }
        )

    ds = _docs_ids(sf_dir).map_batches(cand, batch_format="pyarrow")
    # streaming fold, same shape as ann._merge_topk but ascending distance
    o_run = np.empty(0, np.int64)
    d_run = np.empty(0, np.int64)
    s_run = np.empty(0, np.int64)
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows == 0:
            continue
        o = np.concatenate([o_run, b.column("origin_id").to_numpy()])
        did = np.concatenate([d_run, b.column("doc_id").to_numpy()])
        s = np.concatenate([s_run, b.column("dist2").to_numpy()])
        order = np.lexsort((did, s, o))  # origin asc, dist asc, id asc
        o, did, s = o[order], did[order], s[order]
        new = np.empty(len(o), bool)
        new[0] = True
        new[1:] = o[1:] != o[:-1]
        starts = np.flatnonzero(new)
        rank = np.arange(len(o)) - np.repeat(
            starts, np.diff(np.append(starts, len(o)))
        )
        keep = rank < k
        o_run, d_run, s_run = o[keep], did[keep], s[keep]
    if not len(o_run):
        return _KNN_SCHEMA.empty_table()
    new = np.empty(len(o_run), bool)
    new[0] = True
    new[1:] = o_run[1:] != o_run[:-1]
    starts = np.flatnonzero(new)
    rank = np.arange(len(o_run)) - np.repeat(
        starts, np.diff(np.append(starts, len(o_run)))
    )
    return pa.table(
        {
            "origin_id": pa.array(o_run, pa.int64()),
            "doc_id": pa.array(d_run, pa.int64()),
            "dist2": pa.array(s_run, pa.int64()),
            "rank": pa.array(rank + 1, pa.int64()),
        }
    )


# ---- gate defaults (pinned so the DuckDB oracle can inline them) ----
GATE_BBOX = (-120_000_000, 40_000_000, -45_000_000, 60_000_000)
GATE_ORIGIN = (10_000_000, 20_000_000)
GATE_ORIGINS = [(0, 0), (100_000_000, 45_000_000)]
GATE_RADIUS = 30_000_000
GATE_K = 15
GATE_SHIFT = 22


def gate_bbox(sf_dir: str):
    return geo_bounding_box(sf_dir, *GATE_BBOX)


def gate_radius(sf_dir: str):
    return geo_distance_filter(sf_dir, *GATE_ORIGIN, GATE_RADIUS)


def gate_knn(sf_dir: str) -> pa.Table:
    return geo_knn(sf_dir, GATE_ORIGINS, GATE_K)


def gate_grid(sf_dir: str):
    return geohash_grid(sf_dir, GATE_SHIFT)


_KNN_SCHEMA = pa.schema(
    [
        ("origin_id", pa.int64()),
        ("doc_id", pa.int64()),
        ("dist2", pa.int64()),
    ]
)


def geohash_grid(sf_dir: str, shift: int = 22):
    """ES ``geohash_grid`` aggregation analog: bucket every doc into an
    integer grid cell — ``cell = (lon + 180e6) >> shift, (lat + 90e6) >>
    shift`` (shift=22 ≈ 4.2-degree cells ≈ geohash precision 2) — and
    count per cell. Per-batch pre-aggregation (np.unique over packed
    cells) so the shuffle carries cell partials, never doc rows."""
    if not (0 <= shift < 31):
        raise ValueError("geohash_grid shift must be in [0, 30]")

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        lon, lat = derive_coords(ids)
        cx = (lon + _LON_SPAN // 2) >> shift
        cy = (lat + _LAT_SPAN // 2) >> shift
        packed = (cx << np.int64(31)) | cy  # cx,cy < 2^31 by construction
        cells, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "cell": pa.array(cells, pa.int64()),
                "n_partial": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    import ray.data  # noqa: F401  (Dataset ops below)

    ds = _docs_ids(sf_dir).map_batches(partial, batch_format="pyarrow")
    agg = ds.groupby("cell").sum("n_partial")

    def unpack(t: pa.Table) -> pa.Table:
        cells = t.column("cell").to_numpy()
        n = t.column("sum(n_partial)").to_numpy()
        return pa.table(
            {
                "cell_x": pa.array(cells >> np.int64(31), pa.int64()),
                "cell_y": pa.array(cells & np.int64((1 << 31) - 1), pa.int64()),
                "n_docs": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    return agg.map_batches(unpack, batch_format="pyarrow")


def geo_centroid(
    sf_dir: str, lon_lo: int, lon_hi: int, lat_lo: int, lat_hi: int
) -> pa.Table:
    """ES ``geo_centroid`` aggregation over a bounding-box-filtered doc
    set: the mean point of the matched coordinates. EXACT int64
    micro-degree sums fold through one decomposable reduce (what a
    multi-node merge ships — ES accumulates compensated doubles and is
    order-sensitive; integer sums are not), then ONE double division
    each for the centroid components. Returns a single row
    (n, sum_lon, sum_lat, centroid_lon, centroid_lat)."""
    from ray.data.aggregate import Count, Sum

    def inbox(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        lon, lat = derive_coords(ids)
        m = ((lon >= lon_lo) & (lon <= lon_hi)
             & (lat >= lat_lo) & (lat <= lat_hi))
        return pa.table(
            {
                "lon": pa.array(lon[m], pa.int64()),
                "lat": pa.array(lat[m], pa.int64()),
            }
        )

    agg = (
        _docs_ids(sf_dir)
        .map_batches(inbox, batch_format="pyarrow")
        .aggregate(Count(), Sum("lon", alias_name="sum_lon"),
                   Sum("lat", alias_name="sum_lat"))
    )
    n = int(agg["count()"])
    if n == 0:
        raise ValueError("geo_centroid: empty box (no matched docs)")
    sl, sa = int(agg["sum_lon"]), int(agg["sum_lat"])
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "sum_lon": pa.array([sl], pa.int64()),
            "sum_lat": pa.array([sa], pa.int64()),
            "centroid_lon": pa.array([sl / n], pa.float64()),
            "centroid_lat": pa.array([sa / n], pa.float64()),
        }
    )


def gate_centroid(sf_dir: str):
    return geo_centroid(sf_dir, *GATE_BBOX)


RING_EDGES = (60_000_000, 120_000_000, 180_000_000)


def geo_distance_rings(
    sf_dir: str,
    origin: "tuple[int, int]" = GATE_ORIGIN,
    edges: "tuple[int, ...]" = RING_EDGES,
) -> pa.Table:
    """ES ``geo_distance`` AGGREGATION (the bucket sibling of the
    ``geo_distance`` query filter): concentric distance rings around an
    origin, each bucket counting the docs whose derived coordinate falls
    in [edge_{i-1}, edge_i) — membership by exact integer SQUARED
    distance (planar micro-degrees), so no sqrt touches the corpus path.

    Returns (ring, lo_mdeg, doc_count) for non-empty rings; ring k spans
    [edges[k-1], edges[k]) with ring 0 = [0, edges[0]) and the last ring
    unbounded. Scale shape: per-batch bincount partial, ONE
    ring-cardinality shuffle (the esaggs histogram pattern).
    """
    import ray.data
    from ray.data.aggregate import Sum

    lon0, lat0 = origin
    e2 = np.array([int(e) ** 2 for e in edges], dtype=np.int64)
    if not np.all(np.diff(e2) > 0):
        raise ValueError("ring edges must be strictly increasing")
    lows = [0] + [int(e) for e in edges]

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        lon, lat = derive_coords(ids)
        d2 = (lon - lon0) ** 2 + (lat - lat0) ** 2
        ring = np.searchsorted(e2, d2, side="right").astype(np.int64)
        cnt = np.bincount(ring, minlength=len(edges) + 1).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "ring": pa.array(nz, pa.int64()),
                "n": pa.array(cnt[nz], pa.int64()),
            }
        )

    rows = (
        _docs_ids(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("ring")
        .aggregate(Sum("n", alias_name="doc_count"))
        .take_all()  # bounded: n_rings rows
    )
    rows.sort(key=lambda r: r["ring"])
    return pa.table(
        {
            "ring": pa.array([r["ring"] for r in rows], pa.int64()),
            "lo_mdeg": pa.array(
                [lows[r["ring"]] for r in rows], pa.int64()
            ),
            "doc_count": pa.array(
                [r["doc_count"] for r in rows], pa.int64()
            ),
        }
    )
