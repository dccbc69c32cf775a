"""ES geo-family analogs (geo.py): derived coords vs scalar splitmix, knn
vs a full-matrix numpy oracle, grid counts vs plain bincount, and the
bbox/radius membership filters — all integer-exact."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from searchengine_ray import geo
from searchengine_ray.sketch import _hash64

SF = "/root/testdata/sf0.001"


def _all_coords():
    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]).column(
        "doc_id"
    ).to_numpy()
    lon, lat = geo.derive_coords(ids)
    return ids, lon, lat


def test_derive_coords_ranges_and_determinism():
    ids = np.arange(1000, dtype=np.int64)
    lon, lat = geo.derive_coords(ids)
    lon2, lat2 = geo.derive_coords(ids)
    assert (lon == lon2).all() and (lat == lat2).all()
    assert lon.min() >= -180_000_000 and lon.max() < 180_000_000
    assert lat.min() >= -90_000_000 and lat.max() < 90_000_000
    # spot-check against the scalar chain
    h = _hash64(np.array([7], dtype=np.int64), geo.GEO_SEED_LON)[0]
    assert lon[7] == int(h % np.uint64(360_000_000)) - 180_000_000


def test_geo_bbox_matches_numpy(ray_session):
    ids, lon, lat = _all_coords()
    lo, hi, la, lb = -50_000_000, 50_000_000, -20_000_000, 80_000_000
    got = geo.geo_bounding_box(SF, lo, hi, la, lb).to_pandas()
    m = (lon >= lo) & (lon <= hi) & (lat >= la) & (lat <= lb)
    assert sorted(got.doc_id) == sorted(ids[m].tolist())
    assert (got.sort_values("doc_id").lon.to_numpy()
            == lon[m][np.argsort(ids[m], kind="stable")]).all()


def test_geo_radius_matches_numpy(ray_session):
    ids, lon, lat = _all_coords()
    got = geo.geo_distance_filter(SF, 0, 0, 40_000_000).to_pandas()
    d2 = lon**2 + lat**2
    m = d2 <= 40_000_000**2
    assert sorted(got.doc_id) == sorted(ids[m].tolist())


def test_geo_knn_matches_numpy(ray_session):
    ids, lon, lat = _all_coords()
    origins = [(0, 0), (170_000_000, -80_000_000)]
    k = 7
    got = geo.geo_knn(SF, origins, k).to_pandas()
    for oid, (x0, y0) in enumerate(origins):
        d2 = (lon - x0) ** 2 + (lat - y0) ** 2
        order = np.lexsort((ids, d2))[:k]
        sub = got[got.origin_id == oid].sort_values("rank")
        assert sub.doc_id.tolist() == ids[order].tolist()
        assert sub.dist2.tolist() == d2[order].tolist()
        assert sub["rank"].tolist() == list(range(1, k + 1))


def test_geo_grid_matches_numpy(ray_session):
    ids, lon, lat = _all_coords()
    got = geo.geohash_grid(SF, 24).to_pandas()
    cx = (lon + 180_000_000) >> 24
    cy = (lat + 90_000_000) >> 24
    packed = cx * (1 << 31) + cy
    cells, cnt = np.unique(packed, return_counts=True)
    g = got.sort_values(["cell_x", "cell_y"]).reset_index(drop=True)
    assert (g.cell_x.to_numpy() == cells // (1 << 31)).all()
    assert (g.cell_y.to_numpy() == cells % (1 << 31)).all()
    assert (g.n_docs.to_numpy() == cnt).all()
    assert int(g.n_docs.sum()) == len(ids)


def test_geo_grid_shift_guard():
    with pytest.raises(ValueError):
        geo.geohash_grid(SF, 31)


def test_geo_centroid_exact_sums(ray_session):
    """Centroid from exact integer sums equals the manual recompute; the
    centroid lies inside the filter box; empty box raises."""
    import numpy as np
    import pytest as _pytest

    from searchengine_ray.geo import GATE_BBOX, derive_coords, geo_centroid

    SF = "/root/testdata/sf0.001"
    t = geo_centroid(SF, *GATE_BBOX).to_pandas().iloc[0]
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id"]).column("doc_id").to_numpy()
    lon, lat = derive_coords(ids)
    lon_lo, lon_hi, lat_lo, lat_hi = GATE_BBOX
    m = ((lon >= lon_lo) & (lon <= lon_hi)
         & (lat >= lat_lo) & (lat <= lat_hi))
    assert t["n"] == int(m.sum())
    assert t["sum_lon"] == int(lon[m].sum())
    assert t["centroid_lon"] == int(lon[m].sum()) / int(m.sum())
    assert lon_lo <= t["centroid_lon"] <= lon_hi
    assert lat_lo <= t["centroid_lat"] <= lat_hi
    with _pytest.raises(ValueError, match="empty box"):
        geo_centroid(SF, 0, 1, 0, 1)


def test_geo_distance_rings_partition_and_parity(ray_session):
    """Rings partition the corpus (counts sum to N) and match a brute
    numpy recompute including the closed-left boundary rule."""
    import numpy as np
    import pyarrow.parquet as pq

    from searchengine_ray.geo import (
        GATE_ORIGIN, RING_EDGES, derive_coords, geo_distance_rings,
    )

    sf = "/root/testdata/sf0.001"
    got = geo_distance_rings(sf).to_pandas()
    ids = pq.read_table(
        sf + "/documents.parquet", columns=["doc_id"]
    ).column("doc_id").to_numpy()
    lon, lat = derive_coords(ids)
    d2 = (lon - GATE_ORIGIN[0]) ** 2 + (lat - GATE_ORIGIN[1]) ** 2
    e2 = np.array([e * e for e in RING_EDGES], dtype=np.int64)
    ring = np.searchsorted(e2, d2, side="right")
    exp = {int(r): int(c) for r, c in
           zip(*np.unique(ring, return_counts=True))}
    assert dict(zip(got.ring, got.doc_count)) == exp
    assert got.doc_count.sum() == len(ids)


def test_geo_distance_rings_bad_edges(ray_session):
    from searchengine_ray.geo import geo_distance_rings

    import pytest as _pytest

    with _pytest.raises(ValueError, match="increasing"):
        geo_distance_rings("/root/testdata/sf0.001", edges=(5, 5, 6))
