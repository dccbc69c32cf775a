"""Full-corpus exact-integer k-means (kmeans.py): parity with a pure-Python
scalar Lloyd reference on the sf0.001 embeddings, the trunc-div kernel vs
DuckDB `//` semantics, the empty-cluster keep rule, and the loud guards
(k > n, coordinate bound)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF}/embeddings.parquet"), reason="testdata missing"
)


def _scalar_lloyd(ids, mat, k, iters, scale):
    """Reference implementation: plain Python loops, explicit trunc-div
    (quotient rounded toward zero), ties to the smallest centroid index,
    empty clusters keep their previous centroid."""
    q = [
        [int(np.floor(float(x) * scale)) for x in row]
        for row in mat.astype(np.float64)
    ]
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    cents = [list(q[i]) for i in order[:k]]
    d = len(q[0])

    def dist2(a, b):
        return sum((a[t] - b[t]) * (a[t] - b[t]) for t in range(d))

    def assign():
        lab = []
        for row in q:
            ds = [dist2(row, c) for c in cents]
            lab.append(ds.index(min(ds)))  # first min == smallest j
        return lab

    for _ in range(iters):
        lab = assign()
        for j in range(k):
            members = [q[i] for i in range(len(q)) if lab[i] == j]
            if not members:
                continue
            n = len(members)
            new = []
            for t in range(d):
                s = sum(m[t] for m in members)
                quot = abs(s) // n
                new.append(quot if s >= 0 else -quot)  # trunc toward zero
            cents[j] = new
    lab = assign()
    return {
        int(ids[i]): (lab[i], dist2(q[i], cents[lab[i]]))
        for i in range(len(q))
    }


def test_trunc_div_matches_duckdb_semantics():
    import duckdb

    from searchengine_ray.kmeans import _trunc_div

    s = np.array([-7, 7, -8, 8, -1, 0, 5, -5], dtype=np.int64)
    c = np.array([2, 2, 2, 2, 3, 3, 5, 5], dtype=np.int64)
    got = _trunc_div(s, c)
    want = [
        duckdb.sql(f"SELECT {a} // {b}").fetchone()[0]
        for a, b in zip(s.tolist(), c.tolist())
    ]
    assert got.tolist() == want


def test_kmeans_matches_scalar_reference(ray_session):
    from searchengine_ray.kmeans import kmeans_assign

    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    ids = tbl.column("vec_id").to_numpy()
    mat = (
        tbl.column("embedding")
        .combine_chunks()
        .flatten()
        .to_numpy()
        .reshape(len(ids), -1)
    )
    # thin to 60 rows so the O(n·k·d) scalar reference stays fast
    keep = ids < 60
    import pyarrow as pa

    small = tbl.filter(pa.array(keep))
    tmp = "/tmp/kmeans_small"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(small, f"{tmp}/embeddings.parquet")

    want = _scalar_lloyd(ids[keep], mat[keep], k=4, iters=2, scale=256)
    got = kmeans_assign(tmp, k=4, iters=2).to_pandas()
    assert len(got) == len(want)
    for r in got.itertuples():
        lab, d2 = want[r.vec_id]
        assert (r.cluster, r.dist2) == (lab, d2), r.vec_id


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    """Seeds 0 and 1 are identical vectors, so the smallest-j tie rule
    starves cluster 1 in iteration 1 (its own seed goes to cluster 0) —
    the empty-cluster keep rule must fire, and because centroid 0 then
    moves toward the [0.1] satellites while centroid 1 stays at the
    origin, the kept centroid re-wins the origin vectors in the next
    assignment. Engine must match the scalar reference exactly through
    that whole sequence."""
    import pyarrow as pa

    from searchengine_ray.kmeans import kmeans_assign

    # ids 0,1,2 seed the centroids; 0 and 1 are identical (cluster 1
    # starves in iteration 1)
    vecs = [[0.0, 0.0], [0.0, 0.0], [10.0, 10.0]] + [[10.0, 10.0]] * 5 + [
        [0.1, 0.1]
    ] * 5
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        }
    )
    tmp = "/tmp/kmeans_empty"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(t, f"{tmp}/embeddings.parquet")
    out = kmeans_assign(tmp, k=3, iters=2).to_pandas()
    assert len(out) == len(vecs)
    ids = np.arange(len(vecs), dtype=np.int64)
    want = _scalar_lloyd(
        ids, np.array(vecs, dtype=np.float32), k=3, iters=2, scale=256
    )
    for r in out.itertuples():
        assert (r.cluster, r.dist2) == want[r.vec_id], r.vec_id
    # the keep rule actually fired AND the kept centroid stayed live:
    # the origin duplicates end up back in cluster 1
    assert set(out[out.vec_id.isin([0, 1])].cluster) == {1}


def test_semantic_dedup_kmeans_properties_and_reference(ray_session):
    """SemDeDup over the exact-integer kmeans cells: (a) cells and dist2
    equal kmeans_assign's, (b) kept set is an eps-independent set within
    each cell, (c) every dropped item is > eps similar to its recorded
    kept representative under the (dist2 DESC, vec_id ASC) scan order —
    all recounted locally from the raw embeddings."""
    from searchengine_ray.ann import _load_matrix
    from searchengine_ray.dedup import semantic_dedup_kmeans
    from searchengine_ray.kmeans import kmeans_assign

    eps = 0.4
    out = semantic_dedup_kmeans(SF, eps=eps).to_pandas().sort_values("vec_id")
    lab = kmeans_assign(SF).to_pandas().sort_values("vec_id")
    assert list(out["vec_id"]) == list(lab["vec_id"])
    assert list(out["cell"]) == list(lab["cluster"])
    assert list(out["dist2"]) == list(lab["dist2"])

    ids, mat = _load_matrix(SF)  # L2-normalized, sorted below
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    cell = out["cell"].to_numpy()
    d2 = out["dist2"].to_numpy()
    by_id = out.set_index("vec_id")
    n_dropped = 0
    for c in np.unique(cell):
        m = cell == c
        cids, cmat, cd2 = ids[m], mat[m], d2[m]
        o = np.lexsort((cids, -cd2))  # dist2 DESC, vec_id ASC
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
                    n_dropped += 1
                    continue
            assert row["kept"] and row["dup_of"] == -1
            kept_idx.append(i)
        K = S[np.ix_(kept_idx, kept_idx)]
        np.fill_diagonal(K, 0.0)
        assert (K <= eps).all()
    assert n_dropped > 0  # the planted near-dups collapse


def test_cluster_exemplars_recounted_from_assignment(ray_session):
    """cluster_exemplars == the (dist2 ASC, vec_id ASC) top-m slice of
    kmeans_assign's full labeling, recounted in pandas; ranks are 1..m
    dense per cluster and every cluster with members appears."""
    from searchengine_ray.kmeans import cluster_exemplars, kmeans_assign

    m = 5
    ex = (
        cluster_exemplars(SF, m=m)
        .to_pandas()
        .sort_values(["cluster", "rank"])
        .reset_index(drop=True)
    )
    lab = kmeans_assign(SF).to_pandas()
    lab = lab.sort_values(["cluster", "dist2", "vec_id"])
    want = lab.groupby("cluster").head(m).reset_index(drop=True)
    want["rank"] = want.groupby("cluster").cumcount() + 1
    want = want[["cluster", "vec_id", "dist2", "rank"]]
    assert ex.equals(want)
    sizes = ex.groupby("cluster")["rank"].agg(["min", "max", "count"])
    assert (sizes["min"] == 1).all()
    assert (sizes["max"] == sizes["count"]).all()
    assert set(ex.cluster.unique()) == set(lab.cluster.unique())


def test_assign_and_quant_handle_empty_and_nan():
    """Regressions from the r5 session review: (a) _assign must not
    broadcast-crash on an empty batch (Ray Data can yield zero-row
    blocks); (b) a NaN embedding must trip the coordinate guard loudly
    instead of casting to garbage int64 (NaN compares False against any
    bound, so the guard must be comparison-inverted)."""
    import pyarrow as pa

    from searchengine_ray.kmeans import _assign, _quant_matrix

    cents = np.ones((8, 16), dtype=np.int64)
    lab, d2 = _assign(np.zeros((0, 0), dtype=np.int64), cents)
    assert lab.shape == (0,) and d2.shape == (0,)

    t = pa.table(
        {
            "vec_id": pa.array([0], pa.int64()),
            "embedding": pa.array([[0.5, float("nan")]], pa.list_(pa.float32())),
        }
    )
    with pytest.raises(ValueError, match="NaN"):
        _quant_matrix(t, 256)

    # (c) the bound must scale with dimension: a coordinate safe at dim=2
    # (|q| ~ 2^23 < 2^24) overflows int64 dist2 at dim=100000 and must
    # raise there instead of silently wrapping
    big = float(1 << 23) / 256.0
    t2 = pa.table(
        {
            "vec_id": pa.array([0], pa.int64()),
            "embedding": pa.array([[big, -big]], pa.list_(pa.float32())),
        }
    )
    assert _quant_matrix(t2, 256).shape == (1, 2)  # fine at dim=2
    t3 = pa.table(
        {
            "vec_id": pa.array([0], pa.int64()),
            "embedding": pa.array([[big] * 100_000], pa.list_(pa.float32())),
        }
    )
    with pytest.raises(ValueError, match="int64-safe bound"):
        _quant_matrix(t3, 256)


def test_kmeans_pipeline_survives_empty_block(ray_session):
    """A zero-row row group in the embeddings parquet must flow through
    fit/assign/exemplars/semdedup without a broadcast crash and leave the
    results identical to the same data without the empty block."""
    import pyarrow as pa

    from searchengine_ray.dedup import semantic_dedup_kmeans
    from searchengine_ray.kmeans import cluster_exemplars, kmeans_assign

    src = pq.read_table(f"{SF}/embeddings.parquet").select(
        ["vec_id", "embedding"]
    )
    small = src.slice(0, 80)
    empty = small.schema.empty_table()
    for name, parts in (
        ("plain", [small]),
        ("withempty", [small.slice(0, 40), empty, small.slice(40, 40)]),
    ):
        d = f"/tmp/kmeans_emptyblock_{name}"
        os.makedirs(d, exist_ok=True)
        w = pq.ParquetWriter(f"{d}/embeddings.parquet", small.schema)
        for p in parts:
            w.write_table(p)
        w.close()
    a = kmeans_assign("/tmp/kmeans_emptyblock_plain", k=4).to_pandas()
    b = kmeans_assign("/tmp/kmeans_emptyblock_withempty", k=4).to_pandas()
    key = ["vec_id", "cluster", "dist2"]
    assert (
        a.sort_values("vec_id")[key]
        .reset_index(drop=True)
        .equals(b.sort_values("vec_id")[key].reset_index(drop=True))
    )
    ex = cluster_exemplars("/tmp/kmeans_emptyblock_withempty", m=3, k=4)
    assert ex.num_rows > 0
    sd = semantic_dedup_kmeans(
        "/tmp/kmeans_emptyblock_withempty", k=4
    ).to_pandas()
    assert len(sd) == 80


def test_kmeans_fuzz_random_corpora_vs_scalar(ray_session):
    """Seeded fuzz: 5 random small corpora with planted exact duplicates
    (tie pressure on the smallest-j rule) and tight clusters (empty-
    cluster pressure after updates) — engine must equal the scalar
    reference on every one, across two (k, iters) shapes."""
    import pyarrow as pa

    from searchengine_ray.kmeans import kmeans_assign

    for seed in range(5):
        rng = np.random.default_rng(seed)
        n, d = 40 + 10 * seed, 4
        mat = rng.normal(size=(n, d)).astype(np.float32)
        # plant duplicates: rows 2i+1 copy row 2i for the first 10 rows
        for i in range(0, 10, 2):
            mat[i + 1] = mat[i]
        ids = np.arange(n, dtype=np.int64)
        t = pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in mat], pa.list_(pa.float32())
                ),
            }
        )
        tmp = f"/tmp/kmeans_fuzz_{seed}"
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(t, f"{tmp}/embeddings.parquet")
        for k, iters in ((3, 1), (5, 3)):
            got = kmeans_assign(tmp, k=k, iters=iters).to_pandas()
            want = _scalar_lloyd(ids, mat, k=k, iters=iters, scale=256)
            assert len(got) == n
            for r in got.itertuples():
                assert (r.cluster, r.dist2) == want[r.vec_id], (
                    seed, k, iters, r.vec_id,
                )


def test_kmeans_guards(ray_session):
    import pyarrow as pa

    from searchengine_ray.kmeans import kmeans_assign

    t = pa.table(
        {
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[0.0], [1.0]], pa.list_(pa.float32())),
        }
    )
    tmp = "/tmp/kmeans_guard"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(t, f"{tmp}/embeddings.parquet")
    with pytest.raises(ValueError, match="at least k"):
        kmeans_assign(tmp, k=8)

    t2 = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array(
                [[1e9], [0.0], [1.0]], pa.list_(pa.float32())
            ),
        }
    )
    tmp2 = "/tmp/kmeans_guard2"
    os.makedirs(tmp2, exist_ok=True)
    pq.write_table(t2, f"{tmp2}/embeddings.parquet")
    with pytest.raises(Exception, match="int64-safe bound"):
        kmeans_assign(tmp2, k=2).to_pandas()
