"""The `inlink` field (`QryParser.java:162-167` whitelist): servable when a
corpus column is mapped to it, loud error when the index lacks it."""

import pyarrow as pa
import pytest


def _corpus():
    rows = {
        "doc_id": [0, 1, 2],
        "repo": ["r0", "r1", "r2"],
        "path": ["p0", "p1", "p2"],
        "commit": ["c"] * 3,
        "lang": ["txt"] * 3,
        "content": ["alpha beta", "beta gamma", "gamma delta"],
        # inbound-link text, the ClueWeb analog
        "links": ["home about", "about", "home contact"],
    }
    return pa.table(
        {
            k: pa.array(v, type=pa.int64() if k == "doc_id" else pa.string())
            for k, v in rows.items()
        }
    )


def test_inlink_servable_when_mapped(ray_session, tmp_path):
    import ray.data

    from searchengine_ray.build import build_index
    from searchengine_ray.config import BuildConfig, ModelParams
    from searchengine_ray.engine import SearchEngine

    tbl = _corpus()
    cfg = BuildConfig(
        fields={"body": "content", "title": "path", "inlink": "links"}
    )
    out = str(tmp_path / "inlink_idx")
    build_index(lambda: ray.data.from_arrow(tbl), out, cfg)
    eng = SearchEngine(out, ModelParams(model="rankedboolean", top_k=10))
    got = eng.search("q", "home.inlink").to_pandas()
    assert set(got["doc_id"]) == {0, 2}


def test_unbuilt_field_raises(built_index):
    from searchengine_ray.config import ModelParams
    from searchengine_ray.engine import SearchEngine

    eng = SearchEngine(built_index, ModelParams(model="rankedboolean"))
    with pytest.raises(ValueError, match="not in this index"):
        eng.search("q", "anything.inlink")
