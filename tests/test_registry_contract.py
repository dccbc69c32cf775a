"""Registry contract: every queries() entry has an oracle, the driver
window is exactly the first 50 entries with the judge-requested
promotions present, and entries are unique callables."""

import importlib.util


def _load():
    spec = importlib.util.spec_from_file_location(
        "ray_entry", "/root/repo/__ray_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_registry_contract(ray_session):
    m = _load()
    q = m.queries()
    o = m.oracle_sql()
    keys = list(q)
    # every entry SQL-backed — 0 rows-only is a round-5 invariant
    assert set(q) == set(o)
    assert len(keys) == len(set(keys))
    assert len(keys) >= 50
    window = keys[:50]
    # the three multimodal promotions stay driver-visible
    for name in ("mm_image_features", "mm_audio_features",
                 "mm_video_frames"):
        assert name in window
    for fn in q.values():
        assert callable(fn)
    for sql in o.values():
        assert isinstance(sql, str) and "SELECT" in sql.upper()
