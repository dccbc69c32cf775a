"""function_score (funcscore.py, ES function_score analog): modifier
formulas, the decay-at-scale==decay property of all three decay shapes,
score/boost mode combination, missing-field semantics, max_boost, and
full oracle parity of the gate at sf0.001."""

import numpy as np
import pytest


class FakeIndex:
    def __init__(self, vals, valid=None):
        self.vals = np.asarray(vals, dtype=float)
        self.valid = (
            np.ones(len(self.vals), dtype=bool)
            if valid is None
            else np.asarray(valid, dtype=bool)
        )

    def docvalues_for_docs(self, column, docs):
        return self.vals.copy(), self.valid.copy()


DOCS = np.arange(4, dtype=np.int64)


def _fvf(vals, **spec):
    from searchengine_ray.funcscore import _fn_values

    spec = {"type": "field_value_factor", "field": "x", **spec}
    return _fn_values(FakeIndex(vals), DOCS, spec)


def test_field_value_factor_modifiers():
    v = np.array([1.0, 10.0, 100.0, 250.0])
    assert np.array_equal(_fvf(v), v)  # none, factor 1
    assert np.array_equal(_fvf(v, factor=0.5), 0.5 * v)
    assert np.array_equal(_fvf(v, modifier="ln"), np.log(v))
    # ln1p is ln(1+x) exactly — NOT log1p (different rounding)
    assert np.array_equal(_fvf(v, modifier="ln1p"), np.log(1.0 + v))
    assert np.array_equal(_fvf(v, modifier="ln2p"), np.log(2.0 + v))
    assert np.array_equal(_fvf(v, modifier="sqrt"), np.sqrt(v))
    assert np.array_equal(_fvf(v, modifier="square"), v * v)
    assert np.array_equal(_fvf(v, modifier="reciprocal"), 1.0 / v)
    with pytest.raises(ValueError, match="modifier"):
        _fvf(v, modifier="log10")


def test_fvf_missing_field():
    from searchengine_ray.funcscore import _fn_values

    idx = FakeIndex([1.0, 2.0, np.nan, 4.0], valid=[1, 1, 0, 1])
    with pytest.raises(ValueError, match="missing"):
        _fn_values(
            idx, DOCS, {"type": "field_value_factor", "field": "x"}
        )
    got = _fn_values(
        idx,
        DOCS,
        {"type": "field_value_factor", "field": "x", "missing": 9.0},
    )
    assert got[2] == 9.0 and got[0] == 1.0


@pytest.mark.parametrize("shape", ["gauss", "exp", "linear"])
def test_decay_at_scale_equals_decay(shape):
    """The defining ES decay property: value(origin) == 1 and
    value(origin +/- scale) == decay, for every shape."""
    from searchengine_ray.funcscore import _fn_values

    idx = FakeIndex([100.0, 160.0, 40.0, 1e9])
    got = _fn_values(
        idx,
        DOCS,
        {
            "type": shape,
            "field": "x",
            "origin": 100.0,
            "scale": 60.0,
            "decay": 0.37,
        },
    )
    assert got[0] == 1.0
    assert got[1] == pytest.approx(0.37, rel=1e-12)
    assert got[2] == pytest.approx(0.37, rel=1e-12)
    assert got[3] <= 0.37  # far away decays below (linear floors at 0)


def test_decay_offset_and_missing():
    from searchengine_ray.funcscore import _fn_values

    # inside the offset radius -> no decay at all
    idx = FakeIndex([120.0, 80.0], valid=[1, 0])
    got = _fn_values(
        idx,
        DOCS[:2],
        {
            "type": "gauss",
            "field": "x",
            "origin": 100.0,
            "scale": 10.0,
            "offset": 25.0,
        },
    )
    assert got[0] == 1.0  # |120-100|=20 <= offset 25
    assert got[1] == 1.0  # missing field -> distance 0 -> no effect
    with pytest.raises(ValueError, match="decay"):
        _fn_values(
            idx, DOCS[:2],
            {"type": "gauss", "field": "x", "origin": 0, "scale": 1,
             "decay": 1.0},
        )


def test_score_and_boost_modes():
    from searchengine_ray.funcscore import (
        _apply_boost,
        _combine_functions,
    )

    a = np.array([1.0, 2.0])
    b = np.array([4.0, 0.5])
    assert np.array_equal(_combine_functions([a, b], "multiply", 2), a * b)
    assert np.array_equal(_combine_functions([a, b], "sum", 2), a + b)
    assert np.array_equal(
        _combine_functions([a, b], "avg", 2), (a + b) / 2.0
    )
    assert np.array_equal(
        _combine_functions([a, b], "max", 2), np.maximum(a, b)
    )
    assert np.array_equal(
        _combine_functions([a, b], "min", 2), np.minimum(a, b)
    )
    assert np.array_equal(_combine_functions([], "multiply", 2), [1.0, 1.0])
    with pytest.raises(ValueError, match="score_mode"):
        _combine_functions([a], "geometric", 2)
    base = np.array([10.0, 20.0])
    fn = np.array([2.0, 0.5])
    assert np.array_equal(_apply_boost(base, fn, "multiply"), base * fn)
    assert np.array_equal(_apply_boost(base, fn, "sum"), base + fn)
    assert np.array_equal(_apply_boost(base, fn, "replace"), fn)
    assert np.array_equal(
        _apply_boost(base, fn, "max"), np.maximum(base, fn)
    )
    assert np.array_equal(
        _apply_boost(base, fn, "min"), np.minimum(base, fn)
    )
    assert np.array_equal(
        _apply_boost(base, fn, "avg"), (base + fn) / 2.0
    )
    with pytest.raises(ValueError, match="boost_mode"):
        _apply_boost(base, fn, "xor")


SF = "/root/testdata/sf0.001"


def test_function_score_vs_manual_recombination(ray_session):
    """function_score on the real engine == recombining the full search()
    scores with function values computed straight from the parquet."""
    import pyarrow.parquet as pq

    from searchengine_ray.funcscore import function_score
    from searchengine_ray.gate import engine_for

    eng = engine_for(SF, "bm25")
    base = eng.search("q", "dup spark").to_pandas()
    nc = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "n_chars"]
    ).to_pandas().set_index("doc_id")["n_chars"]
    v = nc.loc[base.doc_id].to_numpy().astype(float)
    fvf = np.log(1.0 + 0.001 * v)
    dist = np.maximum(0.0, np.abs(v - 250.0) - 0.0)
    sigma2 = -(200.0 * 200.0) / (2.0 * np.log(0.5))
    gauss = np.exp(-(dist * dist) / (2.0 * sigma2))
    comb = base.score.to_numpy() * (fvf * gauss)
    order = np.lexsort((base.external_id.to_numpy(), -comb))[:25]
    exp_docs = base.doc_id.to_numpy()[order]
    exp_scores = np.round(comb[order], 6)

    got = function_score(
        eng,
        "q",
        "dup spark",
        [
            {"type": "field_value_factor", "field": "n_chars",
             "factor": 0.001, "modifier": "ln1p"},
            {"type": "gauss", "field": "n_chars", "origin": 250,
             "scale": 200, "decay": 0.5},
        ],
        k=25,
    ).to_pandas()
    assert got.doc_id.tolist() == exp_docs.tolist()
    assert got.score_r.tolist() == exp_scores.tolist()
    assert got.rn.tolist() == list(range(1, 26))


def test_gate_matches_oracle_sql(ray_session):
    import duckdb

    import __ray_entry__ as e
    from searchengine_ray import gate

    got = gate.se_function_score(SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    exp = con.execute(e.oracle_sql()["se_function_score"]).df()
    got = got.sort_values("rn").reset_index(drop=True)
    exp = exp.sort_values("rn").reset_index(drop=True)
    assert got.doc_id.tolist() == exp.doc_id.tolist()
    assert got.score_r.tolist() == exp.score_r.tolist()


def test_max_boost_and_replace(ray_session):
    """max_boost clamps the combined function value; boost_mode=replace
    ranks purely by the functions."""
    from searchengine_ray.funcscore import function_score
    from searchengine_ray.gate import engine_for

    eng = engine_for(SF, "bm25")
    fns = [{"type": "weight", "weight": 7.0}]
    rep = function_score(
        eng, "q", "dup", fns, boost_mode="replace", k=5
    ).to_pandas()
    assert (rep.score_r == 7.0).all()
    clamped = function_score(
        eng, "q", "dup", fns, boost_mode="replace", max_boost=3.0, k=5
    ).to_pandas()
    assert (clamped.score_r == 3.0).all()


def test_random_score_deterministic_and_exact(ray_session):
    """random_score: per-doc value == splitmix64(doc_id, seed)%2^53/2^53
    exactly, stable across calls, different under a different seed."""
    from searchengine_ray.funcscore import _fn_values, function_score
    from searchengine_ray.gate import engine_for
    from searchengine_ray.sketch import _hash64

    docs = np.array([1, 7, 42, 10_000_019], dtype=np.int64)
    got = _fn_values(None, docs, {"type": "random_score", "seed": 9})
    exp = (_hash64(docs, 9) % np.uint64(1 << 53)).astype(float) / float(
        1 << 53
    )
    assert np.array_equal(got, exp)
    assert ((got >= 0) & (got < 1)).all()

    eng = engine_for(SF, "bm25")
    a = function_score(
        eng, "q", "dup", [{"type": "random_score", "seed": 1}],
        boost_mode="replace", k=10,
    ).to_pandas()
    b = function_score(
        eng, "q", "dup", [{"type": "random_score", "seed": 1}],
        boost_mode="replace", k=10,
    ).to_pandas()
    c = function_score(
        eng, "q", "dup", [{"type": "random_score", "seed": 2}],
        boost_mode="replace", k=10,
    ).to_pandas()
    assert a.doc_id.tolist() == b.doc_id.tolist()
    assert a.score_r.tolist() == b.score_r.tolist()
    assert a.doc_id.tolist() != c.doc_id.tolist()
