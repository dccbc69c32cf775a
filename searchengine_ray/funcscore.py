"""function_score — the Elasticsearch ``function_score`` query analog.

Combines a relevance query's score with per-document functions computed
from numeric doc values: ``field_value_factor`` (value -> modifier(factor
* value)), decay functions (``gauss`` / ``exp`` / ``linear`` around an
origin with scale/offset/decay), seeded deterministic ``random_score``
(splitmix64 over doc ids), and constant ``weight``. Function values
combine under ``score_mode`` (multiply/sum/avg/max/min, clamped at
``max_boost``), then merge with the query score under ``boost_mode``
(multiply/sum/replace/max/min/avg) — the ES semantics per the public
function_score docs.

The reference engine (QryEval) has no function-score stage; this is a
beyond-reference serving feature. Evaluation runs the normal (sharded,
actor-pool) path; the function application is a vectorized numpy pass
over the match set's doc values (lazy per-column shard-span loads via
``InvertedIndex.docvalues_for_docs``), then the standard
(score DESC, external_id ASC) top-k comparator.

Float discipline (for the SQL oracle): every modifier uses the plain
libm composition the oracle can replicate exactly — ``ln1p`` is
``ln(1 + x)`` (NOT ``log1p``, whose correctly-rounded sum differs),
gauss is ``exp(-(d*d)/(2*sigma2))`` with ``sigma2 = -(scale^2)/(2
ln(decay))`` — and combination order is fixed: functions fold left in
list order, boost applies as ``query_score <op> function_score``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


_MODIFIERS = ("none", "ln", "ln1p", "ln2p", "sqrt", "square", "reciprocal")


def _fn_values(index, docs: np.ndarray, spec: dict) -> np.ndarray:
    """One function's per-doc value, aligned to ``docs``."""
    t = spec["type"]
    if t == "weight":
        return np.full(len(docs), float(spec["weight"]))
    if t == "random_score":
        # ES random_score with a seed: deterministic per (doc, seed).
        # ES hashes _seq_no/_id; here the doc_id plays _id. The value is
        # splitmix64(doc_id, seed) % 2^53 / 2^53 — uniform in [0, 1) and
        # EXACT in float64 (the numerator fits the mantissa, the divisor
        # is a power of two), so the SQL oracle replays it bit-for-bit
        # through the same HUGEINT splitmix chain the curation samplers
        # pin.
        from .sketch import _hash64

        h = _hash64(
            np.asarray(docs, dtype=np.int64), int(spec.get("seed", 0))
        )
        return (h % np.uint64(1 << 53)).astype(np.float64) / float(1 << 53)
    vals, valid = index.docvalues_for_docs(spec["field"], docs)
    if t == "field_value_factor":
        if "missing" in spec:
            vals = np.where(valid, vals, float(spec["missing"]))
        elif not valid.all():
            raise ValueError(
                f"field_value_factor: docs missing {spec['field']!r} and "
                f"no 'missing' fallback (the ES error)"
            )
        x = float(spec.get("factor", 1.0)) * vals
        mod = spec.get("modifier", "none")
        if mod == "none":
            return x
        if mod == "ln":
            return np.log(x)
        if mod == "ln1p":
            return np.log(1.0 + x)
        if mod == "ln2p":
            return np.log(2.0 + x)
        if mod == "sqrt":
            return np.sqrt(x)
        if mod == "square":
            return x * x
        if mod == "reciprocal":
            return 1.0 / x
        raise ValueError(
            f"unknown field_value_factor modifier {mod!r} "
            f"(supported: {_MODIFIERS})"
        )
    if t == "rank_feature":
        # ES rank_feature query (Lucene FeatureField.new*Query,
        # lucene.apache.org FeatureField docs): score = boost * fn(S)
        # where S is the per-doc feature value. ES stores features in a
        # dedicated rank_feature field; here any numeric doc-values
        # column plays the feature. Functions (the three Lucene ships):
        #   saturation  S / (S + pivot)
        #   log         ln(scaling_factor + S)
        #   sigmoid     S^exp / (S^exp + pivot^exp)
        # A doc missing the feature does not match a rank_feature query
        # in ES; composed additively (boost_mode=sum) the faithful
        # analog is a 0.0 contribution, which is what missing gets.
        if "missing" in spec:
            vals = np.where(valid, vals, float(spec["missing"]))
            valid = np.ones_like(valid)
        if valid.any() and (vals[valid] < 0).any():
            raise ValueError(
                "rank_feature requires non-negative feature values "
                "(the ES rank_feature field constraint)"
            )
        fn = spec.get("function", "saturation")
        boost = float(spec.get("boost", 1.0))
        if fn == "saturation":
            pivot = float(spec["pivot"])
            out = vals / (vals + pivot)
        elif fn == "log":
            out = np.log(float(spec.get("scaling_factor", 1.0)) + vals)
        elif fn == "sigmoid":
            pivot = float(spec["pivot"])
            expo = float(spec["exponent"])
            va = vals**expo
            out = va / (va + pivot**expo)
        else:
            raise ValueError(
                f"unknown rank_feature function {fn!r} "
                "(saturation | log | sigmoid)"
            )
        return np.where(valid, boost * out, 0.0)
    if t == "distance_feature":
        # ES distance_feature query: score = boost * pivot / (pivot +
        # |value - origin|) — the date/geo proximity booster, here over
        # any numeric doc-values column (dates are numeric epochs
        # anyway). Missing value -> no match -> 0.0 contribution, same
        # convention as rank_feature above.
        origin = float(spec["origin"])
        pivot = float(spec["pivot"])
        boost = float(spec.get("boost", 1.0))
        out = boost * (pivot / (pivot + np.abs(vals - origin)))
        return np.where(valid, out, 0.0)
    if t in ("gauss", "exp", "linear"):
        origin = float(spec["origin"])
        scale = float(spec["scale"])
        offset = float(spec.get("offset", 0.0))
        decay = float(spec.get("decay", 0.5))
        if not (0.0 < decay < 1.0):
            raise ValueError(f"decay must be in (0, 1), got {decay}")
        # missing field -> distance 0 -> function value 1 (no effect);
        # ES errors on missing decay fields, but the no-effect default is
        # the useful batch-pipeline behavior and is loudly documented
        v = np.where(valid, vals, origin)
        dist = np.maximum(0.0, np.abs(v - origin) - offset)
        if t == "gauss":
            sigma2 = -(scale * scale) / (2.0 * np.log(decay))
            return np.exp(-(dist * dist) / (2.0 * sigma2))
        if t == "exp":
            lam = np.log(decay) / scale
            return np.exp(lam * dist)
        s = scale / (1.0 - decay)
        return np.maximum(0.0, (s - dist) / s)
    raise ValueError(f"unknown function type {t!r}")


def _combine_functions(
    fvals: list[np.ndarray], score_mode: str, n: int
) -> np.ndarray:
    if not fvals:
        return np.ones(n)
    if score_mode == "multiply":
        out = fvals[0].copy()
        for f in fvals[1:]:
            out = out * f
        return out
    if score_mode == "sum":
        out = fvals[0].copy()
        for f in fvals[1:]:
            out = out + f
        return out
    if score_mode == "avg":
        out = fvals[0].copy()
        for f in fvals[1:]:
            out = out + f
        return out / float(len(fvals))
    if score_mode == "max":
        return np.maximum.reduce(fvals)
    if score_mode == "min":
        return np.minimum.reduce(fvals)
    raise ValueError(f"unknown score_mode {score_mode!r}")


def _apply_boost(base: np.ndarray, fn: np.ndarray, boost_mode: str):
    if boost_mode == "multiply":
        return base * fn
    if boost_mode == "sum":
        return base + fn
    if boost_mode == "replace":
        return fn
    if boost_mode == "max":
        return np.maximum(base, fn)
    if boost_mode == "min":
        return np.minimum(base, fn)
    if boost_mode == "avg":
        return (base + fn) / 2.0
    raise ValueError(f"unknown boost_mode {boost_mode!r}")


def function_score(
    engine,
    qid: str,
    query: str,
    functions: list[dict],
    score_mode: str = "multiply",
    boost_mode: str = "multiply",
    max_boost: float | None = None,
    k: int = 10,
) -> pa.Table:
    """Rank by ``boost_mode(query_score, score_mode(functions))`` over the
    FULL match set (functions apply before the top-k cut — a doc weak on
    relevance but strong on the functions can enter the top k, the reason
    ES applies function_score at query time rather than as a rescorer).
    Returns (doc_id, score_r, rn) in the engine's standard
    (score DESC, external_id ASC) order."""
    from .engine import Evaluator, select_top_k
    import pyarrow.compute as pc

    tree = engine.parse(query)
    ev = Evaluator(engine.index, engine.params)
    docs, scores = ev.evaluate(tree)
    fvals = [_fn_values(engine.index, docs, f) for f in functions]
    fn = _combine_functions(fvals, score_mode, len(docs))
    if max_boost is not None:
        fn = np.minimum(fn, float(max_boost))
    final = _apply_boost(scores, fn, boost_mode)
    docs, final, _ext = select_top_k(engine.index, docs, final, k)
    n = len(docs)
    return pa.table(
        {
            "doc_id": pa.array(docs, pa.int64()),
            "score_r": pc.round(pa.array(final, pa.float64()), ndigits=6),
            "rn": pa.array(np.arange(1, n + 1, dtype=np.int64)),
        }
    )
