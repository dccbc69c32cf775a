"""Run configuration: the reference's flat key=value parameter files.

Mirrors `Homeworks/HW6/QryEval/QryEval.java:241-276` (reader) and the
required/optional key surface (`QryEval.java:67-90`); stays a plain dict plus
typed accessors — no Dataset involvement.
"""

from __future__ import annotations

from dataclasses import dataclass, field


def read_param_file(path: str) -> dict[str, str]:
    """``key=value`` per line; blank lines skipped; later keys win."""
    params: dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or "=" not in line:
                continue
            k, v = line.split("=", 1)
            params[k.strip()] = v.strip()
    return params


@dataclass
class ModelParams:
    """Retrieval-model knobs (defaults = the reference's canonical params,
    `Homeworks/HW6/QryEval/HW6-Exp-2.1a.param`, `HW3-Exp-4c.param`)."""

    model: str = "bm25"  # unrankedboolean | rankedboolean | bm25 | indri
    k1: float = 1.2
    b: float = 0.75
    k3: float = 0.0  # read but never applied, like the reference (qtf=1)
    mu: float = 1500.0
    lam: float = 0.01  # Indri:lambda
    top_k: int = 100  # trecEvalOutputLength
    #: flat-BM25 MaxScore/block-max pruning fast path (exact; auto-fallback)
    use_maxscore: bool = True

    @classmethod
    def from_params(cls, params: dict[str, str]) -> "ModelParams":
        m = params.get("retrievalAlgorithm", "BM25").lower()
        return cls(
            model=m,
            k1=float(params.get("BM25:k_1", 1.2)),
            b=float(params.get("BM25:b", 0.75)),
            k3=float(params.get("BM25:k_3", 0.0)),
            mu=float(params.get("Indri:mu", 1500.0)),
            lam=float(params.get("Indri:lambda", 0.01)),
            top_k=int(params.get("trecEvalOutputLength", 100)),
        )


#: default query operator each model wraps a bare query in
#: (`QryEval.java:121-122`; RetrievalModel*.defaultQrySopName)
DEFAULT_OP = {
    "bm25": "#sum",
    "indri": "#and",
    "rankedboolean": "#and",
    "unrankedboolean": "#and",
}

#: Retrieval-model registry — the extension surface the reference documents
#: as "subclass RetrievalModel + extend the instanceof ladders"
#: (`QrySopScore.java:33-52`, `ReadMe.txt:52-63`), re-expressed as hooks:
#: no ladders to edit. A registered model supplies
#:   score_leaf(tf, dl, stats, params) -> np.ndarray   (vectorized; stats
#:     has .df .ctf .n_docs .doc_count .sum_len for the leaf's field/list)
#: and per-operator combine reducers from {"sum","min","max"} (matching
#: children only). The four built-in models keep their exact reference
#: semantics in the evaluator; registered models ride the same machinery.
MODEL_REGISTRY: dict[str, dict] = {}


def register_model(
    name: str,
    score_leaf,
    default_op: str = "#sum",
    combine: dict[str, str] | None = None,
) -> None:
    low = name.lower()
    MODEL_REGISTRY[low] = {
        "score_leaf": score_leaf,
        "combine": combine or {"#sum": "sum", "#and": "min", "#or": "max",
                               "#wsum": "sum", "#wand": "min"},
    }
    DEFAULT_OP[low] = default_op


def _tfidf_leaf(tf, dl, stats, params):
    """Classic TF-IDF leaf (the Lucene ClassicSimilarity lineage,
    simplified: raw tf × ln(N/df), no length/query norms — the textbook
    fifth model shipped through the registry rather than a new ladder).
    The idf is MODEL-SIZED scalar libm ``math.log`` (the repo's bit-exact
    float rule: DuckDB ``ln`` is libm too, numpy's SIMD log is not), then
    one vectorized multiply over the per-doc tf array."""
    import math

    return math.log(stats.n_docs / max(1, stats.df)) * tf


#: tfidf ships as a built-in REGISTERED model: it exists to prove the
#: extension surface end-to-end (register -> parse -> sharded actor-pool
#: serving -> driver hash gate se_tfidf), so it deliberately rides the
#: generic registered-model reducers, never the built-in ladders.
register_model(
    "tfidf", _tfidf_leaf, default_op="#sum",
    combine={"#sum": "sum", "#and": "min", "#or": "max"},
)


def _lmjm_leaf(tf, dl, stats, params):
    """LM Jelinek-Mercer smoothing (the Lucene LMJelinekMercerSimilarity
    lineage) served in the EXP DOMAIN: the true LMJM term score is
    ``ln(1 + ((1-λ)·tf/dl) / (λ·ctf/C))`` and Lucene sums it over matching
    terms only — but a per-document ``ln`` is a SIMD numpy transcendental
    that drifts 1 ULP from libm on ~24% of inputs (measured on this box),
    so instead the leaf returns the log's ARGUMENT and the model combines
    with the ``prod`` reducer: score = Π(1 + x_t) = exp(Σ ln(1+x_t)), a
    strictly monotone transform of the Lucene score, so rankings are
    identical and every op on the corpus path is rational IEEE arithmetic
    (+ * /) that DuckDB replays bit-for-bit. λ rides the Indri:lambda
    param (ModelParams.lam, default 0.01); the per-term collection
    probability ctf/C is a MODEL-SIZED scalar computed once in Python."""
    lam = params.lam
    denom = lam * (stats.ctf / stats.sum_len)
    return 1.0 + ((1.0 - lam) * (tf / dl)) / denom


#: lmjm: #SUM composes multiplicatively (the exp-domain of the Lucene sum
#: over matching terms; unmatched terms contribute the multiplicative
#: identity 1.0 exactly as Lucene contributes an additive 0); #OR keeps the
#: max-of-matching disjunction. No conjunctive map — #AND raises like the
#: reference's unsupported-operator ladders.
register_model(
    "lmjm", _lmjm_leaf, default_op="#sum",
    combine={"#sum": "prod", "#or": "max"},
)


def _f2exp_leaf(tf, dl, stats, params):
    """Axiomatic F2EXP (Fang & Zhai, SIGIR 2005 "An Exploration of
    Axiomatic Approaches to Information Retrieval", eq. F2-EXP; the Lucene
    AxiomaticF2EXP similarity): score = (N/df)^k · tf/(tf + s + s·dl/avdl)
    with the published defaults s=0.5, k=0.35. The idf power is a
    MODEL-SIZED scalar via CPython's libm ``**`` (bit-equal to DuckDB
    ``pow``, verified on this box); everything per-doc is rational IEEE
    arithmetic in the exact association the oracle replays:
    ``(tf + s) + ((s·dl)/avdl)`` then ``idfk · (tf/denom)``."""
    idfk = (stats.n_docs / stats.df) ** 0.35
    avdl = stats.sum_len / stats.doc_count
    return idfk * (tf / (tf + 0.5 + 0.5 * dl / avdl))


register_model(
    "f2exp", _f2exp_leaf, default_op="#sum",
    combine={"#sum": "sum", "#and": "min", "#or": "max"},
)


@dataclass
class BuildConfig:
    """Index-build knobs; all partitioning decisions are explicit here."""

    fields: dict[str, str] = field(
        default_factory=lambda: {
            "body": "content",
            "title": "path",
            "url": "repo",
            "keywords": "lang",
        }
    )
    #: doc-range salt: postings for one term are split into rows per
    #: ``doc_id // doc_bucket_size`` so a hot term ("the"-scale skew at
    #: 10^12 files) never forms one giant shuffle group; buckets are
    #: doc-ranges, so concatenating them in bucket order preserves the
    #: docid-ascending postings invariant with no re-sort.
    doc_bucket_size: int = 1 << 16
    #: per-block skip/block-max granularity inside one postings row
    skip_block_docs: int = 128
    #: independent build partitions (resume granularity); each covers a
    #: doc_id range and writes its own manifest entry.
    num_partitions: int = 1
    #: hash partitions of the (field, term, bucket) key space for the
    #: posting-merge shuffle; each becomes ONE vectorized encode call.
    #: Size ~2x cluster cores so the merge stage saturates without
    #: per-group dispatch overhead.
    merge_partitions: int = 64
    #: materialize each build partition's corpus before tokenizing. Default
    #: OFF — the build is now a single fused pass (tokenize emits postings
    #: and writes the docmap as a side output), so nothing re-reads the
    #: corpus; a materialized 100k+-doc corpus just pins the object store
    #: and its async GC steals cycles from the next stage (measured: the
    #: query pool ran 6x slower right after a materialized build).
    materialize_partition: bool = False
    tokenize_batch_size: int = 1024
    #: analyzer profile: "none" (HW6, `QryParser.java:48-50`) or "porter"
    #: (the HW1-5 stemmed profiles, KSTEM there; see stem.py). Recorded in
    #: stats.json so query-side analysis stems identically.
    stemmer: str = "none"
