"""Learning-to-rank (reference HW4 ``RetrievalModelLeToR``,
`Homeworks/HW6/QryEval/RetrievalModelLeToR.java`).

The reference builds an 18-slot feature vector per (query, judged doc)
(`RetrievalModelLeToR.java:42-96`), min-max normalizes per query with a
missing-value marker (`:213-244`), shells out to svm_rank to train/score,
and re-sorts the BM25 top-N by model score (`:365-484`).

Re-homed on the code corpus and in-repo:

- the external svm_rank binaries are replaced by an in-repo pairwise linear
  ranker (RankSVM-style hinge objective, seeded SGD) — same pipeline shape,
  no external process;
- document attributes that don't exist for code (spamScore, PageRank,
  wikipedia flag, date) become corpus-derivable analogs (body length, path
  depth, test-path flag, repo-name length, lang ordinal) — slot-compatible,
  feature registry below;
- f5..f16 are exactly the reference's BM25 / Indri / term-overlap scores
  per field (body,title,url,keywords), computed vectorized from the index;
- f18 is the reference's posStd (stddev of query-term positions, with its
  ``+0.1`` denominator quirk, `RetrievalModelLeToR.java:98-123`).

Missing features use NaN (the reference's Double.MIN_VALUE marker): skipped
by min/max, then treated as absent (0) by the linear model — matching the
svm_light line-skipping behavior.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from .analyze import analyze_query_token
from .config import ModelParams
from .indexio import InvertedIndex

FIELDS = ("body", "title", "url", "keywords")
N_FEATURES = 18


@dataclass
class LetorConfig:
    k1: float = 1.2
    b: float = 0.75
    mu: float = 1500.0
    lam: float = 0.01
    epochs: int = 30
    lr: float = 0.05
    seed: int = 42
    feature_disable: frozenset = field(default_factory=frozenset)  # 1-based ids
    # external svm_rank binaries (`RetrievalModelLeToR.java:339-342,
    # 423-426`): when both paths point at existing executables,
    # make_ranker() shells out through the byte-exact svm_light files
    # instead of the in-repo LinearRanker. Reference param names:
    # letor:svmRankLearnPath / letor:svmRankClassifyPath /
    # letor:svmRankParamC (see letor_config_from_params).
    svm_rank_learn_path: "str | None" = None
    svm_rank_classify_path: "str | None" = None
    svm_c: float = 0.001  # letor:svmRankParamC default (LeToR.java:72)


def letor_config_from_params(params: dict, **overrides) -> "LetorConfig":
    """Build a LetorConfig from a reference-style flat param dict
    (``config.read_param_file``), honoring the reference's letor:* keys
    (`RetrievalModelLeToR.java:60-90`)."""
    disable = frozenset(
        int(x)
        for x in params.get("letor:featureDisable", "").split(",")
        if x.strip()
    )
    kw = dict(
        k1=float(params.get("BM25:k_1", 1.2)),
        b=float(params.get("BM25:b", 0.75)),
        mu=float(params.get("Indri:mu", 1500.0)),
        lam=float(params.get("Indri:lambda", 0.01)),
        feature_disable=disable,
        svm_rank_learn_path=params.get("letor:svmRankLearnPath"),
        svm_rank_classify_path=params.get("letor:svmRankClassifyPath"),
        svm_c=float(params.get("letor:svmRankParamC", 0.001)),
    )
    kw.update(overrides)
    return LetorConfig(**kw)


def _query_terms(query: str, stemmer=None) -> list[str]:
    out = []
    for tok in query.split():
        out.extend(analyze_query_token(tok, stemmer))
    return out


class Featurizer:
    def __init__(self, index: InvertedIndex, docmap_extra: dict | None = None):
        from .stem import get_stemmer

        self.index = index
        #: optional doc_id -> dict with 'path', 'repo', 'lang' for the
        #: attribute-analog features (from the corpus/docmap)
        self.extra = docmap_extra or {}
        #: query analysis must use the index's analyzer profile, or every
        #: term-dependent feature silently zeroes on a stemmed index
        self._stemmer = get_stemmer(index.stemmer_name)

    def _scores_for_field(self, terms, docs, fld, cfg: LetorConfig):
        """(bm25, indri, overlap) arrays over candidate docs, vectorized."""
        idx = self.index
        n_cand = len(docs)
        bm25 = np.zeros(n_cand)
        indri = np.ones(n_cand)
        matched = np.zeros(n_cand)
        any_posting = False
        dl = idx.doclen(fld, docs).astype(np.float64)
        N = float(idx.num_docs)
        dc = idx.doc_count(fld)
        if dc == 0:
            return np.full(n_cand, np.nan), np.full(n_cand, np.nan), np.full(n_cand, np.nan)
        ave = float(idx.sum_field_lengths(fld)) / float(dc)
        clen = float(idx.sum_field_lengths(fld))
        for t in terms:
            p = idx.postings(fld, t, need_positions=False)
            tf = np.zeros(n_cand)
            if p.df:
                any_posting = True
                pos = np.searchsorted(p.doc_ids, docs)
                pos_c = np.clip(pos, 0, p.df - 1)
                hit = p.doc_ids[pos_c] == docs
                tf[hit] = p.tfs[pos_c[hit]].astype(np.float64)
            idf = max(0.0, math.log((N - p.stat_df + 0.5) / (p.stat_df + 0.5)))
            bm25 += idf * tf / (tf + cfg.k1 * (1 - cfg.b + cfg.b * dl / ave))
            ctf_eff = float(p.stat_ctf) if p.stat_ctf >= 1 else 0.5
            prob = ctf_eff / clen
            indri *= (1 - cfg.lam) * (tf + cfg.mu * prob) / (dl + cfg.mu) + cfg.lam * prob
            matched += (tf > 0).astype(np.float64)
        k = max(1, len(terms))
        indri = np.power(indri, 1.0 / k)
        overlap = matched / k
        if not any_posting:
            return np.full(n_cand, np.nan), np.full(n_cand, np.nan), np.zeros(n_cand)
        # docs with NO matching term: reference's score fns return 0 for
        # bm25/overlap; indri still produces the default-product
        return bm25, indri, overlap

    def _pos_std(self, terms, docs) -> np.ndarray:
        """stddev of query-term positions in body, with the reference's
        ``/(n+0.1)`` quirk (`RetrievalModelLeToR.java:98-123`)."""
        idx = self.index
        out = np.zeros(len(docs))
        per_doc_pos: dict[int, list] = {int(d): [] for d in docs}
        # sorted: python set order is hash-randomized per process, which
        # would reorder the float accumulation below across runs
        for t in sorted(set(terms)):
            p = idx.postings("body", t)
            if not p.df:
                continue
            pos = np.searchsorted(p.doc_ids, docs)
            pos_c = np.clip(pos, 0, p.df - 1)
            hit = p.doc_ids[pos_c] == docs
            for j in np.flatnonzero(hit):
                i = pos_c[j]
                per_doc_pos[int(docs[j])].extend(
                    p.positions[p.pos_offsets[i] : p.pos_offsets[i + 1]].tolist()
                )
        for j, d in enumerate(docs):
            pos = per_doc_pos[int(d)]
            n = len(pos)
            mean = sum(pos) / (n + 0.1)
            var = sum((x - mean) ** 2 for x in pos) / (n + 0.1)
            out[j] = math.sqrt(var)
        return out

    def features(self, query: str, docs: np.ndarray, cfg: LetorConfig) -> np.ndarray:
        terms = _query_terms(query, self._stemmer)
        n = len(docs)
        F = np.full((n, N_FEATURES), np.nan)
        dl_body = self.index.doclen("body", docs).astype(np.float64)
        F[:, 0] = dl_body  # f1: body length (spamScore analog)
        for j, d in enumerate(docs):
            ex = self.extra.get(int(d), {})
            path = ex.get("path", "")
            F[j, 1] = path.count("/")  # f2: path depth (url-slash analog)
            F[j, 2] = 1.0 if "test" in path else 0.0  # f3: wikipedia analog
            F[j, 3] = float(len(ex.get("repo", "")))  # f4: PageRank analog
            F[j, 16] = float(ex.get("lang_ord", np.nan))  # f17: date analog
        for i, fld in enumerate(FIELDS):
            b, ind, ov = self._scores_for_field(terms, docs, fld, cfg)
            F[:, 4 + 3 * i] = b
            F[:, 5 + 3 * i] = ind
            F[:, 6 + 3 * i] = ov
        F[:, 17] = self._pos_std(terms, docs)  # f18
        return F


def normalize_per_query(F: np.ndarray) -> np.ndarray:
    """Per-query min-max to [0,1]; NaN = missing, skipped then zeroed
    (`RetrievalModelLeToR.java:213-244` + svm_line skipping)."""
    out = F.copy()
    with np.errstate(all="ignore"):
        mn = np.nanmin(F, axis=0)
        mx = np.nanmax(F, axis=0)
    span = mx - mn
    for j in range(F.shape[1]):
        col = out[:, j]
        if np.isnan(mn[j]) or span[j] == 0:
            continue
        mask = ~np.isnan(col)
        col[mask] = (col[mask] - mn[j]) / span[j]
    return np.nan_to_num(out, nan=0.0)


# ---------------------------------------------------------------------------
# svm_light / svm_rank file formats (the reference's external-binary
# interface; `RetrievalModelLeToR.java:246-257, 276-334, 383-451`). The
# in-repo LinearRanker below stays the default trainer — these writers/
# readers exist so a user replaying HW4 experiments against real
# svm_rank_learn/svm_rank_classify can round-trip the files.
# ---------------------------------------------------------------------------


def svm_line(
    label: str,
    qid: str,
    feat: np.ndarray,
    comment: str,
    disable: frozenset = frozenset(),
) -> str:
    """One svm_light feature line, byte-layout-identical to the reference's
    ``svm_line`` (`RetrievalModelLeToR.java:246-257`): ``label qid:Q `` then
    ``j:value `` per 1-based feature (disabled ids and missing values — our
    NaN, the reference's Double.MIN_VALUE marker — are SKIPPED, not zeroed),
    then `` # comment`` (the reference's trailing-space + ``" # "`` gives
    the double space). Values render via repr() — shortest round-trip
    decimal, the same contract as Java's Double.toString for the magnitudes
    features take."""
    parts = [f"{label} qid:{qid} "]
    for j, v in enumerate(feat, start=1):
        if j in disable or np.isnan(v):
            continue
        parts.append(f"{j}:{float(v)!r} ")
    parts.append(f" # {comment}\n")
    return "".join(parts)


def write_svm_features(
    path: str,
    rows: "list[tuple[str, str, np.ndarray, str]]",
    disable: frozenset = frozenset(),
) -> None:
    """Write (label, qid, feature-vector, comment) rows as an svm_light
    feature file (the reference's trainingFeatureVectorsFile /
    testingFeatureVectorsFile, `RetrievalModelLeToR.java:276-334, 383-416`).
    Training callers pass label = str(relevance + 3) like the reference;
    test callers pass "0"."""
    with open(path, "w") as f:
        for label, qid, feat, comment in rows:
            f.write(svm_line(label, qid, np.asarray(feat, dtype=float), comment, disable))


def read_svm_features(
    path: str,
) -> "list[tuple[str, str, dict[int, float], str]]":
    """Parse an svm_light feature file back to (label, qid, {1-based id:
    value}, comment) rows — the round-trip inverse of write_svm_features
    (absent ids stay absent: missing features were skipped at write)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line.strip():
                continue
            body, _, comment = line.partition("#")
            toks = body.split()
            label = toks[0]
            assert toks[1].startswith("qid:"), toks[1]
            qid = toks[1][4:]
            feats = {}
            for tk in toks[2:]:
                j, _, v = tk.partition(":")
                feats[int(j)] = float(v)
            out.append((label, qid, feats, comment.strip()))
    return out


def read_svm_scores(path: str) -> "list[float]":
    """svm_rank_classify score file: one float per line, positionally
    aligned with the test feature file's rows
    (`RetrievalModelLeToR.java:443-451`)."""
    with open(path) as f:
        return [float(line) for line in f if line.strip()]


class LinearRanker:
    """Pairwise hinge-loss linear ranker (in-repo svm_rank replacement)."""

    def __init__(self, cfg: LetorConfig):
        self.cfg = cfg
        self.w = np.zeros(N_FEATURES)

    def fit(self, groups: list[tuple[np.ndarray, np.ndarray]]) -> None:
        """groups: per query (features NxF normalized, relevance labels N)."""
        rng = np.random.default_rng(self.cfg.seed)
        pairs = []
        for F, y in groups:
            for i in range(len(y)):
                for j in range(len(y)):
                    if y[i] > y[j]:
                        pairs.append(F[i] - F[j])
        if not pairs:
            return
        X = np.vstack(pairs)
        w = np.zeros(X.shape[1])
        for _ in range(self.cfg.epochs):
            order = rng.permutation(len(X))
            for i in order:
                if X[i] @ w < 1.0:  # hinge margin
                    w += self.cfg.lr * X[i]
        disable = {d - 1 for d in self.cfg.feature_disable}
        for d in disable:
            w[d] = 0.0
        self.w = w

    def score(self, F: np.ndarray) -> np.ndarray:
        return F @ self.w


class SvmRankRanker:
    """External svm_rank driver, same interface as :class:`LinearRanker`.

    Replays the reference's subprocess flow through the byte-exact
    svm_light files: ``svm_rank_learn -c C train model``
    (`RetrievalModelLeToR.java:339-342`) at fit time and
    ``svm_rank_classify test model scores``
    (`RetrievalModelLeToR.java:423-426`) at score time, with NaN missing
    values skipped in the feature lines and scores read back positionally
    (`:443-451`). Construct via :func:`make_ranker`, which falls back to
    LinearRanker when the binaries are absent (this container has none)."""

    def __init__(self, cfg: LetorConfig, workdir: "str | None" = None):
        import tempfile

        if not (cfg.svm_rank_learn_path and cfg.svm_rank_classify_path):
            raise ValueError(
                "SvmRankRanker needs letor:svmRankLearnPath and "
                "letor:svmRankClassifyPath"
            )
        self.cfg = cfg
        if workdir is None:
            workdir = tempfile.mkdtemp(prefix="svmrank_")
        else:
            import os

            os.makedirs(workdir, exist_ok=True)
        self.workdir = workdir
        self.model_path = f"{self.workdir}/model.dat"

    def _run(self, argv: list[str]) -> None:
        import subprocess

        r = subprocess.run(argv, capture_output=True, text=True)
        if r.returncode != 0:
            raise RuntimeError(
                f"{argv[0]} failed ({r.returncode}): "
                f"{(r.stderr or r.stdout).strip()[:500]}"
            )

    def fit(self, groups: "list[tuple[np.ndarray, np.ndarray]]") -> None:
        """groups: per query (features NxF normalized, relevance labels N).
        Labels write as str(relevance + 3) like the reference's training
        vectors (`RetrievalModelLeToR.java:276-334`)."""
        rows = []
        for qi, (F, y) in enumerate(groups, start=1):
            for r, (label, feat) in enumerate(zip(y, F)):
                rows.append((str(int(label) + 3), str(qi), feat, f"doc{r}"))
        train = f"{self.workdir}/train.dat"
        write_svm_features(train, rows, self.cfg.feature_disable)
        self._run(
            [self.cfg.svm_rank_learn_path, "-c", str(self.cfg.svm_c),
             train, self.model_path]
        )

    def score(self, F: np.ndarray) -> np.ndarray:
        rows = [("0", "1", feat, f"doc{r}") for r, feat in enumerate(F)]
        test = f"{self.workdir}/test.dat"
        scores = f"{self.workdir}/scores.dat"
        write_svm_features(test, rows, self.cfg.feature_disable)
        self._run(
            [self.cfg.svm_rank_classify_path, test, self.model_path, scores]
        )
        s = read_svm_scores(scores)
        if len(s) != len(F):
            raise RuntimeError(
                f"svm_rank_classify returned {len(s)} scores for "
                f"{len(F)} rows (positional contract broken)"
            )
        return np.asarray(s, dtype=float)


def make_ranker(cfg: LetorConfig, workdir: "str | None" = None):
    """The reference's ranker selection, environment-aware: external
    svm_rank when BOTH configured binaries exist and are executable, else
    the in-repo LinearRanker (this container ships no svm_rank)."""
    import os

    lp, cp = cfg.svm_rank_learn_path, cfg.svm_rank_classify_path
    if (
        lp and cp
        and os.path.isfile(lp) and os.access(lp, os.X_OK)
        and os.path.isfile(cp) and os.access(cp, os.X_OK)
    ):
        return SvmRankRanker(cfg, workdir=workdir)
    return LinearRanker(cfg)


def rerank(
    index: InvertedIndex,
    featurizer: Featurizer,
    ranker: LinearRanker,
    query: str,
    initial: list[tuple[int, float]],
    cfg: LetorConfig,
) -> list[tuple[int, float]]:
    """Re-sort the initial ranking by model score (desc, extid asc on ties,
    `RetrievalModelLeToR.java:461-484`)."""
    docs = np.array([d for d, _ in initial], dtype=np.int64)
    F = normalize_per_query(featurizer.features(query, docs, cfg))
    scores = ranker.score(F)
    ext = index.external_ids(docs)
    order = np.lexsort((ext.astype(str), -scores))
    return [(int(docs[i]), float(scores[i])) for i in order]
