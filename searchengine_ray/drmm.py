"""Neural reranking, DRMM-style (reference HW6 ``RetrievalModelDRMM``,
`Homeworks/HW6/QryEval/RetrievalModelDRMM.java` + `MLP.java`).

Pipeline shape ported exactly; jblas becomes numpy:

- per (query, doc): for each query term, cosine similarities of its vector
  against every doc-term vector -> a matching histogram with the reference's
  binning ``floor((s+1)/1.99999*(nBins-1))``, top bin for s >= 0.99999, then
  log of nonzero counts (`RetrievalModelDRMM.java:587-614`);
- query-term gate = softmax over term idfs (`:475-478`);
- scorer = small MLP (nbins -> hidden -> 1, tanh), pairwise hinge loss,
  adagrad, seeded shuffling (`:192-270`, `MLP.java:51-99`);
- training pairs sampled (rel, nonrel) per query from qrels with a seeded
  RNG (`:484-511`); rerank = score top-N of the initial ranking, re-sort.

Term vectors: the course's word2vec file (`IdxWordvec.java`) is not
available, so term vectors are DETERMINISTIC seeded unit vectors derived
from a hash of the term (documented synthetic stand-in; the plumbing —
batched featurization, actor-friendly scorer state, seeded training — is
the real deliverable). Inference runs as a stateful batch scorer suitable
for ``map_batches(DrmmScorer, concurrency=N)``.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass

import numpy as np

from .analyze import STOPWORDS, analyze_query_token, tokenize
from .indexio import InvertedIndex


#: activation registry (the reference's Activation zoo — `Tanh.java`,
#: `ReLU.java`, `Sigmoid.java`, `Identity.java`): name -> (forward,
#: derivative-from-activation-output), matching the reference's
#: derivative() computed from the stored forward state.
ACTIVATIONS: dict = {
    "tanh": (np.tanh, lambda a: 1.0 - a**2),
    "relu": (lambda x: np.maximum(x, 0.0), lambda a: (a > 0).astype(float)),
    "sigmoid": (lambda x: 1.0 / (1.0 + np.exp(-x)), lambda a: a * (1.0 - a)),
    "identity": (lambda x: x, lambda a: np.ones_like(a)),
}


def register_activation(name: str, forward, derivative) -> None:
    """Extension point mirroring the reference's pluggable Activation list
    (`MLP.java:28-49`): ``derivative`` takes the forward OUTPUT."""
    ACTIVATIONS[name] = (forward, derivative)


def _hinge(margin: float, sp: float, sn: float) -> tuple[float, float]:
    """Pairwise hinge (`HingeLoss.java`): loss = max(0, margin - (s+ - s-));
    returns (loss, dloss/ds+) — dloss/ds- is its negation."""
    loss = max(0.0, margin - (sp - sn))
    return loss, (-1.0 if loss > 0.0 else 0.0)


def _logistic(margin: float, sp: float, sn: float) -> tuple[float, float]:
    """Pairwise logistic (RankNet-style): loss = log(1 + exp(-(s+ - s-)));
    smooth criterion analog of the reference's Criterion surface
    (`Criterion.java`, `SoftmaxCrossEntropy.java` is the classification
    form of the same two-class cross-entropy)."""
    d = sp - sn
    loss = float(np.log1p(np.exp(-d)))
    return loss, float(-1.0 / (1.0 + np.exp(d)))


#: criterion registry: name -> (margin, s_pos, s_neg) -> (loss, dL/ds_pos)
CRITERIA: dict = {"hinge": _hinge, "logistic": _logistic}


@dataclass
class DrmmConfig:
    dim: int = 64
    n_bins: int = 10
    hidden: int = 5
    epochs: int = 20
    lr: float = 0.05
    n_pairs: int = 500
    seed: int = 7
    #: HW6 defaults (tanh + hinge margin 1) reproduce the original
    #: hardcoded MLP bit-for-bit; any ACTIVATIONS/CRITERIA key plugs in
    activation: str = "tanh"
    criterion: str = "hinge"
    margin: float = 1.0


class TermVectors:
    """Deterministic per-term unit vectors (word2vec stand-in): the vector
    for a term is seeded by a stable hash of the term string."""

    def __init__(self, dim: int = 64):
        self.dim = dim
        self._cache: dict[str, np.ndarray] = {}

    def get(self, term: str) -> np.ndarray:
        v = self._cache.get(term)
        if v is None:
            seed = int.from_bytes(hashlib.md5(term.encode()).digest()[:8], "big")
            rng = np.random.default_rng(seed)
            v = rng.standard_normal(self.dim)
            v /= np.linalg.norm(v)
            self._cache[term] = v
        return v

    def matrix(self, terms: list[str]) -> np.ndarray:
        if not terms:
            return np.zeros((0, self.dim))
        return np.vstack([self.get(t) for t in terms])


def histogram(
    sims: np.ndarray, n_bins: int, weights: "np.ndarray | None" = None
) -> np.ndarray:
    """Reference binning + log of nonzero counts
    (`RetrievalModelDRMM.java:587-614`). ``weights`` lets the caller pass
    one sim per UNIQUE term weighted by its occurrence count — integer
    weights sum exactly, so the bin totals are bit-identical to the
    per-occurrence form at ~#occurrences/#unique the cost."""
    counts = np.zeros(n_bins)
    if len(sims):
        w = np.ones(len(sims)) if weights is None else weights
        bins = np.floor((sims + 1.0) / 1.99999 * (n_bins - 1)).astype(int)
        bins[sims >= 0.99999] = n_bins - 1
        bins = np.clip(bins, 0, n_bins - 1)
        np.add.at(counts, bins, w)
    out = np.zeros(n_bins)
    nz = counts > 0
    out[nz] = np.log(counts[nz])
    return out


class MLP:
    """nbins -> hidden -> 1, adagrad on a pairwise criterion. Activation
    and criterion are pluggable via the ACTIVATIONS/CRITERIA registries
    (`MLP.java:112-160` + the Activation/Criterion zoo); the HW6 defaults
    (tanh, hinge margin 1) keep the original behavior bit-for-bit."""

    def __init__(self, cfg: DrmmConfig):
        rng = np.random.default_rng(cfg.seed)
        self.W1 = rng.standard_normal((cfg.n_bins, cfg.hidden)) * 0.3
        self.b1 = np.zeros(cfg.hidden)
        self.W2 = rng.standard_normal(cfg.hidden) * 0.3
        self.b2 = 0.0
        self.cfg = cfg
        self._act, self._dact = ACTIVATIONS[cfg.activation]
        self._crit = CRITERIA[cfg.criterion]
        self._g = [np.full_like(self.W1, 1e-8), np.full_like(self.b1, 1e-8),
                   np.full_like(self.W2, 1e-8), 1e-8]

    def save(self, path: str) -> None:
        """Weight checkpoint (the reference's text dump, `MLP.java:112-160`,
        as an npz)."""
        np.savez(path, W1=self.W1, b1=self.b1, W2=self.W2, b2=np.array(self.b2))

    def load(self, path: str) -> None:
        z = np.load(path)
        self.W1, self.b1 = z["W1"], z["b1"]
        self.W2, self.b2 = z["W2"], float(z["b2"])

    def forward(self, x: np.ndarray) -> float:
        h = self._act(x @ self.W1 + self.b1)
        return float(h @ self.W2 + self.b2)

    def score_terms(self, F: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Per-term forwards: F (n_terms x n_bins) -> (outputs, hidden)."""
        H = self._act(F @ self.W1 + self.b1)
        return H @ self.W2 + self.b2, H

    def step_pair(
        self,
        F_pos: np.ndarray,
        g_pos: np.ndarray,
        F_neg: np.ndarray,
        g_neg: np.ndarray,
    ) -> float:
        """Hinge max(0, 1 - (s+ - s-)) where s = sum_i gate_i * mlp(F_i) —
        the SAME per-term-forward + weighted-sum form used at rerank time
        (the reference trains and tests through mlp.forward per term +
        wtdSum, `RetrievalModelDRMM.java:101-112, 233-252, 270-275`);
        backprop goes through every per-term forward. Adagrad update.
        """
        yp, Hp = self.score_terms(F_pos)
        yn, Hn = self.score_terms(F_neg)
        loss, coeff = self._crit(
            self.cfg.margin, float(g_pos @ yp), float(g_neg @ yn)
        )
        if coeff == 0.0:
            return loss

        def grads(F, g, H):
            # d s/dW2 = sum_i g_i h_i ; d s/dW1 = sum_i g_i x_i (W2*act'(h_i))
            gW2 = g @ H
            D = (g[:, None] * self._dact(H)) * self.W2[None, :]
            return F.T @ D, D.sum(axis=0), gW2

        gW1p, gb1p, gW2p = grads(F_pos, g_pos, Hp)
        gW1n, gb1n, gW2n = grads(F_neg, g_neg, Hn)
        # dL/ds- = -dL/ds+ for both pairwise criteria
        gW1 = coeff * (gW1p - gW1n)
        gb1 = coeff * (gb1p - gb1n)
        gW2 = coeff * (gW2p - gW2n)
        # b2's pairwise gradient is sum(g+) - sum(g-) = 0 (softmax gates)
        lr = self.cfg.lr
        self._g[0] += gW1**2
        self._g[1] += gb1**2
        self._g[2] += gW2**2
        self.W1 -= lr * gW1 / np.sqrt(self._g[0])
        self.b1 -= lr * gb1 / np.sqrt(self._g[1])
        self.W2 -= lr * gW2 / np.sqrt(self._g[2])
        return loss


class DrmmScorer:
    """Featurize + score (query, doc) pairs; per-actor state is the term
    vectors, MLP weights, and idf source — loaded once."""

    def __init__(
        self,
        index: InvertedIndex,
        cfg: DrmmConfig | None = None,
        vectors=None,
    ):
        """``vectors``: any backend with ``.get(term) -> vec | None`` and
        ``.matrix(terms)`` — the synthetic :class:`TermVectors` (default) or
        a real :class:`searchengine_ray.wordvec.Word2VecFile` database."""
        from .stem import get_stemmer

        self.cfg = cfg or DrmmConfig()
        self.vectors = vectors if vectors is not None else TermVectors(self.cfg.dim)
        self.index = index
        self.mlp = MLP(self.cfg)
        # analysis must match the index's analyzer profile (stemmed index
        # -> stemmed query terms and doc-term vectors)
        self._stemmer = get_stemmer(index.stemmer_name)

    def query_terms_and_gates(self, query: str) -> tuple[list[str], np.ndarray]:
        terms: list[str] = []
        for tok in query.split():
            terms.extend(analyze_query_token(tok, self._stemmer))
        # terms without a vector drop out of the query matrix, like the
        # reference's null checks (`RetrievalModelDRMM.java:295-303`)
        terms = [t for t in terms if self.vectors.get(t) is not None]
        if not terms:
            return [], np.zeros(0)
        N = float(self.index.num_docs)
        idfs = []
        for t in terms:
            df = self.index.postings("body", t).stat_df
            idfs.append(math.log((N + 1.0) / (df + 1.0)))
        e = np.exp(np.asarray(idfs))
        return terms, e / e.sum()

    def doc_term_counts(self, text: str) -> tuple[list[str], np.ndarray]:
        """Unique doc terms + occurrence counts, stopword-filtered and
        stemmed per the index profile; terms without a vector drop out
        (the reference's null checks, `RetrievalModelDRMM.java:295-303`)."""
        toks = [t for t in tokenize(text) if t not in STOPWORDS]
        if self._stemmer is not None:
            toks = [self._stemmer(t) for t in toks]
        toks = [t for t in toks if self.vectors.get(t) is not None]
        if not toks:
            return [], np.zeros(0)
        terms, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        return [str(t) for t in terms], counts.astype(np.float64)

    def features(
        self, query_terms: list[str], doc_terms: list[str], doc_counts: np.ndarray
    ) -> np.ndarray:
        """(n_query_terms x n_bins) histogram features. Cosine sims are
        computed per UNIQUE doc term with a shape-independent kernel
        ((M * qv).sum(axis=1): each row reduces independently over the
        fixed dim), so sim(q, t) is a bitwise-stable function of the two
        vectors alone — the property the weight-literal SQL oracle relies
        on — and the histogram weighs each term by its occurrence count."""
        out = np.zeros((len(query_terms), self.cfg.n_bins))
        if not doc_terms:
            return out
        M = self.vectors.matrix(doc_terms)
        for i, qt in enumerate(query_terms):
            qv = self.vectors.get(qt)
            sims = (M * qv[None, :]).sum(axis=1)  # unit vectors -> cosine
            out[i] = histogram(sims, self.cfg.n_bins, weights=doc_counts)
        return out

    def score(
        self,
        query_terms: list[str],
        gates: np.ndarray,
        doc_terms: list[str],
        doc_counts: np.ndarray,
    ) -> float:
        feats = self.features(query_terms, doc_terms, doc_counts)
        return float(
            sum(g * self.mlp.forward(f) for g, f in zip(gates, feats))
        )

    # -- training --
    def train(
        self,
        queries: dict[str, str],
        qrels: dict[str, dict[int, int]],
        doc_texts: dict[int, str],
    ) -> list[float]:
        """Sample (rel, nonrel) pairs per the reference's seeded rejection
        sampling, train the MLP; returns per-epoch mean losses."""
        rng = np.random.default_rng(self.cfg.seed)
        gate_cache = {
            qid: self.query_terms_and_gates(queries[qid])
            for qid in queries
            if qid in qrels
        }
        pairs: list[tuple[str, int, int]] = []
        qids = sorted(gate_cache)
        tries = 0
        while len(pairs) < self.cfg.n_pairs and tries < self.cfg.n_pairs * 20:
            tries += 1
            qid = qids[int(rng.integers(len(qids)))]
            judged = [d for d in sorted(qrels[qid]) if d in doc_texts]
            if len(judged) < 2:
                continue
            d1 = judged[int(rng.integers(len(judged)))]
            d2 = judged[int(rng.integers(len(judged)))]
            r1, r2 = qrels[qid][d1], qrels[qid][d2]
            if r1 == r2:
                continue  # rejection sampling until rel1 != rel2 (:484-511)
            if r1 < r2:
                d1, d2 = d2, d1
            pairs.append((qid, d1, d2))
        return self._run_epochs(pairs, gate_cache, doc_texts, rng)

    def train_pairs_from_file(
        self,
        sample_file: str,
        queries: dict[str, str],
        qrels: dict[str, dict[int, int]],
        doc_texts: dict[int, str],
        ext2id: dict[str, int],
    ) -> list[float]:
        """The reference's ``drmm:sampleFile`` replay path
        (`RetrievalModelDRMM.java:277-427`): each line is
        ``qid,externalId1,externalId2`` (comma or space separated); the pair
        is ordered by qrels relevance (missing -> 0), TIES keeping the
        reference's `else` branch order (doc2 first). Training then runs the
        usual seeded epoch shuffle, so a committed pair file reproduces
        training exactly.
        """
        import re

        rng = np.random.default_rng(self.cfg.seed)
        gate_cache: dict[str, tuple[list[str], np.ndarray]] = {}
        pairs: list[tuple[str, int, int]] = []
        with open(sample_file) as f:
            for line in f:
                parts = [p for p in re.split(r"[,\s]+", line.strip()) if p]
                if len(parts) < 3:
                    continue
                qid, e1, e2 = parts[0], parts[1], parts[2]
                if qid not in queries or e1 not in ext2id or e2 not in ext2id:
                    continue
                d1, d2 = ext2id[e1], ext2id[e2]
                if d1 not in doc_texts or d2 not in doc_texts:
                    continue
                rel = qrels.get(qid, {})
                r1, r2 = rel.get(d1, 0), rel.get(d2, 0)
                if qid not in gate_cache:
                    gate_cache[qid] = self.query_terms_and_gates(queries[qid])
                # reference: `if (rel1 > rel2) (d1,d2) else (d2,d1)` — a tie
                # lands in the else branch (`RetrievalModelDRMM.java:392-398`)
                pairs.append((qid, d1, d2) if r1 > r2 else (qid, d2, d1))
        return self._run_epochs(pairs, gate_cache, doc_texts, rng)

    def _run_epochs(
        self,
        pairs: list[tuple[str, int, int]],
        gate_cache: dict[str, tuple[list[str], np.ndarray]],
        doc_texts: dict[int, str],
        rng: np.random.Generator,
    ) -> list[float]:
        feats_cache: dict[tuple[str, int], np.ndarray] = {}

        def feat(qid: str, d: int) -> np.ndarray:
            key = (qid, d)
            if key not in feats_cache:
                terms, _ = gate_cache[qid]
                feats_cache[key] = self.features(
                    terms, *self.doc_term_counts(doc_texts[d])
                )
            return feats_cache[key]

        losses = []
        for _ in range(self.cfg.epochs):
            order = rng.permutation(len(pairs))  # seeded epoch shuffle (:229)
            tot = 0.0
            for i in order:
                qid, dp, dn = pairs[i]
                g = gate_cache[qid][1]
                tot += self.mlp.step_pair(feat(qid, dp), g, feat(qid, dn), g)
            losses.append(tot / max(1, len(pairs)))
        return losses

    def rerank(
        self,
        qid: str,
        query: str,
        initial: list[tuple[int, float]],
        doc_texts: dict[int, str],
    ) -> list[tuple[int, float]]:
        terms, gates = self.query_terms_and_gates(query)
        scored = []
        for d, _ in initial:
            s = self.score(terms, gates, *self.doc_term_counts(doc_texts[d]))
            scored.append((d, s))
        ext = self.index.external_ids(np.array([d for d, _ in scored]))
        order = np.lexsort((ext.astype(str), -np.array([s for _, s in scored])))
        return [scored[i] for i in order]
