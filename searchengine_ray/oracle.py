"""Pure-Python reference oracle: deliberately naive, document-at-a-time,
scalar re-implementation of the reference engine's exact semantics
(SURVEY.md §5 test plan).

Completely independent of the Ray index/query stack (no posting lists, no
numpy vectorization): documents are token-position dicts, every operator is
evaluated per document with plain Python loops mirroring the reference's
iterator algorithms (`QryIopNear.java:27-83`, `QryIopWindow.java:27-77`,
`QryIopSyn.java:25-71`, QrySop* getScore methods). Pytest asserts the Ray
engine reproduces the oracle rank-identically with scores to <=1e-10.

Shares only the analyzer and parser with the engine — those define the query
language itself.
"""

from __future__ import annotations

import math

import pandas as pd
import pyarrow as pa

from .analyze import STOPWORDS, analyze_query_token, tokenize
from .config import DEFAULT_OP, ModelParams
from .corpus import DEFAULT_FIELDS
from .qryparse import Op, Term, parse_query


class Oracle:
    def __init__(
        self,
        corpus: pa.Table,
        fields: dict[str, str] | None = None,
        stemmer: str = "none",
    ):
        from .stem import get_stemmer

        fields = fields or DEFAULT_FIELDS
        self.fields = fields
        self._stemmer = get_stemmer(stemmer)
        n = corpus.num_rows
        ids = corpus.column("doc_id").to_pylist()
        repo = corpus.column("repo").to_pylist()
        path = corpus.column("path").to_pylist()
        commit = corpus.column("commit").to_pylist()
        self.doc_ids = ids
        self.ext_ids = {
            d: f"{r}/{p}@{c}" for d, r, p, c in zip(ids, repo, path, commit)
        }
        self.positions: dict[str, dict[int, dict[str, list[int]]]] = {}
        self.doclen: dict[str, dict[int, int]] = {}
        for field, col in fields.items():
            texts = corpus.column(col).to_pylist()
            per_doc: dict[int, dict[str, list[int]]] = {}
            dl: dict[int, int] = {}
            for d, text in zip(ids, texts):
                toks = tokenize(text)
                dl[d] = len(toks)
                m: dict[str, list[int]] = {}
                for i, t in enumerate(toks):
                    if t not in STOPWORDS:
                        if self._stemmer is not None:
                            t = self._stemmer(t)
                        m.setdefault(t, []).append(i)
                per_doc[d] = m
            self.positions[field] = per_doc
            self.doclen[field] = dl
        self.n_docs = n
        self.sum_len = {
            f: sum(self.doclen[f].values()) for f in fields
        }
        self.doc_count = {
            f: sum(1 for v in self.doclen[f].values() if v > 0) for f in fields
        }

    # -- inverted-list evaluation, per doc --
    def _iop_pos(self, node, d: int) -> list[int]:
        if isinstance(node, Term):
            return self.positions[node.field][d].get(node.term, [])
        if node.name == "#syn":
            out: list[int] = []
            for a in node.args:
                out.extend(self._iop_pos(a, d))
            return sorted(out)
        plists = [self._iop_pos(a, d) for a in node.args]
        if any(not p for p in plists):
            return []
        if node.name == "#near":
            return self._near(plists, node.dist)
        if node.name == "#window":
            return self._window(plists, node.dist)
        raise ValueError(node.name)

    @staticmethod
    def _near(plists: list[list[int]], dist: int) -> list[int]:
        k = len(plists)
        ptr = [0] * k
        out: list[int] = []
        while ptr[0] < len(plists[0]):
            prev = plists[0][ptr[0]]
            ok = True
            for i in range(1, k):
                while ptr[i] < len(plists[i]) and plists[i][ptr[i]] <= prev:
                    ptr[i] += 1
                if ptr[i] >= len(plists[i]):
                    ptr[0] = len(plists[0])
                    ok = False
                    break
                cur = plists[i][ptr[i]]
                if cur - prev > dist:
                    ptr[0] += 1
                    ok = False
                    break
                prev = cur
            if ok:
                out.append(plists[k - 1][ptr[k - 1]])
                for i in range(k):
                    ptr[i] += 1
        return out

    @staticmethod
    def _window(plists: list[list[int]], dist: int) -> list[int]:
        k = len(plists)
        ptr = [0] * k
        out: list[int] = []
        while all(ptr[i] < len(plists[i]) for i in range(k)):
            locs = [plists[i][ptr[i]] for i in range(k)]
            mn, mx = min(locs), max(locs)
            if mx - mn < dist:
                out.append(mx)
                for i in range(k):
                    ptr[i] += 1
            else:
                for i in range(k):
                    while ptr[i] < len(plists[i]) and plists[i][ptr[i]] <= mn:
                        ptr[i] += 1
        return out

    # -- derived-list corpus statistics (cached per node) --
    def _iop_stats(self, node, cache: dict) -> tuple[int, int]:
        key = id(node)
        if key not in cache:
            df = ctf = 0
            for d in self.doc_ids:
                tf = len(self._iop_pos(node, d))
                if tf:
                    df += 1
                    ctf += tf
            cache[key] = (df, ctf)
        return cache[key]

    def _iop_field(self, node) -> str:
        return node.field if isinstance(node, Term) else (node.field or "body")

    # -- score evaluation, per doc --
    def _sop(self, node, d: int, p: ModelParams, cache: dict):
        """Returns (matches, score_or_None)."""
        model = p.model
        if node.name == "#score":
            iop = node.args[0]
            pos = self._iop_pos(iop, d)
            if not pos:
                return False, None
            tf = float(len(pos))
            field = self._iop_field(iop)
            if model == "unrankedboolean":
                return True, 1.0
            if model == "rankedboolean":
                return True, tf
            dl = float(self.doclen[field][d])
            if model == "bm25":
                df, _ = self._iop_stats(iop, cache)
                N = float(self.n_docs)
                ave = float(self.sum_len[field]) / float(self.doc_count[field])
                idf = max(0.0, math.log((N - df + 0.5) / (df + 0.5)))
                return True, idf * tf / (tf + p.k1 * (1 - p.b + p.b * dl / ave))
            if model == "indri":
                _, ctf = self._iop_stats(iop, cache)
                prob = float(ctf) / float(self.sum_len[field])
                return True, (1 - p.lam) * (tf + p.mu * prob) / (dl + p.mu) + p.lam * prob
            raise ValueError(model)

        child = [self._sop(a, d, p, cache) for a in node.args]
        name = node.name
        if name in ("#or", "#sum") or (name in ("#and", "#wand", "#wsum") and model == "indri"):
            matches = any(m for m, _ in child)
        else:
            matches = all(m for m, _ in child)
        if not matches:
            return False, None
        if name == "#sum" and model != "bm25":
            raise ValueError(f"{model} doesn't support the #SUM operator")
        if model == "unrankedboolean":
            return True, 1.0
        if model == "rankedboolean":
            if name == "#or":
                res = 4.9e-324
                for m, s in child:
                    if m:
                        res = max(res, s)
                return True, res
            res = min(s for _, s in child)
            return True, res
        if model == "bm25":
            if name not in ("#sum", "#wsum"):
                raise ValueError(f"BM25 doesn't support {name}")
            return True, sum(s for m, s in child if m)
        if model == "indri":
            vals = [
                s if m else self._default(a, d, p, cache)
                for a, (m, s) in zip(node.args, child)
            ]
            if name == "#and":
                res = 1.0
                for v in vals:
                    res *= v
                return True, math.pow(res, 1.0 / len(vals))
            if name == "#or":
                res = 1.0
                for v in vals:
                    res *= 1.0 - v
                return True, res
            if name == "#wand":
                total = sum(node.weights)
                res = 1.0
                for w, v in zip(node.weights, vals):
                    res *= math.pow(v, w / total)
                return True, res
            if name == "#wsum":
                total = sum(node.weights)
                res = 0.0
                for w, v in zip(node.weights, vals):
                    res += v * (w / total)
                return True, res
            raise ValueError(f"Indri doesn't support {name}")
        raise ValueError(model)

    def _default(self, node, d: int, p: ModelParams, cache: dict) -> float:
        if node.name == "#score":
            iop = node.args[0]
            field = self._iop_field(iop)
            _, ctf = self._iop_stats(iop, cache)
            ctf_eff = 0.5 if ctf < 1 else float(ctf)
            prob = ctf_eff / float(self.sum_len[field])
            dl = float(self.doclen[field][d])
            return (1 - p.lam) * (p.mu * prob) / (dl + p.mu) + p.lam * prob
        if node.name == "#and":
            res = 1.0
            for a in node.args:
                res *= self._default(a, d, p, cache)
            return math.pow(res, 1.0 / len(node.args))
        if node.name == "#or":
            res = 1.0
            for a in node.args:
                res *= 1.0 - self._default(a, d, p, cache)
            return res
        if node.name == "#wand":
            total = sum(node.weights)
            res = 1.0
            for w, a in zip(node.weights, node.args):
                res *= math.pow(self._default(a, d, p, cache), w / total)
            return res
        if node.name == "#wsum":
            total = sum(node.weights)
            res = 0.0
            for w, a in zip(node.weights, node.args):
                res += self._default(a, d, p, cache) * (w / total)
            return res
        raise ValueError(node.name)

    def search(self, qid: str, query: str, params: ModelParams) -> pd.DataFrame:
        tree = parse_query(
            query,
            DEFAULT_OP[params.model],
            lambda tok: analyze_query_token(tok, self._stemmer),
        )
        rows = []
        if tree is not None:
            cache: dict = {}
            for d in self.doc_ids:
                m, s = self._sop(tree, d, params, cache)
                if m:
                    rows.append((d, self.ext_ids[d], s))
        rows.sort(key=lambda r: (-r[2], r[1]))
        rows = rows[: params.top_k]
        return pd.DataFrame(
            {
                "qid": [qid] * len(rows),
                "doc_id": [r[0] for r in rows],
                "external_id": [r[1] for r in rows],
                "score": [r[2] for r in rows],
                "rank": list(range(1, len(rows) + 1)),
            }
        )
