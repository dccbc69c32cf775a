"""Word2vec database reader — the reference's only nontrivial I/O format
(`Homeworks/HW6/QryEval/IdxWordvec.java:107-144`).

A database is a directory holding:

- ``IdxWordvec.map`` (ISO-8859-1 text): line 1 = the binary file's name;
  line 2 = ``<label> <vocabularySize>``; line 3 = ``<label> <dimensions>``
  (both split on whitespace, second token wins); then vocabularySize lines
  of ``word<TAB>byteOffset``. Duplicate words keep the FIRST occurrence
  (`IdxWordvec.java:133-138`, the GoogleNews file has dups).
- the binary file: at each offset, ``dimensions`` little-endian float32s.

Vectors are L2-normalized after reading (`IdxWordvec.java:81-97` — the
word2vec distance.c convention), in float32 like the reference's jblas
Geometry.normalize, then widened to float64 for downstream numpy math.

``DrmmScorer`` accepts any object with ``.get(term) -> vector | None`` and
``.dim`` — this reader and the deterministic synthetic stand-in
(`drmm.TermVectors`) are interchangeable backends.
"""

from __future__ import annotations

import os

import numpy as np

MAP_FILENAME = "IdxWordvec.map"


class Word2VecFile:
    """Random-access word2vec database (offset map kept in memory, vectors
    read on demand and memoized — the access pattern is a small query/doc
    vocabulary against a huge vector file)."""

    def __init__(self, path: str):
        map_path = os.path.join(path, MAP_FILENAME)
        with open(map_path, encoding="iso-8859-1") as f:
            bin_name = f.readline().strip()
            self.vocabulary_size = int(f.readline().split(None, 1)[1])
            self.dim = int(f.readline().split(None, 1)[1])
            self._offsets: dict[str, int] = {}
            for _ in range(self.vocabulary_size):
                line = f.readline().rstrip("\n")
                word, off = line.split("\t", 1)
                if word not in self._offsets:  # first occurrence wins
                    self._offsets[word] = int(off)
        self._bin = open(os.path.join(path, bin_name), "rb")  # noqa: SIM115
        self._cache: dict[str, "np.ndarray | None"] = {}

    def close(self) -> None:
        self._bin.close()

    def __contains__(self, term: str) -> bool:
        return term in self._offsets

    def get(self, term: str) -> "np.ndarray | None":
        if term in self._cache:
            return self._cache[term]
        off = self._offsets.get(term)
        if off is None:
            self._cache[term] = None
            return None
        # os.pread: positional read — no shared seek state, so concurrent
        # get() calls on one instance can't interleave seek/read.
        raw = os.pread(self._bin.fileno(), 4 * self.dim, off)
        if len(raw) != 4 * self.dim:
            raise IOError(
                f"word2vec binary truncated/mis-offset for {term!r}: wanted "
                f"{4 * self.dim} bytes at {off}, got {len(raw)}"
            )
        v = np.frombuffer(raw, dtype="<f4").astype(np.float32)
        n = np.float32(np.sqrt(np.dot(v, v)))
        if n > 0:
            v = v / n  # float32 normalize, like jblas Geometry.normalize
        out = v.astype(np.float64)
        self._cache[term] = out
        return out

    def matrix(self, terms: list[str]) -> np.ndarray:
        """Stack vectors for the terms that have one (missing terms are
        skipped, like the reference's null checks)."""
        vs = [v for v in (self.get(t) for t in terms) if v is not None]
        if not vs:
            return np.zeros((0, self.dim))
        return np.vstack(vs)


def write_word2vec_db(
    path: str, vectors: dict[str, np.ndarray], bin_name: str = "vectors.bin"
) -> str:
    """Write a word2vec database in the reference's on-disk layout (used by
    tests and to package synthetic vectors; the reference only reads)."""
    os.makedirs(path, exist_ok=True)
    offsets: dict[str, int] = {}
    with open(os.path.join(path, bin_name), "wb") as b:
        for word, vec in vectors.items():
            offsets[word] = b.tell()
            b.write(np.asarray(vec, dtype="<f4").tobytes())
    dim = len(next(iter(vectors.values()))) if vectors else 0
    with open(
        os.path.join(path, MAP_FILENAME), "w", encoding="iso-8859-1"
    ) as m:
        m.write(f"{bin_name}\n")
        m.write(f"vocabularySize {len(vectors)}\n")
        m.write(f"dimensions {dim}\n")
        for word, off in offsets.items():
            m.write(f"{word}\t{off}\n")
    return path


def train_ppmi_svd(
    token_lists: "list[list[str]]", dim: int = 16, window: int = 2
) -> "dict[str, np.ndarray]":
    """Train tiny word2vec-style embeddings on a token corpus: symmetric
    windowed co-occurrence -> positive PMI -> truncated SVD, the implicit
    matrix factorization SGNS performs (Levy & Goldberg 2014, "Neural Word
    Embedding as Implicit Matrix Factorization"). Deterministic: counts are
    exact integers, the SVD input is a fixed symmetric matrix, and each
    component's sign is fixed by making its largest-|.|-entry positive
    (first index wins ties), so (corpus, dim, window) alone determine every
    float. Returns {word: float32 vector} ready for
    :func:`write_word2vec_db` (the reader L2-normalizes on load, matching
    word2vec's distance.c convention)."""
    vocab = sorted({t for toks in token_lists for t in toks})
    index = {t: i for i, t in enumerate(vocab)}
    nv = len(vocab)
    C = np.zeros((nv, nv), dtype=np.float64)
    for toks in token_lists:
        ids = np.array([index[t] for t in toks], dtype=np.int64)
        for off in range(1, window + 1):
            if len(ids) > off:
                a, b = ids[:-off], ids[off:]
                np.add.at(C, (a, b), 1.0)
                np.add.at(C, (b, a), 1.0)
    total = C.sum()
    if total == 0:
        return {t: np.zeros(dim, dtype=np.float32) for t in vocab}
    row = C.sum(axis=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        pmi = np.log(C * total / (row * row.T))
    ppmi = np.where(np.isfinite(pmi) & (pmi > 0), pmi, 0.0)
    u, s, _vt = np.linalg.svd(ppmi, full_matrices=False)
    k = min(dim, nv)
    emb = u[:, :k] * np.sqrt(s[:k])[None, :]
    # deterministic sign: flip each component so its max-|.| entry is >= 0
    flip = np.sign(emb[np.abs(emb).argmax(axis=0), np.arange(k)])
    flip[flip == 0] = 1.0
    emb = emb * flip[None, :]
    if k < dim:  # pad tiny vocabularies up to the requested dim
        emb = np.hstack([emb, np.zeros((nv, dim - k))])
    return {t: emb[i].astype(np.float32) for i, t in enumerate(vocab)}
