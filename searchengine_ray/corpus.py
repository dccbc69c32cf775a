"""Corpus handling: the (repo, path, commit, lang, content) source-code table.

Two deterministic producers:

- :func:`corpus_from_documents` derives the mandated corpus shape from the
  driver's ``documents.parquet`` (doc_id, text, lang, source, n_chars) so the
  same rows back both the Ray pipelines and the DuckDB oracle SQL.
- :func:`synthesize_corpus` generates a standalone seeded corpus with planted
  operator patterns (FIXTURES.md §1) for unit tests — no external data.

The engine's multi-field surface maps reference fields
(`Homeworks/HW6/QryEval/QryParser.java:162-167`) onto corpus columns:
body <- content, title <- path, url <- repo, keywords <- lang.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

# field name -> corpus column holding its text
DEFAULT_FIELDS = {
    "body": "content",
    "title": "path",
    "url": "repo",
    "keywords": "lang",
}


def external_id_parts(repo: str, path: str, commit: str) -> str:
    return f"{repo}/{path}@{commit}"


def derive_corpus_batch(batch: pa.Table) -> pa.Table:
    """documents.parquet row -> corpus row, deterministically (no randomness).

    path/commit are pure functions of (doc_id, lang, source) so any process —
    including DuckDB SQL — can recompute them.
    """
    doc_id = batch.column("doc_id").to_numpy()
    lang = batch.column("lang").to_pylist()
    source = batch.column("source").to_pylist()
    text = batch.column("text")
    path = [f"src/{lg}/doc_{d:08d}.txt" for lg, d in zip(lang, doc_id)]
    # sha256 (not sha1) so DuckDB SQL can recompute it: substr(sha256(..),1,40)
    commit = [
        hashlib.sha256(f"{s}/{p}".encode()).hexdigest()[:40]
        for s, p in zip(source, path)
    ]
    return pa.table(
        {
            "doc_id": pa.array(doc_id, type=pa.int64()),
            "repo": pa.array(source, type=pa.string()),
            "path": pa.array(path, type=pa.string()),
            "commit": pa.array(commit, type=pa.string()),
            "lang": pa.array(lang, type=pa.string()),
            "content": text,
        }
    )


def corpus_from_documents(sf_dir: str, doc_range: tuple[int, int] | None = None):
    """Ray Dataset of the derived corpus (streaming; content stays in Arrow).

    The single small parquet file would otherwise be one block -> one task
    for every downstream map stage; split it so tokenize parallelizes.
    ``doc_range=(lo, hi)`` pushes a doc_id predicate into the parquet read
    (row-group pruning) so a partitioned build reads only its slice."""
    import ray.data

    kwargs = {}
    if doc_range is not None:
        import pyarrow.compute as pc

        lo, hi = doc_range
        kwargs["filter"] = (pc.field("doc_id") >= lo) & (pc.field("doc_id") < hi)
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", override_num_blocks=16, **kwargs
    )
    return ds.map_batches(derive_corpus_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Synthetic unit-test corpus (FIXTURES.md §1): planted patterns per operator.
# ---------------------------------------------------------------------------

_VOCAB = [
    "alloc", "array", "async", "atomic", "buffer", "cache", "callback", "check",
    "class", "close", "commit", "config", "copy", "daemon", "debug", "decode",
    "delete", "driver", "encode", "error", "event", "fault", "failure", "file",
    "flag", "free", "handle", "hash", "heap", "index", "iter", "json", "kernel",
    "key", "list", "lock", "log", "loop", "map", "memory", "merge", "mutex",
    "node", "open", "overflow", "packet", "parse", "patch", "pointer", "pool",
    "proc", "queue", "read", "runner", "semaphore", "shard", "signal", "socket",
    "sort", "stack", "stream", "table", "test", "thread", "token", "unit",
    "value", "vector", "write", "zero",
]
_STOPS = ["the", "and", "of", "to", "in", "for", "is", "on", "that", "a"]
_LANGS = ["py", "java", "c", "md", "txt"]


def synthesize_corpus(n_docs: int = 200, seed: int = 7) -> pa.Table:
    """Seeded corpus with planted matches for every operator (FIXTURES.md §1)."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("repo", "path", "commit", "lang", "content")}
    for i in range(n_docs):
        repo = f"org{i % 7}/proj{i % 13}"
        lang = _LANGS[i % len(_LANGS)]
        path = f"src/mod{i % 11}/file_{i:05d}.{lang}"
        commit = hashlib.sha1(f"{repo}:{path}".encode()).hexdigest()
        n_tok = int(rng.lognormal(3.5, 0.7)) + 8
        words = list(rng.choice(_VOCAB, size=n_tok))
        # interleave stopwords so stopword-position semantics get exercised
        for j in range(0, len(words), 4):
            words[j] = _STOPS[int(rng.integers(len(_STOPS)))]
        # planted patterns
        if i % 5 == 0:
            words[2:4] = ["unit", "test"]           # #near/1 bigram
        if i % 6 == 0:
            words[5], words[9] = "read", "write"     # #window/8 pair
        if i % 7 == 0:
            words[1] = "fault"                        # #syn member
        if i % 9 == 0:
            words[4:6] = ["open", "file"]
        if i == 17:
            words.append("uniqueterm_only_here")      # df=1 idf edge
        words.append("check")                          # >50% df -> idf clamp
        rows["repo"].append(repo)
        rows["path"].append(path)
        rows["commit"].append(commit)
        rows["lang"].append(lang)
        rows["content"].append(" ".join(words))
    # exact-tie pair for the externalId tie-break: identical content, doclen
    for tag in ("aa", "bb"):
        repo, lang = f"tie/{tag}", "txt"
        path = f"tie_{tag}.txt"
        rows["repo"].append(repo)
        rows["path"].append(path)
        rows["commit"].append(hashlib.sha1(f"{repo}:{path}".encode()).hexdigest())
        rows["lang"].append(lang)
        rows["content"].append("mutex lock the mutex guard pattern")
    t = pa.table({k: pa.array(v, type=pa.string()) for k, v in rows.items()})
    doc_id = pa.array(np.arange(len(rows["repo"]), dtype=np.int64))
    return t.add_column(0, "doc_id", doc_id)
