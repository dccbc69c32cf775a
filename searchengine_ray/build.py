"""Index build: Ray Data pipeline from corpus Parquet to a compressed
positional inverted index.

Replaces the reference's prebuilt Lucene index (`Homeworks/HW6/QryEval/
Idx.java:237-260` just opens one) with our own build, expressed Ray-Data-first:

    read corpus -> map_batches(tokenize, batch_format="pyarrow")      # vectorized
               -> groupby((field, term, doc_bucket))                  # THE shuffle
               -> map_groups(delta+varbyte encode, block-max metadata)
               -> write_parquet(out/postings/part_*)

plus a docmap pass (doc_id, external_id, sha256(content), per-field lengths)
and tiny global aggregates (lexicon df/ctf, corpus stats).

Scale design (SURVEY.md §4/§7):
- the shuffle key includes ``doc_bucket = doc_id // doc_bucket_size`` — this
  IS the hot-term salting: a Zipf-head term's postings split into bounded
  doc-range groups, and because buckets are disjoint ascending doc ranges the
  final posting list is just the bucket rows concatenated in bucket order
  (docid-ascending invariant preserved with no re-sort);
- build partitions are doc-id ranges aligned to bucket boundaries, each
  written atomically (tmp dir + rename) with a manifest entry -> a killed
  build resumes by skipping finished partitions and reproduces byte-identical
  output (everything is deterministic in the input);
- ``content`` never travels past tokenization — posting rows carry only
  (field, term, bucket, doc_id, tf, dl, positions).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .analyze import analyze_batch, field_length
from .codec import encode_segmented, encode_sorted, varbyte_encode
from .config import BuildConfig
from .corpus import corpus_from_documents

POSTINGS_SCHEMA = pa.schema(
    [
        ("field", pa.string()),
        ("term", pa.string()),
        ("bucket", pa.int32()),
        ("df", pa.int64()),
        ("ctf", pa.int64()),
        ("first_doc", pa.int64()),
        ("last_doc", pa.int64()),
        ("docs_vb", pa.binary()),
        ("tfs_vb", pa.binary()),
        ("pos_vb", pa.binary()),
        ("blk_last", pa.list_(pa.int64())),
        ("blk_max_tf", pa.list_(pa.int64())),
        ("blk_min_dl", pa.list_(pa.int64())),
    ]
)


class TokenizeFields:
    """Stateful map_batches stage: corpus batch -> flat posting rows.

    Analyzer state (regex, stoplist) is module-level and cheap, but we keep
    this a callable class so heavier analyzers (stemmers, BPE vocabularies)
    plug in via ``__init__`` once per actor.
    """

    def __init__(self, fields: dict[str, str], doc_bucket_size: int):
        self.fields = fields
        self.doc_bucket_size = doc_bucket_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy()
        out: list[pa.Table] = []
        for field, col in self.fields.items():
            texts = batch.column(col).to_pylist()
            ab = analyze_batch(texts)
            if len(ab.term) == 0:
                continue
            g_doc = doc_ids[ab.doc_index]
            g_dl = ab.doc_lens[ab.doc_index]
            positions = pa.ListArray.from_arrays(
                np.asarray(ab.pos_offsets, dtype=np.int32),
                pa.array(ab.positions, type=pa.int32()),
            )
            out.append(
                pa.table(
                    {
                        "field": pa.array([field] * len(ab.term), type=pa.string()),
                        "term": pa.array(ab.term.astype(str), type=pa.string()),
                        "bucket": pa.array(
                            (g_doc // self.doc_bucket_size).astype(np.int32)
                        ),
                        "doc_id": pa.array(g_doc, type=pa.int64()),
                        "tf": pa.array(ab.tf, type=pa.int64()),
                        "dl": pa.array(g_dl, type=pa.int64()),
                        "positions": positions,
                    }
                )
            )
        if not out:
            return pa.table(
                {
                    "field": pa.array([], type=pa.string()),
                    "term": pa.array([], type=pa.string()),
                    "bucket": pa.array([], type=pa.int32()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "tf": pa.array([], type=pa.int64()),
                    "dl": pa.array([], type=pa.int64()),
                    "positions": pa.array([], type=pa.list_(pa.int32())),
                }
            )
        return pa.concat_tables(out)


class EncodePostingGroup:
    """map_groups stage: all (field, term, bucket) rows -> one encoded row."""

    def __init__(self, skip_block_docs: int):
        self.skip_block_docs = skip_block_docs
        self.__name__ = "encode_posting_group"  # map_groups wants a name

    def __call__(self, group: pa.Table) -> pa.Table:
        group = group.sort_by("doc_id")
        doc_ids = group.column("doc_id").to_numpy()
        tfs = group.column("tf").to_numpy()
        dls = group.column("dl").to_numpy()
        pos_col = group.column("positions").combine_chunks()
        pos_values = pos_col.values.to_numpy()
        pos_offsets = pos_col.offsets.to_numpy().astype(np.int64)

        n = len(doc_ids)
        blk_bounds = np.arange(0, n, self.skip_block_docs)
        blk_ends = np.minimum(blk_bounds + self.skip_block_docs, n)
        blk_last = doc_ids[blk_ends - 1]
        blk_max_tf = np.array(
            [tfs[s:e].max() for s, e in zip(blk_bounds, blk_ends)], dtype=np.int64
        )
        blk_min_dl = np.array(
            [dls[s:e].min() for s, e in zip(blk_bounds, blk_ends)], dtype=np.int64
        )

        return pa.table(
            {
                "field": group.column("field").slice(0, 1),
                "term": group.column("term").slice(0, 1),
                "bucket": group.column("bucket").slice(0, 1),
                "df": pa.array([n], type=pa.int64()),
                "ctf": pa.array([int(tfs.sum())], type=pa.int64()),
                "first_doc": pa.array([int(doc_ids[0])], type=pa.int64()),
                "last_doc": pa.array([int(doc_ids[-1])], type=pa.int64()),
                "docs_vb": pa.array([encode_sorted(doc_ids)], type=pa.binary()),
                "tfs_vb": pa.array([varbyte_encode(tfs)], type=pa.binary()),
                "pos_vb": pa.array(
                    [encode_segmented(pos_values, pos_offsets)], type=pa.binary()
                ),
                "blk_last": pa.array([blk_last.tolist()], type=pa.list_(pa.int64())),
                "blk_max_tf": pa.array(
                    [blk_max_tf.tolist()], type=pa.list_(pa.int64())
                ),
                "blk_min_dl": pa.array(
                    [blk_min_dl.tolist()], type=pa.list_(pa.int64())
                ),
            }
        )


class DocmapBatch:
    """map_batches stage: corpus batch -> docmap rows.

    Carries the per-row ``sha256(content)`` invariant demanded by
    BASELINE.json plus per-field token lengths (incl. stopword positions,
    the reference's doclen semantics, `Idx.java:94-116`).
    """

    def __init__(self, fields: dict[str, str]):
        self.fields = fields

    def __call__(self, batch: pa.Table) -> pa.Table:
        repo = batch.column("repo").to_pylist()
        path = batch.column("path").to_pylist()
        commit = batch.column("commit").to_pylist()
        content = batch.column("content").to_pylist()
        ext = [f"{r}/{p}@{c}" for r, p, c in zip(repo, path, commit)]
        sha = [hashlib.sha256(t.encode()).hexdigest() for t in content]
        cols = {
            "doc_id": batch.column("doc_id"),
            "external_id": pa.array(ext, type=pa.string()),
            "sha256": pa.array(sha, type=pa.string()),
        }
        for field, col in self.fields.items():
            texts = content if col == "content" else batch.column(col).to_pylist()
            cols[f"len_{field}"] = pa.array(
                [field_length(t) for t in texts], type=pa.int64()
            )
        return pa.table(cols)


def _atomic_write(ds, final_dir: str) -> None:
    tmp = final_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ds.write_parquet(tmp)
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    os.rename(tmp, final_dir)


def _fingerprint(cfg: BuildConfig, n_docs: int, source_desc: str) -> str:
    payload = json.dumps(
        {
            "fields": cfg.fields,
            "bucket": cfg.doc_bucket_size,
            "skip": cfg.skip_block_docs,
            "parts": cfg.num_partitions,
            "n_docs": n_docs,
            "source": source_desc,
        },
        sort_keys=True,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def build_index(
    source: "str | Callable[[], object]",
    out_dir: str,
    cfg: BuildConfig | None = None,
    overwrite: bool = False,
) -> str:
    """Build (or resume) the index at ``out_dir``; returns ``out_dir``.

    ``source`` is either an sf_dir containing ``documents.parquet`` or a
    zero-arg factory returning the corpus Dataset (so each build partition
    can re-instantiate its own lazy pipeline).
    """
    cfg = cfg or BuildConfig()
    if isinstance(source, str):
        sf_dir = source
        factory = lambda: corpus_from_documents(sf_dir)  # noqa: E731
        source_desc = os.path.abspath(sf_dir)
    else:
        factory = source
        source_desc = getattr(source, "__name__", "factory")

    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "manifest.json")

    max_id = factory().max("doc_id")
    n_docs_hint = int(max_id) + 1
    fp = _fingerprint(cfg, n_docs_hint, source_desc)

    manifest: dict = {"fingerprint": fp, "partitions": {}, "complete": False}
    if os.path.exists(manifest_path) and not overwrite:
        with open(manifest_path) as f:
            old = json.load(f)
        if old.get("fingerprint") == fp:
            if old.get("complete"):
                return out_dir
            manifest = old
        # fingerprint mismatch -> rebuild from scratch
    if overwrite:
        for sub in ("postings", "docmap", "lexicon"):
            p = os.path.join(out_dir, sub)
            if os.path.exists(p):
                shutil.rmtree(p)

    # doc-range partitions aligned to bucket boundaries (see module docstring)
    per_part = -(-n_docs_hint // cfg.num_partitions)
    per_part = -(-per_part // cfg.doc_bucket_size) * cfg.doc_bucket_size

    for p in range(cfg.num_partitions):
        key = str(p)
        if manifest["partitions"].get(key, {}).get("status") == "done":
            continue
        lo, hi = p * per_part, (p + 1) * per_part
        t0 = time.time()

        def in_range(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id")
            return t.filter(pc.and_(pc.greater_equal(ids, lo), pc.less(ids, hi)))

        corpus = factory().map_batches(in_range, batch_format="pyarrow")

        docmap = corpus.map_batches(
            DocmapBatch(cfg.fields),
            batch_format="pyarrow",
            batch_size=cfg.tokenize_batch_size,
        )
        _atomic_write(docmap, os.path.join(out_dir, "docmap", f"part_{p:05d}"))

        posts = factory().map_batches(in_range, batch_format="pyarrow").map_batches(
            TokenizeFields(cfg.fields, cfg.doc_bucket_size),
            batch_format="pyarrow",
            batch_size=cfg.tokenize_batch_size,
        )
        merged = posts.groupby(["field", "term", "bucket"]).map_groups(
            EncodePostingGroup(cfg.skip_block_docs), batch_format="pyarrow"
        )
        _atomic_write(merged, os.path.join(out_dir, "postings", f"part_{p:05d}"))

        manifest["partitions"][key] = {
            "status": "done",
            "doc_lo": lo,
            "doc_hi": hi,
            "wall_s": round(time.time() - t0, 3),
        }
        with open(manifest_path, "w") as f:
            json.dump(manifest, f, indent=1)

    _finalize(out_dir, cfg)
    manifest["complete"] = True
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=1)
    return out_dir


def _finalize(out_dir: str, cfg: BuildConfig) -> None:
    """Global aggregates over the built partitions: lexicon + corpus stats."""
    import ray.data
    from ray.data.aggregate import Sum

    postings = ray.data.read_parquet(
        os.path.join(out_dir, "postings"), columns=["field", "term", "df", "ctf"]
    )
    lexicon = postings.groupby(["field", "term"]).aggregate(
        Sum("df", alias_name="df"), Sum("ctf", alias_name="ctf")
    )
    _atomic_write(lexicon, os.path.join(out_dir, "lexicon"))

    docmap = ray.data.read_parquet(os.path.join(out_dir, "docmap"))
    n_docs = docmap.count()
    stats: dict = {"n_docs": int(n_docs), "fields": {}}
    for field in cfg.fields:
        col = f"len_{field}"
        agg = docmap.map_batches(
            lambda t, c=col: pa.table(
                {
                    "sum_len": pa.array([pc.sum(t.column(c)).as_py() or 0]),
                    "doc_count": pa.array(
                        [pc.sum(pc.cast(pc.greater(t.column(c), 0), pa.int64())).as_py() or 0]
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        import pandas as pd  # small result

        pdf = agg.to_pandas()
        stats["fields"][field] = {
            "sum_len": int(pdf["sum_len"].sum()),
            "doc_count": int(pdf["doc_count"].sum()),
        }
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)
