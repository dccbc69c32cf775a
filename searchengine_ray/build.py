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

from .analyze import analyze_batch
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
        ("docs_vb", pa.large_binary()),
        ("tfs_vb", pa.large_binary()),
        ("pos_vb", pa.large_binary()),
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

    When ``docmap_dir`` is set, each call ALSO writes the batch's docmap
    rows (external_id, sha256(content), per-field lengths) as one parquet
    file named by the batch's doc-id range — the lengths fall out of the
    tokenization already being done here, so fusing the docmap into this
    stage removes an entire read+tokenize pass over the corpus. Retry
    idempotence: files are content-keyed (doc range + count + id crc), so an
    identically-chunked retry overwrites itself; a differently-chunked retry
    leaves overlapping-but-identical rows that the docmap READER dedupes on
    doc_id (see ``_write_docmap`` and ``indexio.InvertedIndex``).

    Storage assumption (multi-node): tasks run on workers, so
    ``docmap_dir`` must be visible to every worker AND the driver (shared
    fs or object storage) — the exact same requirement the pipeline's
    ``Dataset.write_parquet(out_dir)`` already imposes on ``out_dir``; on
    one node (this sandbox) local /tmp satisfies both.
    """

    def __init__(
        self,
        fields: dict[str, str],
        doc_bucket_size: int,
        merge_partitions: int = 64,
        docmap_dir: str | None = None,
        stemmer: str = "none",
    ):
        from .stem import get_stemmer

        self.fields = fields
        self.doc_bucket_size = doc_bucket_size
        self.merge_partitions = merge_partitions
        self.docmap_dir = docmap_dir
        self.stemmer = get_stemmer(stemmer)  # once per actor/task

    def _write_docmap(
        self,
        batch: pa.Table,
        doc_ids: np.ndarray,
        doc_lens: dict[str, np.ndarray],
    ) -> None:
        import pyarrow.parquet as pq

        repo = batch.column("repo").to_pylist()
        path = batch.column("path").to_pylist()
        commit = batch.column("commit").to_pylist()
        content = batch.column("content").to_pylist()
        ext = [f"{r}/{p}@{c}" for r, p, c in zip(repo, path, commit)]
        sha = [hashlib.sha256(t.encode()).hexdigest() for t in content]
        cols = {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "external_id": pa.array(ext, type=pa.string()),
            "sha256": pa.array(sha, type=pa.string()),
        }
        for field in self.fields:
            cols[f"len_{field}"] = pa.array(doc_lens[field], type=pa.int64())
        import zlib

        lo, hi = int(doc_ids.min()), int(doc_ids.max())
        # Content-keyed name: doc_ids are a deterministic function of the
        # input rows, so an identically-chunked retry overwrites its own
        # file. A retry that re-chunks into DIFFERENT batch boundaries
        # writes differently-named files whose doc sets may overlap the
        # stale ones — the docmap reader (indexio.InvertedIndex) dedupes on
        # doc_id at load (rows for the same id are identical), so coverage
        # stays correct either way. Batch ranges legitimately interleave
        # (doc_ids aren't contiguous per batch), so no range-based cleanup.
        crc = zlib.crc32(np.ascontiguousarray(doc_ids, dtype=np.int64).tobytes())
        name = f"dm_{lo:012d}_{hi:012d}_{len(doc_ids)}_{crc:08x}.parquet"
        pq.write_table(pa.table(cols), os.path.join(self.docmap_dir, name))

    def _kh(self, field: str, terms: np.ndarray, bucket: np.ndarray) -> np.ndarray:
        """Stable hash-partition id per posting row; the shuffle key. Salting
        is built in: the key includes the doc bucket, so a hot term's
        postings land in bounded doc-range groups spread across partitions."""
        import zlib

        uniq, inv = np.unique(terms.astype(str), return_inverse=True)
        th = np.array(
            [zlib.crc32(f"{field}\x00{t}".encode()) for t in uniq], dtype=np.int64
        )
        return ((th[inv] + bucket * 1315423911) % self.merge_partitions).astype(
            np.int32
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy()
        out: list[pa.Table] = []
        doc_lens: dict[str, np.ndarray] = {}
        for field, col in self.fields.items():
            texts = batch.column(col).to_pylist()
            ab = analyze_batch(texts, stemmer=self.stemmer)
            doc_lens[field] = ab.doc_lens
            if len(ab.term) == 0:
                continue
            g_doc = doc_ids[ab.doc_index]
            g_dl = ab.doc_lens[ab.doc_index]
            bucket = (g_doc // self.doc_bucket_size).astype(np.int64)
            positions = pa.ListArray.from_arrays(
                np.asarray(ab.pos_offsets, dtype=np.int32),
                pa.array(ab.positions, type=pa.int32()),
            )
            out.append(
                pa.table(
                    {
                        "kh": pa.array(self._kh(field, ab.term, bucket)),
                        "field": pa.array([field] * len(ab.term), type=pa.string()),
                        "term": pa.array(ab.term.astype(str), type=pa.string()),
                        "bucket": pa.array(bucket.astype(np.int32)),
                        "doc_id": pa.array(g_doc, type=pa.int64()),
                        "tf": pa.array(ab.tf, type=pa.int64()),
                        "dl": pa.array(g_dl, type=pa.int64()),
                        "positions": positions,
                    }
                )
            )
        if self.docmap_dir is not None and batch.num_rows:
            self._write_docmap(batch, doc_ids, doc_lens)
        if not out:
            return pa.table(
                {
                    "kh": pa.array([], type=pa.int32()),
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


class EncodeMergePartition:
    """map_groups stage over ONE hash partition of the (field, term, bucket)
    key space: encodes ALL posting groups in the partition with vectorized
    numpy — no per-group Python/Ray dispatch.

    Why not ``groupby(keys).map_groups(per_group_fn)``: Ray's per-group
    dispatch costs ~1-2 ms per group, which at real vocabulary sizes
    (millions of distinct terms) is hours of pure overhead. Here the shuffle
    key is a hash partition (``kh``), so one call handles thousands of
    groups: sort by key inside the partition, find group boundaries, then
    every posting list is delta+varbyte-encoded in four whole-partition
    numpy passes and sliced by per-group byte counts. Block-max skip
    metadata comes from ``np.maximum.reduceat`` over block boundaries.
    """

    def __init__(self, skip_block_docs: int):
        self.skip_block_docs = skip_block_docs
        self.__name__ = "encode_merge_partition"

    def __call__(self, part: pa.Table) -> pa.Table:
        from .codec import segmented_deltas, varbyte_encode_with_lengths

        if part.num_rows == 0:
            return _empty_postings_table()
        part = part.sort_by(
            [
                ("field", "ascending"),
                ("term", "ascending"),
                ("bucket", "ascending"),
                ("doc_id", "ascending"),
            ]
        ).combine_chunks()

        fcol = part.column("field").combine_chunks().dictionary_encode()
        tcol = part.column("term").combine_chunks().dictionary_encode()
        f_idx = fcol.indices.to_numpy()
        t_idx = tcol.indices.to_numpy()
        bucket = part.column("bucket").to_numpy()
        doc = part.column("doc_id").to_numpy()
        tf = part.column("tf").to_numpy()
        dl = part.column("dl").to_numpy()
        pos_col = part.column("positions").combine_chunks()
        pos_vals = pos_col.values.to_numpy()
        row_pos_off = pos_col.offsets.to_numpy().astype(np.int64)

        n = len(doc)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = (
            (f_idx[1:] != f_idx[:-1])
            | (t_idx[1:] != t_idx[:-1])
            | (bucket[1:] != bucket[:-1])
        )
        starts = np.flatnonzero(change)
        G = len(starts)
        ends = np.empty(G, dtype=np.int64)
        ends[:-1] = starts[1:]
        ends[-1] = n
        counts = ends - starts

        row_off = np.concatenate((starts, [n]))  # group row offsets, len G+1
        ctf = np.add.reduceat(tf, starts)

        # --- docs: per-group delta then one varbyte pass, sliced by bytes ---
        doc_gaps = segmented_deltas(doc, row_off)
        doc_bytes, doc_lens = varbyte_encode_with_lengths(doc_gaps)
        docs_vb = _binary_from_counts(doc_bytes, np.add.reduceat(doc_lens, starts))

        # --- tfs ---
        tf_bytes, tf_lens = varbyte_encode_with_lengths(tf)
        tfs_vb = _binary_from_counts(tf_bytes, np.add.reduceat(tf_lens, starts))

        # --- positions: per-ROW delta runs, grouped byte counts ---
        pos_gaps = segmented_deltas(pos_vals, row_pos_off)
        pos_bytes, pos_lens = varbyte_encode_with_lengths(pos_gaps)
        # bytes per row (prefix-sum differences) -> bytes per group
        if len(pos_lens):
            csum = np.zeros(len(pos_lens) + 1, dtype=np.int64)
            np.cumsum(pos_lens, out=csum[1:])
            row_byte_counts = csum[row_pos_off[1:]] - csum[row_pos_off[:-1]]
            grp_pos_bytes = np.add.reduceat(row_byte_counts, starts)
        else:
            grp_pos_bytes = np.zeros(G, dtype=np.int64)
        pos_vb = _binary_from_counts(pos_bytes, grp_pos_bytes)

        # --- block-max skip metadata (contiguous reduceat boundaries) ---
        skip = self.skip_block_docs
        reps = -(-counts // skip)
        blk_group_off = np.zeros(G + 1, dtype=np.int64)
        np.cumsum(reps, out=blk_group_off[1:])
        blk_group = np.repeat(np.arange(G), reps)
        within = np.arange(len(blk_group)) - blk_group_off[blk_group]
        bstart = starts[blk_group] + within * skip
        bend = np.minimum(bstart + skip, ends[blk_group])
        blk_last = pa.ListArray.from_arrays(
            blk_group_off.astype(np.int32), pa.array(doc[bend - 1], type=pa.int64())
        )
        blk_max_tf = pa.ListArray.from_arrays(
            blk_group_off.astype(np.int32),
            pa.array(np.maximum.reduceat(tf, bstart), type=pa.int64()),
        )
        blk_min_dl = pa.ListArray.from_arrays(
            blk_group_off.astype(np.int32),
            pa.array(np.minimum.reduceat(dl, bstart), type=pa.int64()),
        )

        take = pa.array(starts, type=pa.int64())
        return pa.table(
            {
                "field": part.column("field").take(take),
                "term": part.column("term").take(take),
                "bucket": pa.array(bucket[starts], type=pa.int32()),
                "df": pa.array(counts, type=pa.int64()),
                "ctf": pa.array(ctf, type=pa.int64()),
                "first_doc": pa.array(doc[starts], type=pa.int64()),
                "last_doc": pa.array(doc[ends - 1], type=pa.int64()),
                "docs_vb": docs_vb,
                "tfs_vb": tfs_vb,
                "pos_vb": pos_vb,
                "blk_last": blk_last,
                "blk_max_tf": blk_max_tf,
                "blk_min_dl": blk_min_dl,
            }
        )


def _binary_from_counts(data: np.ndarray, counts: np.ndarray) -> pa.Array:
    """Zero-copy LargeBinary array: one value per group, sliced from the
    whole-partition encoded buffer by per-group byte counts."""
    offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        len(counts),
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())],
    )


def _empty_postings_table() -> pa.Table:
    cols = {}
    for f in POSTINGS_SCHEMA:
        cols[f.name] = pa.array([], type=f.type)
    return pa.table(cols)


def _partition_metrics(part_dir: str) -> dict:
    """Rows / bytes / content fingerprint of one written partition (read
    from the Parquet footers — no data scan except the hash, which covers
    file names+sizes+row counts for cheap lineage auditing)."""
    import pyarrow.parquet as pq

    files = sorted(
        os.path.join(r, n)
        for r, _d, ns in os.walk(part_dir)
        for n in ns
        if n.endswith(".parquet")
    )
    rows = 0
    nbytes = 0
    h = hashlib.sha256()
    for f in files:
        md = pq.read_metadata(f)
        rows += md.num_rows
        sz = os.path.getsize(f)
        nbytes += sz
        h.update(f"{os.path.basename(f)}:{md.num_rows}:{sz}".encode())
    return {
        "files": len(files),
        "rows": int(rows),
        "bytes": int(nbytes),
        "fingerprint": h.hexdigest()[:16],
    }


def _ensure_threadsafe_fs_imports() -> None:
    """Ray Data's path resolution runs ``from fsspec.implementations.http
    import HTTPFileSystem`` on EVERY read/write and only catches
    ModuleNotFoundError (`ray/data/datasource/path_util.py:150-154`). With
    aiohttp absent the import fails every time; when several builder
    threads hit that first import concurrently, CPython's threaded-import
    edge can surface a partially-initialized module as a plain ImportError
    and kill a partition. Warm the import once; if it can never succeed,
    register an inert stub so later imports are deterministic (fsspec-HTTP
    is unusable in an offline environment either way — the stub class is
    never instantiated, so the isinstance check it feeds just returns
    False)."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401

        return
    except ImportError:
        pass
    import sys
    import types

    try:
        import fsspec.implementations as fsi
    except ImportError:
        return
    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # pragma: no cover — inert placeholder
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod
    fsi.http = mod


def _atomic_write(ds, final_dir: str) -> None:
    tmp = final_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ds.write_parquet(tmp)
    os.makedirs(tmp, exist_ok=True)  # an empty dataset writes no files at all
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    os.rename(tmp, final_dir)


def _empty_partition_entry(lo: int, hi: int) -> dict:
    return {
        "status": "done", "doc_lo": lo, "doc_hi": hi, "empty": True,
        "docmap": {"files": 0, "rows": 0, "bytes": 0, "fingerprint": ""},
        "postings": {"files": 0, "rows": 0, "bytes": 0, "fingerprint": ""},
    }


def _build_one_partition(
    p: int,
    lo: int,
    hi: int,
    factory: Callable,
    cfg: BuildConfig,
    out_dir: str,
    source_desc: str,
    whole: bool,
) -> dict:
    """Build postings+docmap for one doc-range partition ``[lo, hi)`` into
    ``part_{p:05d}``; returns its manifest entry. Shared by the initial
    build and segment appends (:func:`add_documents`)."""
    t0 = time.time()
    # Partition-pruned read: factories that support doc_range push the
    # range into the parquet read (row-group predicate pushdown) so an
    # N-partition build reads each input byte ~once, not N times.
    # Zero-arg factories fall back to a post-read filter.
    import inspect

    supports_range = "doc_range" in inspect.signature(factory).parameters
    if whole:
        corpus = factory()  # the single partition covers everything
    elif supports_range:
        corpus = factory(doc_range=(lo, hi))
    else:
        def in_range(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id")
            return t.filter(
                pc.and_(pc.greater_equal(ids, lo), pc.less(ids, hi))
            )

        corpus = factory().map_batches(in_range, batch_format="pyarrow")
    if cfg.materialize_partition:
        corpus = corpus.materialize()

    # ONE fused pass: tokenize emits posting rows downstream and writes
    # the docmap (external_id/sha256/lengths) as a side output — the
    # lengths are already computed by the tokenizer, so no second
    # read+tokenize pass exists.
    dm_final = os.path.join(out_dir, "docmap", f"part_{p:05d}")
    dm_tmp = dm_final + ".tmp"
    shutil.rmtree(dm_tmp, ignore_errors=True)
    os.makedirs(dm_tmp, exist_ok=True)
    tokenizer = TokenizeFields(
        cfg.fields, cfg.doc_bucket_size, cfg.merge_partitions,
        docmap_dir=dm_tmp, stemmer=cfg.stemmer,
    )
    posts = corpus.map_batches(
        tokenizer,
        batch_format="pyarrow",
        batch_size=cfg.tokenize_batch_size,
    )
    # THE shuffle: hash-partitioned by (field, term, doc-bucket); each
    # partition encodes all its posting groups in one vectorized call
    merged = posts.groupby("kh").map_groups(
        EncodeMergePartition(cfg.skip_block_docs), batch_format="pyarrow"
    )
    _atomic_write(merged, os.path.join(out_dir, "postings", f"part_{p:05d}"))
    if os.path.exists(dm_final):
        shutil.rmtree(dm_final)
    os.rename(dm_tmp, dm_final)

    return {
        "status": "done",
        "doc_lo": lo,
        "doc_hi": hi,
        "wall_s": round(time.time() - t0, 3),
        # lineage + metrics (north_rule: per-partition checkpoints):
        # output fingerprints let a resumed/retried build be audited
        # against the original without re-reading the input
        "docmap": _partition_metrics(dm_final),
        "postings": _partition_metrics(
            os.path.join(out_dir, "postings", f"part_{p:05d}")
        ),
        "source": source_desc,
    }


def _fingerprint(cfg: BuildConfig, n_docs: int, source_desc: str) -> str:
    payload = json.dumps(
        {
            "fields": cfg.fields,
            "bucket": cfg.doc_bucket_size,
            "skip": cfg.skip_block_docs,
            "parts": cfg.num_partitions,
            "merge": cfg.merge_partitions,
            "stemmer": cfg.stemmer,
            "n_docs": n_docs,
            "source": source_desc,
        },
        sort_keys=True,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _structural_config(cfg: BuildConfig) -> dict:
    """The build parameters a segment append MUST share with the base index
    (anything that changes postings layout or token identity)."""
    return {
        "fields": cfg.fields,
        "bucket": cfg.doc_bucket_size,
        "skip": cfg.skip_block_docs,
        "stemmer": cfg.stemmer,
    }


def index_partitions(index_dir: str) -> list[int]:
    """Non-empty partition numbers of a built index (base + all appended
    segments) — the list sharded serving passes as ``parts=``."""
    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    return sorted(
        int(k)
        for k, e in manifest["partitions"].items()
        if e.get("status") == "done" and not e.get("empty")
    )


def force_merge(index_dir: str, num_partitions: int = 1) -> int:
    """Lucene ``IndexWriter.forceMerge(maxNumSegments)``: coalesce every
    partition — base build plus appended segments — into ``num_partitions``
    canonical doc-range partitions, leaving an index observably identical
    to a from-scratch :func:`build_index` of the current surviving corpus
    at that partition count (the reference only ever opens such a merged
    index, ``Homeworks/HW6/QryEval/Idx.java:237-260``). Completes the
    writer lifecycle: build -> add_documents -> delete_documents ->
    expunge_deletes -> force_merge.

    Pending tombstones are expunged first (forceMerge drops deletes).
    Because every partition boundary in this engine is bucket-aligned (the
    base build rounds ranges up to ``doc_bucket_size``; appends start at a
    bucket-aligned doc base), each (field, term, bucket) posting row lives
    in exactly ONE source partition and maps to exactly ONE target
    partition — so the merge is a pure row redistribution: no posting list
    is decoded, spliced, or re-encoded, and every row lands byte-identical
    to what a fresh build would encode. Postings move via bucket-range
    reads (parquet row-group stats prune files outside the target's bucket
    range — each input byte is read ~once, not num_partitions times),
    docmap rows via doc-id-range reads; lexicon + stats re-derive through
    ``_finalize`` (sums are reorder-invariant, so they only change if an
    expunge shrank the corpus). No shuffle: target assignment is a range
    predicate, not an all-to-all.

    Re-runnable: the new layout is fully written to ``.merged`` siblings
    before a two-rename swap per subtree; a crash before the first rename
    leaves the old index intact, and re-running the merge regenerates the
    ``.merged`` dirs from whichever tree is live. Returns the number of
    (non-empty) partitions after the merge.
    """
    import pyarrow.parquet as pq
    import ray.data

    from .config import BuildConfig
    from .delete import _load_tombstones, expunge_deletes
    from .indexio import _parquet_files

    if len(_load_tombstones(index_dir)):
        expunge_deletes(index_dir)

    manifest_path = os.path.join(index_dir, "manifest.json")
    with open(manifest_path) as f:
        manifest = json.load(f)
    if not (manifest.get("complete") or manifest.get("segments")):
        raise ValueError(
            f"{index_dir}: index is incomplete; finish build_index() before "
            "merging"
        )
    struct = manifest.get("config") or {}
    cfg = BuildConfig(
        fields=struct.get("fields") or BuildConfig().fields,
        doc_bucket_size=int(
            struct.get("bucket", BuildConfig().doc_bucket_size)
        ),
        skip_block_docs=int(struct.get("skip", BuildConfig().skip_block_docs)),
        stemmer=struct.get("stemmer", "none"),
        num_partitions=num_partitions,
    )
    live = [
        e
        for e in manifest["partitions"].values()
        if e.get("status") == "done" and not e.get("empty")
    ]
    if (
        len(live) == num_partitions
        and not manifest.get("segments")
        and manifest.get("merged_to") == num_partitions
    ):
        return num_partitions  # already merged to this width

    # n_docs = max doc_id + 1, from docmap FOOTERS only (no data read)
    n_docs = 0
    for fn in _parquet_files([os.path.join(index_dir, "docmap")]):
        md = pq.ParquetFile(fn).metadata
        idx = md.schema.to_arrow_schema().names.index("doc_id")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is not None and st.has_min_max:
                n_docs = max(n_docs, int(st.max) + 1)
    if n_docs == 0:
        raise ValueError(f"{index_dir}: empty docmap; nothing to merge")

    B = cfg.doc_bucket_size
    per_part = -(-n_docs // num_partitions)
    per_part = -(-per_part // B) * B

    post_root = os.path.join(index_dir, "postings")
    dm_root = os.path.join(index_dir, "docmap")
    post_new, dm_new = post_root + ".merged", dm_root + ".merged"
    shutil.rmtree(post_new, ignore_errors=True)
    shutil.rmtree(dm_new, ignore_errors=True)
    new_parts: dict = {}
    for p in range(num_partitions):
        lo, hi = p * per_part, (p + 1) * per_part
        if lo >= n_docs:
            new_parts[str(p)] = _empty_partition_entry(lo, hi)
            continue
        t0 = time.time()
        posts = ray.data.read_parquet(
            post_root,
            filter=(pc.field("bucket") >= lo // B)
            & (pc.field("bucket") < -(-hi // B)),
        )
        _atomic_write(posts, os.path.join(post_new, f"part_{p:05d}"))
        dm = ray.data.read_parquet(
            dm_root,
            filter=(pc.field("doc_id") >= lo) & (pc.field("doc_id") < hi),
        )
        _atomic_write(dm, os.path.join(dm_new, f"part_{p:05d}"))
        new_parts[str(p)] = {
            "status": "done",
            "doc_lo": lo,
            "doc_hi": hi,
            "wall_s": round(time.time() - t0, 3),
            "docmap": _partition_metrics(os.path.join(dm_new, f"part_{p:05d}")),
            "postings": _partition_metrics(
                os.path.join(post_new, f"part_{p:05d}")
            ),
            "source": "force_merge",
        }

    for root, new in ((post_root, post_new), (dm_root, dm_new)):
        old = root + ".pre_merge"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(root, old)
        os.rename(new, root)
        shutil.rmtree(old)

    manifest["partitions"] = new_parts
    manifest["segments"] = []
    manifest["merged_to"] = num_partitions
    manifest.setdefault("merges", []).append(
        {"num_partitions": num_partitions, "n_docs": int(n_docs)}
    )
    manifest["complete"] = True
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=1)
    _finalize(index_dir, cfg)
    return sum(1 for e in new_parts.values() if not e.get("empty"))


def add_documents(
    index_dir: str,
    source: "str | Callable[[], object]",
    cfg: BuildConfig | None = None,
    id_range: tuple[int, int] | None = None,
    tag: str | None = None,
) -> str:
    """Append a corpus segment to a COMPLETE index — the Lucene
    ``IndexWriter.addDocument`` / segment model the reference relies on (its
    prebuilt Lucene index is append-built; ``Homeworks/HW6/QryEval/
    Idx.java:237-260`` only ever opens the merged result).

    Ray-Data-first incremental build: incoming docs are re-identified at a
    bucket-aligned base ABOVE the existing doc-id space, so the new
    partitions' (field, term, bucket) groups are disjoint from every
    existing row and the unmodified reader (``indexio.InvertedIndex``
    concatenates bucket rows in ascending-bucket order) serves the union
    with no merge pass over old postings. New partitions continue the
    global ``part_*`` numbering, so doc-sharded serving (``parts=``) and
    per-partition lineage stay uniform; ``index_partitions()`` lists them.

    After the segment's partitions land, the term-level lexicon and corpus
    stats are re-derived over ALL partitions (`_finalize`) — a
    metadata-only aggregate (columns field/term/df/ctf + docmap lengths,
    never the posting payload bytes), kept as a full recompute because it
    is idempotent under any crash point. At a scale where even that
    aggregate hurts, swap `_finalize` for a generation-swapped incremental
    fold (old lexicon ∪ new-segment partials, atomically renamed with the
    folded-segment fingerprints recorded inside the directory).

    Resumable like the base build: the segment gets a manifest entry keyed
    by its fingerprint; re-running after a crash reuses its doc base and
    finishes pending partitions. Re-adding an identical (source, cfg,
    id_range, tag) segment to a complete index is a NO-OP
    (resubmit-idempotent job semantics). The fingerprint of a CALLABLE
    source only sees its ``__name__`` — two different anonymous factories
    with the same (n_docs, lo) would collide, so pass a distinct ``tag``
    per append when using factories (path sources self-distinguish).

    ``id_range=(lo, hi)``: closed-open doc_id range of the incoming corpus
    (pass it to skip the min/max discovery pass). Incoming ids only need to
    be unique within the segment; they are shifted, not trusted.
    """
    cfg = cfg or BuildConfig()
    manifest_path = os.path.join(index_dir, "manifest.json")
    with open(manifest_path) as f:
        manifest = json.load(f)
    # a segment entry can only exist if the base was complete when it was
    # accepted, so a crashed append (complete=False, segments non-empty)
    # still resumes here
    if not (manifest.get("complete") or manifest.get("segments")):
        raise ValueError(
            f"{index_dir}: base index is incomplete; finish build_index() "
            "(or resume it) before appending segments"
        )
    base_struct = manifest.get("config")
    if base_struct is not None and base_struct != _structural_config(cfg):
        raise ValueError(
            "segment config is structurally incompatible with the index: "
            f"index built with {base_struct}, append asked for "
            f"{_structural_config(cfg)}"
        )

    if isinstance(source, str):
        sf_dir = source
        factory = lambda doc_range=None: corpus_from_documents(  # noqa: E731
            sf_dir, doc_range
        )
        source_desc = os.path.abspath(sf_dir)
    else:
        factory = source
        source_desc = getattr(source, "__name__", "factory")

    if id_range is None:
        ids = factory().select_columns(["doc_id"])
        id_range = (int(ids.min("doc_id")), int(ids.max("doc_id")) + 1)
    lo_in, hi_in = id_range
    n_new = hi_in - lo_in
    if n_new <= 0:
        return index_dir

    seg_fp = _fingerprint(
        cfg, n_new, f"segment:{source_desc}:{lo_in}:{tag or ''}"
    )
    segments: list = manifest.setdefault("segments", [])
    seg = next((s for s in segments if s["fingerprint"] == seg_fp), None)
    if seg is not None and seg.get("complete"):
        return index_dir
    bucket = cfg.doc_bucket_size
    if seg is None:
        doc_hi_max = max(
            (int(e["doc_hi"]) for e in manifest["partitions"].values()),
            default=0,
        )
        seg = {
            "fingerprint": seg_fp,
            # bucket-aligned: a new doc must never share a (term, bucket)
            # group with an old one
            "doc_base": -(-doc_hi_max // bucket) * bucket,
            "part_lo": max(
                (int(k) for k in manifest["partitions"]), default=-1
            ) + 1,
            "n_docs": n_new,
            "num_partitions": cfg.num_partitions,
            "source": source_desc,
            "complete": False,
        }
        segments.append(seg)
        manifest["complete"] = False
        with open(manifest_path, "w") as f:
            json.dump(manifest, f, indent=1)

    doc_base, part_lo = int(seg["doc_base"]), int(seg["part_lo"])
    shift = doc_base - lo_in

    import inspect

    inner_range = "doc_range" in inspect.signature(factory).parameters

    def seg_factory(doc_range: tuple[int, int] | None = None):
        """Global-id view of the incoming corpus: prune at the read when the
        inner factory supports ranges (translated back to its ids), then
        shift the doc_id column only — external_id/path/content are
        untouched, so per-row invariants (sha256) are id-independent."""
        rng = None
        if doc_range is not None:
            rng = (doc_range[0] - shift, doc_range[1] - shift)
        ds = factory(doc_range=rng) if (rng is not None and inner_range) else factory()

        def shift_ids(t: pa.Table) -> pa.Table:
            i = t.schema.get_field_index("doc_id")
            shifted = pc.add(pc.cast(t.column("doc_id"), pa.int64()), shift)
            t = t.set_column(i, "doc_id", shifted)
            if doc_range is not None and not inner_range:
                ids = t.column("doc_id")
                t = t.filter(
                    pc.and_(
                        pc.greater_equal(ids, doc_range[0]),
                        pc.less(ids, doc_range[1]),
                    )
                )
            return t

        return ds.map_batches(shift_ids, batch_format="pyarrow")

    per_part = -(-n_new // cfg.num_partitions)
    per_part = -(-per_part // bucket) * bucket

    import threading

    man_lock = threading.Lock()

    def record(key: str, entry: dict) -> None:
        entry = dict(entry, segment=seg_fp)
        with man_lock:
            manifest["partitions"][key] = entry
            with open(manifest_path, "w") as f:
                json.dump(manifest, f, indent=1)

    def run_partition(p: int) -> None:
        gp = part_lo + p
        lo = doc_base + p * per_part
        hi = doc_base + (p + 1) * per_part
        if lo >= doc_base + n_new:
            record(str(gp), _empty_partition_entry(lo, hi))
            return
        entry = _build_one_partition(
            gp, lo, hi, seg_factory, cfg, index_dir, source_desc,
            whole=(cfg.num_partitions == 1),
        )
        record(str(gp), entry)

    pending = [
        p for p in range(cfg.num_partitions)
        if manifest["partitions"].get(str(part_lo + p), {}).get("status")
        != "done"
    ]
    if len(pending) <= 1:
        for p in pending:
            run_partition(p)
    else:
        from concurrent.futures import ThreadPoolExecutor

        _ensure_threadsafe_fs_imports()
        with ThreadPoolExecutor(max_workers=min(4, len(pending))) as pool:
            for fut in [pool.submit(run_partition, p) for p in pending]:
                fut.result()

    _finalize(index_dir, cfg)
    seg["complete"] = True
    manifest["complete"] = True
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=1)
    return index_dir


def build_index(
    source: "str | Callable[[], object]",
    out_dir: str,
    cfg: BuildConfig | None = None,
    overwrite: bool = False,
    n_docs: int | None = None,
) -> str:
    """Build (or resume) the index at ``out_dir``; returns ``out_dir``.

    ``source`` is either an sf_dir containing ``documents.parquet`` or a
    zero-arg factory returning the corpus Dataset (so each build partition
    can re-instantiate its own lazy pipeline). Pass ``n_docs`` (really:
    max doc_id + 1) to skip the bounds-discovery pass.
    """
    cfg = cfg or BuildConfig()
    if isinstance(source, str):
        sf_dir = source
        factory = lambda doc_range=None: corpus_from_documents(  # noqa: E731
            sf_dir, doc_range
        )
        source_desc = os.path.abspath(sf_dir)
    else:
        factory = source
        source_desc = getattr(source, "__name__", "factory")

    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "manifest.json")

    if n_docs is None:
        n_docs = int(factory().max("doc_id")) + 1
    fp = _fingerprint(cfg, n_docs, source_desc)

    manifest: dict = {
        "fingerprint": fp,
        "config": _structural_config(cfg),
        "partitions": {},
        "segments": [],
        "complete": False,
    }
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
    per_part = -(-n_docs // cfg.num_partitions)
    per_part = -(-per_part // cfg.doc_bucket_size) * cfg.doc_bucket_size

    import threading

    man_lock = threading.Lock()

    def record(key: str, entry: dict) -> None:
        with man_lock:
            manifest["partitions"][key] = entry
            with open(manifest_path, "w") as f:
                json.dump(manifest, f, indent=1)

    def run_partition(p: int) -> None:
        lo, hi = p * per_part, (p + 1) * per_part
        if lo >= n_docs:  # bucket-aligned rounding can overshoot the range
            record(str(p), _empty_partition_entry(lo, hi))
            return
        entry = _build_one_partition(
            p, lo, hi, factory, cfg, out_dir, source_desc,
            whole=(cfg.num_partitions == 1),
        )
        record(str(p), entry)

    pending = [
        p for p in range(cfg.num_partitions)
        if manifest["partitions"].get(str(p), {}).get("status") != "done"
    ]
    if len(pending) <= 1:
        for p in pending:
            run_partition(p)
    else:
        # partitions are independent doc-range pipelines — overlap them so
        # one partition's shuffle barrier doesn't idle the cluster
        from concurrent.futures import ThreadPoolExecutor

        _ensure_threadsafe_fs_imports()
        with ThreadPoolExecutor(max_workers=min(4, len(pending))) as pool:
            for fut in [pool.submit(run_partition, p) for p in pending]:
                fut.result()

    _finalize(out_dir, cfg)
    manifest["complete"] = True
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=1)
    return out_dir


def _finalize(out_dir: str, cfg: BuildConfig) -> None:
    """Global aggregates over the built partitions: lexicon + corpus stats
    (one pass each; stats partials collapse per batch then sum on driver)."""
    import ray.data
    from ray.data.aggregate import Sum

    postings = ray.data.read_parquet(
        os.path.join(out_dir, "postings"), columns=["field", "term", "df", "ctf"]
    )
    lexicon = postings.groupby(["field", "term"]).aggregate(
        Sum("df", alias_name="df"), Sum("ctf", alias_name="ctf")
    )
    _atomic_write(lexicon, os.path.join(out_dir, "lexicon"))

    fields = list(cfg.fields)
    # Docmap rows can be duplicated by Ray task retries (identical rows in
    # overlapping files WITHIN one partition — see _write_docmap). The
    # reader dedupes on doc_id; mirror that here so corpus sums never
    # inflate: doc ranges are disjoint ACROSS partitions, so dedupe is
    # partition-local (each task loads one partition's docmap, bounded by
    # the partition doc count — the same bound the shard reader assumes).
    # Conflicting duplicates (same doc_id, different lengths) raise loudly.
    dm_root = os.path.join(out_dir, "docmap")
    part_dirs = sorted(
        os.path.join(dm_root, d)
        for d in os.listdir(dm_root)
        if os.path.isdir(os.path.join(dm_root, d))
        # true partitions only — skip crash leftovers like part_00003.tmp
        # (same filter as the tiered-merge scan): a stale .tmp dir holds
        # near-duplicate rows of its real sibling and would double-count
        and d.startswith("part_") and d.split("_", 1)[1].isdigit()
    ) or [dm_root]
    len_cols = [f"len_{f}" for f in fields]

    def partial(batch: dict) -> pa.Table:
        import pyarrow.parquet as _pq

        out: list[pa.Table] = []
        for d in batch["dir"]:
            t = _pq.read_table(d, columns=["doc_id"] + len_cols)
            ids = t.column("doc_id").to_numpy()
            uniq, first = np.unique(ids, return_index=True)
            if len(uniq) != len(ids):
                # duplicates must be retry copies: identical len rows
                full = t.to_pandas()
                if len(full.drop_duplicates()) != len(uniq):
                    raise ValueError(
                        f"{d}: conflicting docmap duplicates (same doc_id, "
                        "different lengths) — corrupt partition output"
                    )
                t = t.take(np.sort(first))
            cols = {"n_docs": pa.array([t.num_rows], type=pa.int64())}
            for f in fields:
                c = t.column(f"len_{f}")
                cols[f"sum_{f}"] = pa.array(
                    [pc.sum(c).as_py() or 0], type=pa.int64()
                )
                cols[f"cnt_{f}"] = pa.array(
                    [pc.sum(pc.cast(pc.greater(c, 0), pa.int64())).as_py() or 0],
                    type=pa.int64(),
                )
            out.append(pa.table(cols))
        return pa.concat_tables(out)

    pdf = (
        ray.data.from_items([{"dir": d} for d in part_dirs])
        .map_batches(partial, batch_size=1)
        .to_pandas()
    )
    stats: dict = {
        "n_docs": int(pdf["n_docs"].sum()),
        "stemmer": cfg.stemmer,
        "fields": {},
    }
    for f in fields:
        stats["fields"][f] = {
            "sum_len": int(pdf[f"sum_{f}"].sum()),
            "doc_count": int(pdf[f"cnt_{f}"].sum()),
        }
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)


# --- tiered background merge (Lucene TieredMergePolicy analog) ----------

def select_tiered_merge(
    entries: "list[tuple[int, int, int]]",
    segs_per_tier: int = 4,
    max_merge_at_once: int = 4,
) -> "list[int] | None":
    """Pure merge-selection policy over (partition_key, doc_lo, n_rows)
    triples: bucket partitions into power-of-two size tiers
    (floor(log2(rows))), scan in doc order, and when ``segs_per_tier``
    doc-adjacent partitions share a tier, merge the first
    ``max_merge_at_once`` of that run. Returns the chosen partition keys
    (doc order) or None.

    The Lucene TieredMergePolicy spirit without its IO-budget scoring:
    merge EQUALS, never a giant with minnows — a merged partition jumps
    tiers, so repeated application yields the same logarithmic segment
    ladder (each doc is rewritten O(log N / log segs_per_tier) times
    total, the LSM write-amplification bound). Doc-adjacency is required
    because this engine's partitions are doc-range shards: merging
    non-adjacent partitions would break range-pruned reads and
    ``doc_lo/doc_hi`` lineage. Deterministic: first qualifying run in
    ascending doc order."""
    if segs_per_tier < 2 or max_merge_at_once < 2:
        raise ValueError("segs_per_tier and max_merge_at_once must be >= 2")
    order = sorted(entries, key=lambda e: e[1])
    run: list[int] = []
    run_tier = -1
    for key, _lo, rows in order:
        tier = max(int(rows), 1).bit_length() - 1
        if tier == run_tier:
            run.append(key)
            if len(run) >= segs_per_tier:
                return run[:max_merge_at_once]
        else:
            run, run_tier = [key], tier
    return None


def _link_tree(src: str, dst: str) -> None:
    """Hardlink-copy a partition tree (same filesystem): data files are
    shared, so staging a new root costs O(files), not O(bytes)."""
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        out = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(out, exist_ok=True)
        for fn in files:
            os.link(os.path.join(root, fn), os.path.join(out, fn))


def maybe_merge(
    index_dir: str,
    segs_per_tier: int = 4,
    max_merge_at_once: int = 4,
) -> "list[list[int]]":
    """Lucene ``TieredMergePolicy`` / background-merge analog: repeatedly
    apply :func:`select_tiered_merge` to the live partitions (base build
    plus appended segments) and coalesce each chosen run into ONE
    partition, until no tier holds ``segs_per_tier`` doc-adjacent
    partitions. Returns the list of merges performed (partition keys).

    Unlike :func:`force_merge` this is the INCREMENTAL compaction a
    long-lived index runs after every few ``add_documents`` segments:
    only the chosen partitions are rewritten (their rows re-read once and
    written once — a pure row redistribution, no posting decoded or
    re-encoded), every other partition is HARDLINKED into the staged root
    unchanged, and doc ids never change, so pending delete tombstones,
    the lexicon, and the corpus stats all remain valid — no expunge, no
    ``_finalize`` (Lucene semantics: merges don't change global stats
    either; tombstones apply at read time exactly as before).

    Crash-safe the same way force_merge is: the complete new roots are
    staged as ``postings.tiered``/``docmap.tiered`` siblings (never
    inside the live roots, which default readers scan recursively), then
    swapped in with two renames per root; a crash before the first rename
    leaves the old index intact and a re-run regenerates the staging from
    whichever tree is live. The manifest records each merge under
    ``merges`` with the swallowed partition keys for lineage."""
    import ray.data

    from .indexio import _parquet_files

    manifest_path = os.path.join(index_dir, "manifest.json")
    with open(manifest_path) as f:
        manifest = json.load(f)
    if not manifest.get("complete"):
        raise ValueError(
            f"{index_dir}: index is incomplete; finish build_index() / "
            "add_documents() before merging"
        )

    post_root = os.path.join(index_dir, "postings")
    dm_root = os.path.join(index_dir, "docmap")
    performed: list[list[int]] = []

    while True:
        live = [
            (int(k), int(e["doc_lo"]), int(e["docmap"]["rows"]))
            for k, e in manifest["partitions"].items()
            if e.get("status") == "done" and not e.get("empty")
        ]
        chosen = select_tiered_merge(live, segs_per_tier, max_merge_at_once)
        if chosen is None:
            break
        parts = manifest["partitions"]
        span_lo = min(int(parts[str(k)]["doc_lo"]) for k in chosen)
        span_hi = max(int(parts[str(k)]["doc_hi"]) for k in chosen)
        new_key = min(chosen)
        swallowed = [
            int(k)
            for k, e in parts.items()
            if e.get("empty")
            and span_lo <= int(e["doc_lo"])
            and int(e["doc_hi"]) <= span_hi
        ]
        drop = set(chosen) | set(swallowed)

        t0 = time.time()
        entry: dict = {
            "status": "done", "doc_lo": span_lo, "doc_hi": span_hi,
            "source": "tiered_merge",
        }
        for root, metric_key in ((post_root, "postings"), (dm_root, "docmap")):
            stage = root + ".tiered"
            shutil.rmtree(stage, ignore_errors=True)
            os.makedirs(stage)
            src_dirs = []
            for name in sorted(os.listdir(root)):
                if not (name.startswith("part_")
                        and name.split("_", 1)[1].isdigit()):
                    continue  # skip crash leftovers like part_00003.tmp
                key = int(name.split("_")[1])
                d = os.path.join(root, name)
                if key in drop:
                    if key in set(chosen):
                        src_dirs.append(d)
                else:
                    _link_tree(d, os.path.join(stage, name))
            merged_dir = os.path.join(stage, f"part_{new_key:05d}")
            src_files = _parquet_files(src_dirs)
            if src_files:
                _atomic_write(ray.data.read_parquet(src_files), merged_dir)
            else:
                os.makedirs(merged_dir, exist_ok=True)
            entry[metric_key] = _partition_metrics(merged_dir)

        entry["wall_s"] = round(time.time() - t0, 3)
        for root in (post_root, dm_root):
            old = root + ".pre_tiered"
            shutil.rmtree(old, ignore_errors=True)
            os.rename(root, old)
            os.rename(root + ".tiered", root)
            shutil.rmtree(old)

        for k in drop:
            parts.pop(str(k), None)
        parts[str(new_key)] = entry
        manifest.setdefault("merges", []).append(
            {
                "policy": "tiered",
                "merged": sorted(int(k) for k in chosen),
                "swallowed_empty": sorted(swallowed),
                "into": new_key,
                "doc_lo": span_lo,
                "doc_hi": span_hi,
            }
        )
        with open(manifest_path, "w") as f:
            json.dump(manifest, f, indent=1)
        performed.append(sorted(int(k) for k in chosen))

    return performed
