"""Document deletion: tombstones now, expunge compaction later.

The reference's index is Lucene, whose delete model this reproduces
(`IndexWriter.deleteDocuments` + live-docs bitset; the reference itself
only reads a merged index, Homeworks/HW6/QryEval/Idx.java:237-260):

- :func:`delete_documents` appends a tombstone parquet under
  ``<index>/deletes/``. Readers opened AFTERWARDS drop dead docs from
  every decoded posting list (term and derived/positional alike) while the
  scoring statistics stay stale (``indexio.Postings.stat_df`` — Lucene
  ``docFreq`` counts deleted docs until segments merge), so surviving
  docs' scores do not drift as deletes accumulate. Open readers keep
  serving their snapshot (reopen visibility). Derived lists
  (#near/#window/#syn) are built from the live-filtered term lists, so
  THEIR df/ctf do reflect deletes — same as Lucene, where liveDocs is
  applied at the scorer while ``docFreq`` stays segment-stale.
- :func:`expunge_deletes` is ``forceMergeDeletes``: it rewrites every
  affected partition's postings + docmap WITHOUT a shuffle — postings rows
  are already (field, term, bucket)-grouped and keys are unique within a
  partition, so each batch decodes its rows, drops dead docs, and
  re-encodes through the SAME vectorized encoder as the build
  (``EncodeMergePartition``), giving output identical to a from-scratch
  build of the surviving corpus; then lexicon + stats are re-derived (they
  shrink, like Lucene's after the merge) and the tombstones are cleared.

Scale/partitioning assumptions (explicit): the tombstone set is held as
one sorted int64 array (10^9 deletes ≈ 8 GB — beyond that, range-shard
the expunge); each partition's docmap (doc_id + per-field lengths) is
broadcast via ``ray.put`` while that partition rewrites, bounded by
``cfg.num_partitions`` exactly like the build's per-partition state. A
crash mid-expunge is safe: partition rewrites are atomic renames, the
tombstones are only cleared after every partition succeeded, and
re-filtering an already-rewritten partition is a byte-identical no-op.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from .build import (
    EncodeMergePartition,
    _atomic_write,
    _empty_postings_table,
    _partition_metrics,
)
from .indexio import _parquet_files as _parquet_files_under


def delete_documents(
    index_dir: str,
    external_ids: "list[str] | None" = None,
    doc_ids: "list[int] | np.ndarray | None" = None,
) -> int:
    """Tombstone docs by external id and/or internal doc id; returns how
    many doc ids were newly tombstoned. Unknown external ids are ignored
    (Lucene ``deleteDocuments(Term)`` semantics — no error, no effect)."""
    ids: list[np.ndarray] = []
    if doc_ids is not None and len(doc_ids):
        ids.append(np.asarray(doc_ids, dtype=np.int64))
    if external_ids:
        import ray.data

        wanted = pa.array(sorted(set(external_ids)), type=pa.string())

        def match(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t.column("external_id"), value_set=wanted))

        hits = (
            ray.data.read_parquet(
                os.path.join(index_dir, "docmap"),
                columns=["doc_id", "external_id"],
            )
            .map_batches(match, batch_format="pyarrow")
            .to_pandas()
        )
        ids.append(hits["doc_id"].to_numpy(dtype=np.int64))
    if not ids:
        return 0
    new = np.unique(np.concatenate(ids))
    del_dir = os.path.join(index_dir, "deletes")
    os.makedirs(del_dir, exist_ok=True)
    existing = _parquet_files_under([del_dir])
    if existing:
        old = pads.dataset(existing).to_table().column("doc_id").to_numpy()
        fresh = new[~np.isin(new, old)]
    else:
        fresh = new
    if not len(fresh):
        return 0
    crc = zlib.crc32(np.ascontiguousarray(fresh).tobytes())
    pq.write_table(
        pa.table({"doc_id": pa.array(fresh, type=pa.int64())}),
        os.path.join(del_dir, f"del_{crc:08x}_{len(fresh)}.parquet"),
    )
    return int(len(fresh))


def _load_tombstones(index_dir: str) -> np.ndarray:
    del_dir = os.path.join(index_dir, "deletes")
    files = _parquet_files_under([del_dir]) if os.path.isdir(del_dir) else []
    if not files:
        return np.empty(0, np.int64)
    return np.unique(pads.dataset(files).to_table().column("doc_id").to_numpy())


class _RewritePostings:
    """Batch fn over postings rows of ONE partition: decode -> drop dead
    docs -> re-encode via the build's vectorized encoder. Rows untouched by
    the tombstones pass through byte-identical (the common case)."""

    def __init__(self, dm_ref, dead: np.ndarray, skip_block_docs: int):
        self.dm_ref = dm_ref  # ray.put({'doc_id': ..., 'len_<field>': ...})
        self.dead = dead
        self.skip = skip_block_docs
        self.__name__ = "rewrite_postings"

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        from .codec import decode_segmented, decode_sorted, varbyte_decode

        dm = ray.get(self.dm_ref) if not isinstance(self.dm_ref, dict) else self.dm_ref
        dm_ids = dm["doc_id"]
        passthrough: list[int] = []
        ex: dict[str, list] = {
            "field": [], "term": [], "bucket": [], "doc_id": [], "tf": [],
            "dl": [], "pos_flat": [], "pos_counts": [],
        }
        fields = batch.column("field").to_pylist()
        terms = batch.column("term").to_pylist()
        buckets = batch.column("bucket").to_numpy()
        for i in range(batch.num_rows):
            docs = decode_sorted(batch.column("docs_vb")[i].as_py())
            pos_docs = np.searchsorted(self.dead, docs)
            pos_c = np.minimum(pos_docs, len(self.dead) - 1)
            live = self.dead[pos_c] != docs
            if live.all():
                passthrough.append(i)
                continue
            if not live.any():
                continue  # entire group dead
            tfs = varbyte_decode(batch.column("tfs_vb")[i].as_py()).astype(
                np.int64
            )
            offs = np.zeros(len(tfs) + 1, dtype=np.int64)
            np.cumsum(tfs, out=offs[1:])
            flat = decode_segmented(batch.column("pos_vb")[i].as_py(), offs)
            flat = flat[np.repeat(live, tfs)]
            docs, tfs = docs[live], tfs[live]
            n = len(docs)
            ex["field"].append(np.repeat(np.asarray([fields[i]]), n))
            ex["term"].append(np.repeat(np.asarray([terms[i]]), n))
            ex["bucket"].append(np.full(n, buckets[i], dtype=np.int32))
            ex["doc_id"].append(docs)
            ex["tf"].append(tfs)
            rows_dm = np.searchsorted(dm_ids, docs)
            ex["dl"].append(dm[f"len_{fields[i]}"][rows_dm])
            ex["pos_flat"].append(flat)
            ex["pos_counts"].append(tfs)

        out: list[pa.Table] = []
        if passthrough:
            out.append(batch.take(pa.array(passthrough, type=pa.int64())))
        if ex["doc_id"]:
            counts = np.concatenate(ex["pos_counts"])
            pos_off = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
            positions = pa.ListArray.from_arrays(
                pa.array(pos_off, type=pa.int32()),
                pa.array(
                    np.concatenate(ex["pos_flat"]).astype(np.int32),
                    type=pa.int32(),
                ),
            )
            exploded = pa.table(
                {
                    "field": pa.array(np.concatenate(ex["field"]).astype(str)),
                    "term": pa.array(np.concatenate(ex["term"]).astype(str)),
                    "bucket": pa.array(
                        np.concatenate(ex["bucket"]), type=pa.int32()
                    ),
                    "doc_id": pa.array(
                        np.concatenate(ex["doc_id"]), type=pa.int64()
                    ),
                    "tf": pa.array(np.concatenate(ex["tf"]), type=pa.int64()),
                    "dl": pa.array(np.concatenate(ex["dl"]), type=pa.int64()),
                    "positions": positions,
                }
            )
            # keys are unique per partition, so every exploded group is
            # complete within this batch — re-encoding here IS the rewrite
            out.append(EncodeMergePartition(self.skip)(exploded))
        if not out:
            return _empty_postings_table()
        return pa.concat_tables(out, promote_options="default")


def expunge_deletes(index_dir: str) -> int:
    """Rewrite postings/docmap without tombstoned docs, re-derive lexicon +
    stats (they SHRINK — post-merge observables), clear the tombstones.
    Returns the number of docs expunged. No-op when nothing is deleted."""
    import ray.data

    from .build import _finalize
    from .config import BuildConfig

    dead = _load_tombstones(index_dir)
    if not len(dead):
        return 0
    manifest_path = os.path.join(index_dir, "manifest.json")
    with open(manifest_path) as f:
        manifest = json.load(f)
    struct = manifest.get("config") or {}
    cfg = BuildConfig(
        fields=struct.get("fields") or BuildConfig().fields,
        skip_block_docs=int(struct.get("skip", BuildConfig().skip_block_docs)),
        stemmer=struct.get("stemmer", "none"),
    )

    import ray

    t0 = time.time()
    for key, entry in sorted(manifest["partitions"].items(), key=lambda kv: int(kv[0])):
        if entry.get("empty") or entry.get("status") != "done":
            continue
        lo, hi = int(entry["doc_lo"]), int(entry["doc_hi"])
        dead_p = dead[(dead >= lo) & (dead < hi)]
        if not len(dead_p):
            continue
        p = int(key)
        post_dir = os.path.join(index_dir, "postings", f"part_{p:05d}")
        dm_dir = os.path.join(index_dir, "docmap", f"part_{p:05d}")
        dm_tbl = pads.dataset(_parquet_files_under([dm_dir])).to_table()
        dm = {"doc_id": np.sort(dm_tbl.column("doc_id").to_numpy())}
        order = np.argsort(dm_tbl.column("doc_id").to_numpy())
        for name in dm_tbl.schema.names:
            if name.startswith("len_"):
                dm[name] = dm_tbl.column(name).to_numpy()[order]
        dm_ref = ray.put(dm)

        rewritten = ray.data.read_parquet(post_dir).map_batches(
            _RewritePostings(dm_ref, dead_p, cfg.skip_block_docs),
            batch_format="pyarrow",
        )
        _atomic_write(rewritten, post_dir)

        def live_only(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy()
            pos = np.minimum(np.searchsorted(dead_p, ids), len(dead_p) - 1)
            return t.filter(pa.array(dead_p[pos] != ids))

        dm_live = ray.data.read_parquet(dm_dir).map_batches(
            live_only, batch_format="pyarrow"
        )
        _atomic_write(dm_live, dm_dir)
        entry["postings"] = _partition_metrics(post_dir)
        entry["docmap"] = _partition_metrics(dm_dir)
        with open(manifest_path, "w") as f:
            json.dump(manifest, f, indent=1)

    _finalize(index_dir, cfg)
    shutil.rmtree(os.path.join(index_dir, "deletes"), ignore_errors=True)
    manifest.setdefault("expunges", []).append(
        {"deleted": int(len(dead)), "wall_s": round(time.time() - t0, 3)}
    )
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=1)
    return int(len(dead))
