"""Index reading: decoded posting lists, docmap, corpus statistics.

The query-side analog of the reference's static ``Idx`` accessors
(`Homeworks/HW6/QryEval/Idx.java:60-228`) and ``InvList`` loader
(`InvList.java:106-150`), backed by the Parquet index that build.py wrote.

One :class:`InvertedIndex` instance is the per-actor state of the query
actor pool (loaded once in ``__init__``, reused across query batches). It
can be opened on the full index or on a subset of doc-range partitions
(``parts=``) — the multi-node serving path opens one doc-shard per actor.
Decoded postings are cached per (field, term).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads

from .codec import decode_segmented, decode_sorted, varbyte_decode


@dataclass
class Postings:
    """Decoded positional posting list (reference ``InvList``):
    docid-ascending, positions ascending within each doc.

    ``df``/``ctf`` are ALWAYS the live array invariants (len(doc_ids),
    sum(tfs)) — code that clips/iterates arrays relies on that.
    ``stat_df``/``stat_ctf`` are the STATISTICS scoring should use for
    idf/priors; with tombstoned deletes they keep counting deleted docs
    until ``expunge_deletes`` (Lucene semantics: ``docFreq`` ignores the
    live-docs bitset until segments merge), so surviving docs' scores do
    not drift as deletes accumulate. They default to df/ctf."""

    doc_ids: np.ndarray  # int64, ascending
    tfs: np.ndarray  # int64
    pos_offsets: "np.ndarray | None"  # int64, len = df + 1 (lazy)
    positions: "np.ndarray | None"  # int64, flat (lazy; see postings())
    df: int
    ctf: int
    stat_df: int = -1
    stat_ctf: int = -1
    #: set only when tombstones removed rows: raw (pre-filter) tfs + keep
    #: mask, needed by the lazy position decode (encoded runs cover deleted
    #: docs too)
    _raw_tfs: "np.ndarray | None" = None
    _keep: "np.ndarray | None" = None

    def __post_init__(self) -> None:
        if self.stat_df < 0:
            self.stat_df = self.df
        if self.stat_ctf < 0:
            self.stat_ctf = self.ctf

    def positions_for(self, i: int) -> np.ndarray:
        return self.positions[self.pos_offsets[i] : self.pos_offsets[i + 1]]


EMPTY_POSTINGS = Postings(
    np.empty(0, np.int64), np.empty(0, np.int64), np.zeros(1, np.int64),
    np.empty(0, np.int64), 0, 0,
)


def _parquet_files(paths: list[str]) -> list[str]:
    """pyarrow.dataset wants file paths when given a list; glob dirs."""
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, names in os.walk(p):
                files.extend(
                    os.path.join(root, n) for n in names if n.endswith(".parquet")
                )
        else:
            files.append(p)
    return sorted(files)


class InvertedIndex:
    def __init__(self, index_dir: str, parts: list[int] | None = None):
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "stats.json")) as f:
            self.stats = json.load(f)
        #: analyzer profile the index was built with; query analysis must
        #: stem identically (see stem.py)
        self.stemmer_name: str = self.stats.get("stemmer", "none")

        post_dir = os.path.join(index_dir, "postings")
        doc_dir = os.path.join(index_dir, "docmap")
        if parts is None:
            post_paths: list[str] = [post_dir]
            doc_paths: list[str] = [doc_dir]
        else:
            post_paths = [os.path.join(post_dir, f"part_{p:05d}") for p in parts]
            doc_paths = [os.path.join(doc_dir, f"part_{p:05d}") for p in parts]

        # tombstones (delete.py): sorted doc_ids removed from every decoded
        # list below; global stats stay stale until expunge (Lucene
        # live-docs semantics). Readers opened BEFORE a delete keep serving
        # their snapshot — visibility is at open time, like a Lucene reopen.
        del_dir = os.path.join(index_dir, "deletes")
        del_files = _parquet_files([del_dir]) if os.path.isdir(del_dir) else []
        if del_files:
            dt = pads.dataset(del_files).to_table()
            self._deleted = np.unique(dt.column("doc_id").to_numpy())
        else:
            self._deleted = np.empty(0, np.int64)

        self._postings_tbl = pads.dataset(_parquet_files(post_paths)).to_table()
        # (field, term) -> row indices ordered by ascending bucket; buckets are
        # disjoint doc ranges, so concatenation preserves docid order.
        fields = self._postings_tbl.column("field").to_pylist()
        terms = self._postings_tbl.column("term").to_pylist()
        buckets = self._postings_tbl.column("bucket").to_numpy()
        order = np.argsort(buckets, kind="stable")
        self._key_rows: dict[tuple[str, str], list[int]] = {}
        for i in order:
            self._key_rows.setdefault((fields[i], terms[i]), []).append(int(i))
        self._cache: dict[tuple[str, str], Postings] = {}

        dm = pads.dataset(_parquet_files(doc_paths)).to_table()
        dm_ids = dm.column("doc_id").to_numpy()
        dorder = np.argsort(dm_ids)
        # dedupe: a build retry that re-chunked its batches can leave the
        # same doc in two dm_* files with identical rows (build.py
        # _write_docmap); keep the first
        if len(dm_ids) > 1:
            sorted_ids = dm_ids[dorder]
            keep = np.empty(len(sorted_ids), dtype=bool)
            keep[0] = True
            keep[1:] = sorted_ids[1:] != sorted_ids[:-1]
            dorder = dorder[keep]
        self._doc_ids = dm_ids[dorder]
        self._external_ids = np.asarray(dm.column("external_id").to_pylist(), dtype=object)[dorder]
        self._sha256 = np.asarray(dm.column("sha256").to_pylist(), dtype=object)[dorder]
        # integer rank of each doc's external_id in lexicographic order:
        # the score tie-break (`ScoreList.java:90-97`) becomes integer
        # comparisons instead of per-query wide-string sorts
        eorder = np.argsort(self._external_ids.astype(str), kind="stable")
        self._ext_rank = np.empty(len(eorder), dtype=np.int64)
        self._ext_rank[eorder] = np.arange(len(eorder), dtype=np.int64)
        self._doclens = {
            name.removeprefix("len_"): dm.column(name).to_numpy()[dorder]
            for name in dm.schema.names
            if name.startswith("len_")
        }
        self.n_local_docs = len(self._doc_ids)
        # numeric doc values (ES doc_values / Lucene NumericDocValues
        # analog): attached at serve time from the corpus table, loaded
        # lazily per column for THIS shard's doc span only (parquet
        # row-group pushdown), cached aligned to self._doc_ids
        self._docvalues_dir: "str | None" = None
        self._dv_cache: dict[str, np.ndarray] = {}
        self._dv_valid: dict[str, np.ndarray] = {}

    def attach_docvalues(self, source_dir: "str | None") -> None:
        """Point numeric doc-values lookups at a corpus directory holding
        ``documents.parquet`` keyed by ``doc_id`` (the build's external
        corpus key). No I/O happens until a ``#range`` query runs.
        Re-attaching a different directory drops the per-column cache so a
        live reader never serves the previous corpus' values."""
        if source_dir != self._docvalues_dir:
            self._dv_cache.clear()
            self._dv_valid.clear()
            # derived-from-doc-values caches must drop with the columns
            # they were computed from (indexsort.sort_order attaches one)
            if hasattr(self, "_sortmap_cache"):
                self._sortmap_cache.clear()
        self._docvalues_dir = source_dir

    def set_runtime_fields(
        self, fields: "dict[str, tuple[str, str, float]] | None"
    ) -> None:
        """ES runtime fields (runtime_mappings): computed numeric doc
        values named at QUERY time, evaluated lazily from a stored
        column — usable anywhere a doc-values column is (#range
        filters, function_score, field sorts). A field is the pure-data
        triple (source_column, op, operand) with op in add | sub | mul
        | div | floordiv — data, not lambdas, so the definition ships to
        actors and replays verbatim in SQL. Validity follows the source
        column; derived caches drop like on re-attach."""
        ops = {"add", "sub", "mul", "div", "floordiv"}
        for name, spec in (fields or {}).items():
            if len(spec) != 3 or spec[1] not in ops:
                raise ValueError(
                    f"runtime field {name!r}: spec must be (source_column, "
                    f"op in {sorted(ops)}, operand), got {spec!r}"
                )
        self._runtime_fields = dict(fields or {})
        self._dv_cache.clear()
        self._dv_valid.clear()
        if hasattr(self, "_sortmap_cache"):
            self._sortmap_cache.clear()

    def _ensure_docvalues(self, column: str) -> None:
        """Lazy-load one numeric doc-values column for THIS shard's doc
        span (parquet row-group pushdown), cached aligned to
        ``self._doc_ids`` with a validity mask."""
        rt = getattr(self, "_runtime_fields", None)
        if rt and column in rt and column not in self._dv_cache:
            src, op, operand = rt[column]
            if src in rt:
                raise ValueError(
                    f"runtime field {column!r}: source {src!r} must be a "
                    "stored column (no chaining)"
                )
            self._ensure_docvalues(src)
            v = self._dv_cache[src]
            x = float(operand)
            if op == "add":
                out = v + x
            elif op == "sub":
                out = v - x
            elif op == "mul":
                out = v * x
            elif op == "div":
                out = v / x
            else:
                out = np.floor_divide(v, x)
            self._dv_cache[column] = out
            self._dv_valid[column] = self._dv_valid[src].copy()
            return
        if self._docvalues_dir is None:
            raise ValueError(
                "numeric doc values are not attached: construct the engine "
                "with docvalues_dir=<corpus dir with documents.parquet>"
            )
        if column not in self._dv_cache:
            import pyarrow.parquet as _pq

            path = os.path.join(self._docvalues_dir, "documents.parquet")
            if column not in _pq.read_schema(path).names:
                raise ValueError(
                    f"unknown doc-values column {column!r} in {path}"
                )
            if not len(self._doc_ids):
                self._dv_cache[column] = np.empty(0, np.float64)
                self._dv_valid[column] = np.empty(0, bool)
            else:
                tbl = _pq.read_table(
                    path,
                    columns=["doc_id", column],
                    filters=[
                        ("doc_id", ">=", int(self._doc_ids[0])),
                        ("doc_id", "<=", int(self._doc_ids[-1])),
                    ],
                )
                ids = tbl.column("doc_id").to_numpy()
                vals = tbl.column(column).to_numpy(zero_copy_only=False)
                if not np.issubdtype(np.asarray(vals).dtype, np.number):
                    raise ValueError(
                        f"doc-values column {column!r} is not numeric"
                    )
                if len(ids) == 0:
                    # zero overlap with this shard's doc span (e.g. a
                    # segment appended from another source): every doc is
                    # missing-field -> matches no range
                    out = np.full(len(self._doc_ids), np.nan)
                    valid = np.zeros(len(self._doc_ids), dtype=bool)
                else:
                    order = np.argsort(ids)
                    ids = ids[order]
                    vals = np.asarray(vals, np.float64)[order]
                    pos = np.searchsorted(ids, self._doc_ids)
                    pos_c = np.clip(pos, 0, len(ids) - 1)
                    valid = (pos < len(ids)) & (
                        ids[pos_c] == self._doc_ids
                    )
                    out = np.full(len(self._doc_ids), np.nan)
                    out[valid] = vals[pos_c[valid]]
                self._dv_cache[column] = out
                self._dv_valid[column] = valid

    def docvalues_docs_in_range(
        self, column: str, lo: float, hi: float
    ) -> np.ndarray:
        """LIVE shard doc_ids whose numeric doc value lies in [lo, hi].

        Docs absent from the corpus table (e.g. segment-appended rows
        from another source) carry no value and match no range — the ES
        missing-field semantics. Deleted docs never match."""
        self._ensure_docvalues(column)
        v = self._dv_cache[column]
        ok = self._dv_valid[column] & (v >= lo) & (v <= hi)
        docs = self._doc_ids[ok]
        keep = self._live_mask(docs)
        return docs if keep is None else docs[keep]

    def docvalues_for_docs(
        self, column: str, docs: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """(values, valid) aligned to ``docs`` — NaN / False where the doc
        carries no value for ``column`` (the ES missing-field case). Used
        by per-doc score functions (function_score); ``docs`` must be
        shard doc_ids (as returned by evaluation)."""
        self._ensure_docvalues(column)
        docs = np.asarray(docs, dtype=np.int64)
        pos = np.searchsorted(self._doc_ids, docs)
        pos_c = np.clip(pos, 0, max(len(self._doc_ids) - 1, 0))
        here = (
            (pos < len(self._doc_ids)) & (self._doc_ids[pos_c] == docs)
            if len(self._doc_ids)
            else np.zeros(len(docs), dtype=bool)
        )
        vals = np.full(len(docs), np.nan)
        valid = np.zeros(len(docs), dtype=bool)
        vals[here] = self._dv_cache[column][pos_c[here]]
        valid[here] = self._dv_valid[column][pos_c[here]]
        return vals, valid

    # ---- corpus statistics (Idx.java:60-63, 198-228) ----
    @property
    def num_docs(self) -> int:
        return int(self.stats["n_docs"])

    def doc_count(self, field: str) -> int:
        return int(self.stats["fields"][field]["doc_count"])

    def sum_field_lengths(self, field: str) -> int:
        return int(self.stats["fields"][field]["sum_len"])

    # ---- per-doc attributes ----
    def _rows_for(self, doc_ids: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self._doc_ids, doc_ids)
        idx = np.clip(idx, 0, max(0, self.n_local_docs - 1))
        if len(idx) and not (self._doc_ids[idx] == doc_ids).all():
            missing = doc_ids[self._doc_ids[idx] != doc_ids]
            raise KeyError(
                f"doc_ids not in this index's docmap (first: {missing[:5]}); "
                "callers must only pass ids present in the opened partitions"
            )
        return idx

    def doclen(self, field: str, doc_ids: np.ndarray) -> np.ndarray:
        return self._doclens[field][self._rows_for(np.asarray(doc_ids, np.int64))]

    def external_ids(self, doc_ids: np.ndarray) -> np.ndarray:
        return self._external_ids[self._rows_for(np.asarray(doc_ids, np.int64))]

    def ext_ranks(self, doc_ids: np.ndarray) -> np.ndarray:
        """Lexicographic rank of external_id (int64) — tie-break key."""
        return self._ext_rank[self._rows_for(np.asarray(doc_ids, np.int64))]

    def all_doc_ids(self) -> np.ndarray:
        return self._doc_ids

    # ---- postings ----
    def postings(
        self, field: str, term: str, need_positions: bool = True
    ) -> Postings:
        """Decoded postings, cached. Position decoding is LAZY: pure scoring
        paths (BM25/Indri/Boolean over tf) pass ``need_positions=False`` and
        skip the most expensive decode; a later positional request upgrades
        the cached entry in place."""
        if field not in self.stats["fields"]:
            # the parser's syntactic whitelist includes fields (e.g. inlink,
            # `QryParser.java:162-167`) this index may not have been built
            # with; fail loudly instead of silently matching nothing
            raise ValueError(
                f"field {field!r} is not in this index (built fields: "
                f"{sorted(self.stats['fields'])}); map a corpus column to it "
                "in BuildConfig.fields to serve it"
            )
        key = (field, term)
        p = self._cache.get(key)
        if p is not None and (not need_positions or p.positions is not None):
            return p
        rows = self._key_rows.get(key)
        if not rows:
            self._cache[key] = EMPTY_POSTINGS
            return EMPTY_POSTINGS
        if p is None:
            docs_parts, tfs_parts = [], []
            for r in rows:
                docs_parts.append(
                    decode_sorted(self._postings_tbl.column("docs_vb")[r].as_py())
                )
                tfs_parts.append(
                    varbyte_decode(
                        self._postings_tbl.column("tfs_vb")[r].as_py()
                    ).astype(np.int64)
                )
            doc_ids = np.concatenate(docs_parts)
            tfs = np.concatenate(tfs_parts)
            raw_df, raw_ctf = len(doc_ids), int(tfs.sum())
            keep = self._live_mask(doc_ids)
            if keep is None:
                p = Postings(
                    doc_ids=doc_ids,
                    tfs=tfs,
                    pos_offsets=None,
                    positions=None,
                    df=raw_df,
                    ctf=raw_ctf,
                )
            else:
                p = Postings(
                    doc_ids=doc_ids[keep],
                    tfs=tfs[keep],
                    pos_offsets=None,
                    positions=None,
                    df=int(keep.sum()),
                    ctf=int(tfs[keep].sum()),
                    # stale stats: deleted docs keep counting (Lucene docFreq)
                    stat_df=raw_df,
                    stat_ctf=raw_ctf,
                    _raw_tfs=tfs,
                    _keep=keep,
                )
            self._cache[key] = p
        if need_positions and p.positions is None:
            # decode the RAW per-doc runs (encoded offsets cover deleted
            # docs), then drop deleted docs' spans in one flat mask
            raw_tfs = p._raw_tfs if p._keep is not None else p.tfs
            pos_parts = []
            i0 = 0
            for r in rows:
                n_docs_row = int(self._postings_tbl.column("df")[r].as_py())
                tfs_row = raw_tfs[i0 : i0 + n_docs_row]
                i0 += n_docs_row
                offs = np.zeros(len(tfs_row) + 1, dtype=np.int64)
                np.cumsum(tfs_row, out=offs[1:])
                pos_parts.append(
                    decode_segmented(
                        self._postings_tbl.column("pos_vb")[r].as_py(), offs
                    )
                )
            flat = (
                np.concatenate(pos_parts) if pos_parts
                else np.empty(0, np.int64)
            )
            if p._keep is not None:
                flat = flat[np.repeat(p._keep, raw_tfs)]
            p.positions = flat
            offs = np.zeros(p.df + 1, dtype=np.int64)
            np.cumsum(p.tfs, out=offs[1:])
            p.pos_offsets = offs
        return p

    def _live_mask(self, doc_ids: np.ndarray) -> "np.ndarray | None":
        """Boolean keep-mask vs the tombstone set, or None when untouched."""
        if not len(self._deleted) or not len(doc_ids):
            return None
        idx = np.searchsorted(self._deleted, doc_ids)
        idx_c = np.minimum(idx, len(self._deleted) - 1)
        dead = self._deleted[idx_c] == doc_ids
        if not dead.any():
            return None
        return ~dead

    def block_metadata(self, field: str, term: str):
        """Per-block (last_doc, max_tf, min_dl) skip metadata for block-max
        WAND, concatenated across bucket rows in doc order."""
        rows = self._key_rows.get((field, term))
        if not rows:
            return None
        last, max_tf, min_dl = [], [], []
        for r in rows:
            last.extend(self._postings_tbl.column("blk_last")[r].as_py())
            max_tf.extend(self._postings_tbl.column("blk_max_tf")[r].as_py())
            min_dl.extend(self._postings_tbl.column("blk_min_dl")[r].as_py())
        return (
            np.asarray(last, np.int64),
            np.asarray(max_tf, np.int64),
            np.asarray(min_dl, np.int64),
        )

    def vocabulary(self, field: str | None = None) -> list[tuple[str, str]]:
        keys = self._key_rows.keys()
        return [k for k in keys if field is None or k[0] == field]
