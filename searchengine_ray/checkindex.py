"""Index integrity verification: the Lucene ``CheckIndex`` analog.

Lucene ships a maintenance tool (``org.apache.lucene.index.CheckIndex``)
that decodes every postings/doc-values block of an index and cross-checks
the decoded content against the segment metadata; the reference engine
inherits it through Lucene 8.1.1 (no QryEval-side code — it is part of the
index lifecycle the course outsources to Lucene, like forceMerge).

This is that tool re-expressed Ray-Data-first over our partitioned layout:

- **Stage A (distributed, one task per build partition)**: load the
  partition's postings AND its doc-range-aligned docmap together (partition
  ``part_k`` holds both sides of one doc range, so the positions-vs-doclen
  bound check needs NO broadcast and no cross-partition state — the same
  locality the shard reader uses). Decode every varbyte payload through the
  SAME codec the serving path runs and verify, vectorized per row:

  * ``df == len(docs)``, ``ctf == sum(tfs)``, ``first_doc/last_doc`` match;
  * doc ids strictly ascending, every ``tf >= 1``;
  * positions strictly ascending within each doc, ``n_positions == ctf``,
    ``0 <= position < doclen(field, doc)`` (stopword positions count toward
    doclen, so every decoded position must sit under it);
  * the per-128-doc skip metadata (``blk_last``/``blk_max_tf`` /
    ``blk_min_dl``) EQUALS its recomputation from the decoded lists — the
    block-max WAND fast path is only exact if this holds;
  * docmap doc_ids unique after the retry-dedupe rule the reader applies
    (identical duplicate rows allowed, conflicting rows raise).

  Any violation raises with the offending ``(field, term, bucket)`` — fail
  loudly, there is no ``-exorcise`` analog (at 100 TB you rebuild the one
  partition from the manifest instead of patching blind).

- **Stage B (one narrow shuffle)**: the decoded per-row ``(field, term,
  df, ctf, n_pos)`` partials aggregate per (field, term) — numeric columns
  only, the same shuffle shape as the lexicon build — then collapse into
  per-field summaries: term count, df/ctf/position sums, and an
  order-independent content checksum over ``(term, df, ctf)`` triples
  (char-polynomial mod the Mersenne prime 2^61-1, SQL-reproducible).

- **Stage C (driver, bounded)**: the same per-field summary is computed
  from the ``lexicon`` directory (one pruned column scan) and from the
  docmap partials; ``lexicon_ok`` records decoded-content == lexicon,
  ``stats_ok`` records docmap sums == ``stats.json`` — the two redundant
  aggregates an index carries.

Output: ONE row per field — ``(field, n_terms, sum_df, sum_ctf,
n_positions, doclen_sum, n_docs, checksum, lexicon_ok, stats_ok)`` — tiny,
deterministic, and derivable from the raw corpus by SQL, which is exactly
what the ``se_checkindex`` gate does.

Scale notes: work is one decode pass over the postings bytes (the cheapest
full-index operation that exists) + one numeric shuffle; no stage holds
more than one partition's payload, and the checksum loop is bounded by the
partition VOCABULARY, not the corpus.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads

from .codec import decode_segmented, decode_sorted, varbyte_decode

#: Mersenne prime modulus for the content checksum — HUGEINT-safe in
#: DuckDB (intermediates stay under 2^82) and int64-representable.
CHECKSUM_MOD = (1 << 61) - 1
_TERM_MUL = 131
_ROW_MUL = 1000003
_DF_MUL = 8191


def term_triple_checksum(terms, dfs, ctfs) -> int:
    """Order-independent checksum of (term, df, ctf) triples:
    ``sum((poly131(term) * 1000003 + df * 8191 + ctf) mod M) mod M``.
    The per-term char loop is vocabulary-bounded (never corpus-bounded);
    the DuckDB replica is a list_reduce over ``string_split(term, '')``."""
    total = 0
    for term, df, ctf in zip(terms, dfs, ctfs):
        h = 0
        for ch in term:
            h = (h * _TERM_MUL + ord(ch)) % CHECKSUM_MOD
        total += (h * _ROW_MUL + int(df) * _DF_MUL + int(ctf)) % CHECKSUM_MOD
    return total % CHECKSUM_MOD


def _parquet_files(root: str) -> list[str]:
    out = []
    for base, _dirs, files in os.walk(root):
        out.extend(
            os.path.join(base, f) for f in files if f.endswith(".parquet")
        )
    return sorted(out)


def _part_dirs(index_dir: str, sub: str) -> list[str]:
    root = os.path.join(index_dir, sub)
    parts = sorted(
        os.path.join(root, d)
        for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d))
        # true partitions only — skip crash leftovers like part_00003.tmp
        and d.startswith("part_") and d.split("_", 1)[1].isdigit()
    )
    return parts or [root]


def _docmap_fingerprint(dm_dir: str) -> tuple:
    """(name, size, mtime_ns) of every parquet in the docmap dir — the cache
    key component that invalidates when expunge_deletes/force_merge rewrite
    the partition content at the same path."""
    return tuple(
        (os.path.basename(p), st.st_size, st.st_mtime_ns)
        for p in _parquet_files(dm_dir)
        for st in (os.stat(p),)
    )


def _load_docmap_cached(dm_dir: str, len_cols_key: tuple):
    """Per-worker memo of :func:`_load_docmap` — a partition's ~file-count
    verify tasks land on few workers and each needs the same docmap. Keyed
    on (path, file fingerprint, columns) rather than path alone because
    expunge_deletes and force_merge rewrite docmap content at the SAME
    path, so a long-lived worker must not serve a pre-mutation docmap to a
    post-mutation check. Bounded: a worker holds at most 4 partition
    docmaps."""
    import functools

    global _DM_CACHE
    try:
        cache = _DM_CACHE
    except NameError:
        cache = _DM_CACHE = functools.lru_cache(maxsize=4)(
            lambda d, fp, k: _load_docmap(d, list(k))
        )
    return cache(dm_dir, _docmap_fingerprint(dm_dir), len_cols_key)


def _load_docmap(dm_dir: str, len_cols: list[str]):
    """(sorted doc_ids, {field: doclen aligned}) with the reader's
    retry-dedupe rule: identical duplicate rows collapse, conflicting
    duplicates raise."""
    t = pads.dataset(_parquet_files(dm_dir)).to_table(
        columns=["doc_id"] + len_cols
    )
    ids = t.column("doc_id").to_numpy()
    order = np.argsort(ids, kind="stable")
    ids_s = ids[order]
    lens = {c: t.column(c).to_numpy()[order] for c in len_cols}
    if len(ids_s) > 1:
        dup = ids_s[1:] == ids_s[:-1]
        if dup.any():
            for c in len_cols:
                if not (lens[c][1:][dup] == lens[c][:-1][dup]).all():
                    raise ValueError(
                        f"{dm_dir}: conflicting docmap duplicates (same "
                        f"doc_id, different {c}) — corrupt partition"
                    )
            keep = np.empty(len(ids_s), dtype=bool)
            keep[0] = True
            keep[1:] = ~dup
            ids_s = ids_s[keep]
            lens = {c: v[keep] for c, v in lens.items()}
    return ids_s, lens


def _verify_rows(
    post: pa.Table,
    dm_ids: np.ndarray,
    dm_lens: dict,
    skip: int,
    where: str,
) -> pa.Table:
    """Decode + verify every postings row of one partition; return the
    (field, term, df, ctf, n_pos) partials."""
    fields = post.column("field").to_pylist()
    terms = post.column("term").to_pylist()
    buckets = post.column("bucket").to_numpy()
    dfs = post.column("df").to_numpy()
    ctfs = post.column("ctf").to_numpy()
    firsts = post.column("first_doc").to_numpy()
    lasts = post.column("last_doc").to_numpy()
    n_pos_out = np.zeros(len(fields), dtype=np.int64)
    for i in range(post.num_rows):
        key = f"{where} ({fields[i]!r}, {terms[i]!r}, bucket {buckets[i]})"
        docs = decode_sorted(post.column("docs_vb")[i].as_py())
        tfs = varbyte_decode(post.column("tfs_vb")[i].as_py()).astype(np.int64)
        if len(docs) != dfs[i] or len(tfs) != dfs[i]:
            raise ValueError(f"{key}: decoded df {len(docs)} != stored {dfs[i]}")
        if int(tfs.sum()) != ctfs[i]:
            raise ValueError(f"{key}: decoded ctf {tfs.sum()} != stored {ctfs[i]}")
        if dfs[i] == 0:
            raise ValueError(f"{key}: empty postings row")
        if (np.diff(docs) <= 0).any():
            raise ValueError(f"{key}: doc ids not strictly ascending")
        if docs[0] != firsts[i] or docs[-1] != lasts[i]:
            raise ValueError(f"{key}: first/last doc mismatch")
        if (tfs < 1).any():
            raise ValueError(f"{key}: tf < 1")
        offs = np.zeros(len(tfs) + 1, dtype=np.int64)
        np.cumsum(tfs, out=offs[1:])
        flat = decode_segmented(post.column("pos_vb")[i].as_py(), offs)
        if len(flat) != ctfs[i]:
            raise ValueError(f"{key}: {len(flat)} positions != ctf {ctfs[i]}")
        n_pos_out[i] = len(flat)
        if len(flat):
            if flat.min() < 0:
                raise ValueError(f"{key}: negative position")
            drops = np.where(np.diff(flat) <= 0)[0] + 1
            if len(drops) and not np.isin(drops, offs[1:-1]).all():
                raise ValueError(f"{key}: positions not ascending within a doc")
        # positions bound: last position of each doc < doclen (stopword
        # positions count toward doclen, so strict < always holds)
        rows = np.searchsorted(dm_ids, docs)
        if (
            rows.max(initial=-1) >= len(dm_ids)
            or not (dm_ids[np.minimum(rows, len(dm_ids) - 1)] == docs).all()
        ):
            raise ValueError(f"{key}: posting doc missing from docmap")
        dl = dm_lens[f"len_{fields[i]}"][rows]
        if (flat[offs[1:] - 1] >= dl).any():
            raise ValueError(f"{key}: position >= doclen")
        # skip metadata == recomputation from the decoded lists
        starts = np.arange(0, len(docs), skip, dtype=np.int64)
        blk_last = post.column("blk_last")[i].as_py()
        blk_max_tf = post.column("blk_max_tf")[i].as_py()
        blk_min_dl = post.column("blk_min_dl")[i].as_py()
        exp_last = docs[np.minimum(starts + skip, len(docs)) - 1]
        if (
            len(blk_last) != len(starts)
            or (np.asarray(blk_last, np.int64) != exp_last).any()
            or (
                np.asarray(blk_max_tf, np.int64)
                != np.maximum.reduceat(tfs, starts)
            ).any()
            or (
                np.asarray(blk_min_dl, np.int64)
                != np.minimum.reduceat(dl, starts)
            ).any()
        ):
            raise ValueError(f"{key}: skip/block-max metadata mismatch")
    return pa.table(
        {
            "field": pa.array(fields, type=pa.string()),
            "term": pa.array(terms, type=pa.string()),
            "df": pa.array(dfs, type=pa.int64()),
            "ctf": pa.array(ctfs, type=pa.int64()),
            "n_pos": pa.array(n_pos_out, type=pa.int64()),
        }
    )


def _field_summary(tbl: pa.Table) -> dict:
    """{field: (n_terms, sum_df, sum_ctf, sum_pos, checksum)} from a
    per-(field, term) aggregate table (n_pos column optional)."""
    out: dict[str, list] = {}
    fields = tbl.column("field").to_pylist()
    terms = tbl.column("term").to_pylist()
    dfs = tbl.column("df").to_numpy()
    ctfs = tbl.column("ctf").to_numpy()
    npos = (
        tbl.column("n_pos").to_numpy()
        if "n_pos" in tbl.schema.names
        else ctfs
    )
    for f in sorted(set(fields)):
        m = np.asarray([x == f for x in fields], dtype=bool)
        out[f] = [
            int(m.sum()),
            int(dfs[m].sum()),
            int(ctfs[m].sum()),
            int(npos[m].sum()),
            term_triple_checksum(
                [t for t, k in zip(terms, m) if k], dfs[m], ctfs[m]
            ),
        ]
    return out


def check_index(index_dir: str) -> pa.Table:
    """Full-index verify; returns the per-field summary table (see module
    docstring). Raises on ANY structural violation."""
    import ray.data
    from ray.data.aggregate import Sum

    with open(os.path.join(index_dir, "stats.json")) as f:
        stats = json.load(f)
    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    skip = int((manifest.get("config") or {}).get("skip", 128))
    len_cols = [f"len_{f}" for f in stats["fields"]]

    post_parts = _part_dirs(index_dir, "postings")
    dm_parts = _part_dirs(index_dir, "docmap")
    if len(post_parts) != len(dm_parts):
        raise ValueError(
            f"{index_dir}: {len(post_parts)} postings partitions vs "
            f"{len(dm_parts)} docmap partitions"
        )
    # work unit = one postings FILE (a partition holds ~merge_partitions
    # files), paired with its partition's docmap dir — a single-partition
    # index still fans out across every core instead of one task. The
    # docmap re-loads once per file; it is bounded by the partition's doc
    # count (the same bound the shard reader assumes), and rows are never
    # split across files, so the per-(field, term, bucket) row invariants
    # verify whole in exactly one task.
    pairs = [
        (f, d)
        for p, d in zip(post_parts, dm_parts)
        for f in _parquet_files(p)
    ]

    def verify_part(batch: dict) -> pa.Table:
        outs = []
        for post_file, dm_dir in zip(batch["post"], batch["dm"]):
            dm_ids, dm_lens = _load_docmap_cached(dm_dir, tuple(len_cols))
            post = pads.dataset([post_file]).to_table()
            outs.append(_verify_rows(post, dm_ids, dm_lens, skip, post_file))
        return pa.concat_tables(outs)

    partials = (
        ray.data.from_items(
            [{"post": p, "dm": d} for p, d in pairs]
        )
        .map_batches(verify_part, batch_size=1, batch_format="numpy")
        .groupby(["field", "term"])
        .aggregate(
            Sum("df", alias_name="df"),
            Sum("ctf", alias_name="ctf"),
            Sum("n_pos", alias_name="n_pos"),
        )
    )

    # per-field fold of the (field, term) totals — batch partials then a
    # driver merge, bounded by n_fields x n_batches
    def field_partial(batch: pa.Table) -> pa.Table:
        s = _field_summary(batch)
        return pa.table(
            {
                "field": pa.array(list(s), type=pa.string()),
                "n_terms": pa.array([v[0] for v in s.values()], pa.int64()),
                "sum_df": pa.array([v[1] for v in s.values()], pa.int64()),
                "sum_ctf": pa.array([v[2] for v in s.values()], pa.int64()),
                "n_positions": pa.array([v[3] for v in s.values()], pa.int64()),
                "checksum": pa.array([v[4] for v in s.values()], pa.int64()),
            }
        )

    decoded: dict[str, list] = {}
    try:
        batches = list(
            partials.map_batches(
                field_partial, batch_format="pyarrow"
            ).iter_batches(batch_format="pyarrow")
        )
    except Exception as e:
        # Ray serializes away the task-side exception's __cause__ chain;
        # the original ValueError survives only as text inside the remote
        # traceback. Re-raise it as a clean ValueError so callers (and
        # tests) see the corruption message, not a RayTaskError wrapper.
        for line in reversed(str(e).splitlines()):
            if line.startswith("ValueError: "):
                raise ValueError(line[len("ValueError: "):]) from e
        raise
    for b in batches:
        for i in range(b.num_rows):
            f = b.column("field")[i].as_py()
            row = [b.column(c)[i].as_py() for c in (
                "n_terms", "sum_df", "sum_ctf", "n_positions", "checksum")]
            if f in decoded:
                acc = decoded[f]
                acc[0] += row[0]
                acc[1] += row[1]
                acc[2] += row[2]
                acc[3] += row[3]
                acc[4] = (acc[4] + row[4]) % CHECKSUM_MOD
            else:
                decoded[f] = row

    # lexicon side: one pruned scan of the already-aggregated lexicon
    lex = pads.dataset(
        _parquet_files(os.path.join(index_dir, "lexicon"))
    ).to_table(columns=["field", "term", "df", "ctf"])
    lex_summary = _field_summary(lex)

    # docmap side: per-field length sums + doc counts. Distributed, one
    # task per partition — Stage A's workers already hold each docmap in
    # _load_docmap_cached, so on warm workers this pass re-reads nothing;
    # the driver folds only (n_parts x n_fields) scalar rows.
    def docmap_partial(batch: dict) -> pa.Table:
        parts, fs, sums, nds = [], [], [], []
        for dm_dir in batch["dm"]:
            dm_ids, dm_lens = _load_docmap_cached(dm_dir, tuple(len_cols))
            for f in stats["fields"]:
                parts.append(dm_dir)
                fs.append(f)
                sums.append(int(dm_lens[f"len_{f}"].sum()))
                nds.append(len(dm_ids))
        return pa.table(
            {
                "part": pa.array(parts, type=pa.string()),
                "field": pa.array(fs, type=pa.string()),
                "len_sum": pa.array(sums, type=pa.int64()),
                "part_docs": pa.array(nds, type=pa.int64()),
            }
        )

    doclen_sum = {f: 0 for f in stats["fields"]}
    n_docs = 0
    seen_parts: set[str] = set()
    for b in (
        ray.data.from_items([{"dm": d} for d in dm_parts])
        .map_batches(docmap_partial, batch_size=1, batch_format="numpy")
        .iter_batches(batch_format="pyarrow")
    ):
        for i in range(b.num_rows):
            part = b.column("part")[i].as_py()
            doclen_sum[b.column("field")[i].as_py()] += b.column(
                "len_sum"
            )[i].as_py()
            if part not in seen_parts:
                seen_parts.add(part)
                n_docs += b.column("part_docs")[i].as_py()

    rows = []
    for f in sorted(stats["fields"]):
        d = decoded.get(f, [0, 0, 0, 0, 0])
        lx = lex_summary.get(f, [0, 0, 0, 0, 0])
        lexicon_ok = d[:3] == lx[:3] and d[4] == lx[4]
        stats_ok = (
            doclen_sum[f] == int(stats["fields"][f]["sum_len"])
            and n_docs == int(stats["n_docs"])
        )
        rows.append(
            (f, d[0], d[1], d[2], d[3], doclen_sum[f], n_docs, d[4],
             lexicon_ok, stats_ok)
        )
    names = [
        "field", "n_terms", "sum_df", "sum_ctf", "n_positions",
        "doclen_sum", "n_docs", "checksum", "lexicon_ok", "stats_ok",
    ]
    cols = list(zip(*rows)) if rows else [[]] * len(names)
    types = [pa.string()] + [pa.int64()] * 7 + [pa.bool_(), pa.bool_()]
    return pa.table(
        {n: pa.array(list(c), type=t) for n, c, t in zip(names, cols, types)}
    )
