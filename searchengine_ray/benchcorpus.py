"""Deterministic bench-scale corpus: the documents table replicated
``factor`` times with shifted doc_ids and per-replica repo names
(FIXTURES.md bench scale; the driver's documents table itself does not grow
with sf — no external data, fully deterministic).

The replicated corpus is WRITTEN TO PARQUET ONCE (cached under /tmp, keyed
by sf_dir+factor) and factories read it back with explicit block splitting.
Two reasons: (a) a real 100 TB input IS parquet on disk, so the build
benchmark should measure read->build, not an in-flight Python replication;
(b) Ray fuses map stages and sizes tasks by PRE-expansion block bytes — an
inline 160x replicate ran the whole tokenize stage in 5 tasks regardless of
cluster size (measured via ds.stats()), silently capping build scaling.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .corpus import derive_corpus_batch


def _replica_cache_dir(sf_dir: str, factor: int) -> str:
    tag = os.path.abspath(sf_dir).strip("/").replace("/", "_")
    return f"/tmp/se_bench_corpus/{tag}_x{factor}"


def materialize_replicated_corpus(
    sf_dir: str, factor: int, n_base: int
) -> str:
    """Write the replicated corpus parquet once; reuse across runs/levels."""
    import ray.data

    out = _replica_cache_dir(sf_dir, factor)
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", override_num_blocks=64
    )

    def replicate(t: pa.Table) -> pa.Table:
        parts = []
        base_ids = t.column("doc_id").to_numpy()
        for k in range(factor):
            c = derive_corpus_batch(t)
            ids = pa.array(base_ids + k * n_base, type=pa.int64())
            c = c.set_column(0, "doc_id", ids)
            repo = pa.array(
                [f"{r}_r{k}" for r in c.column("repo").to_pylist()],
                type=pa.string(),
            )
            c = c.set_column(c.schema.get_field_index("repo"), "repo", repo)
            parts.append(c)
        return pa.concat_tables(parts)

    tmp = out + ".tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    # one FILE per output block: sub-file block splitting re-decodes the
    # whole row group per split block (256x decode amplification measured)
    ds.map_batches(
        replicate, batch_format="pyarrow", batch_size=100
    ).repartition(64).write_parquet(tmp)
    os.rename(tmp, out)
    with open(marker, "w") as f:
        f.write("ok")
    return out


def replicated_corpus_factory(sf_dir: str, factor: int, n_base: int | None = None):
    """Returns a zero-arg factory producing the replicated corpus Dataset
    (reads the cached parquet with enough blocks to feed every core)."""
    import pyarrow.parquet as pq
    import ray.data

    if n_base is None:
        n_base = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    cache = materialize_replicated_corpus(sf_dir, factor, n_base)

    def factory(doc_range=None):
        if doc_range is not None:
            import pyarrow.compute as pc

            lo, hi = doc_range
            return ray.data.read_parquet(
                cache, filter=(pc.field("doc_id") >= lo) & (pc.field("doc_id") < hi)
            )
        return ray.data.read_parquet(cache)  # 64 files -> 64 natural blocks

    factory.__name__ = f"replicated_corpus_{factor}x"
    factory.n_docs = n_base * factor
    return factory
