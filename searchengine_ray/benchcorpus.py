"""Deterministic bench-scale corpus: the 500-row documents table replicated
``factor`` times with shifted doc_ids and per-replica repo names (FIXTURES.md
bench scale ~200k rows; the driver's documents table itself does not grow
with sf, so the build benchmark scales it here — no external data, fully
deterministic)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .corpus import derive_corpus_batch


def replicated_corpus_factory(sf_dir: str, factor: int, n_base: int | None = None):
    """Returns a zero-arg factory producing the replicated corpus Dataset."""
    import pyarrow.parquet as pq
    import ray.data

    if n_base is None:
        n_base = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def factory():
        # one small parquet file = ONE input block; split it so the
        # replicate/tokenize stages fan out across cores instead of running
        # in a single task
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

        return ds.map_batches(replicate, batch_format="pyarrow", batch_size=100)

    factory.__name__ = f"replicated_corpus_{factor}x"
    factory.n_docs = n_base * factor
    return factory
