"""Input-scaled hash-partition sizing for the bounded-dispatch groupby
pattern (hash keys into P buckets, one vectorized ``map_groups`` call per
bucket).

The pattern keeps Ray's per-group dispatch count bounded, but each bucket
must FIT ONE WORKER — a fixed P=64 means a bucket is ~1/64 of the input,
which is OOM-by-construction at 100 TB. These helpers derive P from the
input's parquet FOOTERS (bytes of just the columns the operator will carry,
no data read) so a bucket's expected payload stays under a target size; 64
stays the floor so dispatch overhead never grows at toy scale.

Caveat (documented partitioning assumption): hashing bounds the EXPECTED
bucket size. A single key whose own payload exceeds the target (one user
with a billion events) still lands in one bucket; operators whose per-key
state is itself huge need key-salting or a two-level split like
``build.py``'s doc-range x merge-partition scheme.
"""

from __future__ import annotations

import glob
import math
import os

import pyarrow.parquet as pq

# Expected per-bucket payload cap. 64 MiB uncompressed leaves a wide margin
# inside a multi-GiB worker heap even with numpy copies of every column.
TARGET_GROUP_BYTES = 64 << 20
FLOOR = 64


def table_column_bytes(path: str, columns=None) -> int:
    """Uncompressed bytes of ``columns`` (all if None) from parquet footers
    only — no row data is read. ``path`` may be a file, a directory, or a
    glob."""
    if os.path.isdir(path):
        paths = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    elif os.path.isfile(path):
        paths = [path]
    else:
        paths = sorted(glob.glob(path))
    total = 0
    for p in paths:
        md = pq.ParquetFile(p).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema.split(".")[0]
                if columns is None or name in columns:
                    total += col.total_uncompressed_size
    return total


def partition_count(
    path: str,
    columns=None,
    *,
    floor: int = FLOOR,
    target_bytes: int = TARGET_GROUP_BYTES,
    selectivity: float = 1.0,
    expansion: float = 1.0,
) -> int:
    """Bucket count so a bucket's expected payload is ≤ ``target_bytes``.

    ``selectivity`` discounts rows a pre-filter drops (<1), ``expansion``
    inflates for operators that widen rows before the shuffle (>1). Footer
    metadata only; falls back to ``floor`` for empty/missing input.
    """
    b = table_column_bytes(path, columns) * selectivity * expansion
    return max(floor, math.ceil(b / target_bytes))


def partition_count_for_rows(
    n_rows: int, bytes_per_row: int, *, floor: int = FLOOR,
    target_bytes: int = TARGET_GROUP_BYTES,
) -> int:
    """Bucket count from a driver-known row count (e.g. an LSH candidate
    set) instead of parquet footers."""
    return max(floor, math.ceil(n_rows * bytes_per_row / target_bytes))


def append_hash_bucket(t, col: str, nparts: int, name: str = "ku"):
    """Append the int32 hash-bucket column the bounded-dispatch groupby
    keys on: ``t[col] % nparts``. ONE copy of the bucketing rule (any
    future change — e.g. salting or negative-key handling — lands here,
    not in per-operator closures)."""
    import numpy as np
    import pyarrow as pa

    b = (t.column(col).to_numpy() % nparts).astype(np.int32)
    return t.append_column(name, pa.array(b))
