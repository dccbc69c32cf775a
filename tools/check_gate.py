"""Local stand-in for the driver's correctness gate: run every queries()
entry at sf0.01 side-by-side with its oracle_sql() in DuckDB and compare
row count, schema width, and order-insensitive values.

Usage: PYTHONPATH=/root/repo python tools/check_gate.py [names...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings".split()
)


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == bool:
            df[c] = df[c].astype(int)
        if str(df[c].dtype) in ("int32", "uint32", "int16"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sys.argv[1:] or list(qs)
    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            got = canon(to_pandas(qs[name](SF_DIR)))
        except Exception as e:
            print(f"FAIL {name}: ray side raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(got)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            want = canon(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        ok = len(got) == len(want) and list(got.columns) == list(want.columns)
        if ok:
            try:
                # dtype-strict: the driver hashes raw values, so an int64
                # engine column vs a float64 oracle column (DuckDB HUGEINT
                # via pandas) must FAIL here too, or local green lies.
                pd.testing.assert_frame_equal(
                    got, want, check_dtype=True, check_exact=True
                )
            except AssertionError as e:
                ok = False
                err = str(e).splitlines()[:6]
        if ok:
            print(f"PASS {name}: {len(got)} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}; cols {list(got.columns)} vs {list(want.columns)}")
            if len(got) == len(want) and list(got.columns) == list(want.columns):
                print("  " + "\n  ".join(err))
                merged = got.compare(want) if got.shape == want.shape else None
                if merged is not None and len(merged):
                    print(merged.head(5))
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)-n_pass-n_fail} rows-only")
    ray.shutdown()


if __name__ == "__main__":
    main()
