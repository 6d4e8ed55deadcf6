"""Driver-style correctness check: run queries() vs oracle_sql() via DuckDB.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
Mirrors the driver's compare: row count + sorted-column schema +
order-insensitive value hash (columns sorted by name, rows sorted).
"""

from __future__ import annotations

import os
import sys
import time

# `python tools/check_oracle.py` puts tools/ (not the repo root) on sys.path;
# __ray_entry__ lives at the root, so add it explicitly.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if hasattr(res, "to_pandas"):
        try:
            return res.to_pandas()
        except TypeError:
            pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return pd.DataFrame(res)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __ray_entry__ as E

    qs, oq = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oq:
            print(f"rows-only {name}: {len(mine)} rows ({dt:.1f}s)")
            continue
        oracle = canon(con.execute(oq[name]).fetchdf())
        ok_rows = len(mine) == len(oracle)
        ok_cols = list(mine.columns) == list(oracle.columns)
        ok_vals = False
        dtype_mismatch = []
        if ok_rows and ok_cols:
            # KIND-strict, like the driver: its value hash distinguishes
            # int from float (round-1 lesson: DuckDB sum()->HUGEINT->float64
            # via fetchdf failed 6 otherwise-identical queries) but accepts
            # width differences (int32 vs int64 passed in round 1).
            dtype_mismatch = [
                f"{c}: mine={mine[c].dtype} oracle={oracle[c].dtype}"
                for c in mine.columns if mine[c].dtype.kind != oracle[c].dtype.kind
            ]
            if not dtype_mismatch:
                om = oracle.astype({c: mine[c].dtype for c in mine.columns
                                    if mine[c].dtype != oracle[c].dtype})
                ok_vals = mine.equals(om)
        status = "OK  " if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if dtype_mismatch:
            print(f"  dtype mismatch: {dtype_mismatch}")
        if status == "FAIL":
            failures += 1
        print(f"{status} {name}: mine={len(mine)} oracle={len(oracle)} "
              f"cols_match={ok_cols} vals_match={ok_vals} ({dt:.1f}s)")
        if status == "FAIL" and ok_cols and ok_rows:
            diff = (mine != oracle).any(axis=0) if mine.shape == oracle.shape else None
            print("  mine:", mine.head(3).to_dict("records"))
            print("  orcl:", oracle.head(3).to_dict("records"))
    return failures


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    rc = main()
    ray.shutdown()
    sys.exit(1 if rc else 0)
