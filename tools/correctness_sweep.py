"""Driver-fidelity correctness sweep: run EVERY oracle-backed query at
sf0.01 (the driver's scale) and value-hash-compare against its DuckDB
oracle, exactly like the driver's CORRECTNESS_r{N} gate. Usage:

    python tools/correctness_sweep.py [sf_dir]
"""
import json
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E
    qs, oq = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{SF}/{t}.parquet')")
    failures = []
    for name in qs:
        if name not in oq:
            continue
        t0 = time.time()
        try:
            res = qs[name](SF)
            df = res.to_pandas() if hasattr(res, "to_pandas") \
                else pd.DataFrame(res)
            ora = con.execute(oq[name]).df()
            a, b = canon(df), canon(ora)
            pd.testing.assert_frame_equal(a, b, check_dtype=False)
            print(f"ok   {name:34s} {len(a):7d} rows  "
                  f"{time.time() - t0:6.1f}s", flush=True)
        except Exception as exc:  # noqa: BLE001 - report and continue
            failures.append(name)
            print(f"FAIL {name:34s} {type(exc).__name__}: "
                  f"{str(exc)[:160]}", flush=True)
    print(json.dumps({"sf": SF, "checked": len(oq),
                      "failed": failures}))
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
