"""Driver-fidelity correctness sweep: run EVERY oracle-backed query at
sf0.01 (the driver's scale) and value-hash-compare against its DuckDB
oracle, exactly like the driver's CORRECTNESS_r{N} gate. Usage:

    python tools/correctness_sweep.py [sf_dir] [query ...]
    python tools/correctness_sweep.py [sf_dir] --chunk 40   # fresh Ray
        session per 40-query chunk, one retry per crashed chunk
"""
import json
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_pos = [a for a in sys.argv[1:] if not a.startswith("--")
        and not a.isdigit()]
if _pos and not os.path.isdir(_pos[0]):
    sys.exit(f"correctness_sweep: first positional arg {_pos[0]!r} is not a "
             "directory (expected the sf_dir; query names follow it)")
SF = _pos[0] if _pos else "/root/testdata/sf0.01"
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


def _chunked(argv) -> int:
    """Driver mode: split the oracle-backed registry into chunks and run
    each chunk in a FRESH subprocess (fresh Ray session). A very long
    single session accumulating ~1000 datasets tripped a Ray-core race
    once (task_manager.cc "Tried to complete task that was not pending",
    observed 2026-08-20 after 73 queries); chunking bounds the blast
    radius and lets a crashed chunk retry once without losing the sweep."""
    import subprocess
    chunk = int(argv[argv.index("--chunk") + 1])
    import __ray_entry__ as E
    names = [n for n in E.queries() if n in E.oracle_sql()]
    failures, checked = [], 0
    for i in range(0, len(names), chunk):
        part = names[i:i + chunk]
        for attempt in (1, 2):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), SF, *part],
                capture_output=True, text=True)
            sys.stdout.write(r.stdout)
            summary = None
            for line in reversed(r.stdout.splitlines()):
                if line.startswith("{"):
                    try:
                        summary = json.loads(line)
                    except ValueError:
                        pass
                    break
            if summary is not None:
                # the subprocess completed its loop: trust ITS failed list
                # (deterministic mismatches re-fail identically — no retry)
                failures.extend(summary.get("failed", []))
                break
            if attempt == 2:
                failures.extend(part)  # chunk crashed twice: flag it all
                break
            print(f"chunk {i // chunk} crashed (rc={r.returncode}); "
                  "retrying once", flush=True)
        checked += len(part)
    print(json.dumps({"sf": SF, "checked": checked, "failed": failures,
                      "mode": f"chunked:{chunk}"}))
    return 1 if failures else 0


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
    only = {a for a in sys.argv[1:]
            if a != SF and not a.startswith("--") and not a.isdigit()}
    unknown = only - set(oq)
    if unknown:
        sys.exit(f"correctness_sweep: unknown query name(s) {sorted(unknown)}")
    failures = []
    for name in qs:
        if name not in oq or (only and name not in only):
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
    print(json.dumps({"sf": SF,
                      "checked": len(only) if only else len(oq),
                      "failed": failures}))
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(_chunked(sys.argv) if "--chunk" in sys.argv else main())
