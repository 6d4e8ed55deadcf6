"""Driver-fidelity correctness sweep: run EVERY oracle-backed query at
sf0.01 (the driver's scale) and value-hash-compare against its DuckDB
oracle, exactly like the driver's CORRECTNESS_r{N} gate. Usage:

    python tools/correctness_sweep.py [sf_dir] [query ...]
    python tools/correctness_sweep.py [sf_dir] --chunk 40   # fresh Ray
        session per 40-query chunk, one retry per crashed chunk
    python tools/correctness_sweep.py --chunk 40 --out CORRECTNESS_full.json
        # also write driver-style per-query verdict records
        # ({rows_match, schema_match, hash_match, rows, err}) so the FULL
        # registry's evidence is a committed artifact, not just the
        # driver's 50-query window
"""
import json
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_flag_vals = {sys.argv[i + 1] for i, a in enumerate(sys.argv)
              if a in ("--out", "--chunk") and i + 1 < len(sys.argv)}
_pos = [a for a in sys.argv[1:] if not a.startswith("--")
        and not a.isdigit() and a not in _flag_vals]
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
    import tempfile
    chunk = int(argv[argv.index("--chunk") + 1])
    out_path = (argv[argv.index("--out") + 1] if "--out" in argv else None)
    import __ray_entry__ as E
    names = [n for n in E.queries() if n in E.oracle_sql()]
    failures, checked, records = [], 0, {}
    for i in range(0, len(names), chunk):
        part = names[i:i + chunk]
        if out_path:  # mkstemp, not racy/deprecated mktemp; child rewrites it
            fd, part_out = tempfile.mkstemp(suffix=".json")
            os.close(fd)
        else:
            part_out = None
        for attempt in (1, 2):
            extra = ["--out", part_out] if part_out else []
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), SF, *part, *extra],
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
                if part_out and os.path.exists(part_out):
                    with open(part_out) as f:
                        records.update(json.load(f))
                    os.unlink(part_out)
                break
            if attempt == 2:
                if part_out and os.path.exists(part_out):
                    os.unlink(part_out)  # mkstemp pre-created it
                failures.extend(part)  # chunk crashed twice: flag it all
                for n in part:
                    records[n] = {"rows_match": False, "schema_match": False,
                                  "hash_match": False, "rows": None,
                                  "err": f"chunk crashed twice "
                                         f"(rc={r.returncode})"}
                break
            print(f"chunk {i // chunk} crashed (rc={r.returncode}); "
                  "retrying once", flush=True)
        checked += len(part)
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"sf": SF, "checked": checked, "failed": failures,
                       "queries": records}, f, indent=1)
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
    flag_values = {sys.argv[i + 1] for i, a in enumerate(sys.argv)
                   if a in ("--out", "--chunk") and i + 1 < len(sys.argv)}
    only = {a for a in sys.argv[1:]
            if a != SF and not a.startswith("--") and not a.isdigit()
            and a not in flag_values}
    unknown = only - set(oq)
    if unknown:
        sys.exit(f"correctness_sweep: unknown query name(s) {sorted(unknown)}")
    out_path = (sys.argv[sys.argv.index("--out") + 1]
                if "--out" in sys.argv else None)
    failures, records = [], {}
    for name in qs:
        if name not in oq or (only and name not in only):
            continue
        t0 = time.time()
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "rows": None, "err": None}
        try:
            res = qs[name](SF)
            df = res.to_pandas() if hasattr(res, "to_pandas") \
                else pd.DataFrame(res)
            ora = con.execute(oq[name]).df()
            rec["rows"] = len(df)
            rec["rows_match"] = len(df) == len(ora)
            rec["schema_match"] = sorted(df.columns) == sorted(ora.columns)
            a, b = canon(df), canon(ora)
            pd.testing.assert_frame_equal(a, b, check_dtype=False)
            rec["hash_match"] = True
            print(f"ok   {name:34s} {len(a):7d} rows  "
                  f"{time.time() - t0:6.1f}s", flush=True)
        except Exception as exc:  # noqa: BLE001 - report and continue
            failures.append(name)
            rec["err"] = f"{type(exc).__name__}: {str(exc)[:300]}"
            print(f"FAIL {name:34s} {type(exc).__name__}: "
                  f"{str(exc)[:160]}", flush=True)
        records[name] = rec
    if out_path:
        with open(out_path, "w") as f:
            json.dump(records, f, indent=1)
    print(json.dumps({"sf": SF,
                      "checked": len(only) if only else len(oq),
                      "failed": failures}))
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(_chunked(sys.argv) if "--chunk" in sys.argv else main())
