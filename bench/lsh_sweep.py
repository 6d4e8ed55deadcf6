"""LSH band-grid sweep: recall / precision / candidate volume / wall time of
the full image near-dup pipeline across (num_perm, bands, rows_per_band)
configs on the planted-truth fixture -> ``BENCH/lsh_sweep.csv``.

The measured analog of the reference's block-size sweep
(``scripts/encode_bench.sh:20-28``): the reference sweeps its one tuning
knob (block size) against throughput; this engine's tuning knob is the LSH
operating point — more rows per band raises the Jaccard threshold a bucket
match implies (precision up, recall of weaker dups down), more bands adds
recall at candidate-volume cost. The CSV is the recorded justification for
the DedupConfig defaults (P=128, b=32, r=4).

Usage: python bench/lsh_sweep.py [n_rows] [out_csv]
Owns its Ray session (guarded init; the driver contract never imports this).
"""

from __future__ import annotations

import csv
import json
import os
import shutil
import sys
import time

# (num_perm, bands, rows_per_band): bands * rows == num_perm is enforced by
# DedupConfig; the grid spans r in {2,4,8} and candidate budgets around the
# default operating point.
GRID = [
    (64, 32, 2),
    (32, 8, 4),
    (64, 16, 4),
    (128, 32, 4),   # DedupConfig default
    (128, 16, 8),
    (256, 32, 8),
]


def main() -> None:
    import logging

    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import host_health_probe

    from deduplication_ray.config import DedupConfig
    from deduplication_ray.pipelines.evaluate import pair_metrics
    from deduplication_ray.pipelines.image_dedup import run_pipeline
    from deduplication_ray.sources import fixtures, storage

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    out_csv = sys.argv[2] if len(sys.argv) > 2 else "BENCH/lsh_sweep.csv"
    os.makedirs(os.path.dirname(out_csv) or ".", exist_ok=True)

    fix_dir = f"/tmp/dedup_ray_sweepfix_42_{n}"
    if not os.path.exists(os.path.join(fix_dir, "_manifest.json")):
        fixtures.generate(fix_dir, n, seed=42)
    truth = storage.read_table(f"{fix_dir}/truth").to_pandas()

    # probe BEFORE the timed loop so the stamp describes the window the
    # wall_sec values were measured in (host bandwidth swings within hours)
    probe = host_health_probe()
    rows = []
    for num_perm, bands, rpb in GRID:
        cfg = DedupConfig(num_perm=num_perm, bands=bands, rows_per_band=rpb,
                          num_partitions=8)
        run_dir = f"/tmp/dedup_ray_sweep_{n}_{cfg.config_hash()}"
        shutil.rmtree(run_dir, ignore_errors=True)  # measure execution, not resume
        t0 = time.perf_counter()
        metrics = run_pipeline(f"{fix_dir}/data", run_dir, cfg)
        wall = time.perf_counter() - t0
        pred = storage.read_table(f"{run_dir}/clusters").to_pandas()
        m = pair_metrics(pred, truth)

        def stage_rows(stage: str) -> int:
            man = storage.read_manifest(os.path.join(run_dir, stage)) or {}
            return man.get("rows", -1)

        rows.append({
            "n_rows": n, "num_perm": num_perm, "bands": bands,
            "rows_per_band": rpb, "wall_sec": round(wall, 2),
            "recall": round(m["recall"], 4),
            "precision": round(m["precision"], 4),
            # the edge DAG is fused into the verified_edges checkpoint (raw
            # candidates never materialize); post-verification volume is the
            # recorded cost signal
            "verified_edges": stage_rows("verified_edges"),
            "pred_clusters": m["pred_clusters"],
            "truth_clusters": m["truth_clusters"],
        })
        print(json.dumps(rows[-1]))

    for r in rows:
        r.update(probe)
    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out_csv} ({len(rows)} rows)")
    ray.shutdown()


if __name__ == "__main__":
    main()
