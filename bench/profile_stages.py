"""Per-stage wall-time profile of the flagship image pipeline at one CPU
count — the tool behind the scaling-efficiency work: run it at 8 and at 32
CPUs (fresh processes) and diff the per-stage seconds to see WHICH stage
fails to scale, instead of guessing from the end-to-end ratio.

Usage:  RAY_GRAFT_CPUS=8 BENCH_IMG_ROWS=150000 python bench/profile_stages.py

Prints one JSON line: {"num_cpus": N, "img_rows": R, "wall": s,
"stage_seconds": {...}, "extra": {...driver-side section timings...}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import bench

    fix = bench.ensure_fixture()
    from deduplication_ray.config import DedupConfig
    from deduplication_ray.pipelines import image_dedup
    from deduplication_ray.sources import storage

    storage.read_table(f"{fix}/data").count()  # warm page cache

    run_dir = f"/tmp/dedup_ray_profrun_{NUM_CPUS}"
    shutil.rmtree(run_dir, ignore_errors=True)
    cfg = DedupConfig(num_partitions=max(8, NUM_CPUS))
    t0 = time.time()
    metrics = image_dedup.run_pipeline(f"{fix}/data", run_dir, cfg)
    wall = time.time() - t0
    out = {
        "num_cpus": NUM_CPUS,
        "img_rows": bench.IMG_ROWS,
        "wall": round(wall, 2),
        "stage_seconds": {k: round(v, 2)
                          for k, v in metrics["stage_seconds"].items()},
        "rows": metrics["rows"],
        **bench.host_health_probe(),
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
