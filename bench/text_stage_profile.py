"""Per-stage wall profile of the text engine at one CPU width (verdict r4
item #6): which stage carries the flat floor that drags the text 8v32 ratio
below the image pipeline's? Each stage is materialized with a wall timer in
the ORDER the lazy `text_dedup_clusters` plan executes them, in a fresh Ray
session at ``RAY_GRAFT_CPUS``.

Usage:   taskset -c 0-7 RAY_GRAFT_CPUS=8 python bench/text_stage_profile.py
Prints:  ONE JSON line {stage: sec, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "8"))


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import bench
    from deduplication_ray.config import DedupConfig
    from deduplication_ray.pipelines.text_dedup import (as_engine_table,
                                                        text_signatures)
    from deduplication_ray.sources import storage
    from deduplication_ray.stages import lsh, verify
    from deduplication_ray.stages.substring import substring_buckets
    from deduplication_ray.stages.tuning import apply_context_tuning
    from deduplication_ray.state import unionfind

    apply_context_tuning()
    fix = bench.ensure_text_fixture()
    storage.read_table(f"{fix}/data").count()  # warm page cache
    cfg = DedupConfig(num_partitions=max(8, NUM_CPUS))

    t: dict[str, float] = {}

    def stage(name: str, fn):
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 2)
        print(f"{name}: {t[name]}s", file=sys.stderr)
        return out

    ds = storage.read_table(f"{fix}/data", columns=["doc_id", "text"])
    caps = stage("canon_caps", lambda: as_engine_table(ds).materialize())
    sigs = stage("signatures", lambda: text_signatures(
        as_engine_table(ds), cfg, id_col="image_id",
        text_col="caption").materialize())
    buckets = stage("buckets", lambda: sigs.map_batches(
        lsh.ExplodeBands(cfg), batch_format="pyarrow",
        batch_size=cfg.text_batch_size).union(
            substring_buckets(caps, cfg)).materialize())
    edges = stage("pairing", lambda: lsh.edges_from_buckets(
        buckets, cfg).union(
            lsh.exact_edges(sigs, cfg, key=("cap_hash",))).materialize())
    deduped = stage("dedupe_edges", lambda: lsh.dedupe_edges(
        edges).materialize())
    vedges = stage("attach_verify", lambda: verify.verify_edges(
        verify.attach_signatures(deduped, sigs, cfg, cols=["minhash"]),
        cfg, has_pixels=False).materialize())
    labels = stage("unionfind", lambda: unionfind.connected_components(
        vedges, cfg).materialize())

    def final():
        from deduplication_ray.stages.join import lookup_join

        ids = ds.select_columns(["doc_id"]).map_batches(
            lambda b: __import__("pyarrow").table(
                {"image_id": b["doc_id"].cast(
                    __import__("pyarrow").string())}),
            batch_format="pyarrow")
        return lookup_join(
            ids, labels.rename_columns({"node": "image_id"}),
            on=["image_id"], cfg=cfg, how="left").materialize()

    stage("finalize_join", final)
    out = {
        "num_cpus": NUM_CPUS,
        "rows": ds.count(),
        "edges": vedges.count(),
        "total": round(sum(t.values()), 2),
        **t,
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
