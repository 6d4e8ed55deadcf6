"""ANN operating-point sweep: recall-vs-brute for every ANN variant at one
corpus, written to BENCH/ann_sweep.csv — the similarity-search analog of
the LSH operating-point sweep (reference knob-sweep protocol,
``/root/reference/scripts/encode_bench.sh:20-28``). Recall numbers are
deterministic (seeded models, exact verification); wall seconds carry the
host probe for interpretability."""
import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH", "ann_sweep.csv")


def main() -> None:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from bench import host_health_probe
    from deduplication_ray.pipelines import ann

    n_q, k = 10, 5
    variants = [
        ("lsh", lambda: ann.lsh_topk(SF, n_q, k, multiprobe=0)),
        ("lsh_multiprobe", lambda: ann.lsh_topk(SF, n_q, k, multiprobe=1)),
        ("ivf", lambda: ann.ivf_topk(SF, n_q, k)),
        ("ivf_refined", lambda: ann.ivf_topk(SF, n_q, k, refine_iters=2)),
        ("pq", lambda: ann.pq_topk(SF, n_q, k)),
        ("ivfpq", lambda: ann.ivfpq_topk(SF, n_q, k)),
    ]
    probe = host_health_probe()
    rows = []
    for name, fn in variants:
        t0 = time.time()
        res = fn()
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        rows.append({
            "variant": name, "sf": SF, "n_queries": n_q, "k": k,
            "recall_vs_brute": float(df["recall_vs_brute"].iloc[0]),
            "rows": len(df), "wall_sec": round(time.time() - t0, 2),
            "host_mem_gbps": probe["host_mem_gbps"],
        })
        print(rows[-1], flush=True)
    with open(OUT, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {OUT}")
    ray.shutdown()


if __name__ == "__main__":
    main()
