"""DDP1 encode/decode sweep — the reference's bench protocol (R20/R21,
``/root/reference/scripts/encode_bench.sh:20-28`` grid) on our engine.

Sweeps the real sensor corpus x block sizes, recording elapsed seconds and
throughput into ``BENCH/ddp1_sweep.csv`` (the encode_summary.csv analog; no
page-cache drops — this sandbox lacks the privilege, and the inputs are
pre-warmed deliberately so compute is measured, not first-touch I/O).

Usage: python bench/ddp1_sweep.py [out_csv]
"""

from __future__ import annotations

import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SENSORS = [  # (file, width) per encode_bench.sh:20-25
    ("T_raw.bin", 2),
    ("RH_raw.bin", 2),
    ("lux_raw.bin", 2),
    ("P_raw.bin", 4),
]
BLOCK_SIZES = list(range(2, 33, 2))  # encode_bench.sh:28
SAMPLES_DIR = "/root/reference/samples"


def main() -> None:
    import ray

    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from deduplication_ray.sources import ddp1

    out_csv = sys.argv[1] if len(sys.argv) > 1 else "BENCH/ddp1_sweep.csv"
    os.makedirs(os.path.dirname(out_csv) or ".", exist_ok=True)
    rows = []
    for fname, width in SENSORS:
        data = open(os.path.join(SAMPLES_DIR, fname), "rb").read()  # warm once
        for block in BLOCK_SIZES:
            t0 = time.time()
            ddp, summary = ddp1.compress_bytes(data, width, block)
            enc_s = time.time() - t0
            t0 = time.time()
            back = ddp1.decompress_bytes(ddp)
            dec_s = time.time() - t0
            assert back == data[: summary["used_samples"] * width]
            rows.append({
                "dataset": fname,
                "width": width,
                "block_size": block,
                "encode_sec": round(enc_s, 4),
                "decode_sec": round(dec_s, 4),
                "input_bytes": len(data),
                "ddp_bytes": len(ddp),
                "ratio": round(len(ddp) / len(data), 4),
                "dict_size": summary["dict_size"],
                "num_blocks": summary["num_blocks"],
                "encode_mbps": round(len(data) / enc_s / 1e6, 2),
            })
            print(f"{fname} b={block}: enc {enc_s:.3f}s dec {dec_s:.4f}s "
                  f"ratio {rows[-1]['ratio']}", flush=True)
    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out_csv} ({len(rows)} rows)")
    ray.shutdown()


if __name__ == "__main__":
    main()
