"""Candidate-edge verification: Hamming-ball + MinHash-Jaccard checks (T10).

Candidates from LSH banding are *hypotheses*; this stage attaches both
endpoints' signatures (two hash-partitioned joins — signatures are the lean
~1KB/row table, never pixels) and keeps an edge iff any signal passes:

* estimated Jaccard(minhash_src, minhash_dst) >= cfg.jaccard_tau
* popcount(phash_src ^ phash_dst)   <= cfg.phash_hamming_t
* popcount(simhash_src ^ simhash_dst) <= cfg.simhash_hamming_t
* exact edges (kind == 'exact' / 'cap_exact' / 'substr') pass by construction

The per-batch check is pure vectorized numpy over Arrow columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from deduplication_ray.config import DedupConfig
from deduplication_ray.functions import hashing as H

_TRUSTED_KINDS = ("exact", "cap_exact", "substr")


def attach_signatures(
    edges: ray.data.Dataset,
    signatures: ray.data.Dataset,
    cfg: DedupConfig,
    cols: list[str] | None = None,
) -> ray.data.Dataset:
    """edges(src,dst,kind) + signatures -> edges with _src/_dst signature cols.

    Hash-partitioned joins on the edge endpoints (Ray Dataset.join); the
    signature table is too large to broadcast at 10^12 rows, so this is the
    genuinely-shuffling path (R17's gather generalized to a distributed join).
    """
    from deduplication_ray.stages.join import lookup_join

    cols = cols or ["phash", "simhash", "minhash"]
    sig = signatures.select_columns(["image_id", *cols]).materialize()
    n_sig = sig.count()
    src_side = sig.rename_columns({c: f"{c}_src" for c in cols}).rename_columns(
        {"image_id": "src"}
    )
    dst_side = sig.rename_columns({c: f"{c}_dst" for c in cols}).rename_columns(
        {"image_id": "dst"}
    )
    e = lookup_join(edges, src_side, on=["src"], cfg=cfg, lookup_rows=n_sig)
    e = lookup_join(e, dst_side, on=["dst"], cfg=cfg, lookup_rows=n_sig)
    return e


def verify_edges(
    edges_with_sigs: ray.data.Dataset, cfg: DedupConfig, has_pixels: bool = True
) -> ray.data.Dataset:
    """Filter attached edges to verified ones; emits (src, dst, kind)."""

    def check(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.select(["src", "dst", "kind"])
        trusted = pc.fill_null(
            pc.is_in(t["kind"], value_set=pa.array(_TRUSTED_KINDS)), False
        )
        keep = trusted.combine_chunks().to_numpy(zero_copy_only=False).astype(bool)

        ms = H.unpack_u64_rows(t["minhash_src"], cfg.num_perm)
        md = H.unpack_u64_rows(t["minhash_dst"], cfg.num_perm)
        jacc = (ms == md).mean(axis=1)
        keep |= jacc >= cfg.jaccard_tau

        if has_pixels:
            ph = H.hamming_distance_u64(
                H.bitcast_i64_to_u64(t["phash_src"].to_numpy()),
                H.bitcast_i64_to_u64(t["phash_dst"].to_numpy()),
            )
            sh = H.hamming_distance_u64(
                H.bitcast_i64_to_u64(t["simhash_src"].to_numpy()),
                H.bitcast_i64_to_u64(t["simhash_dst"].to_numpy()),
            )
            keep |= ph <= cfg.phash_hamming_t
            keep |= sh <= cfg.simhash_hamming_t

        return t.select(["src", "dst", "kind"]).filter(pa.array(keep))

    return edges_with_sigs.map_batches(check, batch_format="pyarrow")


def plan_hamming_radius(pos_dists, neg_dists, target_recall: float = 0.99,
                        bits: int = 64) -> dict:
    """Operating-point planner for a Hamming-ball verification channel —
    the verify-stage analog of ``lsh.plan_lsh_params``: given labeled
    Hamming distances (``pos_dists`` from known-duplicate pairs,
    ``neg_dists`` from known-non-duplicate pairs — a small calibration
    sample by contract, e.g. a planted fixture or a human-labeled batch),
    choose the smallest radius whose recall meets ``target_recall`` and
    report the full sweep so the false-positive cost of each extra bit is
    visible. The default config's radii (``phash_hamming_t=10``,
    ``simhash_hamming_t=6``, ``crop_hamming_t=3``) were chosen exactly
    this way against the planted fixtures.

    Returns {radius, recall, fpr, recall_ok, f1_radius, sweep} where
    ``sweep`` is a list of (radius, recall_milli, fpr_milli) for radii up
    to the first with recall 1.0, and ``f1_radius`` maximizes F1 treating
    the calibration sample as the population. Pure driver math on the
    bounded sample — no distributed work.
    """
    import numpy as np

    pos = np.asarray(pos_dists, dtype=np.int64)
    neg = np.asarray(neg_dists, dtype=np.int64)
    if len(pos) == 0:
        raise ValueError("need at least one positive-pair distance")
    sweep = []
    chosen, f1_best, f1_radius = None, -1.0, 0
    for r in range(bits + 1):
        recall = float((pos <= r).mean())
        fpr = float((neg <= r).mean()) if len(neg) else 0.0
        tp = int((pos <= r).sum())
        fp = int((neg <= r).sum())
        prec = tp / (tp + fp) if tp + fp else 1.0
        f1 = (2 * prec * recall / (prec + recall)) if prec + recall else 0.0
        if f1 > f1_best:
            f1_best, f1_radius = f1, r
        sweep.append((r, int(recall * 1000), int(fpr * 1000)))
        if chosen is None and recall >= target_recall:
            chosen = r
        if recall >= 1.0:
            break
    r = chosen if chosen is not None else bits
    return {
        "radius": r,
        "recall": float((pos <= r).mean()),
        "fpr": float((neg <= r).mean()) if len(neg) else 0.0,
        "recall_ok": chosen is not None,
        "f1_radius": f1_radius,
        "sweep": sweep,
    }
