"""Shared machinery for multi-hash (K hashes per image) near-dup detection.

Both the orientation-invariant pass (8 dihedral pHashes) and the crop/pad
window-pyramid pass (6 window pHashes) reduce to the same shape:

1. each image carries K 64-bit hashes plus a validity bitmask;
2. every VALID hash is split into 4 x 16-bit bands and bucketed — the band
   key folds the band POSITION but not the hash index, so hash i of one
   image collides with hash j of another (that cross-index collision IS the
   detection: e.g. full-image hash of a crop vs quadrant hash of the
   original);
3. inside each bucket, pairs verify with the minimum Hamming distance over
   all valid (i, j) hash pairs — a (pairs, K, K) vectorized popcount, no
   per-pair Python;
4. pair dedupe is one hash-partitioned min-reduce.

Scale notes: band rows are Kx4 per image on the SIGNATURE stream (pixels
never shuffle); oversized buckets degrade to anchor-star pairs at
``cfg.bucket_cap`` (same skew defusal as ``stages/lsh.py``).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

import ray.data

from deduplication_ray.config import DedupConfig
from deduplication_ray.functions import hashing as H

_BANDS_PER_HASH = 4  # 64-bit hash -> 4 x 16-bit bands (Hamming<=3 guarantee)


def empty_pairs() -> pa.Table:
    return pa.table({"id_a": pa.array([], pa.string()),
                     "id_b": pa.array([], pa.string()),
                     "hamming": pa.array([], pa.int64())})


def multihash_buckets(sigs: ray.data.Dataset,
                      n_hashes: int) -> ray.data.Dataset:
    """(image_id, h0..h{K-1}, valid) signatures -> exploded band-bucket rows
    (bkey, image_id, h0.., valid): 4 x 16-bit bands per VALID hash; the band
    key folds the band position but not the hash index, so hash i of one
    image collides with hash j of another."""
    K = n_hashes
    hcols = [f"h{k}" for k in range(K)]

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        dh = np.stack([H.bitcast_i64_to_u64(t[c].to_numpy()) for c in hcols],
                      axis=1)  # (n, K)
        valid = t["valid"].to_numpy().astype(np.int64)
        keys, rows = [], []
        for k in range(K):
            on = np.flatnonzero((valid >> k) & 1)
            if not len(on):
                continue
            for b in range(_BANDS_PER_HASH):
                bits = (dh[on, k] >> np.uint64(16 * b)) & np.uint64(0xFFFF)
                keys.append(H.splitmix64(bits ^ np.uint64(0xA5A5_0000 + b)))
                rows.append(on.astype(np.int64))
        if not keys:
            return pa.table({"bkey": pa.array([], pa.int64()),
                             "image_id": pa.array([], pa.string()),
                             **{c: pa.array([], pa.int64()) for c in hcols},
                             "valid": pa.array([], pa.int64())})
        key = np.concatenate(keys)
        row = pa.array(np.concatenate(rows))
        cols = {"bkey": pa.array(H.bitcast_u64_to_i64(key), pa.int64()),
                "image_id": t["image_id"].take(row)}
        for c in hcols:
            cols[c] = t[c].take(row)
        cols["valid"] = t["valid"].take(row)
        return pa.table(cols)

    return sigs.map_batches(explode, batch_format="pyarrow")


def multihash_pairs_from_buckets(
    buckets: ray.data.Dataset,
    cfg: DedupConfig,
    n_hashes: int,
    max_hamming: int,
    pair_mask: Callable[[np.ndarray, np.ndarray], np.ndarray] | None = None,
) -> ray.data.Dataset:
    """Exploded bucket rows -> verified deduped pairs (id_a, id_b, hamming),
    id_a < id_b. ``pair_mask(va, vb) -> (pairs, K, K) bool`` restricts which
    (i, j) hash pairs count (default: valid_i x valid_j); hamming = min over
    allowed pairs of popcount(hA_i ^ hB_j)."""
    K = n_hashes
    hcols = [f"h{k}" for k in range(K)]

    def pair_bucket(g: pa.Table) -> pa.Table:
        g = g.group_by(["image_id"] + hcols + ["valid"]).aggregate([])
        m = g.num_rows
        if m < 2:
            return empty_pairs()
        ids = np.asarray(g["image_id"].to_pylist(), dtype=object)
        dh = np.stack([H.bitcast_i64_to_u64(g[c].to_numpy()) for c in hcols],
                      axis=1)
        valid = g["valid"].to_numpy().astype(np.int64)
        if m <= cfg.bucket_cap:
            ia, ib = np.triu_indices(m, k=1)
        else:
            ia = np.zeros(m - 1, dtype=np.int64)
            ib = np.arange(1, m, dtype=np.int64)
        x = dh[ia, :, None] ^ dh[ib, None, :]          # (pairs, K, K)
        d = H.popcount64(x)
        vm = (((valid[ia, None] >> np.arange(K)) & 1)[:, :, None]
              & ((valid[ib, None] >> np.arange(K)) & 1)[:, None, :]
              ).astype(bool)
        if pair_mask is not None:
            vm &= pair_mask(valid[ia], valid[ib])
        d = np.where(vm, d, 65)
        ham = d.reshape(len(ia), -1).min(axis=1).astype(np.int64)
        keep = ham <= max_hamming
        ia, ib, ham = ia[keep], ib[keep], ham[keep]
        a, b = ids[ia], ids[ib]
        swap = a > b
        a[swap], b[swap] = b[swap], a[swap]
        return pa.table({
            "id_a": pa.array(a.tolist(), pa.string()),
            "id_b": pa.array(b.tolist(), pa.string()),
            "hamming": pa.array(ham),
        })

    def dedupe(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        out = (df.groupby(["id_a", "id_b"], sort=True)["hamming"].min()
               .reset_index())
        return pa.Table.from_pandas(out, preserve_index=False)

    from deduplication_ray.stages.groupred import hash_grouped_reduce

    pairs = buckets.groupby("bkey").map_groups(pair_bucket,
                                               batch_format="pyarrow")

    def key_hash(t: pa.Table) -> np.ndarray:
        return (H.hash_bytes_array(t["id_a"])
                ^ H.splitmix64(H.hash_bytes_array(t["id_b"])))

    return hash_grouped_reduce(pairs, key_hash=key_hash, reduce_fn=dedupe,
                               num_parts=cfg.num_partitions)


def banded_multihash_pairs(
    sigs: ray.data.Dataset,
    cfg: DedupConfig,
    n_hashes: int,
    max_hamming: int,
    pair_mask: Callable[[np.ndarray, np.ndarray], np.ndarray] | None = None,
) -> ray.data.Dataset:
    """(image_id, h0..h{K-1} int64, valid int64 bitmask) signatures ->
    verified pairs (id_a, id_b, hamming), id_a < id_b."""
    return multihash_pairs_from_buckets(
        multihash_buckets(sigs, n_hashes), cfg, n_hashes, max_hamming,
        pair_mask)
