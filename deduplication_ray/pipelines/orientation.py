"""Orientation-invariant (dihedral) image near-duplicate detection.

Plain pHash is blind to rotated / mirrored copies: a rot90 or fliplr
duplicate permutes and sign-flips the DCT coefficients, so its 64-bit hash
sits at a ~random Hamming distance (~32) from the original and never shares
a band. This stage computes all 8 dihedral-orientation pHashes from ONE DCT
per image (``codecs.phash64_dihedral_batch`` — transpose + parity sign
masks on the low-frequency block), bands EVERY orientation hash, and
verifies candidate pairs with the minimum Hamming distance over relative
orientations. A pair related by any rotation/mirror (plus mild noise)
collides in the band whose orientations align and verifies at ~0 Hamming.

Scale shape (mirrors the main image pipeline, ``image_dedup.py``):
- decode + hash in an actor-pool ``map_batches`` — bytes die at this stage,
  only (image_id, 8 x u64) rows ever shuffle;
- banding is a groupby on 16-bit band keys; emitting 8 orientations costs
  8x band rows (a documented constant factor on the SIGNATURE stream, not
  the pixels — the alternative, canonical-min-hash banding, loses near-dup
  recall when noise reorders near-tied orientation hashes);
- verify runs inside the band buckets (both sides' hash vectors are already
  co-located — zero extra join), then pairs dedupe through one
  hash-partitioned min-reduce;
- bucket blowup is bounded by ``cfg.bucket_cap`` exactly like the LSH path:
  an oversized bucket (a constant-color web tile in every orientation)
  degrades to anchor-star pairs instead of quadratic emission.

Verification uses the group structure: if B = g(A) + noise then B's
orientation hashes are a permutation of A's, so comparing A's orientation-0
hash against all 8 of B covers every relative orientation — 8 XORs per
pair, not 64.

Reference parity: generalizes the reference's exact-block identity probe
(``/root/reference/src/dictionary.c:49-59``) to an identity that is
invariant under the dihedral-4 group, the way ``stages/signatures.py``
generalizes it to near-identity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from deduplication_ray.config import DedupConfig
from deduplication_ray.functions import codecs as C
from deduplication_ray.functions import hashing as H
from deduplication_ray.stages.groupred import hash_grouped_reduce

N_ORIENT = 8
_BANDS_PER_HASH = 4  # 64-bit hash -> 4 x 16-bit bands (Hamming<=3 guarantee)


class OrientationSignatures:
    """Actor-pool stage: decode pixels once, emit the 8 orientation pHashes.

    Output: image_id, dh0..dh7 (int64 bitcast of u64 pHashes). The bytes
    column dies here."""

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg
        C.dct_matrix(cfg.phash_size)  # warm the per-actor cache

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        payloads = batch["bytes"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        pbuf, poffs = H._arrow_flat_buffer(payloads)
        grays = np.zeros((n, cfg.phash_size, cfg.phash_size), dtype=np.float32)
        for i in range(n):  # decode (zlib inflate) is inherently per-row
            img = C.decode_image(pbuf[poffs[i]:poffs[i + 1]],
                                 fmts[i], int(ws[i]), int(hs[i]))
            grays[i] = C.resize_area(C.to_grayscale(img), cfg.phash_size)
        dh = C.phash64_dihedral_batch(grays, cfg.phash_size, cfg.phash_lowfreq)
        cols = {"image_id": batch["image_id"]}
        for k in range(N_ORIENT):
            cols[f"dh{k}"] = pa.array(H.bitcast_u64_to_i64(dh[:, k]),
                                      pa.int64())
        return pa.table(cols)


def compute_orientation_signatures(ds: ray.data.Dataset,
                                   cfg: DedupConfig) -> ray.data.Dataset:
    if cfg.sig_concurrency is None:  # task mode: state ships in the closure
        return ds.map_batches(OrientationSignatures(cfg),
                              batch_format="pyarrow",
                              batch_size=cfg.batch_size)
    return ds.map_batches(
        OrientationSignatures, fn_constructor_args=(cfg,),
        batch_format="pyarrow", batch_size=cfg.batch_size,
        concurrency=cfg.sig_concurrency, num_cpus=1)


def rot_dup_pairs(sigs: ray.data.Dataset, cfg: DedupConfig,
                  max_hamming: int = 6) -> ray.data.Dataset:
    """(image_id, dh0..dh7) signatures -> verified orientation-invariant
    near-dup pairs (id_a, id_b, hamming), id_a < id_b lexicographically.

    hamming = min over relative orientations of popcount(a0 ^ bk)."""

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ids = t["image_id"]
        dh = np.stack([H.bitcast_i64_to_u64(t[f"dh{k}"].to_numpy())
                       for k in range(N_ORIENT)], axis=1)  # (n, 8)
        keys, rows = [], []
        for k in range(N_ORIENT):
            for b in range(_BANDS_PER_HASH):
                bits = (dh[:, k] >> np.uint64(16 * b)) & np.uint64(0xFFFF)
                # band id folded into the key so band b of one hash never
                # collides with band b' of another
                keys.append(H.splitmix64(bits ^ np.uint64(
                    0xA5A5_0000 + b)))
                rows.append(np.arange(n, dtype=np.int64))
        key = np.concatenate(keys)
        row = np.concatenate(rows)
        cols = {
            "bkey": pa.array(H.bitcast_u64_to_i64(key), pa.int64()),
            "image_id": ids.take(pa.array(row)),
        }
        for k in range(N_ORIENT):
            cols[f"dh{k}"] = t[f"dh{k}"].take(pa.array(row))
        return pa.table(cols)

    def pair_bucket(g: pa.Table) -> pa.Table:
        # rows sharing one 16-bit band value: dedupe ids, then all-pairs
        # (bucket_cap-bounded: degrade to anchor-star above the cap, the
        # same skew defusal as stages/lsh.py)
        g = g.group_by(
            ["image_id"] + [f"dh{k}" for k in range(N_ORIENT)]).aggregate([])
        m = g.num_rows
        if m < 2:
            return _empty_pairs()
        ids = np.asarray(g["image_id"].to_pylist(), dtype=object)
        dh = np.stack([H.bitcast_i64_to_u64(g[f"dh{k}"].to_numpy())
                       for k in range(N_ORIENT)], axis=1)
        if m <= cfg.bucket_cap:
            ia, ib = np.triu_indices(m, k=1)
        else:
            anchor = np.zeros(m - 1, dtype=np.int64)
            ia, ib = anchor, np.arange(1, m, dtype=np.int64)
        # min Hamming over relative orientations: a0 vs every bk
        x = dh[ia, 0:1] ^ dh[ib, :]  # (pairs, 8)
        ham = H.popcount64(x).min(axis=1).astype(np.int64)
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

    pairs = (sigs.map_batches(explode, batch_format="pyarrow")
             .groupby("bkey").map_groups(pair_bucket, batch_format="pyarrow"))

    def key_hash(t: pa.Table) -> np.ndarray:
        return (H.hash_bytes_array(t["id_a"])
                ^ H.splitmix64(H.hash_bytes_array(t["id_b"])))

    return hash_grouped_reduce(pairs, key_hash=key_hash, reduce_fn=dedupe,
                               num_parts=cfg.num_partitions)


def _empty_pairs() -> pa.Table:
    return pa.table({"id_a": pa.array([], pa.string()),
                     "id_b": pa.array([], pa.string()),
                     "hamming": pa.array([], pa.int64())})


def run_rot_dup(input_ds: ray.data.Dataset, cfg: DedupConfig,
                max_hamming: int = 6) -> ray.data.Dataset:
    """input table (image_id, bytes, w, h, fmt, ...) -> verified
    orientation-invariant near-dup pairs."""
    return rot_dup_pairs(compute_orientation_signatures(input_ds, cfg),
                         cfg, max_hamming=max_hamming)
