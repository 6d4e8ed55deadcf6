"""Serial single-process reference implementation of the dedup criterion.

Computes, with NO Ray and NO LSH approximation, the exact pair set the
distributed pipeline is supposed to recover:

  pair (i, j) is a duplicate iff ANY of
    * exact:   bytes_i == bytes_j and norm_caption_i == norm_caption_j
    * caption: estimated MinHash Jaccard >= tau        (same P, seed)
    * pixels:  pHash Hamming <= t  or  SimHash Hamming <= t, with the
               in-ball hit corroborated by the OTHER pixel hash within
               cfg.pixel_corr_t (mirrors stages/verify.py)
    * substr:  normalized captions share a substring >= Lmin chars

then clusters = connected components, representative = min image_id.

The distributed pipeline must reproduce these cluster assignments on small
fixtures (LSH banding is probabilistic, but at the planted similarity levels
its miss probability is ~1e-4 per pair — asserted in tests as exact parity
on the tiny fixture and recall >= 0.99 on the small one).

Signature kernels are imported from the library (same config -> bitwise-same
signatures); everything ELSE — pair scan, thresholding, union-find — is
independent brute force, O(n^2), which is the point of an oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from deduplication_ray.config import DedupConfig
from deduplication_ray.functions import codecs as C
from deduplication_ray.functions import hashing as H
from deduplication_ray.stages.signatures import normalize_captions


class DSU:
    def __init__(self, n: int):
        self.p = list(range(n))

    def find(self, x: int) -> int:
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[rb] = ra


def _gram_sets(texts: list[str], L: int) -> list[set]:
    """Per-text set of all L-grams (shared-substring >= L <=> shared L-gram)."""
    return [
        {t[i: i + L] for i in range(len(t) - L + 1)} if len(t) >= L else set()
        for t in texts
    ]


def serial_clusters(table: pa.Table, cfg: DedupConfig | None = None) -> pd.DataFrame:
    """Full-table oracle -> DataFrame(image_id, cluster_id)."""
    cfg = cfg or DedupConfig()
    n = table.num_rows
    ids = table["image_id"].to_pylist()

    # signatures (library kernels, same seed)
    cap = normalize_captions(table["caption"])
    cap_strs = cap.to_pylist()
    cap_hash = H.hash_bytes_array(cap)
    byte_hash = H.hash_bytes_array(table["bytes"])
    sh_hashes, offs = H.shingle_window_hashes(cap, cfg.shingle_k)
    a, b = H.make_minhash_perms(cfg.num_perm, cfg.seed)
    sig = H.minhash_signatures(sh_hashes, offs, a, b)

    fmts = table["fmt"].to_pylist()
    ws, hs = table["w"].to_numpy(), table["h"].to_numpy()
    grays = np.empty((n, cfg.phash_size, cfg.phash_size), dtype=np.float32)
    payloads = table["bytes"].combine_chunks() if isinstance(table["bytes"], pa.ChunkedArray) else table["bytes"]
    for i in range(n):
        img = C.decode_image(payloads[i].as_py(), fmts[i], int(ws[i]), int(hs[i]))
        grays[i] = C.resize_area(C.to_grayscale(img), cfg.phash_size)
    phash = C.phash64_batch(grays, cfg.phash_size, cfg.phash_lowfreq)
    planes = H.make_simhash_planes(cfg.simhash_bits, cfg.simhash_dim, cfg.seed)
    simhash = H.simhash_from_features(C.simhash_features(grays), planes)

    gsets = _gram_sets(cap_strs, cfg.substring_min_len)
    dsu = DSU(n)
    # O(n^2) scan in vectorized row blocks
    for i in range(n):
        j = np.arange(i + 1, n)
        if len(j) == 0:
            continue
        exact = (byte_hash[j] == byte_hash[i]) & (cap_hash[j] == cap_hash[i])
        jacc = (sig[j] == sig[i][None, :]).mean(axis=1) >= cfg.jaccard_tau
        phd = H.popcount64(phash[j] ^ phash[i])
        shd = H.popcount64(simhash[j] ^ simhash[i])
        # corroborated pixel accept, mirroring stages/verify.py: an in-ball
        # hit on one pixel hash needs the other within cfg.pixel_corr_t
        ph = (phd <= cfg.phash_hamming_t) & (shd <= cfg.pixel_corr_t)
        sh = (shd <= cfg.simhash_hamming_t) & (phd <= cfg.pixel_corr_t)
        hit = exact | jacc | ph | sh
        for jj in j[hit]:
            dsu.union(i, int(jj))
        gi = gsets[i]
        if gi:
            for jj in j[~hit]:
                jj = int(jj)
                if gsets[jj] and not gi.isdisjoint(gsets[jj]):
                    dsu.union(i, jj)

    roots: dict[int, str] = {}
    for i in range(n):
        r = dsu.find(i)
        if r not in roots or ids[i] < roots[r]:
            roots[r] = ids[i]
    return pd.DataFrame(
        {"image_id": ids, "cluster_id": [roots[dsu.find(i)] for i in range(n)]}
    )
