"""HyperLogLog distinct-count sketch — the mergeable-sketch primitive for
counting distinct keys over a 10^12-row stream without a shuffle.

Public algorithm (Flajolet et al. 2007, with the standard bias corrections):
p-bit register index from the hash's top bits, register value = 1 + leading
zeros of the remaining bits, estimate = alpha_m * m^2 / sum(2^-reg) with
linear counting below 2.5m and no large-range correction (64-bit hashes
don't saturate). Everything vectorized: update is one np.maximum.at per
batch, merge is elementwise max — associative and commutative, so partial
sketches combine in any order at any parallelism.
"""

from __future__ import annotations

import numpy as np

from deduplication_ray.functions import hashing as H

DEFAULT_P = 14  # 16384 registers, ~0.81% standard error


def hll_init(p: int = DEFAULT_P) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def hll_update(regs: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Fold u64 hashes into the register array (in place; returns regs)."""
    p = int(np.log2(len(regs)))
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes << np.uint64(p)
    # rank = 1 + leading zeros of the remaining (64-p) bits, capped
    nz = rest != 0
    lz = np.full(len(hashes), 64 - p, dtype=np.uint8)
    if nz.any():
        # leading zeros via float64 exponent trick is lossy; use bit scan:
        # highest set bit position of rest = 63 - lz
        r = rest[nz]
        hb = np.zeros(len(r), dtype=np.int64)
        for shift in (32, 16, 8, 4, 2, 1):
            m = r >= (np.uint64(1) << np.uint64(shift))
            hb[m] += shift
            r[m] >>= np.uint64(shift)
        lz[nz] = (63 - hb).astype(np.uint8)
    rank = np.minimum(lz + 1, 64 - p).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
    if est <= 2.5 * m:
        zeros = int((regs == 0).sum())
        if zeros:
            est = m * np.log(m / zeros)  # linear counting, small range
    return float(est)
