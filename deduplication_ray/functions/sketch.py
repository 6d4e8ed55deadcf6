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


# ------------------------------------------------- KMV (bottom-k) sketch

def kmv_update(state: np.ndarray, hashes: np.ndarray, k: int) -> np.ndarray:
    """Fold u64 hashes into a bottom-k sketch (the k smallest DISTINCT hash
    values seen so far; Bar-Yossef et al. 2002). Vectorized: one concat +
    unique per call. Returns the new state (sorted ascending, len <= k)."""
    merged = np.unique(np.concatenate([state, hashes.astype(np.uint64)]))
    return merged[:k]


def kmv_merge(a: np.ndarray, b: np.ndarray, k: int) -> np.ndarray:
    """Union of two bottom-k sketches = bottom-k of the merged hash sets —
    associative/commutative, so per-block partials combine in any order."""
    return np.unique(np.concatenate([a, b]))[:k]


def kmv_estimate(state: np.ndarray, k: int) -> float:
    """Distinct-count estimate: (k-1) / (kth smallest hash / 2^64). Below k
    observed values the sketch IS the exact distinct set."""
    if len(state) < k:
        return float(len(state))
    return (k - 1) / (float(state[k - 1]) / 2.0 ** 64)


def kmv_jaccard(a: np.ndarray, b: np.ndarray, k: int) -> float:
    """Jaccard estimate of the two underlying sets: fraction of the union
    sketch's bottom-k that appears in BOTH input sketches (the union sketch
    is a uniform bottom-k sample of A u B; Beyer et al. 2007)."""
    u = kmv_merge(a, b, k)
    if len(u) == 0:
        return 0.0
    both = np.isin(u, a) & np.isin(u, b)
    return float(both.sum()) / float(len(u))


# ------------------------------------------------------- count-min sketch

def cm_init(width: int, depth: int = 4) -> np.ndarray:
    """Empty count-min sketch (Cormode & Muthukrishnan 2005): depth x width
    int64 counters. Mergeable by elementwise + — per-block partials combine
    exactly, any order, any parallelism."""
    return np.zeros((depth, width), dtype=np.int64)


def _cm_cols(hashes: np.ndarray, width: int, depth: int) -> np.ndarray:
    """One column index per (row, key) via double hashing — shape
    (depth, len). Same Kirsch-Mitzenmacher construction as the Bloom
    filter."""
    from deduplication_ray.functions import hashing as H

    h1 = H.splitmix64(hashes.astype(np.uint64))
    h2 = H.splitmix64(hashes.astype(np.uint64)
                      ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    i = np.arange(depth, dtype=np.uint64)
    return ((h1[None, :] + i[:, None] * h2[None, :])
            % np.uint64(width)).astype(np.int64)


def cm_add(cm: np.ndarray, hashes: np.ndarray,
           counts: np.ndarray | None = None) -> np.ndarray:
    """Add each key ``counts`` times (default 1), vectorized in-place."""
    depth, width = cm.shape
    cols = _cm_cols(hashes, width, depth)
    w = np.ones(len(hashes), np.int64) if counts is None \
        else counts.astype(np.int64)
    for r in range(depth):
        np.add.at(cm[r], cols[r], w)
    return cm


def cm_query(cm: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Point-frequency estimates: min over rows — NEVER undercounts, and
    overcounts by at most eps*N (eps = e/width) with prob 1-delta
    (delta = e^-depth)."""
    depth, width = cm.shape
    cols = _cm_cols(hashes, width, depth)
    est = cm[0][cols[0]]
    for r in range(1, depth):
        est = np.minimum(est, cm[r][cols[r]])
    return est


# ------------------------------------------------------------- Bloom filter

def bloom_init(n_bits: int) -> np.ndarray:
    """Empty Bloom bitmap (n_bits rounded up to a byte multiple). Mergeable
    by bitwise OR — per-block partials union exactly like HLL registers."""
    return np.zeros((n_bits + 7) // 8, dtype=np.uint8)


def _bloom_positions(hashes: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """k bit positions per key via double hashing (Kirsch & Mitzenmacher,
    2006 — public): pos_i = (h1 + i*h2) mod n_bits, h1/h2 two independent
    64-bit mixes of the input hash. Returns shape (len, k)."""
    from deduplication_ray.functions import hashing as H

    h1 = H.splitmix64(hashes)
    h2 = H.splitmix64(hashes ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(n_bits)).astype(np.int64)


def bloom_add(bits: np.ndarray, hashes: np.ndarray, k: int = 7) -> np.ndarray:
    """Set the k positions of every key (vectorized; in-place on ``bits``)."""
    pos = _bloom_positions(hashes.astype(np.uint64), len(bits) * 8, k)
    np.bitwise_or.at(bits, pos.ravel() >> 3,
                     np.uint8(1) << (pos.ravel() & 7).astype(np.uint8))
    return bits


def bloom_might_contain(bits: np.ndarray, hashes: np.ndarray,
                        k: int = 7) -> np.ndarray:
    """Vectorized membership probe: True = maybe present (false positives at
    the configured rate), False = DEFINITELY absent (no false negatives)."""
    pos = _bloom_positions(hashes.astype(np.uint64), len(bits) * 8, k)
    got = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return got.all(axis=1)
