"""Vectorized scalar-function kit: u64 hashing, codecs, text analysis.

All kernels are numpy / pyarrow.compute vectorized — no per-row Python loops
in anything reachable from a hot ``map_batches`` body (zlib codec calls are the
one inherent per-row step; they are real compute, not interpreter overhead).
"""
