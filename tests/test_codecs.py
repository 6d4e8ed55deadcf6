"""Unit tests: image codecs + pixel signatures (no Ray needed)."""

import numpy as np
import pytest

from deduplication_ray.functions import codecs as C
from deduplication_ray.functions.hashing import hamming_distance_u64

RNG = np.random.default_rng(0)
IMG = RNG.integers(0, 256, (48, 37, 3), dtype=np.uint8)


def test_raw_roundtrip():
    assert (C.decode_raw(C.encode_raw(IMG), 37, 48) == IMG).all()


def test_png_roundtrip_lossless():
    data = C.encode_png(IMG)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert (C.decode_png(data) == IMG).all()


def test_png_decode_filtered_rows():
    """Decoder must handle filters 1-4 (foreign encoders)."""
    import struct
    import zlib

    h, w = 4, 3
    img = RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)
    raw = bytearray()
    prev = np.zeros(w * 3, np.int32)
    for y, f in enumerate([1, 2, 3, 4]):
        line = img[y].reshape(-1).astype(np.int32)
        enc = np.empty(w * 3, np.int32)
        for x in range(w * 3):
            left = line[x - 3] if x >= 3 else 0
            up = prev[x]
            ul = prev[x - 3] if x >= 3 else 0
            if f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa_, pb_, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa_ <= pb_ and pa_ <= pc_ else (up if pb_ <= pc_ else ul)
            enc[x] = (line[x] - pred) & 0xFF
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + C._chunk(b"IHDR", ihdr)
           + C._chunk(b"IDAT", zlib.compress(bytes(raw)))
           + C._chunk(b"IEND", b""))
    assert (C.decode_png(png) == img).all()


def test_qrgb_lossy_psnr_bound():
    dec = C.decode_qrgb(C.encode_qrgb(IMG))
    assert C.psnr_db(IMG, dec) >= 40.0
    assert int(np.abs(dec.astype(int) - IMG.astype(int)).max()) <= C.QRGB_STEP


def test_decode_dispatch_and_unknown_fmt():
    assert (C.decode_image(C.encode_image(IMG, "raw"), "raw", 37, 48) == IMG).all()
    with pytest.raises(ValueError):
        C.decode_image(b"xx", "jpeg2000", 1, 1)


def test_phash_invariance_and_separation():
    h_raw = C.phash64(IMG)
    h_qrgb = C.phash64(C.decode_qrgb(C.encode_qrgb(IMG)))
    other = RNG.integers(0, 256, (48, 37, 3), dtype=np.uint8)
    d_same = hamming_distance_u64(np.array([h_raw]), np.array([h_qrgb]))[0]
    d_other = hamming_distance_u64(np.array([h_raw]), np.array([C.phash64(other)]))[0]
    assert d_same <= 4
    assert d_other > 15


def test_phash_batch_matches_single():
    imgs = [IMG, RNG.integers(0, 256, (33, 64, 3), dtype=np.uint8)]
    stack = np.stack([C.resize_area(C.to_grayscale(i), 32) for i in imgs])
    batch = C.phash64_batch(stack)
    for i, im in enumerate(imgs):
        assert batch[i] == C.phash64(im)


def test_resize_area_preserves_mean():
    g = C.to_grayscale(IMG)
    small = C.resize_area(g, 8)
    assert abs(float(small.mean()) - float(g.mean())) < 1.0
