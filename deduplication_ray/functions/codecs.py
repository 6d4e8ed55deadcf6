"""Self-contained image codecs + pixel-signature kernels (no Pillow/cv2).

The reference treats payloads as opaque byte blocks compared with ``memcmp``
(``/root/reference/src/dictionary.c:53``). The graft's payloads are *encoded
images* whose identity is perceptual, so the engine must decode: fmt-dispatch
over three codecs, all implemented with numpy + zlib only:

* ``raw``  — H*W*3 uint8 buffer, row-major RGB.
* ``png``  — real minimal PNG (signature/IHDR/IDAT/IEND, 8-bit RGB color
             type 2). Encoder emits filter 0 rows; decoder handles all five
             standard filter types. Interoperable with any PNG reader.
* ``qrgb`` — toy lossy codec: per-channel uniform quantization (step q) then
             zlib. Max abs error q//2 => PSNR >= 40 dB for q <= 6, which is
             how the per-row PSNR invariant (BASELINE.json input_hint) is
             exercised offline.

Also hosts the pixel-signature math shared by the pipeline, the fixture
generator and the serial oracle: grayscale, area-average resize to SxS,
2D DCT via a precomputed basis matrix, 64-bit pHash, SimHash tile features.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
QRGB_STEP = 5  # quantization step; max err 2 -> PSNR ~ 46 dB worst case
QRGB_MAGIC = b"QRGB"


# ---------------------------------------------------------------- raw

def encode_raw(img: np.ndarray) -> bytes:
    return np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, dtype=np.uint8, count=h * w * 3).reshape(h, w, 3)


# ---------------------------------------------------------------- png

def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """Minimal valid PNG: 8-bit RGB, filter type 0 on every scanline."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # prepend filter byte 0 to each row
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """Decode 8-bit RGB PNG (color type 2, no interlace); filters 0-4."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if bit_depth != 8 or color_type != 2 or interlace != 0:
                raise ValueError("unsupported PNG subformat")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    filters = raw[:, 0]
    out = np.zeros((h, w * 3), dtype=np.uint8)
    bpp = 3
    if (filters == 0).all():  # our encoder's output: fully vectorized path
        return raw[:, 1:].reshape(h, w, 3).copy()
    for y in range(h):  # general path, per-scanline (rare: foreign PNGs only)
        f = filters[y]
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(w * 3, np.int32)
        if f == 0:
            rec = line
        elif f == 2:  # Up
            rec = line + prev
        else:  # Sub / Average / Paeth need the running left pixel
            rec = np.empty(w * 3, np.int32)
            for x in range(w * 3):
                left = rec[x - bpp] if x >= bpp else 0
                up = prev[x]
                ul = prev[x - bpp] if x >= bpp else 0
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) >> 1
                else:  # Paeth
                    p = left + up - ul
                    pa_, pb_, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa_ <= pb_ and pa_ <= pc_ else (up if pb_ <= pc_ else ul)
                rec[x] = (line[x] + pred) & 0xFF  # mask NOW: rec feeds 'left'
        out[y] = rec & 0xFF
    return out.reshape(h, w, 3)


# ---------------------------------------------------------------- qrgb (toy lossy)

def encode_qrgb(img: np.ndarray, step: int = QRGB_STEP) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    q = (img.astype(np.int32) // step).astype(np.uint8)
    payload = zlib.compress(q.tobytes(), 6)
    return QRGB_MAGIC + struct.pack("<HHB", w, h, step) + payload


def decode_qrgb(data: bytes) -> np.ndarray:
    if data[:4] != QRGB_MAGIC:
        raise ValueError("not QRGB")
    w, h, step = struct.unpack_from("<HHB", data, 4)
    q = np.frombuffer(zlib.decompress(data[9:]), dtype=np.uint8).reshape(h, w, 3)
    deq = q.astype(np.int32) * step + step // 2
    return np.clip(deq, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- dispatch

JPEG_QUALITY = 99  # 4:4:4 at this quality keeps PSNR >= 40 dB even on the
                   # fixture's noise-textured content (worst observed 49.2 dB
                   # over 150 seeds; q<=92 dips to ~33 on near-white-noise
                   # texture), satisfying the per-row lossy-fmt invariant
                   # the north rule demands


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return encode_raw(img)
    if fmt == "png":
        return encode_png(img)
    if fmt == "qrgb":
        return encode_qrgb(img)
    if fmt == "jpg":
        from deduplication_ray.functions.jpeg import encode_jpeg  # lazy: jpeg imports dct_matrix from here

        return encode_jpeg(img, quality=JPEG_QUALITY)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    """fmt-dispatch decode -> (h, w, 3) uint8. The graft's R3 'sample framing'
    analog (``compressor.c:68-73``): reinterpret opaque bytes under an
    externally-imposed schema (fmt, w, h columns instead of CLI width)."""
    if fmt == "raw":
        return decode_raw(data, w, h)
    if fmt == "png":
        return decode_png(bytes(data))
    if fmt == "qrgb":
        return decode_qrgb(bytes(data))
    if fmt == "jpg":
        from deduplication_ray.functions.jpeg import decode_jpeg

        return decode_jpeg(bytes(data))
    raise ValueError(f"unknown fmt {fmt!r}")


def is_lossless(fmt: str) -> bool:
    return fmt in ("raw", "png")


# ---------------------------------------------------------------- metrics

def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


# ---------------------------------------------------------------- signatures

def to_grayscale(img: np.ndarray) -> np.ndarray:
    """ITU-R 601 luma, float32 (h, w)."""
    f = img.astype(np.float32)
    return f[..., 0] * 0.299 + f[..., 1] * 0.587 + f[..., 2] * 0.114


def resize_area(gray: np.ndarray, size: int) -> np.ndarray:
    """Area-average resize to (size, size) — box filter over fractional cells,
    implemented with two matmuls (exact, vectorized, any input size)."""
    h, w = gray.shape
    ky = _area_matrix(h, size)
    kx = _area_matrix(w, size)
    return ky @ gray @ kx.T


_area_cache: dict[tuple[int, int], np.ndarray] = {}


def _area_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) row-stochastic matrix averaging input cells per output cell."""
    key = (n_in, n_out)
    m = _area_cache.get(key)
    if m is None:
        edges = np.linspace(0.0, n_in, n_out + 1)
        i = np.arange(n_in, dtype=np.float64)
        lo = np.maximum(edges[:-1, None], i[None, :])
        hi = np.minimum(edges[1:, None], i[None, :] + 1.0)
        m = np.clip(hi - lo, 0.0, None)
        m /= m.sum(axis=1, keepdims=True)
        m = m.astype(np.float32)
        _area_cache[key] = m
    return m


_dct_cache: dict[int, np.ndarray] = {}


def dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (n, n); 2D DCT = D @ A @ D.T."""
    d = _dct_cache.get(n)
    if d is None:
        k = np.arange(n, dtype=np.float64)
        d = np.cos(np.pi / n * (k[None, :] + 0.5) * k[:, None])
        d *= np.sqrt(2.0 / n)
        d[0] *= np.sqrt(0.5)
        d = d.astype(np.float32)
        _dct_cache[n] = d
    return d


def phash64(img: np.ndarray, size: int = 32, lowfreq: int = 8) -> np.uint64:
    """64-bit perceptual hash of one (h, w, 3) uint8 image: grayscale -> SxS
    area resize -> 2D DCT -> top-left lowfreq x lowfreq block -> bit = coef >
    median (DC excluded from the median, standard pHash shape)."""
    small = resize_area(to_grayscale(img), size)
    return phash64_batch(small[None, ...], size, lowfreq)[0]


def phash64_batch(stack: np.ndarray, size: int = 32, lowfreq: int = 8) -> np.ndarray:
    """pHash for a (n, S, S) stack of ALREADY-RESIZED grayscale images —
    the batched hot path: one tensordot pair for the whole batch."""
    d = dct_matrix(size)
    # batched matmul (einsum without optimize picks a naive O(n*S^4) loop)
    coefs = np.matmul(np.matmul(d, stack.astype(np.float32)), d.T)
    return _block_to_hash(coefs[:, :lowfreq, :lowfreq])


def _block_to_hash(block: np.ndarray) -> np.ndarray:
    """(n, L, L) low-frequency DCT blocks -> (n,) u64: bit = coef > median
    (DC excluded from the median, standard pHash shape)."""
    flat = block.reshape(len(block), -1)
    med = np.median(flat[:, 1:], axis=1, keepdims=True)
    bits = (flat > med).astype(np.uint64)
    w = np.uint64(1) << np.arange(flat.shape[1], dtype=np.uint64)
    return (bits * w[None, :]).sum(axis=1, dtype=np.uint64)


# Dihedral-4 orientation group, indexed 0..7. ``dihedral_apply(img, k)`` is
# the pixel-space transform; ``phash64_dihedral_batch`` produces the SAME
# hashes from one DCT per image (see its docstring for the identities).
DIHEDRAL_NAMES = ("identity", "fliplr", "flipud", "rot180",
                  "transpose", "rot90", "rot270", "anti_transpose")


def dihedral_apply(img: np.ndarray, k: int) -> np.ndarray:
    """Apply the k-th dihedral-4 transform to an (h, w, ...) array.
    k=5 is np.rot90 (counter-clockwise), k=6 is rot270."""
    if k == 0:
        return img
    if k == 1:
        return img[:, ::-1]
    if k == 2:
        return img[::-1]
    if k == 3:
        return img[::-1, ::-1]
    if k == 4:
        return img.swapaxes(0, 1)
    if k == 5:
        return img[:, ::-1].swapaxes(0, 1)
    if k == 6:
        return img[::-1].swapaxes(0, 1)
    if k == 7:
        return img[::-1, ::-1].swapaxes(0, 1)
    raise ValueError(f"dihedral index out of range: {k}")


def phash64_dihedral_batch(stack: np.ndarray, size: int = 32,
                           lowfreq: int = 8) -> np.ndarray:
    """All 8 dihedral-orientation pHashes from ONE DCT per image:
    (n, S, S) resized grayscale -> (n, 8) u64, column k = pHash of
    ``dihedral_apply(img, k)``.

    Exact DCT-II identities make the other 7 orientations nearly free:
    reversing a signal multiplies coefficient k by (-1)^k and transposing
    the image transposes the coefficient matrix, so every orientation's
    low-frequency block is a transpose + parity sign mask of the one
    computed block — closed within the (L, L) block, no second DCT. (The
    identities are exact in real arithmetic; float evaluation of the two
    paths can differ by ~1e-6, flipping a bit only on a near-median tie, so
    consumers treat cross-path equality as Hamming <= 1, never bitwise.)
    Area resize commutes with all 8 transforms (square output, symmetric
    box filter), so hashing the transformed RESIZED plane equals hashing
    the resize of the transformed image."""
    d = dct_matrix(size)
    coefs = np.matmul(np.matmul(d, stack.astype(np.float32)), d.T)
    blk = coefs[:, :lowfreq, :lowfreq]
    bt = blk.swapaxes(1, 2)
    su = ((-1.0) ** np.arange(lowfreq)).astype(np.float32)
    mu, mv = su[None, :, None], su[None, None, :]
    variants = (blk, blk * mv, blk * mu, blk * mu * mv,
                bt, bt * mu, bt * mv, bt * mu * mv)
    out = np.empty((len(stack), 8), dtype=np.uint64)
    for k, v in enumerate(variants):
        out[:, k] = _block_to_hash(v)
    return out


def simhash_features(gray_small: np.ndarray, tiles: int = 8) -> np.ndarray:
    """Per-image SimHash feature vector: tiles x tiles tile means of the
    resized grayscale, zero-centered. (n, S, S) -> (n, tiles*tiles)."""
    n, s, _ = gray_small.shape
    t = s // tiles
    means = gray_small.reshape(n, tiles, t, tiles, t).mean(axis=(2, 4))
    flat = means.reshape(n, tiles * tiles)
    return flat - flat.mean(axis=1, keepdims=True)


# ---------------------------------------------------------------- VSQ1 video container

VSQ1_MAGIC = b"VSQ1"
_VSQ1_FMTS = ("raw", "png", "qrgb")


def encode_vseq(frames, fps: int, fmt: str = "qrgb") -> bytes:
    """Self-contained video container: magic 'VSQ1', u32 n_frames, u16 w,
    u16 h, u8 fps, u8 fmt_code, then per frame u32 length + an encoded image
    payload (raw/png/qrgb — the real image codecs above). Same container
    discipline as the reference's DDP1 header+payload layout
    (``/root/reference/src/compressor.c:30-39``), applied to a frame
    sequence; no external codec library involved."""
    if fmt not in _VSQ1_FMTS:
        raise ValueError(f"unknown vseq fmt {fmt!r}")
    if not frames:
        raise ValueError("empty frame list")
    h, w, _ = frames[0].shape
    parts = [VSQ1_MAGIC,
             struct.pack("<IHHBB", len(frames), w, h, fps, _VSQ1_FMTS.index(fmt))]
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("all frames must share one (h, w, 3) shape")
        payload = encode_image(f, fmt)
        parts.append(struct.pack("<I", len(payload)))
        parts.append(payload)
    return b"".join(parts)


def vseq_header(data: bytes) -> tuple[int, int, int, int, str]:
    """-> (n_frames, w, h, fps, fmt); validates magic."""
    if bytes(data[:4]) != VSQ1_MAGIC:
        raise ValueError("not VSQ1")
    n, w, h, fps, code = struct.unpack_from("<IHHBB", data, 4)
    if code >= len(_VSQ1_FMTS):
        raise ValueError(f"bad vseq fmt code {code}")
    return n, w, h, fps, _VSQ1_FMTS[code]


def decode_vseq_frames(data: bytes, every_k: int = 1):
    """Yield (frame_index, pixels) for every k-th frame WITHOUT decoding the
    skipped ones — frame lengths are read from the per-frame headers, so
    sampling seeks in O(n_frames) header reads, the scale contract for a
    frame-sample stage (decode cost ∝ sampled frames, not stored frames)."""
    data = bytes(data)
    n, w, h, fps, fmt = vseq_header(data)
    off = 14
    for i in range(n):
        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        if i % every_k == 0:
            yield i, decode_image(data[off:off + ln], fmt, w, h)
        off += ln


def laplacian_sharpness_milli(gray: np.ndarray) -> int:
    """Integer-exact sharpness score: mean squared discrete Laplacian over
    the interior, scaled by 1000/(255^2) — the classic
    focus/blur measure (variance-of-Laplacian family); a relative score
    (the 4-neighbor Laplacian of hard edges can exceed 255, so values
    above 1000 are possible and simply mean 'very sharp'). Blur removes
    high-frequency energy, so an interpolated UPSCALE scores below its
    source even though it has more pixels — the signal a quality-aware
    representative election needs that raw pixel area cannot provide.
    Deterministic: rounds the float32 luma to int64 once, then all
    arithmetic is integer."""
    g = np.rint(gray).astype(np.int64)
    if g.shape[0] < 3 or g.shape[1] < 3:
        return 0
    lap = (4 * g[1:-1, 1:-1] - g[:-2, 1:-1] - g[2:, 1:-1]
           - g[1:-1, :-2] - g[1:-1, 2:])
    npix = lap.shape[0] * lap.shape[1]
    return int(int((lap * lap).sum()) * 1000 // (npix * 255 * 255))
