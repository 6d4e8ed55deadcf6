"""Pure-numpy baseline-sequential JPEG codec (no Pillow / libjpeg).

Closes the biggest realism gap the offline sandbox allows: a real crawl is
~90% JPEG, and until now ``fmt="jpg"`` raised NotImplementedError at the
decode stage (``stages/multimodal.py``). The reference treats payloads as
opaque bytes (``/root/reference/src/dictionary.c:53``); the graft's identity
is perceptual, so it must actually decode.

Decoder (``decode_jpeg``) — baseline sequential DCT (SOF0), the format the
overwhelming majority of crawl JPEGs use:

* All tables come FROM THE FILE: DQT (8/16-bit precision), DHT (canonical
  bits/huffvals exactly as the marker encodes them), DRI restart intervals,
  multi-component SOF0 with per-component sampling factors (4:4:4, 4:2:2,
  4:2:0, grayscale — any h/v in {1,2,4} combination works generically).
* Entropy decode uses a flat 2**16 peek table per Huffman table (length,
  symbol per 16-bit prefix) so the per-symbol loop is O(1) lookups, no
  bit-tree walking. On hosts with a C compiler the loop itself runs
  compiled (``jpeg_entropy.c`` via ctypes, ~0.7 ms/img; pure-Python
  fallback kept with bitwise-identical output, parity-tested); the heavy
  math (dequantize, de-zigzag, IDCT over every 8x8 block, chroma
  upsample, YCbCr->RGB) is whole-image vectorized numpy after the scan
  pass either way.
* Progressive (SOF2) / arithmetic / hierarchical JPEGs raise
  NotImplementedError loudly — that is the remaining (narrow) stub edge.

Encoder (``encode_jpeg``) — used by fixtures/tests to plant REAL JPEG
payloads (there is no other JPEG writer in this environment):

* Standard JFIF output: SOI APP0 DQT SOF0 DHT SOS ... EOI, quality-scaled
  quantization (IJG 5000/Q convention), optional 2x2 chroma subsampling and
  restart intervals.
* Huffman tables are COMPUTED, not recalled from Annex K: each table is a
  canonical fixed-length code over exactly the symbols the image emits
  (+1 reserved slot so the all-ones code never occurs, as the standard's
  table-building procedure guarantees). Any conformant decoder reads the
  tables from DHT, so interop holds while the implementation stays
  independent of memorized constant tables.

Public-knowledge provenance: ITU-T T.81 (the JPEG standard, public), the
JFIF spec, and the IJG quality-scaling convention.
"""

from __future__ import annotations

import struct

import numpy as np

from deduplication_ray.functions.codecs import dct_matrix

# zigzag scan order: ZIGZAG[i] = (row, col) linear index of the i-th scanned
# coefficient — derived, not transcribed
def _zigzag_order() -> np.ndarray:
    idx = []
    for s in range(15):
        rng = range(s + 1)
        for i in (rng if s % 2 else reversed(rng)):
            j = s - i
            if i < 8 and j < 8:
                idx.append(i * 8 + j)
    return np.array(idx, dtype=np.int64)


ZIGZAG = _zigzag_order()            # scan position -> block position
UNZIGZAG = np.argsort(ZIGZAG)       # block position -> scan position

# IJG base luminance / chrominance quant tables (ITU-T T.81 Annex K.1/K.2 —
# published example tables, the de-facto baseline every encoder scales)
BASE_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
BASE_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling: Q<50 -> 5000/Q, else 200-2Q (percent)."""
    quality = int(np.clip(quality, 1, 100))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((BASE_QL * scale + 50) // 100, 1, 255).astype(np.int32)
    qc = np.clip((BASE_QC * scale + 50) // 100, 1, 255).astype(np.int32)
    return ql, qc


# ------------------------------------------------------------- color space

def rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    x = img.astype(np.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


# ------------------------------------------------------------- block utils

def _pad_to(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate pad to multiples of (bh, bw)."""
    h, w = plane.shape
    ph, pw = (-h) % bh, (-w) % bw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H,W % 8 == 0 -> (H//8 * W//8, 8, 8) row-major blocks."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _from_blocks(blocks: np.ndarray, h8: int, w8: int) -> np.ndarray:
    return (blocks.reshape(h8, w8, 8, 8).transpose(0, 2, 1, 3)
            .reshape(h8 * 8, w8 * 8))


def fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    d = dct_matrix(8).astype(np.float32)
    return np.matmul(np.matmul(d, blocks), d.T)


def idct_blocks(coefs: np.ndarray) -> np.ndarray:
    d = dct_matrix(8).astype(np.float32)
    return np.matmul(np.matmul(d.T, coefs), d)


# ------------------------------------------------------------- bit writer

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(byte)
            if byte == 0xFF:           # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per the spec


def _amplitude_bits(v: int, size: int) -> int:
    """Magnitude bits: v >= 0 -> v; v < 0 -> v + 2^size - 1 (one's compl.)."""
    return v if v >= 0 else v + (1 << size) - 1


# ------------------------------------------------------------- huffman

def _fixed_length_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """Canonical (bits, huffvals) giving every used symbol the SAME code
    length L = ceil(log2(n_symbols + 1)) — +1 keeps the all-ones code of
    length L unassigned, which the standard's table-building procedure also
    guarantees (T.81 K.2). Valid, conformant, marginally larger files."""
    syms = sorted(set(symbols))
    if not syms:
        syms = [0]
    n = len(syms)
    length = max(1, int(np.ceil(np.log2(n + 1))))
    if length > 16:
        raise ValueError("too many huffman symbols")
    bits = [0] * 16
    bits[length - 1] = n
    return bits, syms


def _canonical_codes(bits: list[int], huffvals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) by the canonical assignment (T.81 C.2)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffvals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Flat 2**16 peek table: table[peek16] = (length << 16) | symbol —
    the shared contract of the Python loop AND jpeg_entropy.c (ABI).
    One array index per decoded symbol — no tree walk."""

    __slots__ = ("lut", "maxlen", "_lut_py")

    def __init__(self, bits: list[int], huffvals: list[int]) -> None:
        # numpy uint32 LUT: the C fast path reads the buffer directly; the
        # pure-Python fallback converts to a plain list ONCE per decoder
        # (lazily — a list index is ~3x cheaper per symbol than a numpy
        # scalar index + int() box in the Python loop).
        lut = np.zeros(1 << 16, dtype=np.uint32)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                lo = code << (16 - length)
                hi = (code + 1) << (16 - length)
                lut[lo:hi] = (length << 16) | (huffvals[k] & 0xFFFF)
                code += 1
                k += 1
            code <<= 1
        self.lut = lut
        self.maxlen = 16
        self._lut_py = None

    def lut_list(self) -> list:
        if self._lut_py is None:
            self._lut_py = self.lut.tolist()
        return self._lut_py


# ---- optional compiled entropy loop --------------------------------------
# On hosts with a C compiler the per-symbol hot loop runs from
# jpeg_entropy.c (compiled once into a content-hashed .so under the temp
# dir, loaded via ctypes — no packages installed, no network). Everything
# else (marker parse, LUT build, dequant/IDCT/color) stays in Python/numpy,
# and the pure-Python loop below remains the always-available fallback with
# IDENTICAL semantics (parity-tested). ~10-20x on the entropy section.
FORCE_PURE_PYTHON = False  # tests flip this to pin fallback parity

_CENTROPY = None  # None = not tried; False = unavailable; else ctypes fn


def _load_centropy():
    global _CENTROPY
    if _CENTROPY is not None:
        return _CENTROPY or None
    import ctypes
    import hashlib
    import os
    import subprocess
    import tempfile

    try:
        import stat as _stat

        src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "jpeg_entropy.c")
        with open(src, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:16]
        # never load a library another user could have planted: the cache
        # lives in a per-UID 0700 directory whose ownership and mode are
        # verified before any CDLL (a predictable world-writable /tmp path
        # would be a code-execution hole on shared hosts)
        cache_dir = os.path.join(tempfile.gettempdir(),
                                 f"dedup_ray_jpegc_{os.getuid()}")
        os.makedirs(cache_dir, mode=0o700, exist_ok=True)
        st = os.stat(cache_dir)
        if st.st_uid != os.getuid() or _stat.S_IMODE(st.st_mode) != 0o700:
            raise RuntimeError("jpegc cache dir not exclusively owned")
        so = os.path.join(cache_dir, f"{tag}.so")
        if not os.path.exists(so):
            tmp = f"{so}.build{os.getpid()}"  # concurrent workers: unique
            subprocess.run(["cc", "-O2", "-shared", "-fPIC", "-o", tmp, src],
                           check=True, capture_output=True, timeout=120)
            os.replace(tmp, so)  # atomic publish
        fst = os.stat(so)
        if fst.st_uid != os.getuid():
            raise RuntimeError("jpegc .so not owned by this user")
        lib = ctypes.CDLL(so)
        fn = lib.decode_scan
        pu32 = ctypes.POINTER(ctypes.c_uint32)
        pi32 = ctypes.POINTER(ctypes.c_int32)
        fn.argtypes = [ctypes.c_char_p, ctypes.c_long,
                       ctypes.POINTER(pu32), ctypes.POINTER(pu32),
                       ctypes.c_int, ctypes.POINTER(ctypes.c_int),
                       ctypes.POINTER(pi32), ctypes.POINTER(ctypes.c_long),
                       ctypes.POINTER(ctypes.c_int32), ctypes.c_long]
        fn.restype = ctypes.c_int
        _CENTROPY = fn
        return fn
    except Exception:  # no compiler / sandboxed exec / bad toolchain
        _CENTROPY = False
        return None


# decoders cached by table content: batch workloads decode thousands of
# files that share the encoder's standard tables, so the 64K-entry LUT (and
# its Python-list view) is built once, not per file. Bounded: reset if an
# adversarial stream presents unbounded distinct tables.
_HUFF_CACHE: dict = {}


def _get_huff(bits: list[int], huffvals: list[int]) -> _HuffDecoder:
    key = (tuple(bits), tuple(huffvals))
    dec = _HUFF_CACHE.get(key)
    if dec is None:
        if len(_HUFF_CACHE) >= 64:
            # FIFO-evict the oldest half (dict preserves insertion order) so
            # hot standard tables survive a stream of one-off custom tables
            for k in list(_HUFF_CACHE)[:32]:
                _HUFF_CACHE.pop(k, None)
        dec = _HuffDecoder(bits, huffvals)
        _HUFF_CACHE[key] = dec
    return dec


# ------------------------------------------------------------- encoder

def _encode_component_blocks(qblocks_zz: np.ndarray) -> tuple[list, list, list]:
    """Per block: (dc_sym, dc_amp_bits_len, dc_amp, [(ac_sym, amp, size)...]).
    Returns (records, dc_symbols_used, ac_symbols_used)."""
    n = qblocks_zz.shape[0]
    dcs = qblocks_zz[:, 0].astype(np.int64)
    diffs = np.diff(np.concatenate([[0], dcs]))
    records = []
    dc_syms, ac_syms = set(), set()
    for b in range(n):
        diff = int(diffs[b])
        dsize = abs(diff).bit_length()  # JPEG category == bit_length(|v|)
        dc_syms.add(dsize)
        acs = qblocks_zz[b, 1:]
        nz = np.flatnonzero(acs)
        ac_ops = []
        prev = -1
        for pos in nz:
            run = int(pos - prev - 1)
            prev = int(pos)
            while run > 15:
                ac_ops.append((0xF0, 0, 0))      # ZRL
                ac_syms.add(0xF0)
                run -= 16
            v = int(acs[pos])
            size = abs(v).bit_length()
            sym = (run << 4) | size
            ac_ops.append((sym, v, size))
            ac_syms.add(sym)
        if len(nz) == 0 or nz[-1] != 62:
            ac_ops.append((0x00, 0, 0))          # EOB
            ac_syms.add(0x00)
        records.append((dsize, diff, ac_ops))
    return records, sorted(dc_syms), sorted(ac_syms)


def encode_jpeg(img: np.ndarray, quality: int = 90, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF JPEG bytes.

    ``subsample=True`` emits 4:2:0 (2x2 luma sampling); default 4:4:4 keeps
    chroma full-res (PSNR >= 40 dB at quality >= ~90 on natural content).
    """
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    ycc = rgb_to_ycbcr(img)
    ql, qc = quality_tables(quality)
    hs, vs = (2, 2) if subsample else (1, 1)

    # component planes (padded), sampling factors, quant table ids
    y = _pad_to(ycc[..., 0], 8 * vs, 8 * hs)
    if subsample:
        cbf = _pad_to(ycc[..., 1], 16, 16)
        crf = _pad_to(ycc[..., 2], 16, 16)
        cb = cbf.reshape(cbf.shape[0] // 2, 2, cbf.shape[1] // 2, 2).mean(axis=(1, 3))
        cr = crf.reshape(crf.shape[0] // 2, 2, crf.shape[1] // 2, 2).mean(axis=(1, 3))
    else:
        cb = _pad_to(ycc[..., 1], 8, 8)
        cr = _pad_to(ycc[..., 2], 8, 8)

    comps = [  # (plane, h_samp, v_samp, qtable, qid)
        (y, hs, vs, ql, 0),
        (cb, 1, 1, qc, 1),
        (cr, 1, 1, qc, 1),
    ]

    # quantize all blocks per component (order = MCU interleave order below)
    qz = []
    for plane, _hs, _vs, qt, _qi in comps:
        blocks = _to_blocks(plane - 128.0)
        coefs = fdct_blocks(blocks).reshape(-1, 64)
        qcoef = np.round(coefs / qt[None, :].astype(np.float32)).astype(np.int32)
        qz.append(qcoef[:, ZIGZAG])

    # MCU traversal order per component: for sampling (hs, vs) the MCU at
    # (my, mx) covers luma blocks rows my*vs..+vs, cols mx*hs..+hs
    h8y, w8y = y.shape[0] // 8, y.shape[1] // 8
    mcu_h, mcu_w = h8y // vs, w8y // hs
    order_y = []
    for my in range(mcu_h):
        for mx in range(mcu_w):
            for by in range(vs):
                for bx in range(hs):
                    order_y.append((my * vs + by) * w8y + (mx * hs + bx))
    qz[0] = qz[0][np.array(order_y, dtype=np.int64)]

    # per-component symbol streams + huffman tables (luma=id0, chroma=id1)
    recs, dc_sy, ac_sy = [], [set(), set()], [set(), set()]
    for ci, z in enumerate(qz):
        r, ds, asy = _encode_component_blocks(z)
        recs.append(r)
        tid = 0 if ci == 0 else 1
        dc_sy[tid].update(ds)
        ac_sy[tid].update(asy)
    # DC tables always cover categories 0..11: restart intervals reset the
    # predictor mid-scan, creating diff sizes the no-restart pre-pass never
    # saw (a KeyError otherwise); 12 fixed symbols cost 4-bit codes anyway
    dc_tables = [_fixed_length_table(list(range(12))) for _ in dc_sy]
    ac_tables = [_fixed_length_table(sorted(s)) for s in ac_sy]
    dc_codes = [_canonical_codes(*t) for t in dc_tables]
    ac_codes = [_canonical_codes(*t) for t in ac_tables]

    # ---- entropy-coded scan (interleaved MCUs) ----
    bw = _BitWriter()
    idx = [0, 0, 0]
    n_mcus = mcu_h * mcu_w
    blocks_per_mcu = [hs * vs, 1, 1]
    last_dc = [0, 0, 0]

    def emit_block(ci: int, rec) -> None:
        tid = 0 if ci == 0 else 1
        dsize, diff, ac_ops = rec
        code, ln = dc_codes[tid][dsize]
        bw.write(code, ln)
        if dsize:
            bw.write(_amplitude_bits(diff, dsize), dsize)
        for sym, v, size in ac_ops:
            code, ln = ac_codes[tid][sym]
            bw.write(code, ln)
            if size:
                bw.write(_amplitude_bits(v, size), size)

    # recompute DC diffs honoring restart intervals: simplest is to re-derive
    # diff per block on the fly from the stored absolute DCs
    abs_dc = [np.cumsum(np.concatenate([[0], [r[1] for r in recs[c]]]))[1:]
              for c in range(3)]
    rst = 0
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            last_dc = [0, 0, 0]
        for ci in range(3):
            for _ in range(blocks_per_mcu[ci]):
                b = idx[ci]
                dc = int(abs_dc[ci][b])
                diff = dc - last_dc[ci]
                last_dc[ci] = dc
                dsize = abs(diff).bit_length()
                emit_block(ci, (dsize, diff, recs[ci][b][2]))
                idx[ci] += 1
    bw.flush()

    # ---- headers ----
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")                         # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(ql[ZIGZAG].astype(np.uint8)))
    out += seg(0xFFDB, b"\x01" + bytes(qc[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, (_p, ch, cv, _q, qid) in enumerate(comps, start=1):
        sof += struct.pack(">BBB", cid, (ch << 4) | cv, qid)
    out += seg(0xFFC0, sof)                              # SOF0 baseline
    for tclass, tables in ((0, dc_tables), (1, ac_tables)):
        for tid, (bits, vals) in enumerate(tables):
            payload = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
            out += seg(0xFFC4, payload)
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = b"\x03"
    for cid in (1, 2, 3):
        tid = 0 if cid == 1 else 1
        sos += struct.pack(">BB", cid, (tid << 4) | tid)
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"                                   # EOI
    return bytes(out)


# ------------------------------------------------------------- decoder

def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline-sequential JPEG bytes -> (h, w, 3) uint8 RGB (grayscale
    replicated to 3 channels). Raises NotImplementedError for progressive /
    arithmetic-coded / hierarchical files, ValueError for malformed ones."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    n = len(data)
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffDecoder] = {}
    restart_interval = 0
    frame = None  # (h, w, [(cid, hsamp, vsamp, qid)])
    scan = None

    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:           # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue                 # standalone markers
        seglen = struct.unpack_from(">H", data, pos)[0]
        body = data[pos + 2: pos + seglen]
        pos += seglen
        if marker == 0xDB:           # DQT — may hold several tables
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                off += 1
                if pq:
                    tb = np.frombuffer(body, dtype=">u2", count=64, offset=off)
                    off += 128
                else:
                    tb = np.frombuffer(body, dtype=np.uint8, count=64, offset=off)
                    off += 64
                q = np.zeros(64, np.int32)
                q[ZIGZAG] = tb.astype(np.int32)   # stored in zigzag order
                qtables[tq] = q
        elif marker == 0xC4:         # DHT — may hold several tables
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1: off + 17])
                cnt = sum(bits)
                vals = list(body[off + 17: off + 17 + cnt])
                htables[(tc, th)] = _get_huff(bits, vals)
                off += 17 + cnt
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 (both huffman sequential)
            _prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for ci in range(nc):
                cid, sf, qid = struct.unpack_from(">BBB", body, 6 + 3 * ci)
                comps.append((cid, sf >> 4, sf & 0x0F, qid))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (progressive/arithmetic/"
                "hierarchical) is outside the baseline decoder")
        elif marker == 0xDD:
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:         # SOS — entropy data follows
            if scan is not None:
                # T.81 allows one non-interleaved scan per component; this
                # decoder handles the single interleaved-scan baseline only.
                # Overwriting `scan` would silently decode just the last
                # component — fail loudly at the stub boundary instead.
                raise NotImplementedError(
                    "multiple SOS segments (non-interleaved multi-scan "
                    "baseline JPEG) are outside this decoder — single "
                    "interleaved scan only")
            ns = body[0]
            if frame is not None and ns < len(frame[2]):
                raise NotImplementedError(
                    f"SOS covers {ns} of {len(frame[2])} frame components "
                    "(non-interleaved per-component scans) — outside this "
                    "single-interleaved-scan baseline decoder")
            smap = {}
            for si in range(ns):
                cid, tt = body[1 + 2 * si], body[2 + 2 * si]
                smap[cid] = (tt >> 4, tt & 0x0F)
            # find the end of the entropy segment: next marker that is not
            # RSTn / stuffed 0x00
            end = pos
            while end + 1 < n:
                if data[end] == 0xFF and data[end + 1] != 0x00 \
                        and not (0xD0 <= data[end + 1] <= 0xD7):
                    break
                end += 1
            scan = (smap, data[pos:end])
            pos = end
        # APPn / COM / others: skipped via seglen

    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    fh, fw, comps = frame
    if len(comps) == 1 and (comps[0][1] != 1 or comps[0][2] != 1):
        # A single-component scan is non-interleaved per T.81 §A.2: one data
        # unit per MCU, sampling factors do not apply. Normalizing to 1x1
        # decodes such grayscale frames correctly instead of misplacing MCUs.
        cid, _, _, qid = comps[0]
        comps = [(cid, 1, 1, qid)]
    smap, raw = scan

    # strip restart markers, unstuff 0xFF00. Vectorized: any 0xFF followed
    # by 0xD0-0xD7 in entropy data IS a restart marker (a stuffed data 0xFF
    # is always emitted as FF 00), so split on RSTs first, then unstuff each
    # chunk with bytes.replace — C-speed instead of a byte-at-a-time loop.
    import re as _re

    chunks = [p.replace(b"\xff\x00", b"\xff")
              for p in _re.split(b"\xff[\xd0-\xd7]", raw)]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w = -(-fw // (8 * hmax))
    mcu_h = -(-fh // (8 * vmax))
    n_mcus = mcu_w * mcu_h

    # per-component coefficient store (blocks in MCU-interleave order)
    blocks_per_mcu = [c[1] * c[2] for c in comps]
    coef = [np.zeros((n_mcus * bpm, 64), dtype=np.int32)
            for bpm in blocks_per_mcu]
    decs = []
    for cid, _h, _v, _q in comps:
        if cid not in smap:
            raise ValueError(
                f"SOS component ids {sorted(smap)} do not cover frame "
                f"component {cid}")
        tdc, tac = smap[cid]
        try:
            decs.append((htables[(0, tdc)], htables[(1, tac)]))
        except KeyError as exc:
            raise ValueError(f"missing huffman table {exc}") from exc

    cfn = None if FORCE_PURE_PYTHON else _load_centropy()
    if cfn is not None:
        import ctypes

        ncomp = len(comps)
        pu32 = ctypes.POINTER(ctypes.c_uint32)
        pi32 = ctypes.POINTER(ctypes.c_int32)
        dc_ptrs = (pu32 * ncomp)(
            *[d[0].lut.ctypes.data_as(pu32) for d in decs])
        ac_ptrs = (pu32 * ncomp)(
            *[d[1].lut.ctypes.data_as(pu32) for d in decs])
        bpm_arr = (ctypes.c_int * ncomp)(*blocks_per_mcu)
        coef_ptrs = (pi32 * ncomp)(
            *[c.ctypes.data_as(pi32) for c in coef])
        bidx_arr = (ctypes.c_long * ncomp)(*([0] * ncomp))
        span = restart_interval or n_mcus
        done = 0
        chunk_i = 0
        while done < n_mcus:
            if chunk_i >= len(chunks):
                raise ValueError("missing restart segment")
            pred_arr = (ctypes.c_int32 * ncomp)(*([0] * ncomp))
            data_c = chunks[chunk_i]
            rc = cfn(data_c, len(data_c), dc_ptrs, ac_ptrs, ncomp, bpm_arr,
                     coef_ptrs, bidx_arr, pred_arr,
                     min(span, n_mcus - done))
            if rc == -1:
                raise ValueError("bad huffman code (DC)")
            if rc == -2:
                raise ValueError("bad huffman code (AC)")
            if rc == -3:
                raise ValueError("AC index overflow")
            if rc == -4:
                raise ValueError("corrupt DC magnitude category")
            done += span
            chunk_i += 1
        return _reconstruct(comps, coef, qtables, mcu_w, mcu_h,
                            hmax, vmax, fh, fw)

    # Entropy loop, fully inlined: bit state lives in LOCAL ints (acc/nbits/
    # pos) and the Huffman LUTs are plain Python lists — one dict-free,
    # call-free iteration per symbol (bit reads pad with 1-bits past the end
    # per the spec so trailing EOB decodes; EXTEND per T.81 F.2.2.1).
    # Reference semantics for this loop live in jpeg_entropy.c, which the
    # parity tests compare bit-for-bit. Measured ~3x on the decode hot
    # path, which the jpg-bearing bench fixture exposes end-to-end.
    ncomp = len(comps)
    dc_luts = [d[0].lut_list() for d in decs]
    ac_luts = [d[1].lut_list() for d in decs]
    chunk_i = 0
    data_c = chunks[0]
    dlen = len(data_c)
    pos_c = 0
    acc = 0
    nbits = 0
    pred = [0] * ncomp
    bidx = [0] * ncomp
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            chunk_i += 1
            if chunk_i >= len(chunks):
                raise ValueError("missing restart segment")
            data_c = chunks[chunk_i]
            dlen = len(data_c)
            pos_c = 0
            acc = 0
            nbits = 0
            pred = [0] * ncomp
        for ci in range(ncomp):
            dc_lut = dc_luts[ci]
            ac_lut = ac_luts[ci]
            cmat = coef[ci]
            for _ in range(blocks_per_mcu[ci]):
                row = cmat[bidx[ci]]
                # DC
                while nbits < 16:  # pad with 1-bits past the end (spec)
                    acc = ((acc << 8)
                           | (data_c[pos_c] if pos_c < dlen else 0xFF)) \
                        & 0xFFFFFFFF
                    pos_c += 1
                    nbits += 8
                e = dc_lut[(acc >> (nbits - 16)) & 0xFFFF]
                ln = e >> 16
                if ln == 0:
                    raise ValueError("bad huffman code (DC)")
                sym = e & 0xFFFF
                if sym > 15:  # T.81 DC categories are <= 15 (12-bit max);
                    # the C path rejects the same symbols (parity contract)
                    raise ValueError("corrupt DC magnitude category")
                nbits -= ln
                acc &= (1 << nbits) - 1
                if sym:
                    while nbits < sym:
                        acc = ((acc << 8)
                               | (data_c[pos_c] if pos_c < dlen else 0xFF)) \
                            & 0xFFFFFFFF
                        pos_c += 1
                        nbits += 8
                    v = (acc >> (nbits - sym)) & ((1 << sym) - 1)
                    nbits -= sym
                    acc &= (1 << nbits) - 1
                    # EXTEND (T.81 F.2.2.1)
                    diff = v if v >= (1 << (sym - 1)) else v - (1 << sym) + 1
                else:
                    diff = 0
                pred[ci] += diff
                row[0] = pred[ci]
                # AC
                k = 1
                while k < 64:
                    while nbits < 16:
                        acc = ((acc << 8)
                               | (data_c[pos_c] if pos_c < dlen else 0xFF)) \
                            & 0xFFFFFFFF
                        pos_c += 1
                        nbits += 8
                    e = ac_lut[(acc >> (nbits - 16)) & 0xFFFF]
                    ln = e >> 16
                    if ln == 0:
                        raise ValueError("bad huffman code (AC)")
                    sym = e & 0xFFFF
                    nbits -= ln
                    acc &= (1 << nbits) - 1
                    size = sym & 0x0F
                    if size == 0:
                        if (sym >> 4) == 15:   # ZRL
                            k += 16
                            continue
                        break                  # EOB
                    k += sym >> 4
                    if k > 63:
                        raise ValueError("AC index overflow")
                    while nbits < size:
                        acc = ((acc << 8)
                               | (data_c[pos_c] if pos_c < dlen else 0xFF)) \
                            & 0xFFFFFFFF
                        pos_c += 1
                        nbits += 8
                    v = (acc >> (nbits - size)) & ((1 << size) - 1)
                    nbits -= size
                    acc &= (1 << nbits) - 1
                    row[k] = v if v >= (1 << (size - 1)) \
                        else v - (1 << size) + 1
                    k += 1
                bidx[ci] += 1

    return _reconstruct(comps, coef, qtables, mcu_w, mcu_h,
                        hmax, vmax, fh, fw)


def _reconstruct(comps, coef, qtables, mcu_w, mcu_h, hmax, vmax, fh, fw):
    """Dequantize + de-zigzag + IDCT + raster/upsample/color — shared by the
    compiled and pure-Python entropy paths (identical coef layout)."""
    planes = []
    for ci, (cid, ch, cv, qid) in enumerate(comps):
        q = qtables.get(qid)
        if q is None:
            raise ValueError(f"missing quant table {qid}")
        # coef rows are in SCAN (zigzag) order; q is the raster-order table,
        # so gather its zigzag view before multiplying, then de-zigzag
        z = (coef[ci].astype(np.float32)
             * q[ZIGZAG][None, :].astype(np.float32))
        blk = np.zeros_like(z)
        blk[:, ZIGZAG] = z                  # de-zigzag
        pix = idct_blocks(blk.reshape(-1, 8, 8)) + 128.0
        # blocks arrive in MCU order; map back to raster order
        bw_c = mcu_w * ch                   # blocks across, this component
        bh_c = mcu_h * cv
        raster = np.zeros((bh_c * bw_c, 8, 8), dtype=np.float32)
        # vectorized index map MCU->raster
        order = np.empty(bh_c * bw_c, dtype=np.int64)
        k = 0
        for my in range(mcu_h):
            for mx in range(mcu_w):
                for by in range(cv):
                    for bx in range(ch):
                        order[k] = (my * cv + by) * bw_c + (mx * ch + bx)
                        k += 1
        raster[order] = pix
        plane = _from_blocks(raster, bh_c, bw_c)
        # upsample to full MCU grid resolution
        ry, rx = vmax // cv, hmax // ch
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        g = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG unsupported")
    return ycbcr_to_rgb(planes[0], planes[1], planes[2])
