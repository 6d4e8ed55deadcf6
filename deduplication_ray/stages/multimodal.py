"""Multimodal column stages: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns with metadata
columns (fmt, w, h / sample_rate / fps), processed by actor-pool
``map_batches`` stages. The *plumbing* — schemas, batch sizes, actor
signatures, output layout — is real and tested; decoders for codecs whose
libraries aren't in this container (JPEG, MP3, H.264) are STUBBED behind an
import-try + ``NotImplementedError`` or a clearly-marked deterministic fake.
The self-contained codecs (raw / png / qrgb, functions/codecs.py) are fully
real.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from deduplication_ray.config import DedupConfig
from deduplication_ray.functions import codecs as C
from deduplication_ray.functions import hashing as H

try:  # real JPEG/general decode only if Pillow happens to exist (it doesn't here)
    from PIL import Image as _PIL_Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


class DecodeImages:
    """binary+fmt -> decoded thumbnail features (grayscale SxS as binary).

    Real for raw/png/qrgb; JPEG and friends raise NotImplementedError unless
    Pillow is importable (stub boundary, clearly marked).
    """

    def __init__(self, cfg: DedupConfig | None = None, thumb: int = 32):
        self.cfg = cfg or DedupConfig()
        self.thumb = thumb

    def decode_one(self, data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
        if fmt in ("raw", "png", "qrgb"):
            return C.decode_image(data, fmt, w, h)
        if HAVE_PIL:
            import io

            return np.asarray(_PIL_Image.open(io.BytesIO(data)).convert("RGB"))
        raise NotImplementedError(
            f"decoder for fmt={fmt!r} requires an image library not present "
            "in this environment (stubbed; raw/png/qrgb are self-contained)"
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        fmts = t["fmt"].to_pylist()
        ws, hs = t["w"].to_numpy(), t["h"].to_numpy()
        payload = t["bytes"].combine_chunks() if isinstance(t["bytes"], pa.ChunkedArray) else t["bytes"]
        out = np.empty((n, self.thumb * self.thumb), dtype=np.uint8)
        for i in range(n):
            img = self.decode_one(payload[i].as_py(), fmts[i], int(ws[i]), int(hs[i]))
            g = C.resize_area(C.to_grayscale(img), self.thumb)
            out[i] = np.clip(g, 0, 255).astype(np.uint8).ravel()
        blob = pa.BinaryArray.from_buffers(
            pa.binary(), n,
            [None,
             pa.array(np.arange(n + 1, dtype=np.int32) * (self.thumb ** 2)).buffers()[1],
             pa.py_buffer(out.tobytes())],
        )
        return pa.table({"image_id": t["image_id"], "thumb": blob,
                         "thumb_size": pa.array(np.full(n, self.thumb, np.int32))})


class AudioFrameFeatures:
    """STUB audio stage: binary waveform column -> per-window RMS features.

    No audio codec library exists in this container, so the 'decode' is a
    deterministic fake — payload bytes reinterpreted as int16 PCM — which
    keeps the Ray-side plumbing (schema, windowing, actor pool) real and
    testable. Swap ``_decode_pcm`` for a real decoder when available.
    """

    def __init__(self, window: int = 1024):
        self.window = window

    def _decode_pcm(self, data: bytes) -> np.ndarray:
        usable = (len(data) // 2) * 2
        return np.frombuffer(data[:usable], dtype=np.int16).astype(np.float32)

    def __call__(self, t: pa.Table) -> pa.Table:
        payload = t["bytes"].combine_chunks() if isinstance(t["bytes"], pa.ChunkedArray) else t["bytes"]
        ids, rms_all, widx = [], [], []
        for i in range(t.num_rows):
            pcm = self._decode_pcm(payload[i].as_py())
            nw = len(pcm) // self.window
            if nw == 0:
                continue
            w = pcm[: nw * self.window].reshape(nw, self.window)
            rms = np.sqrt((w.astype(np.float64) ** 2).mean(axis=1))
            ids.append(np.repeat(t["audio_id"][i].as_py(), nw))
            widx.append(np.arange(nw, dtype=np.int64))
            rms_all.append(rms)
        if not ids:
            return pa.table({"audio_id": pa.array([], pa.string()),
                             "window": pa.array([], pa.int64()),
                             "rms": pa.array([], pa.float64())})
        return pa.table({
            "audio_id": pa.array(np.concatenate(ids), pa.string()),
            "window": pa.array(np.concatenate(widx)),
            "rms": pa.array(np.concatenate(rms_all)),
        })


class VideoFrameSample:
    """STUB video stage: emits every k-th 'frame' as an opaque binary slice.

    Real video decode needs ffmpeg/PyAV (absent). The fake treats the payload
    as fixed-size frame records (frame_bytes param) — the sampling logic,
    schema, and actor signature are the real scale-path plumbing.
    """

    def __init__(self, every_k: int = 30, frame_bytes: int = 4096):
        self.k = every_k
        self.frame_bytes = frame_bytes

    def __call__(self, t: pa.Table) -> pa.Table:
        payload = t["bytes"].combine_chunks() if isinstance(t["bytes"], pa.ChunkedArray) else t["bytes"]
        vids, fidx, frames = [], [], []
        for i in range(t.num_rows):
            data = payload[i].as_py()
            n_frames = len(data) // self.frame_bytes
            for f in range(0, n_frames, self.k):
                vids.append(t["video_id"][i].as_py())
                fidx.append(f)
                frames.append(data[f * self.frame_bytes: (f + 1) * self.frame_bytes])
        return pa.table({
            "video_id": pa.array(vids, pa.string()),
            "frame": pa.array(fidx, pa.int64()),
            "frame_bytes": pa.array(frames, pa.binary()),
        })
