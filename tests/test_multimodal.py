"""Multimodal stage plumbing: real codecs decode, stub boundaries raise."""

import numpy as np
import pyarrow as pa
import pytest

from deduplication_ray.functions import codecs as C
from deduplication_ray.stages.multimodal import (
    AudioFrameFeatures,
    DecodeImages,
    VideoFrameSample,
)


def _img_batch():
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 256, (40, 40, 3), dtype=np.uint8) for _ in range(3)]
    return pa.table({
        "image_id": ["a", "b", "c"],
        "bytes": [C.encode_png(imgs[0]), C.encode_raw(imgs[1]), C.encode_qrgb(imgs[2])],
        "fmt": ["png", "raw", "qrgb"],
        "w": pa.array([40, 40, 40], pa.int32()),
        "h": pa.array([40, 40, 40], pa.int32()),
    }), imgs


def test_decode_images_thumbnails():
    batch, imgs = _img_batch()
    out = DecodeImages(thumb=16)(batch)
    assert out.num_rows == 3
    t0 = np.frombuffer(out["thumb"][0].as_py(), dtype=np.uint8).reshape(16, 16)
    expect = np.clip(C.resize_area(C.to_grayscale(imgs[0]), 16), 0, 255).astype(np.uint8)
    assert (t0 == expect).all()


def test_decode_images_stub_raises_for_missing_codec():
    batch, _ = _img_batch()
    bad = batch.set_column(batch.column_names.index("fmt"), "fmt",
                           pa.array(["jpeg", "raw", "raw"]))
    from deduplication_ray.stages import multimodal

    if not multimodal.HAVE_PIL:
        with pytest.raises(NotImplementedError, match="jpeg"):
            DecodeImages()(bad)


def test_audio_frame_features_stub():
    pcm = (np.sin(np.linspace(0, 100, 5000)) * 10000).astype(np.int16).tobytes()
    t = pa.table({"audio_id": ["x"], "bytes": [pcm]})
    out = AudioFrameFeatures(window=1024)(t)
    assert out.num_rows == len(pcm) // 2 // 1024
    assert (np.array(out["rms"]) > 0).all()


def test_video_frame_sample_stub():
    payload = bytes(range(256)) * 160  # 40960 bytes = 10 frames of 4096
    t = pa.table({"video_id": ["v"], "bytes": [payload]})
    out = VideoFrameSample(every_k=3, frame_bytes=4096)(t)
    assert out["frame"].to_pylist() == [0, 3, 6, 9]
    assert all(len(f) == 4096 for f in out["frame_bytes"].to_pylist())
