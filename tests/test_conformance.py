"""Direct conformance vs the ACTUAL reference binary (FIXTURES.md §1).

Copies the C sources out of the read-only reference tree, builds them with
make, runs ``dedup_bin c/d`` over the sample corpus, and asserts our Ray
implementation reproduces the .ddp container BYTE-FOR-BYTE (header, dict
payload in id order, id stream) and the decode round trip.
"""

import os
import shutil
import subprocess

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

REF = "/root/reference"
SAMPLES = [
    ("T_raw.bin", 2),
    ("lux_raw.bin", 2),
    ("P_raw.bin", 4),
    ("seven_day_T.bin", 2),   # the two largest captures (296,554 samples
    ("seven_day_RH.bin", 2),  # each) close out the reference corpus
]
BLOCK_SIZES = [2, 8, 32]


@pytest.fixture(scope="module")
def ref_bin(tmp_path_factory):
    build = tmp_path_factory.mktemp("refbuild")
    for item in ("Makefile", "main.c", "include", "src"):
        src = os.path.join(REF, item)
        dst = os.path.join(build, item)
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
    subprocess.run(["make"], cwd=build, check=True, capture_output=True)
    exe = next(
        (os.path.join(build, f) for f in os.listdir(build)
         if os.access(os.path.join(build, f), os.X_OK)
         and not os.path.isdir(os.path.join(build, f))
         and not f.endswith((".c", ".h", "Makefile"))),
        None,
    )
    assert exe, f"no executable produced in {os.listdir(build)}"
    return exe


@pytest.mark.parametrize("sample,width", SAMPLES)
@pytest.mark.parametrize("block", BLOCK_SIZES)
def test_encode_bitwise_parity(ref_bin, tmp_path, ray_session, sample, width, block):
    from deduplication_ray.sources import ddp1

    src = os.path.join(REF, "samples", sample)
    ref_out = tmp_path / f"{sample}.{block}.ref.ddp"
    subprocess.run([ref_bin, "c", str(width), str(block), src, str(ref_out)],
                   check=True, capture_output=True)
    ours, summary = ddp1.compress_bytes(open(src, "rb").read(), width, block)
    theirs = open(ref_out, "rb").read()
    assert ours == theirs, (
        f"DDP1 mismatch for {sample} w={width} b={block}: "
        f"len {len(ours)} vs {len(theirs)}; "
        f"first diff at {next((i for i, (a, c) in enumerate(zip(ours, theirs)) if a != c), None)}"
    )


@pytest.mark.parametrize("sample,width", SAMPLES[:1])
def test_decode_roundtrip_parity(ref_bin, tmp_path, ray_session, sample, width):
    from deduplication_ray.sources import ddp1

    block = 8
    src = os.path.join(REF, "samples", sample)
    ref_ddp = tmp_path / "ref.ddp"
    ref_dec = tmp_path / "ref.out"
    subprocess.run([ref_bin, "c", str(width), str(block), src, str(ref_ddp)],
                   check=True, capture_output=True)
    subprocess.run([ref_bin, "d", str(ref_ddp), str(ref_dec)],
                   check=True, capture_output=True)
    ours = ddp1.decompress_bytes(open(ref_ddp, "rb").read())
    assert ours == open(ref_dec, "rb").read()
    # round-trip contract: first used_samples*width bytes of the input
    data = open(src, "rb").read()
    used = (len(data) // width // block) * block * width
    assert ours == data[:used]


def test_tail_truncation_and_validation(ray_session):
    from deduplication_ray.sources import ddp1

    data = bytes(range(16)) * 4  # 64 bytes
    ddp, s = ddp1.compress_bytes(data, 2, 5)  # 32 samples -> 6 blocks of 5, tail 2
    assert s["num_blocks"] == 6 and s["used_samples"] == 30
    assert ddp1.decompress_bytes(ddp) == data[:60]
    with pytest.raises(ValueError):
        ddp1.compress_bytes(data, 3, 5)  # invalid width
    with pytest.raises(ValueError):
        ddp1.decompress_bytes(b"NOPE" + ddp[4:])


def test_encode_distributed_path_parity(ref_bin, tmp_path, ray_session, monkeypatch):
    """Force the distributed encode plan (groupby-min election + distributed
    sort by block_idx + streamed id collection) and assert bitwise parity
    with the reference binary — proves the scale path computes the identical
    container, not just the local np.unique fast path."""
    from deduplication_ray.sources import ddp1

    monkeypatch.setattr(ddp1, "LOCAL_ENCODE_MAX_BLOCKS", 0)
    width, block = 2, 8
    src = os.path.join(REF, "samples", "T_raw.bin")
    ref_out = tmp_path / "dist.ref.ddp"
    subprocess.run([ref_bin, "c", str(width), str(block), src, str(ref_out)],
                   check=True, capture_output=True)
    ours, summary = ddp1.compress_bytes(open(src, "rb").read(), width, block)
    assert ours == open(ref_out, "rb").read()
    assert summary["num_blocks"] * block == summary["used_samples"]


@given(st.data())
@settings(max_examples=120, deadline=None)
def test_decompress_never_crashes_on_corruption(data):
    """Decoder robustness the C reference lacks: ANY single-byte corruption
    or truncation of a valid container either still decodes to bytes
    (payload flips are undetectable without checksums — allowed) or raises
    a clean ValueError — never an unhandled numpy/struct/index crash."""
    from deduplication_ray.sources.ddp1 import compress_bytes, decompress_bytes

    payload = bytes(range(256)) * 4
    ddp, _ = compress_bytes(payload, 2, 8)
    mode = data.draw(st.sampled_from(["flip", "truncate", "garbage"]))
    if mode == "flip":
        pos = data.draw(st.integers(0, len(ddp) - 1))
        val = data.draw(st.integers(1, 255))
        corrupted = ddp[:pos] + bytes([ddp[pos] ^ val]) + ddp[pos + 1:]
    elif mode == "truncate":
        cut = data.draw(st.integers(0, len(ddp) - 1))
        corrupted = ddp[:cut]
    else:
        corrupted = bytes(data.draw(st.binary(max_size=64)))
    try:
        out = decompress_bytes(corrupted)
        assert isinstance(out, bytes)
    except ValueError:
        pass  # the clean failure contract


def test_decompress_output_budget_rejects_crafted_expansion():
    """A crafted header whose gather product dwarfs the container must hit
    the ValueError budget, while a LEGITIMATE high-ratio container (one
    dict block, many references) still decodes under a generous budget."""
    import struct

    import numpy as np

    from deduplication_ray.sources.ddp1 import MAGIC, compress_bytes, decompress_bytes

    # legitimate 1000x expansion: one repeated block
    payload = bytes(range(16)) * 1000
    ddp, _ = compress_bytes(payload, 2, 8)
    assert decompress_bytes(ddp, max_output_bytes=1 << 20) == payload

    # crafted: same dictionary, num_blocks inflated to promise ~64 MB
    ids = np.zeros(1 << 24 >> 2, dtype="<u4").tobytes()  # 4M ids
    hdr = MAGIC + struct.pack("<II", 1 << 25, 8) + struct.pack("<B3x", 2) \
        + struct.pack("<II", 1, len(ids) // 4)
    crafted = hdr + bytes(16) + ids
    with pytest.raises(ValueError):
        decompress_bytes(crafted, max_output_bytes=1 << 20)
