"""Content-defined chunking (CDC) dedup: the vectorized gear-hash chunker
must match the textbook per-byte loop bit-exactly, chunks must tile every
document, the chunking must be batch/partition invariant, and the end-to-end
query must (a) conserve corpus bytes and (b) actually recover planted
shifted duplicates (the property fixed-block dedup cannot have)."""
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from deduplication_ray.pipelines.docops import (_CDC_GEAR, _cdc_cuts,
                                                q_doc_cdc_dedup)

MASK_BITS = 6
MAX_CHUNK = 256


def serial_gear_cdc(doc: bytes, mask_bits: int = MASK_BITS,
                    max_chunk: int = MAX_CHUNK) -> list[bytes]:
    """Textbook per-byte gear CDC: h = (h << 1) + GEAR[b]; cut after i when
    (h & mask) == 0; then split any chunk longer than max_chunk at fixed
    strides."""
    mask = (1 << mask_bits) - 1
    h = 0
    cuts = [0]
    for i, b in enumerate(doc):
        h = ((h << 1) + int(_CDC_GEAR[b])) & 0xFFFFFFFFFFFFFFFF
        if (h & mask) == 0:
            cuts.append(i + 1)
    if not doc:
        return []
    if cuts[-1] != len(doc):
        cuts.append(len(doc))
    out = [0]
    for c in cuts[1:]:
        while c - out[-1] > max_chunk:
            out.append(out[-1] + max_chunk)
        out.append(c)
    return [doc[a:b] for a, b in zip(out[:-1], out[1:])]


def chunks_per_doc(texts: list[str]) -> list[list[bytes]]:
    raw, cuts, chunk_doc = _cdc_cuts(pa.array(texts, pa.string()),
                                     MASK_BITS, MAX_CHUNK)
    out = [[] for _ in texts]
    for a, b, d in zip(cuts[:-1], cuts[1:], chunk_doc):
        out[int(d)].append(raw[a:b].tobytes())
    return out


def _random_docs(n: int, seed: int) -> list[str]:
    rng = np.random.default_rng(seed)
    docs = []
    for _ in range(n):
        ln = int(rng.integers(0, 900))
        docs.append(bytes(rng.integers(32, 127, ln, dtype=np.uint8))
                    .decode("ascii"))
    return docs


def test_cdc_matches_serial_reference():
    docs = _random_docs(150, seed=11)
    docs += ["", "a" * 700]          # empty doc; boundary-free uniform run
    mine = chunks_per_doc(docs)
    for d, text in enumerate(docs):
        assert mine[d] == serial_gear_cdc(text.encode("ascii")), f"doc {d}"


def test_cdc_chunks_tile_documents_and_respect_max():
    docs = _random_docs(80, seed=23) + ["x" * 3000]
    for d, chs in enumerate(chunks_per_doc(docs)):
        assert b"".join(chs) == docs[d].encode("ascii")
        assert all(0 < len(c) <= MAX_CHUNK for c in chs)


def test_cdc_is_batch_invariant():
    """Chunking a doc must not depend on which batch (or neighbors) it
    arrives with — the property that makes the distributed op well-defined."""
    docs = _random_docs(120, seed=37)
    whole = chunks_per_doc(docs)
    split = chunks_per_doc(docs[:41]) + chunks_per_doc(docs[41:])
    assert whole == split


def test_cdc_dedup_query_conserves_bytes_and_finds_shifted_dups(
        ray_session, tmp_path):
    """Plant a shifted duplicate (doc B = prefix + doc A) and an exact
    duplicate across sources; the query must conserve total corpus bytes
    and attribute most of the duplicated bytes as saved."""
    rng = np.random.default_rng(5)
    base = bytes(rng.integers(32, 127, 4000, dtype=np.uint8)).decode()
    fillers = _random_docs(30, seed=41)
    texts = [base, "SHIFT-PREFIX::" + base, base] + fillers
    srcs = ["a", "a", "b"] + ["c"] * len(fillers)
    rows = pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(srcs),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    d = str(tmp_path / "cdc_sf")
    os.makedirs(d)
    pq.write_table(rows, f"{d}/documents.parquet")

    g = q_doc_cdc_dedup(d)
    corpus_bytes = sum(len(t.encode()) for t in texts)
    assert int(g["total_bytes"].sum()) == corpus_bytes
    assert int(g["unique_bytes"].sum()) <= corpus_bytes
    # the two extra copies of `base` (one exact, one shifted) are ~8000
    # duplicated bytes; CDC must recover the exact copy fully and the
    # shifted copy beyond its first chunk, so well over half of it.
    assert int(g["saved_bytes"].sum()) > int(1.5 * len(base))
    # attribution is to the global min-(doc, chunk) rep => source 'a'
    by_src = g.set_index("source")
    assert by_src.loc["a", "saved_bytes"] > 0
    # every copy is counted somewhere exactly once
    assert int(g["n_copies"].sum()) >= int(g["n_unique_chunks"].sum())


def test_cdc_dedup_query_matches_serial_totals(ray_session, tmp_path):
    """End-to-end parity: the distributed query's totals must equal an
    exact serial recomputation (serial chunker + a Python dict keyed on
    actual chunk CONTENT, so any 128-bit hash-identity merge of unequal
    chunks would show up as a mismatch)."""
    texts = _random_docs(60, seed=53)
    rows = pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    d = str(tmp_path / "cdc_serial_sf")
    os.makedirs(d)
    pq.write_table(rows, f"{d}/documents.parquet")
    g = q_doc_cdc_dedup(d)

    seen: dict[bytes, int] = {}
    total = n_chunks = 0
    for t in texts:
        for c in serial_gear_cdc(t.encode("ascii")):
            seen[c] = seen.get(c, 0) + 1
            total += len(c)
            n_chunks += 1
    unique = sum(len(c) for c in seen)
    assert int(g["total_bytes"].sum()) == total
    assert int(g["unique_bytes"].sum()) == unique
    assert int(g["n_unique_chunks"].sum()) == len(seen)
    assert int(g["n_copies"].sum()) == n_chunks
    assert int(g["saved_bytes"].sum()) == total - unique


def test_cdc_beats_fixed_blocks_on_misaligned_sensor_duplicate():
    """The reference's dictionary dedup (fixed block_size frames,
    compressor.c:75-114) only collapses ALIGNED repeats: a duplicated
    segment at a misaligned byte offset shares ~no fixed blocks with its
    source. CDC re-aligns at the next content boundary, so the same
    misaligned repeat dedups almost fully — the capability this operator
    adds over the bit-conformant DDP1 mode. Sensor-shaped binary input
    (u32 LE samples) exercises the binary-column path of _cdc_cuts."""
    rng = np.random.default_rng(97)
    seg = rng.integers(0, 2**16, 4096, dtype=np.uint32).tobytes()  # 16 KB
    noise1 = rng.integers(0, 2**32, 512, dtype=np.uint32).tobytes()
    noise2 = rng.integers(0, 2**32, 512, dtype=np.uint32).tobytes()
    stream_a = noise1 + seg
    stream_b = noise2[:-3] + seg  # repeat lands 3 bytes off any block grid

    block = 256
    fixed = [set(), set()]
    for k, s in enumerate((stream_a, stream_b)):
        for off in range(0, len(s) - block + 1, block):
            fixed[k].add(s[off:off + block])
    shared_fixed = len(fixed[0] & fixed[1])

    raw, cuts, chunk_doc = _cdc_cuts(
        pa.array([stream_a, stream_b], pa.binary()), MASK_BITS, MAX_CHUNK)
    cset = [set(), set()]
    for a, b, d in zip(cuts[:-1], cuts[1:], chunk_doc):
        cset[int(d)].add(raw[a:b].tobytes())
    shared_bytes = sum(len(c) for c in cset[0] & cset[1])

    assert shared_fixed == 0  # fixed-block dedup is blind to the repeat
    assert shared_bytes > 0.8 * len(seg)  # CDC recovers >80% of it
