"""Recall at the HARD end of the duplicate definition.

The standard fixture plants mild transforms (pHash Hamming ~0-4, caption
shingle Jaccard ~0.85+); the LSH sweep notes it does not stress weak
near-dups. This test plants pairs at the candidate-generation envelope the
design guarantees, with the OTHER channel deliberately broken:

  * image-only pairs: measured pHash Hamming in [1, 3] (the 4x16-bit
    multi-index pigeonhole guarantee) with completely unrelated captions;
  * caption-only pairs: measured char-5-shingle Jaccard in [0.70, 0.80]
    (well under the fixture's ~0.85+, well over jaccard_tau=0.5) with
    unrelated images.

Every planted pair sits inside the duplicate definition and inside a
candidate-generation region the banding covers, so recall must be 1.0 —
misses here are bugs, not operating-point choices.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from deduplication_ray.functions import codecs as C
from deduplication_ray.functions import hashing as H
from deduplication_ray.sources.fixtures import (apply_noise, make_vocab,
                                                render_pattern, _salad)

K = 5
N_IMG_PAIRS = 40
N_CAP_PAIRS = 40
N_FILLERS = 300


def _phash(img: np.ndarray) -> np.ndarray:
    g = C.resize_area(C.to_grayscale(img), 32)[None, :, :]
    return C.phash64_batch(g.astype(np.float32), 32, 8)[0]


def _hamming(a: np.uint64, b: np.uint64) -> int:
    return int(H.popcount64(np.array([a ^ b], dtype=np.uint64))[0])


def _shingles(s: str) -> set:
    return {s[i:i + K] for i in range(max(len(s) - K + 1, 1))}


def _jaccard(a: str, b: str) -> float:
    sa, sb = _shingles(a), _shingles(b)
    return len(sa & sb) / len(sa | sb)


def _edit_words(rng, cap: str, vocab: list, n: int) -> str:
    words = cap.split()
    idx = rng.choice(len(words), size=min(n, len(words)), replace=False)
    for i in idx:
        words[i] = vocab[int(rng.integers(len(vocab)))]
    return " ".join(words)


def test_chance_bridge_edge_does_not_merge_clusters(ray_session):
    """PRECISION at the hard end (verdict r4 #1): a single-channel chance
    Hamming-ball collision between two unrelated clusters — the exact
    failure mode that cost 2.4pt precision at 1M rows — must NOT survive
    verification and merge the clusters. The bridge is planted at the
    signature level (b1's phash = a's phash with 9 flips confined to the
    upper 48 bits, so one 16-bit multi-index band still collides) and
    driven through the REAL production fast path: ExplodeBands ->
    slim_pairs -> dedupe -> broadcast index -> resolve/verify ->
    union-find. With cross-channel corroboration disabled
    (pixel_corr_t=64) the same bridge DOES merge — proving the planted
    edge is effective and the corroboration gate is what kills it."""
    import dataclasses

    import ray.data

    from deduplication_ray.config import DedupConfig
    from deduplication_ray.stages import lsh, verify
    from deduplication_ray.state import unionfind

    cfg = DedupConfig(num_partitions=2)
    rng = np.random.default_rng(99)
    P_A = np.uint64(rng.integers(0, 2 ** 63))
    S_A = np.uint64(rng.integers(0, 2 ** 63))
    P_B, S_B = ~P_A, ~S_A  # unrelated pixel content: distance 64
    # b1's phash chance-collides into A's Hamming ball: 9 flips, all in the
    # upper 48 bits -> the low 16-bit band bucket still matches A exactly
    bridge_flips = np.uint64(0)
    for bit in (17, 23, 30, 38, 41, 47, 52, 58, 63):
        bridge_flips |= np.uint64(1) << np.uint64(bit)
    P_BRIDGE = P_A ^ bridge_flips

    def minhash_row(seed: int) -> np.ndarray:
        return np.random.default_rng(seed).integers(
            0, 2 ** 63, size=cfg.num_perm, dtype=np.uint64)

    mh_a, mh_b = minhash_row(1), minhash_row(2)  # same caption per cluster
    ids, phs, shs, mhs, cks = [], [], [], [], []
    for i in range(3):  # cluster A: identical pixels, shared caption
        ids.append(f"a{i}")
        phs.append(P_A)
        shs.append(S_A)
        mhs.append(mh_a)
        cks.append(1000 + i)
    for i in range(3):  # cluster B: shared caption; b1 carries the bridge
        ids.append(f"b{i}")
        phs.append(P_BRIDGE if i == 1 else P_B)
        shs.append(S_B)
        mhs.append(mh_b)
        cks.append(2000 + i)
    assert int(H.popcount64(np.array([P_A ^ P_BRIDGE], np.uint64))[0]) == 9
    assert int(H.popcount64(np.array([S_A ^ S_B], np.uint64))[0]) \
        > cfg.pixel_corr_t  # genuinely unrelated on the other channel
    sig_tbl = pa.table({
        "image_id": pa.array(ids),
        "ck1": pa.array([np.int64(c) for c in cks], pa.int64()),
        "ck2": pa.array(
            H.bitcast_u64_to_i64(np.array(
                [H.hash_bytes_array(pa.array(["capA" if i < 3 else "capB"]))[0]
                 for i in range(6)], np.uint64)), pa.int64()),
        "phash": pa.array(H.bitcast_u64_to_i64(np.array(phs, np.uint64)),
                          pa.int64()),
        "simhash": pa.array(H.bitcast_u64_to_i64(np.array(shs, np.uint64)),
                            pa.int64()),
        "minhash": H.pack_u64_rows(np.stack(mhs)),
    })

    def merged(c: DedupConfig) -> bool:
        sig_ds = ray.data.from_arrow(sig_tbl)
        buckets = sig_ds.map_batches(
            lsh.ExplodeBands(c, families=("minhash", "phash", "simhash",
                                          "exact")),
            batch_format="pyarrow")
        pairs = lsh.dedupe_slim_pairs(lsh.slim_pairs_from_buckets(buckets, c),
                                      c)
        ref = verify.signature_index(sig_ds, c)
        ve = verify.resolve_and_verify_pairs(pairs, ref, c, has_pixels=True)
        lab = unionfind.local_components(ve).to_pandas()
        lab = dict(zip(lab["node"], lab["label"]))
        groups = {x: lab.get(x, x) for x in ids}
        # each planted cluster must stay internally connected either way
        assert groups["a0"] == groups["a1"] == groups["a2"]
        assert groups["b0"] == groups["b1"] == groups["b2"]
        return groups["a0"] == groups["b0"]

    assert not merged(cfg), "chance bridge survived corroborated verify"
    assert merged(dataclasses.replace(cfg, pixel_corr_t=64)), \
        "planted bridge was ineffective — test is vacuous"


def test_hard_pair_recall_is_total(ray_session, tmp_path):
    from deduplication_ray.config import DedupConfig
    from deduplication_ray.pipelines.image_dedup import run_pipeline
    from deduplication_ray.sources import storage

    rng = np.random.default_rng(1234)
    vocab = make_vocab(7)
    rows = []

    def add(img: np.ndarray, caption: str) -> str:
        i = len(rows)
        iid = f"hard_{i:06d}"
        data = C.encode_image(img, "raw")
        rows.append({
            "image_id": iid, "bytes": data,
            "w": np.int32(img.shape[1]), "h": np.int32(img.shape[0]),
            "fmt": "raw", "caption": caption,
            "phash": np.int64(H.bitcast_u64_to_i64(
                np.array([_phash(img)], dtype=np.uint64))[0]),
        })
        return iid

    pairs = []

    # image channel at the pigeonhole guarantee, captions unrelated
    made = 0
    while made < N_IMG_PAIRS:
        p = int(rng.integers(1, 2 ** 31))
        w, h = int(rng.integers(40, 65)), int(rng.integers(40, 65))
        base = render_pattern(p, w, h)
        for _ in range(50):
            noisy = apply_noise(base, int(rng.integers(1, 2 ** 31)))
            d = _hamming(_phash(base), _phash(noisy))
            if 1 <= d <= 3:
                pairs.append((add(base, _salad(rng, vocab)),
                              add(noisy, _salad(rng, vocab)), f"img_h{d}"))
                made += 1
                break

    # caption channel at weak-but-covered Jaccard, images unrelated
    made = 0
    while made < N_CAP_PAIRS:
        cap = _salad(rng, vocab, 28, 40)
        for n_edits in range(3, 14):
            cap2 = _edit_words(rng, cap, vocab, n_edits)
            j = _jaccard(cap, cap2)
            if 0.70 <= j <= 0.80:
                p1, p2 = int(rng.integers(1, 2 ** 31)), int(rng.integers(1, 2 ** 31))
                w, h = int(rng.integers(40, 65)), int(rng.integers(40, 65))
                pairs.append((add(render_pattern(p1, w, h), cap),
                              add(render_pattern(p2, w, h), cap2),
                              f"cap_j{j:.2f}"))
                made += 1
                break

    for _ in range(N_FILLERS):
        w, h = int(rng.integers(40, 65)), int(rng.integers(40, 65))
        add(render_pattern(int(rng.integers(1, 2 ** 31)), w, h),
            _salad(rng, vocab))

    tbl = pa.Table.from_pylist(rows)
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    step = (tbl.num_rows + 3) // 4
    for i in range(4):
        pq.write_table(tbl.slice(i * step, step),
                       str(data_dir / f"part-{i}.parquet"))

    run_dir = str(tmp_path / "run")
    run_pipeline(str(data_dir), run_dir, DedupConfig(num_partitions=4))
    lab = storage.read_table(f"{run_dir}/clusters").to_pandas() \
        .set_index("image_id")["cluster_id"]

    missed = [tag for a, b, tag in pairs if lab[a] != lab[b]]
    recall = 1 - len(missed) / len(pairs)
    assert recall >= 0.99, f"missed {missed} (recall {recall:.4f})"
