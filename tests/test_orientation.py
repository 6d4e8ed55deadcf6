"""Orientation-invariant (dihedral) pHash + rot-dup pipeline tests."""

from __future__ import annotations

import shutil

import numpy as np
import pandas as pd
import pytest

from deduplication_ray.functions import codecs as C


def _ham(a: int, b: int) -> int:
    return bin(int(a) ^ int(b)).count("1")


def test_dihedral_phash_matches_pixel_transforms():
    """Column k of phash64_dihedral_batch is the pHash of
    dihedral_apply(img, k): bitwise for identity, <= 1 bit otherwise (the
    one-DCT derivation differs from a fresh DCT only by float jitter on
    near-median ties)."""
    rng = np.random.default_rng(7)
    for _ in range(20):
        h, w = rng.integers(40, 120, 2)
        img = rng.integers(0, 256, (int(h), int(w), 3), dtype=np.uint8)
        gray = C.resize_area(C.to_grayscale(img), 32)
        dh = C.phash64_dihedral_batch(gray[None])[0]
        assert dh[0] == C.phash64(img)
        for k in range(8):
            ph = C.phash64(np.ascontiguousarray(C.dihedral_apply(img, k)))
            assert _ham(dh[k], ph) <= 1, (k, C.DIHEDRAL_NAMES[k])


def test_dihedral_hash_set_is_group_invariant():
    """The 8-hash multiset of g(A) equals (a permutation of) the multiset of
    A, within 1 bit per element — the property the verify step's
    'a0 vs all 8 of b' comparison relies on."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    base = C.phash64_dihedral_batch(
        C.resize_area(C.to_grayscale(img), 32)[None])[0]
    for g in range(8):
        t = np.ascontiguousarray(C.dihedral_apply(img, g))
        th = C.phash64_dihedral_batch(
            C.resize_area(C.to_grayscale(t), 32)[None])[0]
        for k in range(8):
            assert min(_ham(th[k], b) for b in base) <= 1, (g, k)


def test_dihedral_apply_is_a_group():
    """All 8 transforms are distinct and each is an involution or has its
    inverse in the set (applying all 8 to a marker image yields 8 distinct
    images whose transform sets coincide)."""
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    outs = [C.dihedral_apply(img, k) for k in range(8)]
    flat = {o.tobytes() + bytes(o.shape) for o in outs}
    assert len(flat) == 8


@pytest.fixture(scope="module")
def rot_fixture(ray_session, tiny_fixture):
    out = "/tmp/dedup_ray_test_rotfix"
    shutil.rmtree(out, ignore_errors=True)
    from deduplication_ray.sources import fixtures

    fixtures.generate_rotated(tiny_fixture, out, stride=5)
    return out


def test_rot_dup_pipeline_recovers_planted_rotations(ray_session,
                                                     rot_fixture,
                                                     tiny_fixture):
    from deduplication_ray.config import DedupConfig
    from deduplication_ray.pipelines import orientation
    from deduplication_ray.sources import storage

    cfg = DedupConfig(num_partitions=4, sig_concurrency=2)
    ds = storage.read_table(f"{rot_fixture}/data")
    pairs = orientation.run_rot_dup(ds, cfg).to_pandas()
    truth = storage.read_table(f"{rot_fixture}/truth_pairs").to_pandas()
    assert len(truth) > 50

    def key(a, b):
        return (a, b) if a <= b else (b, a)

    pred = {key(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    want = {key(a, b) for a, b in zip(truth["id_a"], truth["id_b"])}
    missing = want - pred
    assert not missing, f"missed {len(missing)}/{len(want)}: {list(missing)[:5]}"

    # precision: every predicted pair is truth-consistent — both endpoints
    # map (rot copies to their original) into the SAME planted cluster
    base_truth = storage.read_table(f"{tiny_fixture}/truth").to_pandas()
    cluster = dict(zip(base_truth["image_id"], base_truth["cluster_id"]))

    def root(i: str) -> str:
        if i.startswith("rot") and "_of_" in i:
            i = i.split("_of_", 1)[1]
        return cluster[i]

    wrong = [(a, b) for a, b in pred if root(a) != root(b)]
    assert not wrong, f"{len(wrong)} cross-cluster pairs, e.g. {wrong[:5]}"


def test_plain_phash_is_blind_to_rotations(ray_session, rot_fixture):
    """The capability is real: the planted rotated copies sit FAR from
    their originals in plain pHash space (beyond any sane Hamming verify
    threshold), while the dihedral min-Hamming is ~0."""
    from deduplication_ray.sources import storage

    data = storage.read_table(f"{rot_fixture}/data",
                              columns=["image_id", "phash"]).to_pandas()
    truth = storage.read_table(f"{rot_fixture}/truth_pairs").to_pandas()

    def u64(v) -> int:
        return int(np.int64(v).astype(np.uint64))

    ph = dict(zip(data["image_id"], data["phash"]))
    # near-symmetric patterns can fluke close; assert on the distribution
    d = np.array([_ham(u64(ph[a]), u64(ph[b]))
                  for a, b in zip(truth["id_a"], truth["id_b"])])
    assert np.median(d) > 6, f"median plain-pHash Hamming {np.median(d)}"
    assert (d > 6).mean() > 0.7, f"only {(d > 6).mean():.0%} beyond threshold"


def test_pipeline_with_orientation_channel_clusters_rotations(ray_session,
                                                              rot_fixture):
    """End-to-end: cfg.orientation_channel folds dihedral edges into the
    main pipeline's union-find, so every planted rotated copy lands in its
    original's cluster (default config leaves them apart)."""
    import shutil as _sh

    from deduplication_ray.config import DedupConfig
    from deduplication_ray.pipelines import image_dedup
    from deduplication_ray.sources import storage

    run_dir = "/tmp/dedup_ray_test_rotrun"
    _sh.rmtree(run_dir, ignore_errors=True)
    cfg = DedupConfig(num_partitions=4, sig_concurrency=2,
                      orientation_channel=True)
    image_dedup.run_pipeline(f"{rot_fixture}/data", run_dir, cfg)
    clusters = storage.read_table(f"{run_dir}/clusters").to_pandas()
    lab = dict(zip(clusters["image_id"], clusters["cluster_id"]))
    truth = storage.read_table(f"{rot_fixture}/truth_pairs").to_pandas()
    split = [(a, b) for a, b in zip(truth["id_a"], truth["id_b"])
             if lab[a] != lab[b]]
    assert not split, f"{len(split)}/{len(truth)} rot pairs split: {split[:5]}"
