"""asof_join property tests vs pandas.merge_asof — an independent oracle
(the DuckDB LATERAL oracle covers the registered query; this covers the
operator itself on adversarial shapes: empty sides, keys with no matches,
duplicate timestamps, skewed keys)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data


def _run_asof(left_df, right_df):
    from deduplication_ray.stages.asof import asof_join

    left = ray.data.from_arrow(pa.Table.from_pandas(left_df, preserve_index=False))
    right = ray.data.from_arrow(pa.Table.from_pandas(right_df, preserve_index=False))
    out = asof_join(
        left, right,
        key=("k", "rk"), ts=("t", "rt"), tiebreak="rid",
        right_payload=["rid"], num_parts=4,
    )
    return out.to_pandas().sort_values("lid").reset_index(drop=True)


def _oracle(left_df, right_df):
    rows = []
    for _, lr in left_df.iterrows():
        m = right_df[(right_df.rk == lr.k) & (right_df.rt <= lr.t)]
        if len(m):
            best = m.sort_values(["rt", "rid"]).iloc[-1]
            rows.append((lr.lid, lr.k, lr.t, best.rid, len(m)))
        else:
            rows.append((lr.lid, lr.k, lr.t, None, 0))
    return pd.DataFrame(rows, columns=["lid", "k", "t", "rid_asof", "n_right_asof"])


def _rand_frames(seed, n_left=200, n_right=150, n_keys=12):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "lid": np.arange(n_left, dtype=np.int64),
        "k": rng.integers(0, n_keys, n_left).astype(np.int64),
        "t": pd.to_datetime(rng.integers(0, 1000, n_left), unit="s"),
    })
    right = pd.DataFrame({
        "rid": np.arange(n_right, dtype=np.int64),
        "rk": rng.integers(0, n_keys, n_right).astype(np.int64),
        # coarse grid -> plenty of duplicate (key, ts) pairs to stress ties
        "rt": pd.to_datetime(rng.integers(0, 1000, n_right) // 50 * 50, unit="s"),
    })
    return left, right


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_matches_pandas_oracle(seed, ray_session):
    left, right = _rand_frames(seed)
    got = _run_asof(left, right)
    exp = _oracle(left, right)
    assert len(got) == len(exp)
    assert (got["n_right_asof"].to_numpy() == exp["n_right_asof"].to_numpy()).all()
    ga = got["rid_asof"].to_numpy(dtype=object)
    ea = exp["rid_asof"].to_numpy(dtype=object)
    for g, e in zip(ga, ea):
        if pd.isna(g) or pd.isna(e):
            assert pd.isna(g) and pd.isna(e)
        else:
            assert int(g) == int(e)


def test_asof_empty_right(ray_session):
    left, right = _rand_frames(3)
    got = _run_asof(left, right.iloc[0:0])
    assert len(got) == len(left)
    assert (got["n_right_asof"] == 0).all()
    assert got["rid_asof"].isna().all()


def test_asof_skewed_single_key(ray_session):
    left, right = _rand_frames(4, n_keys=1)
    got = _run_asof(left, right)
    exp = _oracle(left, right)
    assert (got["n_right_asof"].to_numpy() == exp["n_right_asof"].to_numpy()).all()
