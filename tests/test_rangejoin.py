"""range_join_count property tests vs a brute-force pandas oracle — the
DuckDB oracle covers the registered events query; this covers the operator
itself on adversarial shapes: duplicate timestamps, skewed keys, negative
lower bounds (symmetric windows), empty input."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from deduplication_ray.stages.rangejoin import range_join_count


def _run(df, lo, hi, num_parts=4):
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = range_join_count(ds, key="k", ts="t", lo=lo, hi=hi,
                           out_cols=["rid"], num_parts=num_parts)
    return out.to_pandas().sort_values("rid").reset_index(drop=True)


def _oracle(df, lo, hi):
    t_i8 = df["t"].astype("int64")
    rows = []
    for i in range(len(df)):
        same = (df["k"] == df["k"].iloc[i])
        d = t_i8[same] - t_i8.iloc[i]
        rows.append((df["rid"].iloc[i], int(((d > lo) & (d <= hi)).sum())))
    return (pd.DataFrame(rows, columns=["rid", "n_in_range"])
            .sort_values("rid").reset_index(drop=True))


def _rand_frame(seed, n=300, n_keys=9):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "rid": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, n_keys, n).astype(np.int64),
        # coarse grid -> duplicate (key, ts) rows to stress tie handling
        "t": pd.to_datetime(rng.integers(0, 500, n) // 7 * 7, unit="s"),
    })


@pytest.mark.parametrize("seed,lo,hi", [
    (1, 0, 60_000_000),            # forward window
    (2, -30_000_000, 30_000_000),  # symmetric window
    (3, 0, 1),                     # near-degenerate
    (4, -7_000_000, 0),            # backward window (excludes self? no:
                                   # (lo, 0] includes equal-ts rows)
])
def test_matches_bruteforce(ray_session, seed, lo, hi):
    df = _rand_frame(seed)
    got = _run(df, lo, hi)
    want = _oracle(df, lo, hi)
    # self-row: d = 0 is inside (lo, hi] iff lo < 0 <= hi; the operator and
    # the oracle agree by construction — assert frame equality directly
    pd.testing.assert_frame_equal(got, want)


def test_skewed_key_single_partition(ray_session):
    df = _rand_frame(7, n=400, n_keys=1)   # one hot key
    got = _run(df, 0, 100_000_000, num_parts=8)
    want = _oracle(df, 0, 100_000_000)
    pd.testing.assert_frame_equal(got, want)


def test_empty_input(ray_session):
    # empty groupby input produces an empty (possibly schema-less) dataset;
    # assert emptiness on the Dataset, not on named pandas columns
    df = _rand_frame(5, n=0)
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = range_join_count(ds, key="k", ts="t", lo=0, hi=1000, out_cols=["rid"])
    assert out.count() == 0
