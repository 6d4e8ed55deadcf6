"""Differential fuzz for the pre-aggregation spine and the broadcast join.

`_keyed_reduce` (in-batch partial + hash-partitioned combine) is the
pre-shuffle aggregation discipline under most TPC-H analogs; `lookup_join`
is the broadcast edge under every dimension decoration. Both must match
DuckDB on randomized inputs and be partition-count invariant."""
import duckdb
import numpy as np
import pyarrow as pa
import pytest

from deduplication_ray.config import DedupConfig
from deduplication_ray.pipelines.relational import _keyed_reduce
from deduplication_ray.stages.join import lookup_join

from conftest import fuzz_blocks, fuzz_canon, fuzz_collect


def _rows(ds_or_table) -> list[tuple]:
    if ds_or_table is None:
        return []
    return fuzz_canon(ds_or_table)


@pytest.mark.parametrize("seed", range(6))
def test_keyed_reduce_fuzz_vs_duckdb(ray_session, seed):
    rng = np.random.default_rng(2000 + seed)
    n = int(rng.choice([0, 1, 37, 500]))
    card = int(rng.choice([2, 9, 1000]))
    t = pa.table({
        "k": pa.array(rng.integers(-card, card, n), pa.int64()),
        "v": pa.array(rng.integers(-100, 100, n), pa.int64()),
    })
    num_parts = int(rng.choice([1, 5, 32]))
    out = fuzz_collect(_keyed_reduce(fuzz_blocks(rng, t), "k",
                                     {"s": ("v", "sum"), "m": ("v", "max"),
                                      "c": ("v", "count")},
                                     num_parts=num_parts))
    con = duckdb.connect()
    con.register("t", t)
    oracle = con.execute(
        "SELECT k, CAST(sum(v) AS BIGINT) AS s, max(v) AS m, "
        "count(*) AS c FROM t GROUP BY k").arrow()
    assert _rows(out) == _rows(oracle), \
        f"seed={seed} n={n} card={card} parts={num_parts}"


def test_keyed_reduce_partition_count_invariance(ray_session):
    rng = np.random.default_rng(88)
    t = pa.table({
        "k": pa.array(rng.integers(0, 11, 400), pa.int64()),
        "v": pa.array(rng.integers(-5, 6, 400), pa.int64()),
    })
    outs = [_rows(fuzz_collect(_keyed_reduce(fuzz_blocks(rng, t), "k",
                                             {"s": ("v", "sum")},
                                             num_parts=p)))
            for p in (1, 3, 32)]
    assert outs[0] == outs[1] == outs[2]


@pytest.mark.parametrize("seed", range(6))
def test_lookup_join_fuzz_vs_duckdb(ray_session, seed):
    rng = np.random.default_rng(3000 + seed)
    n = int(rng.choice([0, 1, 64, 300]))
    m = int(rng.choice([0, 1, 12, 50]))
    how = ("inner", "left")[seed % 2]
    big = pa.table({
        "k": pa.array(rng.integers(0, 25, n), pa.int64()),
        "x": pa.array(rng.integers(-9, 9, n), pa.int64()),
    })
    # duplicate lookup keys exercise the fan-out path
    small = pa.table({
        "k": pa.array(rng.integers(0, 25, m), pa.int64()),
        "y": pa.array(rng.integers(100, 200, m), pa.int64()),
    })
    out = lookup_join(fuzz_blocks(rng, big), fuzz_blocks(rng, small),
                      on=["k"], cfg=DedupConfig(), how=how)
    con = duckdb.connect()
    con.register("big", big)
    con.register("small", small)
    oracle = con.execute(
        f"SELECT big.k, x, y FROM big "
        f"{'LEFT ' if how == 'left' else ''}JOIN small USING (k)").arrow()
    assert _rows(fuzz_collect(out)) == _rows(oracle), \
        f"seed={seed} how={how} n={n} m={m}"
