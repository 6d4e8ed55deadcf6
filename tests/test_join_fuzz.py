"""Differential fuzz: shuffle_join vs DuckDB on randomized inputs.

The TPC-H analogs all ride shuffle_join for their one big-big edge, but they
only exercise the key/type shapes those queries happen to have. This fuzzes
the operator itself: random row counts (including empty sides), skewed key
distributions (many-to-many fan-out), single- and multi-column keys, null
VALUES (null keys are out of contract — SQL nulls never match anyway), and
all three join types, against DuckDB as the oracle; plus bucket-count
invariance (1 vs 7 vs 32 buckets must be a no-op on the result)."""
import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray

from deduplication_ray.stages.join import shuffle_join

HOWS = {"inner": "INNER", "left": "LEFT", "full outer": "FULL"}


def _rand_table(rng, prefix: str, keys: list[str], n: int) -> pa.Table:
    cols = {}
    for k in keys:
        # small cardinality forces many-to-many matches and misses on both
        # sides; occasional wide range gives mostly-unique keys
        card = int(rng.choice([3, 8, 40, 10_000]))
        cols[k] = pa.array(rng.integers(0, card, n), pa.int64())
    ints = rng.integers(-50, 50, n)
    int_valid = rng.random(n) > 0.1
    cols[f"{prefix}_v"] = pa.array(
        [int(x) if ok else None for x, ok in zip(ints, int_valid)], pa.int64())
    words = np.array(["", "a", "bb", "ccc", "dd dd", "éé"])
    cols[f"{prefix}_s"] = pa.array(words[rng.integers(0, len(words), n)],
                                   pa.string())
    return pa.table(cols)


def _blocks(rng, t: pa.Table) -> ray.data.Dataset:
    """Split into several blocks so bucketing crosses block boundaries."""
    if t.num_rows == 0:
        return ray.data.from_arrow(t)
    k = int(rng.integers(1, 4))
    cuts = sorted(rng.integers(0, t.num_rows + 1, k - 1).tolist())
    cuts = [0] + cuts + [t.num_rows]
    return ray.data.from_arrow(
        [t.slice(a, b - a) for a, b in zip(cuts[:-1], cuts[1:])])


def _canon(t: pa.Table, names: list[str]):
    t = t.select(names)
    rows = [tuple(d[c] for c in names) for d in t.to_pylist()]
    return sorted(rows, key=lambda r: tuple((v is None, v) for v in r))


def _collect(ds: ray.data.Dataset) -> pa.Table | None:
    """Concatenated result, or None for an empty result (whose blocks may
    carry a degenerate schema)."""
    tables = [t for t in (ray.get(r) for r in ds.to_arrow_refs())
              if t.num_rows]
    if not tables:
        return None
    return pa.concat_tables(tables, promote_options="default")


@pytest.mark.parametrize("seed", range(8))
def test_shuffle_join_fuzz_vs_duckdb(ray_session, seed):
    rng = np.random.default_rng(1000 + seed)
    keys = ["k1", "k2"] if seed % 3 == 0 else ["k1"]
    nl = int(rng.choice([0, 1, 17, 230]))
    nr = int(rng.choice([0, 1, 23, 180]))
    lt = _rand_table(rng, "l", keys, nl)
    rt = _rand_table(rng, "r", keys, nr)
    how = list(HOWS)[seed % 3]

    mine = _collect(shuffle_join(_blocks(rng, lt), _blocks(rng, rt),
                                 on=keys, how=how, num_buckets=7))

    con = duckdb.connect()
    con.register("l", lt)
    con.register("r", rt)
    names = list(lt.column_names) + ["r_v", "r_s"]
    sql = (f"SELECT {', '.join(names)} FROM l {HOWS[how]} JOIN r "
           f"USING ({', '.join(keys)})")
    oracle = con.execute(sql).arrow()
    ctx = f"seed={seed} how={how} keys={keys} nl={nl} nr={nr}"
    if mine is None:
        assert oracle.num_rows == 0, ctx
        return
    oracle = oracle.cast(mine.select(names).schema)
    assert _canon(mine, names) == _canon(oracle, names), ctx


def test_shuffle_join_bucket_count_invariance(ray_session):
    rng = np.random.default_rng(77)
    lt = _rand_table(rng, "l", ["k1"], 150)
    rt = _rand_table(rng, "r", ["k1"], 90)
    names = list(lt.column_names) + ["r_v", "r_s"]
    outs = []
    for nb in (1, 7, 32):
        res = _collect(shuffle_join(_blocks(rng, lt), _blocks(rng, rt),
                                    on=["k1"], how="full outer",
                                    num_buckets=nb))
        outs.append(_canon(res, names))
    assert outs[0] == outs[1] == outs[2]
