"""Differential fuzz for the table-maintenance operators added in the third
continuation: the low-shuffle two-pass exact dedup and the CDC changelog
apply. Both must match DuckDB on randomized corpora — duplicate-heavy,
all-unique, tiny and empty shapes included."""
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from conftest import fuzz_canon, fuzz_collect


def _write_docs(tmp_path, name, t: pa.Table) -> str:
    d = tmp_path / name
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, f"{d}/documents.parquet")
    return str(d)


def _docs_table(rng, n: int, pool: int) -> pa.Table:
    pool_texts = np.array(
        ["doc " + "".join(rng.choice(list("abcdefgh"), 12)) + f" #{i}"
         for i in range(max(pool, 1))])
    ids = rng.permutation(10 * max(n, 1))[:n].astype(np.int64)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(pool_texts[rng.integers(0, max(pool, 1), n)]),
        "n_chars": pa.array(rng.integers(1, 5000, n), pa.int64()),
    })


def _result_rows(res) -> list[tuple]:
    import pandas as pd

    if isinstance(res, pd.DataFrame):
        return fuzz_canon(pa.Table.from_pandas(res, preserve_index=False))
    if isinstance(res, pa.Table):
        return fuzz_canon(res)
    t = fuzz_collect(res)
    return fuzz_canon(t) if t is not None else []


@pytest.mark.parametrize("seed", range(5))
def test_lowshuffle_dedup_fuzz_vs_duckdb(ray_session, tmp_path, seed):
    """dedup_keep_first_lowshuffle == GROUP BY text min(doc_id) on random
    corpora: heavy-dup (pool << n), all-unique (pool >> n), and tiny."""
    from deduplication_ray.pipelines.relational import \
        q_dedup_keep_first_lowshuffle

    rng = np.random.default_rng(7100 + seed)
    n = int(rng.choice([1, 2, 53, 400]))
    pool = int(rng.choice([1, 3, 25, 1000]))
    t = _docs_table(rng, n, pool)
    sf = _write_docs(tmp_path, f"fz{seed}", t)
    got = _result_rows(q_dedup_keep_first_lowshuffle(sf))
    con = duckdb.connect()
    con.register("documents", t)
    want = fuzz_canon(con.execute(
        "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text").arrow())
    assert got == want, f"seed={seed} n={n} pool={pool}"


@pytest.mark.parametrize("seed", range(5))
def test_apply_changelog_fuzz_vs_duckdb(ray_session, tmp_path, seed):
    """doc_apply_changelog == the DuckDB window-materialization of the same
    derived log on random corpora (ids hit the %5/%7/%11 classes by
    construction since ids are dense-ish random)."""
    from deduplication_ray.pipelines import docops

    rng = np.random.default_rng(7200 + seed)
    n = int(rng.choice([1, 2, 77, 500]))
    t = _docs_table(rng, n, max(n, 1))
    if seed % 2:
        # shift a random half of the (unique, < 1e6) ids by exactly the
        # 1e6 insert offset: shifted-insert keys now COLLIDE with real
        # doc_ids, and the version-separated log must stay deterministic
        # and oracle-equal under those collisions (uniqueness preserved:
        # shifted >= 1e6, unshifted < 1e6)
        ids = t["doc_id"].to_numpy()
        bump = rng.random(len(ids)) < 0.5
        t = t.set_column(0, "doc_id",
                         pa.array(ids + bump * 1_000_000, pa.int64()))
    sf = _write_docs(tmp_path, f"cl{seed}", t)
    got = _result_rows(docops.q_doc_apply_changelog(sf))
    con = duckdb.connect()
    con.register("documents", t)
    want = fuzz_canon(con.execute(docops.Q_DOC_APPLY_CHANGELOG_SQL).arrow())
    assert got == want, f"seed={seed} n={n}"


def test_lowshuffle_dedup_empty_corpus(ray_session, tmp_path):
    from deduplication_ray.pipelines.relational import \
        q_dedup_keep_first_lowshuffle

    t = pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string()),
                  "n_chars": pa.array([], pa.int64())})
    sf = _write_docs(tmp_path, "empty", t)
    assert _result_rows(q_dedup_keep_first_lowshuffle(sf)) == []
