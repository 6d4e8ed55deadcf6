"""Storage facade isolation (T1): the engine's sinks/sources are pluggable
behind ``storage.FORMAT``. A fake registered format drives the REAL
checkpoint layer end-to-end, proving the documented one-line Lance swap
(``register_format`` + ``set_format``) actually holds — no pipeline or
checkpoint code path knows the physical format."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from deduplication_ray.config import DedupConfig
from deduplication_ray.sources import storage
from deduplication_ray.state.checkpoint import CheckpointedRun

FAKE_EXT = ".fakefmt"


def _fake_write(ds: ray.data.Dataset, path: str, **kw) -> None:
    tbls = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    tbl = (pa.concat_tables(tbls, promote_options="default") if tbls
           else pa.table({}))
    pq.write_table(tbl, os.path.join(path, "part-0" + FAKE_EXT))


def _fake_read(path, columns=None, **kw):
    if isinstance(path, (list, tuple)):
        files = list(path)
    elif os.path.isdir(path):
        files = [os.path.join(path, f) for f in sorted(os.listdir(path))
                 if f.endswith(FAKE_EXT)]
    else:
        files = [path]
    tbl = pa.concat_tables([pq.read_table(f) for f in files],
                           promote_options="default")
    if columns:
        tbl = tbl.select(columns)
    return ray.data.from_arrow(tbl)


@pytest.fixture
def fake_format():
    storage.register_format("fakefmt", _fake_read, _fake_write, (FAKE_EXT,))
    storage.set_format("fakefmt")
    try:
        yield
    finally:
        storage.set_format("parquet")
        del storage._BACKENDS["fakefmt"]


def test_write_read_round_trip_through_fake_format(ray_session, tmp_path,
                                                   fake_format):
    ds = ray.data.from_arrow(pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]}))
    out = str(tmp_path / "t")
    storage.write_table(ds, out)
    files = os.listdir(out)
    assert files and all(f.endswith(FAKE_EXT) for f in files), files
    got = storage.read_table(out, columns=["a"]).to_pandas()
    assert sorted(got["a"]) == [1, 2, 3] and list(got.columns) == ["a"]


def test_checkpoint_layer_is_format_agnostic(ray_session, tmp_path,
                                             fake_format):
    """run_stage writes, completes, and RESUMES through the registered
    backend — zero .parquet files anywhere in the run dir."""
    cfg = DedupConfig(num_partitions=2)
    run_dir = str(tmp_path / "run")
    calls = []

    def stage():
        calls.append(1)
        return ray.data.from_arrow(pa.table({"k": list(range(10))}))

    r1 = CheckpointedRun(run_dir, cfg)
    out1 = r1.run_stage("s1", stage)
    assert r1.executed == ["s1"] and out1.count() == 10
    r1.flush()  # checkpoint writes are deferred; durability lands at flush

    walked = [f for _, _, fs in os.walk(run_dir) for f in fs]
    assert any(f.endswith(FAKE_EXT) for f in walked)
    assert not any(f.endswith(".parquet") for f in walked), walked

    r2 = CheckpointedRun(run_dir, cfg)
    out2 = r2.run_stage("s1", stage)
    assert r2.skipped == ["s1"] and len(calls) == 1  # resumed, not recomputed
    assert sorted(out2.to_pandas()["k"]) == list(range(10))


def test_deferred_commits_are_ordered(ray_session, tmp_path, monkeypatch):
    """complete(downstream) must imply complete(upstream): if stage s1's
    manifest never lands, s2 must NOT be marked complete even though its
    compute and table write succeeded (commit threads are chained)."""
    import time

    cfg = DedupConfig(num_partitions=2)
    run_dir = str(tmp_path / "run_ordered")
    real_manifest = storage.write_manifest
    real_write = storage.write_table

    def slow_s1_write(ds, path, **kw):
        if os.sep + "s1" in path:
            time.sleep(0.3)  # make s1 the LAST commit to finish naturally
        return real_write(ds, path, **kw)

    def failing_s1_manifest(path, m, **kw):
        if m.get("stage") == "s1" and m.get("complete"):
            raise OSError("injected: s1 manifest write failed")
        return real_manifest(path, m, **kw)

    monkeypatch.setattr(storage, "write_table", slow_s1_write)
    monkeypatch.setattr(storage, "write_manifest", failing_s1_manifest)
    r = CheckpointedRun(run_dir, cfg)
    r.run_stage("s1", lambda: ray.data.from_arrow(pa.table({"k": [1, 2]})))
    r.run_stage("s2", lambda: ray.data.from_arrow(pa.table({"k": [3]})),
                upstream=["s1"])
    with pytest.raises(RuntimeError):
        r.flush()
    monkeypatch.setattr(storage, "write_manifest", real_manifest)
    monkeypatch.setattr(storage, "write_table", real_write)
    assert not r.is_complete("s1")
    assert not r.is_complete("s2")  # chained: s2 refused to outrun s1


def test_set_format_rejects_unregistered():
    with pytest.raises(ValueError, match="not registered"):
        storage.set_format("lance")
    assert storage.FORMAT == "parquet"


def test_compact_table_merges_small_files(ray_session, tmp_path):
    """64 tiny part files -> a handful of ~target-row files with the exact
    same multiset of rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deduplication_ray.sources import storage

    src = tmp_path / "frag"
    src.mkdir()
    for i in range(64):
        pq.write_table(pa.table({
            "id": pa.array(range(i * 10, i * 10 + 10), pa.int64()),
            "v": pa.array([f"r{j}" for j in range(i * 10, i * 10 + 10)]),
        }), str(src / f"part-{i:03d}.parquet"))

    out = tmp_path / "compact"
    rep = storage.compact_table(str(src), str(out), target_rows_per_file=200)
    assert rep == {"files_in": 64, "files_out": rep["files_out"], "rows": 640}
    assert rep["files_out"] <= 4
    a = storage.read_table(str(src)).to_pandas().sort_values("id") \
        .reset_index(drop=True)
    b = storage.read_table(str(out)).to_pandas().sort_values("id") \
        .reset_index(drop=True)
    assert a.equals(b)


def test_partitioned_write_and_pruned_partition_read(ray_session, tmp_path):
    """Hive-partitioned sink: directory-per-key layout on disk, and
    read_partition returns exactly the full-read filter for that key while
    touching only the partition's subtree."""
    from deduplication_ray.sources import storage

    docs = storage.read_table("/root/testdata/sf0.001/documents.parquet",
                              columns=["doc_id", "lang", "text"])
    out = str(tmp_path / "by_lang")
    storage.write_partitioned(docs, out, by=["lang"])

    full = docs.to_pandas()
    langs = sorted(full["lang"].unique())
    assert sorted(d for d in os.listdir(out) if d.startswith("lang=")) == \
        [f"lang={v}" for v in langs]

    one = storage.read_partition(out, lang=langs[0]).to_pandas()
    want = full[full["lang"] == langs[0]]
    cols = ["doc_id", "lang", "text"]
    assert (one[cols].sort_values("doc_id").reset_index(drop=True)
            .equals(want[cols].sort_values("doc_id").reset_index(drop=True)))

    # column pruning composes with partition pruning
    pruned = storage.read_partition(out, columns=["doc_id", "lang"],
                                    lang=langs[1]).to_pandas()
    assert sorted(pruned.columns) == ["doc_id", "lang"]
    assert set(pruned["lang"]) == {langs[1]}
    assert len(pruned) == (full["lang"] == langs[1]).sum()


def test_nested_partition_write_and_read(ray_session, tmp_path):
    from deduplication_ray.sources import storage

    docs = storage.read_table("/root/testdata/sf0.001/documents.parquet",
                              columns=["doc_id", "lang", "source", "n_chars"])
    out = str(tmp_path / "by_lang_source")
    storage.write_partitioned(docs, out, by=["lang", "source"])

    full = docs.to_pandas()
    lang = sorted(full["lang"].unique())[0]
    src = sorted(full.loc[full["lang"] == lang, "source"].unique())[0]
    got = storage.read_partition(out, lang=lang, source=src).to_pandas()
    want = full[(full["lang"] == lang) & (full["source"] == src)]
    cols = ["doc_id", "lang", "source", "n_chars"]
    assert (got[cols].sort_values("doc_id").reset_index(drop=True)
            .equals(want[cols].sort_values("doc_id").reset_index(drop=True)))


def test_feather_and_orc_roundtrip(ray_session, tmp_path):
    """The interchange backends (Feather/Arrow IPC, ORC) round-trip a table
    through write_table/read_table with filter + column pruning applied
    post-decode, and extension detection picks the right backend."""
    import pyarrow.compute as pc

    from deduplication_ray.sources import storage

    docs = storage.read_table("/root/testdata/sf0.001/documents.parquet",
                              columns=["doc_id", "lang", "n_chars"])
    want = docs.to_pandas().sort_values("doc_id").reset_index(drop=True)

    for fmt in ("feather", "orc", "msgpack"):
        out = str(tmp_path / fmt)
        storage._BACKENDS[fmt].writer(docs, out)
        got = storage.read_table(out).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert got[["doc_id", "lang", "n_chars"]].equals(want)

        pruned = storage.read_table(
            out, columns=["doc_id", "lang"],
            filter=pc.field("lang") == want["lang"].iloc[0]).to_pandas()
        assert set(pruned.columns) == {"doc_id", "lang"}
        assert (pruned["lang"] == want["lang"].iloc[0]).all()
        assert len(pruned) == (want["lang"] == want["lang"].iloc[0]).sum()


def test_native_format_switch_to_feather(ray_session, tmp_path):
    """set_format to a registered backend redirects write_table/read_table
    (the Lance swap path exercised with a REAL second format, not a fake)."""
    from deduplication_ray.sources import storage

    docs = storage.read_table("/root/testdata/sf0.001/documents.parquet",
                              columns=["doc_id", "n_chars"])
    out = str(tmp_path / "native_feather")
    old = storage.FORMAT
    try:
        storage.set_format("feather")
        storage.write_table(docs, out)
        import glob

        assert glob.glob(f"{out}/*.feather")
        got = storage.read_table(out).to_pandas()
    finally:
        storage.set_format(old)
    assert len(got) == docs.count()
