"""Size-dispatched joins: broadcast map-side merge vs hash-partitioned join.

Every metadata join in this engine (edge <- signature attach, star-edge
min-id attach, label propagation, cluster finalize) has a 'lookup' side that
is usually far smaller than a worker's heap: broadcast it once with
``ray.put`` and pandas-merge per batch — no shuffle, no aggregator actors.
Above ``cfg.broadcast_limit`` rows the same call transparently falls back to
``Dataset.join`` (hash-partitioned) — that is the 10^12-row path.

Why this exists (measured, single node, 32 CPUs, 8k-row metadata): a DAG
unioning several ``Dataset.join`` operators spawns num_partitions aggregator
actors PER JOIN (102 observed), which time-slice the machine and turn a
~40s stage into 10+ minutes. Broadcast merges collapse all of that for the
small side while keeping the shuffle join available when it's genuinely
needed. This mirrors the reference's decode gather (R17,
``/root/reference/src/compressor.c:320-339``): the dictionary is the small
side, broadcast everywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from deduplication_ray.config import DedupConfig


def _key_hashes(t: pa.Table, on: list[str]) -> np.ndarray:
    """One u64 hash per row over the join key columns (order-sensitive mix).
    Purely an index accelerator — matches are always confirmed against the
    actual key values, so collisions cannot produce wrong joins."""
    from deduplication_ray.functions import hashing as H

    h: np.ndarray | None = None
    for k in on:
        col = t[k]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        typ = col.type
        if pa.types.is_null(typ):
            hk = np.zeros(len(col), np.uint64)
        elif pa.types.is_integer(typ):
            arr = col.fill_null(0).cast(pa.int64()).to_numpy(zero_copy_only=False)
            hk = H.splitmix64(arr.astype(np.int64).view(np.uint64))
        else:
            hk = H.hash_bytes_array(col.fill_null("").cast(pa.string()))
        h = hk if h is None else H.hash_u64_pair(h, hk)
    return h if h is not None else np.zeros(t.num_rows, np.uint64)


def _as_arrow_block(tbl) -> pa.Table:
    """Ray Data blocks are pa.Table OR pandas.DataFrame (when the producing
    stage ran ``batch_format=\"pandas\"``); the by-refs broadcast index must
    accept both."""
    if isinstance(tbl, pa.Table):
        return tbl
    return pa.Table.from_pandas(tbl, preserve_index=False)


@ray.remote(num_cpus=0.5)
def _block_key_hashes(tbl, on: list[str]) -> np.ndarray:
    """Per-block key hashes for the broadcast index — runs where the block
    lives; only the u64 array travels to the driver. Empty blocks may carry
    a STALE schema (a lazy rename/Project over zero rows is dropped), so
    they hash to nothing unconditionally — ``_resolve_small`` skips the
    same blocks, keeping row indices aligned."""
    tbl = _as_arrow_block(tbl)
    if tbl.num_rows == 0:
        return np.zeros(0, np.uint64)
    return _key_hashes(tbl, on)


def _resolve_small(small) -> pa.Table:
    """The broadcast payload is either a driver-built pa.Table (tiny/empty
    lookups) or a LIST OF BLOCK REFS (the normal path): the lookup's blocks
    stay in the object store and each task ray.gets them zero-copy (plasma
    mmap) and concatenates metadata-only — the driver never copies the
    lookup's bytes, which removed an O(|lookup|) driver-serial section from
    every broadcast join (measured ~1s per join at a 600k-row signature
    table)."""
    if isinstance(small, pa.Table):
        return small
    blocks = [b for b in map(_as_arrow_block, ray.get(list(small)))
              if b.num_rows]
    if not blocks:
        return (_as_arrow_block(ray.get(small[0])).slice(0, 0)
                if small else pa.table({}))
    return pa.concat_tables(blocks, promote_options="default")


class _GatherMerge:
    """Broadcast unique-key lookup realized as a vectorized gather: probe by
    searchsorted over presorted key hashes (built ONCE on the driver from
    distributed per-block hashes — 8 bytes/row to the driver, never the
    data), take matched lookup rows, confirm key equality exactly. No
    per-batch hash table build."""

    def __init__(self, ref, on: list[str], how: str):
        self.ref = ref
        self.on = on
        self.how = how
        self._state = None

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if self._state is None:
            small, sorted_h, order = ray.get(self.ref)
            self._state = (_resolve_small(small), sorted_h, order)
        small, sorted_h, order = self._state
        non_key = [c for c in small.column_names if c not in self.on]

        if t.num_rows == 0:
            cols: dict = {}
            for f in t.schema:
                typ = f.type
                if pa.types.is_null(typ):
                    typ = (small.schema.field(f.name).type
                           if f.name in small.column_names else pa.string())
                cols[f.name] = pa.array([], typ)
            for c in non_key:
                if c not in cols:
                    cols[c] = pa.array([], small.schema.field(c).type)
            return pa.table(cols)

        for i, f in enumerate(t.schema):
            if pa.types.is_null(f.type) and f.name in small.column_names:
                t = t.set_column(
                    i, f.name, t[f.name].cast(small.schema.field(f.name).type))

        ph = _key_hashes(t, self.on)
        if len(sorted_h):
            pos = np.minimum(np.searchsorted(sorted_h, ph),
                             len(sorted_h) - 1)
            cand = order[pos]
            matched = sorted_h[pos] == ph
        else:
            cand = np.zeros(len(ph), np.int64)
            matched = np.zeros(len(ph), bool)

        if matched.any():
            idx = pa.array(cand, pa.int64())
            for k in self.on:
                right_k = small[k].take(idx)
                lt_type = t.schema.field(k).type
                if right_k.type != lt_type:
                    right_k = right_k.cast(lt_type)
                eq = pc.fill_null(pc.equal(t[k], right_k), False)
                matched &= eq.to_numpy(zero_copy_only=False).astype(bool)

        if self.how == "inner":
            t_out = t.filter(pa.array(matched))
            gidx = pa.array(cand[matched], pa.int64())
        else:
            t_out = t
            gidx = pa.array(cand, mask=~matched, type=pa.int64())
        for c in non_key:
            t_out = t_out.append_column(c, small[c].take(gidx))
        return t_out


def lookup_join(
    ds: ray.data.Dataset,
    lookup: ray.data.Dataset | pd.DataFrame,
    on: list[str],
    cfg: DedupConfig,
    how: str = "inner",
    lookup_rows: int | None = None,
) -> ray.data.Dataset:
    """ds JOIN lookup ON on — broadcast when lookup is small, else shuffle.

    ``how``: 'inner' or 'left'. Output columns: ds columns + lookup's
    non-key columns (caller guarantees no name collisions).
    """
    # bytes guard: broadcast payloads are SHARED plasma blocks (every task
    # maps the same buffers read-only — no per-task copy), so the guard only
    # needs to keep one lookup within a worker heap's mmap budget; the row
    # guard (cfg.broadcast_limit) is what keeps 10^12-row tables off this
    # path. 512MB silently pushed the 600k-row signature attach onto the
    # aggregator-actor join (measured cliff); 2GB keeps every sub-limit
    # lookup on the gather path.
    MAX_BROADCAST_BYTES = 2 * 1024 * 1024 * 1024
    small_refs: list | None = None
    if isinstance(lookup, pd.DataFrame):
        small = pa.Table.from_pandas(lookup, preserve_index=False)
        n = len(lookup)
    else:
        lookup = lookup.materialize()
        n = lookup_rows if lookup_rows is not None else lookup.count()
        nbytes = lookup.size_bytes() or 0
        if n <= cfg.broadcast_limit and nbytes <= MAX_BROADCAST_BYTES:
            if n > 0:
                # broadcast BY REFERENCE: keep the lookup's blocks in the
                # object store and ship the ref list; only the 8-byte/row
                # key hashes (computed distributed, per block) reach the
                # driver for the one argsort that builds the probe index
                small_refs = [r for r in lookup.to_arrow_refs()]
                hs = ray.get([_block_key_hashes.remote(r, list(on))
                              for r in small_refs])
                kh = (np.concatenate(hs) if hs
                      else np.zeros(0, np.uint64))
                small = None
            else:
                schema = lookup.schema()
                arrow_schema = getattr(schema, "base_schema", None)
                if arrow_schema is None and schema is not None:
                    arrow_schema = pa.schema(
                        [pa.field(nm, tp) for nm, tp in zip(schema.names, schema.types)]
                    )
                left = getattr(ds.schema(), "base_schema", None)
                if arrow_schema is None:
                    # a FULLY empty dataset can lose its schema entirely
                    # (Dataset.schema() -> None); the join keys' types are
                    # still known from the probe side, and an all-empty
                    # lookup contributes no other columns to the output
                    if left is None:
                        # BOTH sides schema-less empty: the join of nothing
                        # with nothing is the (empty) probe side
                        return ds
                    arrow_schema = pa.schema([left.field(c) for c in on])
                # empty datasets can also report a STALE schema: a lazy
                # rename_columns/Project over zero blocks is dropped, so the
                # key columns may appear under their pre-rename names.
                # Synthesize the missing key fields from the probe side (the
                # stale-named leftovers become empty value columns, which the
                # merge fills with nulls — harmless).
                for c in on:
                    if arrow_schema.get_field_index(c) == -1:
                        if left is None:
                            return ds
                        arrow_schema = arrow_schema.append(left.field(c))
                small = arrow_schema.empty_table()
        else:
            join_type = "inner" if how == "inner" else "left_outer"
            return ds.join(
                lookup,
                join_type=join_type,
                num_partitions=cfg.num_partitions,
                on=tuple(on),
            )

    if small_refs is None:
        small = small.combine_chunks()
        kh = _key_hashes(small, on)
    payload = small_refs if small_refs is not None else small

    # Unique-key fast path: when every lookup key is distinct (signature
    # attach, label/cluster/rep lookups — the common case here), the join is
    # a GATHER, not a join: presort the key hashes ONCE on the driver and
    # ship (sorted_hashes, permutation, block refs); each batch does a
    # searchsorted probe + take. pa.Table.join would rebuild a hash table
    # over the whole lookup for EVERY batch (measured: 2/3 of the signature
    # attach cost at 60k rows x 64 blocks). Hash equality is confirmed
    # against the actual key values, so a 64-bit collision can only cause a
    # fallback-free exact mismatch -> row treated as unmatched, never a
    # wrong match.
    order = np.argsort(kh, kind="stable")
    sorted_h = kh[order]
    unique_keys = bool(len(sorted_h) == 0 or (sorted_h[1:] != sorted_h[:-1]).all())
    if unique_keys:
        ref = ray.put((payload, sorted_h, order.astype(np.int64)))
        return ds.map_batches(
            _GatherMerge(ref, list(on), how), batch_format="pyarrow")

    ref = ray.put(payload)
    pa_join_type = "inner" if how == "inner" else "left outer"

    class Merge:
        """Task-mode broadcast merge: the lookup lives in the object store
        (ray.put once); each task ray.gets it — plasma-local after the first
        fetch on a node, so no per-batch re-ship and no actor-pool ramp.
        The per-batch join is Arrow-native (pa.Table.join, C++ hash join) —
        no pandas round trip inside otherwise Arrow-only stages."""

        def __init__(self):
            self.lookup = None

        def __call__(self, t: pa.Table) -> pa.Table:
            if self.lookup is None:
                self.lookup = _resolve_small(ray.get(ref)).combine_chunks()
            right = self.lookup
            if t.num_rows == 0:
                # empty batches carry null-typed columns, which the Arrow
                # join kernel rejects — emit the joined schema directly
                cols: dict = {}
                for f in t.schema:
                    typ = f.type
                    if pa.types.is_null(typ):
                        typ = (right.schema.field(f.name).type
                               if f.name in right.column_names else pa.string())
                    cols[f.name] = pa.array([], typ)
                for f in right.schema:
                    if f.name not in cols:
                        cols[f.name] = pa.array([], f.type)
                return pa.table(cols)
            # align types (string vs large_string, residual null-typed
            # columns from earlier outer joins) for the Arrow join kernel
            for i, f in enumerate(t.schema):
                if pa.types.is_null(f.type) and f.name in right.column_names:
                    t = t.set_column(
                        i, f.name,
                        t[f.name].cast(right.schema.field(f.name).type))
            for k in on:
                lt = t.schema.field(k).type
                if right.schema.field(k).type != lt:
                    idx = right.column_names.index(k)
                    right = right.set_column(idx, k, right[k].cast(lt))
            return t.join(right, keys=on, join_type=pa_join_type)

    return ds.map_batches(Merge(), batch_format="pyarrow")


def shuffle_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: list[str],
    how: str = "full outer",
    num_buckets: int = 32,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    """Hash-co-partitioned shuffle join for two LARGE sides (neither fits a
    broadcast): outer joins included, which ``lookup_join`` does not cover.

    Plan: pad each side to the combined schema (typed nulls, zero-copy for
    the real columns), tag the side, union the two streams, bucket every row
    by a key hash, and run ONE Arrow C++ join per bucket inside
    ``groupby(bucket).map_groups`` — the single all-to-all carries each row
    exactly once, and per-bucket memory is |rows|/num_buckets per side.
    Key-skew caveat: a single key lands in one bucket; salt upstream if one
    key dominates (same discipline as the LSH hot-bucket path).
    """
    def _schema(ds, override: pa.Schema | None) -> pa.Schema:
        if override is not None:
            return override
        s = ds.schema()
        if s is None:
            # a lazy side that produced zero blocks (e.g. a fully-filtered
            # read feeding map_batches) has no derivable schema
            raise ValueError(
                "shuffle_join: side has no derivable schema (empty lazy "
                "dataset) — pass left_schema/right_schema explicitly")
        base = getattr(s, "base_schema", None)
        if base is not None:
            return base
        return pa.schema([pa.field(nm, tp) for nm, tp in zip(s.names, s.types)])

    ls, rs = _schema(left, left_schema), _schema(right, right_schema)
    for k in on:
        if ls.field(k).type != rs.field(k).type:
            raise TypeError(f"join key {k}: {ls.field(k).type} != {rs.field(k).type}")
    l_cols = list(ls.names)
    r_extra = [f.name for f in rs if f.name not in on]
    combined = list(ls) + [rs.field(c) for c in r_extra]

    # NOTE: schema() peeks at the first block without pinning either side in
    # the object store; each side is consumed exactly once by the pad+union
    # pass below, so a full materialize() here would only double peak plasma
    # footprint for the advertised two-LARGE-sides case.
    def pad(side: int):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {}
            for f in combined:
                if f.name in t.column_names:
                    col = t[f.name]
                    cols[f.name] = col.cast(f.type) if col.type != f.type else col
                else:
                    cols[f.name] = pa.nulls(n, f.type)
            out = pa.table(cols)
            b = (_key_hashes(out, on) % np.uint64(num_buckets)).astype(np.int64)
            return (out.append_column("__side", pa.array(np.full(n, side, np.int8)))
                    .append_column("__bucket", pa.array(b)))
        return fn

    unioned = (left.map_batches(pad(0), batch_format="pyarrow")
               .union(right.map_batches(pad(1), batch_format="pyarrow")))

    pa_how = {"inner": "inner", "left": "left outer",
              "full outer": "full outer", "full_outer": "full outer"}[how]

    def join_bucket(g: pa.Table) -> pa.Table:
        lt = (g.filter(pc.equal(g["__side"], pa.scalar(0, pa.int8())))
              .select(l_cols))
        rt = (g.filter(pc.equal(g["__side"], pa.scalar(1, pa.int8())))
              .select(on + r_extra))
        out = lt.join(rt, keys=on, join_type=pa_how)
        return out.select(l_cols + r_extra)

    return unioned.groupby("__bucket").map_groups(
        join_bucket, batch_format="pyarrow")
