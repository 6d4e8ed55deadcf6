"""Distributed SHARED MUTABLE dedup index — the raw-actor pattern.

This is the one semantics in the engine that the Dataset API genuinely
cannot express: a live index that any worker can probe/update mid-stream
(the distributed generalization of the reference's in-heap ``Dictionary``,
``/root/reference/src/dictionary.c:49-78``, which every new block probes).
Batch dedup does NOT need it — ``groupby(key).min`` is strictly better
(one shuffle, no actor round-trips) and is what ``q_dedup_keep_first``
uses — but an index you can consult WHILE data streams in (e.g. admitting
or rejecting rows at ingest time against everything seen so far) has no
groupby equivalent; that is exactly the "shared mutable index" case where
dropping to ``@ray.remote`` actors is the right call.

Design:

- The index is SHARDED by key hash across ``num_shards`` actors; each shard
  owns a disjoint key range, so there is no cross-actor coordination and
  throughput scales with shards.
- Every update is COMMUTATIVE (keep the min id per key), so the final state
  is deterministic under any arrival order / partitioning — which is what
  makes the result equal to the groupby plan and lets the driver SQL-check
  this operator against the same DuckDB oracle as ``dedup_keep_first``.
- Feeding happens inside ``map_batches``: each batch groups its keys by
  shard (vectorized) and fires at most one ``probe_and_insert`` per shard
  per batch. Keys are 128-bit content identities (two independent seeded
  members of the payload-hash family); ids travel as int64. Text never
  reaches the index.

Partitioning assumption (documented per the brief): key->shard is pure
hash math, so NO co-partitioning of the input is required; the cost model
is one actor RPC per (batch, shard) pair, so batches should be large
enough that this fan-out stays far below the row count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from deduplication_ray.functions import hashing as H


# num_cpus=0: the shards are tiny dict-op services, and reserving CPU for
# them can deadlock a small session (feed TASKS need every slot while they
# block on shard RPCs — the actor-pool starvation gotcha in the verify
# recipe). Zero-CPU actors are always schedulable.
@ray.remote(num_cpus=0)
class DedupIndexShard:
    """One shard: key-hash -> current minimum id (plain dict; ~40 B/key)."""

    def __init__(self):
        self.best: dict[int, int] = {}

    def probe_and_insert(self, k1: np.ndarray, k2: np.ndarray,
                         ids: np.ndarray) -> np.ndarray:
        """Insert ((k1, k2), id) pairs, keeping the min id per 128-bit key;
        returns the pre-insert membership mask (True = key was already
        present), so an ingest gate can admit/reject rows against everything
        seen so far."""
        best = self.best
        seen = np.empty(len(ids), dtype=bool)
        for i, (a, b, v) in enumerate(zip(k1.tolist(), k2.tolist(),
                                          ids.tolist())):
            cur = best.get((a, b))
            seen[i] = cur is not None
            if cur is None or v < cur:
                best[(a, b)] = v
        return seen

    def dump(self) -> pa.Table:
        ks = list(self.best.keys())
        return pa.table({
            "key1": pa.array([k[0] for k in ks], pa.int64()),
            "key2": pa.array([k[1] for k in ks], pa.int64()),
            "id": pa.array(list(self.best.values()), pa.int64()),
        })


def dedup_index_keep_min(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    num_shards: int = 8,
) -> pa.Table:
    """Stream ``ds`` through a live sharded dedup index; return the final
    (one min id per distinct ``text_col`` content) state as one table —
    bounded by the number of DISTINCT keys, like the reference dictionary."""
    shards = [DedupIndexShard.remote() for _ in range(num_shards)]

    def feed(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64())})
        # content identity = TWO independent members of the engine's payload
        # hash family (seeded hash_bytes_array) = an effective 128-bit key,
        # the same exactness contract as the image pipeline's (ck1, ck2)
        k1 = H.bitcast_u64_to_i64(H.hash_bytes_array(t[text_col]))
        k2 = H.bitcast_u64_to_i64(H.hash_bytes_array(t[text_col], seed=1))
        ids = t[id_col].to_numpy()
        shard_of = (k1.view(np.uint64) % np.uint64(num_shards)).astype(np.int64)
        pending = []
        for s in range(num_shards):
            m = shard_of == s
            if m.any():
                pending.append(
                    shards[s].probe_and_insert.remote(k1[m], k2[m], ids[m]))
        ray.get(pending)  # barrier per batch: updates are durable before ack
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    # drive the stream (count() consumes every batch through feed)
    ds.map_batches(feed, batch_format="pyarrow").count()
    dumps = ray.get([s.dump.remote() for s in shards])
    return pa.concat_tables(dumps, promote_options="default")
