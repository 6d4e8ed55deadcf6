"""LSH banding, hot-bucket skew defusal, and candidate-edge generation.

Realizes SURVEY §2.2 T7-T9. The shuffle key is ``(band, bucket)`` — the
distributed replacement for the reference's single mutable dictionary probe
(``/root/reference/src/dictionary.c:49-59``): rows that could be duplicates
meet in a bucket instead of scanning a shared index.

Skew story (T8): one stock phrase shared by a large row population drives one
bucket super-linear. Defusal is two-phase:

1. ``bucket_stats``: count rows per (band, bucket) — a partial-aggregated
   groupby-count, cheap because combiners run inside map_batches blocks.
   Buckets over ``cfg.bucket_cap`` form the (tiny) hot set, broadcast via
   ``ray.put`` — never re-shipped per batch.
2. ``explode_bands`` re-keys hot-bucket rows to ``mix(bucket, salt)`` with
   ``salt = hash(image_id) % n_salts`` so no reducer group exceeds ~cap rows,
   and each row ALSO claims an ambassador flag; per salted sub-bucket the
   min-id row is linked star-wise, and sub-bucket minima rendezvous in one
   tiny ``(band, bucket, AMBASSADOR)`` group that re-connects the salts.
   Connectivity of a true-duplicate bucket is preserved; no task ever
   all-pairs a hot bucket.

Edge emission (T9): per group, all-pairs when |group| small, else star+chain
from the sorted-min anchor (deterministic; parallel-safe analog of
first-occurrence ids, ``compressor.c:109-113``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count

from deduplication_ray.config import DedupConfig
from deduplication_ray.functions import hashing as H

AMBASSADOR_SALT = -1  # rendezvous sub-bucket linking salted shards

# band-id namespaces: one bucket stream carries every candidate family
BAND_MINHASH = 0      # 0 .. bands-1
BAND_PHASH = 1000     # 1000..1003: 4 x 16-bit multi-index bands (pigeonhole:
BAND_SIMHASH = 2000   # any Hamming distance <= 3 collides in >= 1 band)
BAND_SUBSTR = 3000    # winnowing fingerprint rendezvous (stages/substring.py):
                      # proves a k-char overlap only -> kind 'substr_cand'
BAND_GRAM_SAMPLE = 3500  # consistent gram sampling (containment candidates):
                      # bucket key = a shingle-gram hash below a global
                      # threshold p*2^64, so two docs sharing m grams miss
                      # with prob (1-p)^m even when the overlap is SCATTERED
                      # (no contiguous >=L run for the substring family).
                      # Inside the substr_cand namespace: pure candidate,
                      # callers must verify (q_ngram_jaccard_pairs does).
BAND_SUBSTR_EXACT = 4000  # full L-gram rendezvous: bucket key IS the L-gram
                      # hash, so membership proves the >=L shared substring
                      # -> trusted kind 'substr', no verification join, and
                      # hot-bucket star links are true by construction
BAND_EXACT = 5000     # exact-duplicate family: bucket key = hash(content
                      # key), so co-membership IS identity (128-bit ck) ->
                      # trusted kind 'exact'. Folding exact dedup into the
                      # shared bucket stream removes the separate
                      # exact_edges stage's two executions + shuffle + join
                      # from every pipeline run; connectivity matches the
                      # min-id star (all-pairs below bucket_cap, salted
                      # stars + ambassadors above — same components either
                      # way, and hash-min union-find elects the same min-id
                      # representative)


def kind_of_band(band: int) -> str:
    if band >= BAND_EXACT:
        return "exact"
    if band >= BAND_SUBSTR_EXACT:
        return "substr"
    if band >= BAND_SUBSTR:
        return "substr_cand"
    if band >= BAND_SIMHASH:
        return "simhash"
    if band >= BAND_PHASH:
        return "phash"
    return "minhash"


def _hash16_bands(values_u64: np.ndarray, base: int) -> tuple[np.ndarray, np.ndarray]:
    """Split 64-bit hashes into 4 x 16-bit multi-index bands.

    Guarantees (pigeonhole) that pairs within Hamming distance 3 share at
    least one band; larger distances up to the configured radius are also
    caught probabilistically and via the sibling signature's bands.
    """
    n = len(values_u64)
    band = np.tile(np.arange(4, dtype=np.int32) + base, n)
    shifts = (np.arange(4, dtype=np.uint64) * np.uint64(16))[None, :]
    chunks = (values_u64[:, None] >> shifts) & np.uint64(0xFFFF)
    # mix band index in so band b of hash X never collides with band c of X
    with np.errstate(over="ignore"):
        bucket = H.splitmix64(chunks + (np.arange(4, dtype=np.uint64) + np.uint64(base))[None, :] * np.uint64(0x9E3779B97F4A7C15))
    return band, H.bitcast_u64_to_i64(bucket).ravel()


class ExplodeBands:
    """signatures -> (band:int64, bucket:int64, salt:int64, image_id) rows.

    Emits every candidate family in one pass over the signature table:
    MinHash LSH bands (caption near-dup), pHash multi-index bands and SimHash
    multi-index bands (pixel near-dup) when those columns are present.
    salt starts at 0; hot-bucket salting is a separate tagging pass
    (``SplitHot`` inside ``candidate_edges``) so signatures are read once.
    """

    def __init__(self, cfg: DedupConfig,
                 families: tuple[str, ...] = ("minhash", "phash", "simhash")):
        """``families`` masks which band namespaces to EMIT — a channel
        slice (e.g. the tier funnel's pixel-only tier) skips the other
        families' bucket rows at the source instead of filtering them
        after emission (bands x rows saved per signature at scale)."""
        self.cfg = cfg
        self.families = families

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows

        fam_bands: list[np.ndarray] = []
        fam_buckets: list[np.ndarray] = []
        if "minhash" in self.families:
            sig = H.unpack_u64_rows(batch["minhash"], cfg.num_perm)
            keys = H.lsh_band_keys(sig, cfg.bands, cfg.rows_per_band)  # (n, bands)
            mh_band = np.tile(np.arange(cfg.bands, dtype=np.int32), n)
            mh_bucket = H.bitcast_u64_to_i64(keys).ravel()
            fam_bands.append(mh_band.reshape(n, cfg.bands))
            fam_buckets.append(mh_bucket.reshape(n, cfg.bands))
        for col, base in (("phash", BAND_PHASH), ("simhash", BAND_SIMHASH)):
            if col in batch.column_names and col in self.families:
                b, k = _hash16_bands(H.bitcast_i64_to_u64(batch[col].to_numpy()), base)
                fam_bands.append(b.reshape(n, 4))
                fam_buckets.append(k.reshape(n, 4))
        if "exact" in self.families and n:
            if "ck1" in batch.column_names:  # image: 128-bit content key
                ckb = H.hash_u64_pair(
                    batch["ck1"].to_numpy().view(np.uint64),
                    batch["ck2"].to_numpy().view(np.uint64))
            elif "cap_hash" in batch.column_names:  # text: caption equality
                ch = batch["cap_hash"].to_numpy().view(np.uint64)
                ckb = H.hash_u64_pair(ch, ch)
            else:
                ckb = None
            if ckb is not None:
                fam_bands.append(np.full((n, 1), BAND_EXACT, dtype=np.int32))
                fam_buckets.append(H.bitcast_u64_to_i64(ckb).reshape(n, 1))

        if not fam_bands or n == 0:
            return pa.table({
                "band": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int64()),
                "salt": pa.array([], pa.int64()),
                "image_id": pa.array([], pa.string()),
                "ph": pa.array([], pa.int64()),
                "sh": pa.array([], pa.int64()),
            })
        band = np.concatenate(fam_bands, axis=1).ravel()
        bucket = np.concatenate(fam_buckets, axis=1).ravel()
        per_row = band.size // n
        ids = batch["image_id"].to_pandas().to_numpy()
        image_id = np.repeat(ids, per_row)
        salt = np.zeros(n * per_row, dtype=np.int64)

        # carry the pixel hashes themselves so pixel-band pairs can be
        # Hamming-verified AT EMISSION: 16-bit bands saturate with n (65k
        # buckets), and without early verification random collisions produce
        # O(n^2/65k) junk candidate edges (observed 2.5M at 150k rows)
        ph = (np.repeat(batch["phash"].to_numpy(), per_row)
              if "phash" in batch.column_names else np.zeros(n * per_row, np.int64))
        sh = (np.repeat(batch["simhash"].to_numpy(), per_row)
              if "simhash" in batch.column_names else np.zeros(n * per_row, np.int64))

        return pa.table(
            {
                "band": band.astype(np.int64),
                "bucket": bucket,
                "salt": salt,
                "image_id": image_id,
                "ph": ph,
                "sh": sh,
            }
        )


def bucket_stats(buckets: ray.data.Dataset) -> ray.data.Dataset:
    """(band, bucket) -> row count. groupby-count with built-in partial agg."""
    return buckets.groupby(["band", "bucket"]).aggregate(Count(alias_name="n"))


def hot_bucket_map(stats: ray.data.Dataset, cap: int) -> dict[tuple[int, int], int]:
    """Tiny driver-side dict of hot buckets -> salt count (broadcast later).

    Filtering happens distributed (vectorized predicate inside map_batches);
    only the over-cap survivors — by construction a minuscule fraction —
    reach the driver.
    """
    import pyarrow.compute as pc

    hot = stats.map_batches(
        lambda t: t.filter(pc.greater(t["n"], cap)), batch_format="pyarrow"
    )
    out: dict[tuple[int, int], int] = {}
    for b in hot.iter_batches(batch_format="pyarrow"):
        for band, bucket, n in zip(
            b["band"].to_pylist(), b["bucket"].to_pylist(), b["n"].to_pylist()
        ):
            out[(band, bucket)] = int(np.ceil(n / cap))
    return out


def _pixel_pair_keep(band: np.ndarray, ph_a, ph_b, sh_a, sh_b, cfg: DedupConfig) -> np.ndarray:
    """Early Hamming verification for pixel-band pairs (16-bit bands saturate
    with n; junk collisions must die at emission, not in a 2.5M-edge dedupe).
    Non-pixel bands pass through untouched."""
    is_ph = (band >= BAND_PHASH) & (band < BAND_SIMHASH)
    is_sh = (band >= BAND_SIMHASH) & (band < BAND_SUBSTR)
    keep = ~(is_ph | is_sh)
    if is_ph.any():
        hd = H.popcount64(np.asarray(ph_a, np.int64).view(np.uint64)
                          ^ np.asarray(ph_b, np.int64).view(np.uint64))
        keep |= is_ph & (hd <= cfg.phash_hamming_t)
    if is_sh.any():
        hd = H.popcount64(np.asarray(sh_a, np.int64).view(np.uint64)
                          ^ np.asarray(sh_b, np.int64).view(np.uint64))
        keep |= is_sh & (hd <= cfg.simhash_hamming_t)
    return keep


def _kind_column(band_arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized band-id namespace -> kind string."""
    import pyarrow.compute as pc

    b = band_arr.combine_chunks() if isinstance(band_arr, pa.ChunkedArray) else band_arr
    return pc.if_else(
        pc.greater_equal(b, BAND_EXACT),
        pa.scalar("exact"),
        pc.if_else(
            pc.greater_equal(b, BAND_SUBSTR_EXACT),
            pa.scalar("substr"),
        pc.if_else(
            pc.greater_equal(b, BAND_SUBSTR),
            pa.scalar("substr_cand"),
            pc.if_else(
                pc.greater_equal(b, BAND_SIMHASH),
                pa.scalar("simhash"),
                pc.if_else(pc.greater_equal(b, BAND_PHASH),
                           pa.scalar("phash"), pa.scalar("minhash")),
            ),
        ),
        ),
    )


def multi_bucket_map(stats: ray.data.Dataset) -> dict[tuple[int, int], int]:
    """{(band, bucket): n} for buckets with >= 2 members (small callers/tests)."""
    keys, bands, bks, counts = multi_bucket_arrays(stats)
    return {(int(b), int(k)): int(n) for b, k, n in zip(bands, bks, counts)}


def multi_bucket_arrays(stats: ray.data.Dataset):
    """Vectorized driver-side collection of multi-member buckets from a
    full stats Dataset: (sorted composite u64 keys, band, bucket, count).
    Singleton buckets — the overwhelming majority — never leave the cluster;
    only duplicate *candidates* reach the driver."""
    import pyarrow.compute as pc

    multi = stats.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n"], 2)), batch_format="pyarrow"
    )
    bands_l, bks_l, ns_l = [], [], []
    for b in multi.iter_batches(batch_format="pyarrow"):
        bands_l.append(b["band"].to_numpy())
        bks_l.append(b["bucket"].to_numpy())
        ns_l.append(b["n"].to_numpy())
    if not bands_l:
        e = np.empty(0, dtype=np.int64)
        return np.empty(0, dtype=np.uint64), e, e, e
    bands = np.concatenate(bands_l)
    bks = np.concatenate(bks_l)
    ns = np.concatenate(ns_l).astype(np.int64)
    comp = H.hash_u64_pair(bands.view(np.uint64), bks.view(np.uint64))
    order = np.argsort(comp)
    return comp[order], bands[order], bks[order], ns[order]


def multi_bucket_arrays_fast(buckets: ray.data.Dataset, cfg: DedupConfig):
    """(sorted composite u64 keys, counts) of multi-member buckets.

    Plan: per-block partial counting (np.unique inside map_batches — each
    distinct key crosses the wire once per block, pre-counted) -> distributed
    hash-partitioned merge (``hash_grouped_reduce``: sort + reduceat once per
    partition; Ray's own aggregate costs ~10us per distinct group, 26s at
    2.8M groups) -> ``n >= 2`` filter INSIDE the merge. The driver only ever
    collects the multi-member keys — bounded by the true duplicate-candidate
    bucket count, a minuscule fraction of the bucket stream.
    """
    from deduplication_ray.stages.groupred import hash_grouped_reduce

    def partial(t: pa.Table) -> pa.Table:
        comp = H.hash_u64_pair(
            t["band"].to_numpy().view(np.uint64), t["bucket"].to_numpy().view(np.uint64)
        )
        uniq, cnt = np.unique(comp, return_counts=True)
        return pa.table({
            "comp": pa.array(H.bitcast_u64_to_i64(uniq), pa.int64()),
            "n": pa.array(cnt.astype(np.int64)),
        })

    def merge(t: pa.Table) -> pa.Table:
        comp = t["comp"].to_numpy().view(np.uint64)
        ns = t["n"].to_numpy()
        order = np.argsort(comp, kind="stable")
        comp, ns = comp[order], ns[order]
        starts = np.nonzero(np.concatenate([[True], comp[1:] != comp[:-1]]))[0]
        totals = np.add.reduceat(ns, starts)
        keep = totals >= 2
        return pa.table({
            "comp": pa.array(H.bitcast_u64_to_i64(comp[starts][keep]), pa.int64()),
            "n": pa.array(totals[keep].astype(np.int64)),
        })

    partials = buckets.map_batches(partial, batch_format="pyarrow",
                                   batch_size=None, zero_copy_batch=True)
    multi = hash_grouped_reduce(
        partials, lambda t: t["comp"].to_numpy().view(np.uint64), merge,
        cfg.num_partitions * 2,
    )
    comps_l, ns_l = [], []
    for b in multi.iter_batches(batch_format="pyarrow", batch_size=None):
        comps_l.append(b["comp"].to_numpy())
        ns_l.append(b["n"].to_numpy())
    if not comps_l:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    comp = np.concatenate(comps_l).view(np.uint64)
    ns = np.concatenate(ns_l).astype(np.int64)
    order = np.argsort(comp, kind="stable")
    return comp[order], ns[order]


@ray.remote(num_cpus=0.25)
def _block_multi_sum(tbl: pa.Table) -> int:
    """Total multi-bucket member rows in one index block — the only thing
    the driver reads per block."""
    return int(tbl["n"].to_numpy().sum()) if tbl.num_rows else 0


def multi_bucket_index(buckets: ray.data.Dataset, cfg: DedupConfig):
    """DISTRIBUTED multi-bucket index: the (composite key, count) table of
    multi-member buckets stays in the object store as hash-partitioned,
    per-partition-SORTED blocks; the driver reads only (partition id, row
    sum) per block. Replaces ``multi_bucket_arrays_fast``'s driver-side
    collect + argsort + re-put — an O(|multi buckets|) driver-serial
    section (240MB / ~2s at 600k rows) that grew linearly with corpus
    size. Returns (ray handle for _KeyTaggerIdx, total multi-bucket rows)
    or (None, 0) when there are no multi buckets."""
    from deduplication_ray.stages.groupred import hash_grouped_reduce

    n_parts = 2 * cfg.num_partitions

    def partial(t: pa.Table) -> pa.Table:
        comp = H.hash_u64_pair(
            t["band"].to_numpy().view(np.uint64),
            t["bucket"].to_numpy().view(np.uint64))
        uniq, cnt = np.unique(comp, return_counts=True)
        return pa.table({
            "comp": pa.array(H.bitcast_u64_to_i64(uniq), pa.int64()),
            "n": pa.array(cnt.astype(np.int64)),
        })

    def merge(t: pa.Table) -> pa.Table:
        comp = t["comp"].to_numpy().view(np.uint64)
        ns = t["n"].to_numpy()
        order = np.argsort(comp, kind="stable")
        comp, ns = comp[order], ns[order]
        starts = np.nonzero(np.concatenate([[True], comp[1:] != comp[:-1]]))[0]
        totals = np.add.reduceat(ns, starts)
        keep = totals >= 2
        ck = comp[starts][keep]
        # the part id travels as a COLUMN: map_groups may pack several
        # groups' outputs into one block, so block-level part attribution
        # is not possible — the tagger splits blocks by this column
        return pa.table({
            "comp": pa.array(H.bitcast_u64_to_i64(ck), pa.int64()),
            "n": pa.array(totals[keep].astype(np.int64)),
            "part": pa.array((ck % np.uint64(n_parts)).astype(np.int64)),
        })

    partials = buckets.map_batches(partial, batch_format="pyarrow",
                                   batch_size=None, zero_copy_batch=True)
    multi = hash_grouped_reduce(
        partials, lambda t: t["comp"].to_numpy().view(np.uint64), merge,
        n_parts).materialize()
    refs = [r for r in multi.to_arrow_refs()]
    sums = ray.get([_block_multi_sum.remote(r) for r in refs])
    total = sum(sums)
    if total == 0:
        return None, 0
    keep = [r for r, s in zip(refs, sums) if s > 0]
    return ray.put((keep, n_parts)), total


class _KeyTaggerIdx:
    """_KeyTagger against the DISTRIBUTED multi-bucket index: per task,
    ray.get the index blocks (plasma-local, zero-copy) and probe each batch
    partition-wise — comp %% n_parts routes to that partition's sorted key
    array. Same drop/salt semantics as _KeyTagger."""

    def __init__(self, ref, cap: int, gram_drop_df: int):
        self._ref = ref
        self._cap = cap
        self._gram_drop_df = gram_drop_df
        self.keys = None

    def _ensure(self):
        if self.keys is not None:
            return
        refs, n_parts = ray.get(self._ref)
        blocks = ray.get(list(refs))
        segs: list[list] = [[] for _ in range(n_parts)]
        cnt_segs: list[list] = [[] for _ in range(n_parts)]
        for b in blocks:
            if b.num_rows == 0:
                continue
            k = b["comp"].to_numpy().view(np.uint64)
            n = b["n"].to_numpy()
            p = b["part"].to_numpy()
            # one block may pack SEVERAL groups' (contiguous, sorted)
            # outputs — split on the part column's run boundaries
            bounds = np.concatenate(
                [[0], np.flatnonzero(p[1:] != p[:-1]) + 1, [len(p)]])
            for lo, hi in zip(bounds[:-1], bounds[1:]):
                segs[p[lo]].append(k[lo:hi])
                cnt_segs[p[lo]].append(n[lo:hi])
        keys: list = [None] * n_parts
        counts: list = [None] * n_parts
        for p in range(n_parts):
            if not segs[p]:
                continue
            k = np.concatenate(segs[p])
            n = np.concatenate(cnt_segs[p])
            if len(segs[p]) > 1 and np.any(k[1:] < k[:-1]):
                order = np.argsort(k, kind="stable")
                k, n = k[order], n[order]
            keys[p], counts[p] = k, n
        self.keys = keys
        self.counts = counts
        self.n_parts = np.uint64(n_parts)

    def __call__(self, t: pa.Table) -> pa.Table:
        self._ensure()
        nrows = t.num_rows
        if nrows == 0:
            return t.slice(0, 0)
        band = t["band"].to_numpy()
        bucket = t["bucket"].to_numpy()
        comp = H.hash_u64_pair(band.view(np.uint64), bucket.view(np.uint64))
        part = (comp % self.n_parts).astype(np.int64)
        keep = np.zeros(nrows, dtype=bool)
        cnt = np.zeros(nrows, dtype=np.int64)
        for p in np.unique(part):
            ks = self.keys[p]
            if ks is None or len(ks) == 0:
                continue
            m = part == p
            pos = np.minimum(np.searchsorted(ks, comp[m]), len(ks) - 1)
            found = ks[pos] == comp[m]
            keep[m] = found
            c = np.zeros(found.shape, np.int64)
            c[found] = self.counts[p][pos[found]]
            cnt[m] = c
        keep &= ~((band == BAND_GRAM_SAMPLE) & (cnt > self._gram_drop_df))
        if not np.any(keep):
            return t.slice(0, 0)
        t = t.filter(pa.array(keep))
        cnt = cnt[keep]
        n_salts = np.where(cnt > self._cap, -(-cnt // self._cap), 0)
        salt = np.full(t.num_rows, -1, dtype=np.int64)
        hot = n_salts > 0
        if hot.any():
            idh = H.hash_bytes_array(
                t["image_id"].combine_chunks().filter(pa.array(hot)))
            salt[hot] = (idh % n_salts[hot].astype(np.uint64)).astype(np.int64)
        return t.set_column(
            t.column_names.index("salt"), "salt", pa.array(salt, pa.int64()))


class _KeyTagger:
    """Vectorized (band, bucket) membership + salt assignment from broadcast
    (sorted composite keys, counts) arrays (ray.get once per actor,
    searchsorted per batch). Rows in no multi bucket are DROPPED; rows in hot
    buckets (count > cap) get salt = hash(image_id) %% ceil(count/cap); cold
    multi rows get salt = -1. Gram-sample rows (BAND_GRAM_SAMPLE) in buckets
    above ``gram_drop_df`` members are dropped outright — stopword shingles
    carry no containment signal and star-linking them would emit bucket-size
    spurious candidates."""

    def __init__(self, multi_ref, cap: int, gram_drop_df: int = 1024):
        self._ref = multi_ref
        self._cap = cap
        self._gram_drop_df = gram_drop_df
        self.keys = None
        self.n_salts = None
        self.counts = None

    def _ensure(self):
        if self.keys is None:
            keys, counts = ray.get(self._ref)
            self.keys = keys
            self.counts = counts
            self.n_salts = np.where(counts > self._cap, -(-counts // self._cap), 0)

    def __call__(self, t: pa.Table) -> pa.Table:
        self._ensure()
        band = t["band"].to_numpy()
        bucket = t["bucket"].to_numpy()
        comp = H.hash_u64_pair(band.view(np.uint64), bucket.view(np.uint64))
        if len(self.keys) == 0:
            return t.slice(0, 0)
        pos = np.clip(np.searchsorted(self.keys, comp), 0, len(self.keys) - 1)
        keep = self.keys[pos] == comp
        keep &= ~((band == BAND_GRAM_SAMPLE)
                  & (self.counts[pos] > self._gram_drop_df))
        if not np.any(keep):
            return t.slice(0, 0)
        t = t.filter(pa.array(keep))
        n_salts = self.n_salts[pos[keep]]
        salt = np.full(t.num_rows, -1, dtype=np.int64)
        hot = n_salts > 0
        if hot.any():
            idh = H.hash_bytes_array(t["image_id"].combine_chunks().filter(pa.array(hot)))
            salt[hot] = (idh % n_salts[hot].astype(np.uint64)).astype(np.int64)
        return t.set_column(
            t.column_names.index("salt"), "salt", pa.array(salt, pa.int64())
        )


def candidate_edges(
    signatures: ray.data.Dataset, cfg: DedupConfig
) -> ray.data.Dataset:
    """signatures -> deduplicated candidate edge Dataset (src < dst, kind)."""
    buckets = signatures.map_batches(
        ExplodeBands(cfg), batch_format="pyarrow", batch_size=cfg.text_batch_size
    )
    return dedupe_edges(edges_from_buckets(buckets, cfg))


def edges_from_buckets(
    buckets, cfg: DedupConfig
) -> ray.data.Dataset:
    """(band, bucket, salt, image_id) rows -> deduplicated edges (src<dst, kind).

    Plan: bucket counts (partial-agg groupby, the one unavoidable shuffle over
    the full bucket stream) -> multi-member bucket map broadcast -> one
    tagging pass DROPS singleton-bucket rows (the vast majority) and salts
    hot buckets so no group exceeds ~cap rows. What survives is tiny: the
    vectorized pairing kernel (cold all-pairs, hot sub-bucket stars +
    ambassador re-link) runs driver-local when small, else sharded by
    bucket hash across the cluster. Zero per-group map_groups calls over
    singleton buckets; the only full-stream shuffle is the stats groupby.

    ``buckets`` may be a Dataset (materialized once, read by both the stats
    and the tagging pass — right when the upstream is expensive to
    recompute, e.g. decoded video frames) or a ZERO-ARG CALLABLE returning
    the bucket Dataset: then the stream is consumed FUSED twice — once into
    the stats partial-count, once into the tag+pair chain — and the full
    bucket stream never touches the object store (its explode/gram maps
    recompute instead; cheap when upstream is a materialized signature
    table + a pruned parquet read). The fused form removes two
    full-stream materializations and one repartition from every run.
    """
    from deduplication_ray.stages.tuning import apply_context_tuning, ensure_blocks

    apply_context_tuning()
    if callable(buckets):
        src = buckets
    else:
        mat = ensure_blocks(buckets, cfg.num_partitions).materialize()
        src = lambda: mat  # noqa: E731
    keys, counts = multi_bucket_arrays_fast(src(), cfg)
    if len(keys) == 0:
        return _empty_edge_ds()

    multi_ref = ray.put((keys, counts))
    tagged = src().map_batches(
        _KeyTagger(multi_ref, cfg.bucket_cap, cfg.gram_sample_drop_df),
        batch_format="pyarrow",
    )
    # materialize before the pairing exchange: a sort-based all-to-all over
    # a LAZY producer re-plans the producer into the exchange and measures
    # ~1.5x slower end-to-end at low parallelism (16.2s vs 2.7+8.0s at 8
    # CPUs / 150k rows) — the tagged stream is 1/3 the bucket stream, so
    # its residency is the cheapest of the three candidates
    if int(counts.sum()) > cfg.local_pairs_limit:
        tagged = tagged.materialize()

    # size dispatch: a small tagged set (dup candidates only) pairs faster in
    # one driver-local numpy pass than through distributed barriers; above
    # the limit, the SAME kernel runs sharded by bucket hash across the
    # cluster (no driver serial section — the scale path). The dispatch
    # reads sum(multi-bucket counts) — an upper bound on the tagged row
    # count already in driver memory, so no extra count() execution.
    # NOT deduped here: callers union edge families first, then dedupe once
    if int(counts.sum()) <= cfg.local_pairs_limit:
        return _edges_from_tagged_local(tagged, cfg)
    # materialized: every caller feeds this into dedupe_edges' hash-grouped
    # shuffle, and chaining the pairing groupby().map_groups lazily into
    # that second shuffle measured ~13 s of pure overhead at 60k docs /
    # 36M bucket rows (28.8 s vs 2.1 s for the dedupe leg) — the edge set
    # is lean (~1-2 rows per input row), object-store residency is cheap
    return _edges_from_tagged_partitioned(tagged, cfg).materialize()


def _edges_from_tagged_local(tagged: ray.data.Dataset, cfg: DedupConfig) -> ray.data.Dataset:
    """Driver-local pairing for SMALL tagged sets (below
    ``cfg.local_pairs_limit``): one numpy pass beats distributed-barrier
    latency when the candidate set is tiny. Large sets go through
    ``_edges_from_tagged_partitioned`` — same kernel, sharded by bucket."""
    tbls = [t for t in tagged.iter_batches(batch_format="pyarrow")
            if t.num_rows]
    if not tbls:
        return _empty_edge_ds()
    tbl = pa.concat_tables(tbls, promote_options="default")
    return ray.data.from_arrow(_pair_tagged_table(tbl, cfg))


def _edges_from_tagged_partitioned(
    tagged: ray.data.Dataset, cfg: DedupConfig
) -> ray.data.Dataset:
    """Distributed pairing: hash-partition tagged rows by their (band,
    bucket) composite so every bucket (and its salted sub-buckets +
    ambassadors) lands wholly in one partition, then run the vectorized
    numpy pairing kernel once per partition via groupby().map_groups —
    P vectorized calls total, no driver-side serial section. This is the
    scale path: work per partition is bounded by |tagged|/P with per-bucket
    fanout capped by the salting contract (~cap^2)."""
    n_parts = max(cfg.num_partitions * 4, 8)

    def add_part(t: pa.Table) -> pa.Table:
        comp = H.hash_u64_pair(
            t["band"].to_numpy().view(np.uint64),
            t["bucket"].to_numpy().view(np.uint64),
        )
        return t.append_column(
            "part", pa.array((comp % np.uint64(n_parts)).astype(np.int64)))

    def pair_part(t: pa.Table) -> pa.Table:
        return _pair_tagged_table(t, cfg)

    return tagged.map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(pair_part, batch_format="pyarrow")


def _pair_tagged_table(tbl: pa.Table, cfg: DedupConfig) -> pa.Table:
    """Vectorized pairing kernel over tagged multi-bucket rows — identical
    semantics to the reference DAG: cold-bucket all-pairs (with
    emission-time pixel Hamming filtering), hot sub-bucket stars +
    ambassador all-pairs re-linking the salt shards. Pure numpy. No pandas
    merge: at 16-bit pixel-band saturation the raw pair product is
    O(n^2/65k) (~90M at 150k rows); generating pair INDEX arrays per
    bucket-size class and filtering immediately keeps memory at a few
    pair-chunks instead of a materialized 90M-row join product."""
    if tbl.num_rows == 0:
        return pa.table({"src": pa.array([], pa.string()),
                         "dst": pa.array([], pa.string()),
                         "kind": pa.array([], pa.string()),
                         "sc": pa.array([], pa.int8())})
    band = tbl["band"].to_numpy()
    bucket = tbl["bucket"].to_numpy()
    salt = tbl["salt"].to_numpy()
    ids = tbl["image_id"].to_pandas().to_numpy()
    has_px = "ph" in tbl.column_names
    ph = tbl["ph"].to_numpy() if has_px else np.zeros(len(band), np.int64)
    sh = tbl["sh"].to_numpy() if has_px else np.zeros(len(band), np.int64)

    out_src, out_dst, out_band = [], [], []

    def pair_groups(sel: np.ndarray, group_key: np.ndarray, mode: str) -> None:
        """Vectorized per-group pairing over rows[sel], grouped by the sorted
        composite group_key. mode='allpairs' emits i<j pairs (hamming-
        filtered for pixel bands); mode='star' links each row to its group's
        min-id row."""
        if not sel.any():
            return
        idx = np.nonzero(sel)[0]
        order = np.argsort(group_key[idx], kind="stable")
        idx = idx[order]
        gk = group_key[idx]
        starts = np.nonzero(np.concatenate([[True], gk[1:] != gk[:-1]]))[0]
        sizes = np.diff(np.concatenate([starts, [len(idx)]]))
        if mode == "star":
            # per group: min-id row linked to every other row
            import pandas as pd_

            grp = np.repeat(np.arange(len(starts)), sizes)
            s = pd_.Series(ids[idx])
            gmin = s.groupby(grp).transform("min").to_numpy()
            mask = ids[idx] != gmin
            out_src.append(gmin[mask])
            out_dst.append(ids[idx][mask])
            out_band.append(band[idx][mask])
            return
        # all-pairs, batched by bucket SIZE class so triu templates vectorize
        for s_val in np.unique(sizes):
            if s_val < 2:
                continue
            gsel = sizes == s_val
            gstarts = starts[gsel]
            iu, ju = np.triu_indices(int(s_val), k=1)
            a = (gstarts[:, None] + iu[None, :]).ravel()
            b = (gstarts[:, None] + ju[None, :]).ravel()
            ra, rb = idx[a], idx[b]
            keep = np.ones(len(ra), dtype=bool)
            if has_px:
                keep = _pixel_pair_keep(band[ra], ph[ra], ph[rb], sh[ra], sh[rb], cfg)
            lo = np.where(ids[ra][keep] < ids[rb][keep], ids[ra][keep], ids[rb][keep])
            hi = np.where(ids[ra][keep] < ids[rb][keep], ids[rb][keep], ids[ra][keep])
            out_src.append(lo)
            out_dst.append(hi)
            out_band.append(band[ra][keep])

    comp = H.hash_u64_pair(band.view(np.uint64), bucket.view(np.uint64))
    with np.errstate(over="ignore"):
        comp_salt = H.hash_u64_pair(comp, salt.view(np.uint64))

    cold = salt == -1
    pair_groups(cold, comp, "allpairs")

    hot = salt >= 0
    if hot.any():
        pair_groups(hot, comp_salt, "star")  # per salted sub-bucket
        # ambassadors: per sub-bucket min, all-pairs per (band,bucket)
        import pandas as pd_

        hidx = np.nonzero(hot)[0]
        dfm = pd_.DataFrame({"k": comp_salt[hidx], "comp": comp[hidx],
                             "id": ids[hidx], "row": hidx})
        mins = dfm.loc[dfm.groupby("k")["id"].idxmin()]
        midx = mins["row"].to_numpy()
        sel = np.zeros(len(band), dtype=bool)
        sel[midx] = True
        pair_groups(sel, comp, "allpairs")

    if not out_src:
        return pa.table({"src": pa.array([], pa.string()),
                         "dst": pa.array([], pa.string()),
                         "kind": pa.array([], pa.string()),
                         "sc": pa.array([], pa.int8())})
    src = np.concatenate(out_src)
    dst = np.concatenate(out_dst)
    bands = np.concatenate(out_band).astype(np.int64)

    # local (src,dst) dedupe before anything distributed sees the edges: a
    # true pair collides in MANY bands (up to 40+), so the raw pair stream is
    # ~20-40x the distinct edge set — sort by (pair hash, kind priority) and
    # keep one instance per pair. Substring-rendezvous instances rank LAST
    # (they prove only a k-char overlap) but set the per-pair 'sc' flag, so
    # a pair that is BOTH an LSH candidate and a substring candidate keeps
    # its signature kind for Hamming/Jaccard verification AND still gets the
    # exact L-gram substring check — either check passing keeps the edge.
    # (Collapsing to a single kind used to silently drop the substring
    # check for such pairs: an embedded 40-char substring in a long caption
    # has low Jaccard, so the pair died in verify despite being a true dup.)
    is_sc = ((bands >= BAND_SUBSTR) & (bands < BAND_SUBSTR_EXACT)).astype(np.int8)
    prio_of_band = np.select(
        [bands >= BAND_EXACT, bands >= BAND_SUBSTR_EXACT, bands >= BAND_SUBSTR,
         bands >= BAND_SIMHASH, bands >= BAND_PHASH],
        [KIND_PRIORITY.index("exact"), KIND_PRIORITY.index("substr"),
         KIND_PRIORITY.index("substr_cand"),
         KIND_PRIORITY.index("simhash"), KIND_PRIORITY.index("phash")],
        default=KIND_PRIORITY.index("minhash"),
    )
    hs = H.hash_bytes_array(pa.array(src, pa.string()))
    hd_ = H.hash_bytes_array(pa.array(dst, pa.string()))
    # 128-bit pair key (two independent 64-bit mixes), matching dedupe_edges:
    # a single 64-bit key has ~0.2 expected collisions at the 90M-pair scale
    # this path sees, and a collision silently drops a distinct edge
    pair_h = H.hash_u64_pair(hs, hd_)
    pair_h2 = H.hash_u64_pair(hd_ ^ H._MIX2, hs)
    order = np.lexsort((prio_of_band, pair_h2, pair_h))
    h1s, h2s = pair_h[order], pair_h2[order]
    first = np.concatenate(
        [[True], (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])])
    keep = order[first]
    sc = np.maximum.reduceat(is_sc[order], np.flatnonzero(first))
    kind = _kind_column(pa.array(bands[keep]))
    return pa.table({"src": pa.array(src[keep], pa.string()),
                     "dst": pa.array(dst[keep], pa.string()),
                     "kind": kind,
                     "sc": pa.array(sc, pa.int8())})


def _pair_tagged_table_slim(tbl: pa.Table, cfg: DedupConfig) -> pa.Table:
    """SLIM variant of ``_pair_tagged_table`` for the fused verified-edge
    path: pairs leave the kernel as 64-bit image-id HASHES
    ``(ah, bh, prio:int8, sc:int8)`` — 18 bytes/row instead of ~75 with the
    id strings — so the global pair-dedupe exchange moves 4x fewer bytes
    and the kernel never gathers object-dtype string arrays (the 90M-pair
    string min/max was the kernel's hottest loop). Strings come back after
    the dedupe via one broadcast gather against the signature index
    (``verify.resolve_and_verify_pairs``). Hash-collision budget: ids are
    hashed with the engine's standard 64-bit mix; an id collision requires
    two distinct image_ids in the SAME broadcast tier (<= cfg.broadcast_
    limit = 1M rows -> E[collisions] ~ 1e12/2^65 < 1e-7); above the tier
    the caller falls back to the string path."""
    empty = pa.table({"ah": pa.array([], pa.int64()),
                      "bh": pa.array([], pa.int64()),
                      "prio": pa.array([], pa.int8()),
                      "sc": pa.array([], pa.int8())})
    if tbl.num_rows == 0:
        return empty
    band = tbl["band"].to_numpy()
    bucket = tbl["bucket"].to_numpy()
    salt = tbl["salt"].to_numpy()
    idh = H.hash_bytes_array(
        tbl["image_id"].combine_chunks()
        if isinstance(tbl["image_id"], pa.ChunkedArray) else tbl["image_id"])
    has_px = "ph" in tbl.column_names
    ph = tbl["ph"].to_numpy() if has_px else np.zeros(len(band), np.int64)
    sh = tbl["sh"].to_numpy() if has_px else np.zeros(len(band), np.int64)

    out_a, out_b, out_band = [], [], []

    def pair_groups(sel: np.ndarray, group_key: np.ndarray, mode: str) -> None:
        if not sel.any():
            return
        idx = np.nonzero(sel)[0]
        order = np.argsort(group_key[idx], kind="stable")
        idx = idx[order]
        gk = group_key[idx]
        starts = np.nonzero(np.concatenate([[True], gk[1:] != gk[:-1]]))[0]
        sizes = np.diff(np.concatenate([starts, [len(idx)]]))
        if mode == "star":
            # per group: min-hash-id row linked to every other row (anchor
            # choice by hash order — deterministic, components unchanged)
            grp = np.repeat(np.arange(len(starts)), sizes)
            g_min = np.minimum.reduceat(idh[idx], starts)[grp]
            mask = idh[idx] != g_min
            out_a.append(g_min[mask])
            out_b.append(idh[idx][mask])
            out_band.append(band[idx][mask])
            return
        for s_val in np.unique(sizes):
            if s_val < 2:
                continue
            gsel = sizes == s_val
            gstarts = starts[gsel]
            iu, ju = np.triu_indices(int(s_val), k=1)
            a = (gstarts[:, None] + iu[None, :]).ravel()
            b = (gstarts[:, None] + ju[None, :]).ravel()
            ra, rb = idx[a], idx[b]
            keep = np.ones(len(ra), dtype=bool)
            if has_px:
                keep = _pixel_pair_keep(band[ra], ph[ra], ph[rb], sh[ra], sh[rb], cfg)
            ha, hb = idh[ra][keep], idh[rb][keep]
            out_a.append(np.minimum(ha, hb))
            out_b.append(np.maximum(ha, hb))
            out_band.append(band[ra][keep])

    comp = H.hash_u64_pair(band.view(np.uint64), bucket.view(np.uint64))
    with np.errstate(over="ignore"):
        comp_salt = H.hash_u64_pair(comp, salt.view(np.uint64))

    cold = salt == -1
    pair_groups(cold, comp, "allpairs")

    hot = salt >= 0
    if hot.any():
        pair_groups(hot, comp_salt, "star")
        # ambassadors: per sub-bucket min-hash row, all-pairs per (band,
        # bucket) — pure u64 reduceat, no pandas
        hidx = np.nonzero(hot)[0]
        order_h = np.lexsort((idh[hidx], comp_salt[hidx]))
        hs = hidx[order_h]
        ks = comp_salt[hidx][order_h]
        first = np.concatenate([[True], ks[1:] != ks[:-1]])
        midx = hs[first]   # min idh per sub-bucket (idh ascending in ties)
        sel = np.zeros(len(band), dtype=bool)
        sel[midx] = True
        pair_groups(sel, comp, "allpairs")

    if not out_a:
        return empty
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    bands = np.concatenate(out_band).astype(np.int64)
    # self-pairs from id-hash ties are impossible (same id never pairs with
    # itself: all-pairs groups have distinct rows and star masks id==anchor),
    # but two DISTINCT ids colliding to one hash would make a==b — drop them
    nz = a != b
    a, b, bands = a[nz], b[nz], bands[nz]
    is_sc = ((bands >= BAND_SUBSTR) & (bands < BAND_SUBSTR_EXACT)).astype(np.int8)
    prio_of_band = np.select(
        [bands >= BAND_EXACT, bands >= BAND_SUBSTR_EXACT, bands >= BAND_SUBSTR,
         bands >= BAND_SIMHASH, bands >= BAND_PHASH],
        [KIND_PRIORITY.index("exact"), KIND_PRIORITY.index("substr"),
         KIND_PRIORITY.index("substr_cand"),
         KIND_PRIORITY.index("simhash"), KIND_PRIORITY.index("phash")],
        default=KIND_PRIORITY.index("minhash"),
    ).astype(np.int8)
    order = np.lexsort((prio_of_band, b, a))
    a_s, b_s = a[order], b[order]
    first = np.concatenate([[True], (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])])
    starts = np.flatnonzero(first)
    sc = np.maximum.reduceat(is_sc[order], starts)
    return pa.table({
        "ah": pa.array(H.bitcast_u64_to_i64(a_s[first]), pa.int64()),
        "bh": pa.array(H.bitcast_u64_to_i64(b_s[first]), pa.int64()),
        "prio": pa.array(prio_of_band[order][first], pa.int8()),
        "sc": pa.array(sc, pa.int8()),
    })


def slim_pairs_from_buckets(
    buckets: ray.data.Dataset, cfg: DedupConfig
) -> ray.data.Dataset:
    """The fused verified-edge fast path's pairing stage: stats -> broadcast
    tag -> SLIM pairing kernel, identical bucket semantics to
    ``edges_from_buckets`` but pairs exchange as (ah, bh, prio, sc) id-hash
    rows. Caller must follow with ``dedupe_slim_pairs`` + the resolve/verify
    gather (``verify.resolve_and_verify_pairs``)."""
    from deduplication_ray.stages.tuning import apply_context_tuning, ensure_blocks

    apply_context_tuning()
    buckets = ensure_blocks(buckets, cfg.num_partitions).materialize()
    idx_ref, total_multi = multi_bucket_index(buckets, cfg)
    empty = ray.data.from_arrow(_pair_tagged_table_slim(
        pa.table({"band": pa.array([], pa.int64())}).slice(0, 0), cfg))
    if idx_ref is None:
        return empty
    tagged = buckets.map_batches(
        _KeyTaggerIdx(idx_ref, cfg.bucket_cap, cfg.gram_sample_drop_df),
        batch_format="pyarrow",
    )
    if total_multi <= cfg.local_pairs_limit:
        tbls = [t for t in tagged.iter_batches(batch_format="pyarrow")
                if t.num_rows]
        if not tbls:
            return empty
        return ray.data.from_arrow(_pair_tagged_table_slim(
            pa.concat_tables(tbls, promote_options="default"), cfg))
    # Materialize the tagged stream before the pairing exchange even though
    # it has one consumer: letting the tagging map fuse into the sort-based
    # groupby re-plans it INTO the exchange, which under backpressure
    # measured +22s on the 8-CPU leg and +3s at 32 CPUs (600k rows) — same
    # stall ``edges_from_buckets`` documents for its two-consumer stream.
    tagged = tagged.materialize()
    n_parts = max(cfg.num_partitions * 4, 8)

    def add_part(t: pa.Table) -> pa.Table:
        comp = H.hash_u64_pair(
            t["band"].to_numpy().view(np.uint64),
            t["bucket"].to_numpy().view(np.uint64),
        )
        return t.append_column(
            "part", pa.array((comp % np.uint64(n_parts)).astype(np.int64)))

    def pair_part(t: pa.Table) -> pa.Table:
        return _pair_tagged_table_slim(t, cfg)

    return tagged.map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(pair_part, batch_format="pyarrow") \
        .materialize()


def dedupe_slim_pairs(pairs: ray.data.Dataset, cfg: DedupConfig) -> ray.data.Dataset:
    """Collapse duplicate (ah, bh) id-hash pairs across bands/partitions —
    keep the best (min) prio, OR the sc flag. Same hash-partitioned
    vectorized reduce as ``dedupe_edges`` but over the 18-byte slim rows;
    returns a LAZY dataset so the caller can fuse the resolve/verify gather
    into the same execution."""
    from deduplication_ray.stages.groupred import hash_grouped_reduce

    def red(t: pa.Table) -> pa.Table:
        a = t["ah"].to_numpy()
        b = t["bh"].to_numpy()
        prio = t["prio"].to_numpy()
        sc = t["sc"].to_numpy()
        order = np.lexsort((prio, b, a))
        a_s, b_s = a[order], b[order]
        first = np.concatenate([[True], (a_s[1:] != a_s[:-1])
                                | (b_s[1:] != b_s[:-1])])
        starts = np.flatnonzero(first)
        return pa.table({
            "ah": pa.array(a_s[first]),
            "bh": pa.array(b_s[first]),
            "prio": pa.array(prio[order][first], pa.int8()),
            "sc": pa.array(np.maximum.reduceat(sc[order], starts), pa.int8()),
        })

    return hash_grouped_reduce(
        pairs,
        lambda t: H.hash_u64_pair(t["ah"].to_numpy().view(np.uint64),
                                  t["bh"].to_numpy().view(np.uint64)),
        red,
        2 * cfg.num_partitions,
    )


def _empty_edge_ds() -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table({"src": pa.array([], pa.string()),
                  "dst": pa.array([], pa.string()),
                  "kind": pa.array([], pa.string()),
                  "sc": pa.array([], pa.int8())})
    )


# trust order for duplicate (src,dst) edges found by several detectors:
# trusted-by-construction kinds first, so verification never downgrades a
# pair that an exact detector already proved. 'substr_cand' (winnowing
# minimizer rendezvous, proves only a k-char overlap) ranks LAST so any
# other detection of the same pair wins; pure candidates get an exact
# L-gram verification pass before they can become 'substr'.
KIND_PRIORITY = ["exact", "substr", "phash", "simhash", "minhash", "substr_cand"]


def dedupe_edges(
    edges: ray.data.Dataset, num_parts: int = 64, keep_sc: bool = False
) -> ray.data.Dataset:
    """Collapse duplicate (src, dst) across bands — keep the most-trusted
    kind per KIND_PRIORITY. Hash-partitioned on a 128-bit NUMERIC pair key
    (string-pair sort keys made the shuffle ~10x slower; a 64-bit key
    silently drops edges on collision), reduced by ONE vectorized
    lexsort-unique per partition (``hash_grouped_reduce`` — Ray's aggregate
    pays per-distinct-group costs that dominate at group-per-row keys).

    The per-pair substring-candidate flag (``sc`` column where present, or
    kind == 'substr_cand') is OR-reduced across a pair's instances so
    collapsing to the most-trusted kind never loses the fact that the pair
    also earned an exact substring check — callers that route substring
    verification pass ``keep_sc=True`` to receive the flag."""
    import pyarrow.compute as pc

    from deduplication_ray.stages.groupred import hash_grouped_reduce

    kindset = pa.array(KIND_PRIORITY)
    sc_prio = KIND_PRIORITY.index("substr_cand")

    def to_prio(t: pa.Table) -> pa.Table:
        prio = pc.index_in(t["kind"], value_set=kindset).cast(pa.int64())
        prio_np = prio.to_numpy()
        sc = (t["sc"].to_numpy().astype(np.int8)
              if "sc" in t.column_names else np.zeros(t.num_rows, np.int8))
        sc = np.maximum(sc, (prio_np == sc_prio).astype(np.int8))
        hs = H.hash_bytes_array(t["src"].combine_chunks().cast(pa.string()))
        hd = H.hash_bytes_array(t["dst"].combine_chunks().cast(pa.string()))
        h1 = H.hash_u64_pair(hs, hd)
        h2 = H.hash_u64_pair(hd ^ H._MIX2, hs)
        return pa.table({
            "h1": pa.array(H.bitcast_u64_to_i64(h1), pa.int64()),
            "h2": pa.array(H.bitcast_u64_to_i64(h2), pa.int64()),
            "src": t["src"], "dst": t["dst"], "prio": prio,
            "sc": pa.array(sc, pa.int8()),
        })

    def red(t: pa.Table) -> pa.Table:
        h1 = t["h1"].to_numpy()
        h2 = t["h2"].to_numpy()
        prio = t["prio"].to_numpy()
        sc = t["sc"].to_numpy()
        order = np.lexsort((prio, h2, h1))
        h1s, h2s = h1[order], h2[order]
        first = np.concatenate(
            [[True], (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])])
        keep = order[first]
        out = t.take(pa.array(keep))
        kind = pc.take(kindset, out["prio"].combine_chunks().cast(pa.int32()))
        cols = {"src": out["src"], "dst": out["dst"], "kind": kind}
        if keep_sc:
            sc_red = np.maximum.reduceat(sc[order], np.flatnonzero(first))
            cols["sc"] = pa.array(sc_red, pa.int8())
        return pa.table(cols)

    keyed = edges.map_batches(to_prio, batch_format="pyarrow", batch_size=None)
    return hash_grouped_reduce(
        keyed, lambda t: t["h1"].to_numpy().view(np.uint64), red, num_parts)


def exact_edges(
    signatures: ray.data.Dataset, cfg: DedupConfig, key: tuple = ("ck1", "ck2")
) -> ray.data.Dataset:
    """Exact-duplicate star edges: per content-key group, link min id to rest.

    The graft's R8: the reference's first-occurrence insertion
    (``compressor.c:109-113``) becomes min-id election per content-key group
    (deterministic under parallelism, SURVEY §7.5.5). The 128-bit (ck1, ck2)
    key makes payload re-verification unnecessary. Vectorized min-aggregate +
    join-back.
    """
    from deduplication_ray.stages.groupred import hash_grouped_reduce
    from deduplication_ray.stages.join import lookup_join
    from deduplication_ray.stages.tuning import apply_context_tuning, ensure_blocks

    apply_context_tuning()
    lean = ensure_blocks(
        signatures.select_columns([*key, "image_id"]), cfg.num_partitions
    ).materialize()

    # group-per-row key cardinality: hash-partitioned vectorized reduce, not
    # Ray aggregate (per-distinct-group cost). Only duplicated keys survive —
    # the lookup side shrinks to actual dups.
    def red(t: pa.Table) -> pa.Table:
        schema = pa.schema([(k, t.schema.field(k).type) for k in key]
                           + [("src", pa.string())])
        df = t.to_pandas()
        g = df.groupby(list(key), sort=False)["image_id"] \
            .agg(src="min", _n="size").reset_index()
        g = g[g["_n"] >= 2]
        # explicit schema: an empty pandas frame would round-trip object
        # columns to Arrow null type, which join kernels reject
        return pa.Table.from_pandas(
            g[[*key, "src"]], preserve_index=False).cast(schema)

    def key_hash(t: pa.Table) -> np.ndarray:
        h = t[key[0]].to_numpy().view(np.uint64)
        for k in key[1:]:
            h = H.hash_u64_pair(h, t[k].to_numpy().view(np.uint64))
        return h

    mins = hash_grouped_reduce(lean, key_hash, red, cfg.num_partitions)
    joined = lookup_join(lean, mins, on=list(key), cfg=cfg)

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.invert(pc.equal(t["image_id"], t["src"])))
        kind = pa.nulls(t.num_rows, pa.string()).fill_null("exact")
        return pa.table({"src": t["src"], "dst": t["image_id"], "kind": kind,
                         "sc": pa.array(np.zeros(t.num_rows, np.int8))})

    return joined.map_batches(finish, batch_format="pyarrow")


def plan_lsh_params(threshold: float, num_perm: int = 128,
                    min_recall: float = 0.99,
                    max_fp_below: float = 0.5) -> dict:
    """LSH parameter PLANNER: choose (bands b, rows-per-band r) for a target
    Jaccard ``threshold`` from the banding S-curve
    P(candidate | jaccard=s) = 1 - (1 - s^r)^b  (Leskovec/Rajaraman/Ullman,
    *Mining of Massive Datasets* §3.4 — public). Among all factorizations
    b*r == num_perm it picks the one that (a) catches pairs AT the threshold
    with probability >= ``min_recall`` and (b) minimizes the candidate
    probability at ``max_fp_below``·threshold (shuffle cost control: every
    false candidate is a wasted edge through the bucket groupby). If no
    factorization reaches ``min_recall``, the closest one is returned with
    ``recall_ok=False`` — callers should raise num_perm.

    Returns {bands, rows_per_band, p_at_threshold, p_at_fp, recall_ok};
    feed the first two straight into ``DedupConfig``.
    """
    best = None
    for r in range(1, num_perm + 1):
        if num_perm % r:
            continue
        b = num_perm // r
        p_t = 1.0 - (1.0 - threshold ** r) ** b
        s_fp = max_fp_below * threshold
        p_fp = 1.0 - (1.0 - s_fp ** r) ** b
        ok = p_t >= min_recall
        # prefer: recall met, then lowest fp prob, then fewer bands (fewer
        # bucket rows emitted per signature)
        key = (not ok, p_fp if ok else -p_t, b)
        if best is None or key < best[0]:
            best = (key, {"bands": b, "rows_per_band": r,
                          "p_at_threshold": round(p_t, 6),
                          "p_at_fp": round(p_fp, 6), "recall_ok": ok})
    return best[1]
