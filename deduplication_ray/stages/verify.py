"""Candidate-edge verification: Hamming-ball + MinHash-Jaccard checks (T10).

Candidates from LSH banding are *hypotheses*; this stage attaches both
endpoints' signatures (two hash-partitioned joins — signatures are the lean
~1KB/row table, never pixels) and keeps an edge iff any signal passes:

* estimated Jaccard(minhash_src, minhash_dst) >= cfg.jaccard_tau
* popcount(phash_src ^ phash_dst)   <= cfg.phash_hamming_t   (corroborated:
  the simhash distance must also be <= cfg.pixel_corr_t)
* popcount(simhash_src ^ simhash_dst) <= cfg.simhash_hamming_t (corroborated:
  the phash distance must also be <= cfg.pixel_corr_t)
* exact edges (kind == 'exact' / 'cap_exact' / 'substr') pass by construction

The per-batch check is pure vectorized numpy over Arrow columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from deduplication_ray.config import DedupConfig
from deduplication_ray.functions import hashing as H

_TRUSTED_KINDS = ("exact", "cap_exact", "substr")


class _AttachBoth:
    """ONE broadcast gather that attaches signature columns to BOTH edge
    endpoints: probe src and dst against the same presorted id-hash index
    (built once on the driver from distributed per-block hashes), take the
    matched signature rows, confirm id equality exactly. Replaces two
    chained lookup_joins — one execution, one broadcast, one index."""

    def __init__(self, ref, cols: list[str]):
        self.ref = ref
        self.cols = cols
        self._state = None

    def __call__(self, t: pa.Table) -> pa.Table:
        from deduplication_ray.stages.join import _key_hashes, _resolve_small

        if self._state is None:
            small, sorted_h, order = ray.get(self.ref)
            self._state = (_resolve_small(small), sorted_h, order)
        small, sorted_h, order = self._state
        if t.num_rows == 0 or small.num_rows == 0:
            t = t.slice(0, 0)
            cols = {f.name: pa.array([], f.type if not pa.types.is_null(f.type)
                                     else pa.string()) for f in t.schema}
            for side in ("src", "dst"):
                for c in self.cols:
                    cols[f"{c}_{side}"] = pa.array(
                        [], small.schema.field(c).type)
            return pa.table(cols)

        keep = np.ones(t.num_rows, dtype=bool)
        gathered: dict[str, pa.ChunkedArray] = {}
        for side in ("src", "dst"):
            ph = _key_hashes(t, [side])
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
                eq = pc.fill_null(
                    pc.equal(t[side], small["image_id"].take(idx)), False)
                matched &= eq.to_numpy(zero_copy_only=False).astype(bool)
            keep &= matched
            for c in self.cols:
                gathered[f"{c}_{side}"] = small[c].take(pa.array(cand))
        out = t
        for name, col in gathered.items():
            out = out.append_column(name, col)
        return out.filter(pa.array(keep))


def attach_signatures(
    edges: ray.data.Dataset,
    signatures: ray.data.Dataset,
    cfg: DedupConfig,
    cols: list[str] | None = None,
) -> ray.data.Dataset:
    """edges(src,dst,kind) + signatures -> edges with _src/_dst signature cols.

    Size-dispatched (R17's gather generalized): below ``cfg.broadcast_limit``
    the signature table broadcasts BY BLOCK REFS and one ``_AttachBoth``
    gather attaches both endpoints in a single map execution; above it — the
    10^12-row path, where no table broadcasts — two hash-partitioned
    ``Dataset.join`` exchanges on the edge endpoints.
    """
    from deduplication_ray.stages.join import _block_key_hashes, lookup_join

    cols = cols or ["phash", "simhash", "minhash"]
    sig = signatures.select_columns(["image_id", *cols]).materialize()
    n_sig = sig.count()
    if (n_sig == 0 or n_sig > cfg.broadcast_limit
            or (sig.size_bytes() or 0) > 2 * 1024 * 1024 * 1024):
        src_side = sig.rename_columns(
            {c: f"{c}_src" for c in cols}).rename_columns({"image_id": "src"})
        dst_side = sig.rename_columns(
            {c: f"{c}_dst" for c in cols}).rename_columns({"image_id": "dst"})
        e = lookup_join(edges, src_side, on=["src"], cfg=cfg, lookup_rows=n_sig)
        e = lookup_join(e, dst_side, on=["dst"], cfg=cfg, lookup_rows=n_sig)
        return e

    refs = list(sig.to_arrow_refs())
    hs = ray.get([_block_key_hashes.remote(r, ["image_id"]) for r in refs])
    kh = np.concatenate(hs) if hs else np.zeros(0, np.uint64)
    order = np.argsort(kh, kind="stable")
    ref = ray.put((refs, kh[order], order.astype(np.int64)))
    return edges.map_batches(_AttachBoth(ref, cols), batch_format="pyarrow")


class DeferredSignatureIndex:
    """``signature_index`` started on a side thread: the broadcast index is
    needed only by the final resolve/verify gather, so its build (a count,
    a per-block hash task round, a driver argsort) overlaps the pairing
    chain instead of serializing before it. ``get()`` joins and re-raises.
    ``eligible`` is decided synchronously (metadata-only count/size) so the
    caller can branch fast-path/string-path without waiting."""

    def __init__(self, signatures: ray.data.Dataset, cfg: DedupConfig):
        import threading

        self._box: dict = {}
        sig = signatures.materialize()  # no-op on checkpointed input
        n = sig.count()
        self.eligible = not (
            n == 0 or n > cfg.broadcast_limit
            or (sig.size_bytes() or 0) > 2 * 1024 * 1024 * 1024)
        if not self.eligible:
            self._th = None
            return

        def _build() -> None:
            try:
                self._box["ref"] = signature_index(sig, cfg)
            except BaseException as exc:
                self._box["err"] = exc

        self._th = threading.Thread(target=_build, daemon=True)
        self._th.start()

    def get(self):
        if self._th is None:
            return None
        self._th.join()
        if "err" in self._box:
            raise self._box["err"]
        return self._box["ref"]


def signature_index(
    signatures: ray.data.Dataset, cfg: DedupConfig,
    cols: list[str] | None = None,
):
    """Broadcast signature index for the fused verified-edge fast path:
    (block refs, sorted image_id hashes, permutation) in the object store,
    built with the driver touching only 8 bytes/row. Returns the ray.put
    handle, or None when the table exceeds the broadcast tier (row or byte
    guard) — callers then fall back to the string/shuffle path, which is
    the 10^12-row plan.

    No projection pass: the caller's signature table is already materialized
    (checkpoint output) and its non-index columns are ~33 bytes/row next to
    the ~1 KB/row minhash column, so re-materializing a pruned copy cost a
    full extra execution (measured 0.8-2.0s at 600k rows) to save ~3% of
    broadcast bytes. ``cols`` is kept for signature parity; extra columns
    ride along harmlessly."""
    from deduplication_ray.stages.join import _block_key_hashes

    sig = signatures.materialize()  # no-op on checkpointed/materialized input
    n_sig = sig.count()
    if (n_sig == 0 or n_sig > cfg.broadcast_limit
            or (sig.size_bytes() or 0) > 2 * 1024 * 1024 * 1024):
        return None
    refs = list(sig.to_arrow_refs())
    hs = ray.get([_block_key_hashes.remote(r, ["image_id"]) for r in refs])
    kh = np.concatenate(hs) if hs else np.zeros(0, np.uint64)
    order = np.argsort(kh, kind="stable")
    return ray.put((refs, kh[order], order.astype(np.int64)))


class _ResolveVerify:
    """One fused map over deduped SLIM pairs (ah, bh, prio, sc): gather the
    id strings and signature columns for both endpoints from the broadcast
    signature index, apply the verify_edges signal checks, and emit
    verified (src, dst, kind, sc). Replaces the attach (two joins) + verify
    stages of the string path with a single per-batch gather."""

    def __init__(self, ref, cfg: DedupConfig, has_pixels: bool,
                 do_verify: bool = True):
        self.ref = ref
        self.cfg = cfg
        self.has_pixels = has_pixels
        self.do_verify = do_verify
        self._state = None

    def __call__(self, t: pa.Table) -> pa.Table:
        from deduplication_ray.stages.join import _resolve_small
        from deduplication_ray.stages.lsh import KIND_PRIORITY

        if self._state is None:
            small, sorted_h, order = ray.get(self.ref)
            self._state = (_resolve_small(small), sorted_h, order)
        small, sorted_h, order = self._state
        empty = pa.table({"src": pa.array([], pa.string()),
                          "dst": pa.array([], pa.string()),
                          "kind": pa.array([], pa.string()),
                          "sc": pa.array([], pa.int8())})
        if t.num_rows == 0 or small.num_rows == 0:
            return empty
        cfg = self.cfg
        rows = {}
        ok = np.ones(t.num_rows, dtype=bool)
        for side in ("ah", "bh"):
            h = t[side].to_numpy().view(np.uint64)
            pos = np.minimum(np.searchsorted(sorted_h, h), len(sorted_h) - 1)
            matched = sorted_h[pos] == h
            ok &= matched
            rows[side] = order[pos]
        if not ok.all():
            # every pair hash came from a signature row, so a miss can only
            # be a stale index — fail loudly rather than silently drop
            raise RuntimeError(
                f"resolve_and_verify: {int((~ok).sum())} pair endpoints "
                "missing from the signature index")
        ia = pa.array(rows["ah"], pa.int64())
        ib = pa.array(rows["bh"], pa.int64())
        prio = t["prio"].to_numpy()
        sc = t["sc"].to_numpy()
        keep = np.ones(t.num_rows, dtype=bool)
        if self.do_verify:
            # checks ordered CHEAPEST first; the 8-bytes-per-pair Hamming
            # checks decide most pairs, so the num_perm*8-bytes-per-side
            # MinHash gather+unpack (the bandwidth-heavy check: ~2 KB/pair
            # at P=128) runs only over rows every cheap check left
            # undecided — measured 3.4s -> sub-second on the 600k-row /
            # 825k-pair stage at 32 CPUs
            trusted_prio = np.array(
                [KIND_PRIORITY.index("exact"), KIND_PRIORITY.index("substr")],
                dtype=prio.dtype)
            keep = np.isin(prio, trusted_prio)
            if self.has_pixels and "phash" in small.column_names:
                hds = {}
                for col in ("phash", "simhash"):
                    ca = small[col].take(ia).combine_chunks() \
                        .to_numpy(zero_copy_only=False)
                    cb = small[col].take(ib).combine_chunks() \
                        .to_numpy(zero_copy_only=False)
                    hds[col] = H.hamming_distance_u64(
                        H.bitcast_i64_to_u64(ca), H.bitcast_i64_to_u64(cb))
                # corroborated accept: an in-ball hit on one pixel hash must
                # sit within pixel_corr_t on the other (see config.py — the
                # chance-edge / transitive-merge fix; recall-free by measure)
                corr = cfg.pixel_corr_t
                keep |= ((hds["phash"] <= cfg.phash_hamming_t)
                         & (hds["simhash"] <= corr))
                keep |= ((hds["simhash"] <= cfg.simhash_hamming_t)
                         & (hds["phash"] <= corr))
            # substring candidates survive unverified — the exact L-gram
            # join downstream is their verdict (winnow mode only)
            keep |= (sc > 0) | (prio == KIND_PRIORITY.index("substr_cand"))
            if "minhash" in small.column_names and not keep.all():
                und = np.flatnonzero(~keep)
                ms = H.unpack_u64_rows(
                    small["minhash"].take(ia.take(pa.array(und))),
                    cfg.num_perm)
                md = H.unpack_u64_rows(
                    small["minhash"].take(ib.take(pa.array(und))),
                    cfg.num_perm)
                keep[und] |= (ms == md).mean(axis=1) >= cfg.jaccard_tau
        k = pa.array(keep)
        kindset = pa.array(KIND_PRIORITY)
        kind = pa.compute.take(
            kindset, pa.array(prio[keep].astype(np.int32)))
        return pa.table({
            "src": small["image_id"].take(ia.filter(k)),
            "dst": small["image_id"].take(ib.filter(k)),
            "kind": kind,
            "sc": pa.array(sc[keep], pa.int8()),
        })


def resolve_and_verify_pairs(
    slim_pairs: ray.data.Dataset, sig_ref, cfg: DedupConfig,
    has_pixels: bool = True, do_verify: bool = True,
) -> ray.data.Dataset:
    """Deduped slim pairs -> verified (src, dst, kind, sc) edges (lazy)."""
    return slim_pairs.map_batches(
        _ResolveVerify(sig_ref, cfg, has_pixels, do_verify),
        batch_format="pyarrow", batch_size=65536)


def verify_edges(
    edges_with_sigs: ray.data.Dataset, cfg: DedupConfig, has_pixels: bool = True
) -> ray.data.Dataset:
    """Filter attached edges to verified ones; emits (src, dst, kind)."""

    def check(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.select(["src", "dst", "kind"])
        trusted = pc.fill_null(
            pc.is_in(t["kind"], value_set=pa.array(_TRUSTED_KINDS)), False
        )
        keep = trusted.combine_chunks().to_numpy(zero_copy_only=False).astype(bool)

        ms = H.unpack_u64_rows(t["minhash_src"], cfg.num_perm)
        md = H.unpack_u64_rows(t["minhash_dst"], cfg.num_perm)
        jacc = (ms == md).mean(axis=1)
        keep |= jacc >= cfg.jaccard_tau

        if has_pixels:
            ph = H.hamming_distance_u64(
                H.bitcast_i64_to_u64(t["phash_src"].to_numpy()),
                H.bitcast_i64_to_u64(t["phash_dst"].to_numpy()),
            )
            sh = H.hamming_distance_u64(
                H.bitcast_i64_to_u64(t["simhash_src"].to_numpy()),
                H.bitcast_i64_to_u64(t["simhash_dst"].to_numpy()),
            )
            # corroborated accept (see config.pixel_corr_t): an in-ball hit
            # on one pixel hash needs the other within the loose corr bound —
            # kills single-channel chance collisions without any recall cost
            keep |= (ph <= cfg.phash_hamming_t) & (sh <= cfg.pixel_corr_t)
            keep |= (sh <= cfg.simhash_hamming_t) & (ph <= cfg.pixel_corr_t)

        return t.select(["src", "dst", "kind"]).filter(pa.array(keep))

    return edges_with_sigs.map_batches(check, batch_format="pyarrow")


def plan_hamming_radius(pos_dists, neg_dists, target_recall: float = 0.99,
                        bits: int = 64) -> dict:
    """Operating-point planner for a Hamming-ball verification channel —
    the verify-stage analog of ``lsh.plan_lsh_params``: given labeled
    Hamming distances (``pos_dists`` from known-duplicate pairs,
    ``neg_dists`` from known-non-duplicate pairs — a small calibration
    sample by contract, e.g. a planted fixture or a human-labeled batch),
    choose the smallest radius whose recall meets ``target_recall`` and
    report the full sweep so the false-positive cost of each extra bit is
    visible. The default config's radii (``phash_hamming_t=10``,
    ``simhash_hamming_t=6``, ``crop_hamming_t=3``) were chosen exactly
    this way against the planted fixtures.

    Returns {radius, recall, fpr, recall_ok, f1_radius, sweep} where
    ``sweep`` is a list of (radius, recall_milli, fpr_milli) for radii up
    to the first with recall 1.0, and ``f1_radius`` maximizes F1 treating
    the calibration sample as the population. Pure driver math on the
    bounded sample — no distributed work.
    """
    import numpy as np

    pos = np.asarray(pos_dists, dtype=np.int64)
    neg = np.asarray(neg_dists, dtype=np.int64)
    if len(pos) == 0:
        raise ValueError("need at least one positive-pair distance")
    sweep = []
    chosen, f1_best, f1_radius = None, -1.0, 0
    for r in range(bits + 1):
        recall = float((pos <= r).mean())
        fpr = float((neg <= r).mean()) if len(neg) else 0.0
        tp = int((pos <= r).sum())
        fp = int((neg <= r).sum())
        prec = tp / (tp + fp) if tp + fp else 1.0
        f1 = (2 * prec * recall / (prec + recall)) if prec + recall else 0.0
        if f1 > f1_best:
            f1_best, f1_radius = f1, r
        sweep.append((r, int(recall * 1000), int(fpr * 1000)))
        if chosen is None and recall >= target_recall:
            chosen = r
        if recall >= 1.0:
            break
    r = chosen if chosen is not None else bits
    return {
        "radius": r,
        "recall": float((pos <= r).mean()),
        "fpr": float((neg <= r).mean()) if len(neg) else 0.0,
        "recall_ok": chosen is not None,
        "f1_radius": f1_radius,
        "sweep": sweep,
    }
