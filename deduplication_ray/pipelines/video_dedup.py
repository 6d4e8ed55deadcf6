"""Video near-dup pipeline: frame-sampled pHash -> LSH bands -> union-find.

The same bucketed engine as image/text dedup, specialized to VSQ1 clips
(stages/multimodal.VideoSignatures). Design for scale:

* A whole clip arrives in one row, so the signature stage needs NO shuffle —
  decode + per-frame pHash run where the bytes already live, and only the
  8-bytes-per-sampled-frame hash list travels downstream (the binary payload
  dies at the first stage, SURVEY §7.5's early-kill discipline).
* Candidates come from the existing (band, bucket) groupby machinery
  (stages/lsh.py): every sampled frame emits 4 x 16-bit pHash multi-index
  bands, Hamming-verified AT EMISSION (radius ``video_frame_hamming_t``), so
  two clips become a candidate pair iff some frame of one is a Hamming
  near-match of some frame of the other. Hot buckets (black frames, test
  cards) go through the same salting + ambassador re-linking as image LSH.
* Verification is containment over the frame-hash lists: for candidate pair
  (A, B), the fraction of A's frames with a Hamming-<=t match in B plus the
  symmetric fraction must average >= ``video_match_frac``. Head-trimmed or
  re-encoded copies keep containment ~1.0; clips sharing only a stray frame
  fall below the bar. The all-pairs XOR-popcount per pair is O(|A| x |B|)
  over a few dozen hashes and runs only on LSH survivors — never all clips.

The reference has no video path; this realizes the task brief's multimodal
requirement with the container decode done by our own VSQ1 codec
(functions/codecs.py) — no external codec library.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from deduplication_ray.config import DedupConfig
from deduplication_ray.functions import hashing as H
from deduplication_ray.stages import lsh
from deduplication_ray.stages.multimodal import VideoSignatures
from deduplication_ray.state import unionfind


def video_signatures(ds: ray.data.Dataset, cfg: DedupConfig,
                     id_col: str = "video_id") -> ray.data.Dataset:
    return ds.map_batches(
        VideoSignatures(cfg, id_col), batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )


class _ExplodeFrameBands:
    """signature rows -> (band, bucket, salt, image_id, ph, sh) bucket stream.

    One bucket row per (sampled frame x 4 pHash 16-bit bands); schema matches
    stages/lsh.edges_from_buckets so the whole skew/salting/pairing machinery
    is reused unchanged. ``ph`` carries the frame hash for the at-emission
    Hamming check (lsh._pixel_pair_keep)."""

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg

    def __call__(self, t: pa.Table) -> pa.Table:
        def rows_for(col: str) -> pa.Table:
            lists = t[col].combine_chunks() if isinstance(
                t[col], pa.ChunkedArray) else t[col]
            flat = lists.flatten().to_numpy()
            counts = np.diff(lists.offsets.to_numpy())
            band, bucket = lsh._hash16_bands(H.bitcast_i64_to_u64(flat),
                                             lsh.BAND_PHASH)
            ids = np.repeat(t["image_id"].to_pandas().to_numpy(), counts * 4)
            ph = np.repeat(flat, 4)
            return pa.table({
                "band": band.astype(np.int64),
                "bucket": bucket,
                "salt": np.zeros(len(ids), dtype=np.int64),
                "image_id": pa.array(ids, pa.string()),
                "ph": pa.array(ph, pa.int64()),
                "sh": np.zeros(len(ids), dtype=np.int64),
            })

        out = rows_for("frame_phashes")
        if "frame_phashes_flip" in t.column_names:
            # mirror channel: each frame also bands its fliplr hash, so a
            # mirrored copy's PLAIN bands meet the original's FLIP bands in
            # the same buckets (``ph`` carries the flip hash, making the
            # at-emission Hamming gate the mirror distance)
            out = pa.concat_tables([out, rows_for("frame_phashes_flip")],
                                   promote_options="default")
        return out


def verify_video_edges(edges: ray.data.Dataset, sigs: ray.data.Dataset,
                       cfg: DedupConfig) -> ray.data.Dataset:
    """Keep candidate (src, dst) iff mean frame containment >= video_match_frac.

    With ``cfg.video_mirror_channel`` two frames match when ANY of the four
    plain/flip hash combinations is within the radius — a mirrored copy
    scores the same containment as a plain one."""
    from deduplication_ray.stages.verify import attach_signatures

    mirror = cfg.video_mirror_channel
    cols = ["frame_phashes"] + (["frame_phashes_flip"] if mirror else [])
    e = attach_signatures(edges, sigs, cfg, cols=cols)
    tau, frac_min = cfg.video_frame_hamming_t, cfg.video_match_frac

    def flat_lens(col) -> tuple[np.ndarray, np.ndarray]:
        a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        f = a.flatten().to_numpy().astype(np.int64).view(np.uint64)
        l_ = pc.list_value_length(a).fill_null(0).to_numpy().astype(np.int64)
        return f, l_

    def check(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.select(["src", "dst", "kind"])
        # whole-batch frame containment: pairs padded into (n, Lmax)
        # matrices, ONE (n, La, Lb) popcount(XOR) for all pairs at once
        # (frame lists are sampling-bounded: duration/every_k frames) —
        # the per-pair Python loop this replaces spent ~0.5 ms/pair in
        # tiny-call overhead (measured on the audio twin of this check).
        fa, la = flat_lens(t["frame_phashes_src"])
        fb, lb = flat_lens(t["frame_phashes_dst"])
        La, Lb = int(la.max(initial=1)), int(lb.max(initial=1))

        def pad(flat, lens, L):
            M = np.zeros((n, L), dtype=np.uint64)
            M[np.repeat(np.arange(n), lens), H._ranges(lens)] = flat
            return M

        A = pad(fa, la, La)
        B = pad(fb, lb, Lb)
        va = np.arange(La)[None, :] < la[:, None]
        vb = np.arange(Lb)[None, :] < lb[:, None]
        d = H.popcount64(A[:, :, None] ^ B[:, None, :])
        if mirror:
            Fa = pad(flat_lens(t["frame_phashes_flip_src"])[0], la, La)
            Fb = pad(flat_lens(t["frame_phashes_flip_dst"])[0], lb, Lb)
            d = np.minimum(d, H.popcount64(A[:, :, None] ^ Fb[:, None, :]))
            d = np.minimum(d, H.popcount64(Fa[:, :, None] ^ B[:, None, :]))
        d = np.where(vb[:, None, :], d, 65)  # pad frames never match
        hit_a = ((d.min(axis=2) <= tau) & va).sum(axis=1)
        d = np.where(va[:, :, None], d, 65)
        hit_b = ((d.min(axis=1) <= tau) & vb).sum(axis=1)
        keep = (hit_a + hit_b) / np.maximum(la + lb, 1) >= frac_min
        return t.select(["src", "dst", "kind"]).filter(pa.array(keep))

    return e.map_batches(check, batch_format="pyarrow")


def clusters_from_verified_edges(ids: ray.data.Dataset,
                                 vedges: ray.data.Dataset,
                                 cfg: DedupConfig,
                                 id_col: str) -> ray.data.Dataset:
    """Shared tail for the modal dedup pipelines: verified edges + the full
    id set (column ``image_id``) -> clusters(id_col, cluster_id), unmatched
    ids as singletons. ``vedges`` must be materialized (its count decides
    the empty shortcut)."""
    if vedges.count() == 0:
        # no links survive verification: everything is a singleton. (Also
        # dodges a Ray quirk: an EMPTY dataset loses its schema through
        # rename_columns, which would break the lookup_join below.)
        return ids.map_batches(
            lambda t: pa.table({id_col: t["image_id"],
                                "cluster_id": t["image_id"]}),
            batch_format="pyarrow")
    labels = unionfind.connected_components(vedges, cfg)
    from deduplication_ray.stages.join import lookup_join

    j = lookup_join(ids, labels.rename_columns({"node": "image_id"}),
                    on=["image_id"], cfg=cfg, how="left")

    def fill(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lab = pc.coalesce(t["label"].cast(pa.string()), t["image_id"])
        return pa.table({id_col: t["image_id"], "cluster_id": lab})

    return j.map_batches(fill, batch_format="pyarrow")


def video_dedup_clusters(ds: ray.data.Dataset,
                         cfg: DedupConfig | None = None,
                         id_col: str = "video_id") -> ray.data.Dataset:
    """(video_id, bytes[VSQ1]) -> clusters(video_id, cluster_id)."""
    cfg = cfg or DedupConfig()
    from deduplication_ray.stages.tuning import apply_context_tuning

    apply_context_tuning()
    sigs = video_signatures(ds, cfg, id_col).materialize()
    buckets = sigs.map_batches(_ExplodeFrameBands(cfg), batch_format="pyarrow")
    # the emission-time Hamming gate must use the VIDEO frame radius, not the
    # still-image one — swap it in a derived config for the pairing pass only
    ecfg = dataclasses.replace(cfg, phash_hamming_t=cfg.video_frame_hamming_t)
    edges = lsh.dedupe_edges(lsh.edges_from_buckets(buckets, ecfg)).materialize()
    vedges = verify_video_edges(edges, sigs, cfg).materialize()
    ids = sigs.select_columns(["image_id"])
    return clusters_from_verified_edges(ids, vedges, cfg, id_col)
