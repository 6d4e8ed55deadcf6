"""Flagship pipeline: near-duplicate detection + clustering over an
image+caption table (BASELINE.json north rule).

Stage DAG (each boundary is a checkpoint, see state/checkpoint.py):

  input parquet (image_id, bytes, w, h, fmt, caption, phash)
    | map_batches(ComputeSignatures actor pool)      [decode once; bytes die]
  signatures (image_id, ck1, ck2, cap_hash, phash, phash_ok, simhash, minhash)
    | exact_edges (ck groupby)  +  candidate_edges (LSH bands + salting)
  edges (src, dst, kind)
    | attach signatures (2 hash joins) -> verify (Hamming/Jaccard)
  verified_edges
    | connected_components (hash-min rounds, labels_r{k} checkpoints)
  labels (node, label)
    | finalize: left-join all ids -> clusters (image_id, cluster_id)
  clusters / representatives / assignments

This is the graft of the reference's compress path R1->R8->R11-R13
(``/root/reference/src/compressor.c:41-207``): representatives generalize the
dictionary, assignments generalize the block_ids stream. ``reconstruct``
below is the decompress analog R15-R18 (``compressor.c:212-341``): a
broadcast-style join of assignments x representative rows, verified by
per-row invariants instead of byte equality.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count

from deduplication_ray.config import DedupConfig
from deduplication_ray.sources import storage
from deduplication_ray.stages import lsh, verify
from deduplication_ray.stages.signatures import ComputeSignatures
from deduplication_ray.state import unionfind
from deduplication_ray.state.checkpoint import CheckpointedRun


def compute_signatures(input_ds: ray.data.Dataset, cfg: DedupConfig) -> ray.data.Dataset:
    if cfg.sig_concurrency is None:  # task mode: state ships in the closure
        return input_ds.map_batches(
            ComputeSignatures(cfg), batch_format="pyarrow", batch_size=cfg.batch_size
        )
    return input_ds.map_batches(
        ComputeSignatures,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.sig_concurrency,
        num_cpus=1,
    )


def build_edges(
    signatures: ray.data.Dataset,
    cfg: DedupConfig,
    input_ds: ray.data.Dataset | None = None,
    substr_buckets: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Exact + LSH-candidate + suffix-array/winnowing substring edges.

    One bucket stream carries every candidate family (MinHash bands, pHash /
    SimHash multi-index bands, the exact content-key family, winnowing /
    L-gram fingerprints) so bucket stats, hot detection and salting run
    exactly once. The stream is passed to ``edges_from_buckets`` as a
    single materialized Dataset (measured: recomputing the explode/gram
    maps into each consumer's exchange re-plans the upstream into the sort
    and stalls under backpressure — 29s vs 10.7s for the tag+pair leg at 8
    CPUs / 150k rows — so one materialize of the wide stream beats two
    fused recomputes); the TAGGING map, by contrast, fuses lazily into the
    pairing exchange inside ``edges_from_buckets``, which drops the
    separate tagged-stream materialization."""
    extra = []
    needs_verify = input_ds is not None and cfg.substring_rendezvous == "winnow"
    if input_ds is not None and cfg.use_suffix_array:
        from deduplication_ray.stages.substring import suffix_array_edges

        extra.append(suffix_array_edges(input_ds, cfg))

    def bucket_src() -> ray.data.Dataset:
        b = signatures.map_batches(
            lsh.ExplodeBands(cfg, families=("minhash", "phash", "simhash",
                                            "exact")),
            batch_format="pyarrow", batch_size=cfg.text_batch_size,
        )
        if substr_buckets is not None:  # prefetched, blocks reused as-is
            return b.union(substr_buckets)
        if input_ds is not None:
            from deduplication_ray.stages.substring import substring_buckets as _sb

            b = b.union(_sb(input_ds, cfg))
        return b

    edges = lsh.edges_from_buckets(bucket_src(), cfg)
    for e in extra:
        edges = edges.union(e)
    deduped = lsh.dedupe_edges(edges, num_parts=2 * cfg.num_partitions,
                               keep_sc=needs_verify)
    if needs_verify:
        from deduplication_ray.stages.substring import split_and_verify_substring

        # winnow mode only: a shared minimizer proves a k-char overlap, so
        # candidates get the exact L-gram verification join. Materialize the
        # deduped edge set before the candidate/rest split: Ray Data has no
        # common-subexpression reuse, so two lazy consumers of the same
        # Dataset would re-execute the whole edge DAG twice. The edge set is
        # lean (~1.4 rows per input row) — object-store residency is cheap.
        # 'grams' mode needs none of this: bucket co-membership proves the
        # >= Lmin substring, edges arrive already trusted.
        deduped = split_and_verify_substring(deduped.materialize(), input_ds, cfg)
    return deduped


def verify_candidates(
    edges: ray.data.Dataset, signatures: ray.data.Dataset, cfg: DedupConfig
) -> ray.data.Dataset:
    attached = verify.attach_signatures(edges, signatures, cfg)
    return verify.verify_edges(attached, cfg, has_pixels=True)


def fast_verified_edges(
    signatures: ray.data.Dataset,
    cfg: DedupConfig,
    input_ds: ray.data.Dataset | None,
    sig_ref,
    substr_buckets: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Fused verified-edge fast path ('grams' mode, broadcast tier): the
    pairing kernel exchanges 18-byte (id-hash, id-hash, prio, sc) rows
    instead of id strings, the pair dedupe runs over those slim rows, and
    ONE gather against the broadcast signature index resolves the strings
    AND applies the verify_edges signal checks — replacing the separate
    exact-edges stage, the two attach joins and the verify pass of the
    string path. Semantics match ``verify_candidates(build_edges(...))``:
    same bucket families (exact content-key included), same trusted kinds,
    same Jaccard/Hamming OR-checks."""

    def bucket_src() -> ray.data.Dataset:
        b = signatures.map_batches(
            lsh.ExplodeBands(cfg, families=("minhash", "phash", "simhash",
                                            "exact")),
            batch_format="pyarrow", batch_size=cfg.text_batch_size,
        )
        if substr_buckets is not None:
            # prefetched (already-materialized) gram buckets: the union
            # reuses their blocks, no recompute
            return b.union(substr_buckets)
        if input_ds is not None:
            from deduplication_ray.stages.substring import substring_buckets as _sb

            b = b.union(_sb(input_ds, cfg))
        return b

    pairs = lsh.slim_pairs_from_buckets(bucket_src(), cfg)
    deduped = lsh.dedupe_slim_pairs(pairs, cfg)
    if isinstance(sig_ref, verify.DeferredSignatureIndex):
        sig_ref = sig_ref.get()  # index build overlapped the pairing chain
    ve = verify.resolve_and_verify_pairs(deduped, sig_ref, cfg,
                                         has_pixels=True)
    return ve.map_batches(lambda t: t.select(["src", "dst", "kind"]),
                          batch_format="pyarrow")


def finalize_clusters(
    input_ids: ray.data.Dataset, labels: ray.data.Dataset, cfg: DedupConfig
) -> ray.data.Dataset:
    """clusters(image_id, cluster_id): propagated label, else self (singleton).

    Left join realized as: ids LEFT JOIN labels ON image_id == node.
    """
    from deduplication_ray.stages.join import lookup_join

    j = lookup_join(
        input_ids,
        labels.rename_columns({"node": "image_id"}),
        on=["image_id"],
        cfg=cfg,
        how="left",
    )

    def fill(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # all-null batches come back null-typed from the pandas merge
        lab = pc.coalesce(t["label"].cast(pa.string()), t["image_id"])
        return pa.table({"image_id": t["image_id"], "cluster_id": lab})

    return j.map_batches(fill, batch_format="pyarrow")


def _edge_rows(run: CheckpointedRun, vedges: ray.data.Dataset) -> int:
    m = storage.read_manifest(run.stage_dir("verified_edges")) or {}
    n = m.get("rows")
    return int(n) if n is not None else vedges.count()


def checkpointed_components(
    run: CheckpointedRun,
    edges_ds: ray.data.Dataset,
    cfg: DedupConfig,
    upstream: str = "verified_edges",
    edge_rows: int | None = None,
) -> ray.data.Dataset:
    """Shared union-find driver (used by run_pipeline AND incremental
    ingest): size-dispatched — one local vectorized pass below
    ``cfg.local_uf_limit`` edges, distributed hash-min rounds above — with
    per-round ``labels_r{k}`` checkpoints and latest-round fast resume."""
    start_round = run.latest_labels_round()
    if edge_rows is None:
        edge_rows = edges_ds.count()
    if start_round < 0 and edge_rows <= cfg.local_uf_limit:
        return run.run_stage(
            "labels_r0", lambda: unionfind.local_components(edges_ds),
            [upstream])
    eb = unionfind.bidirectional(edges_ds).materialize()
    if start_round >= 0:
        labels = storage.read_table(run.stage_dir(f"labels_r{start_round}"))
        run.skipped.extend(f"labels_r{k}" for k in range(start_round + 1))
    else:
        labels = unionfind.init_labels(edges_ds, cfg.num_partitions).materialize()
    prev_hash = unionfind.label_state_hash(labels)
    rnd = start_round
    while True:
        rnd += 1
        if rnd >= cfg.max_rounds + 1:
            raise RuntimeError("union-find exceeded max_rounds")
        new = run.run_stage(
            f"labels_r{rnd}",
            lambda: unionfind.propagate_round(labels, eb, cfg),
            [f"labels_r{rnd - 1}" if rnd else upstream])
        new_hash = unionfind.label_state_hash(new)
        labels = new
        if new_hash == prev_hash:
            return labels
        prev_hash = new_hash


def run_pipeline(
    input_path: str,
    run_dir: str,
    cfg: DedupConfig | None = None,
    input_ds: ray.data.Dataset | None = None,
    strict_resume: bool = False,
) -> dict:
    """Execute (or resume) the full dedup DAG; returns stage metrics.

    Outputs under run_dir: signatures/ edges/ verified_edges/ labels_r{k}/
    clusters/ representatives/ assignments/ each with a lineage manifest.
    ``strict_resume`` (the CLI ``resume`` verb) refuses stale-config
    checkpoints; the default recomputes them.
    """
    cfg = cfg or DedupConfig()
    from deduplication_ray.stages.tuning import apply_context_tuning

    apply_context_tuning()
    run = CheckpointedRun(run_dir, cfg, strict_resume=strict_resume)

    def read_input() -> ray.data.Dataset:
        if input_ds is not None:
            return input_ds
        return storage.read_table(input_path)

    # Overlap the gram-fingerprint bucket build (captions only — independent
    # of the signature stage) with the signature decode below: the two
    # largest map stages otherwise run back-to-back with a barrier between
    # them, and the multi-core legs idle through each other's straggler
    # tails. A 1-core run is unaffected (work serializes either way); at 4+
    # cores the overlap fills the barrier gaps. Fast path only — the string
    # path unions the lazy stream as before.
    _substr_prefetch: dict = {}
    _substr_thread = None
    if (cfg.substring_rendezvous == "grams" and not cfg.use_suffix_array
            and not run.is_complete("verified_edges")):
        import threading

        from deduplication_ray.stages.substring import substring_buckets

        def _read_captions_early() -> ray.data.Dataset:
            if input_ds is not None:
                return input_ds.select_columns(["image_id", "caption"])
            return storage.read_table(input_path,
                                      columns=["image_id", "caption"])

        def _prefetch() -> None:
            try:
                _substr_prefetch["ds"] = substring_buckets(
                    _read_captions_early(), cfg).materialize()
            except BaseException as exc:  # surfaced on join in make_vedges
                _substr_prefetch["err"] = exc

        _substr_thread = threading.Thread(target=_prefetch, daemon=True)
        _substr_thread.start()

    if input_ds is None and os.path.isdir(input_path):
        # partition-level lineage: signatures computed per input-shard group,
        # each group committed atomically — a killed run resumes at the first
        # unfinished shard group (T14)
        files = storage.dataset_files(input_path)
        sigs = run.run_stage_sharded(
            "signatures",
            files,
            lambda fs: compute_signatures(storage.read_table(fs), cfg),
            upstream=["input"],
        )
    else:
        sigs = run.run_stage(
            "signatures", lambda: compute_signatures(read_input(), cfg), ["input"]
        )

    def read_captions() -> ray.data.Dataset:
        # substring passes need ONLY (image_id, caption): prune at the read
        # so the edges stage never re-scans the image payload bytes
        if input_ds is not None:
            return input_ds.select_columns(["image_id", "caption"])
        return storage.read_table(input_path, columns=["image_id", "caption"])

    # edges are built AND verified inside one checkpoint stage: the raw
    # candidate stream is transient (only verified survivors are worth a
    # checkpoint write), which drops one full materialize+write+re-read
    # barrier from every run
    def make_vedges() -> ray.data.Dataset:
        deferred_idx = None
        if cfg.substring_rendezvous == "grams" and not cfg.use_suffix_array:
            deferred_idx = verify.DeferredSignatureIndex(sigs, cfg)
        pre_sb = None
        if _substr_thread is not None:
            _substr_thread.join()
            if "err" in _substr_prefetch:
                raise _substr_prefetch["err"]
            pre_sb = _substr_prefetch.get("ds")
        if deferred_idx is not None and deferred_idx.eligible:
            ve = fast_verified_edges(sigs, cfg, read_captions(), deferred_idx,
                                     substr_buckets=pre_sb)
        else:
            ve = verify_candidates(
                build_edges(sigs, cfg, read_captions(),
                            substr_buckets=pre_sb), sigs, cfg)
        # opt-in extra pixel-identity channels: their pairs are already
        # verified by construction (min relative-orientation / valid-window
        # Hamming), so they join AFTER the pHash/SimHash verify — which
        # would reject them, that blindness being the point. Duplicate
        # edges across channels are harmless to min-label propagation.
        if cfg.orientation_channel:
            from deduplication_ray.pipelines.orientation import (
                orientation_edges_from_signatures)

            ve = ve.union(orientation_edges_from_signatures(sigs, cfg))
        if cfg.crop_channel:
            from deduplication_ray.pipelines.cropdup import (
                crop_edges_from_signatures)

            ve = ve.union(crop_edges_from_signatures(sigs, cfg))
        return ve

    vedges = run.run_stage("verified_edges", make_vedges, ["signatures"])

    # --- union-find with per-round checkpoints (mid-shuffle resume) ---
    if run.is_complete("clusters"):
        labels = None  # not needed
    else:
        labels = checkpointed_components(
            run, vedges, cfg, edge_rows=_edge_rows(run, vedges))

    if cfg.skip_undecodable:
        # dropped-undecodable rows must not resurface as singleton clusters:
        # the id universe is what SURVIVED the signature stage
        ids = sigs.select_columns(["image_id"])
    else:
        ids = storage.read_table(input_path, columns=["image_id"]) \
            if input_ds is None else input_ds.select_columns(["image_id"])
    clusters = run.run_stage(
        "clusters", lambda: finalize_clusters(ids, labels, cfg), ["labels"]
    )

    # representatives: one row per cluster (min image_id IS the cluster_id) —
    # semi-join the full input on cluster_id == image_id (R12 analog)
    def reps() -> ray.data.Dataset:
        from deduplication_ray.functions import hashing as H
        from deduplication_ray.stages.groupred import hash_grouped_reduce
        from deduplication_ray.stages.join import lookup_join

        schema = pa.schema([("cluster_id", pa.string()),
                            ("cluster_size", pa.int64())])

        def red(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            out = df.groupby("cluster_id", sort=False).size() \
                .rename("cluster_size").reset_index()
            # explicit schema: empty frames round-trip to Arrow null type
            return pa.Table.from_pandas(out, preserve_index=False).cast(schema)

        # group-per-row cardinality (mostly singleton clusters): hash-
        # partitioned vectorized reduce, not Ray aggregate
        reps_ids = hash_grouped_reduce(
            clusters.select_columns(["cluster_id"]),
            lambda t: H.hash_bytes_array(
                t["cluster_id"].combine_chunks().cast(pa.string())),
            red,
            cfg.num_partitions,
        ).rename_columns({"cluster_id": "image_id"})
        full = read_input()
        return lookup_join(full, reps_ids, on=["image_id"], cfg=cfg)

    representatives = run.run_stage("representatives", reps, ["clusters"])

    run.flush()  # manifests must exist before rows are read below
    metrics = {
        "config_hash": cfg.config_hash(),
        "stages_executed": run.executed,
        "stages_resumed": run.skipped,
        "stage_seconds": run.timings,
        "rows": {
            s: (storage.read_manifest(run.stage_dir(s)) or {}).get("rows")
            for s in ("signatures", "verified_edges", "clusters", "representatives")
        },
    }
    storage.write_manifest(run.run_dir, {"stage": "run", "complete": True,
                                         "config_hash": cfg.config_hash(),
                                         "metrics": metrics})
    return metrics


def _channel_clusters(
    sigs: ray.data.Dataset,
    cfg: DedupConfig,
    band_lo: int,
    band_hi: int,
    exact_key: tuple | None = None,
    has_pixels: bool = True,
) -> ray.data.Dataset:
    """Clusters over ONE candidate-family slice of the shared bucket stream.

    ``ExplodeBands(families=...)`` emits ONLY the selected band namespaces
    (pixel bands = pHash+SimHash multi-index, caption bands = MinHash LSH),
    so non-selected families never exist — no wasted emission, nothing to
    filter before the groupby shuffle. The band-range filter stays as a
    cheap invariant guard.
    """
    # range-OVERLAP, not base containment: a sub-family slice whose window
    # excludes the namespace base must still emit that family's bands
    fam = tuple(f for f, base, width in (("minhash", 0, cfg.bands),
                                         ("phash", lsh.BAND_PHASH, 4),
                                         ("simhash", lsh.BAND_SIMHASH, 4))
                if base < band_hi and band_lo < base + width)
    buckets = sigs.map_batches(
        lsh.ExplodeBands(cfg, families=fam), batch_format="pyarrow",
        batch_size=cfg.text_batch_size,
    ).filter(expr=f"band >= {band_lo} and band < {band_hi}")
    edges = lsh.edges_from_buckets(buckets, cfg)
    if exact_key is not None:
        edges = edges.union(lsh.exact_edges(sigs, cfg, key=exact_key))
    edges = lsh.dedupe_edges(edges)
    attached = verify.attach_signatures(edges, sigs, cfg)
    ve = verify.verify_edges(attached, cfg, has_pixels=has_pixels).materialize()
    labels = unionfind.connected_components(ve, cfg)
    return finalize_clusters(sigs.select_columns(["image_id"]), labels, cfg)


def _self_representatives(clusters: ray.data.Dataset) -> ray.data.Dataset:
    """Rows whose propagated label IS their own id — the tier's survivors
    (hash-min propagation converges every cluster to its min id)."""

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t["image_id"], t["cluster_id"])) \
            .select(["image_id"])

    return clusters.map_batches(keep, batch_format="pyarrow")


def tier_dedup_report(input_ds: ray.data.Dataset, cfg: DedupConfig | None = None):
    """TIERED image-dedup funnel — the production curation shape (cheap
    exact tiers first, each costlier tier sees only survivors), with
    per-tier attrition reported:

      tier 1  EXACT    collapse identical (decoded-pixel key, caption) rows
                       to the min-image_id representative — the reference's
                       first-occurrence dictionary insert
                       (``/root/reference/src/compressor.c:109-113``) at
                       image granularity;
      tier 2  PIXEL    pHash + SimHash multi-index Hamming near-dup over
                       exact survivors (re-encodes, mild pixel noise);
      tier 3  CAPTION  MinHash-LSH + exact-caption-hash near-dup over pixel
                       survivors (caption paraphrases / shared captions).

    Output: one row per tier — (tier, tier_name, images_in, images_out) —
    the attrition report a curation run publishes. Rows-only check (tiers
    2-3 are iterative); funnel invariants (monotone attrition, tier-1
    parity with the distinct content-key count, >= the one-shot pipeline's
    cluster count since sequential tiers cannot see cross-channel bridges
    through dropped rows) are asserted in
    tests/test_pipeline.py::test_image_tier_dedup_funnel.

    Scale plan: images decode exactly ONCE (the shared signature pass);
    every later tier is a filter + the engine's own bucketed channels over
    the signature table, so no tier re-reads image bytes, and inter-tier
    survivor joins are id-set lookup joins (broadcast below
    ``cfg.broadcast_limit``). The report itself is three rows.
    """
    import pandas as pd

    from deduplication_ray.functions import hashing as H
    from deduplication_ray.stages.groupred import hash_grouped_reduce
    from deduplication_ray.stages.join import lookup_join
    from deduplication_ray.stages.tuning import apply_context_tuning

    cfg = cfg or DedupConfig()
    apply_context_tuning()

    sigs = compute_signatures(input_ds, cfg).materialize()
    n_in = sigs.count()

    # tier 1: exact — min image_id per 128-bit (pixel key, caption hash).
    # Group-per-row key cardinality: hash-partitioned vectorized reduce
    # (the exact_edges regime), not a sort-based Ray aggregate.
    def min_id(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(["ck1", "ck2"], sort=False)["image_id"] \
            .min().reset_index()
        return pa.Table.from_pandas(g[["image_id"]], preserve_index=False) \
            .cast(pa.schema([("image_id", pa.string())]))

    reps1 = hash_grouped_reduce(
        sigs.select_columns(["ck1", "ck2", "image_id"]),
        key_hash=lambda t: H.hash_u64_pair(
            t["ck1"].to_numpy().view(np.uint64),
            t["ck2"].to_numpy().view(np.uint64)),
        reduce_fn=min_id,
        num_parts=cfg.num_partitions,
    )
    s1 = lookup_join(sigs, reps1, on=["image_id"], cfg=cfg).materialize()
    n1 = s1.count()

    # tier 2: pixel near-dup (pHash + SimHash multi-index bands)
    cl2 = _channel_clusters(s1, cfg, lsh.BAND_PHASH, lsh.BAND_SUBSTR)
    s2 = lookup_join(s1, _self_representatives(cl2),
                     on=["image_id"], cfg=cfg).materialize()
    n2 = s2.count()

    # tier 3: caption near-dup (MinHash bands + exact caption hash)
    cl3 = _channel_clusters(s2, cfg, 0, lsh.BAND_PHASH,
                            exact_key=("cap_hash",), has_pixels=False)
    n3 = _self_representatives(cl3).count()

    return pd.DataFrame({
        "tier": [1, 2, 3],
        "tier_name": ["exact", "pixel_near_dup", "caption_near_dup"],
        "images_in": [n_in, n1, n2],
        "images_out": [n1, n2, n3],
    })


def reconstruct(run_dir: str, cfg: DedupConfig | None = None) -> ray.data.Dataset:
    """Decompress analog (R17, ``compressor.c:320-339``): rebuild a full table
    view by joining assignments (clusters) back to representative rows.

    Returns a Dataset with one row per original image_id carrying its
    cluster representative's payload columns.
    """
    from deduplication_ray.stages.join import lookup_join

    cfg = cfg or DedupConfig()
    clusters = storage.read_table(f"{run_dir}/clusters")
    reps = storage.read_table(f"{run_dir}/representatives")
    return lookup_join(
        clusters,
        reps.rename_columns({"image_id": "cluster_id"}),
        on=["cluster_id"],
        cfg=cfg,
    )


def modality_agreement(input_ds: ray.data.Dataset,
                       cfg: DedupConfig | None = None):
    """Cross-modal drift probe for the image+caption graft cell: cluster the
    corpus twice — once from the PIXEL channels alone (pHash + SimHash
    multi-index bands) and once from the CAPTION channels alone (MinHash
    LSH bands + exact caption hash) — and report pair-level agreement as
    the exact Adjusted Rand Index (``evaluate.cluster_agreement``; pair
    sets never materialized). A high ARI says captions alone reproduce the
    pixel dedup decisions (cheap-channel-first tiering is safe); a low one
    says the modalities catch different duplicate families and the fused
    engine is doing real work. One signature pass feeds both clusterings —
    pixels are decoded exactly once."""
    from deduplication_ray.pipelines.evaluate import cluster_agreement
    from deduplication_ray.stages.tuning import apply_context_tuning

    cfg = cfg or DedupConfig()
    apply_context_tuning()
    sigs = compute_signatures(input_ds, cfg).materialize()
    pix = _channel_clusters(sigs, cfg, lsh.BAND_PHASH, lsh.BAND_SUBSTR)
    cap = _channel_clusters(sigs, cfg, 0, lsh.BAND_PHASH,
                            exact_key=("cap_hash",), has_pixels=False)
    return cluster_agreement(pix, cap, id_col="image_id")


def keep_best_representatives(clusters: ray.data.Dataset,
                              meta: ray.data.Dataset,
                              cfg: DedupConfig | None = None):
    """Quality-aware representative election — the image-payload "keep the
    best copy" curation policy: within each near-dup cluster, keep the
    member with the largest pixel area (w x h), ties to the smaller
    image_id. Replaces the stability-oriented min-id election when output
    quality matters (the highest-resolution original wins over re-encoded
    or downscaled copies). ``meta`` is (image_id, w, h) — prune the read
    to those columns; pixels never move.

    Plan: one lookup join attaches the areas to the cluster table, then a
    hash-grouped vectorized argmax per cluster_id (one lexsort per
    partition, `groupred.hash_grouped_reduce`) — the only exchange is
    (id, label, area) rows. Output (cluster_id, best_id, best_px,
    n_members)."""
    import pandas as pd

    from deduplication_ray.functions import hashing as H
    from deduplication_ray.stages.groupred import hash_grouped_reduce
    from deduplication_ray.stages.join import lookup_join

    cfg = cfg or DedupConfig()

    def with_px(t: pa.Table) -> pa.Table:
        px = (t["w"].cast(pa.int64()).to_numpy()
              * t["h"].cast(pa.int64()).to_numpy())
        return pa.table({"image_id": t["image_id"],
                         "cluster_id": t["cluster_id"],
                         "px": pa.array(px)})

    j = lookup_join(clusters, meta, on=["image_id"], cfg=cfg) \
        .map_batches(with_px, batch_format="pyarrow")

    def elect(t: pa.Table) -> pa.Table:
        cl = t["cluster_id"].to_pandas().to_numpy()
        ids = t["image_id"].to_pandas().to_numpy()
        px = t["px"].to_numpy()
        codes, uniq = pd.factorize(cl, sort=False)
        order = np.lexsort((ids, -px, codes))   # per cluster: px desc, id asc
        c_s = codes[order]
        first = np.concatenate([[True], c_s[1:] != c_s[:-1]]) \
            if len(c_s) else np.zeros(0, bool)
        win = order[first]
        return pa.table({
            "cluster_id": pa.array(cl[win], pa.string()),
            "best_id": pa.array(ids[win], pa.string()),
            "best_px": pa.array(px[win]),
            "n_members": pa.array(np.bincount(codes, minlength=len(uniq))
                                  [c_s[first]].astype(np.int64)),
        })

    return hash_grouped_reduce(
        j,
        key_hash=lambda t: H.hash_bytes_array(
            t["cluster_id"].combine_chunks()
            if isinstance(t["cluster_id"], pa.ChunkedArray)
            else t["cluster_id"]),
        reduce_fn=elect,
        num_parts=cfg.num_partitions,
    )


def keep_sharpest_representatives(clusters: ray.data.Dataset,
                                  input_ds: ray.data.Dataset,
                                  cfg: DedupConfig | None = None):
    """Sharpness-aware representative election — the quality policy the
    pixel-area election (``keep_best_representatives``) cannot express: an
    interpolated UPSCALE has more pixels but less high-frequency energy
    than its source, so area keeps the blurry enlargement while the
    Laplacian score (``codecs.laplacian_sharpness_milli``) keeps the
    original. Ties (exact copies) break to the smaller image_id.

    Scale plan: only MULTI-member clusters decode — the cluster table is
    counted first and singleton rows (the vast majority of a deduped
    corpus) never touch pixels; the dup slice decodes once per distinct
    payload in a stateless map_batches pass and the election is one
    hash-grouped vectorized argmax. Output (cluster_id, best_id,
    sharp_milli, n_members)."""
    import pandas as pd

    from ray.data.aggregate import Count

    from deduplication_ray.functions import codecs as C
    from deduplication_ray.functions import hashing as H
    from deduplication_ray.stages.groupred import hash_grouped_reduce
    from deduplication_ray.stages.join import lookup_join

    cfg = cfg or DedupConfig()
    sizes = clusters.groupby("cluster_id").aggregate(
        Count(alias_name="n_members"))
    multi = sizes.filter(expr="n_members >= 2")
    members = lookup_join(clusters, multi, on=["cluster_id"], cfg=cfg)
    rows = lookup_join(
        input_ds.select_columns(["image_id", "bytes", "fmt", "w", "h"]),
        members, on=["image_id"], cfg=cfg)

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"cluster_id": pa.array([], pa.string()),
                             "image_id": pa.array([], pa.string()),
                             "n_members": pa.array([], pa.int64()),
                             "sharp_milli": pa.array([], pa.int64())})
        payloads = (t["bytes"].combine_chunks()
                    if isinstance(t["bytes"], pa.ChunkedArray) else t["bytes"])
        pbuf, poffs = H._arrow_flat_buffer(payloads)
        fmts = t["fmt"].to_pylist()
        ws = t["w"].to_numpy()
        hs = t["h"].to_numpy()
        # batch-local distinct-payload probe (the signature stage's
        # dict_find analog): exact-copy clusters — the common case here —
        # score each identical (payload, fmt, w, h) exactly once
        dk = (H.hash_bytes_array(payloads)
              ^ H.hash_bytes_array(t["fmt"])
              ^ (ws.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
              ^ (hs.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)))
        uniq, inv = np.unique(dk, return_inverse=True)
        first = np.zeros(len(uniq), np.int64)
        first[inv[::-1]] = np.arange(t.num_rows - 1, -1, -1)
        scores = np.empty(len(uniq), np.int64)
        for u, i in enumerate(first):
            img = C.decode_image(bytes(pbuf[poffs[i]:poffs[i + 1]]),
                                 fmts[i], int(ws[i]), int(hs[i]))
            scores[u] = C.laplacian_sharpness_milli(C.to_grayscale(img))
        out = scores[inv]
        return pa.table({"cluster_id": t["cluster_id"],
                         "image_id": t["image_id"],
                         "n_members": t["n_members"].cast(pa.int64()),
                         "sharp_milli": pa.array(out)})

    scored = rows.map_batches(score, batch_format="pyarrow",
                              batch_size=cfg.batch_size)

    def elect(t: pa.Table) -> pa.Table:
        cl = t["cluster_id"].to_pandas().to_numpy()
        ids = t["image_id"].to_pandas().to_numpy()
        sm = t["sharp_milli"].to_numpy()
        nm = t["n_members"].to_numpy()
        codes, _ = pd.factorize(cl, sort=False)
        order = np.lexsort((ids, -sm, codes))
        c_s = codes[order]
        first = np.concatenate([[True], c_s[1:] != c_s[:-1]]) \
            if len(c_s) else np.zeros(0, bool)
        win = order[first]
        return pa.table({
            "cluster_id": pa.array(cl[win], pa.string()),
            "best_id": pa.array(ids[win], pa.string()),
            "sharp_milli": pa.array(sm[win]),
            "n_members": pa.array(nm[win]),
        })

    return hash_grouped_reduce(
        scored,
        key_hash=lambda t: H.hash_bytes_array(
            t["cluster_id"].combine_chunks()
            if isinstance(t["cluster_id"], pa.ChunkedArray)
            else t["cluster_id"]),
        reduce_fn=elect,
        num_parts=cfg.num_partitions,
    )
