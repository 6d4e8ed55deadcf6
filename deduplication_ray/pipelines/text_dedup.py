"""Text near-dup pipeline: the flagship DAG specialized to (id, text) tables.

Same engine as image_dedup minus the pixel path — used for the ``documents``
testdata table and as ``__ray_entry__.entry()``'s flagship run. Exercises:
CaptionSignatures actor pool -> exact caption dedup + MinHash-LSH candidates
+ suffix-array/winnowing substring edges -> Jaccard verification ->
distributed union-find -> clusters.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from deduplication_ray.config import DedupConfig
from deduplication_ray.stages import lsh, verify
from deduplication_ray.stages.signatures import CaptionSignatures
from deduplication_ray.state import unionfind


def text_signatures(
    ds: ray.data.Dataset, cfg: DedupConfig, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    if cfg.sig_concurrency is None:  # task mode: state ships in the closure
        return ds.map_batches(
            CaptionSignatures(cfg, id_col, text_col),
            batch_format="pyarrow",
            batch_size=cfg.text_batch_size,
        )
    return ds.map_batches(
        CaptionSignatures,
        fn_constructor_kwargs={"cfg": cfg, "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
        batch_size=cfg.text_batch_size,
        concurrency=cfg.sig_concurrency,
        num_cpus=1,
    )



def text_edge_dag(caps: "ray.data.Dataset", sigs: "ray.data.Dataset",
                  cfg: DedupConfig) -> "ray.data.Dataset":
    """The text candidate/verify DAG over a CANONICAL (image_id, caption)
    table: MinHash band buckets + substring-gram buckets + cap_hash exact
    stars (+ optional suffix-array edges), deduped, winnow-verified when
    configured, signature-attached and Jaccard-verified. ONE implementation
    shared by the lazy ``text_dedup_clusters`` and the checkpointed
    ``run_text_pipeline`` so the two plans cannot drift."""
    from deduplication_ray.stages.substring import (
        substring_buckets, suffix_array_edges)

    # Fused slim-pair fast path (the image flagship's r4 treatment, ported):
    # 'grams' mode + broadcast-tier signatures -> the pairing kernel
    # exchanges 18-byte id-hash rows, the exact caption family rides the
    # SAME bucket stream (cap_hash exact bands), and ONE gather against the
    # broadcast signature index resolves strings + applies the Jaccard
    # verify — replacing the string pairing, the separate exact_edges stage,
    # the two attach joins and the verify pass (their four materialize
    # barriers were the text engine's scaling drag: stragglers idle 32 CPUs
    # at every barrier). Semantics match the string path below: same bucket
    # families, same trusted kinds, same jaccard_tau check.
    if cfg.substring_rendezvous == "grams" and not cfg.use_suffix_array:
        deferred = verify.DeferredSignatureIndex(sigs, cfg)
        if deferred.eligible:
            buckets = sigs.map_batches(
                lsh.ExplodeBands(cfg, families=("minhash", "exact")),
                batch_format="pyarrow", batch_size=cfg.text_batch_size,
            ).union(substring_buckets(caps, cfg))
            pairs = lsh.dedupe_slim_pairs(
                lsh.slim_pairs_from_buckets(buckets, cfg), cfg)
            ve = verify.resolve_and_verify_pairs(pairs, deferred.get(), cfg,
                                                 has_pixels=False)
            return ve.map_batches(
                lambda t: t.select(["src", "dst", "kind"]),
                batch_format="pyarrow")

    buckets = sigs.map_batches(lsh.ExplodeBands(cfg), batch_format="pyarrow",
                               batch_size=cfg.text_batch_size)
    buckets = buckets.union(substring_buckets(caps, cfg))
    needs_verify = cfg.substring_rendezvous == "winnow"
    edges = lsh.edges_from_buckets(buckets, cfg).union(
        lsh.exact_edges(sigs, cfg, key=("cap_hash",)))
    if cfg.use_suffix_array:
        edges = edges.union(suffix_array_edges(caps, cfg))
    edges = lsh.dedupe_edges(edges, keep_sc=needs_verify).materialize()
    if needs_verify:
        from deduplication_ray.stages.substring import (
            split_and_verify_substring)

        edges = split_and_verify_substring(edges, caps, cfg).materialize()
    attached = verify.attach_signatures(edges, sigs, cfg, cols=["minhash"])
    return verify.verify_edges(attached, cfg, has_pixels=False)


def text_dedup_clusters(
    ds: ray.data.Dataset,
    cfg: DedupConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_substring: bool = True,
) -> ray.data.Dataset:
    """(id, text) table -> clusters(doc_id, cluster_id) via the full engine."""
    cfg = cfg or DedupConfig()
    from deduplication_ray.stages.tuning import apply_context_tuning

    apply_context_tuning()
    caps = as_engine_table(ds, id_col, text_col)
    sigs = text_signatures(caps, cfg, "image_id", "caption").materialize()
    if with_substring:
        vedges = text_edge_dag(caps, sigs, cfg).materialize()
    else:
        edges = lsh.dedupe_edges(
            lsh.edges_from_buckets(
                sigs.map_batches(lsh.ExplodeBands(cfg),
                                 batch_format="pyarrow",
                                 batch_size=cfg.text_batch_size), cfg)
            .union(lsh.exact_edges(sigs, cfg, key=("cap_hash",)))).materialize()
        attached = verify.attach_signatures(edges, sigs, cfg, cols=["minhash"])
        vedges = verify.verify_edges(attached, cfg, has_pixels=False).materialize()

    labels = unionfind.connected_components(vedges, cfg)

    ids = ds.select_columns([id_col]).map_batches(
        lambda t: pa.table({"image_id": t[id_col].cast(pa.string())}),
        batch_format="pyarrow",
    )
    from deduplication_ray.stages.join import lookup_join

    j = lookup_join(
        ids,
        labels.rename_columns({"node": "image_id"}),
        on=["image_id"],
        cfg=cfg,
        how="left",
    )

    def fill(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # all-null batches come back null-typed from the pandas merge
        lab = pc.coalesce(t["label"].cast(pa.string()), t["image_id"])
        return pa.table({"doc_id": t["image_id"], "cluster_id": lab})

    return j.map_batches(fill, batch_format="pyarrow")


def as_engine_table(ds: ray.data.Dataset, id_col: str = "doc_id",
                    text_col: str = "text") -> ray.data.Dataset:
    """(id, text) table -> the engine's canonical (image_id, caption) shape,
    so the checkpoint/incremental machinery (written against the canonical
    columns) runs unchanged over documents."""
    def rn(t: pa.Table) -> pa.Table:
        return pa.table({"image_id": t[id_col].cast(pa.string()),
                         "caption": t[text_col]})

    return ds.map_batches(rn, batch_format="pyarrow")


def run_text_pipeline(input_path: str, run_dir: str,
                      cfg: DedupConfig | None = None,
                      id_col: str = "doc_id", text_col: str = "text",
                      strict_resume: bool = False) -> dict:
    """Checkpointed text dedup run: same DAG as ``text_dedup_clusters`` but
    every stage persists under ``run_dir`` with lineage (signatures,
    verified_edges, union-find rounds, clusters) — a killed run resumes, and
    the signature/cluster checkpoints feed
    ``incremental.ingest_delta(mode='text')`` exactly like the image run's
    feed the image ingest. Returns stage metrics."""
    from deduplication_ray.pipelines.image_dedup import (
        checkpointed_components, finalize_clusters)
    from deduplication_ray.sources import storage
    from deduplication_ray.stages.tuning import apply_context_tuning
    from deduplication_ray.state.checkpoint import CheckpointedRun

    cfg = cfg or DedupConfig()
    apply_context_tuning()
    run = CheckpointedRun(run_dir, cfg, strict_resume=strict_resume)

    def caps() -> ray.data.Dataset:
        return as_engine_table(
            storage.read_table(input_path, columns=[id_col, text_col]),
            id_col, text_col)

    sigs = run.run_stage(
        "signatures",
        lambda: text_signatures(caps(), cfg, "image_id", "caption"),
        ["input"])

    def build() -> ray.data.Dataset:
        return text_edge_dag(caps(), sigs, cfg)

    vedges = run.run_stage("verified_edges", build, ["signatures"])

    if run.is_complete("clusters"):
        labels = None
    else:
        labels = checkpointed_components(run, vedges.materialize(), cfg)

    ids = sigs.select_columns(["image_id"])
    run.run_stage("clusters",
                  lambda: finalize_clusters(ids, labels, cfg), ["labels"])

    run.flush()  # manifests must exist before rows are read below
    metrics = {
        "config_hash": cfg.config_hash(),
        "stages_executed": run.executed,
        "stages_resumed": run.skipped,
        "stage_seconds": run.timings,
        "rows": {
            s: (storage.read_manifest(run.stage_dir(s)) or {}).get("rows")
            for s in ("signatures", "verified_edges", "clusters")
        },
    }
    storage.write_manifest(run.run_dir, {"stage": "run", "complete": True,
                                         "config_hash": cfg.config_hash(),
                                         "metrics": metrics})
    return metrics
