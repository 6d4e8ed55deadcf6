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
from deduplication_ray.stages.substring import substring_edges
from deduplication_ray.state import unionfind


def text_signatures(
    ds: ray.data.Dataset, cfg: DedupConfig, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    return ds.map_batches(
        CaptionSignatures,
        fn_constructor_kwargs={"cfg": cfg, "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
        batch_size=cfg.text_batch_size,
        concurrency=cfg.sig_concurrency,
        num_cpus=1,
    )


def text_dedup_clusters(
    ds: ray.data.Dataset,
    cfg: DedupConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_substring: bool = True,
) -> ray.data.Dataset:
    """(id, text) table -> clusters(doc_id, cluster_id) via the full engine."""
    cfg = cfg or DedupConfig()
    sigs = text_signatures(ds, cfg, id_col, text_col).materialize()
    ex = lsh.exact_edges(sigs, cfg, key=("cap_hash",))
    cand = lsh.candidate_edges(sigs, cfg)
    edges = ex.union(cand)
    if with_substring:
        edges = edges.union(substring_edges(ds, cfg, id_col, text_col))
    edges = lsh.dedupe_edges(edges).materialize()

    attached = verify.attach_signatures(edges, sigs, cfg, cols=["minhash"])
    vedges = verify.verify_edges(attached, cfg, has_pixels=False).materialize()

    labels = unionfind.connected_components(vedges, cfg)

    ids = ds.select_columns([id_col]).map_batches(
        lambda t: pa.table({"image_id": t[id_col].cast(pa.string())}),
        batch_format="pyarrow",
    )
    j = ids.join(
        labels,
        join_type="left_outer",
        num_partitions=cfg.num_partitions,
        on=("image_id",),
        right_on=("node",),
    )

    def fill(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lab = pc.coalesce(t["label"], t["image_id"])
        return pa.table({"doc_id": t["image_id"], "cluster_id": lab})

    return j.map_batches(fill, batch_format="pyarrow")
