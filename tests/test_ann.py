"""Similarity search: brute-force top-k sanity + LSH-bucketed dup pairs on
planted near-identical embeddings."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def emb_dir(ray_session, tmp_path_factory):
    """Synthetic embeddings table with planted near-duplicate pairs."""
    import pyarrow.parquet as pq

    rng = np.random.default_rng(11)
    n, d = 600, 64
    base = rng.standard_normal((n, d)).astype(np.float32)
    # plant 40 near-identical pairs: rows 2i+1 = tiny perturbation of 2i
    for i in range(40):
        base[2 * i + 1] = base[2 * i] + rng.standard_normal(d).astype(np.float32) * 0.01
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([v.tolist() for v in base],
                              type=pa.list_(pa.float32())),
        "label": pa.array(np.zeros(n, dtype=np.int32)),
    })
    d_out = tmp_path_factory.mktemp("emb")
    pq.write_table(t, str(d_out / "embeddings.parquet"))
    return str(d_out), base


def test_brute_force_topk_matches_numpy(emb_dir):
    from deduplication_ray.pipelines.ann import brute_force_topk

    d, base = emb_dir
    out = brute_force_topk(d, n_queries=3, k=4).to_pandas()
    m = base / np.linalg.norm(base, axis=1, keepdims=True)
    sims = m @ m[:3].T
    for q in range(3):
        s = sims[:, q].copy()
        s[q] = -np.inf
        expect = np.argsort(-s, kind="stable")[:4]
        got = out[out.q_id == q].sort_values("rank")["n_id"].to_numpy()
        assert set(got) == set(expect), (q, got, expect)


def test_embedding_dup_pairs_finds_planted(emb_dir):
    from deduplication_ray.pipelines.ann import embedding_dup_pairs

    d, base = emb_dir
    m = base / np.linalg.norm(base, axis=1, keepdims=True)
    planted = {(2 * i, 2 * i + 1) for i in range(40)}
    # exact path (default dispatch) AND the LSH scale path (forced via
    # exact_limit=0) must both recover the planted pairs
    for exact_limit in (None, 0):
        kw = {} if exact_limit is None else {"exact_limit": exact_limit}
        pairs = embedding_dup_pairs(d, cos_min=0.98, **kw).to_pandas()
        found = {tuple(sorted((int(a), int(b))))
                 for a, b in zip(pairs.src.astype(int), pairs.dst.astype(int))}
        recall = len(found & planted) / len(planted)
        assert recall >= 0.95, (exact_limit, recall, len(found))
        # no false positives: every found pair really has cosine >= 0.98
        for a, b in found:
            assert float(m[a] @ m[b]) >= 0.975


def test_lsh_topk_recall_vs_brute_force(emb_dir):
    """The LSH-bucketed scale path must recover most of the exact top-k for
    near-duplicate-heavy queries (planted pairs bucket together)."""
    from deduplication_ray.pipelines.ann import brute_force_topk, lsh_topk

    d, base = emb_dir
    exact = brute_force_topk(d, n_queries=5, k=3).to_pandas()
    approx = lsh_topk(d, n_queries=5, k=3).to_pandas()
    # rank-1 neighbors of the planted-query rows must be found
    for q in exact.q_id.unique():
        top1 = exact[(exact.q_id == q) & (exact['rank'] == 1)].n_id.iloc[0]
        got = set(approx[approx.q_id == q].n_id)
        if int(q) % 2 == 0 and int(q) < 80:  # planted near-identical partner
            assert top1 in got, (q, top1, got)


def test_ivf_topk_recall_on_planted(emb_dir):
    """IVF must put near-identical planted partners in the same cell: the
    rank-1 neighbor of every planted-query row must be recovered."""
    from deduplication_ray.pipelines.ann import brute_force_topk, ivf_topk

    d, base = emb_dir
    exact = brute_force_topk(d, n_queries=5, k=3).to_pandas()
    approx = ivf_topk(d, n_queries=5, k=3, with_recall=False).to_pandas()
    refined = ivf_topk(d, n_queries=5, k=3, with_recall=False,
                       refine_iters=3).to_pandas()
    for q in exact.q_id.unique():
        top1 = exact[(exact.q_id == q) & (exact['rank'] == 1)].n_id.iloc[0]
        got = set(approx[approx.q_id == q].n_id)
        if int(q) % 2 == 0 and int(q) < 80:  # planted near-identical partner
            assert top1 in got, (q, top1, got)
            got_r = set(refined[refined.q_id == q].n_id)
            assert top1 in got_r, ("refined", q, top1, got_r)


def test_embedding_kmeans_cells_deterministic_and_consistent(ray_session):
    import numpy as np

    from deduplication_ray.pipelines.ann import embedding_kmeans_cells

    sf = "/root/testdata/sf0.001"
    a = embedding_kmeans_cells(sf).to_pandas().sort_values("vec_id")
    b = embedding_kmeans_cells(sf).to_pandas().sort_values("vec_id")
    assert (a["cell"].to_numpy() == b["cell"].to_numpy()).all()
    assert (a["sim_milli"].to_numpy() == b["sim_milli"].to_numpy()).all()
    # every row assigned, cells within range, and multiple cells in use
    assert len(a) == len(a["vec_id"].unique())
    assert a["cell"].between(0, 15).all()
    assert a["cell"].nunique() >= 4


def test_kmeans_refine_matches_serial_and_improves(ray_session):
    """The distributed Lloyd rounds (per-batch moment partials, driver
    combine) must reproduce a SERIAL full-corpus Lloyd with the same init
    and update rule — centroids allclose, identical assignments — and the
    mean-cosine trace must be non-decreasing (Lloyd's monotonicity)."""
    import pyarrow.parquet as pq

    from deduplication_ray.pipelines.ann import (_bounded_head,
                                                 _kmeans_cosine, _normalize,
                                                 embedding_kmeans_refine,
                                                 kmeans_refine_centroids)
    from deduplication_ray.sources import storage

    sf = "/root/testdata/sf0.001"
    iters, k = 4, 16
    tbl = pq.read_table(f"{sf}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    order = np.argsort(tbl["vec_id"].to_numpy())
    x = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                             for v in tbl["embedding"].to_pylist()]))[order]
    init = _kmeans_cosine(x[:4096], k)

    # serial Lloyd, same update rule
    c = init.astype(np.float64).copy()
    traces = []
    for _ in range(iters):
        sims = x @ c.T
        assign = sims.argmax(axis=1)
        traces.append(float(sims.max(axis=1).mean()))
        for j in range(k):
            sel = x[assign == j]
            if len(sel):
                m = sel.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 1e-12:
                    c[j] = m / n

    ds = storage.read_table(f"{sf}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    dist_c, trace = kmeans_refine_centroids(ds, init, iters=iters)
    np.testing.assert_allclose(dist_c, c, atol=1e-9)
    np.testing.assert_allclose(trace, traces, atol=1e-9)
    # Lloyd monotonicity: mean best-cosine never decreases across rounds
    assert all(b >= a - 1e-12 for a, b in zip(trace, trace[1:]))

    out = embedding_kmeans_refine(sf, n_centroids=k, iters=iters) \
        .to_pandas().sort_values("vec_id")
    serial_assign = (x @ c.T).argmax(axis=1)
    assert (out["cell"].to_numpy() == serial_assign).all()
    assert out["cell"].nunique() >= 4


def test_pq_topk_recall_on_planted(emb_dir):
    """The PQ/ADC scan (8-byte codes, LUT gathers only) must recover the
    rank-1 neighbor of every planted near-identical query: quantizing a
    vector and its tiny perturbation yields (nearly) the same codes."""
    from deduplication_ray.pipelines.ann import brute_force_topk, pq_topk

    d, base = emb_dir
    exact = brute_force_topk(d, n_queries=5, k=3).to_pandas()
    approx = pq_topk(d, n_queries=5, k=3).to_pandas()
    assert approx["recall_vs_brute"].iloc[0] >= 0.5
    for q in exact.q_id.unique():
        top1 = exact[(exact.q_id == q) & (exact['rank'] == 1)].n_id.iloc[0]
        got = set(approx[approx.q_id == q].n_id)
        if int(q) % 2 == 0 and int(q) < 80:  # planted near-identical partner
            assert top1 in got, (q, top1, got)


def test_embedding_semdedup_drops_planted_pairs(emb_dir):
    """Within-cell cosine dedup must collapse (almost) every planted
    near-identical pair to its min-id member — a pair is only missed if
    quantization put its two ends in different cells (the documented
    SemDeDup boundary limitation) — and must never drop an unplanted row
    (random 64-d gaussians sit far below tau)."""
    from deduplication_ray.pipelines.ann import embedding_semdedup

    d, base = emb_dir
    out = embedding_semdedup(d, tau=0.9).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert len(out) == 600
    planted_dropped = sum(
        bool(out.loc[out.vec_id == 2 * i + 1, "keep"].iloc[0] == False
             and out.loc[out.vec_id == 2 * i, "keep"].iloc[0])
        for i in range(40))
    assert planted_dropped >= 36, planted_dropped  # >= 90% of planted pairs
    # unplanted rows (ids >= 80) are all kept
    unplanted = out[out.vec_id >= 80]
    assert unplanted["keep"].all()
    # dup_group is the component min id; kept rows head their own group
    kept = out[out.keep]
    assert (kept["dup_group"] == kept["vec_id"]).all()


def test_embedding_outliers_flags_planted_tail(ray_session, tmp_path_factory):
    """Outlier scoring: a corpus of three tight clusters plus a planted
    far-out tail — every planted outlier must be flagged, the flagged
    fraction must sit in the sketch's rank band around frac, and the
    flag set must be invariant to the input's file layout."""
    import pyarrow.parquet as pq

    from deduplication_ray.pipelines.ann import embedding_outliers

    rng = np.random.default_rng(5)
    n, d, n_out = 800, 32, 40
    centers = rng.standard_normal((3, d)) * 4
    base = (centers[rng.integers(0, 3, n - n_out)]
            + rng.standard_normal((n - n_out, d)) * 0.05)
    tail = rng.standard_normal((n_out, d)) * 4  # nowhere near any center
    m = np.vstack([base, tail]).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([v.tolist() for v in m],
                              type=pa.list_(pa.float32())),
    })
    d1 = tmp_path_factory.mktemp("out1")
    pq.write_table(t, str(d1 / "embeddings.parquet"))
    # same rows, different file layout (2 files, interleaved order)
    d2 = tmp_path_factory.mktemp("out2")
    import os
    os.makedirs(str(d2 / "embeddings.parquet"))
    pq.write_table(t.take(list(range(0, n, 2))),
                   str(d2 / "embeddings.parquet" / "a.parquet"))
    pq.write_table(t.take(list(range(1, n, 2))),
                   str(d2 / "embeddings.parquet" / "b.parquet"))

    frac = 60  # milli
    out = embedding_outliers(str(d1), n_centroids=8, frac_milli=frac) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert len(out) == n
    planted = out[out.vec_id >= n - n_out]
    assert planted["is_outlier"].all(), planted[~planted.is_outlier].head()
    got_frac = out["is_outlier"].mean()
    assert abs(got_frac - frac / 1000) < 0.03, got_frac

    out2 = embedding_outliers(str(d2), n_centroids=8, frac_milli=frac) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_ivfpq_topk_recall_on_planted(emb_dir):
    """IVF-PQ (coarse cells bound WHAT rows are scanned, residual PQ bounds
    WHAT bytes are scanned) must recover the rank-1 neighbor of every
    planted near-identical query that shares its partner's probed cell,
    and overall recall must beat plain PQ's floor."""
    from deduplication_ray.pipelines.ann import brute_force_topk, ivfpq_topk

    d, base = emb_dir
    exact = brute_force_topk(d, n_queries=5, k=3).to_pandas()
    approx = ivfpq_topk(d, n_queries=5, k=3, n_centroids=16,
                        nprobe=8).to_pandas()
    assert approx["recall_vs_brute"].iloc[0] >= 0.5
    for q in exact.q_id.unique():
        top1 = exact[(exact.q_id == q) & (exact['rank'] == 1)].n_id.iloc[0]
        got = set(approx[approx.q_id == q].n_id)
        if int(q) % 2 == 0 and int(q) < 80:  # planted near-identical partner
            assert top1 in got, (q, top1, got)


def test_lsh_topk_multiprobe_supersets_recall(emb_dir):
    """Multi-probe (Hamming-1 query-side probes) must never lose a
    candidate the single-probe path had — recall is monotone in probes."""
    from deduplication_ray.pipelines.ann import lsh_topk

    d, base = emb_dir
    r0 = lsh_topk(d, n_queries=5, k=3, multiprobe=0).to_pandas()
    r1 = lsh_topk(d, n_queries=5, k=3, multiprobe=1).to_pandas()
    assert r1["recall_vs_brute"].iloc[0] >= r0["recall_vs_brute"].iloc[0]


def test_dup_graph_pagerank_serial_parity(emb_dir):
    """Fixed-point integer PageRank must equal a serial numpy run of the
    identical algorithm BIT-FOR-BIT (integer sums are associative, floor
    divisions are per-edge), and hubs must outrank isolated nodes."""
    from deduplication_ray.pipelines.ann import dup_graph_pagerank

    d, base = emb_dir
    cos_min, iters, total_mass = 0.45, 6, 10 ** 12
    got = (dup_graph_pagerank(d, iters=iters, cos_min=cos_min,
                              total_mass=total_mass)
           .to_pandas().set_index("vec_id").sort_index())

    m = base / np.linalg.norm(base, axis=1, keepdims=True)
    sims = m @ m.T
    n = len(base)
    iu, ju = np.triu_indices(n, k=1)
    keep = sims[iu, ju] >= cos_min
    src = np.concatenate([iu[keep], ju[keep]])
    dst = np.concatenate([ju[keep], iu[keep]])
    deg = np.bincount(src, minlength=n).astype(np.int64)
    r0 = total_mass // n
    bse = (15 * r0) // 100
    rank = np.full(n, r0, dtype=np.int64)
    for _ in range(iters):
        contrib = (85 * rank[src]) // (100 * deg[src])
        rank = bse + np.zeros(n, np.int64)
        np.add.at(rank, dst, contrib)
    assert (got["rank_mass"].to_numpy() == rank).all()
    # planted pairs form 2-cliques: every paired node got real inbound mass,
    # isolated nodes sit at the teleport floor
    paired = rank[: 80]
    assert (got.loc[np.arange(80), "rank_mass"].to_numpy() > bse).all()
    assert int(got["rank_mass"].min()) == bse


def test_image_semdedup_catches_pixel_dups(tiny_fixture, ray_session):
    """Cross-modal composition: ImageEmbed (actor-pool random-projection
    inference) -> SemDeDup must put every planted pixel-identical family
    (exact / re-encode kinds: same decoded plane -> same embedding -> same
    cell, cosine 1) into one dup_group; near_img noise copies embed at
    cosine ~1 and must group too."""
    import numpy as np
    import pyarrow as pa

    from deduplication_ray.config import DedupConfig
    from deduplication_ray.pipelines.ann import embedding_semdedup
    from deduplication_ray.sources import fixtures, storage
    from deduplication_ray.stages.imgembed import embed_images
    from tests.conftest import TINY_ROWS

    from deduplication_ray.stages.imgembed import EMBED_COLUMNS, int_vec_ids

    emb = embed_images(
        storage.read_table(f"{tiny_fixture}/data", columns=EMBED_COLUMNS),
        DedupConfig())
    vecs = emb.map_batches(int_vec_ids, batch_format="pyarrow").materialize()
    out = embedding_semdedup("", tau=0.98, ds=vecs).to_pandas()
    assert len(out) == TINY_ROWS
    groups = out.set_index("vec_id")["dup_group"]

    spec, truth = fixtures.plan_rows(TINY_ROWS, seed=42)
    spec = spec.merge(truth, on="image_id")
    spec["vid"] = spec["image_id"].str[4:].astype(np.int64)
    pixel = spec[spec["kind"].isin(["exact", "reenc", "near_img"])]
    missed = 0
    for _, fam in pixel.groupby("cluster_id"):
        if len(fam) >= 2 and groups.loc[fam["vid"]].nunique() > 1:
            missed += 1
    # every pixel-dup family groups (cell-straddling cannot split identical
    # vectors; allow at most one noise-family edge case)
    assert missed <= 1, f"{missed} pixel-dup families split"


def test_image_ann_topk_finds_planted_twins(tiny_fixture, ray_session):
    """Query-by-image: for every query id whose truth cluster has a
    pixel-identical twin (exact/re-encode kinds), the rank-1 neighbor must
    be a member of that cluster (embedding cosine 1 beats everything)."""
    import numpy as np
    import pyarrow as pa

    from deduplication_ray.config import DedupConfig
    from deduplication_ray.pipelines.ann import brute_force_topk
    from deduplication_ray.sources import fixtures, storage
    from deduplication_ray.stages.imgembed import embed_images
    from tests.conftest import TINY_ROWS

    from deduplication_ray.stages.imgembed import EMBED_COLUMNS, int_vec_ids

    emb = embed_images(
        storage.read_table(f"{tiny_fixture}/data", columns=EMBED_COLUMNS),
        DedupConfig())
    vecs = emb.map_batches(int_vec_ids, batch_format="pyarrow").materialize()
    out = brute_force_topk("", n_queries=8, k=5, ds=vecs).to_pandas()

    spec, truth = fixtures.plan_rows(TINY_ROWS, seed=42)
    spec = spec.merge(truth, on="image_id")
    spec["vid"] = spec["image_id"].str[4:].astype(np.int64)
    by_vid = spec.set_index("vid")

    checked = 0
    for q in out["q_id"].unique():
        row = by_vid.loc[q]
        fam = spec[(spec["cluster_id"] == row["cluster_id"])
                   & (spec["kind"].isin(["exact", "reenc"]))]
        twins = set(fam["vid"]) - {q}
        if not twins or row["kind"] not in ("exact", "reenc"):
            continue
        top1 = out[(out["q_id"] == q) & (out["rank"] == 1)]["n_id"].iloc[0]
        assert top1 in set(fam["vid"]), (q, top1)
        checked += 1
    assert checked >= 1  # the first planted cluster sits at the lowest ids


def test_knn_label_check_planted_twins_both_paths(ray_session, tmp_path):
    """Every vector has an EXACT duplicate twin with the same label -> each
    vector's 1-NN (max inner product) is its twin, so nn_match == n_vecs
    per label on the exact path; the IVF scale path (identical vectors
    always share a cell) must reproduce that perfectly."""
    import pyarrow.parquet as pq

    from deduplication_ray.pipelines.ann import q_knn_label_check

    rng = np.random.default_rng(7)
    n, d = 60, 16
    base = rng.standard_normal((n, d))
    # equal norms make the twin the PROVABLE max-inner-product neighbor
    # (q.o <= |q||o| = |q|^2 with equality only at o == q)
    base = (base / np.linalg.norm(base, axis=1, keepdims=True) * 10.0) \
        .astype(np.float32)
    m = np.repeat(base, 2, axis=0)          # rows 2i, 2i+1 identical
    labels = np.repeat(np.arange(n) % 3, 2).astype(np.int32)
    t = pa.table({
        "vec_id": pa.array(np.arange(2 * n, dtype=np.int64)),
        "embedding": pa.array([v.tolist() for v in m],
                              type=pa.list_(pa.float32())),
        "label": pa.array(labels),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))

    exact = q_knn_label_check(str(tmp_path)).to_pandas() \
        .sort_values("label").reset_index(drop=True)
    assert (exact["nn_match"] == exact["n_vecs"]).all()
    assert exact["n_vecs"].sum() == 2 * n

    ivf = q_knn_label_check(str(tmp_path), exact_limit=0, n_cells=4) \
        .to_pandas().sort_values("label").reset_index(drop=True)
    assert (ivf["nn_match"] == ivf["n_vecs"]).all()
    assert ivf["n_vecs"].sum() == 2 * n


def test_knn_label_check_oracle_guard_raises_above_exact_limit(
        ray_session, monkeypatch):
    """The registered (default) call must RAISE when the corpus outgrows the
    exact tier rather than silently hash-comparing IVF output against the
    exact all-pairs oracle SQL (verdict r4 item #4)."""
    import pytest

    from deduplication_ray.pipelines import ann

    sf = "/root/testdata/sf0.001"
    monkeypatch.setattr(ann, "EXACT_PAIRS_LIMIT", 5)
    with pytest.raises(RuntimeError, match="exceeds exact_limit"):
        ann.q_knn_label_check(sf)
    # explicit opt-in still dispatches to the IVF tier without raising
    out = ann.q_knn_label_check(sf, exact_limit=5).to_pandas()
    assert len(out) > 0


def test_knn_label_check_scale_path_structure(ray_session):
    """IVF (nprobe=1) path on real testdata: same label universe and
    member counts as the exact path; match counts bounded by membership."""
    from deduplication_ray.pipelines.ann import q_knn_label_check

    sf = "/root/testdata/sf0.001"
    exact = q_knn_label_check(sf).to_pandas().sort_values("label") \
        .reset_index(drop=True)
    ivf = q_knn_label_check(sf, exact_limit=0).to_pandas() \
        .sort_values("label").reset_index(drop=True)
    assert list(exact["label"]) == list(ivf["label"])
    assert list(exact["n_vecs"]) == list(ivf["n_vecs"])
    assert (ivf["nn_match"] <= ivf["n_vecs"]).all()
