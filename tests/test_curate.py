"""End-to-end curation chain: decontaminate -> quality gate -> boilerplate
scrub -> dedup keep-best -> split -> chunk -> partitioned write."""

import os
import shutil

import pandas as pd
import pyarrow.dataset as pads


def test_curate_documents_funnel(ray_session, tmp_path):
    from deduplication_ray.pipelines.curate import curate_documents

    out = str(tmp_path / "curated")
    m = curate_documents("/root/testdata/sf0.001", out)

    # monotone funnel
    assert (m["docs_total"] >= m["after_decontaminate"]
            >= m["after_quality_gate"] >= m["after_scrub"]
            >= m["after_dedup"] > 0)
    assert m["chunks_written"] >= m["after_dedup"]

    frames = []
    for split in ("train", "val", "test"):
        d = f"{out}/{split}"
        assert os.path.isdir(d)
        df = pads.dataset(d).to_table().to_pandas()
        if len(df):
            assert (df["split"] == split).all()
        frames.append(df)
    allc = pd.concat(frames, ignore_index=True)
    assert len(allc) == m["chunks_written"]
    # every surviving doc contributed at least one chunk; no duplicates of
    # (doc_id, chunk_idx)
    assert allc["doc_id"].nunique() == m["after_dedup"]
    assert not allc.duplicated(["doc_id", "chunk_idx"]).any()
    # train split dominates under the 80/10/10 hash rule
    assert len(frames[0]) > len(frames[1]) and len(frames[0]) > len(frames[2])


def test_token_budget_mix_greedy_fill(ray_session):
    """Per-source greedy token fill: tokens kept before the last kept doc
    stay under the budget, the full budget is reached (overshoot <= one
    doc), and non-uniform shares produce the ordered keep-fractions
    src0 (10%) < default (40%) < src1 (80%)."""
    import duckdb

    from deduplication_ray.functions.text import token_count
    from deduplication_ray.pipelines import docops

    sf = "/root/testdata/sf0.001"
    kept = docops.q_doc_token_budget_mix(sf).to_pandas()

    totals = duckdb.sql(
        f"SELECT source, SUM(length(string_split_regex(trim(text), '\\s+')))"
        f"  AS tot FROM read_parquet('{sf}/documents.parquet') GROUP BY 1"
    ).df().set_index("source")["tot"]

    frac = {}
    for src, g in kept.groupby("source"):
        permille = docops._MIX_OVERRIDES.get(src, docops._MIX_DEFAULT_PERMILLE)
        budget = (int(totals[src]) * permille) // 1000
        toks = g["n_tokens"].to_numpy()
        assert toks.sum() - toks.max() < budget  # no doc is pure overshoot
        assert toks.sum() >= budget              # budget actually reached
        frac[src] = toks.sum() / totals[src]
    assert frac["src0"] < 0.25 < frac["src2"] < 0.6 < frac["src1"]


def test_curate_with_span_removal(ray_session, tmp_path):
    """Opt-in ExactSubstr stage: the funnel stays monotone, the stage
    actually cuts words on this corpus (planted near-dup families share
    verbatim spans), surviving text contains no cross-document duplicated
    8-gram among the final reps, and the default path is unchanged."""
    from deduplication_ray.pipelines.curate import curate_documents

    out = str(tmp_path / "curated_spans")
    m = curate_documents("/root/testdata/sf0.001", out,
                         remove_dup_spans=True)
    assert (m["docs_total"] >= m["after_decontaminate"]
            >= m["after_quality_gate"] >= m["after_scrub"]
            >= m["after_span_removal"] >= m["after_dedup"] > 0)
    assert m["span_words_removed"] > 0

    m0 = curate_documents("/root/testdata/sf0.001",
                          str(tmp_path / "curated_plain"))
    assert m0["span_words_removed"] == 0
    assert m0["after_span_removal"] == m0["after_scrub"]
