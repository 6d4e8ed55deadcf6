"""Cluster-quality evaluation vs planted truth (dup-pair recall/precision).

Pair counts are computed from cluster-size contingency — never materialized
pair sets (the hot-bucket cluster alone would be O(n^2) pairs):

  truth pairs      = sum over truth clusters   C(n_i, 2)
  predicted pairs  = sum over pred clusters    C(m_j, 2)
  agreeing pairs   = sum over (truth, pred) cells C(n_ij, 2)
  recall = agree / truth ; precision = agree / predicted

The north rule's gate is dup-pair recall >= 0.99 at the planted
(shingle/band/row) config.
"""

from __future__ import annotations

import pandas as pd


def _pairs(sizes: pd.Series) -> int:
    return int((sizes * (sizes - 1) // 2).sum())


def pair_metrics(pred: pd.DataFrame, truth: pd.DataFrame) -> dict:
    """pred/truth: DataFrames (image_id, cluster_id). Returns recall etc."""
    m = truth.rename(columns={"cluster_id": "t"}).merge(
        pred.rename(columns={"cluster_id": "p"}), on="image_id", how="inner"
    )
    if len(m) != len(truth):
        raise ValueError(
            f"prediction covers {len(m)} of {len(truth)} truth rows"
        )
    truth_pairs = _pairs(m.groupby("t").size())
    pred_pairs = _pairs(m.groupby("p").size())
    agree_pairs = _pairs(m.groupby(["t", "p"]).size())
    return {
        "rows": len(m),
        "truth_pairs": truth_pairs,
        "pred_pairs": pred_pairs,
        "agree_pairs": agree_pairs,
        "recall": agree_pairs / truth_pairs if truth_pairs else 1.0,
        "precision": agree_pairs / pred_pairs if pred_pairs else 1.0,
        "truth_clusters": int(m["t"].nunique()),
        "pred_clusters": int(m["p"].nunique()),
    }


def recall_by_kind(pred: pd.DataFrame, truth: pd.DataFrame, spec: pd.DataFrame) -> dict:
    """Per-planted-population recall — which detector family is missing what."""
    out = {}
    merged = truth.merge(spec[["image_id", "kind"]], on="image_id")
    for kind, grp in merged.groupby("kind"):
        sub_truth = truth[truth["cluster_id"].isin(grp["cluster_id"].unique())]
        m = pair_metrics(pred, sub_truth.reset_index(drop=True))
        out[str(kind)] = round(m["recall"], 4) if m["truth_pairs"] else None
    return out
