"""Differential fuzz: the exact set- and multiset-Jaccard prefix-filter
self-joins vs DuckDB on randomized corpora.

The sf fixtures exercise one corpus shape (planted near-dup families over a
large vocabulary). This fuzzes the operators' EXACTNESS claim where it is
most fragile: tiny vocabularies (every doc shares tokens with every other,
prefixes prune almost nothing), zipf-heavy repetition (weighted totals far
from distinct counts, so the weighted prefix bound ceil(tau*W) does real
work), single-word docs, identical docs, and the empty-string doc ('' is
one token under DuckDB's string_split_regex, mirrored by _tokens_flat).
Random tau sweeps both loose and tight thresholds.
"""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from deduplication_ray.pipelines.docops import (
    doc_ppjoin_pairs_sql, doc_weighted_ppjoin_pairs_sql, q_doc_ppjoin_pairs,
    q_doc_weighted_ppjoin_pairs)

TAUS = [500, 600, 700, 850]


def _rand_corpus(rng, n_docs: int) -> pa.Table:
    vocab = np.array([f"w{i}" for i in range(int(rng.choice([4, 9, 30])))])
    texts = []
    for d in range(n_docs):
        kind = rng.random()
        if kind < 0.05:
            texts.append("")                       # the empty-token doc
        elif kind < 0.15:
            texts.append(str(rng.choice(vocab)))   # single word
        elif kind < 0.25 and texts:
            texts.append(texts[int(rng.integers(0, len(texts)))])  # clone
        else:
            ln = int(rng.integers(1, 26))
            # zipf-ish skew: low token ids dominate -> heavy repetition
            ids = np.minimum((rng.pareto(1.1, ln)).astype(np.int64),
                             len(vocab) - 1)
            texts.append(" ".join(vocab[ids]))
    return pa.table({"doc_id": pa.array(range(n_docs), pa.int64()),
                     "text": pa.array(texts)})


@pytest.mark.parametrize("seed", range(4))
def test_ppjoin_variants_fuzz_vs_duckdb(ray_session, tmp_path, seed):
    rng = np.random.default_rng(4200 + seed)
    t = _rand_corpus(rng, int(rng.choice([12, 40, 90])))
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    tau = TAUS[seed % len(TAUS)]
    weighted = seed % 2 == 1
    q = q_doc_weighted_ppjoin_pairs if weighted else q_doc_ppjoin_pairs
    sql = (doc_weighted_ppjoin_pairs_sql if weighted
           else doc_ppjoin_pairs_sql)(tau_permille=tau)

    mine = (q(str(tmp_path), tau_permille=tau).to_pandas()
            .sort_values(["src", "dst"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    orcl = (con.execute(sql).df()
            .sort_values(["src", "dst"]).reset_index(drop=True))
    assert len(mine) == len(orcl), (seed, tau, weighted)
    for c in orcl.columns:
        assert (mine[c].to_numpy().astype(np.int64)
                == orcl[c].to_numpy().astype(np.int64)).all(), (
            seed, tau, weighted, c)
