"""BPE tokenizer training/apply: exact parity with an independent serial
implementation, partition invariance, and compression invariants."""

from __future__ import annotations

import collections

import numpy as np
import pandas as pd
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
N_MERGES = 120
VOCAB_CAP = 30000


def _serial_words(texts: list[str]) -> collections.Counter:
    c: collections.Counter = collections.Counter()
    for t in texts:
        for w in t.strip(" ").lower().split():
            c[w] += 1
    return c


def _serial_merges(counts: collections.Counter, n: int) -> list:
    """Independent textbook learn_bpe: full pair recount every round (no
    inverted lists), same deterministic tie-break."""
    syms = {w: tuple(w) for w in counts}
    merges = []
    for _ in range(n):
        pairs: collections.Counter = collections.Counter()
        for w, s in syms.items():
            for p in zip(s, s[1:]):
                pairs[p] += counts[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new = best[0] + best[1]
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and (s[i], s[i + 1]) == best:
                    out.append(new)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = tuple(out)
    return merges


def _serial_encode_len(word: str, merges: list) -> int:
    ranks = {p: i for i, p in enumerate(merges)}
    s = tuple(word)
    while len(s) > 1:
        cand = [(ranks[p], p) for p in zip(s, s[1:]) if p in ranks]
        if not cand:
            break
        _, best = min(cand)
        new, out, i = best[0] + best[1], [], 0
        while i < len(s):
            if i < len(s) - 1 and (s[i], s[i + 1]) == best:
                out.append(new)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = tuple(out)
    return len(s)


@pytest.fixture(scope="module")
def corpus():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return t


def test_train_bpe_matches_serial(ray_session, corpus):
    from deduplication_ray.pipelines import docops

    got = docops.q_doc_train_bpe(SF, num_merges=N_MERGES,
                                 vocab_cap=VOCAB_CAP)
    counts = _serial_words(corpus["text"].to_pylist())
    want = _serial_merges(counts, N_MERGES)
    assert len(got) == len(want)
    assert list(zip(got["left"], got["right"])) == want
    # merges must actually merge: every merged symbol is multi-char
    assert (got["merged"].str.len() >= 2).all()


def test_train_bpe_partition_invariant(ray_session, corpus):
    """The word-count groupby is exact, so the merge table cannot depend on
    the block layout."""
    import ray.data

    from deduplication_ray.pipelines import docops

    ds1 = ray.data.from_arrow(corpus).repartition(1)
    ds17 = ray.data.from_arrow(corpus).repartition(17)
    m1 = docops.bpe_merge_loop(
        *docops.corpus_word_counts(ds1, VOCAB_CAP), N_MERGES)
    m17 = docops.bpe_merge_loop(
        *docops.corpus_word_counts(ds17, VOCAB_CAP), N_MERGES)
    assert m1 == m17


def test_bpe_tokenize_matches_serial(ray_session, corpus):
    from deduplication_ray.pipelines import docops

    got = (docops.q_doc_bpe_tokenize(SF, num_merges=N_MERGES,
                                     vocab_cap=VOCAB_CAP)
           .to_pandas().set_index("doc_id").sort_index())
    counts = _serial_words(corpus["text"].to_pylist())
    merges = _serial_merges(counts, N_MERGES)
    enc_cache = {w: _serial_encode_len(w, merges) for w in counts}
    rows = {}
    for doc_id, text in zip(corpus["doc_id"].to_pylist(),
                            corpus["text"].to_pylist()):
        ws = text.strip(" ").lower().split()
        rows[doc_id] = (len(ws), sum(enc_cache[w] for w in ws))
    want = pd.DataFrame.from_dict(rows, orient="index",
                                  columns=["n_words", "n_bpe_tokens"]) \
        .sort_index()
    assert (got["n_words"].to_numpy() == want["n_words"].to_numpy()).all()
    assert (got["n_bpe_tokens"].to_numpy()
            == want["n_bpe_tokens"].to_numpy()).all()
    # compression invariants: words <= bpe tokens <= non-space chars, and
    # the merges actually compress (strictly fewer tokens than chars)
    nchars = pc.utf8_length(pc.replace_substring(
        corpus["text"], " ", "")).to_numpy(zero_copy_only=False)
    order = np.argsort(corpus["doc_id"].to_numpy())
    assert (got["n_words"].to_numpy() <= got["n_bpe_tokens"].to_numpy()).all()
    assert (got["n_bpe_tokens"].to_numpy() <= nchars[order]).all()
    assert got["n_bpe_tokens"].sum() < nchars.sum()
