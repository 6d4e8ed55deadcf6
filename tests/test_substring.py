"""Unit tests: suffix array, LCP runs, winnowing fingerprints (no Ray)."""

import numpy as np
import pyarrow as pa

from deduplication_ray.config import DedupConfig
from deduplication_ray.stages.substring import (
    SuffixArrayEdges,
    WinnowFingerprints,
    suffix_array,
)


def test_suffix_array_banana():
    s = np.frombuffer(b"banana", dtype=np.uint8).copy()
    sa = suffix_array(s)
    assert [bytes(s[i:]).decode() for i in sa] == [
        "a", "ana", "anana", "banana", "na", "nana"]


def test_suffix_array_repetitive():
    s = np.frombuffer(b"aaaaaaaaaa", dtype=np.uint8).copy()
    sa = suffix_array(s)
    assert sa.tolist() == list(range(9, -1, -1))


def _cfg():
    return DedupConfig(substring_min_len=10, winnow_window=4)


def test_sa_edges_detect_embedded_caption():
    a = "the quick brown fox jumps over the lazy dog"
    b = "PREFIX words " + a + " SUFFIX words"
    c = "completely different caption with no overlap at all"
    t = pa.table({"image_id": ["A", "B", "C"], "caption": [a, b, c]})
    edges = SuffixArrayEdges(_cfg())(t).to_pandas()
    pairs = set(map(tuple, edges[["src", "dst"]].values))
    assert ("A", "B") in pairs
    assert not any("C" in p for p in pairs)


def test_sa_edges_no_cross_doc_span():
    """Separator must prevent matches spanning document boundaries."""
    t = pa.table({
        "image_id": ["A", "B", "C", "D"],
        "caption": ["xxxxxyyyyy", "yyyyyzzzzz", "aaabbbccc", "dddeeefff"],
    })
    edges = SuffixArrayEdges(DedupConfig(substring_min_len=8, winnow_window=4))(t).to_pandas()
    assert len(edges) == 0


def test_winnow_shared_substring_shares_fingerprint():
    cfg = _cfg()
    shared = "a long shared middle segment here"  # 33 chars >= Lmin + w - 1 = 13
    t = pa.table({
        "image_id": ["A", "B", "C"],
        "caption": ["start " + shared + " endA", "other " + shared + " endB",
                     "nothing in common with the rest zzz"],
    })
    fps = WinnowFingerprints(cfg)(t).to_pandas()
    fa = set(fps[fps.image_id == "A"].bucket)
    fb = set(fps[fps.image_id == "B"].bucket)
    fc = set(fps[fps.image_id == "C"].bucket)
    assert fa & fb
    assert not (fa & fc) and not (fb & fc)


def test_winnow_short_doc_min_is_own(monkeypatch):
    """Regression: short-doc minimizer must come from the doc's own grams
    (reduceat had spanned neighbouring docs)."""
    cfg = DedupConfig(substring_min_len=5, winnow_window=50)  # every doc 'short'
    t = pa.table({
        "image_id": ["A", "B"],
        "caption": ["abcdefgh", "zzzzzzzz"],
    })
    fps = WinnowFingerprints(cfg)(t).to_pandas()
    assert len(fps[fps.image_id == "A"]) == 1
    assert len(fps[fps.image_id == "B"]) == 1
    assert set(fps[fps.image_id == "A"].bucket) != set(fps[fps.image_id == "B"].bucket)


def test_cross_batch_substring_at_lmin_window_gap(ray_session):
    """Regression (round-1 advisory): a shared substring in the
    [Lmin, Lmin+w-2] length gap, with the two docs in DIFFERENT suffix-array
    batches, must still link. With Lmin-char winnow grams the guarantee only
    covered >= Lmin + w - 1; k = Lmin - w + 1 grams + exact L-gram
    verification covers >= Lmin."""
    import pandas as pd

    import ray.data

    from deduplication_ray.config import DedupConfig
    from deduplication_ray.stages.substring import substring_edges

    cfg = DedupConfig(num_partitions=2, text_batch_size=4)
    s = "shared secret segment of exactly fortyfive"  # 42 normalized chars
    assert cfg.substring_min_len <= len(s) < cfg.substring_min_len + cfg.winnow_window - 1
    fillers = [f"completely unrelated filler text number {i} padding words xyz{i}"
               for i in range(6)]
    rows = pd.DataFrame({
        "image_id": [f"d{i}" for i in range(8)],
        "caption": (["prefix one " + s + " tail alpha"] + fillers[:3]
                    + ["prefix two " + s + " tail beta"] + fillers[3:]),
    })
    ds = ray.data.from_pandas(rows)
    edges = substring_edges(ds, cfg).to_pandas()
    pairs = set(zip(edges["src"], edges["dst"]))
    assert ("d0", "d4") in pairs, pairs
    assert all(k == "substr" for k in edges["kind"])
