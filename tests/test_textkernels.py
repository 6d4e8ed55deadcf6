"""Property tests: vectorized text kernels vs pure-Python references
(no Ray needed — the kernels are batch-level pure functions)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from deduplication_ray.pipelines.docops import _tokens_flat, _word_grams

texts = st.lists(
    st.text(alphabet=st.sampled_from("ab \t\nxyz.!0"), max_size=40),
    min_size=0, max_size=12)


def _py_tokens(s: str) -> list[str]:
    import re

    # strip SPACES only, mirroring DuckDB trim() (which the Arrow kernel
    # now matches exactly — leading \t\n produce an empty first token on
    # both engines)
    return re.split(r"\s+", s.strip(" ").lower())


@settings(max_examples=200, deadline=None)
@given(texts)
def test_tokens_flat_matches_python_reference(rows):
    flat, offs = _tokens_flat(pa.array(rows, pa.string()))
    got = [flat.slice(offs[i], offs[i + 1] - offs[i]).to_pylist()
           for i in range(len(rows))]
    assert got == [_py_tokens(s) for s in rows]


@settings(max_examples=200, deadline=None)
@given(texts, st.integers(min_value=2, max_value=5))
def test_word_grams_match_python_reference(rows, n):
    grams, row_of = _word_grams(pa.array(rows, pa.string()), n)
    got = {}
    for g, r in zip(grams.to_pylist(), row_of):
        got.setdefault(int(r), []).append(g)
    want = {}
    for i, s in enumerate(rows):
        toks = _py_tokens(s)
        for j in range(len(toks) - n + 1):
            want.setdefault(i, []).append(" ".join(toks[j:j + n]))
    assert got == want


# ---------------------------------------------------------------- new kernels

trigram_texts = st.lists(
    st.text(alphabet=st.sampled_from("abc XY.!\t\n01"), max_size=30),
    min_size=0, max_size=10)


@settings(max_examples=200, deadline=None)
@given(trigram_texts)
def test_trigram_codes_match_python_reference(rows):
    from deduplication_ray.pipelines.docops import _trigram_codes

    codes, offs = _trigram_codes(pa.array(rows, pa.string()))
    got = [list(codes[offs[i]:offs[i + 1]]) for i in range(len(rows))]
    want = []
    for s in rows:
        b = s.lower().encode("utf-8")
        want.append([(b[i] << 16) | (b[i + 1] << 8) | b[i + 2]
                     for i in range(max(len(b) - 2, 0))])
    assert got == want


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-10**6, max_value=10**6),
                min_size=1, max_size=60),
       st.integers(min_value=1, max_value=5))
def test_zscore_integer_algebra_matches_float(values, z):
    """The integer identity (n·x−S)² > z²(nQ−S²) must agree with the float
    |x−mean| > z·sigma_pop test wherever the float test is numerically
    unambiguous (exact integer algebra can only disagree within float
    rounding of the boundary)."""
    x = np.asarray(values, dtype=np.int64)
    n = np.int64(len(x))
    s = x.sum(dtype=np.int64)
    q = (x.astype(object) ** 2).sum()  # exact python ints, no overflow
    lhs = (int(n) * x.astype(object) - int(s)) ** 2
    rhs = int(z) * int(z) * (int(n) * int(q) - int(s) ** 2)
    got = np.array([bool(l > rhs) for l in lhs])
    mean = x.mean()
    sigma = x.std()  # population
    ref = np.abs(x - mean) > z * sigma
    margin = np.abs(np.abs(x - mean) - z * sigma)
    unambiguous = margin > 1e-6 * max(abs(mean), sigma, 1.0)
    assert (got[unambiguous] == ref[unambiguous]).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=0, max_size=40))
def test_pack_unpack_u64_roundtrip(vals):
    from deduplication_ray.functions import hashing as H

    if len(vals) % 4:
        vals = vals + [0] * (4 - len(vals) % 4)
    m = np.asarray(vals, dtype=np.uint64).reshape(-1, 4)
    packed = H.pack_u64_rows(m)
    out = H.unpack_u64_rows(packed, 4)
    assert (out == m).all()


def _py_levenshtein(s: str, t: str) -> int:
    prev = list(range(len(t) + 1))
    for i in range(1, len(s) + 1):
        cur = [i] + [0] * len(t)
        for j in range(1, len(t) + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (s[i - 1] != t[j - 1]))
        prev = cur
    return prev[len(t)]


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(st.text(alphabet="abcde ", max_size=30),
                          st.text(alphabet="abcde ", max_size=30)),
                min_size=0, max_size=10))
def test_levenshtein_pairs_matches_python_reference(pairs):
    from deduplication_ray.functions.text import levenshtein_pairs

    a = pa.array([p[0] for p in pairs], pa.string())
    b = pa.array([p[1] for p in pairs], pa.string())
    got = levenshtein_pairs(a, b)
    want = np.array([_py_levenshtein(s, t) for s, t in pairs], np.int64)
    assert got.shape == want.shape and (got == want).all()


def test_levenshtein_pairs_sliced_chunked_and_duckdb_parity():
    """Offset arithmetic survives sliced/chunked Arrow inputs, and byte
    distance equals DuckDB's levenshtein on ASCII."""
    import duckdb
    import pandas as pd

    from deduplication_ray.functions.text import levenshtein_pairs

    rng = np.random.default_rng(11)
    mk = lambda n: "".join(rng.choice(list("abcx y"), n))
    pairs = [(mk(int(rng.integers(0, 50))), mk(int(rng.integers(0, 50))))
             for _ in range(120)] + [("", ""), ("", "zz"), ("zz", "")]
    a = pa.array([p[0] for p in pairs]); b = pa.array([p[1] for p in pairs])
    whole = levenshtein_pairs(a, b)
    ca = pa.chunked_array([a.slice(0, 41), a.slice(41)])
    assert (levenshtein_pairs(ca, pa.chunked_array([b])) == whole).all()
    assert (levenshtein_pairs(a.slice(7, 50), b.slice(7, 50))
            == whole[7:57]).all()
    df = pd.DataFrame({"s": [p[0] for p in pairs], "t": [p[1] for p in pairs]})
    dk = duckdb.query("SELECT levenshtein(s, t) AS d FROM df").df()
    assert (whole == dk["d"].to_numpy()).all()


# ---------------------------------------------------- keyed-reduce kit


@given(st.lists(st.tuples(st.integers(0, 9),
                          st.integers(-10**6, 10**6)), max_size=200))
@settings(max_examples=60, deadline=None)
def test_segmented_reduce_matches_pandas(rows):
    """_segmented_reduce (sum/max/count in one pass) == pandas groupby on
    arbitrary key/value batches, including the empty batch."""
    import pandas as pd

    from deduplication_ray.pipelines.relational import _segmented_reduce

    t = pa.table({"k": pa.array([k for k, _ in rows], pa.int64()),
                  "v": pa.array([v for _, v in rows], pa.int64())})
    got = _segmented_reduce(t, "k", {"s": ("v", "sum"),
                                     "m": ("v", "max"),
                                     "c": ("v", "count")}).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    if not rows:
        assert len(got) == 0
        assert list(got.columns) == ["k", "s", "m", "c"]
        return
    df = pd.DataFrame(rows, columns=["k", "v"])
    want = df.groupby("k")["v"].agg(s="sum", m="max", c="count") \
        .reset_index().astype(np.int64)
    pd.testing.assert_frame_equal(got, want)


@given(st.lists(st.tuples(st.integers(0, 50),
                          st.integers(-10**6, 10**6)),
                min_size=1, max_size=300))
@settings(max_examples=15, deadline=None)
def test_segmented_reduce_two_level_recombine(rows):
    """Partial-then-combine (counts re-entering as sums, the _keyed_reduce
    contract) equals the single-pass reduce on any split of the input."""
    from deduplication_ray.pipelines.relational import _segmented_reduce

    cols = {"s": ("v", "sum"), "c": ("v", "count")}
    recols = {"s": ("s", "sum"), "c": ("c", "sum")}

    t = pa.table({"k": pa.array([k for k, _ in rows], pa.int64()),
                  "v": pa.array([v for _, v in rows], pa.int64())})
    whole = _segmented_reduce(t, "k", cols).to_pandas() \
        .sort_values("k").reset_index(drop=True)

    cut = len(rows) // 2
    parts = pa.concat_tables([
        _segmented_reduce(t.slice(0, cut), "k", cols),
        _segmented_reduce(t.slice(cut), "k", cols)])
    merged = _segmented_reduce(parts, "k", recols).to_pandas() \
        .sort_values("k").reset_index(drop=True)

    import pandas as pd
    pd.testing.assert_frame_equal(whole, merged)
