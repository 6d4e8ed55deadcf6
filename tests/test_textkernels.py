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
