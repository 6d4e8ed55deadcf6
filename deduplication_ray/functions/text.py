"""Text analysis kernels: token counting, quality scoring, language ID,
document fingerprinting, n-gram Jaccard.

These are the training-data-pipeline operators a dedup engine ships next to
its core (SURVEY §2.2 neighborhood): each is exposed as a ``queries()`` entry
over the ``documents`` testdata table, and where DuckDB can express the same
computation the semantics are mirrored exactly (token split = ``\\s+`` on the
trimmed string; char-set Jaccard = DuckDB's ``jaccard`` definition).

All vectorized: pyarrow.compute string kernels + numpy over Arrow buffers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from deduplication_ray.functions import hashing as H

# tiny seeded stopword profiles for the language-ID heuristic (n-gram/stopword
# scoring — a standard public technique; profiles here are deliberately small)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "with", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "del"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "en"),
    "de": ("der", "die", "und", "das", "von", "mit", "den", "ein"),
}


def token_count(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Whitespace token count, matching DuckDB
    ``length(string_split_regex(trim(text), '\\s+'))`` (empty string -> 1,
    DuckDB's convention for split of '')."""
    # trim SPACES only: DuckDB trim() strips ' ' (not tabs/newlines), and
    # utf8_trim_whitespace would diverge on text with \t\n edges
    trimmed = pc.utf8_trim(text, " ")
    splits = pc.split_pattern_regex(trimmed, r"\s+")
    return pc.list_value_length(splits)


def quality_features(text: pa.ChunkedArray | pa.Array) -> dict[str, pa.Array]:
    """Length/alpha/punct features. Integer-valued so oracle comparison is
    exact: n_chars, n_tokens, n_alpha (letters), n_digit, n_space."""
    return {
        "n_chars": pc.utf8_length(text).cast(pa.int64()),
        "n_tokens": token_count(text).cast(pa.int64()),
        "n_alpha": pc.utf8_length(pc.replace_substring_regex(text, r"[^a-zA-Z]", "")).cast(pa.int64()),
        "n_digit": pc.utf8_length(pc.replace_substring_regex(text, r"[^0-9]", "")).cast(pa.int64()),
        "n_space": pc.utf8_length(pc.replace_substring_regex(text, r"[^ ]", "")).cast(pa.int64()),
    }


def quality_score(text: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Composite [0,1] quality heuristic (length + alpha ratio + mean token
    length in a sane range). Not SQL-mirrored; rows-only check."""
    f = quality_features(text)
    n_chars = f["n_chars"].to_numpy().astype(np.float64)
    n_tokens = np.maximum(f["n_tokens"].to_numpy().astype(np.float64), 1)
    n_alpha = f["n_alpha"].to_numpy().astype(np.float64)
    alpha_ratio = n_alpha / np.maximum(n_chars, 1)
    mean_tok = n_chars / n_tokens
    len_score = np.clip(n_chars / 200.0, 0, 1)
    tok_score = np.exp(-0.5 * ((mean_tok - 5.5) / 3.0) ** 2)
    return 0.4 * alpha_ratio + 0.3 * len_score + 0.3 * tok_score


def language_id(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Stopword-profile language ID. Vectorized: one regex count per
    (language, stopword profile) via count_substring_regex on the lowered
    text; argmax across languages ('und' when no profile hits)."""
    low = pc.utf8_lower(text)
    n = len(low)
    scores = np.zeros((len(LANG_PROFILES), n), dtype=np.int64)
    for i, (_, words) in enumerate(LANG_PROFILES.items()):
        pat = r"\b(" + "|".join(words) + r")\b"
        scores[i] = pc.count_substring_regex(low, pat).to_numpy()
    best = scores.argmax(axis=0)
    hit = scores.max(axis=0) > 0
    langs = np.array(list(LANG_PROFILES.keys()))
    out = np.where(hit, langs[best], "und")
    return pa.array(out.tolist(), pa.string())


def char_set_jaccard_matrix(texts_a: list[str], texts_b: list[str]) -> np.ndarray:
    """DuckDB-``jaccard``-compatible similarity: |chars(a) & chars(b)| /
    |chars(a) | chars(b)| over distinct characters. Vectorized via per-text
    256-bit (ASCII) / hashed char membership matrices."""
    def memb(texts: list[str]) -> np.ndarray:
        m = np.zeros((len(texts), 256), dtype=bool)
        arr = pa.array(texts)
        buf, offs = H._arrow_flat_buffer(arr)
        buf = buf[offs[0]: offs[-1]]
        offs = offs - offs[0]
        row = np.repeat(np.arange(len(texts)), offs[1:] - offs[:-1])
        m[row, buf] = True
        return m

    ma, mb = memb(texts_a), memb(texts_b)
    inter = (ma[:, None, :] & mb[None, :, :]).sum(axis=2)
    union = (ma[:, None, :] | mb[None, :, :]).sum(axis=2)
    return inter / np.maximum(union, 1)


def simhash_text(text: pa.ChunkedArray | pa.Array, lower: bool = True) -> np.ndarray:
    """Classic 64-bit text SimHash: hash each whitespace token, sum +-1 per
    bit over the doc's tokens, sign -> bit. Fully vectorized (token flatten +
    add.reduceat); returns u64 per row."""
    t = pc.utf8_lower(text) if lower else text
    t = pc.utf8_trim_whitespace(t)
    splits = pc.split_pattern_regex(t, r"\s+")
    if isinstance(splits, pa.ChunkedArray):
        splits = splits.combine_chunks()
    flat = splits.flatten()
    counts = pc.list_value_length(splits).to_numpy().astype(np.int64)
    offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    tok_hash = H.hash_bytes_array(flat)
    bits = (((tok_hash[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
            .astype(np.int64) * 2 - 1)
    sums = np.zeros((len(counts), 64), dtype=np.int64)
    nonempty = counts > 0
    if nonempty.any():
        sums[nonempty] = np.add.reduceat(bits, offsets[:-1][nonempty], axis=0)
    sig = ((sums > 0).astype(np.uint64) * (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    return sig


def winnow_fingerprint(text: pa.ChunkedArray | pa.Array, k: int = 8, w: int = 4) -> list[np.ndarray]:
    """Document fingerprint: winnowed minimizer set of k-gram rolling hashes
    (per row). Returns a list of sorted u64 arrays (variable length)."""
    grams, offs = H.shingle_window_hashes(
        text if isinstance(text, pa.Array) else text.combine_chunks(), k
    )
    out = []
    for i in range(len(offs) - 1):
        g = grams[offs[i]: offs[i + 1]]
        if len(g) == 0:
            out.append(np.empty(0, dtype=np.uint64))
            continue
        if len(g) <= w:
            out.append(np.unique(g.min(keepdims=True)))
            continue
        sw = np.lib.stride_tricks.sliding_window_view(g, w)
        out.append(np.unique(sw.min(axis=1)))
    return out


def _padded_bytes(col: pa.ChunkedArray | pa.Array,
                  pad: int) -> tuple[np.ndarray, np.ndarray]:
    """UTF-8 bytes of each string scattered into one (rows, max_len) int16
    matrix (``pad`` fills the tail) plus per-row byte lengths — zero-copy
    flat read + one fancy-index scatter, no per-row Python."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.cast(pa.binary())
    raw = np.frombuffer(col.buffers()[1], np.int32)
    offs = raw[col.offset: col.offset + len(col) + 1].astype(np.int64)
    lens = offs[1:] - offs[:-1]
    n = len(lens)
    m = int(lens.max()) if n and lens.max() > 0 else 0
    out = np.full((n, m), pad, dtype=np.int16)
    if m:
        data = np.frombuffer(col.buffers()[2], np.uint8)
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        cols = np.arange(int(lens.sum()), dtype=np.int64) \
            - np.repeat(offs[:-1] - offs[0], lens)
        flat = data[offs[0]:offs[-1]]
        out[rows, cols] = flat
    return out, lens


def levenshtein_pairs(a: pa.ChunkedArray | pa.Array,
                      b: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Exact Levenshtein distance for each aligned (a[i], b[i]) string pair,
    vectorized ACROSS pairs: the classic two-row DP iterated over rows of
    ``a``, with the in-row left-to-right dependency collapsed into one
    ``np.minimum.accumulate`` via the prefix-min identity
    ``cur[j] = min_{k<=j}(base[k] + (j-k))`` where
    ``base[j] = min(prev[j]+1, prev[j-1]+cost)``. Cost per batch is
    O(max_len_a × max_len_b × pairs) int32 ops with NO per-pair Python —
    max_len iterations of whole-matrix kernels. Distances are over UTF-8
    BYTES (equals DuckDB ``levenshtein`` characters for ASCII text)."""
    A, la = _padded_bytes(a, pad=-1)
    B, lb = _padded_bytes(b, pad=-2)
    p, m = A.shape
    n = B.shape[1]
    if p == 0:
        return np.empty(0, np.int64)
    ans = np.where(la == 0, lb, 0).astype(np.int64)
    jm = np.arange(n + 1, dtype=np.int32)
    prev = np.broadcast_to(jm, (p, n + 1)).copy()
    base = np.empty((p, n + 1), np.int32)
    for i in range(1, m + 1):
        cost = (A[:, i - 1:i] != B).astype(np.int32)
        base[:, 0] = i
        np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost, out=base[:, 1:])
        cur = np.minimum.accumulate(base - jm, axis=1)
        cur += jm
        sel = la == i
        if sel.any():
            ans[sel] = cur[sel, lb[sel]]
        prev, base = cur, prev
    return ans
