"""Exact shared-substring detection: per-partition suffix array + winnowing
boundary merge (T11).

Catches pairs whose normalized captions share a verbatim substring of at
least ``cfg.substring_min_len`` chars (the FIXTURES 'caption A embedded in
caption B' population) — pairs MinHash can miss because a short shared
substring of a long caption yields low Jaccard.

Two passes:

1. **Winnowing rendezvous** (the default, complete on its own): every
   caption emits the minimizer hashes of its k-gram rolling hashes
   (k = Lmin - winnow_window + 1) over windows of ``cfg.winnow_window``
   grams. Standard winnowing guarantee: two strings sharing a substring of
   length >= k + w - 1 = Lmin share a minimizer — within AND across
   partitions, no partition alignment needed. The fingerprints feed the
   SAME bucket->edge machinery as LSH bands (band namespace 3000), so
   hot-substring skew is salted identically. A shared minimizer proves only
   a k-char overlap, so candidates are verified by exact L-gram
   intersection (``verify_substring_candidates``) before they count.

2. **Per-partition suffix array** (``SuffixArrayEdges``; opt-in via
   ``cfg.use_suffix_array`` — redundant given pass 1's guarantee):
   concatenate the partition's normalized captions with NUL separators,
   build the suffix array by prefix doubling (numpy lexsort, O(n log^2 n),
   no Python char loops), mark adjacent suffixes whose LCP >= Lmin
   (vectorized Lmin-step comparison that treats NUL as never-equal so
   matches cannot span documents), and link the distinct documents of each
   >=Lmin-prefix run. Exact within the partition, blind across partitions.

A u64 fingerprint equality stands in for substring equality (collision odds
~n^2/2^64; at true 10^12 scale swap to 128-bit fingerprints). The reference
analog is block-identity via memcmp (``/root/reference/src/dictionary.c:53``)
— here the 'block' is a variable-position caption window.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from deduplication_ray.config import DedupConfig
from deduplication_ray.functions import hashing as H
from deduplication_ray.stages import lsh
from deduplication_ray.stages.signatures import normalize_captions

BAND_SUBSTR = lsh.BAND_SUBSTR


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of a uint8 sequence by prefix doubling.

    Initial ranks come from the first EIGHT bytes of each suffix packed into
    one u64 (the buffer always ends with a NUL separator, so zero-padding
    past the end orders end-of-buffer suffixes correctly), skipping the
    k=1/2/4 doubling rounds; each remaining round sorts ONE composite int64
    key ``rank*(n+1) + rank[i+k]+1`` instead of a two-key lexsort (~2x per
    round). O(n log n) numpy, no Python char loops."""
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    assert n < (1 << 31), "per-batch suffix buffer limited to 2^31 bytes"
    pad = np.zeros(n + 8, dtype=np.uint8)
    pad[:n] = s
    key0 = np.zeros(n, dtype=np.uint64)
    for j in range(8):
        key0 = (key0 << np.uint64(8)) | pad[j:j + n].astype(np.uint64)
    order = np.argsort(key0)
    ko = key0[order]
    newgrp = np.empty(n, dtype=bool)
    newgrp[0] = True
    newgrp[1:] = ko[1:] != ko[:-1]
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.cumsum(newgrp) - 1
    if rank[order[-1]] == n - 1:
        return order
    k = 8
    stride = np.int64(n + 1)
    while True:
        comb = rank * stride
        if k < n:
            comb[:-k] += rank[k:] + 1
        order = np.argsort(comb)
        co = comb[order]
        newgrp[0] = True
        newgrp[1:] = co[1:] != co[:-1]
        rank = np.empty(n, dtype=np.int64)
        rank[order] = np.cumsum(newgrp) - 1
        if rank[order[-1]] == n - 1:
            return order
        k *= 2


def _lcp_at_least(buf: np.ndarray, a: np.ndarray, b: np.ndarray, L: int) -> np.ndarray:
    """For suffix starts a[i], b[i]: does LCP(buf[a:], buf[b:]) >= L, with the
    NUL separator treated as never matching (no cross-document spans)?
    Vectorized: L passes over the (shrinking) candidate set."""
    n = len(buf)
    ok = np.ones(len(a), dtype=bool)
    idx = np.arange(len(a))
    for d in range(L):
        ai, bi = a[idx] + d, b[idx] + d
        valid = (ai < n) & (bi < n)
        eq = np.zeros(len(idx), dtype=bool)
        vv = np.nonzero(valid)[0]
        if len(vv):
            ca, cb = buf[ai[vv]], buf[bi[vv]]
            eq[vv] = (ca == cb) & (ca != 0)
        ok[idx[~eq]] = False
        idx = idx[eq]
        if not len(idx):
            break
    return ok


class SuffixArrayEdges:
    """map_batches stage: one partition's captions -> substr edges.

    Batch size should be large (whole-block) — the pass is exact *within* the
    batch; cross-batch pairs are covered by the winnowing rendezvous.
    """

    def __init__(self, cfg: DedupConfig, id_col: str = "image_id", text_col: str = "caption"):
        self.cfg = cfg
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        L = self.cfg.substring_min_len
        cap = normalize_captions(batch[self.text_col])
        ids = batch[self.id_col].cast(pa.string()).to_pandas().to_numpy()
        bufs, offs = H._arrow_flat_buffer(cap)
        bufs = bufs[offs[0]: offs[-1]]
        offs = offs - offs[0]
        n_docs = len(offs) - 1
        # interleave NUL separators: doc i occupies [offs[i]+i, offs[i+1]+i)
        total = int(offs[-1]) + n_docs
        buf = np.zeros(total, dtype=np.uint8)
        pos = np.arange(int(offs[-1]), dtype=np.int64)
        doc_of_byte = np.searchsorted(offs, pos, side="right") - 1
        buf[pos + doc_of_byte] = bufs
        doc_starts = offs + np.arange(n_docs + 1)

        sa = suffix_array(buf)
        if len(sa) < 2:
            return _empty_edges()
        ok = _lcp_at_least(buf, sa[:-1], sa[1:], L)
        if not ok.any():
            return _empty_edges()

        # runs of adjacent suffixes sharing an >=L prefix
        run_id = np.concatenate([[0], np.cumsum(~ok)])  # len == len(sa)
        keep = np.zeros(len(sa), dtype=bool)
        keep[:-1] |= ok
        keep[1:] |= ok
        sa_k, run_k = sa[keep], run_id[keep]
        doc_k = np.searchsorted(doc_starts, sa_k, side="right") - 1
        # star edges per run over distinct docs, src = lexicographically
        # smallest doc_id — all vectorized on integer doc indices (a pandas
        # string-groupby here was 2/3 of the whole stage's CPU)
        stride = np.int64(n_docs + 1)
        uk = np.unique(run_k.astype(np.int64) * stride + doc_k)
        run_u, doc_u = uk // stride, uk % stride
        str_rank = np.empty(n_docs, dtype=np.int64)
        str_rank[np.argsort(ids)] = np.arange(n_docs)
        order2 = np.lexsort((str_rank[doc_u], run_u))
        ru, du = run_u[order2], doc_u[order2]
        new = np.concatenate([[True], ru[1:] != ru[:-1]])
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(ru)))
        run_slot = np.cumsum(new) - 1
        src_doc = du[starts][run_slot]          # min-id doc of each row's run
        keep2 = (counts >= 2)[run_slot] & (du != src_doc)
        if not keep2.any():
            return _empty_edges()
        upk = np.unique(src_doc[keep2].astype(np.int64) * stride + du[keep2])
        return pa.table(
            {
                "src": pa.array(ids[upk // stride], pa.string()),
                "dst": pa.array(ids[upk % stride], pa.string()),
                "kind": pa.array(["substr"] * len(upk), pa.string()),
                "sc": pa.array(np.zeros(len(upk), np.int8)),
            }
        )


def _empty_edges() -> pa.Table:
    return pa.table(
        {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string()),
         "kind": pa.array([], pa.string()), "sc": pa.array([], pa.int8())}
    )


class WinnowFingerprints:
    """map_batches stage: captions -> (band=3000, bucket=minimizer, salt=0, id).

    Winnowing (Schleimer et al., public algorithm): per document, hash every
    Lmin-gram; slide a w-gram window; keep each window's min hash. Guarantee:
    any shared substring of length >= Lmin + w - 1 yields a shared minimizer.
    """

    def __init__(self, cfg: DedupConfig, id_col: str = "image_id", text_col: str = "caption"):
        self.cfg = cfg
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        L, w = cfg.substring_min_len, cfg.winnow_window
        # gram length k = L - w + 1 so the winnowing guarantee (shared
        # substring >= k + w - 1 yields a shared minimizer) covers EXACTLY
        # >= L — with k = L the guarantee was only >= L + w - 1, silently
        # missing shared substrings of L..L+w-2 chars spanning partitions.
        # A shared k-gram minimizer proves only a k-char overlap, so these
        # edges are emitted as kind='substr_cand' and verified exactly
        # (L-gram intersection) in verify_substring_candidates.
        k = max(L - w + 1, 1)
        cap = normalize_captions(batch[self.text_col])
        ids = batch[self.id_col].cast(pa.string()).to_pandas().to_numpy()
        grams, offs = H.shingle_window_hashes(cap, k)
        n_docs = len(offs) - 1
        counts = offs[1:] - offs[:-1]

        # sliding-window min over each doc's gram hashes, vectorized via a
        # strided (m-w+1, w) view per flat array with per-doc masking
        out_fp: list[np.ndarray] = []
        out_doc: list[np.ndarray] = []
        # windows fully inside one doc: start s in [offs[i], offs[i+1]-w]
        win_counts = np.maximum(counts - w + 1, 0)
        # docs shorter than w grams: single minimizer over all its grams
        short = (counts < w) & (counts > 0)
        if len(grams):
            sw = np.lib.stride_tricks.sliding_window_view(grams, min(w, len(grams)))
            if sw.shape[1] == w:
                mins_all = sw.min(axis=1)
                long_docs = np.nonzero(win_counts > 0)[0]
                if len(long_docs):
                    reps = win_counts[long_docs]
                    src = np.repeat(offs[long_docs], reps) + H._ranges(reps)
                    out_fp.append(mins_all[src])
                    out_doc.append(np.repeat(long_docs, reps))
        sd = np.nonzero(short)[0]
        if len(sd):
            # per-doc min over that doc's own gram range: reduceat over the
            # starts of ALL non-empty docs (consecutive starts delimit each
            # doc), then select the short ones. reduceat over offs[sd] alone
            # would span every doc between two short ones.
            nonempty = counts > 0
            per_doc_min = np.minimum.reduceat(grams, offs[:-1][nonempty])
            dm = np.zeros(n_docs, dtype=grams.dtype)
            dm[nonempty] = per_doc_min
            out_fp.append(dm[sd])
            out_doc.append(sd)

        if not out_fp:
            return pa.table({"band": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             "salt": pa.array([], pa.int64()),
                             "image_id": pa.array([], pa.string()),
                             "ph": pa.array([], pa.int64()),
                             "sh": pa.array([], pa.int64())})
        fp = np.concatenate(out_fp)
        doc = np.concatenate(out_doc)
        # dedupe (doc, fp)
        key = H.hash_u64_pair(fp, doc.astype(np.uint64))
        _, first = np.unique(key, return_index=True)
        fp, doc = fp[first], doc[first]
        return pa.table(
            {
                "band": pa.array(np.full(len(fp), BAND_SUBSTR, np.int64)),
                "bucket": pa.array(H.bitcast_u64_to_i64(fp), pa.int64()),
                "salt": pa.array(np.zeros(len(fp), np.int64)),
                "image_id": pa.array(ids[doc], pa.string()),
                "ph": pa.array(np.zeros(len(fp), np.int64)),
                "sh": pa.array(np.zeros(len(fp), np.int64)),
            }
        )


def suffix_array_edges(
    input_ds: ray.data.Dataset,
    cfg: DedupConfig,
    id_col: str = "image_id",
    text_col: str = "caption",
) -> ray.data.Dataset:
    """Per-partition suffix-array pass -> (src, dst, kind='substr') edges.

    Repartitioned to one ``sa_batch_size`` block per task: map_batches
    parallelism is per-BLOCK, and parquet reads of a small caption column
    can arrive in a handful of blocks, serializing the most expensive
    kernel in the edges stage (measured: effective parallelism ~4 of 32
    at 60k rows before; every CPU busy after). The moved bytes are only
    (id, caption) — the payload column never enters this exchange."""
    lean = input_ds.select_columns([id_col, text_col]) \
        .repartition(target_num_rows_per_block=cfg.sa_batch_size)
    return lean.map_batches(
        SuffixArrayEdges(cfg, id_col, text_col),
        batch_format="pyarrow",
        batch_size=cfg.sa_batch_size,
    )


class GramFingerprints:
    """Every distinct L-gram rolling hash of each normalized caption as a
    bucket key (band 4000, ``BAND_SUBSTR_EXACT``).

    Sharing a substring of >= L chars is EQUIVALENT to sharing an L-gram, so
    bucket co-membership PROVES the link: edges from these buckets are
    trusted 'substr' with no verification join, and hot-bucket star/
    ambassador links are true by construction (every member shares the
    bucket's gram — transitive). This closes the winnowing mode's hot-bucket
    gap, where docs sharing only a popular k-char minimizer (k < L) were
    salted apart and boundary pairs sharing exactly ~L chars lost their
    direct edge. Cost: ~(len-L+1) keys/doc instead of ~2·len/w — linear in
    text size, and the keys are u64s feeding the same partial-agg stats
    shuffle. u64 collision odds are the engine's standard (~n_grams^2/2^64).
    """

    def __init__(self, cfg: DedupConfig, id_col: str = "image_id", text_col: str = "caption"):
        self.cfg = cfg
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        L = self.cfg.substring_min_len
        cap = normalize_captions(batch[self.text_col])
        ids = batch[self.id_col].cast(pa.string()).to_pandas().to_numpy()
        grams, offs = H.shingle_window_hashes(cap, L)
        counts = (offs[1:] - offs[:-1]).astype(np.int64)
        doc = np.repeat(np.arange(len(counts)), counts)
        # dedupe (doc, gram): in-doc repeats would emit self-pairs
        key = H.hash_u64_pair(grams, doc.astype(np.uint64))
        _, first = np.unique(key, return_index=True)
        fp, doc = grams[first], doc[first]
        return pa.table(
            {
                "band": pa.array(np.full(len(fp), lsh.BAND_SUBSTR_EXACT, np.int64)),
                "bucket": pa.array(H.bitcast_u64_to_i64(fp), pa.int64()),
                "salt": pa.array(np.zeros(len(fp), np.int64)),
                "image_id": pa.array(ids[doc], pa.string()),
                "ph": pa.array(np.zeros(len(fp), np.int64)),
                "sh": pa.array(np.zeros(len(fp), np.int64)),
            }
        )


def substring_buckets(
    input_ds: ray.data.Dataset,
    cfg: DedupConfig,
    id_col: str = "image_id",
    text_col: str = "caption",
) -> ray.data.Dataset:
    """Substring-rendezvous bucket rows for the main LSH bucket stream —
    UNIONED in so stats/salting/edge emission run ONCE for every candidate
    family. Mode per ``cfg.substring_rendezvous``: 'grams' (default, exact
    trusted edges) or 'winnow' (sparser keys, candidates need the exact
    L-gram verification join)."""
    lean = input_ds.select_columns([id_col, text_col])
    fp_cls = (GramFingerprints if cfg.substring_rendezvous == "grams"
              else WinnowFingerprints)
    return lean.map_batches(
        fp_cls(cfg, id_col, text_col),
        batch_format="pyarrow",
        batch_size=cfg.text_batch_size,
    )


def winnow_buckets(
    input_ds: ray.data.Dataset,
    cfg: DedupConfig,
    id_col: str = "image_id",
    text_col: str = "caption",
) -> ray.data.Dataset:
    """Winnowing fingerprints as (band=3000, bucket, salt, image_id) rows."""
    lean = input_ds.select_columns([id_col, text_col])
    return lean.map_batches(
        WinnowFingerprints(cfg, id_col, text_col),
        batch_format="pyarrow",
        batch_size=cfg.text_batch_size,
    )


def verify_substring_candidates(
    cand_edges: ray.data.Dataset,
    captions_ds: ray.data.Dataset,
    cfg: DedupConfig,
    id_col: str = "image_id",
    text_col: str = "caption",
) -> ray.data.Dataset:
    """'substr_cand' edges -> exactly-verified (kind='substr') edges.

    Sharing a substring of >= L chars is EQUIVALENT to sharing at least one
    L-gram, so the check attaches both captions (size-dispatched joins) and
    intersects the pairs' L-gram rolling-hash sets — one global vectorized
    np.intersect1d over (pair_idx, gram) composite keys per batch, no
    per-pair Python loop. u64 hash equality stands in for string equality
    (same collision standard as the rest of the engine)."""
    from deduplication_ray.stages.join import lookup_join

    L = cfg.substring_min_len
    lean = captions_ds.select_columns([id_col, text_col])

    def proj(key: str, cap: str):
        # map_batches(pyarrow) also coerces pandas-block datasets to Arrow
        return lambda t: pa.table({key: t[id_col].cast(pa.string()),
                                   cap: t[text_col]})

    src_side = lean.map_batches(proj("src", "cap_src"), batch_format="pyarrow")
    dst_side = lean.map_batches(proj("dst", "cap_dst"), batch_format="pyarrow")
    e = lookup_join(cand_edges, src_side, on=["src"], cfg=cfg)
    e = lookup_join(e, dst_side, on=["dst"], cfg=cfg)

    def check(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return _empty_edges()
        gs, offs_s = H.shingle_window_hashes(normalize_captions(t["cap_src"]), L)
        gd, offs_d = H.shingle_window_hashes(normalize_captions(t["cap_dst"]), L)
        cnt_s = (offs_s[1:] - offs_s[:-1]).astype(np.int64)
        cnt_d = (offs_d[1:] - offs_d[:-1]).astype(np.int64)
        idx = np.arange(n, dtype=np.uint64)
        ka = H.hash_u64_pair(np.repeat(idx, cnt_s), gs)
        kb = H.hash_u64_pair(np.repeat(idx, cnt_d), gd)
        common = np.intersect1d(ka, kb)
        hit_pairs = np.unique(np.repeat(idx, cnt_s)[np.isin(ka, common)])
        hit = np.zeros(n, dtype=bool)
        hit[hit_pairs.astype(np.int64)] = True
        # a pair that was ALSO an LSH candidate (kind != substr_cand) is not
        # dropped on substring failure — it keeps its signature kind and
        # falls through to the Hamming/Jaccard verification stage, so either
        # check passing keeps the edge
        kind_np = np.asarray(t["kind"].to_pylist())
        keep = hit | (kind_np != "substr_cand")
        kind_out = np.where(hit, "substr", kind_np)[keep]
        out = t.select(["src", "dst"]).filter(pa.array(keep))
        return pa.table({
            "src": out["src"], "dst": out["dst"],
            "kind": pa.array(kind_out, pa.string()),
            "sc": pa.array(np.zeros(out.num_rows, np.int8)),
        })

    return e.map_batches(check, batch_format="pyarrow")


def split_and_verify_substring(
    edges: ray.data.Dataset,
    captions_ds: ray.data.Dataset,
    cfg: DedupConfig,
    id_col: str = "image_id",
    text_col: str = "caption",
) -> ray.data.Dataset:
    """Route substring candidates through exact L-gram verification.

    A candidate is any non-trusted edge whose per-pair ``sc`` flag is set
    (the pair shared a winnow minimizer in SOME band instance — the kept
    kind may be a signature kind after cross-band dedupe) or whose kind is
    'substr_cand'. Verified hits become trusted 'substr'; misses that also
    hold a signature kind fall through to Hamming/Jaccard verification."""
    import pyarrow.compute as pc

    def cand_mask(t: pa.Table):
        m = pc.equal(t["kind"], "substr_cand")
        if "sc" in t.column_names:
            m = pc.or_(m, pc.equal(t["sc"], 1))
        trusted = pc.is_in(t["kind"],
                           value_set=pa.array(["exact", "cap_exact", "substr"]))
        return pc.and_(m, pc.invert(trusted))

    cand = edges.map_batches(
        lambda t: t.filter(cand_mask(t)), batch_format="pyarrow")
    rest = edges.map_batches(
        lambda t: t.filter(pc.invert(cand_mask(t))), batch_format="pyarrow")
    ver = verify_substring_candidates(cand, captions_ds, cfg, id_col, text_col)
    return rest.union(ver)


def substring_edges(
    input_ds: ray.data.Dataset,
    cfg: DedupConfig,
    id_col: str = "image_id",
    text_col: str = "caption",
) -> ray.data.Dataset:
    """Standalone T11 (per-partition suffix array + winnow rendezvous).
    The pipelines instead union ``winnow_buckets`` into the main bucket
    stream; this composition exists for direct use/tests."""
    sa = suffix_array_edges(input_ds, cfg, id_col, text_col)
    win = lsh.edges_from_buckets(winnow_buckets(input_ds, cfg, id_col, text_col), cfg)
    deduped = lsh.dedupe_edges(sa.union(win), keep_sc=True)
    return split_and_verify_substring(deduped, input_ds, cfg, id_col, text_col)
