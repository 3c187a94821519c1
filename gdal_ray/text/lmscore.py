"""Character-trigram language-model quality scoring — the CCNet/fastText
filtering idea (Wenzek et al. 2019, public): score each document by the
mean log-probability of its character trigrams under a model trained on a
trusted reference corpus; low scores flag gibberish / boilerplate.

Model: add-one-smoothed trigram-given-bigram,
    p(c3 | c1 c2) = (count(c1 c2 c3) + 1) / (count_prefix(c1 c2) + A)
with A = number of distinct characters in the reference corpus, and
count_prefix summed over trigram counts (so the denominator is defined
purely from trigram statistics — restatable in SQL). Documents shorter
than 3 chars score 0.

Ray shape: trigram counts reduce per-batch (exact lexsort grouping over
uint32 codes) through the vocabulary-sized `hash_partition_reduce`; the
model (sorted trigram-code array + counts + prefix table) broadcasts once
via `ray.put` (bounded by A^3, not the corpus); scoring is one streaming
`map_batches` with two `np.searchsorted` probes per batch. Codepoints are
capped at 0x10FFFF and folded to uint32 triple codes c1*2^21 + c2 + ...,
collision-free."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from gdal_ray.ops.relational import hash_partition_reduce

_SHIFT = np.uint64(21)  # > log2(0x110000)


def _doc_trigram_codes(texts):
    """(trigram codes uint64 flat, doc_of int64, n_chars int64 per doc).
    Codes pack the three codepoints; windows never cross documents."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.cast(pc.fill_null(texts, ""), pa.string())
    n_docs = len(texts)
    ascii_only = bool(pc.all(pc.equal(pc.utf8_length(texts),
                                      pc.binary_length(texts))).as_py()) \
        if n_docs else True
    if ascii_only and n_docs:
        # zero-copy: UTF-8 bytes ARE the codepoints. String-array offsets
        # live in buffers()[1] (int32; int64 for large_string).
        bufs = texts.buffers()
        odt = np.int64 if pa.types.is_large_string(texts.type) else np.int32
        raw_off = np.frombuffer(
            bufs[1], odt, count=n_docs + 1,
            offset=texts.offset * np.dtype(odt).itemsize).astype(np.int64)
        nch = np.diff(raw_off)
        flat = np.frombuffer(
            bufs[2], np.uint8, count=int(raw_off[-1] - raw_off[0]),
            offset=int(raw_off[0])).astype(np.uint64)
    else:
        joined = texts.to_pylist()
        nch = np.array([len(s) for s in joined], np.int64)
        flat = np.frombuffer("".join(joined).encode("utf-32-le"),
                             dtype=np.uint32).astype(np.uint64) \
            if int(nch.sum()) else np.empty(0, np.uint64)
    total = int(nch.sum())
    if total == 0:
        return (np.empty(0, np.uint64), np.empty(0, np.int64), nch)
    doc_of_char = np.repeat(np.arange(n_docs, dtype=np.int64), nch)
    if total < 3:
        return (np.empty(0, np.uint64), np.empty(0, np.int64), nch)
    code = (flat[:-2] << (np.uint64(2) * _SHIFT)) | \
           (flat[1:-1] << _SHIFT) | flat[2:]
    same = doc_of_char[:-2] == doc_of_char[2:]
    return code[same], doc_of_char[:-2][same], nch


def train_trigram_counts(ref_ds, text_col: str = "text"):
    """Dataset of (code uint64, cnt int64) trigram counts over the
    reference corpus — exact, vocabulary-sized shuffle."""

    def partial(t: pa.Table) -> pa.Table:
        code, _, _ = _doc_trigram_codes(t[text_col])
        if code.size == 0:
            return pa.table({"code": pa.array([], pa.uint64()),
                             "cnt": pa.array([], pa.int64())})
        u, c = np.unique(code, return_counts=True)
        return pa.table({"code": pa.array(u),
                         "cnt": pa.array(c.astype(np.int64))})

    parts = ref_ds.map_batches(partial, batch_format="pyarrow",
                               batch_size=None)

    def reduce_tbl(t: pa.Table) -> pa.Table:
        code = t["code"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        order = np.argsort(code, kind="stable")
        code, cnt = code[order], cnt[order]
        new = np.ones(code.size, bool)
        new[1:] = code[1:] != code[:-1]
        gid = np.cumsum(new) - 1
        tot = np.bincount(gid, weights=cnt).astype(np.int64) \
            if gid.size else np.zeros(0, np.int64)
        return pa.table({"code": pa.array(code[new]), "cnt": pa.array(tot)})

    return hash_partition_reduce(parts, ["code"], reduce_tbl)


def _build_model(tri_tbl: pa.Table):
    """-> (sorted trigram codes, counts, sorted prefix codes, prefix
    counts, alphabet size). Prefix = leading two codepoints."""
    code = tri_tbl["code"].to_numpy(zero_copy_only=False).astype(np.uint64)
    cnt = tri_tbl["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(code, kind="stable")
    code, cnt = code[order], cnt[order]
    pref = code >> _SHIFT
    po = np.argsort(pref, kind="stable")
    ps, pc_ = pref[po], cnt[po]
    new = np.ones(ps.size, bool)
    new[1:] = ps[1:] != ps[:-1]
    gid = np.cumsum(new) - 1
    ptot = np.bincount(gid, weights=pc_).astype(np.int64) \
        if gid.size else np.zeros(0, np.int64)
    mask = np.uint64((1 << 21) - 1)
    chars = np.unique(np.concatenate([
        code & mask, (code >> _SHIFT) & mask, code >> (np.uint64(2) * _SHIFT)]))
    return code, cnt, ps[new], ptot, int(chars.size)


def lm_score(ds, ref_ds, text_col: str = "text", out: str = "lm_score",
             round_digits: int | None = 6):
    """Append the mean trigram log-probability column (natural log,
    add-one smoothing, denominator alphabet-size A from the reference).
    Higher = more reference-like; short docs (<3 chars) get 0."""
    import ray

    from gdal_ray.util import to_arrow

    tri = to_arrow(train_trigram_counts(ref_ds, text_col))
    model_ref = ray.put(_build_model(tri))

    def score(t: pa.Table) -> pa.Table:
        code_s, cnt_s, pref_s, ptot_s, A = ray.get(model_ref)
        tcode, doc_of, _ = _doc_trigram_codes(t[text_col])
        n = len(t)
        sums = np.zeros(n, np.float64)
        cnts = np.zeros(n, np.int64)
        if tcode.size:
            ti = np.minimum(np.searchsorted(code_s, tcode),
                            max(code_s.size - 1, 0))
            thit = (code_s.size > 0) & (code_s[ti] == tcode)
            tc = np.where(thit, cnt_s[ti] if code_s.size else 0, 0)
            pref = tcode >> _SHIFT
            pi = np.minimum(np.searchsorted(pref_s, pref),
                            max(pref_s.size - 1, 0))
            phit = (pref_s.size > 0) & (pref_s[pi] == pref)
            pcnt = np.where(phit, ptot_s[pi] if pref_s.size else 0, 0)
            lp = np.log((tc + 1.0) / (pcnt + float(A)))
            np.add.at(sums, doc_of, lp)
            np.add.at(cnts, doc_of, 1)
        with np.errstate(invalid="ignore"):
            mean = np.where(cnts > 0, sums / np.maximum(cnts, 1), 0.0)
        if round_digits is not None:
            p = 10.0 ** round_digits
            mean = np.floor(np.abs(mean) * p + 0.5) / p * np.sign(mean)
        return t.append_column(out, pa.array(mean))

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)
