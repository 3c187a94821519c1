"""Training-sequence preparation: token-window chunking and greedy
sequence packing.

Two ops an LLM training-data pipeline runs after curation, re-expressed
Ray-Data-first (the reference has no text stack; the public pattern is
the fixed-context packing described in e.g. Raffel et al. 2020 §3.1.2
"we pack multiple sequences into each batch"):

- ``chunk_documents``: split each document into windows of at most
  ``chunk_tokens`` whitespace tokens (optional overlap). Pure per-batch
  Arrow kernel — ONE tokenize (pc.split_pattern), flat-token index
  arithmetic in numpy, one pc.binary_join; no shuffle, no Python loop
  over rows. At 100 TB this is a free map stage.

- ``pack_sequences``: assign documents to training sequences of at most
  ``max_tokens`` tokens with the deterministic next-fit rule (docs in
  ascending id order inside each hash partition; a doc that doesn't fit
  opens the next sequence; an oversized doc occupies its own sequence).
  ONE hash shuffle of (id, n_tokens) pairs — text never moves; the
  packing kernel is O(#sequences) searchsorted steps on a cumulative-sum
  array, not O(#docs) Python iterations. seq_id = part * 2^32 + local
  index, so results are independent of Ray's block layout for a fixed
  ``num_parts``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_PART = "__pack_part"


def _token_lists(col) -> pa.ListArray:
    toks = pc.split_pattern(pc.cast(col, pa.string()), pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    return toks


def chunk_documents(ds, *, id_col: str = "doc_id", text_col: str = "text",
                    chunk_tokens: int, overlap: int = 0):
    """Dataset of (id_col, chunk_idx, chunk, n_tokens): each document's
    whitespace tokens re-joined into windows of ``chunk_tokens`` tokens,
    consecutive windows advancing by ``chunk_tokens - overlap``. DuckDB
    oracle shape (overlap=0): list slice of STRING_SPLIT + ARRAY_TO_STRING
    over a correlated generate_series."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap

    def kernel(t: pa.Table) -> pa.Table:
        toks = _token_lists(t[text_col])
        lens = pc.fill_null(pc.list_value_length(toks), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        doc_start = np.zeros(len(lens), np.int64)
        if len(lens) > 1:
            np.cumsum(lens[:-1], out=doc_start[1:])
        # chunks per doc: 1 + ceil(max(0, n - chunk)/stride); 0-token -> 1
        extra = np.maximum(lens - chunk_tokens, 0)
        nch = 1 + (extra + stride - 1) // stride
        total_ch = int(nch.sum())
        parent = np.repeat(np.arange(len(lens), dtype=np.int64), nch)
        ch_base = np.zeros(len(lens), np.int64)
        if len(lens) > 1:
            np.cumsum(nch[:-1], out=ch_base[1:])
        j = np.arange(total_ch, dtype=np.int64) - ch_base[parent]
        ch_len = np.minimum(chunk_tokens, lens[parent] - j * stride)
        ch_len = np.maximum(ch_len, 0)
        total_tok = int(ch_len.sum())
        ch_off = np.zeros(total_ch, np.int64)
        if total_ch > 1:
            np.cumsum(ch_len[:-1], out=ch_off[1:])
        intra = np.arange(total_tok, dtype=np.int64) - np.repeat(ch_off,
                                                                 ch_len)
        take = np.repeat(doc_start[parent] + j * stride, ch_len) + intra
        offsets = np.zeros(total_ch + 1, np.int64)
        np.cumsum(ch_len, out=offsets[1:])
        # int32 list offsets are safe: a batch's token total is bounded by
        # the block size, far under 2^31 elements
        chunks = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            flat.take(pa.array(take)) if total_tok else flat.slice(0, 0))
        return pa.table({
            id_col: t[id_col].take(pa.array(parent)),
            "chunk_idx": pa.array(j),
            "chunk": pc.binary_join(chunks, " "),
            "n_tokens": pa.array(ch_len),
        })

    return ds.map_batches(kernel, batch_format="pyarrow", batch_size=None)


def _next_fit(tokens: np.ndarray, max_tokens: int) -> np.ndarray:
    """Sequence index per doc (docs already in packing order): greedy
    next-fit. O(#sequences) searchsorted steps over the running sum."""
    n = tokens.size
    seq = np.empty(n, np.int64)
    cum = np.cumsum(tokens)
    pos = 0
    s = 0
    while pos < n:
        base = cum[pos - 1] if pos else 0
        j = int(np.searchsorted(cum, base + max_tokens, side="right"))
        if j == pos:  # oversized doc: own sequence
            j = pos + 1
        seq[pos:j] = s
        s += 1
        pos = j
    return seq


def pack_sequences(ds, *, id_col: str = "doc_id", text_col: str = "text",
                   token_col: str | None = None, max_tokens: int,
                   num_parts: int | None = None):
    """Dataset of (id_col, n_tokens, seq_id, seq_pos): every document
    assigned to a training sequence of at most ``max_tokens`` whitespace
    tokens (next-fit in ascending id order within each hash partition;
    oversized docs get a singleton sequence — truncate downstream).
    Only (id, token-count) pairs shuffle; pass ``token_col`` to reuse a
    precomputed count and skip tokenization entirely. Fix ``num_parts``
    for machine-independent seq_ids (default sizes to the cluster)."""
    from gdal_ray.util import default_num_parts

    if num_parts is None:
        num_parts = default_num_parts(multiplier=4, floor=64)

    def prep(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.int64())
        if token_col is not None:
            ntok = pc.cast(t[token_col], pa.int64())
        else:
            ntok = pc.cast(pc.list_value_length(
                _token_lists(t[text_col])), pa.int64())
        part = (ids.to_numpy(zero_copy_only=False)
                & 0x7FFFFFFFFFFFFFFF) % num_parts
        return pa.table({
            id_col: ids, "n_tokens": ntok, _PART: pa.array(part)})

    def pack(t: pa.Table) -> pa.Table:
        part = int(t[_PART][0].as_py())
        t = t.drop_columns([_PART])
        order = pc.sort_indices(t, sort_keys=[(id_col, "ascending")])
        t = t.take(order)
        toks = t["n_tokens"].to_numpy(zero_copy_only=False)
        seq = _next_fit(toks, max_tokens)
        # position within the sequence: index minus the sequence's first
        # index (sequences are contiguous runs after the id sort)
        pos = np.zeros(seq.size, np.int64)
        if seq.size:
            starts = np.flatnonzero(np.diff(seq, prepend=seq[0] - 1))
            first = np.repeat(starts, np.diff(np.append(starts, seq.size)))
            pos = np.arange(seq.size, dtype=np.int64) - first
        return pa.table({
            id_col: t[id_col], "n_tokens": t["n_tokens"],
            "seq_id": pa.array(seq + (part << 32)),
            "seq_pos": pa.array(pos)})

    parted = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    return parted.groupby(_PART).map_groups(pack, batch_format="pyarrow")
