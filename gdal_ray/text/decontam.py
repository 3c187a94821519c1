"""Test-set decontamination: flag / drop training documents that share any
word n-gram with a benchmark corpus (the public method of Brown et al. 2020
appendix C and Gao et al. 2020 "The Pile" §6; GPT-3 used 13-grams).

Ray shape: the benchmark side is SMALL by contract (test sets, not training
corpora) — its distinct n-gram hash set is computed once and broadcast via
`ray.put`; the training corpus then streams through ONE vectorized
membership `map_batches` (sorted-array `searchsorted` probe). No shuffle at
all — the op scales with corpus size only.

Hashes are the 64-bit FNV-1a token fold + rolling mix shared with the
MinHash pipeline (`gdal_ray.text.dedup`) — a collision marks a clean doc
contaminated at probability ~2^-64 per gram pair, acceptable for a filter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from gdal_ray.text.dedup import _rolling_shingles, _tokenize_whitespace


def _doc_ngram_hashes(texts, n: int):
    """(gram_hashes uint64, doc_index int64) for every word n-gram fully
    inside a doc; docs with < n tokens emit none (matching the SQL oracle's
    generate_series bound). Fully vectorized over the concatenated tokens."""
    th, ntok = _tokenize_whitespace(texts)
    starts = np.concatenate([[0], np.cumsum(ntok)[:-1]]).astype(np.int64)
    n_g = np.maximum(ntok - n + 1, 0)
    total = int(n_g.sum())
    if total == 0 or th.size < n:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    acc = _rolling_shingles(th, n)  # includes invalid cross-doc windows
    g_starts = np.concatenate([[0], np.cumsum(n_g)[:-1]]).astype(np.int64)
    pos = np.repeat(starts, n_g) + (np.arange(total, dtype=np.int64)
                                    - np.repeat(g_starts, n_g))
    gram_doc = np.repeat(np.arange(ntok.size, dtype=np.int64), n_g)
    return acc[pos], gram_doc


def bench_ngram_set(bench, n: int, text_col: str = "text") -> np.ndarray:
    """Sorted distinct n-gram hashes of the benchmark corpus. Accepts a
    ray.data.Dataset, pa.Table, or sequence of strings. Per-batch distinct
    runs distributed; only the (small) unique hash set reaches the driver."""
    if isinstance(bench, (list, tuple)):
        gh, _ = _doc_ngram_hashes(pa.array(list(bench), pa.string()), n)
        return np.unique(gh)
    if isinstance(bench, pa.Table):
        gh, _ = _doc_ngram_hashes(pc.cast(bench[text_col], pa.string()), n)
        return np.unique(gh)

    def per_batch(t: pa.Table) -> pa.Table:
        gh, _ = _doc_ngram_hashes(pc.cast(t[text_col], pa.string()), n)
        return pa.table({"h": pa.array(np.unique(gh))})

    parts = bench.map_batches(per_batch, batch_format="pyarrow",
                              batch_size=None)
    from gdal_ray.util import to_arrow

    ht = to_arrow(parts)
    if ht.num_rows == 0:
        return np.empty(0, np.uint64)
    return np.unique(ht["h"].to_numpy(zero_copy_only=False))


def contamination_flags(ds, bench, n: int = 13, text_col: str = "text",
                        out: str = "contaminated"):
    """Append a boolean `out` column: True when the doc shares at least one
    word n-gram with the benchmark set."""
    import ray

    hset = np.ascontiguousarray(bench_ngram_set(bench, n, text_col))
    ref = ray.put(hset)

    def f(t: pa.Table) -> pa.Table:
        hs = ray.get(ref)
        hit = np.zeros(len(t), bool)
        if hs.size:
            gh, gdoc = _doc_ngram_hashes(pc.cast(t[text_col], pa.string()), n)
            if gh.size:
                idx = np.minimum(np.searchsorted(hs, gh), hs.size - 1)
                m = hs[idx] == gh
                hit[gdoc[m]] = True
        return t.append_column(out, pa.array(hit))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def decontaminate(ds, bench, n: int = 13, text_col: str = "text"):
    """Drop contaminated documents (the GPT-3/Pile decontamination filter)."""
    flagged = contamination_flags(ds, bench, n, text_col, out="__contam")

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(t["__contam"])).drop_columns(["__contam"])

    return flagged.map_batches(keep, batch_format="pyarrow", batch_size=None)
