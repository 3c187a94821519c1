"""Deduplication suite over the documents table.

Exact dedup follows the reference's only dedup primitive (SELECT DISTINCT,
ogr/ogr_swq.h:322 SWQM_DISTINCT_LIST) generalized to content hashing; the
near-dup family (MinHash+LSH, SimHash, n-gram Jaccard) is the
training-data-pipeline extension. All stages are expressed Ray-Data-first:

  shingle/minhash per batch (vectorized)  ->  explode to (band, band_hash)
  rows  ->  groupby(band, band_hash)  ->  candidate pairs  ->  distinct
  ->  exact-Jaccard verify  ->  keep pairs >= threshold

The all-to-all shuffle only ever moves (band_id:int32, band_hash:uint64,
doc_id:int64) triples — never document text.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from gdal_ray.ops.relational import distinct, first_by
from gdal_ray.text.analysis import add_fingerprint

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _hash_tokens_fnv(tokens: list[str]) -> np.ndarray:
    """FNV-1a 64 over utf-8 token bytes (deterministic, seed-free)."""
    out = np.empty(len(tokens), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, tok in enumerate(tokens):
            h = _FNV_OFFSET
            for b in tok.encode("utf-8"):
                h = ((h ^ np.uint64(b)) * _FNV_PRIME) & _MASK
            out[i] = h
    return out


def _shingle_hashes(text: str, w: int) -> np.ndarray:
    """Hashes of word w-shingles: combine consecutive token hashes with a
    rolling mix (vectorized over shingles)."""
    tokens = text.split()
    if len(tokens) < w:
        tokens = tokens + ["\x00"] * (w - len(tokens))
    th = _hash_tokens_fnv(tokens)
    n = len(th) - w + 1
    acc = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(w):
            acc = acc * np.uint64(1000003) + th[j : j + n]
    return np.unique(acc)


class MinHasher:
    """Actor-pool stage: permutation parameters built once per actor.

    minhash_i(doc) = min over shingles s of (a_i * h(s) + b_i) mod 2^61-1.
    num_perm = bands * rows_per_band.
    """

    MERSENNE = np.uint64((1 << 61) - 1)

    def __init__(self, num_perm: int = 128, shingle_w: int = 3, text_col: str = "text"):
        rng = np.random.RandomState(42)  # fixed seed: signatures are join keys
        self.a = rng.randint(1, 1 << 61, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, 1 << 61, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.w = shingle_w
        self.text_col = text_col

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text or "", self.w) & self.MERSENNE
        with np.errstate(over="ignore"):
            m = (self.a[:, None] * sh[None, :] + self.b[:, None]) % self.MERSENNE
        return m.min(axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        sigs = np.stack([self.signature(s) for s in texts]) if texts else np.zeros(
            (0, self.num_perm), dtype=np.uint64
        )
        return t.append_column(
            "minhash", pa.FixedSizeListArray.from_arrays(pa.array(sigs.ravel()), self.num_perm)
        )


def minhash_bands(ds, id_col: str, *, num_perm=128, bands=16, text_col="text", shingle_w=3):
    """documents -> (doc_id, band_id, band_hash) rows (LSH banding)."""
    rows_per_band = num_perm // bands

    # autoscaling pool (1, 4): never reserves the whole node — a fixed pool
    # that takes every CPU starves the upstream read stage
    sig_ds = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_w": shingle_w, "text_col": text_col},
        batch_format="pyarrow",
        batch_size=None,
        concurrency=(1, 4),
    )

    def bandify(t: pa.Table) -> pa.Table:
        n = len(t)
        sig = np.asarray(t["minhash"].combine_chunks().flatten()).reshape(n, num_perm)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        out_id = np.repeat(ids, bands)
        out_band = np.tile(np.arange(bands, dtype=np.int32), n)
        bh = np.zeros((n, bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            # hash each band's rows_per_band consecutive signature values
            for bnd in range(bands):
                seg = sig[:, bnd * rows_per_band : (bnd + 1) * rows_per_band]
                h = np.full(n, 14695981039346656037, dtype=np.uint64)
                for r in range(rows_per_band):
                    h = (h ^ seg[:, r]) * _FNV_PRIME
                bh[:, bnd] = h
        return pa.table(
            {
                id_col: pa.array(out_id),
                "band_id": pa.array(out_band),
                "band_hash": pa.array(bh.reshape(-1)),
            }
        )

    return sig_ds.map_batches(bandify, batch_format="pyarrow", batch_size=None)


def minhash_candidate_pairs(ds, id_col: str, **kw):
    """LSH candidate pairs (id_a < id_b), distinct. The groupby key is
    (band_id, band_hash): only colliding bands meet, so the wide step is a
    shuffle of fixed-width triples."""
    banded = minhash_bands(ds, id_col, **kw)

    def pairs(g):
        ids = np.sort(g[id_col].to_numpy())
        if ids.size < 2 or ids.size > 200:  # degenerate mega-bucket guard (logged idea: salt)
            ia, ib = np.array([], dtype=ids.dtype), np.array([], dtype=ids.dtype)
        else:
            ii, jj = np.triu_indices(ids.size, k=1)
            ia, ib = ids[ii], ids[jj]
        import pandas as pd

        return pd.DataFrame({"id_a": ia, "id_b": ib})

    cand = banded.repartition(8).groupby(["band_id", "band_hash"]).map_groups(pairs, batch_format="pandas")
    return distinct(cand, ["id_a", "id_b"])


def exact_jaccard_pairs(ds, pairs_ds, id_col: str, *, text_col="text", shingle_w=3, threshold=0.5):
    """Verify candidate pairs with exact shingle-set Jaccard. The document
    shingle sets are broadcast once (ray.put) — valid because only candidate
    docs' shingles are needed; at 100 TB this becomes a hash-join of
    (id, shingles) against the pair list on id."""
    import ray

    cand = pairs_ds if isinstance(pairs_ds, pa.Table) else pa.concat_tables(
        pairs_ds.iter_batches(batch_size=None, batch_format="pyarrow") or [pa.table({"id_a": [], "id_b": []})]
    )
    needed = set(cand["id_a"].to_pylist()) | set(cand["id_b"].to_pylist())

    def collect(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t[id_col], value_set=pa.array(sorted(needed), type=t[id_col].type))
        sub = t.filter(mask)
        return sub.select([id_col, text_col])

    docs = pa.concat_tables(
        ds.map_batches(collect, batch_format="pyarrow", batch_size=None).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    shingles = {
        i: set(_shingle_hashes(s or "", shingle_w).tolist())
        for i, s in zip(docs[id_col].to_pylist(), docs[text_col].to_pylist())
    }
    rows = []
    for a, b in zip(cand["id_a"].to_pylist(), cand["id_b"].to_pylist()):
        sa, sb = shingles.get(a, set()), shingles.get(b, set())
        inter = len(sa & sb)
        union = len(sa | sb)
        j = inter / union if union else 0.0
        if j >= threshold:
            rows.append((a, b, round(j, 6)))
    if not rows:
        return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()), "jaccard": pa.array([], pa.float64())})
    ia, ib, jj = zip(*rows)
    return pa.table({"id_a": list(ia), "id_b": list(ib), "jaccard": list(jj)})


class SimHasher:
    """64-bit SimHash over token FNV hashes (sign of per-bit weighted sums)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.bit_masks = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def __call__(self, t: pa.Table) -> pa.Table:
        out = np.zeros(len(t), dtype=np.uint64)
        for i, s in enumerate(t[self.text_col].to_pylist()):
            toks = (s or "").split()
            if not toks:
                continue
            th = _hash_tokens_fnv(toks)
            bits = (th[:, None] & self.bit_masks[None, :]) != 0  # (n_tok, 64)
            score = bits.sum(axis=0) * 2 - len(toks)  # (+1/-1 sums)
            out[i] = np.uint64(self.bit_masks[score > 0].sum())
        return t.append_column("simhash", pa.array(out))


def exact_dedup(ds, id_col: str, text_col: str = "text"):
    """Exact dedup by content hash: md5 fingerprint -> hash-partitioned
    first-per-group (min id wins). Returns (fp, doc_id survivors)."""
    fp_ds = add_fingerprint(ds, text_col=text_col, out="fp")
    fp_ds = fp_ds.select_columns(["fp", id_col])
    return first_by(fp_ds, ["fp"], [id_col])
