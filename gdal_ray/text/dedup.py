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


def _hash_tokens_fnv(tokens) -> np.ndarray:
    """FNV-1a 64 over utf-8 token bytes — VECTORIZED across tokens.

    The Arrow string array gives (offsets, data) zero-copy; the sequential
    per-byte recurrence h = (h ^ b) * prime runs as one numpy op per BYTE
    POSITION (max token length iterations), not per byte: byte j of every
    token is folded simultaneously. Bit-identical to the scalar FNV-1a loop
    (numpy uint64 multiply wraps mod 2^64)."""
    if not isinstance(tokens, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(tokens, type=pa.string())
    else:
        arr = tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32,
                            count=n + 1, offset=arr.offset * 4).astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    starts = offsets[:-1]
    lengths = offsets[1:] - starts
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    max_len = int(lengths.max()) if n else 0
    with np.errstate(over="ignore"):
        for j in range(max_len):
            m = lengths > j
            b = data[np.minimum(starts + j, data.size - 1)].astype(np.uint64)
            h = np.where(m, (h ^ b) * _FNV_PRIME, h)
    return h


_SHINGLE_MIX = np.uint64(1000003)


def _rolling_shingles(th: np.ndarray, w: int) -> np.ndarray:
    """Rolling w-gram mix over a token-hash array: acc[p] covers tokens
    p..p+w-1."""
    n = th.size - w + 1
    acc = np.zeros(max(n, 0), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(w):
            acc = acc * _SHINGLE_MIX + th[j : j + n]
    return acc


def _shingle_hashes(text: str, w: int) -> np.ndarray:
    """Hashes of word w-shingles of ONE doc (unique set — used by the exact
    Jaccard verifier; the MinHash path uses the batched variant below)."""
    tokens = text.split()
    if len(tokens) < w:
        tokens = tokens + ["\x00"] * (w - len(tokens))
    return np.unique(_rolling_shingles(_hash_tokens_fnv(tokens), w))


def _batch_shingles(texts: list[str], w: int):
    """All docs of a batch at once: returns (shingle_hashes flat array,
    doc start offsets into it). Tokenization stays Python str.split (cheap,
    and guarantees signature parity with the per-doc path); hashing and the
    rolling mix are single vectorized passes over the concatenated tokens.
    Shingle windows crossing doc boundaries are masked out."""
    token_lists = []
    for s in texts:
        tk = (s or "").split()
        if len(tk) < w:
            tk = tk + ["\x00"] * (w - len(tk))
        token_lists.append(tk)
    ntok = np.array([len(tk) for tk in token_lists], dtype=np.int64)
    flat = [t for tk in token_lists for t in tk]
    th = _hash_tokens_fnv(flat)
    acc = _rolling_shingles(th, w)  # includes invalid cross-doc windows
    tok_starts = np.concatenate([[0], np.cumsum(ntok)[:-1]])
    n_sh = ntok - w + 1  # >= 1 by padding
    # valid shingle positions: tok_starts[d] .. tok_starts[d] + n_sh[d] - 1
    sh_starts = np.concatenate([[0], np.cumsum(n_sh)[:-1]])
    pos = np.repeat(tok_starts, n_sh) + (np.arange(int(n_sh.sum()), dtype=np.int64)
                                         - np.repeat(sh_starts, n_sh))
    return acc[pos], sh_starts


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

    # shingles per vectorized window: small enough that the (num_perm, CHUNK)
    # scratch stays cache-resident — measured ~60x faster than one big slab
    # (large uint64 temporaries are memory-bound AND % is an integer divide;
    # the in-place Mersenne fold below replaces the divide with shift/mask)
    _CHUNK = 512

    def _minhash_window(self, seg: np.ndarray, z: np.ndarray, tmp: np.ndarray) -> np.ndarray:
        """(a*sh + b) mod 2^61-1 for one shingle window, in-place.
        Bit-identical to `% MERSENNE` on the wrapped 64-bit products:
        z mod (2^61-1) = (z>>61) + (z&M), one conditional subtract. The
        subtract is branchless: min(r, r-M) — r-M wraps past 2^64 when
        r < M, so the minimum always picks the reduced value."""
        n = seg.size
        zv, tv = z[:, :n], tmp[:, :n]
        np.multiply(self.a[:, None], seg[None, :], out=zv)
        np.add(zv, self.b[:, None], out=zv)
        np.right_shift(zv, np.uint64(61), out=tv)
        np.bitwise_and(zv, self.MERSENNE, out=zv)
        np.add(zv, tv, out=zv)
        np.subtract(zv, self.MERSENNE, out=tv)
        np.minimum(zv, tv, out=zv)
        return zv

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        P = self.num_perm
        if not texts:
            sigs = np.zeros((0, P), dtype=np.uint64)
        else:
            sh_all, starts = _batch_shingles(texts, self.w)
            sh_all = sh_all & self.MERSENNE
            ends = np.concatenate([starts[1:], [sh_all.size]])
            nd = len(texts)
            sigs = np.empty((nd, P), dtype=np.uint64)
            z = np.empty((P, self._CHUNK), dtype=np.uint64)
            tmp = np.empty((P, self._CHUNK), dtype=np.uint64)
            d0 = 0
            with np.errstate(over="ignore"):
                while d0 < nd:
                    d1 = d0 + 1
                    while d1 < nd and ends[d1] - starts[d0] <= self._CHUNK:
                        d1 += 1
                    if d1 - d0 == 1 and ends[d0] - starts[d0] > self._CHUNK:
                        # one oversized doc: sub-chunk its shingles, fold mins
                        acc = np.full(P, np.iinfo(np.uint64).max, dtype=np.uint64)
                        for c0 in range(int(starts[d0]), int(ends[d0]), self._CHUNK):
                            seg = sh_all[c0 : min(c0 + self._CHUNK, int(ends[d0]))]
                            np.minimum(acc, self._minhash_window(seg, z, tmp).min(axis=1), out=acc)
                        sigs[d0] = acc
                    else:
                        seg = sh_all[starts[d0] : ends[d1 - 1]]
                        m = self._minhash_window(seg, z, tmp)
                        idx = (starts[d0:d1] - starts[d0]).astype(np.int64)
                        sigs[d0:d1] = np.minimum.reduceat(m, idx, axis=1).T
                    d0 = d1
        return t.append_column(
            "minhash", pa.FixedSizeListArray.from_arrays(pa.array(sigs.ravel()), P)
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


_EMPTY_PAIRS = pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})


def exact_jaccard_pairs(ds, pairs_ds, id_col: str, *, text_col="text", shingle_w=3, threshold=0.5):
    """Verify candidate pairs with exact shingle-set Jaccard — fully
    distributed. The (small) candidate-pair LIST is broadcast; documents
    stream through a map_batches that emits (pair_idx, side, shingle set)
    only for docs appearing in a pair; a groupby(pair_idx) co-locates each
    pair's two shingle sets and verifies inside the group. No document text
    or shingle set ever materializes on the driver — the driver only ever
    holds the pair list and the verified (id_a, id_b, jaccard) rows."""
    import pandas as pd
    import ray

    if isinstance(pairs_ds, pa.Table):
        cand = pairs_ds
    else:
        batches = list(pairs_ds.iter_batches(batch_size=None, batch_format="pyarrow"))
        cand = pa.concat_tables(batches) if batches else _EMPTY_PAIRS.select(["id_a", "id_b"])
    if cand.num_rows == 0:
        return _EMPTY_PAIRS
    ids_a = cand["id_a"].to_pylist()
    ids_b = cand["id_b"].to_pylist()
    memberships: dict = {}
    for p, (a, b) in enumerate(zip(ids_a, ids_b)):
        memberships.setdefault(a, []).append((p, 0))
        memberships.setdefault(b, []).append((p, 1))
    mem_ref = ray.put(memberships)
    pair_ids_ref = ray.put((np.asarray(ids_a), np.asarray(ids_b)))

    def emit(t: pa.Table) -> pa.Table:
        mem = ray.get(mem_ref)
        mask = pa.array([i in mem for i in t[id_col].to_pylist()])
        sub = t.filter(mask)
        out_pair, out_side, out_sh = [], [], []
        for d, s in zip(sub[id_col].to_pylist(), sub[text_col].to_pylist()):
            sh = _shingle_hashes(s or "", shingle_w)
            for p, side in mem[d]:
                out_pair.append(p)
                out_side.append(side)
                out_sh.append(sh)
        return pa.table({
            "pair": pa.array(out_pair, pa.int64()),
            "side": pa.array(out_side, pa.int32()),
            "sh": pa.array(out_sh, pa.list_(pa.uint64())),
        })

    emitted = ds.map_batches(emit, batch_format="pyarrow", batch_size=None)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:  # a candidate id missing from the corpus
            return pd.DataFrame({"pair": [], "jaccard": []})
        g = g.sort_values("side")
        sa = np.asarray(g["sh"].iloc[0], dtype=np.uint64)
        sb = np.asarray(g["sh"].iloc[1], dtype=np.uint64)
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = sa.size + sb.size - inter
        j = inter / union if union else 0.0
        return pd.DataFrame({"pair": [int(g["pair"].iloc[0])], "jaccard": [round(j, 6)]})

    out_batches = list(
        emitted.groupby("pair").map_groups(verify, batch_format="pandas")
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    if not out_batches:
        return _EMPTY_PAIRS
    res = pa.concat_tables(out_batches)
    res = res.filter(pc.greater_equal(res["jaccard"], threshold))
    pa_ids_a, pa_ids_b = ray.get(pair_ids_ref)
    pidx = res["pair"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({
        "id_a": pa.array(pa_ids_a[pidx], pa.int64()),
        "id_b": pa.array(pa_ids_b[pidx], pa.int64()),
        "jaccard": res["jaccard"],
    })


class SimHasher:
    """64-bit SimHash over token FNV hashes (sign of per-bit weighted sums)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.bit_masks = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def __call__(self, t: pa.Table) -> pa.Table:
        out = np.zeros(len(t), dtype=np.uint64)
        token_lists = [(s or "").split() for s in t[self.text_col].to_pylist()]
        ntok = np.array([len(tk) for tk in token_lists], dtype=np.int64)
        nonempty = np.nonzero(ntok > 0)[0]
        if nonempty.size:
            th = _hash_tokens_fnv([tok for tk in token_lists for tok in tk])
            # (total_tok, 64) uint8 bit matrix straight from the hash bytes;
            # summing per doc via reduceat(dtype=int32) avoids any wide
            # temporary (an int64 cast of the bit matrix was 50x slower)
            bits = np.unpackbits(th[:, None].view(np.uint8), axis=1, bitorder="little")
            ne_ntok = ntok[nonempty]
            seg_starts = np.concatenate([[0], np.cumsum(ne_ntok)[:-1]])
            sums = np.add.reduceat(bits, seg_starts, axis=0, dtype=np.int32)
            score = sums.astype(np.int64) * 2 - ne_ntok[:, None]  # (+1/-1 sums)
            sig = ((score > 0).astype(np.uint64) * self.bit_masks[None, :]).sum(axis=1)
            out[nonempty] = sig
        return t.append_column("simhash", pa.array(out))


def exact_dedup(ds, id_col: str, text_col: str = "text", *, merge: str = "tree"):
    """Exact dedup by content hash: md5 fingerprint -> first-per-group
    (min id wins). Returns (fp, doc_id survivors).

    merge="hash" is the at-scale mode: winners are hash-partitioned by
    fingerprint so no single task ever sees the whole survivor set (at
    north-star scale #distinct fingerprints ~ #docs)."""
    fp_ds = add_fingerprint(ds, text_col=text_col, out="fp")
    fp_ds = fp_ds.select_columns(["fp", id_col])
    return first_by(fp_ds, ["fp"], [id_col], merge=merge)
