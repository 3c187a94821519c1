"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — numpy matmul per batch against a
broadcast query matrix (ray.put once), per-batch partial top-k, then a
per-query final merge. The scale path is the LSH-bucketed variant
(random-hyperplane signatures -> only matching buckets are scanned),
mirroring the reference's gridding search (quadtree-bounded nearest
neighbours, alg/gdalgrid.cpp:257-377) re-expressed as a bucketed shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _matrix(t: pa.Table, col: str) -> np.ndarray:
    arr = t[col].combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    return flat.reshape(len(t), -1)


def brute_force_topk(ds, queries: np.ndarray, query_ids: np.ndarray, k: int,
                     *, id_col: str = "vec_id", vec_col: str = "embedding",
                     metric: str = "cosine", exclude_self: bool = True):
    """Top-k most-similar vectors per query. queries: (q, d) float64.

    Per-batch: one matmul (d x q) against the broadcast query matrix ->
    partial top-k per query -> rows (query_id, vec_id, score); final:
    groupby(query_id) merge of partials. Only q*k rows per block shuffle.
    """
    import ray

    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    qref = ray.put(qn if metric == "cosine" else queries)
    ids_ref = ray.put(np.asarray(query_ids))

    def partial(t: pa.Table) -> pa.Table:
        Q = ray.get(qref)          # (q, d) — zero-copy from local object store
        qids = ray.get(ids_ref)
        X = _matrix(t, vec_col)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if metric == "cosine":
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
            S = Xn @ Q.T           # (n, q)
        else:  # negative euclidean distance as similarity
            S = -np.sqrt(((X[:, None, :] - Q[None, :, :]) ** 2).sum(-1))
        n, q = S.shape
        kk = min(k + (1 if exclude_self else 0), n)
        out_q, out_id, out_s = [], [], []
        top = np.argpartition(-S, kk - 1, axis=0)[:kk]  # (kk, q)
        for j in range(q):
            cand = top[:, j]
            if exclude_self:
                cand = cand[ids[cand] != qids[j]]
            out_q.append(np.full(cand.size, qids[j]))
            out_id.append(ids[cand])
            out_s.append(S[cand, j])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_id)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).repartition(1)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        # single-task final merge (q*k*num_blocks rows), vectorized head-k
        df = df.sort_values(["query_id", "score", id_col],
                            ascending=[True, False, True], kind="mergesort")
        return df.groupby("query_id", sort=False).head(k).reset_index(drop=True)

    return partials.map_batches(merge, batch_format="pandas", batch_size=None)


def kmeans_centroids(X: np.ndarray, nlist: int, *, iters: int = 8, seed: int = 7) -> np.ndarray:
    """Tiny deterministic Lloyd's k-means for the IVF coarse quantizer
    (trained once on a driver-side sample — FAISS-IVF's train step)."""
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(nlist, len(X)), replace=False)].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                C[c] = X[m].mean(0)
    return C


def ivf_topk(ds, queries: np.ndarray, query_ids: np.ndarray, k: int,
             *, nlist: int = 16, nprobe: int = 4, train_sample: int = 2048,
             id_col: str = "vec_id", vec_col: str = "embedding",
             exclude_self: bool = True):
    """IVF approximate top-k (the scale path beyond LSH buckets): a coarse
    k-means quantizer partitions vectors into nlist inverted lists; each
    query scans only its nprobe nearest lists, so per-batch work drops by
    ~nprobe/nlist vs brute force. The centroid set is trained on a
    driver-side sample and broadcast; everything else streams.

    Returns (query_id, vec_id, score) rows, top-k per query (approximate:
    recall < 1 when the true neighbor's list isn't probed — brute_force_topk
    is the exactness baseline)."""
    import ray

    sample = pa.concat_tables(
        ds.limit(train_sample).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    C = kmeans_centroids(_matrix(sample, vec_col), nlist)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    # nprobe nearest centroids per query (cosine)
    probe = np.argsort(-(qn @ Cn.T), axis=1)[:, :nprobe]  # (q, nprobe)
    ref = ray.put((C, qn, np.asarray(query_ids), probe))

    def partial(t: pa.Table) -> pa.Table:
        Cb, Q, qids, P = ray.get(ref)
        X = _matrix(t, vec_col)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        d2 = ((X[:, None, :] - Cb[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(1)  # (n,)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        out_q, out_id, out_s = [], [], []
        for j in range(Q.shape[0]):
            m = np.isin(assign, P[j])
            if not m.any():
                continue
            s = Xn[m] @ Q[j]
            sub_ids = ids[m]
            kk = min(k + (1 if exclude_self else 0), s.size)
            cand = np.argpartition(-s, kk - 1)[:kk]
            if exclude_self:
                cand = cand[sub_ids[cand] != qids[j]]
            out_q.append(np.full(cand.size, qids[j]))
            out_id.append(sub_ids[cand])
            out_s.append(s[cand])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            id_col: pa.array(np.concatenate(out_id)),
            "score": pa.array(np.concatenate(out_s)),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).repartition(1)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_id", "score", id_col],
                            ascending=[True, False, True], kind="mergesort")
        return df.groupby("query_id", sort=False).head(k).reset_index(drop=True)

    return partials.map_batches(merge, batch_format="pandas", batch_size=None)


class HyperplaneLSH:
    """Random-hyperplane signature stage (actor pool): planes generated once
    per actor from a fixed seed; adds a `bucket` int64 column. ANN = only
    compare vectors within a bucket (plus optionally multi-probe neighbors)."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 42, vec_col: str = "embedding"):
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((n_planes, dim))
        self.vec_col = vec_col
        self.weights = (1 << np.arange(n_planes)).astype(np.int64)

    def __call__(self, t: pa.Table) -> pa.Table:
        X = _matrix(t, self.vec_col)
        bits = (X @ self.planes.T) > 0
        bucket = (bits * self.weights).sum(axis=1).astype(np.int64)
        return t.append_column("bucket", pa.array(bucket))


def lsh_topk(ds, queries: np.ndarray, query_ids: np.ndarray, k: int, dim: int,
             *, n_planes: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Approximate top-k: hash data + queries to hyperplane buckets, scan only
    the matching bucket per query. Recall < 1 by design; the brute-force path
    is the correctness baseline."""
    hasher = HyperplaneLSH(dim, n_planes=n_planes, vec_col=vec_col)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    qbits = (qn @ hasher.planes.T) > 0
    qbucket = (qbits * hasher.weights).sum(axis=1).astype(np.int64)
    by_bucket = {}
    for qb, qi, qv in zip(qbucket, query_ids, qn):
        by_bucket.setdefault(int(qb), []).append((qi, qv))

    import ray

    bref = ray.put(by_bucket)

    hashed = ds.map_batches(
        HyperplaneLSH,
        fn_constructor_kwargs={"dim": dim, "n_planes": n_planes, "vec_col": vec_col},
        batch_format="pyarrow",
        concurrency=2, batch_size=None,)

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        table = pa.Table.from_pandas(g, preserve_index=False)
        bucket = int(g["bucket"].iloc[0])
        qs = ray.get(bref).get(bucket, [])
        if not qs:
            return pd.DataFrame({"query_id": [], id_col: [], "score": []})
        X = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        ids = g[id_col].to_numpy()
        frames = []
        for qi, qv in qs:
            s = Xn @ qv
            order = np.lexsort((ids, -s))[: k + 1]
            order = order[ids[order] != qi][:k]
            frames.append(pd.DataFrame({"query_id": qi, id_col: ids[order], "score": s[order]}))
        return pd.concat(frames, ignore_index=True)

    return hashed.groupby("bucket").map_groups(scan, batch_format="pandas")
