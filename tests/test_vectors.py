"""Embedding-column stats + distributed k-means vs driver-side references."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from gdal_ray.sim.vectors import kmeans_assign, kmeans_fit, vector_dim_stats
from gdal_ray.util import sf_path, to_arrow


def test_vector_dim_stats_matches_duckdb(ray_session, sf_dir):
    ds = rd.read_parquet(sf_path(sf_dir, "embeddings"),
                         columns=["embedding"]).repartition(6)
    got = vector_dim_stats(ds).to_pandas()
    con = duckdb.connect()
    exp = con.execute(f"""
        WITH e AS (
          SELECT unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x,
                 generate_subscripts(embedding, 1) AS i
          FROM read_parquet('{sf_path(sf_dir, "embeddings")}')
        )
        SELECT i, ROUND(AVG(x), 6) AS mean, ROUND(STDDEV_POP(x), 6) AS std
        FROM e GROUP BY i ORDER BY i""").fetchdf()
    assert got["i"].tolist() == exp["i"].tolist()
    assert np.allclose(got["mean"], exp["mean"], atol=2e-6)
    assert np.allclose(got["std"], exp["std"], atol=2e-6)


def test_kmeans_matches_numpy_lloyds(ray_session, sf_dir):
    """Distributed fit+assign == a driver-side numpy Lloyd's run with the
    same deterministic smallest-id init."""
    t = pq.read_table(sf_path(sf_dir, "embeddings"),
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    X = np.asarray(t["embedding"].combine_chunks().flatten(),
                   dtype=np.float64).reshape(len(t), -1)
    k, iters = 5, 7
    order = np.argsort(ids)
    cents = X[order[:k]]
    for _ in range(iters):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        for j in range(k):
            if (a == j).any():
                cents[j] = X[a == j].mean(axis=0)
    want = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)

    ds = rd.read_parquet(sf_path(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"]).repartition(5)
    c2 = kmeans_fit(ds, k=k, iters=iters)
    assert np.allclose(np.sort(c2, axis=0), np.sort(cents, axis=0), atol=1e-8)
    got = to_arrow(kmeans_assign(ds, c2)).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    lookup = dict(zip(ids, want))
    assert got["cluster"].tolist() == [lookup[v] for v in got["vec_id"]]


def test_embedding_decontaminate_matches_numpy(ray_session, sf_dir):
    """flag + drop modes vs a driver-side max-cosine recompute."""
    from gdal_ray.sim.vectors import embedding_decontaminate

    t = pq.read_table(sf_path(sf_dir, "embeddings"),
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    X = np.asarray(t["embedding"].combine_chunks().flatten(),
                   dtype=np.float64).reshape(len(t), -1)
    bmask = ids % 50 == 0
    B = X[bmask]
    Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    want = (Xn[~bmask] @ Bn.T).max(axis=1)

    ds = rd.read_parquet(sf_path(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"]).repartition(4)

    def drop_bench(tb):
        m = tb["vec_id"].to_numpy(zero_copy_only=False) % 50 != 0
        return tb.filter(pa.array(m))

    corpus = ds.map_batches(drop_bench, batch_format="pyarrow",
                            batch_size=None)
    got = to_arrow(embedding_decontaminate(
        corpus, pa.table({"embedding": t["embedding"].filter(
            pa.array(bmask))}), threshold=0.25)).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    lookup = dict(zip(ids[~bmask], want))
    exp = np.array([lookup[v] for v in got["vec_id"]])
    assert np.allclose(got["max_sim"], np.round(exp, 4), atol=1e-12)
    assert (got["contaminated"].to_numpy() == (exp >= 0.25)).all()

    dropped = to_arrow(embedding_decontaminate(
        corpus, B, threshold=0.25, mode="drop"))
    assert len(dropped) == int((want < 0.25).sum())


def test_semdedup_survivors_match_bruteforce(ray_session, sf_dir):
    """keep flags == per-cluster union-find over the cosine threshold
    graph, recomputed on the driver from the RETURNED cluster labels
    (independent of how k-means placed them)."""
    from gdal_ray.sim.vectors import semdedup

    thr = 0.35
    ds = rd.read_parquet(sf_path(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"]).repartition(5)
    got = to_arrow(semdedup(ds, k=8, threshold=thr, iters=5)).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)

    t = pq.read_table(sf_path(sf_dir, "embeddings"),
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    X = np.asarray(t["embedding"].combine_chunks().flatten(),
                   dtype=np.float64).reshape(len(t), -1)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    by_id = {v: i for i, v in enumerate(ids)}

    assert set(got["vec_id"]) == set(ids)
    for cl, grp in got.groupby("cluster"):
        gids = np.sort(grp["vec_id"].to_numpy())
        idx = np.array([by_id[v] for v in gids])
        sim = Xn[idx] @ Xn[idx].T
        n = len(gids)
        parent = list(range(n))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for a in range(n):
            for b in range(a + 1, n):
                if sim[a, b] >= thr:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        keep_want = {gids[i]: find(i) == i for i in range(n)}
        for _, row in grp.iterrows():
            assert row["keep"] == keep_want[row["vec_id"]], \
                f"cluster {cl} id {row['vec_id']}"
