"""Grid interpolators vs brute force; HLL accuracy."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from gdal_ray.ops.relational import count_distinct
from gdal_ray.ops.sketch import approx_count_distinct
from gdal_ray.stages.grid import grid_points
from gdal_ray.util import read_table, to_arrow


def _pts(n=2000):
    rng = np.random.RandomState(6)
    return pa.table(
        {"x": rng.uniform(0, 10, n), "y": rng.uniform(0, 10, n),
         "value": rng.uniform(0, 100, n)}
    )


def _brute(t, extent, cell, radius, method, power=2.0):
    x0, y0, x1, y1 = extent
    nx, ny = int(np.ceil((x1 - x0) / cell)), int(np.ceil((y1 - y0) / cell))
    x, y, v = (np.asarray(t[c]) for c in ("x", "y", "value"))
    out = {}
    for gx in range(nx):
        for gy in range(ny):
            cx, cy = x0 + (gx + 0.5) * cell, y0 + (gy + 0.5) * cell
            d2 = (x - cx) ** 2 + (y - cy) ** 2
            m = d2 <= radius * radius
            if not m.any():
                continue
            if method == "nearest":
                out[(gx, gy)] = v[m][np.argmin(d2[m])]
            elif method == "average":
                out[(gx, gy)] = v[m].mean()
            else:
                w = 1.0 / np.maximum(np.sqrt(d2[m]) ** power, 1e-12)
                out[(gx, gy)] = (w * v[m]).sum() / w.sum()
    return out


def test_grid_interpolators_match_bruteforce():
    t = _pts(800)
    extent = (0.0, 0.0, 10.0, 10.0)
    ds = rd.from_arrow(t)
    for method in ["invdist", "average", "nearest"]:
        got_t = to_arrow(grid_points(rd.from_arrow(t), extent=extent, cell=1.0,
                                     radius=1.5, method=method))
        got = {
            (r["gx"], r["gy"]): r["value"] for r in got_t.to_pylist()
        }
        exp = _brute(t, extent, 1.0, 1.5, method)
        assert set(got) == set(exp), method
        for k in exp:
            assert abs(got[k] - exp[k]) < 1e-9, (method, k)


def test_hll_within_error(sf_dir):
    ds = read_table(sf_dir, "lineitem", columns=["l_partkey"])
    est = approx_count_distinct(ds, "l_partkey")
    exact = count_distinct(read_table(sf_dir, "lineitem", columns=["l_partkey"]), "l_partkey")
    assert abs(est - exact) / exact < 0.06  # ~3 sigma for p=12


def test_grid_invdistnn_matches_bruteforce():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages.grid import grid_points
    from gdal_ray.util import to_arrow

    rng = np.random.RandomState(17)
    n = 400
    x = rng.uniform(0, 10, n)
    y = rng.uniform(0, 10, n)
    v = rng.uniform(0, 100, n)
    ds = rd.from_arrow(pa.table({"x": x, "y": y, "value": v}))
    cell, radius, N = 1.0, 2.0, 5
    out = to_arrow(grid_points(ds, extent=(0, 0, 10, 10), cell=cell,
                               radius=radius, method="invdistnn",
                               max_points=N)).to_pandas()
    assert len(out) > 0
    # brute-force check on a handful of cells
    for _, row in out.sample(n=10, random_state=1).iterrows():
        cx = (row.gx + 0.5) * cell
        cy = (row.gy + 0.5) * cell
        d2 = (x - cx) ** 2 + (y - cy) ** 2
        m = d2 <= radius * radius
        order = np.lexsort((v[m], d2[m]))[:N]
        dd, vv = d2[m][order], v[m][order]
        w = 1.0 / np.maximum(np.sqrt(dd), 1e-12) ** 2
        expect = (w * vv).sum() / w.sum()
        assert abs(row.value - expect) < 1e-9, (row.gx, row.gy)


def test_tdigest_quantile_accuracy():
    """t-digest rank error on lognormal data: < 0.01 rank error at every
    tested quantile, tighter in the tails (the k1 scale property)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.ops.sketch import approx_quantiles

    rng = np.random.RandomState(11)
    x = rng.lognormal(3.0, 1.0, 60_000)
    t = pa.table({"v": pa.array(x)})
    ds = rd.from_arrow([t.slice(i, 10_000) for i in range(0, 60_000, 10_000)])
    qs = np.array([0.01, 0.1, 0.5, 0.9, 0.99])
    got = approx_quantiles(ds, "v", qs, delta=150)
    xs = np.sort(x)
    for q, g in zip(qs, got):
        # rank error: where does the estimate fall in the true CDF?
        rank = np.searchsorted(xs, g) / xs.size
        assert abs(rank - q) < 0.01, (q, g, rank)


def test_exact_quantiles_int_matches_numpy():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.ops.sketch import exact_quantiles_int

    rng = np.random.RandomState(3)
    x = rng.randint(0, 500, 20_000)
    t = pa.table({"v": pa.array(x, pa.int64())})
    ds = rd.from_arrow([t.slice(i, 5_000) for i in range(0, 20_000, 5_000)])
    got = exact_quantiles_int(ds, "v", [0.25, 0.5, 0.9])
    xs = np.sort(x)
    for q, g in zip([0.25, 0.5, 0.9], got):
        rank = max(int(np.ceil(q * xs.size)), 1) - 1
        assert g == xs[rank], (q, g, xs[rank])


def test_exact_quantiles_empty_and_nulls():
    """ADVICE r3: empty dataset -> NaN (no IndexError); nulls are skipped."""
    from gdal_ray.ops.sketch import exact_quantiles_int

    empty = rd.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
    out = exact_quantiles_int(empty, "x", [0.5, 0.9])
    assert np.all(np.isnan(out))

    withnulls = rd.from_arrow(pa.table(
        {"x": pa.array([1, None, 2, None, 3, 4, 5], pa.int64())}))
    got = exact_quantiles_int(withnulls, "x", [0.5])
    assert got[0] == 3  # median of {1,2,3,4,5}, nulls ignored

    allnull = rd.from_arrow(pa.table(
        {"x": pa.array([None, None], pa.int64())}))
    assert np.all(np.isnan(exact_quantiles_int(allnull, "x", [0.5])))


def test_groupby_quantiles_vs_pandas(ray_session):
    """Per-key quantile_disc == pandas per-group rank select, with nulls
    skipped and multi-quantile output."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.ops.sketch import groupby_quantiles
    from gdal_ray.util import to_arrow

    rng = np.random.RandomState(4)
    n = 800
    df = pd.DataFrame({"k": rng.randint(0, 7, n).astype(str),
                       "v": rng.randint(0, 1000, n).astype(float)})
    df.loc[rng.choice(n, 40, replace=False), "v"] = np.nan
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    got = to_arrow(groupby_quantiles(ds, ["k"], "v", qs=(0.25, 0.5, 0.9))) \
        .to_pandas().sort_values("k").reset_index(drop=True)

    def disc(s, q):
        v = np.sort(s.dropna().to_numpy())
        return v[max(int(np.ceil(q * v.size)), 1) - 1]

    want = df.groupby("k")["v"].apply(
        lambda s: tuple(disc(s, q) for q in (0.25, 0.5, 0.9)))
    for _, row in got.iterrows():
        w = want[row["k"]]
        assert (row["q0_25"], row["q0_5"], row["q0_9"]) == w, row["k"]
    assert len(got) == 7


def test_heavy_hitters_exact_vs_duckdb(ray_session, sf_dir):
    """MG candidate sweep + exact recount == DuckDB GROUP BY/HAVING, for a
    string column and an adversarially tiny capacity (many truncations)."""
    import duckdb
    import ray.data as rd

    from gdal_ray.ops.sketch import heavy_hitters
    from gdal_ray.util import sf_path

    con = duckdb.connect()
    con.execute(f"create view orders as select * from read_parquet('{sf_path(sf_dir, 'orders')}')")
    ds = rd.read_parquet(sf_path(sf_dir, "orders"),
                         columns=["o_orderpriority"]).repartition(9)
    for phi in (0.3, 0.15, 0.01):
        got = heavy_hitters(ds, "o_orderpriority", phi=phi).to_pandas()
        want = con.execute(f"""
            SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n FROM orders
            GROUP BY o_orderpriority
            HAVING COUNT(*) >= CEIL({phi} * (SELECT COUNT(*) FROM orders))
            ORDER BY n DESC, o_orderpriority""").fetchdf()
        assert got["o_orderpriority"].tolist() == want["o_orderpriority"].tolist(), phi
        assert got["n"].tolist() == want["n"].tolist(), phi
