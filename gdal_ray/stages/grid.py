"""`gdal vector grid` — scattered points -> regular grid interpolation.

Reference semantics: alg/gdalgrid.cpp interpolators (invdist, invdistnn,
average, nearest — alg/gdal_alg.h:402-416), each a radius-bounded search
around every target cell (quadtree-accelerated, alg/gdalgrid.cpp:257-377).

Ray restatement inverts the loop: every POINT fans out to the target cells
within `radius` (bounded fan-out), per-batch partial accumulators are
combined per cell, and a tree merge finalizes — no per-cell point search,
no all-points broadcast, linear in points.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from gdal_ray.util import pd_to_arrow as _pd2pa

from gdal_ray.ops.relational import first_by, groupby_agg


def _fan_to_cells(t: pa.Table, *, x0, y0, nx, ny, cell, radius, value_col):
    x = t["lon"].to_numpy(zero_copy_only=False) if "lon" in t.column_names else t["x"].to_numpy(zero_copy_only=False)
    y = t["lat"].to_numpy(zero_copy_only=False) if "lat" in t.column_names else t["y"].to_numpy(zero_copy_only=False)
    v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
    r_cells = int(np.ceil(radius / cell))
    gx_c = ((x - x0) / cell).astype(np.int64)
    gy_c = ((y - y0) / cell).astype(np.int64)
    offs = np.arange(-r_cells, r_cells + 1)
    ox, oy = np.meshgrid(offs, offs)
    ox, oy = ox.ravel(), oy.ravel()
    n, k = x.size, ox.size
    gx = (gx_c[:, None] + ox[None, :]).ravel()
    gy = (gy_c[:, None] + oy[None, :]).ravel()
    px = np.repeat(x, k)
    py = np.repeat(y, k)
    pv = np.repeat(v, k)
    cx = x0 + (gx + 0.5) * cell
    cy = y0 + (gy + 0.5) * cell
    d2 = (px - cx) ** 2 + (py - cy) ** 2
    keep = (d2 <= radius * radius) & (gx >= 0) & (gx < nx) & (gy >= 0) & (gy < ny)
    return gx[keep], gy[keep], pv[keep], d2[keep], px[keep], py[keep]


def grid_points(ds, *, extent, cell: float, radius: float, method: str = "invdist",
                power: float = 2.0, value_col: str = "value",
                max_points: int = 12):
    """-> Dataset (gx, gy, value[, n]) for cells with >=1 point in radius.

    extent: (x0, y0, x1, y1). method: invdist | average | nearest | linear
    | invdistnn (inverse distance over only the `max_points` NEAREST points
    within radius — GDALGridInverseDistanceToAPowerNearestNeighbor,
    alg/gdal_alg.h:402-416; two-level: per-batch nearest-N partials, then a
    per-cell merge keeps the global nearest N) | the data-metrics family
    minimum | maximum | range | count | average_distance |
    average_distance_pts (alg/gdal_alg.h:402-416 GDALGridDataMetric*).

    method='linear' is the reference's TIN interpolation (GGA_Linear,
    alg/delaunay.c builds ONE global triangulation): the point set is
    collected and broadcast (same memory contract as the reference), the
    Bowyer-Watson TIN is built once, and grid ROW BLOCKS interpolate in
    parallel against the broadcast TIN. Cells outside the hull are
    omitted (reference emits nodata there)."""
    x0, y0, x1, y1 = extent
    nx = int(np.ceil((x1 - x0) / cell))
    ny = int(np.ceil((y1 - y0) / cell))

    if method == "linear":
        import ray
        import ray.data as rd

        from gdal_ray.geo.delaunay import delaunay, interpolate_linear

        tbl = pa.concat_tables(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
        px = (tbl["lon"] if "lon" in tbl.column_names else tbl["x"]).to_numpy(zero_copy_only=False)
        py = (tbl["lat"] if "lat" in tbl.column_names else tbl["y"]).to_numpy(zero_copy_only=False)
        pv = tbl[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        pts = np.column_stack([px, py]).astype(np.float64)
        tin_ref = ray.put((pts, pv, delaunay(pts)))

        rows_per_block = max(1, 4096 // max(nx, 1))

        def block(t: pa.Table) -> pa.Table:
            p, v, tris = ray.get(tin_ref)
            gys = t["id"].to_numpy(zero_copy_only=False)
            gy_all = np.repeat(gys, nx)
            gx_all = np.tile(np.arange(nx, dtype=np.int64), gys.size)
            cx = x0 + (gx_all + 0.5) * cell
            cy = y0 + (gy_all + 0.5) * cell
            val = interpolate_linear(p, v, cx, cy, tris=tris)
            keep = ~np.isnan(val)
            return pa.table({"gx": pa.array(gx_all[keep]), "gy": pa.array(gy_all[keep]),
                             "value": pa.array(val[keep])})

        nblocks = max(1, int(np.ceil(ny / rows_per_block)))
        return rd.range(ny, override_num_blocks=nblocks).map_batches(
            block, batch_format="pyarrow", batch_size=None
        )

    if method == "nearest":
        def part(t: pa.Table) -> pa.Table:
            gx, gy, pv, d2, _, _ = _fan_to_cells(t, x0=x0, y0=y0, nx=nx, ny=ny,
                                                 cell=cell, radius=radius, value_col=value_col)
            df = pd.DataFrame({"gx": gx, "gy": gy, "d2": d2, "value": pv})
            idx = df.groupby(["gx", "gy"], sort=False)["d2"].idxmin()
            return _pd2pa(df.loc[idx], preserve_index=False)

        partials = ds.map_batches(part, batch_format="pyarrow", batch_size=None)
        out = first_by(partials, ["gx", "gy"], ["d2", "value"])
        return out.map_batches(
            lambda t: t.select(["gx", "gy", "value"]), batch_format="pyarrow", batch_size=None
        )

    if method == "invdistnn":
        def part_nn(t: pa.Table) -> pa.Table:
            gx, gy, pv, d2, _, _ = _fan_to_cells(t, x0=x0, y0=y0, nx=nx, ny=ny,
                                                 cell=cell, radius=radius, value_col=value_col)
            df = pd.DataFrame({"gx": gx, "gy": gy, "d2": d2, "value": pv})
            df = df.sort_values(["gx", "gy", "d2", "value"], kind="mergesort")
            return _pd2pa(
                df.groupby(["gx", "gy"], sort=False).head(max_points),
                preserve_index=False,
            )

        partials = ds.map_batches(part_nn, batch_format="pyarrow", batch_size=None)

        def fin_nn(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["d2", "value"], kind="mergesort").head(max_points)
            w = 1.0 / np.maximum(np.power(np.sqrt(g["d2"].to_numpy()), power), 1e-12)
            return pd.DataFrame({
                "gx": [int(g["gx"].iloc[0])], "gy": [int(g["gy"].iloc[0])],
                "value": [float((w * g["value"].to_numpy()).sum() / w.sum())],
            })

        return partials.groupby(["gx", "gy"]).map_groups(fin_nn, batch_format="pandas")

    if method in ("minimum", "maximum", "range", "count", "average_distance"):
        # GDAL data-metrics family (GDALGridDataMetricMinimum/Maximum/
        # Range/Count/AverageDistance, alg/gdal_alg.h:402-416 +
        # alg/gdalgrid.cpp): all algebraic over the radius neighborhood,
        # so they reuse the point-side fan-out + partial-merge shape
        def part_dm(t: pa.Table) -> pa.Table:
            gx, gy, pv, d2, _, _ = _fan_to_cells(
                t, x0=x0, y0=y0, nx=nx, ny=ny, cell=cell, radius=radius,
                value_col=value_col)
            df = pd.DataFrame({"gx": gx, "gy": gy, "v": pv, "d": np.sqrt(d2)})
            g = df.groupby(["gx", "gy"], sort=False).agg(
                mn=("v", "min"), mx=("v", "max"), n=("v", "size"),
                sd=("d", "sum")).reset_index()
            return _pd2pa(g, preserve_index=False)

        partials = ds.map_batches(part_dm, batch_format="pyarrow", batch_size=None)
        summed = groupby_agg(partials, ["gx", "gy"], [
            ("mn", "min", "mn"), ("mx", "max", "mx"),
            ("n", "sum", "n"), ("sd", "sum", "sd")])

        def fin_dm(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            if method == "minimum":
                v = pc.cast(t["mn"], pa.float64())
            elif method == "maximum":
                v = pc.cast(t["mx"], pa.float64())
            elif method == "range":
                v = pc.subtract(pc.cast(t["mx"], pa.float64()),
                                pc.cast(t["mn"], pa.float64()))
            elif method == "count":
                v = pc.cast(t["n"], pa.float64())
            else:  # average_distance (cell center -> each point in radius)
                v = pc.divide(pc.cast(t["sd"], pa.float64()),
                              pc.cast(t["n"], pa.float64()))
            return pa.table({"gx": t["gx"], "gy": t["gy"], "value": v})

        return summed.map_batches(fin_dm, batch_format="pyarrow", batch_size=None)

    if method == "average_distance_pts":
        # GDALGridDataMetricAverageDistancePts: mean PAIRWISE distance
        # between the points inside each cell's radius — not algebraic, so
        # points co-locate per cell (hash partition + boundary scan; the
        # per-cell point count is bounded by density * radius^2)
        from gdal_ray.ops.relational import hash_partition_reduce

        def fan_xy(t: pa.Table) -> pa.Table:
            gx, gy, _, _, px, py = _fan_to_cells(
                t, x0=x0, y0=y0, nx=nx, ny=ny, cell=cell, radius=radius,
                value_col=value_col)
            return pa.table({"gx": pa.array(gx), "gy": pa.array(gy),
                             "px": pa.array(px), "py": pa.array(py)})

        fanned = ds.map_batches(fan_xy, batch_format="pyarrow", batch_size=None)

        def pairwise_part(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return pa.table({"gx": pa.array([], pa.int64()),
                                 "gy": pa.array([], pa.int64()),
                                 "value": pa.array([], pa.float64())})
            df = t.to_pandas().sort_values(["gx", "gy"], kind="mergesort",
                                           ignore_index=True)
            gxa = df["gx"].to_numpy()
            gya = df["gy"].to_numpy()
            pxa = df["px"].to_numpy()
            pya = df["py"].to_numpy()
            change = np.flatnonzero((gxa[1:] != gxa[:-1]) | (gya[1:] != gya[:-1])) + 1
            bounds = np.concatenate([[0], change, [len(df)]])
            out_gx, out_gy, out_v = [], [], []
            for s, e in zip(bounds[:-1], bounds[1:]):
                if e - s < 2:
                    continue  # GDAL emits nodata for <2 points
                X, Y = pxa[s:e], pya[s:e]
                dx = X[:, None] - X[None, :]
                dy = Y[:, None] - Y[None, :]
                dm = np.sqrt(dx * dx + dy * dy)
                iu = np.triu_indices(e - s, k=1)
                out_gx.append(gxa[s])
                out_gy.append(gya[s])
                out_v.append(float(dm[iu].mean()))
            return pa.table({"gx": pa.array(out_gx, pa.int64()),
                             "gy": pa.array(out_gy, pa.int64()),
                             "value": pa.array(out_v, pa.float64())})

        return hash_partition_reduce(fanned, ["gx", "gy"], pairwise_part)

    def part(t: pa.Table) -> pa.Table:
        gx, gy, pv, d2, _, _ = _fan_to_cells(t, x0=x0, y0=y0, nx=nx, ny=ny,
                                             cell=cell, radius=radius, value_col=value_col)
        if method == "invdist":
            w = 1.0 / np.maximum(np.power(np.sqrt(d2), power), 1e-12)
        else:  # average
            w = np.ones_like(d2)
        df = pd.DataFrame({"gx": gx, "gy": gy, "wv": w * pv, "w": w})
        g = df.groupby(["gx", "gy"], sort=False).sum().reset_index()
        return _pd2pa(g, preserve_index=False)

    partials = ds.map_batches(part, batch_format="pyarrow", batch_size=None)
    summed = groupby_agg(partials, ["gx", "gy"], [("wv", "sum", "wv"), ("w", "sum", "w")])

    def fin(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {"gx": t["gx"], "gy": t["gy"],
             "value": pc.divide(t["wv"], t["w"])}
        )

    return summed.map_batches(fin, batch_format="pyarrow", batch_size=None)
