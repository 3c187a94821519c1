"""The north-star pages workload (BASELINE.json):

Common-Crawl-style pages table (url, warc_ts, html, text, lang) ->
extract text + geotag from html -> H3-style/S2 cell encode -> PIP join vs
admin boundary polygons -> WebMercator tile shuffle with hierarchical
overview reduce. Mirrors the reference pipeline shapes: ogr2ogr's Arrow
fast path for the batch chain (apps/ogr2ogr_lib.cpp:4246), `gdal raster
tile` for the tiling shuffle + overview levels
(apps/gdalalg_raster_tile.cpp:1576-1696).

Pages are synthesized DETERMINISTICALLY from the driver's documents table
(no external data): text is a pure function of url, and each page carries
exactly one (lat, lon) embedded in both html and text, with 80% of pages
drawn from K urban hot cells to force H3-cell skew (FIXTURES.md §1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from gdal_ray.geo import wkb as W
from gdal_ray.ops.relational import groupby_agg
from gdal_ray.stages.geo import PIPJoiner, add_cell_columns

# deterministic urban hot-cell centers (lon, lat) — big-city-ish spots
URBAN_CENTERS = np.array(
    [
        (-74.0, 40.7), (2.35, 48.85), (139.7, 35.7), (-0.13, 51.5),
        (116.4, 39.9), (77.2, 28.6), (-46.6, -23.5), (31.2, 30.0),
    ]
)
ADMIN_STEP = 20.0  # diamond-grid admin cell size in (u, v) = (lon+lat, lon-lat)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic integer hash (splitmix64 finalizer), vectorized."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def page_coords(page_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (lon, lat) per page: 80% gaussian around an urban hot
    cell (sigma 0.05 deg — the skew driver), 20% uniform world-ish."""
    h = _splitmix64(page_id)
    u01 = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    h2 = _splitmix64(h)
    u02 = (h2 >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    h3 = _splitmix64(h2)
    u03 = (h3 >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    urban = u01 < 0.8
    center = URBAN_CENTERS[(h & np.uint64(0xFFFF)).astype(np.int64) % len(URBAN_CENTERS)]
    # Box-Muller from (u02, u03)
    r = np.sqrt(-2.0 * np.log(np.maximum(u02, 1e-300))) * 0.05
    th = 2.0 * np.pi * u03
    lon_u = center[:, 0] + r * np.cos(th)
    lat_u = center[:, 1] + r * np.sin(th)
    lon_r = u02 * 360.0 - 180.0
    lat_r = u03 * 160.0 - 80.0
    lon = np.where(urban, lon_u, lon_r)
    lat = np.where(urban, lat_u, lat_r)
    # wrap (not clamp) longitudes across the dateline — pages land on both
    # sides of +/-180 and downstream cell/tile math handles them; latitude
    # stays clamped to the WebMercator validity band
    lon = ((lon + 180.0) % 360.0) - 180.0
    return lon, np.clip(lat, -83.99, 83.99)


def synthesize_pages(sf_dir: str, repeat: int = 1, *, concurrency=None):
    """documents.parquet -> pages Dataset (url, warc_ts, html, text, lang).

    Deterministic: page_id = doc_id * repeat + j; url embeds page_id; text =
    document text + a "[geo:lat,lon]" token (pure function of url); html
    wraps text and carries the geo hint as a meta tag. `repeat` scales rows
    without external data (bench knob)."""
    import ray.data as rd

    # default read splitting keeps the scan parallel (single-row-group files
    # cannot be split by override_num_blocks); each tiny doc block expands
    # `repeat`-fold inside gen, so downstream stages see full-size batches
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def fmt6(x: np.ndarray) -> pa.Array:
        """Vectorized fixed-6-decimal formatting (Arrow kernels, no Python
        per-row work): sign + int part + '.' + zero-padded micro part."""
        v = np.round(np.abs(x) * 1e6).astype(np.int64)
        ip = pc.cast(pa.array(v // 1_000_000), pa.string())
        fp = pc.utf8_lpad(pc.cast(pa.array(v % 1_000_000), pa.string()), 6, "0")
        sign = pa.array(np.where(x < 0, "-", ""), pa.string())
        return pc.binary_join_element_wise(sign, ip, ".", fp, "")

    def gen(t: pa.Table) -> pa.Table:
        doc_id = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_tables = []
        join = pc.binary_join_element_wise
        for j in range(repeat):
            page_id = doc_id * repeat + j
            lon, lat = page_coords(page_id)
            pid_s = pc.cast(pa.array(page_id), pa.string())
            site_s = pc.cast(pa.array(page_id % 997), pa.string())
            urls = join("https://site", site_s, ".example/p/", pid_s, "")
            lat_s, lon_s = fmt6(lat), fmt6(lon)
            geo = join("[geo:", lat_s, ",", lon_s, "]", "")
            texts = join(t["text"], geo, " ")
            htmls = join(
                '<html><head><meta name="geo.position" content="',
                lat_s, ";", lon_s,
                '"></head><body><p>', texts, "</p></body></html>", "",
            )
            ts = pa.array(
                np.int64(1767225600_000000) + page_id * np.int64(1_000_000),
                type=pa.int64(),
            ).cast(pa.timestamp("us"))
            out_tables.append(
                pa.table(
                    {
                        "url": urls,
                        "warc_ts": ts,
                        "html": pc.cast(htmls, pa.binary()),
                        "text": texts,
                        "lang": t["lang"],
                    }
                )
            )
        return pa.concat_tables(out_tables)

    # batch_size=None: one task per input block. A row-count batch_size here
    # makes Ray BUNDLE the small doc blocks into a handful of giant tasks
    # and serializes the whole fused downstream chain (observed: load 4/32).
    return ds.map_batches(gen, batch_format="pyarrow", batch_size=None)


_META_RE = r'<meta name="geo\.position" content="(?P<glat>-?[0-9.]+);(?P<glon>-?[0-9.]+)">'
_TEXT_RE = r"<p>(?P<gtext>.*)</p>"


def extract_stage(ds, *, check: bool = True):
    """html -> (text, lat, lon), vectorized RE2 kernels. With check=True the
    extracted text is verified byte-identical to the shipped `text` column
    per url (BASELINE.json per-row invariant) and the page is flagged."""

    def f(t: pa.Table) -> pa.Table:
        html = pc.cast(t["html"], pa.string())
        meta = pc.extract_regex(html, _META_RE)
        body = pc.extract_regex(html, _TEXT_RE)
        lat = pc.cast(pc.struct_field(meta, "glat"), pa.float64())
        lon = pc.cast(pc.struct_field(meta, "glon"), pa.float64())
        text_x = pc.struct_field(body, "gtext")
        t = t.append_column("lat", lat)
        t = t.append_column("lon", lon)
        t = t.append_column("extracted_text", text_x)
        if check:
            ok = pc.equal(text_x, t["text"])
            if not pc.all(ok).as_py():
                bad = t.filter(pc.invert(pc.fill_null(ok, False)))
                raise AssertionError(
                    f"text byte-identity violated for {bad.num_rows} urls, "
                    f"e.g. {bad['url'][0].as_py()!r}"
                )
        # project away the heavy payload before any shuffle (SURVEY §7.5.6)
        return t.drop_columns(["html", "extracted_text"])

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def admin_grid_polygons() -> pa.Table:
    """Deterministic world-covering diamond grid (rotated squares in
    (u, v) = (lon+lat, lon-lat), step ADMIN_STEP). Diamonds are genuinely
    non-axis-aligned in lon/lat — the PIP is a real ray-casting test — while
    membership stays ANSI-SQL-expressible (floor((lon+lat)/step) etc.) for
    the DuckDB oracles."""
    polys, ids, names = [], [], []
    k = int(np.ceil(270.0 / ADMIN_STEP))
    for i in range(-k, k):
        for j in range(-k, k):
            u0, v0 = i * ADMIN_STEP, j * ADMIN_STEP
            u1, v1 = u0 + ADMIN_STEP, v0 + ADMIN_STEP
            corners_uv = [(u0, v0), (u1, v0), (u1, v1), (u0, v1), (u0, v0)]
            ring = np.array([((u + v) / 2.0, (u - v) / 2.0) for u, v in corners_uv])
            # keep only cells that can intersect the lon/lat world box
            if ring[:, 0].max() < -180 or ring[:, 0].min() > 180:
                continue
            if ring[:, 1].max() < -86 or ring[:, 1].min() > 86:
                continue
            polys.append(W.encode_polygon([ring]))
            ids.append((i + 64) * 1000 + (j + 64))
            names.append(f"adm_{i}_{j}")
    return pa.table(
        {
            "admin_id": pa.array(ids, pa.int64()),
            "admin_name": pa.array(names, pa.string()),
            "geometry": pa.array(polys, pa.binary()),
        }
    )


def flagship(sf_dir: str, *, repeat: int = 1, zoom: int = 9, min_zoom: int = 5,
             pip_concurrency=None):
    """The full north-star pipeline. Returns the z-`zoom` per-tile aggregate
    Dataset (tile_x, tile_y, n_pages, n_admins) plus overview levels merged
    in (column `zoom`)."""
    import ray

    from gdal_ray.stages.geo import pip_join_fn

    pages = synthesize_pages(sf_dir, repeat=repeat)
    pages = extract_stage(pages, check=True)
    # project early (SetIgnoredFields discipline, SURVEY §7.5.6): after the
    # byte-identity check only the coordinates feed the join/shuffle — the
    # text payload must not ride through every downstream block
    pages = pages.select_columns(["lat", "lon"])
    pages = add_cell_columns(
        pages, hex_res=(5, 9), s2_level=16, tile_zooms=(zoom,), hilbert_order=None
    )
    admin_ref = ray.put(admin_grid_polygons())
    # stateless tasks + per-worker PolygonSet cache: elastic, no actor-spawn
    # latency; the polygon table is broadcast once via the object store
    joined = pages.map_batches(
        pip_join_fn(admin_ref, how="left"), batch_format="pyarrow", batch_size=None)
    # tile shuffle: two-level aggregate; the combiner collapses each block to
    # one row per tile, so the hot-cell skew never ships raw rows.
    # materialize() pins the base aggregate (small: one row per z-level tile,
    # bounded by 4^zoom regardless of input size) so the overview pyramid and
    # the final union DERIVE from it instead of re-executing the whole pages
    # scan once per level (a lazy union of N levels re-runs the upstream DAG
    # N times — observed live before this fix).
    base = groupby_agg(
        joined,
        [f"tile_x_z{zoom}", f"tile_y_z{zoom}"],
        [("n_pages", "count_star", None), ("n_admins", "count", "admin_id")],
    ).materialize()

    def stamp(t: pa.Table, z: int, xcol: str, ycol: str) -> pa.Table:
        return pa.table(
            {
                "zoom": pa.array(np.full(len(t), z, dtype=np.int32)),
                "tile_x": t[xcol],
                "tile_y": t[ycol],
                "n_pages": t["n_pages"],
                "n_admins": t["n_admins"],
            }
        )

    levels = [base.map_batches(
        lambda t, z=zoom: stamp(t, z, f"tile_x_z{zoom}", f"tile_y_z{zoom}"),
        batch_format="pyarrow", batch_size=None,)]
    # hierarchical overview reduce: z -> z-1 built from the previous level's
    # aggregates only (never re-reads pages) — gdal raster tile's overview
    # construction restated (one overview tile from <=4 finer tiles)
    prev = levels[0]
    for z in range(zoom - 1, min_zoom - 1, -1):
        def shift(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "tile_x": pc.shift_right(t["tile_x"], 1),
                    "tile_y": pc.shift_right(t["tile_y"], 1),
                    "n_pages": t["n_pages"],
                    "n_admins": t["n_admins"],
                }
            )

        parent = groupby_agg(
            prev.map_batches(shift, batch_format="pyarrow", batch_size=None),
            ["tile_x", "tile_y"],
            [("n_pages", "sum", "n_pages"), ("n_admins", "sum", "n_admins")],
        )
        lvl = parent.map_batches(
            lambda t, z=z: pa.table(
                {
                    "zoom": pa.array(np.full(len(t), z, dtype=np.int32)),
                    "tile_x": t["tile_x"],
                    "tile_y": t["tile_y"],
                    "n_pages": pc.cast(t["n_pages"], pa.int64()),
                    "n_admins": pc.cast(t["n_admins"], pa.int64()),
                }
            ),
            batch_format="pyarrow", batch_size=None,).materialize()  # tiny; keeps each level single-execution under union
        levels.append(lvl)
        prev = lvl
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def flagship_to_parquet(sf_dir: str, out_dir: str, *, repeat: int = 1,
                        zoom: int = 9, min_zoom: int = 5):
    """Flagship with RESUMABLE output: the per-zoom tile aggregates are
    written as per-(zoom, coarse-tile-region) partitions with lineage
    manifests; a restart recomputes only missing partitions' rows at the
    write stage (gdal raster tile --resume semantics). Returns the manifest
    Dataset of the run."""
    import pyarrow.compute as pc_

    from gdal_ray.state.manifest import write_partitioned_resumable

    tiles = flagship(sf_dir, repeat=repeat, zoom=zoom, min_zoom=min_zoom)

    def part_key(t: pa.Table) -> pa.Table:
        # partition key = (zoom, tile_x >> 4): bounded region files
        key = pc_.binary_join_element_wise(
            pc_.cast(t["zoom"], pa.string()),
            pc_.cast(pc_.shift_right(t["tile_x"], 4), pa.string()),
            "_",
        )
        return t.append_column("part", key)

    keyed = tiles.map_batches(part_key, batch_format="pyarrow", batch_size=None)
    return write_partitioned_resumable(keyed, out_dir, "part")
