"""Source/sink registry — the Python-driver-loader extension surface.

The reference lets users register format drivers implemented in Python
(gcore/gdalpythondriverloader.cpp; SURVEY §2.12): a driver advertises a
name and an Open() that yields features. The Ray restatement: a driver is
a callable `reader(path, **kwargs) -> ray.data.Dataset`; `open_source`
dispatches on the `scheme://` prefix (or file extension) to the built-in
drivers (parquet, geoparquet, csv, geojson) or any user-registered one.

    from gdal_ray.sources import register_driver, open_source

    def read_mylog(path, **kw):
        import ray.data as rd
        return rd.read_text(path).map_batches(parse_lines, ...)

    register_driver("mylog", read_mylog)
    ds = open_source("mylog:///data/x.log")
"""

from __future__ import annotations

_DRIVERS: dict = {}


def _grid_tiles(arr, *, tile: int = 256):
    """Generic single-band array -> engine tile rows (float64 payloads,
    same layout as read_geotiff_tiles)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    h, w = arr.shape
    rows = {"tile_x": [], "tile_y": [], "w": [], "h": [], "data": []}
    for ty in range(0, h, tile):
        for tx in range(0, w, tile):
            piece = arr[ty:ty + tile, tx:tx + tile]
            rows["tile_x"].append(tx // tile)
            rows["tile_y"].append(ty // tile)
            rows["w"].append(piece.shape[1])
            rows["h"].append(piece.shape[0])
            rows["data"].append(np.ascontiguousarray(
                piece.astype(np.float64)).tobytes())
    return rd.from_arrow(pa.table({
        "tile_x": pa.array(rows["tile_x"], pa.int64()),
        "tile_y": pa.array(rows["tile_y"], pa.int64()),
        "w": pa.array(rows["w"], pa.int64()),
        "h": pa.array(rows["h"], pa.int64()),
        "data": pa.array(rows["data"], pa.binary()),
    }))


def register_driver(name: str, reader) -> None:
    """Register `reader(path, **kwargs) -> Dataset` under a scheme name."""
    _DRIVERS[name.lower()] = reader


def unregister_driver(name: str) -> None:
    _DRIVERS.pop(name.lower(), None)


def _builtin(scheme: str):
    if scheme == "parquet":
        import ray.data as rd

        return rd.read_parquet
    if scheme == "geoparquet":
        from gdal_ray.sources.geoparquet import read_geoparquet

        return read_geoparquet
    if scheme == "csv":
        from gdal_ray.sources.text import read_csv

        return read_csv
    if scheme == "geojson":
        from gdal_ray.sources.text import read_geojson

        return read_geojson
    if scheme in ("shapefile", "shp", "esri shapefile"):
        from gdal_ray.sources.shapefile import read_shapefile

        return read_shapefile
    if scheme in ("geotiff", "gtiff", "tif"):
        from gdal_ray.sources.geotiff import read_geotiff_tiles

        return read_geotiff_tiles
    if scheme == "gpx":
        from gdal_ray.sources.gpx_kml import read_gpx

        return read_gpx
    if scheme == "kml":
        from gdal_ray.sources.gpx_kml import read_kml

        return read_kml
    if scheme in ("gpkg", "geopackage"):
        from gdal_ray.sources.gpkg import read_gpkg

        return read_gpkg
    if scheme == "envi":
        from gdal_ray.sources.envi import read_envi_tiles

        return read_envi_tiles
    if scheme == "gif":
        from gdal_ray.sources.gif import read_gif_tiles

        return read_gif_tiles
    if scheme == "ers":
        from gdal_ray.sources.ers import read_ers

        def _read_ers_tiles(path, **kw):
            return _grid_tiles(read_ers(path)[0][0], **kw)

        return _read_ers_tiles
    if scheme == "lan":
        from gdal_ray.sources.lan import read_lan

        def _read_lan_tiles(path, **kw):
            return _grid_tiles(read_lan(path)[0][0], **kw)

        return _read_lan_tiles
    if scheme in ("aaigrid", "asc", "aig"):
        from gdal_ray.sources.aaigrid import read_aaigrid_tiles

        return read_aaigrid_tiles
    if scheme == "grd":
        # .grd is ambiguous: Surfer magics (DSAA/DSBB/DSRB) vs AAIGrid
        def _read_grd(path, **kw):
            with open(path, "rb") as f:
                magic = f.read(4)
            if magic in (b"DSAA", b"DSBB", b"DSRB"):
                from gdal_ray.sources.surfer import read_surfer

                return _grid_tiles(read_surfer(path)[0], **kw)
            from gdal_ray.sources.aaigrid import read_aaigrid_tiles

            return read_aaigrid_tiles(path, **kw)

        return _read_grd
    if scheme in ("pnm", "pgm", "ppm"):
        from gdal_ray.sources.pnm import read_pnm_tiles

        return read_pnm_tiles
    if scheme == "jsonl":
        # newline-delimited JSON — the standard LLM-corpus interchange
        # format; Ray's native reader streams files in parallel
        import ray.data as rd

        return rd.read_json
    return None


_EXTENSIONS = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".geojson": "geojson",
    ".json": "geojson",
    ".jsonl": "jsonl",
    ".ndjson": "jsonl",
    ".tif": "geotiff",
    ".tiff": "geotiff",
    ".shp": "shapefile",
    ".gpx": "gpx",
    ".kml": "kml",
    ".pgm": "pnm",
    ".ppm": "pnm",
    ".pnm": "pnm",
    ".asc": "aaigrid",
    ".grd": "grd",
    ".gif": "gif",
    ".ers": "ers",
    ".lan": "lan",
    ".gpkg": "gpkg",
}


def open_source(uri: str, **kwargs):
    """Open `scheme://path` (or a bare path, dispatched on extension) with
    the matching driver. User-registered drivers shadow built-ins, like the
    reference's driver-registration order."""
    if "://" in uri:
        scheme, path = uri.split("://", 1)
        scheme = scheme.lower()
    else:
        path = uri
        scheme = None
        for ext, s in _EXTENSIONS.items():
            if uri.lower().endswith(ext):
                scheme = s
                break
        if scheme is None:
            raise ValueError(
                f"cannot infer driver for {uri!r}; use scheme://path or "
                f"register_driver")
    reader = _DRIVERS.get(scheme) or _builtin(scheme)
    if reader is None:
        raise ValueError(
            f"no driver for scheme {scheme!r} (registered: "
            f"{sorted(_DRIVERS)}; built-in: parquet, geoparquet, csv, geojson)")
    return reader(path, **kwargs)
