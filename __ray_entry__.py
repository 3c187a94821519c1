"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Nothing here calls ray.init()/ray.shutdown(); the caller owns the session.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gdal_ray.util import tune_data_context

tune_data_context()


def entry() -> Any:
    """Flagship north-star pipeline on sf0.001: synthesize Common-Crawl-style
    pages from documents.parquet -> extract text+geotag from html (byte-
    identity checked) -> hex/S2 cell encode -> PIP join vs admin diamonds ->
    WebMercator tile shuffle with hierarchical z9..z5 overview reduce."""
    from gdal_ray.pipelines.pages import flagship

    return flagship("/root/testdata/sf0.001", repeat=1, zoom=9, min_zoom=5)


def queries() -> dict[str, Callable[[str], Any]]:
    from gdal_ray.pipelines.queries import registry

    qs, _ = registry()
    return qs


def oracle_sql() -> dict[str, str]:
    from gdal_ray.pipelines.queries import registry

    _, sqls = registry()
    return sqls
