"""Cell-partitioned self-kNN with fringe duplication vs brute force."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from gdal_ray.stages.geo import knn_all_points_cell_partitioned
from gdal_ray.util import to_arrow


def test_cell_knn_matches_brute_force():
    rng = np.random.RandomState(15)
    n = 1200
    x = rng.uniform(0, 20, n)
    y = rng.uniform(0, 20, n)
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"id": ids, "lon": x, "lat": y}))
    k = 3
    out = to_arrow(
        knn_all_points_cell_partitioned(ds, k, cell_size=4.0, fringe=2.0)
    ).to_pandas()
    # with ~1200 points in 400 units^2, kth-neighbor distances << fringe
    assert out["exact"].all()
    assert len(out) == n * k

    # brute force
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    np.fill_diagonal(d2, np.inf)
    order = np.lexsort((np.broadcast_to(ids, d2.shape), d2), axis=1)[:, :k]
    got = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    exp_neighbors = order.ravel()
    assert np.array_equal(got["neighbor_id"].to_numpy(), ids[exp_neighbors])
    exp_d = np.sqrt(np.take_along_axis(d2, order, axis=1)).ravel()
    assert np.allclose(got["dist"].to_numpy(), exp_d)


def test_cell_knn_flags_inexact_when_fringe_too_small():
    # two far-apart points in different cells with a tiny fringe: the only
    # neighbor is outside the fringe -> exact must be False
    ds = rd.from_arrow(
        pa.table({"id": pa.array([0, 1], pa.int64()),
                  "lon": pa.array([0.5, 9.5]), "lat": pa.array([0.5, 0.5])})
    )
    out = to_arrow(
        knn_all_points_cell_partitioned(ds, 1, cell_size=5.0, fringe=1.0)
    ).to_pandas()
    # neighbors in other cells aren't even visible -> rows may miss or be
    # flagged; whatever is returned must not claim exactness
    assert len(out) == 0 or (~out["exact"]).all()
