"""mdim chunked N-D arrays (gdal_ray/mdim.py) — the GDALMDArray analog
(gcore/multidim/gdal_multidim.h): write/open round-trip, slicing with
chunk pruning at the read, statistics vs numpy, axis reduction vs numpy
for every op, and the flatten-to-relational bridge."""

import numpy as np
import pytest

from gdal_ray import mdim


@pytest.fixture(scope="module")
def store(ray_session, tmp_path_factory):
    rng = np.random.RandomState(11)
    arr = rng.randint(0, 1000, size=(37, 24, 13)).astype(np.int64)
    path = str(tmp_path_factory.mktemp("mdim") / "cube")
    meta = mdim.write_array(arr, path, chunks=(16, 10, 8),
                            dims=("x", "y", "t"))
    return arr, path, meta


def test_roundtrip(store):
    arr, path, meta = store
    m2, ds = mdim.open_array(path)
    assert m2.shape == arr.shape and m2.dims == ("x", "y", "t")
    np.testing.assert_array_equal(mdim.materialize(m2, ds), arr)


def test_slice_prunes_and_matches(store):
    arr, path, _ = store
    sl = (slice(5, 30), slice(None), slice(3, 11))
    m, ds = mdim.read_slice(path, sl)
    assert m.shape == (25, 24, 8)
    np.testing.assert_array_equal(mdim.materialize(m, ds), arr[sl])
    # integer index + partial ranks
    m2, ds2 = mdim.read_slice(path, (7,))
    np.testing.assert_array_equal(
        mdim.materialize(m2, ds2)[0], arr[7])


def test_statistics(store):
    arr, path, _ = store
    m, ds = mdim.open_array(path)
    st = mdim.statistics(m, ds)
    assert st["count"] == arr.size
    assert st["min"] == arr.min() and st["max"] == arr.max()
    assert np.isclose(st["mean"], arr.mean())
    assert np.isclose(st["std"], arr.std())


@pytest.mark.parametrize("axis", [0, 1, 2])
@pytest.mark.parametrize("op", ["sum", "mean", "min", "max"])
def test_reduce_axis(store, axis, op):
    arr, path, _ = store
    m, ds = mdim.open_array(path)
    rm, rds = mdim.reduce_axis(m, ds, axis, op)
    got = mdim.materialize(rm, rds)
    exp = getattr(np, op)(arr, axis=axis)
    if op in ("sum", "mean"):
        np.testing.assert_allclose(got, exp.astype(np.float64))
    else:
        np.testing.assert_array_equal(got, exp)
    assert rm.dims == tuple(d for i, d in enumerate(("x", "y", "t"))
                            if i != axis)


def test_to_table_bridge(store):
    arr, path, _ = store
    m, ds = mdim.open_array(path)
    from gdal_ray.util import to_arrow

    t = to_arrow(mdim.to_table(m, ds)).to_pandas()
    assert len(t) == arr.size
    assert t["value"].sum() == arr.sum()
    one = t[(t["i0"] == 3) & (t["i1"] == 4) & (t["i2"] == 5)]
    assert one["value"].iloc[0] == arr[3, 4, 5]


def test_from_table_roundtrip(store):
    """Distributed construction: to_table -> from_table reproduces the
    array exactly (combine='last' with unique cells), and scatter-sum
    combines duplicate cell rows."""
    import pyarrow as pa
    import ray.data as rd

    arr, path, _ = store
    m, ds = mdim.open_array(path)
    rows = mdim.to_table(m, ds)
    m2, cube = mdim.from_table(rows, shape=arr.shape, chunks=(16, 10, 8),
                               dtype=np.int64, combine="last")
    np.testing.assert_array_equal(mdim.materialize(m2, cube), arr)
    # duplicate rows sum under combine='sum'
    t = pa.table({"i0": pa.array([0, 0, 1], pa.int64()),
                  "i1": pa.array([0, 0, 1], pa.int64()),
                  "value": pa.array([2, 3, 7], pa.int64())})
    m3, c3 = mdim.from_table(rd.from_arrow(t), shape=(2, 2), chunks=(2, 2),
                             dtype=np.int64, combine="sum")
    got = mdim.materialize(m3, c3)
    assert got[0, 0] == 5 and got[1, 1] == 7 and got[0, 1] == 0


def test_slice_array_in_memory(store):
    arr, path, _ = store
    m, ds = mdim.open_array(path)
    sl = (slice(10, 33), slice(4, 20), slice(None))
    sm, sds = mdim.slice_array(m, ds, sl)
    np.testing.assert_array_equal(mdim.materialize(sm, sds), arr[sl])
