"""Linear referencing (ogrlineref semantics — apps/ogrlineref.cpp):
analytic cases on an L-shaped line + brute-force parity + Ray stage."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from gdal_ray.util import to_arrow
from gdal_ray.vector.lineref import (line_measures, locate_points,
                                     locate_points_along_line,
                                     point_at_measure, split_by_step,
                                     substring)

L = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 5.0]])  # length 15


def test_measures():
    assert line_measures(L).tolist() == [0.0, 10.0, 15.0]


def test_locate_points_analytic():
    m, o = locate_points(L, [3.0, 10.0, 12.0, -2.0], [1.0, 2.0, 4.0, 0.0])
    assert m.tolist() == [3.0, 12.0, 14.0, 0.0]
    assert o.tolist() == [1.0, 0.0, 2.0, 2.0]


def test_point_at_measure():
    assert point_at_measure(L, 0) == (0.0, 0.0)
    assert point_at_measure(L, 7.5) == (7.5, 0.0)
    assert point_at_measure(L, 12.5) == (10.0, 2.5)
    assert point_at_measure(L, 99) == (10.0, 5.0)  # clamped


def test_substring_spans_vertex():
    s = substring(L, 8.0, 12.0)
    assert s.tolist() == [[8.0, 0.0], [10.0, 0.0], [10.0, 2.0]]
    # measures exactly on vertices produce no duplicate points
    s2 = substring(L, 10.0, 15.0)
    assert s2.tolist() == [[10.0, 0.0], [10.0, 5.0]]


def test_split_by_step_conserves_length():
    parts = split_by_step(L, 4.0)
    assert len(parts) == 4  # 4+4+4+3
    total = sum(line_measures(p)[-1] for p in parts)
    assert abs(total - 15.0) < 1e-12
    # parts chain end-to-start
    for a, b in zip(parts, parts[1:]):
        assert np.allclose(a[-1], b[0])


def test_locate_brute_force_parity():
    rng = np.random.default_rng(7)
    line = np.cumsum(rng.normal(size=(40, 2)), axis=0)
    x = rng.uniform(line[:, 0].min(), line[:, 0].max(), 200)
    y = rng.uniform(line[:, 1].min(), line[:, 1].max(), 200)
    m, o = locate_points(line, x, y, chunk_segments=7)  # force chunking
    # brute force: sample the line densely, nearest sample ~ nearest point
    meas = line_measures(line)
    ms = np.linspace(0, meas[-1], 20001)
    samples = np.array([point_at_measure(line, mm) for mm in ms])
    d = np.hypot(samples[:, 0][None, :] - x[:, None],
                 samples[:, 1][None, :] - y[:, None])
    # offset is the GLOBAL min distance (within sampling resolution)...
    assert np.allclose(o, d.min(axis=1), atol=5e-3)
    # ...and the returned measure realizes it (ties between branches may
    # pick either, so compare through the distance, not the measure)
    at = np.array([point_at_measure(line, mm) for mm in m])
    realized = np.hypot(at[:, 0] - x, at[:, 1] - y)
    assert np.allclose(realized, o, atol=1e-9)


def test_ray_stage():
    t = pa.table({"x": pa.array([3.0, 12.0]), "y": pa.array([1.0, 4.0])})
    out = to_arrow(locate_points_along_line(rd.from_arrow(t), L))
    assert out["measure"].to_pylist() == [3.0, 14.0]
    assert out["offset"].to_pylist() == [1.0, 2.0]
