"""Property-based SQL compiler fuzz: random WHERE/projection expression
trees rendered to SQL text, executed by BOTH our compiler and DuckDB on the
same parquet — any divergence in the (sorted) result set fails. Mirrors the
reference's generated-grammar coverage (ogr/swq_parser.y) with randomized
inputs instead of fixed cases."""

import duckdb
import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gdal_ray.ops.sql import execute
from gdal_ray.util import sf_path, to_arrow

NUM_COLS = ["o_orderkey", "o_custkey", "o_totalprice"]


# Integer literals are emitted as CAST(n AS BIGINT): the engine types bare
# int literals int64 (pa.scalar), but DuckDB types them INT32 and raises
# "Overflow in multiplication of INT32" on e.g. (12*445)*(595*676) — the
# cast pins both engines to the same 64-bit arithmetic.
_INT_LIT = st.integers(min_value=0, max_value=1000).map(
    lambda n: f"CAST({n} AS BIGINT)")


def _num_expr(depth: int):
    if depth <= 0:
        return st.one_of(st.sampled_from(NUM_COLS), _INT_LIT)
    sub = _num_expr(depth - 1)
    return st.one_of(
        st.sampled_from(NUM_COLS),
        _INT_LIT,
        st.tuples(sub, st.sampled_from(["+", "-", "*"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        # round-3 scalar surface: ABS / CASE WHEN (FLOOR/CEIL/ROUND return
        # DOUBLE in DuckDB but BIGINT-ish values — folded via ABS only to
        # keep integer typing stable across engines)
        sub.map(lambda e: f"ABS({e})"),
        st.tuples(sub, st.sampled_from(["<", ">="]), sub, sub, sub).map(
            lambda t: f"(CASE WHEN {t[0]} {t[1]} {t[2]} THEN {t[3]} ELSE {t[4]} END)"
        ),
        # round-4 scalar surface: LEAST/GREATEST/MOD (all BIGINT-stable)
        # and date-part extraction (BIGINT in both engines)
        st.tuples(sub, sub).map(lambda t: f"LEAST({t[0]}, {t[1]})"),
        st.tuples(sub, sub).map(lambda t: f"GREATEST({t[0]}, {t[1]})"),
        sub.map(lambda e: f"MOD({e}, CAST(97 AS BIGINT))"),
        st.sampled_from(["year", "month", "day", "dow", "doy", "week",
                         "quarter"]).map(
            lambda p: f"EXTRACT({p} FROM o_orderdate)"),
    )


def _bool_expr(depth: int):
    cmp = st.tuples(
        _num_expr(1), st.sampled_from(["<", "<=", ">", ">=", "=", "<>"]), _num_expr(1)
    ).map(lambda t: f"({t[0]} {t[1]} {t[2]})")
    if depth <= 0:
        return cmp
    sub = _bool_expr(depth - 1)
    return st.one_of(
        cmp,
        st.tuples(sub, st.sampled_from(["AND", "OR"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        sub.map(lambda e: f"(NOT {e})"),
    )


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"create view orders as select * from read_parquet('{sf_path(sf_dir, 'orders')}')"
    )
    con.execute(
        f"create view supplier as select * from read_parquet('{sf_path(sf_dir, 'supplier')}')"
    )
    return con


def _str_expr(depth: int):
    """Random string-expression trees over supplier columns — the round-4
    string catalogue composed with itself (every rendered string also runs
    verbatim in DuckDB)."""
    base = st.sampled_from(["s_name", "CAST(s_suppkey AS TEXT)"])
    if depth <= 0:
        return base
    sub = _str_expr(depth - 1)
    return st.one_of(
        base,
        sub.map(lambda e: f"UPPER({e})"),
        sub.map(lambda e: f"LOWER({e})"),
        sub.map(lambda e: f"REVERSE({e})"),
        st.tuples(sub, st.integers(1, 6), st.integers(1, 8)).map(
            lambda t: f"SUBSTR({t[0]}, {t[1]}, {t[2]})"),
        st.tuples(sub, st.integers(0, 9)).map(
            lambda t: f"LEFT({t[0]}, {t[1]})"),
        st.tuples(sub, st.integers(1, 9)).map(
            lambda t: f"RIGHT({t[0]}, {t[1]})"),
        st.tuples(sub, st.integers(3, 14)).map(
            lambda t: f"LPAD({t[0]}, {t[1]}, '*')"),
        st.tuples(sub, st.integers(3, 14)).map(
            lambda t: f"RPAD({t[0]}, {t[1]}, '.')"),
        st.tuples(sub, sub).map(lambda t: f"CONCAT({t[0]}, '-', {t[1]})"),
        sub.map(lambda e: f"REPLACE({e}, '0', 'x')"),
        sub.map(lambda e: f"TRIM(CONCAT(' ', {e}, ' '))"),
    )


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(expr=_str_expr(3))
def test_random_string_expression_matches_duckdb(sf_dir, con, expr):
    sql = f"SELECT s_suppkey, {expr} AS v FROM supplier"
    got = to_arrow(execute(sql, sf_dir)).to_pandas().sort_values(
        "s_suppkey").reset_index(drop=True)
    exp = con.execute(sql).df().sort_values(
        "s_suppkey").reset_index(drop=True)
    assert (got["v"].fillna("__N") == exp["v"].fillna("__N")).all(), sql


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(where=_bool_expr(2), proj=_num_expr(2))
def test_random_where_projection_matches_duckdb(sf_dir, con, where, proj):
    sql = f"SELECT o_orderkey, {proj} AS v FROM orders WHERE {where}"
    got = to_arrow(execute(sql, sf_dir)).to_pandas()
    exp = con.execute(sql).df()
    assert len(got) == len(exp), sql
    if len(got):
        g = got.sort_values(["o_orderkey", "v"]).reset_index(drop=True)
        e = exp.sort_values(["o_orderkey", "v"]).reset_index(drop=True)
        assert g["o_orderkey"].tolist() == e["o_orderkey"].tolist(), sql
        assert np.allclose(g["v"].astype(float), e["v"].astype(float)), sql


# ---------------------------------------------------------------------------
# ST_* geometry catalogue property fuzz (no DuckDB spatial offline, so the
# oracle is the invariant set, not an engine comparison)
# ---------------------------------------------------------------------------

_coord = st.floats(min_value=-80, max_value=80, allow_nan=False,
                   allow_infinity=False, width=32)


@st.composite
def _square(draw):
    cx = draw(_coord)
    cy = draw(_coord)
    h = draw(st.floats(min_value=0.5, max_value=20, allow_nan=False, width=32))
    return (float(cx), float(cy), float(h))


@given(a=_square(), b=_square())
@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_st_geometry_invariants(a, b):
    """ST_ function algebraic invariants on random axis-aligned squares:
    symmetry of intersects/distance, containment of centroid, area of the
    convex hull, distance-zero iff intersects, envelope == the square."""
    import pyarrow as pa

    from gdal_ray.geo import wkb as W
    from gdal_ray.ops import sql_geom as SG

    def square_wkb(cx, cy, h):
        ring = np.array([[cx - h, cy - h], [cx + h, cy - h], [cx + h, cy + h],
                         [cx - h, cy + h], [cx - h, cy - h]])
        return W.geom_to_wkb(("polygon", [ring]))

    ga = pa.scalar(square_wkb(*a), pa.binary())
    gb = pa.scalar(square_wkb(*b), pa.binary())

    inter_ab = SG.st_intersects(ga, gb).as_py()
    inter_ba = SG.st_intersects(gb, ga).as_py()
    assert inter_ab == inter_ba
    # axis-aligned squares: intersects iff the intervals overlap
    expect = (abs(a[0] - b[0]) <= a[2] + b[2]) and (abs(a[1] - b[1]) <= a[2] + b[2])
    assert inter_ab == expect, (a, b)

    d_ab = SG.st_distance(ga, gb).as_py()
    d_ba = SG.st_distance(gb, ga).as_py()
    assert abs(d_ab - d_ba) < 1e-9
    assert (d_ab == 0.0) == inter_ab
    # exact square-square distance: hypot of the interval gaps
    gx = max(abs(a[0] - b[0]) - (a[2] + b[2]), 0.0)
    gy = max(abs(a[1] - b[1]) - (a[2] + b[2]), 0.0)
    assert abs(d_ab - float(np.hypot(gx, gy))) < 1e-6

    area = SG.st_area(ga).as_py()
    assert abs(area - (2 * a[2]) ** 2) < 1e-6 * max((2 * a[2]) ** 2, 1.0)
    cen = W.parse_wkb(SG.st_centroid(ga).as_py())
    assert abs(cen[1][0][0] - a[0]) < 1e-6 and abs(cen[1][0][1] - a[1]) < 1e-6
    assert SG.st_contains(ga, SG.st_centroid(ga)).as_py()
    assert SG.st_within(SG.st_centroid(ga), ga).as_py()
    hull_area = SG.st_area(SG.st_convexhull(ga)).as_py()
    assert abs(hull_area - area) < 1e-6 * max(area, 1.0)
    env = SG.st_astext(SG.st_envelope(ga)).as_py()
    assert env == W.geom_to_wkt(W.parse_wkb(ga.as_py())), env


# ---------------------------------------------------------------------------
# Subquery fuzz: random uncorrelated IN (SELECT ...) / scalar subqueries
# ---------------------------------------------------------------------------

_SUB_WHERE = st.sampled_from([
    "o_custkey < 300", "o_totalprice > 100000", "o_orderkey % 7 = 0",
    "o_custkey % 3 = 1",
])
_SUB_AGG = st.sampled_from(["MIN", "MAX", "AVG"])


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(subw=_SUB_WHERE, agg=_SUB_AGG, neg=st.booleans())
def test_random_subqueries_match_duckdb(sf_dir, con, subw, agg, neg):
    notk = "NOT " if neg else ""
    sql = (f"SELECT o_orderkey FROM orders WHERE o_custkey {notk}IN "
           f"(SELECT o_custkey FROM orders WHERE {subw}) "
           f"AND o_totalprice < (SELECT {agg}(o_totalprice) FROM orders)")
    got = to_arrow(execute(sql, sf_dir)).to_pandas()
    exp = con.execute(sql).df()
    assert len(got) == len(exp), sql
    if len(exp):
        assert sorted(got["o_orderkey"]) == sorted(exp["o_orderkey"]), sql
