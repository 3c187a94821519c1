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
    return con


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
