"""SQL-subset compiler: the SAME string runs through our compiler and
through DuckDB — perfect oracle symmetry."""

import duckdb
import pytest

from gdal_ray.ops.sql import execute, parse_select
from gdal_ray.util import sf_path, to_arrow

CASES = [
    "SELECT l_orderkey, l_quantity FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'",
    "SELECT o_orderkey, o_totalprice * 2 AS dbl FROM orders WHERE o_totalprice BETWEEN 1000 AND 2000",
    "SELECT c_mktsegment, COUNT(*) AS n, SUM(c_acctbal) AS total FROM customer GROUP BY c_mktsegment",
    "SELECT COUNT(*) AS n, MIN(l_quantity) AS lo, MAX(l_quantity) AS hi FROM lineitem",
    "SELECT DISTINCT o_orderpriority FROM orders",
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 7",
    "SELECT p_partkey FROM part WHERE p_brand IN ('Brand#11', 'Brand#22') OR p_size >= 49",
    "SELECT p_partkey, CAST(p_retailprice AS BIGINT) AS rp FROM part WHERE p_name LIKE '%ol%' LIMIT 5000",
    "SELECT s_suppkey FROM supplier WHERE NOT s_acctbal < 0",
    "SELECT event_id, event_id % 7 AS bucket FROM events WHERE event_id < 100",
]


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "part", "supplier", "events"]:
        con.execute(f"create view {t} as select * from read_parquet('{sf_path(sf_dir, t)}')")
    return con


@pytest.mark.parametrize("sql", CASES)
def test_sql_matches_duckdb(sf_dir, con, sql):
    got = to_arrow(execute(sql, sf_dir)).to_pandas()
    exp = con.execute(sql).df()
    assert sorted(got.columns) == sorted(exp.columns), sql
    got = got[sorted(got.columns)].sort_values(list(sorted(got.columns))).reset_index(drop=True)
    exp = exp[sorted(exp.columns)].sort_values(list(sorted(exp.columns))).reset_index(drop=True)
    assert len(got) == len(exp), sql
    for c in got.columns:
        gv, ev = got[c], exp[c]
        if gv.dtype.kind == "f" or ev.dtype.kind == "f":
            import numpy as np

            assert np.allclose(gv.astype(float), ev.astype(float), rtol=1e-9), (sql, c)
        else:
            assert (gv.astype(str) == ev.astype(str)).all(), (sql, c)


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_select("SELECT FROM lineitem")
    with pytest.raises(ValueError):
        parse_select("SELECT a lineitem")
    with pytest.raises(ValueError):
        parse_select("SELECT SUM(a + b) FROM t")
