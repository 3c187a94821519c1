"""TPC-H suite (adapted to the testdata columns — see
gdal_ray/pipelines/queries.py TPCH_SQLS) + the SQL machinery it exercises:
derived tables, CTEs, correlated EXISTS / scalar-subquery decorrelation,
DATE/INTERVAL literals, expression-over-aggregate projections. Every
string runs verbatim in DuckDB — perfect oracle symmetry."""

import duckdb
import numpy as np
import pytest

from gdal_ray.ops.sql import execute
from gdal_ray.pipelines.queries import TPCH_SQLS
from gdal_ray.util import sf_path, to_arrow


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem"]:
        con.execute(f"create view {t} as select * from "
                    f"read_parquet('{sf_path(sf_dir, t)}')")
    return con


def _compare(got, exp, label):
    assert sorted(got.columns) == sorted(exp.columns), label
    cols = sorted(got.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    exp = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(got) == len(exp), (label, len(got), len(exp))
    for c in cols:
        gv, ev = got[c], exp[c]
        if gv.dtype.kind == "f" or ev.dtype.kind == "f":
            assert np.allclose(gv.astype(float), ev.astype(float),
                               rtol=1e-9, equal_nan=True), (label, c)
        else:
            assert (gv.astype(str) == ev.astype(str)).all(), (label, c)


@pytest.mark.parametrize("name", sorted(TPCH_SQLS))
def test_tpch_matches_duckdb(sf_dir, con, name):
    sql = TPCH_SQLS[name][0]
    got = to_arrow(execute(sql, sf_dir)).to_pandas()
    exp = con.execute(sql).df()
    _compare(got, exp, name)


DECORRELATION_CASES = [
    # correlated EXISTS with local predicate
    "SELECT COUNT(*) AS n FROM orders WHERE EXISTS (SELECT * FROM lineitem "
    "WHERE l_orderkey = o_orderkey AND l_quantity > 45)",
    # NOT EXISTS (anti join)
    "SELECT COUNT(*) AS n FROM customer WHERE NOT EXISTS (SELECT * FROM "
    "orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)",
    # correlated IN
    "SELECT COUNT(*) AS n FROM orders WHERE o_orderkey IN (SELECT "
    "l_orderkey FROM lineitem WHERE l_suppkey = o_custkey)",
    # correlated scalar with comparison (missing groups -> NULL -> dropped)
    "SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > (SELECT "
    "2 * AVG(l_extendedprice) FROM lineitem WHERE l_orderkey = o_orderkey)",
    # empty result keeps schema (typed-empty sentinel)
    "SELECT c_mktsegment, SUM(c_acctbal) AS total FROM customer "
    "WHERE c_custkey < 0 GROUP BY c_mktsegment",
    # global aggregate over empty input -> one row (COUNT 0, SUM NULL)
    "SELECT COUNT(*) AS n, SUM(c_acctbal) AS s FROM customer "
    "WHERE c_custkey < 0",
    # derived table in FROM and in JOIN
    "SELECT seg, n FROM (SELECT c_mktsegment AS seg, COUNT(*) AS n FROM "
    "customer GROUP BY c_mktsegment) t WHERE n > 10 ORDER BY seg",
    # CTE referenced twice (join side + scalar subquery)
    "WITH big AS (SELECT o_custkey AS k, SUM(o_totalprice) AS tot FROM "
    "orders GROUP BY o_custkey) SELECT COUNT(*) AS n FROM big "
    "WHERE tot > (SELECT AVG(tot) FROM big)",
    # LEFT OUTER JOIN spelling + INNER JOIN spelling
    "SELECT COUNT(*) AS n FROM customer LEFT OUTER JOIN nation "
    "ON n_nationkey = c_nationkey",
    "SELECT COUNT(*) AS n FROM customer INNER JOIN nation "
    "ON n_nationkey = c_nationkey",
]


@pytest.mark.parametrize("sql", DECORRELATION_CASES)
def test_decorrelation_matches_duckdb(sf_dir, con, sql):
    got = to_arrow(execute(sql, sf_dir)).to_pandas()
    exp = con.execute(sql).df()
    _compare(got, exp, sql)


def test_join_hash_path_matches_broadcast(sf_dir, con, monkeypatch):
    """Forcing every parquet join side over the broadcast bound must give
    identical results through the co-partitioned join_hash plan (the
    100-TB path for big right sides)."""
    import gdal_ray.ops.sql as S

    sql = TPCH_SQLS["q119_tpch03"][0]
    monkeypatch.setattr(S, "_BROADCAST_JOIN_MAX_ROWS", 0)
    got = to_arrow(execute(sql, sf_dir)).to_pandas()
    exp = con.execute(sql).df()
    _compare(got, exp, "q3-via-join_hash")
    # LEFT JOIN through the hash path too
    sql2 = ("SELECT c_custkey, COUNT(o_orderkey) AS n FROM customer "
            "LEFT JOIN orders ON o_custkey = c_custkey "
            "GROUP BY c_custkey ORDER BY n DESC, c_custkey LIMIT 25")
    got2 = to_arrow(execute(sql2, sf_dir)).to_pandas()
    exp2 = con.execute(sql2).df()
    _compare(got2, exp2, "left-join-via-join_hash")


def test_empty_group_result_keeps_schema(sf_dir):
    """Ray 2.49 drops the schema of an all-empty pipeline; the typed-empty
    sentinel must preserve column names AND parquet-derived types."""
    out = to_arrow(execute(
        "SELECT c_mktsegment, SUM(c_acctbal) AS total, COUNT(*) AS n "
        "FROM customer WHERE c_custkey < 0 GROUP BY c_mktsegment", sf_dir))
    assert out.num_rows == 0
    assert out.column_names == ["c_mktsegment", "total", "n"]
    import pyarrow as pa

    assert out.schema.field("c_mktsegment").type == pa.string()
    assert out.schema.field("n").type == pa.int64()


def test_interval_month_clamps_day():
    """DATE '2020-01-31' + INTERVAL '1' MONTH clamps to Feb 29 (DuckDB
    calendar semantics)."""
    from gdal_ray.ops.sql import _shift_temporal
    import datetime
    import pyarrow as pa

    v = pa.scalar(datetime.date(2020, 1, 31))
    assert _shift_temporal(v, 1, "month").as_py() == datetime.date(2020, 2, 29)
    assert _shift_temporal(v, -1, "year").as_py() == datetime.date(2019, 1, 31)
