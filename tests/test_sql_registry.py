"""SQL-over-any-Dataset registry — the OGRDataSource::ExecuteSQL
equivalent: register_table binds a ray Dataset / Arrow table / parquet
path for use in FROM and JOIN, shadowing sf_dir files."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from gdal_ray.ops.sql import execute, register_table, unregister_table
from gdal_ray.util import read_table, sf_path, to_arrow


@pytest.fixture()
def scored(ray_session, sf_dir):
    """A mid-pipeline Dataset (not a file): documents + a computed score."""
    ds = read_table(sf_dir, "documents",
                    columns=["doc_id", "lang", "n_chars"])

    def add_score(t: pa.Table) -> pa.Table:
        return t.append_column(
            "score", pc.multiply(pc.cast(t["n_chars"], pa.float64()), 0.5))

    ds = ds.map_batches(add_score, batch_format="pyarrow", batch_size=None)
    register_table("scored", ds)
    yield to_arrow(ds)
    unregister_table("scored")


def _duck(tbl: pa.Table, sql: str):
    con = duckdb.connect()
    con.register("scored", tbl)
    return con.execute(sql).df()


def test_sql_over_registered_dataset(sf_dir, scored):
    sql = ("SELECT lang, COUNT(*) AS n, ROUND(SUM(score), 4) AS total "
           "FROM scored WHERE n_chars > 200 GROUP BY lang ORDER BY lang")
    got = to_arrow(execute(sql, sf_dir)).to_pandas()
    exp = _duck(scored, sql)
    assert list(got.columns) == list(exp.columns)
    assert (got["lang"] == exp["lang"]).all()
    assert np.allclose(got["total"], exp["total"], rtol=1e-9)
    assert (got["n"].astype(int) == exp["n"].astype(int)).all()


def test_registered_table_in_join(sf_dir, scored):
    """Registered Arrow table on the JOIN side against a registered
    Dataset FROM side."""
    keys = to_arrow(read_table(sf_dir, "documents", columns=["doc_id"]))
    register_table("dockeys", keys.rename_columns(["k_id"]))
    try:
        got = to_arrow(execute(
            "SELECT COUNT(*) AS n FROM scored JOIN dockeys "
            "ON k_id = doc_id", sf_dir)).to_pandas()
        assert int(got["n"].iloc[0]) == scored.num_rows
    finally:
        unregister_table("dockeys")


def test_sql_step_binds_input(ray_session, sf_dir):
    """The pipeline `sql` step exposes its incoming dataset as table
    `input` (ExecuteSQL's implicit layer)."""
    from gdal_ray.pipelines.steps import run_pipeline

    out = run_pipeline([
        ("read", {"path": sf_path(sf_dir, "customer")}),
        ("sql", {"query": "SELECT c_mktsegment, COUNT(*) AS n FROM input "
                          "GROUP BY c_mktsegment ORDER BY c_mktsegment",
                 "sf_dir": sf_dir}),
    ])
    t = to_arrow(out)
    assert t.column_names == ["c_mktsegment", "n"]
    assert sum(t["n"].to_pylist()) == to_arrow(
        read_table(sf_dir, "customer", columns=["c_custkey"])).num_rows


def test_explain_plan_sketch(sf_dir):
    """explain(): static plan introspection — pruned columns, pushdown
    filter, join strategy, decorrelation plan; nothing executes."""
    from gdal_ray.ops.sql import explain

    plan = explain(
        "SELECT l_orderkey, SUM(l_extendedprice) AS s FROM lineitem "
        "JOIN orders ON o_orderkey = l_orderkey "
        "WHERE l_shipdate > DATE '1996-01-01' AND EXISTS "
        "(SELECT * FROM customer WHERE c_custkey = o_custkey) "
        "GROUP BY l_orderkey", sf_dir)
    assert "SCAN lineitem columns=[" in plan
    assert "pushdown=" in plan
    assert "JOIN orders" in plan and "broadcast" in plan
    assert "correlated -> semi/anti join" in plan
    assert "AGGREGATE" in plan
    # EXISTS(SELECT *) must not disable outer pruning
    assert "columns=ALL" not in plan


def test_registered_table_shadows_file(sf_dir):
    """A registered Arrow table with the same name as an sf_dir file wins."""
    tiny = pa.table({"r_regionkey": pa.array([99], pa.int64()),
                     "r_name": pa.array(["X"], pa.string())})
    register_table("region", tiny)
    try:
        got = to_arrow(execute("SELECT r_name FROM region", sf_dir))
        assert got.to_pydict()["r_name"] == ["X"]
    finally:
        unregister_table("region")
    got = to_arrow(execute(
        "SELECT COUNT(*) AS n FROM region", sf_dir))
    assert got.to_pydict()["n"][0] == 5
