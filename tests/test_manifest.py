"""Lineage manifest + resume: write, kill-simulate, resume skips done."""

import os
import shutil

import numpy as np
import pyarrow as pa
import ray.data as rd

from gdal_ray.state import manifest as M
from gdal_ray.util import to_arrow


def _ds(n=1000):
    rng = np.random.RandomState(2)
    return rd.from_arrow(
        pa.table(
            {
                "cell": rng.randint(0, 7, n),
                "value": rng.uniform(0, 1, n),
                "id": np.arange(n),
            }
        )
    )


def test_write_verify_resume(tmp_path):
    out = str(tmp_path / "out")
    res = to_arrow(M.write_partitioned_resumable(_ds(), out, "cell"))
    assert res.num_rows == 7
    assert sum(res["rows"].to_pylist()) == 1000
    # verify manifest round-trip
    ok = M.verify_manifest(out)
    assert len(ok) == 7 and all(ok.values())
    # full data readable
    assert M.read_partitioned(out).count() == 1000

    # simulate a crash that lost 3 partitions (data + manifest)
    done = M.completed_keys(out)
    lost = sorted(done)[:3]
    for k in lost:
        os.remove(done[k]["fragment"])
        ks = [f for f in os.listdir(out + "/_manifest") if f.startswith(M._keystr(k))]
        os.remove(os.path.join(out, "_manifest", ks[0]))

    # resume: only the 3 lost partitions are rewritten
    res2 = to_arrow(M.write_partitioned_resumable(_ds(), out, "cell"))
    assert res2.num_rows == 3
    assert sorted(res2["key"].to_pylist()) == [str(k) for k in lost]
    assert M.read_partitioned(out).count() == 1000
    assert all(M.verify_manifest(out).values())

    # identical output content vs a fresh one-shot run
    fresh = str(tmp_path / "fresh")
    M.write_partitioned_resumable(_ds(), fresh, "cell").materialize()
    a = to_arrow(M.read_partitioned(out)).to_pandas().sort_values("id").reset_index(drop=True)
    b = to_arrow(M.read_partitioned(fresh)).to_pandas().sort_values("id").reset_index(drop=True)
    assert a.equals(b)


def test_corruption_detected(tmp_path):
    out = str(tmp_path / "o2")
    M.write_partitioned_resumable(_ds(200), out, "cell").materialize()
    done = M.completed_keys(out)
    victim = sorted(done)[0]
    # truncate a fragment
    frag = done[victim]["fragment"]
    t = M.read_partitioned(out)
    import pyarrow.parquet as pq

    tbl = pq.read_table(frag)
    pq.write_table(tbl.slice(0, max(1, tbl.num_rows // 2)), frag)
    ok = M.verify_manifest(out)
    assert ok[victim] is False
    assert sum(1 for v in ok.values() if v) == len(ok) - 1
