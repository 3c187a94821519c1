"""Deterministic synthesized `partsupp` table.

The driver testdata ships the TPC-H-ish tables without partsupp; the five
TPC-H queries that need it (Q2/Q9/Q11/Q16/Q20) would otherwise be
untestable. This module derives partsupp deterministically from the
sf_dir's actual part/supplier key sets using dbgen's supplier-dispersion
formula (TPC-H spec 4.2.3: each part has 4 suppliers,
suppkey = (partkey + i*(S/4 + (partkey-1)/S)) mod S), with availqty /
supplycost drawn from a hash mix of the two keys — fully reproducible,
no randomness, no external data. The parquet lands under /tmp so the
DuckDB oracle can read the SAME file via read_parquet().
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

PARTSUPP_PATH = "/tmp/gdal_ray_partsupp.parquet"


def ensure_partsupp(sf_dir: str, path: str = PARTSUPP_PATH) -> str:
    """Write (if stale) and return the synthesized partsupp parquet for
    sf_dir. Stale = missing or row count != the deterministic pair count
    derived from this sf_dir's part/supplier keys."""
    from gdal_ray.util import sf_path

    part_path = sf_path(sf_dir, "part")
    supp_path = sf_path(sf_dir, "supplier")
    pkeys = pq.read_table(part_path, columns=["p_partkey"])[
        "p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    pkeys = np.sort(pkeys)
    skeys = pq.read_table(supp_path, columns=["s_suppkey"])[
        "s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    skeys = np.sort(skeys)
    S = len(skeys)
    pi = np.arange(len(pkeys), dtype=np.int64)
    cols_pk, cols_sk = [], []
    for i in range(4):
        si = (pi + i * (S // 4 + pi % S)) % S
        cols_pk.append(pkeys)
        cols_sk.append(skeys[si])
    ps_partkey = np.concatenate(cols_pk)
    ps_suppkey = np.concatenate(cols_sk)
    # drop duplicate (partkey, suppkey) pairs the dispersion can produce
    # at tiny S (primary key of the real table)
    order = np.lexsort((ps_suppkey, ps_partkey))
    ps_partkey, ps_suppkey = ps_partkey[order], ps_suppkey[order]
    keep = np.ones(len(ps_partkey), bool)
    keep[1:] = (np.diff(ps_partkey) != 0) | (np.diff(ps_suppkey) != 0)
    ps_partkey, ps_suppkey = ps_partkey[keep], ps_suppkey[keep]
    if os.path.exists(path):
        try:
            if pq.read_metadata(path).num_rows == len(ps_partkey):
                return path
        except Exception:
            pass
    mix = (ps_partkey * 7919 + ps_suppkey * 104729) & 0x7FFFFFFF
    availqty = (mix % 9999) + 1
    mix2 = (ps_partkey * 104729 + ps_suppkey * 7919) & 0x7FFFFFFF
    supplycost = np.round((mix2 % 99900) / 100.0 + 1.0, 2)
    t = pa.table({
        "ps_partkey": pa.array(ps_partkey),
        "ps_suppkey": pa.array(ps_suppkey),
        "ps_availqty": pa.array(availqty.astype(np.int64)),
        "ps_supplycost": pa.array(supplycost),
    })
    tmp = f"{path}.tmp{os.getpid()}"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return path
