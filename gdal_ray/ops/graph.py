"""Distributed connected components over an edge Dataset — the missing
step between near-dup CANDIDATE PAIRS and dedup CLUSTERS (pick one
survivor per component). The reference's analog is the single-process
union-find in polygonize/sieve; at 100 TB the edge list (1e8-1e9 pairs
from LSH) never fits one process, so this is the hash-min label
propagation algorithm with pointer jumping:

  label(v) <- min(label(v), min over neighbors' labels)   [1 round]
  label(v) <- label(label(v))                             [pointer jump]

Every step is a hash-partitioned merge (the repo's standard wide-op
shape); rounds converge in O(log(diameter)) thanks to the jump step.
Driver only sees per-round changed-counts, never nodes or edges.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from gdal_ray.ops.relational import hash_partition_reduce


def _sever(ds):
    """Materialize AND cut Ray Data's stats/lineage chain by rewrapping
    the materialized blocks (from_arrow_refs — zero-copy, blocks stay in
    the object store). A plain .materialize() keeps a per-generation
    lineage/stats chain whose metadata compounds: a 12-iteration label
    loop grew 0.5s -> 8.5s per round with materialize() alone, and stays
    ~0.6s flat with the rewrap."""
    import ray.data as rd

    m = ds.materialize()
    return rd.from_arrow_refs(m.to_arrow_refs())


def _pairs_to_edges(pairs_ds, a_col: str, b_col: str):
    """(a, b) pairs -> symmetric (node, nbr) edge rows."""

    def sym(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False)
        b = t[b_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(np.concatenate([a, b]), pa.int64()),
            "nbr": pa.array(np.concatenate([b, a]), pa.int64()),
        })

    return pairs_ds.map_batches(sym, batch_format="pyarrow", batch_size=None)


def _initial_labels(edges, num_parts: int | None = None):
    """label(v) = v for every endpoint (derived from the edges — isolated
    nodes have no pairs and are their own components trivially)."""

    def init(t: pa.Table) -> pa.Table:
        n = np.unique(t["node"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(n, pa.int64()),
                         "label": pa.array(n, pa.int64())})

    per_batch = edges.map_batches(init, batch_format="pyarrow", batch_size=None)
    return hash_partition_reduce(per_batch, ["node"], init, num_parts=num_parts)


def _lookup(request_ds, labels_ds, key_col: str, out_col: str,
            num_parts: int | None = None):
    """Distributed lookup: for each request row, attach labels[label of
    request[key_col]] as out_col. Both sides hash-partition by the key;
    each partition resolves with one sorted searchsorted join."""

    def tag_req(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in t.column_names}
        cols["__k"] = t[key_col]
        cols["__side"] = pa.array(np.zeros(len(t), np.int8))
        cols["__lbl"] = pa.nulls(len(t), pa.int64())
        return pa.table(cols)

    def tag_lab(t: pa.Table, req_cols) -> pa.Table:
        n = len(t)
        cols = {}
        for c in req_cols:
            cols[c] = pa.nulls(n, pa.int64())
        cols["__k"] = t["node"]
        cols["__side"] = pa.array(np.ones(n, np.int8))
        cols["__lbl"] = t["label"]
        return pa.table(cols)

    req_cols = request_ds.schema().names
    tagged_req = request_ds.map_batches(tag_req, batch_format="pyarrow",
                                        batch_size=None)
    tagged_lab = labels_ds.map_batches(
        lambda t: tag_lab(t, req_cols), batch_format="pyarrow", batch_size=None)

    def resolve(t: pa.Table) -> pa.Table:
        side = t["__side"].to_numpy(zero_copy_only=False)
        req = t.filter(pa.array(side == 0))
        lab = t.filter(pa.array(side == 1))
        out_cols = {c: req[c] for c in req_cols}
        if len(req) == 0:
            out_cols[out_col] = pa.array([], pa.int64())
            return pa.table(out_cols)
        lk = lab["__k"].to_numpy(zero_copy_only=False)
        lv = lab["__lbl"].to_numpy(zero_copy_only=False)
        o = np.argsort(lk, kind="mergesort")
        lk, lv = lk[o], lv[o]
        rk = req["__k"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(lk, rk)
        pos_c = np.minimum(pos, max(lk.size - 1, 0))
        hit = (lk.size > 0) & (lk[pos_c] == rk) if lk.size else np.zeros(rk.size, bool)
        vals = np.where(hit, lv[pos_c] if lk.size else 0, rk)
        out_cols[out_col] = pa.array(vals, pa.int64())
        return pa.table(out_cols)

    return hash_partition_reduce(tagged_req.union(tagged_lab), ["__k"], resolve,
                                 num_parts=num_parts)


def connected_components(pairs_ds, a_col: str = "id_a", b_col: str = "id_b",
                         *, max_rounds: int = 50,
                         num_parts: int | None = None):
    """-> Dataset (node, component) where component = min node id of the
    connected component. Raises if not converged within max_rounds (each
    round is min-propagation + one pointer jump, so rounds ~ log2 of the
    largest component's diameter).

    num_parts defaults to 2x cluster CPUs (floor 16) — smaller than the
    repo-wide 8x/256 hash-reduce default because every ROUND pays the
    partition count several times over; label rows are narrow, so fewer,
    larger partitions win until the per-partition label set outgrows a
    worker."""
    from gdal_ray.util import default_num_parts

    if num_parts is None:
        num_parts = default_num_parts(multiplier=2, floor=16)
    edges = _sever(_pairs_to_edges(pairs_ds, a_col, b_col))
    labels = _sever(_initial_labels(edges, num_parts=num_parts))

    for _ in range(max_rounds):
        # 1. neighbor messages: for each edge (node, nbr) the current
        #    label of nbr, via distributed lookup keyed on nbr.
        #    MATERIALIZED: every executed plan must contain at most ONE
        #    union — _lookup has one inside, and feeding it lazily into
        #    the min stage's union nests them, which Ray's executor
        #    re-executes multiplicatively (measured: rounds grew 0.8s ->
        #    150s on 17 rows; with the materialize they stay ~1s flat)
        msgs = _sever(_lookup(edges, labels, "nbr", "nbr_label",
                              num_parts=num_parts))

        def msg_rows(t: pa.Table) -> pa.Table:
            return pa.table({"node": t["node"], "cand": t["nbr_label"]})

        cand = msgs.map_batches(msg_rows, batch_format="pyarrow", batch_size=None)

        def own_rows(t: pa.Table) -> pa.Table:
            # own label doubles as the OLD value for the convergence check
            n = len(t)
            return pa.table({"node": t["node"], "cand": t["label"],
                             "is_own": pa.array(np.ones(n, np.int8))})

        def cand_rows(t: pa.Table) -> pa.Table:
            n = len(t)
            return pa.table({"node": t["node"], "cand": t["cand"],
                             "is_own": pa.array(np.zeros(n, np.int8))})

        own = labels.map_batches(own_rows, batch_format="pyarrow", batch_size=None)
        cand = cand.map_batches(cand_rows, batch_format="pyarrow", batch_size=None)

        def min_per_node(t: pa.Table) -> pa.Table:
            df = pd.DataFrame({"node": t["node"].to_numpy(zero_copy_only=False),
                               "cand": t["cand"].to_numpy(zero_copy_only=False),
                               "own": t["is_own"].to_numpy(zero_copy_only=False)})
            g = df.groupby("node", sort=False).agg(
                label=("cand", "min")).reset_index()
            olds = df[df["own"] == 1].set_index("node")["cand"]
            old = olds.reindex(g["node"]).to_numpy()
            return pa.table({"node": pa.array(g["node"].to_numpy(), pa.int64()),
                             "label": pa.array(g["label"].to_numpy(), pa.int64()),
                             "changed": pa.array(
                                 (g["label"].to_numpy() != old).astype(np.int8))})

        minned = _sever(hash_partition_reduce(
            cand.union(own), ["node"], min_per_node, num_parts=num_parts))
        n_changed = sum(
            int(b["changed"].to_numpy(zero_copy_only=False).sum())
            for b in minned.iter_batches(batch_size=None, batch_format="pyarrow"))
        new_labels = minned.map_batches(
            lambda t: t.select(["node", "label"]),
            batch_format="pyarrow", batch_size=None)
        # 2. pointer jump: label <- label(label)
        jumped = _lookup(new_labels, new_labels, "label", "label2",
                         num_parts=num_parts)

        def take_jump(t: pa.Table) -> pa.Table:
            return pa.table({"node": t["node"], "label": t["label2"]})

        # CAP THE BLOCK COUNT: each union-sort round otherwise DOUBLES
        # the label dataset's blocks (measured 1 -> 16 in 4 rounds on 17
        # rows), compounding every later shuffle's fixed cost
        nb = labels.num_blocks()
        new_labels = _sever(jumped.map_batches(
            take_jump, batch_format="pyarrow", batch_size=None
        ).repartition(max(min(nb, 64), 8)))

        labels = new_labels
        if n_changed == 0:
            return labels.map_batches(
                lambda t: t.rename_columns(["node", "component"]),
                batch_format="pyarrow", batch_size=None)
    raise RuntimeError(f"connected_components: no convergence in {max_rounds} rounds")


def dedup_survivors(pairs_ds, a_col: str = "id_a", b_col: str = "id_b",
                    *, num_parts: int | None = None):
    """Near-dup clusters -> survivors: every node's component plus a
    `keep` flag (True for the minimum id of each component — the
    canonical doc). Docs not in any pair are implicitly kept."""
    comps = connected_components(pairs_ds, a_col, b_col, num_parts=num_parts)

    def flag(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        comp = t["component"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": t["node"], "component": t["component"],
            "keep": pa.array(node == comp),
        })

    return comps.map_batches(flag, batch_format="pyarrow", batch_size=None)
