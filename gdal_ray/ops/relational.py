"""Relational operator layer — the Ray-Data-native restatement of OGR SQL.

Reference semantics: OGR SQL dialect (doc/source/user/ogr_sql_dialect.rst),
executor ogr/ogrsf_frmts/generic/ogr_gensql.cpp, aggregate accumulators
ogr/ogr_swq.h:374-394 (count + compensated sum + Welford M2 — our partial
(sum, sumsq, count) combiners are the distributed equivalent), LEFT JOIN
first-match-wins (ogr_sql_dialect.rst:410-441).

Scale design (100 TB rules):
* every aggregation is TWO-LEVEL: a per-batch vectorized partial aggregate
  (pyarrow group_by inside map_batches — the "combiner") followed by a
  groupby over the already-tiny partials. The all-to-all shuffle only ever
  moves one row per (key, block), never the raw rows.
* top-k never globally sorts the input: per-block top-k first, then a final
  sort+limit over num_blocks*k rows (mirrors the reference's ORDER BY ...
  LIMIT 1 single-scan special case, ogr_gensql.cpp:2423-2445, generalized).
* small-side joins are broadcast (ray.put once, zero-copy ray.get per task),
  per the reference's "copy method layer into memory" advice
  (ogrlayer.cpp:5323-5325). No shuffle.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from gdal_ray.util import DEFAULT_BATCH_SIZE

# ---------------------------------------------------------------------------
# groupby_agg: two-level distributed aggregation
# ---------------------------------------------------------------------------

# spec = (out_name, kind, col); kinds:
_KINDS = {"sum", "count", "count_star", "min", "max", "mean", "std"}


def _partial_plan(specs):
    """Which (col, fn) partials each spec needs. Returns ordered unique list
    of (col, fn) plus per-spec references."""
    partials: list[tuple[str, str]] = []

    def need(col, fn):
        key = (col, fn)
        if key not in partials:
            partials.append(key)
        return f"{col}__{fn}"

    plan = {}
    for out, kind, col in specs:
        if kind == "sum":
            plan[out] = ("sum", need(col, "sum"))
        elif kind == "count_star":
            plan[out] = ("count", need("__ones", "sum"))
        elif kind == "count":
            plan[out] = ("count", need(col, "count"))
        elif kind == "min":
            plan[out] = ("min", need(col, "min"))
        elif kind == "max":
            plan[out] = ("max", need(col, "max"))
        elif kind == "mean":
            plan[out] = ("mean", need(col, "sum"), need(col, "count"))
        elif kind == "std":
            plan[out] = (
                "std",
                need(col, "sum"),
                need(f"__sq_{col}", "sum"),
                need(col, "count"),
            )
        else:
            raise ValueError(f"unknown agg kind {kind}")
    return partials, plan


def groupby_agg(
    ds,
    keys: Sequence[str],
    specs: Sequence[tuple[str, str, str | None]],
    *,
    round_to: dict[str, int] | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
):
    """Distributed GROUP BY with partial (combiner) aggregation.

    specs: (out_name, kind, col) with kind in sum|count|count_star|min|max|
    mean|std (std = sample stddev, matching DuckDB/OGR STDDEV_SAMP).
    keys=[] gives the OGR-SQL global summary record (ogr_gensql.cpp:1071).
    round_to: {out_name: ndigits} applied to float outputs (both sides of an
    oracle comparison must round identically — parallel float summation is
    order-sensitive).
    """
    from ray.data.aggregate import Count, Max, Min, Sum

    keys = list(keys)
    round_to = round_to or {}
    partials, plan = _partial_plan(specs)
    sq_cols = sorted({c[5:] for c, _ in partials if c.startswith("__sq_")})
    need_ones = any(c == "__ones" for c, _ in partials)

    global_key = keys
    if not keys:
        global_key = ["__g"]

    def combine(batch: pa.Table) -> pa.Table:
        if not keys:
            batch = batch.append_column(
                "__g", pa.array(np.zeros(len(batch), dtype=np.int8))
            )
        if need_ones:
            batch = batch.append_column(
                "__ones", pa.array(np.ones(len(batch), dtype=np.int64))
            )
        for col in sq_cols:
            v = pc.cast(batch[col], pa.float64())
            batch = batch.append_column(f"__sq_{col}", pc.multiply(v, v))
        out = batch.group_by(global_key, use_threads=False).aggregate(list(partials))
        names = []
        for name in out.column_names:
            renamed = name
            for col, fn in partials:
                if name == f"{col}_{fn}":
                    renamed = f"{col}__{fn}"
                    break
            names.append(renamed)
        return out.rename_columns(names)

    partial_ds = ds.map_batches(combine, batch_format="pyarrow", batch_size=batch_size)

    # second level: merge partials (tiny — one row per key per block)
    merge_aggs = []
    for col, fn in partials:
        pname = f"{col}__{fn}"
        if fn in ("sum", "count"):
            merge_aggs.append(Sum(pname, alias_name=pname))
        elif fn == "min":
            merge_aggs.append(Min(pname, alias_name=pname))
        elif fn == "max":
            merge_aggs.append(Max(pname, alias_name=pname))
    merged = partial_ds.groupby(global_key).aggregate(*merge_aggs)

    out_names = [out for out, _, _ in specs]

    def finalize(t: pa.Table) -> pa.Table:
        cols = {}
        for k in keys:
            cols[k] = t[k]
        for out, kind, _ in specs:
            p = plan[out]
            if p[0] in ("sum", "min", "max"):
                v = t[p[1]]
            elif p[0] == "count":
                v = pc.cast(t[p[1]], pa.int64())
            elif p[0] == "mean":
                v = pc.divide(
                    pc.cast(t[p[1]], pa.float64()), pc.cast(t[p[2]], pa.float64())
                )
            elif p[0] == "std":
                s = pc.cast(t[p[1]], pa.float64()).to_numpy(zero_copy_only=False)
                s2 = pc.cast(t[p[2]], pa.float64()).to_numpy(zero_copy_only=False)
                n = pc.cast(t[p[3]], pa.float64()).to_numpy(zero_copy_only=False)
                with np.errstate(invalid="ignore", divide="ignore"):
                    var = (s2 - s * s / n) / (n - 1.0)
                v = pa.array(np.sqrt(np.maximum(var, 0.0)))
            if out in round_to:
                v = pc.round(v, ndigits=round_to[out], round_mode="half_towards_infinity")
            cols[out] = v
        return pa.table(cols)

    return merged.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# top-k without a global sort
# ---------------------------------------------------------------------------


def topk(ds, sort_cols: Sequence[tuple[str, bool]], k: int):
    """ORDER BY ... LIMIT k. sort_cols = [(col, descending)]. Per-block
    partial top-k, then final sort over <= num_blocks*k rows."""
    by = [c for c, _ in sort_cols]
    asc = [not d for _, d in sort_cols]

    def partial(df):
        return df.sort_values(by, ascending=asc, kind="mergesort").head(k)

    reduced = ds.map_batches(partial, batch_format="pandas")
    return reduced.sort(by, descending=[d for _, d in sort_cols]).limit(k)


# ---------------------------------------------------------------------------
# distinct / count-distinct (two-level)
# ---------------------------------------------------------------------------


def distinct(ds, cols: Sequence[str]):
    """SELECT DISTINCT cols (SWQM_DISTINCT_LIST, ogr_swq.h:322): per-batch
    distinct combiner, then a groupby over the survivors."""
    cols = list(cols)

    def batch_distinct(t: pa.Table) -> pa.Table:
        return t.select(cols).group_by(cols, use_threads=False).aggregate([])

    reduced = ds.map_batches(batch_distinct, batch_format="pyarrow")
    from ray.data.aggregate import Count

    out = reduced.groupby(cols if len(cols) > 1 else cols[0]).aggregate(
        Count(alias_name="__n")
    )
    return out.select_columns(cols)


def count_distinct(ds, col: str) -> int:
    """COUNT(DISTINCT col) — returns a python int (small result)."""
    return distinct(ds, [col]).count()


# ---------------------------------------------------------------------------
# broadcast hash join (small right side)
# ---------------------------------------------------------------------------


def broadcast_join(
    ds,
    right: pa.Table,
    keys: Sequence[str],
    *,
    right_keys: Sequence[str] | None = None,
    how: str = "inner",
    first_match_order: Sequence[str] | None = None,
):
    """Join a Dataset against a broadcast in-memory right side.

    how: "inner" | "left outer". With first_match_order, the right side is
    deduplicated on the key by that ordering before the join — OGR SQL LEFT
    JOIN returns exactly one row per primary row, first match wins
    (ogr_sql_dialect.rst:506-513).
    The right table is ray.put() once; workers ray.get() it zero-copy from
    the local object store (never re-shipped per batch).
    """
    import ray

    keys = list(keys)
    right_keys = list(right_keys) if right_keys is not None else keys
    if first_match_order:
        idx = pc.sort_indices(
            right, sort_keys=[(c, "ascending") for c in list(first_match_order)]
        )
        right = right.take(idx)
        right = right.group_by(right_keys, use_threads=False).aggregate(
            [(c, "first") for c in right.column_names if c not in right_keys]
        )
        right = right.rename_columns(
            [n[:-6] if n.endswith("_first") else n for n in right.column_names]
        )
    ref = ray.put(right)
    join_type = {"inner": "inner", "left": "left outer", "left outer": "left outer"}[how]

    def join_batch(batch: pa.Table) -> pa.Table:
        r = ray.get(ref)
        return batch.join(r, keys=keys, right_keys=right_keys, join_type=join_type)

    return ds.map_batches(join_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# explode (list flatten) — `gdal vector explode` (apps/gdalalg_vector_explode.h:29)
# ---------------------------------------------------------------------------


def explode_list(ds, list_col: str, *, value_name: str, pos_name: str, keep: Sequence[str]):
    """One row per list element; pos is 1-based (SQL WITH ORDINALITY)."""
    keep = list(keep)

    def explode(t: pa.Table) -> pa.Table:
        col = t[list_col].combine_chunks()
        lengths = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        parent = np.repeat(np.arange(len(t), dtype=np.int64), lengths)
        starts = np.repeat(np.cumsum(lengths) - lengths, lengths)
        pos = np.arange(parent.size, dtype=np.int64) - starts + 1
        cols = {}
        for k in keep:
            cols[k] = t[k].take(pa.array(parent))
        cols[pos_name] = pa.array(pos)
        cols[value_name] = pc.list_flatten(col)
        return pa.table(cols)

    return ds.map_batches(explode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# first-match dedup (two-level argmin)
# ---------------------------------------------------------------------------


def first_by(ds, group_keys: Sequence[str], order_cols: Sequence[str]):
    """One row per group: the minimum row under (order_cols) ordering.
    order_cols must end with a unique tiebreaker for determinism.
    Two-level: per-batch winner, then per-group winner of winners — the
    shuffle only moves one row per (group, block)."""
    group_keys, order_cols = list(group_keys), list(order_cols)
    by = group_keys + order_cols

    def winners(df):
        return df.sort_values(by, kind="mergesort").drop_duplicates(
            group_keys, keep="first"
        )

    reduced = ds.map_batches(winners, batch_format="pandas")
    key = group_keys if len(group_keys) > 1 else group_keys[0]
    return reduced.groupby(key).map_groups(winners, batch_format="pandas")


# ---------------------------------------------------------------------------
# union all with schema alignment (ogrunionlayer.cpp superset-of-fields)
# ---------------------------------------------------------------------------


def union_all(*datasets):
    out = datasets[0]
    for d in datasets[1:]:
        out = out.union(d)
    return out


def tumbling_window_col(ds, ts_col: str, out_col: str, size_us: int):
    """Add a window-start timestamp column: floor(ts / size) * size.
    (GDAL has no window semantics — §2.11 — this is the training-pipeline
    extension expressed as plain column math + groupby.)"""

    def add(t: pa.Table) -> pa.Table:
        us = pc.cast(t[ts_col], pa.int64())
        w = pc.multiply(pc.floor(pc.divide(pc.cast(us, pa.float64()), float(size_us))), float(size_us))
        w = pc.cast(w, pa.int64())
        return t.append_column(out_col, pc.cast(w, pa.timestamp("us")))

    return ds.map_batches(add, batch_format="pyarrow")
