"""Deterministic importance resampling to a target group mixture.

The data-mixing step of an LLM pipeline (public shape: DoReMi/The Pile
domain weights): given per-group target weights, downsample each group so
the kept corpus matches the target mixture exactly in expectation, keeping
the corpus as LARGE as possible without upsampling any group.

Math: with group sizes n_g and weights w_g (sum 1), the largest achievable
kept-corpus size is K = min_g n_g / w_g; each group keeps
p_g = min(1, w_g * K / n_g) of its rows. Acceptance is a DETERMINISTIC
per-id hash (Knuth multiplicative, u = ((id * 2654435761 + seed) mod 2^32)
/ 2^32 < p_g) so the sample is reproducible, resumable, and exactly
restatable in SQL for the oracle.

Ray shape: ONE tiny count aggregate (groupby_agg combiner — only (group,
count) partials shuffle), probabilities broadcast in the filter closure,
then a shuffle-free vectorized filter map. Groups absent from `weights`
are dropped (weight 0).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

KNUTH = 2654435761


def mixture_probabilities(counts: dict, weights: dict) -> dict:
    """p_g per group from observed counts and target weights."""
    present = {g: w for g, w in weights.items() if counts.get(g, 0) > 0}
    if not present:
        return {}
    k = min(counts[g] / w for g, w in present.items() if w > 0)
    return {g: min(1.0, w * k / counts[g]) for g, w in present.items()}


def resample_to_mixture(ds, *, key_col: str, id_col: str, weights: dict,
                        seed: int = 0, stats_out: dict | None = None):
    """Filter `ds` down to the target mixture; returns the surviving rows
    (all columns). Deterministic in (id, seed) — independent of block
    layout and cluster size."""
    from gdal_ray.ops.relational import groupby_agg
    from gdal_ray.util import to_arrow

    cnt_tbl = to_arrow(groupby_agg(
        ds, [key_col], [("n", "count_star", None)]))
    counts = dict(zip((v.as_py() for v in cnt_tbl[key_col]),
                      (v.as_py() for v in cnt_tbl["n"])))
    probs = mixture_probabilities(counts, weights)
    if stats_out is not None:
        stats_out.update(counts=counts, probs=probs)

    def keep(t: pa.Table, probs=probs, seed=seed) -> pa.Table:
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        u = (((ids.astype(np.uint64) * np.uint64(KNUTH))
              + np.uint64(seed)) % np.uint64(2**32)).astype(np.float64) \
            / float(2**32)
        # per-row p via dictionary-encode: the probs lookup runs once per
        # DISTINCT group per batch, never per row
        enc = pc.dictionary_encode(t[key_col].combine_chunks())
        pvals = np.array([probs.get(v.as_py(), 0.0)
                          for v in enc.dictionary] + [0.0], np.float64)
        idx = enc.indices.fill_null(len(enc.dictionary)) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        p = pvals[idx]
        return t.filter(pa.array(u < p))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=None)
