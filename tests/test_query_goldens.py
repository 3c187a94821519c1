"""Value-hash goldens for the deterministic no-oracle queries.

These queries have no SQL-expressible oracle (stateful/streaming/geometric),
but every one of them is DETERMINISTIC (fixed seeds, integer tile math,
order-insensitive normalization), so their full result sets are pinned as
md5 value-hashes at sf0.001 — the FIXTURES.md §5 golden pattern extended
from single checksums to whole result tables. A hash change means the
operator's semantics changed, not just its schedule.

The normalization mirrors tools/check_correctness.py (sorted columns,
int64/float64 casts, float round(9), row-sorted CSV).
"""

import hashlib

import numpy as np
import pandas as pd
import pytest

from gdal_ray.util import to_arrow

GOLDENS = {
    "q18_hll_distinct": (1, "0e2e2bdb1cdde7d5"),
    "q23_simhash": (500, "58ffef84cb098f3c"),
    "q24_langid": (500, "2b1395df46f6452a"),
    "q25_minhash_pairs": (28, "8c71ff1773c927b9"),
    "q27_dedup_clusters": (45, "47351a0e54121128"),
    "q34_lsh_ann": (20, "305a4a51311ee64f"),
    "q35_pq_ann": (25, "ccfabc46bd927d22"),
    "q36_embed_clusters": (308, "4179e38e2a9475dc"),
    "q44_cells": (1000, "29ea38fef238d557"),
    "q47_utm_project": (1000, "b5f7e96a4e4dc199"),
    "q54_contour_lines": (1, "0c43b5da12463843"),
    "q46_hilbert": (1000, "d8edd04885254e34"),
    "q48_cell_knn": (3000, "db4514295e933095"),
    "q50_rasterize_tiles": (256, "acf01b44b47bfab1"),
    "q51_polygonize": (204, "57ef88d713f9a3f2"),
    "q52_layer_algebra": (7, "04b09b04545942c0"),
    "q53_tile_pyramid": (1481, "cf52e763b8dfee3b"),
    # re-pinned r5: sample_tiles_at_points now restores point-column dtypes
    # (event_id int64, was float64 via union NaN-padding) — driver q57 fix
    "q58_sample_cubic": (17, "a3de13395def07b2"),
    "q59_st_sql": (8, "e7372b89a2b3b996"),
    # re-pinned r4: flagship wraps lons across the dateline instead of
    # clamping (uniform component now spans the full 360 deg)
    "q60_flagship_tiles": (548, "593d6aa70cc6413d"),
    # full curation chain (quality+langid+repetition filter+PII+exact
    # dedup+decontam+char budget) — deterministic composed pipeline
    "q95_curation": (481, "8a1be70bf041f9d7"),
    # one-row corpus profile: counts + HLL dup-rate + top-lang share
    "q105_corpus_report": (1, "c1dcf23734167715"),
    # distributed Lloyd's k-means (k=8, 10 iters, smallest-id init)
    "q114_kmeans_clusters": (500, "71947e9f7eed7339"),
    # distributed PageRank (power iteration, fixed num_parts=16, round(9))
    "q150_pagerank": (997, "f0a289249b9c3cf1"),
    # next-fit sequence packing (max_tokens=64, num_parts=16)
    "q155_seq_pack": (500, "d4640ed3b2b0a101"),
    # composed training prep: curate -> mixture -> chunk(64) -> pack(256)
    "q170_training_prep": (669, "9e8991fc5a4bbae0"),
    # SemDeDup (k=8, thr=0.35, 5 iters, min-id survivors): 409/500 kept
    "q176_semdedup": (500, "52dbbcbff56c04c4"),
    # distributed BPE trainer (24 merges, min_count=2, num_parts=8) —
    # exact-parity vs the classic in-memory algorithm in test_bpe.py
    "q180_bpe_merges": (24, "e3914e7c951b8375"),
    # BPE encode with the q180 merges (actor-pool, per-word cache)
    "q181_bpe_encode": (500, "5e3ec46a885895eb"),
    # hashed-BoW logistic quality classifier (dim=1024, 40 GD iters,
    # label = contains-'window'); scores separate 0.90 vs 0.11
    "q182_quality_classifier": (500, "de23f6361a81ce3e"),
    # real WAV/RIFF PCM16 round-trip + DSP features (rms/zcr/centroid/
    # dominant via rfft) through the actor-pool audio stage
    "q184_audio_features": (500, "83740373cceaa16e"),
}


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64).round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_query_golden(sf_dir, name):
    from gdal_ray.pipelines.queries import registry

    qs, _ = registry()
    df = to_arrow(qs[name](sf_dir)).to_pandas()
    rows, want = GOLDENS[name]
    assert len(df) == rows, f"{name}: {len(df)} rows != {rows}"
    got = hashlib.md5(_normalize(df).to_csv(index=False).encode()).hexdigest()[:16]
    assert got == want, f"{name}: value-hash {got} != pinned {want}"
