"""Multimodal stage plumbing (fake codec, real Ray pipeline)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from gdal_ray.stages import multimodal as MM
from gdal_ray.util import to_arrow


def _docs_ds(sf_dir):
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])


def test_image_pipeline_end_to_end(sf_dir):
    ds = _docs_ds(sf_dir)
    with_img = MM.synth_image_column(ds, id_col="doc_id")
    feats = to_arrow(MM.image_features(with_img, concurrency=(1, 2)))
    assert feats.num_rows == 500
    assert "image" not in feats.column_names  # payload dropped at decode
    assert {"img_mean", "img_std", "img_sig"} <= set(feats.column_names)
    # deterministic across runs
    feats2 = to_arrow(MM.image_features(MM.synth_image_column(_docs_ds(sf_dir), id_col="doc_id"), concurrency=(1, 2)))
    a = feats.to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = feats2.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a[["img_mean", "img_sig"]].equals(b[["img_mean", "img_sig"]])


def test_unknown_codec_raises(sf_dir):
    def table_for(fmt):
        return pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "image": pa.array([b"\x00" * 48], pa.binary()),
                "img_width": pa.array([4], pa.int32()),
                "img_height": pa.array([4], pa.int32()),
                "img_format": pa.array([fmt], pa.string()),
            }
        )

    stage = MM.ImageStage()
    # webp has no dependency-free codec: the documented escape hatch
    with pytest.raises(NotImplementedError, match="codec 'webp'"):
        stage(table_for("webp"))
    # jpeg IS implemented (raster/jpeg.py) — garbage bytes fail cleanly
    with pytest.raises(Exception, match="not a JPEG"):
        stage(table_for("jpeg"))


def test_frame_sampler(sf_dir):
    ds = MM.synth_image_column(_docs_ds(sf_dir).limit(10), id_col="doc_id")
    out = to_arrow(
        ds.map_batches(MM.AudioFrameSampler, batch_format="pyarrow", batch_size=None,
                       concurrency=(1, 2))
    )
    assert out.num_rows == 40  # 10 payloads x 4 frames
    assert out["frame"].to_pylist().count(0) == 10


def test_image_dhash_dedup(sf_dir):
    """dHash is identical for identical payloads and separates distinct
    synthetic images; exact dedup keeps one id per hash."""
    import numpy as np
    import ray.data as rd

    from gdal_ray.stages.multimodal import ImageDHasher, image_dedup_exact, synth_image_column
    from gdal_ray.util import read_table, to_arrow

    ds = read_table(sf_dir, "documents", columns=["doc_id"])
    imgs = synth_image_column(ds, id_col="doc_id")
    hashed = to_arrow(imgs.map_batches(
        ImageDHasher, batch_format="pyarrow", batch_size=None,
        concurrency=2)).to_pandas()
    assert len(hashed) == 500
    # deterministic: same doc -> same hash on a second pass
    hashed2 = to_arrow(synth_image_column(ds, id_col="doc_id").map_batches(
        ImageDHasher, batch_format="pyarrow", batch_size=None,
        concurrency=2)).to_pandas()
    m1 = dict(zip(hashed["doc_id"], hashed["dhash"]))
    m2 = dict(zip(hashed2["doc_id"], hashed2["dhash"]))
    assert m1 == m2
    surv = to_arrow(image_dedup_exact(imgs, "doc_id")).to_pandas()
    assert len(surv) == hashed["dhash"].nunique()
    assert surv["doc_id"].is_unique


def test_png_codec_is_real(sf_dir):
    """fmt='png' stores genuinely PNG-encoded payloads and the actor-pool
    decode path (ImageStage via raster/png.py) recovers EXACTLY the same
    features as the raw-rgb8 path — the codec boundary is a real
    compressed format end-to-end, not the deterministic fake."""
    import pandas as pd

    ds = _docs_ds(sf_dir).limit(20)
    raw = to_arrow(MM.image_features(
        MM.synth_image_column(ds, id_col="doc_id"),
        concurrency=(1, 2))).to_pandas()
    png_ds = MM.synth_image_column(_docs_ds(sf_dir).limit(20),
                                   id_col="doc_id", fmt="png")
    # payload really is PNG bytes (signature + smaller than raw for this
    # regular pattern)
    one = to_arrow(png_ds.limit(1))
    assert one["image"][0].as_py()[:8] == b"\x89PNG\r\n\x1a\n"
    png = to_arrow(MM.image_features(png_ds,
                                     concurrency=(1, 2))).to_pandas()
    raw = raw.sort_values("doc_id").reset_index(drop=True)
    png = png.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        raw[["doc_id", "img_mean", "img_std", "img_sig"]],
        png[["doc_id", "img_mean", "img_std", "img_sig"]])
