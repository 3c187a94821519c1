"""Distributed logistic-regression quality classifier vs an in-memory
reference running the SAME algorithm (same hashed features, same GD
schedule) — the distributed gradient is a sum of block partials, so
results agree to float tolerance; and the learned model must actually
separate an obviously separable corpus."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from gdal_ray.text.classifier import (hashed_features, score_quality,
                                      train_quality_classifier, _sigmoid)
from gdal_ray.util import to_arrow

POS = ["good clean prose with structure and meaning " * 3,
       "well formed sentences carry information clearly " * 3,
       "a coherent paragraph about real topics and facts " * 3,
       "quality writing uses varied words and clear grammar " * 3]
NEG = ["buy now click here spam spam free offer " * 3,
       "zzz qqq xxx click click spam spam spam " * 3,
       "free free free offer offer click spam " * 3,
       "qqq zzz spam click offer free xxx " * 3]


def _corpus(n_rep=8):
    texts, labels = [], []
    for i in range(n_rep):
        for j, t in enumerate(POS):
            texts.append(t + f" v{i}")
            labels.append(1)
        for j, t in enumerate(NEG):
            texts.append(t + f" v{i}")
            labels.append(0)
    return texts, labels


def ref_train(texts, labels, dim, iters, lr, l2):
    d_idx, b_idx, val, n = hashed_features(pa.array(texts), dim)
    y = np.asarray(labels, dtype=np.float64)
    w = np.zeros(dim + 1, dtype=np.float64)
    for _ in range(iters):
        z = np.full(n, w[dim])
        np.add.at(z, d_idx, val * w[b_idx])
        resid = _sigmoid(z) - y
        g = np.zeros(dim + 1)
        np.add.at(g, b_idx, val * resid[d_idx])
        g[dim] = resid.sum()
        g /= n
        g[:dim] += l2 * w[:dim]
        w = w - lr * g
    return w


def test_train_matches_reference(ray_session):
    texts, labels = _corpus()
    ds = rd.from_arrow(pa.table({"text": texts, "label": labels}))
    w = train_quality_classifier(ds, "label", dim=512, iters=20, lr=2.0,
                                 l2=1e-4, num_parts=4)
    w_ref = ref_train(texts, labels, 512, 20, 2.0, 1e-4)
    # distributed partial sums reorder float additions; GD amplification
    # over 20 iterations stays tiny
    assert np.allclose(w, w_ref, rtol=1e-8, atol=1e-10)


def test_scores_separate_classes(ray_session):
    texts, labels = _corpus()
    ds = rd.from_arrow(pa.table({"text": texts, "label": labels}))
    w = train_quality_classifier(ds, "label", dim=512, iters=40, lr=2.0,
                                 num_parts=4)
    out = to_arrow(score_quality(ds, w, concurrency=(1, 2)))
    s = out["quality_score"].to_numpy(zero_copy_only=False)
    y = out["label"].to_numpy(zero_copy_only=False)
    assert s[y == 1].min() > 0.5
    assert s[y == 0].max() < 0.5


def test_hashed_features_l2_and_counts():
    d_idx, b_idx, val, n = hashed_features(
        pa.array(["a a b", "c", ""]), dim=64)
    assert n == 3
    # doc 0: two distinct buckets with counts (2,1) -> L2 norm sqrt(5)
    v0 = np.sort(val[d_idx == 0])
    assert np.allclose(v0, np.array([1.0, 2.0]) / np.sqrt(5.0))
    # doc 1: single word -> 1.0; doc 2 empty -> no entries
    assert np.allclose(val[d_idx == 1], [1.0])
    assert (d_idx == 2).sum() == 0


def test_layout_independence(ray_session):
    texts, labels = _corpus()
    ds1 = rd.from_arrow(pa.table({"text": texts, "label": labels}))
    w1 = train_quality_classifier(ds1, "label", dim=256, iters=10,
                                  num_parts=2)
    w2 = train_quality_classifier(ds1, "label", dim=256, iters=10,
                                  num_parts=2)
    assert np.array_equal(w1, w2)
