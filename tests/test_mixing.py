"""text/mixing: deterministic importance resampling to a target mixture."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from gdal_ray.text.mixing import (KNUTH, mixture_probabilities,
                                  resample_to_mixture)
from gdal_ray.util import to_arrow


def _docs(n, rng):
    langs = rng.choice(["en", "de", "fr", "xx"], size=n,
                       p=[0.6, 0.25, 0.1, 0.05])
    return pa.table({"doc_id": pa.array(range(n), pa.int64()),
                     "lang": pa.array(langs)})


def test_probabilities_math():
    counts = {"en": 600, "de": 250, "fr": 100}
    w = {"en": 0.4, "de": 0.3, "fr": 0.3}
    p = mixture_probabilities(counts, w)
    # K = min(600/.4, 250/.3, 100/.3) = 100/.3; en keeps .4*K/600
    k = 100 / 0.3
    assert abs(p["en"] - 0.4 * k / 600) < 1e-12
    assert abs(p["fr"] - 1.0) < 1e-12  # the binding group keeps all


def test_resample_matches_brute_and_is_layout_independent(ray_session):
    rng = np.random.default_rng(3)
    t = _docs(3000, rng)
    w = {"en": 0.5, "de": 0.3, "fr": 0.2}  # 'xx' absent -> dropped
    stats = {}
    kept = to_arrow(resample_to_mixture(
        rd.from_arrow(t), key_col="lang", id_col="doc_id", weights=w,
        stats_out=stats)).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    # brute force the same rule
    langs = t["lang"].to_pylist()
    counts = {g: langs.count(g) for g in set(langs)}
    probs = mixture_probabilities(counts, w)
    ids = np.arange(3000, dtype=np.uint64)
    u = ((ids * np.uint64(KNUTH)) % np.uint64(2**32)) / float(2**32)
    want = [i for i in range(3000) if u[i] < probs.get(langs[i], 0.0)]
    assert kept["doc_id"].tolist() == want
    assert "xx" not in set(kept["lang"])
    # achieved mixture ~ target (hash acceptance is uniform)
    got_mix = kept["lang"].value_counts(normalize=True)
    for g, wt in w.items():
        assert abs(got_mix.get(g, 0.0) - wt) < 0.05, (g, got_mix.get(g))
    # block-layout independence
    kept2 = to_arrow(resample_to_mixture(
        rd.from_arrow(t).repartition(17), key_col="lang", id_col="doc_id",
        weights=w)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert kept2["doc_id"].tolist() == want
