"""End-to-end web-corpus curation: the composed LLM-training-data chain a
user of this engine would actually run over raw crawled text —

    quality metrics -> language ID -> Gopher repetition signals ->
    rule filter -> PII redaction -> exact dedup (content hash) ->
    test-set decontamination -> per-domain token budget

Every stage is one of this repo's streaming operators (the public methods
of C4 / Gopher / GPT-3 appendix C), so the pipeline is a single lazy
Dataset plan: the per-doc stages fuse into one map chain, and the only
wide ops are the dedup winner reduce and the optional budget shuffle —
nothing corpus-sized ever reaches the driver.

Scale notes (100 TB): exact dedup runs with merge='hash' (survivor set is
corpus-sized — no single-task merge); the survivor semi-join is the
big-big `semi_join_hash` (no broadcast of the id set); decontamination
broadcasts only the benchmark gram set (test sets are small by contract);
PII/quality/repetition are shuffle-free Arrow kernel maps."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from gdal_ray.ops.relational import budget_take, semi_join_hash
from gdal_ray.text.analysis import (LangId, add_quality_metrics,
                                    repetition_signals)
from gdal_ray.text.decontam import contamination_flags
from gdal_ray.text.dedup import exact_dedup
from gdal_ray.text.pii import redact_pii


def curate(ds, *, id_col: str = "doc_id", text_col: str = "text",
           min_tokens: int = 5, min_alpha_ratio: float = 0.25,
           max_dup5: float = 0.5, bench=None, decontam_n: int = 5,
           char_budget: float | None = None, budget_by: str = "source",
           dedup_merge: str = "hash"):
    """Returns the curated Dataset (surviving docs with scrubbed text and
    the per-doc signal columns). `bench` (optional) is the benchmark
    corpus for decontamination; `char_budget` (optional) caps each
    `budget_by` key's running char total."""
    d = add_quality_metrics(ds, text_col=text_col)
    d = d.map_batches(LangId(text_col), batch_format="pyarrow",
                      batch_size=None)
    d = repetition_signals(d, text_col=text_col, top_ns=(2,), dup_ns=(5,))

    def rule_filter(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.greater_equal(t["n_tokens"], min_tokens),
                    pc.greater_equal(t["alpha_ratio"], min_alpha_ratio)),
            pc.less_equal(t["dup_5gram_char_frac"], max_dup5))
        return t.filter(pc.fill_null(keep, False))

    d = d.map_batches(rule_filter, batch_format="pyarrow", batch_size=None)
    d = redact_pii(d, text_col=text_col, counts=False)

    survivors = exact_dedup(d, id_col, text_col=text_col, merge=dedup_merge)
    d = semi_join_hash(d, survivors.select_columns([id_col]), [id_col])

    if bench is not None:
        d = contamination_flags(d, bench, n=decontam_n, text_col=text_col,
                                out="__contam")
        d = d.map_batches(
            lambda t: t.filter(pc.invert(t["__contam"]))
                       .drop_columns(["__contam"]),
            batch_format="pyarrow", batch_size=None)
    if char_budget is not None:
        d = budget_take(d, by=[budget_by], order_col=id_col,
                        weight_col="n_chars_calc", budget=char_budget)
    return d
