"""Span-level exact deduplication (the C4 step from Raffel et al. 2020
§2.2, public: "discard all but one of any occurring-more-than-once
three-sentence span"), re-expressed over word n-grams so it applies to
unpunctuated corpora: every occurrence of a corpus-duplicated word n-gram
is deleted from its document EXCEPT the globally-first occurrence
(minimum (doc, position)); surviving tokens are re-joined with single
spaces.

Ray shape — TWO hash shuffles, one tokenization pass, no broadcast of
anything corpus-sized:

1. fused gram reduce + occurrence filter: each corpus batch emits, from a
   single tokenization, both its gram occurrences and its per-batch
   (gram-hash, count, argmin(doc,pos)) winner partials — all keyed by the
   gram hash, so ONE `hash_partition_reduce` co-locates them; each
   partition reduces partials to the duplicated-gram winners (count >= 2)
   and immediately probes its occurrences to emit the deletions.
2. apply: deletions and documents co-partition by doc id; each partition
   rebuilds text with a flat keep-mask over Arrow list offsets and one
   vectorized `pc.binary_join`.

Gram identity is the 64-bit FNV token fold shared with the MinHash
pipeline; a collision deletes a non-duplicated span with probability
~G²/2⁶⁵ — negligible for any real corpus."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from gdal_ray.ops.relational import hash_partition_reduce
from gdal_ray.text.decontam import _doc_ngram_hashes


def _occurrences(t: pa.Table, n: int, id_col: str, text_col: str):
    """(gram hash uint64, doc id int64, pos int64 0-based) per occurrence."""
    gh, gdoc = _doc_ngram_hashes(pc.cast(t[text_col], pa.string()), n)
    ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
    if gh.size == 0:
        return gh, np.empty(0, np.int64), np.empty(0, np.int64)
    # position within doc: occurrence index minus the doc's first index
    first = np.zeros(gdoc.size, np.int64)
    new = np.ones(gdoc.size, bool)
    new[1:] = gdoc[1:] != gdoc[:-1]
    starts = np.flatnonzero(new)
    first = np.repeat(starts, np.diff(np.concatenate([starts, [gdoc.size]])))
    pos = np.arange(gdoc.size, dtype=np.int64) - first
    return gh, ids[gdoc], pos


def duplicated_gram_winners(ds, n: int = 5, id_col: str = "doc_id",
                            text_col: str = "text"):
    """Dataset of (h, win_doc, win_pos) for every gram with >= 2 total
    occurrences; winner = lexicographic min (doc, pos)."""

    def partial(t: pa.Table) -> pa.Table:
        gh, doc, pos = _occurrences(t, n, id_col, text_col)
        if gh.size == 0:
            return pa.table({"h": pa.array([], pa.uint64()),
                             "cnt": pa.array([], pa.int64()),
                             "win_doc": pa.array([], pa.int64()),
                             "win_pos": pa.array([], pa.int64())})
        order = np.lexsort((pos, doc, gh))
        hs, ds_, ps = gh[order], doc[order], pos[order]
        new = np.ones(hs.size, bool)
        new[1:] = hs[1:] != hs[:-1]
        gid = np.cumsum(new) - 1
        cnt = np.bincount(gid).astype(np.int64)
        return pa.table({"h": pa.array(hs[new]), "cnt": pa.array(cnt),
                         "win_doc": pa.array(ds_[new]),
                         "win_pos": pa.array(ps[new])})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def reduce_tbl(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        wd = t["win_doc"].to_numpy(zero_copy_only=False)
        wp = t["win_pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((wp, wd, h))
        h, cnt, wd, wp = h[order], cnt[order], wd[order], wp[order]
        new = np.ones(h.size, bool)
        new[1:] = h[1:] != h[:-1]
        gid = np.cumsum(new) - 1
        tot = np.bincount(gid, weights=cnt).astype(np.int64) \
            if gid.size else np.zeros(0, np.int64)
        keep = tot >= 2
        return pa.table({"h": pa.array(h[new][keep]),
                         "win_doc": pa.array(wd[new][keep]),
                         "win_pos": pa.array(wp[new][keep])})

    return hash_partition_reduce(parts, ["h"], reduce_tbl)


def _tag_union(a, b):
    """Union two datasets whose schemas were pre-aligned by the caller."""
    return a.union(b)


def span_dedup(ds, n: int = 5, id_col: str = "doc_id",
               text_col: str = "text", keep_cols=()):
    """Remove every non-first occurrence of corpus-duplicated word n-grams
    from each document. Returns (id_col, text_col [, keep_cols]) with the
    scrubbed text; token order is preserved and docs may become ''."""
    keep_cols = list(keep_cols)
    sch = ds.schema()
    keep_types = dict(zip(sch.names, sch.types))

    # ---- fused stage 1+2: ONE tokenization pass emits both the
    # occurrence rows and the per-batch winner partials, keyed by the
    # same gram hash, so a single shuffle co-locates them; each partition
    # first reduces partials to (count, global winner) and then probes
    # its occurrences. (The unfused form paid a second corpus scan and a
    # third shuffle.)
    def emit(t: pa.Table) -> pa.Table:
        gh, doc, pos = _occurrences(t, n, id_col, text_col)
        if gh.size:
            order = np.lexsort((pos, doc, gh))
            hs, ds_, ps = gh[order], doc[order], pos[order]
            new = np.ones(hs.size, bool)
            new[1:] = hs[1:] != hs[:-1]
            gid = np.cumsum(new) - 1
            cnt = np.bincount(gid).astype(np.int64)
            ph, pd_, pp = hs[new], ds_[new], ps[new]
        else:
            ph = np.empty(0, np.uint64)
            cnt = pd_ = pp = np.empty(0, np.int64)
        return pa.table({
            "h": pa.array(np.concatenate([gh, ph])),
            "cnt": pa.array(np.concatenate(
                [np.full(gh.size, -1, np.int64), cnt])),
            "doc": pa.array(np.concatenate([doc, pd_])),
            "pos": pa.array(np.concatenate([pos, pp])),
        })

    emitted = ds.map_batches(emit, batch_format="pyarrow", batch_size=None)

    def probe(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        doc = t["doc"].to_numpy(zero_copy_only=False)
        pos = t["pos"].to_numpy(zero_copy_only=False)
        is_part = cnt >= 0
        # reduce partials: total count + lexicographic-min (doc, pos)
        ph, pcnt = h[is_part], cnt[is_part]
        pd_, pp = doc[is_part], pos[is_part]
        order = np.lexsort((pp, pd_, ph))
        ph, pcnt, pd_, pp = ph[order], pcnt[order], pd_[order], pp[order]
        new = np.ones(ph.size, bool)
        if ph.size:
            new[1:] = ph[1:] != ph[:-1]
        gid = np.cumsum(new) - 1
        tot = np.bincount(gid, weights=pcnt).astype(np.int64) \
            if gid.size else np.zeros(0, np.int64)
        dupm = tot >= 2
        wh, wd, wp = ph[new][dupm], pd_[new][dupm], pp[new][dupm]
        oh, od, op = h[~is_part], doc[~is_part], pos[~is_part]
        if wh.size == 0 or oh.size == 0:
            return pa.table({"doc": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        idx = np.minimum(np.searchsorted(wh, oh), wh.size - 1)
        dup = wh[idx] == oh
        not_winner = (wd[idx] != od) | (wp[idx] != op)
        rm = dup & not_winner
        return pa.table({"doc": pa.array(od[rm]), "pos": pa.array(op[rm])})

    removals = hash_partition_reduce(emitted, ["h"], probe)

    # ---- stage 3: co-partition removals with documents by doc id ----
    doc_schema_cols = [id_col, text_col] + keep_cols

    def doc_rows(t: pa.Table) -> pa.Table:
        cols = {id_col: pc.cast(t[id_col], pa.int64()),
                text_col: pc.cast(t[text_col], pa.string()),
                "pos": pa.array(np.full(len(t), -1, np.int64))}
        for c in keep_cols:
            cols[c] = t[c]
        return pa.table(cols)

    def rm_rows(t: pa.Table) -> pa.Table:
        cols = {id_col: t["doc"],
                text_col: pa.array([None] * len(t), pa.string()),
                "pos": t["pos"]}
        for c in keep_cols:
            cols[c] = pa.nulls(len(t), keep_types[c])
        return pa.table(cols)

    docs = ds.map_batches(doc_rows, batch_format="pyarrow", batch_size=None)
    rms = removals.map_batches(rm_rows, batch_format="pyarrow",
                               batch_size=None)

    def apply(t: pa.Table) -> pa.Table:
        pos = t["pos"].to_numpy(zero_copy_only=False)
        is_doc = pos < 0
        dt = t.filter(pa.array(is_doc))
        rt = t.filter(pa.array(~is_doc))
        text = dt[text_col].combine_chunks()
        toks = pc.utf8_split_whitespace(text)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = off - off[0]
        vals = toks.flatten()
        ne = np.ones(len(vals), bool)
        if len(vals):
            ne_mask = pc.not_equal(pc.binary_length(vals), 0)
            ne = ne_mask.to_numpy(zero_copy_only=False)
            cs = np.concatenate([[0], np.cumsum(ne, dtype=np.int64)])
            ntok = cs[off[1:]] - cs[off[:-1]]
            if not ne.all():
                vals = vals.filter(ne_mask)
        else:
            ntok = np.zeros(len(dt), np.int64)
        starts = np.concatenate([[0], np.cumsum(ntok)[:-1]]).astype(np.int64)
        keep = np.ones(int(ntok.sum()), bool)
        if len(rt):
            ids = dt[id_col].to_numpy(zero_copy_only=False)
            lookup = np.argsort(ids, kind="stable")
            sid = ids[lookup]
            rdoc = rt[id_col].to_numpy(zero_copy_only=False)
            rpos = rt["pos"].to_numpy(zero_copy_only=False)
            li = np.searchsorted(sid, rdoc)
            # removals' docs are co-partitioned, so every rdoc is present
            local = lookup[np.minimum(li, max(sid.size - 1, 0))]
            base = starts[local] + rpos
            span = (base[:, None] + np.arange(n)[None, :]).ravel()
            keep[span] = False
        if keep.size and ntok.size:
            # reduceat gotchas: equal/overflowing indices for 0-token docs
            ridx = np.minimum(starts, keep.size - 1)
            new_counts = np.add.reduceat(keep, ridx)
            new_counts = np.where(ntok > 0, new_counts, 0)
        else:
            new_counts = np.zeros(len(dt), np.int64)
        kept_vals = vals.filter(pa.array(keep)) if len(vals) else vals
        new_off = np.concatenate([[0], np.cumsum(new_counts)]).astype(np.int32)
        la = pa.ListArray.from_arrays(pa.array(new_off, pa.int32()),
                                      kept_vals)
        joined = pc.binary_join(la, " ")
        cols = {id_col: dt[id_col], text_col: joined}
        for c in keep_cols:
            cols[c] = dt[c]
        return pa.table(cols)

    return hash_partition_reduce(_tag_union(docs, rms), [id_col], apply)
