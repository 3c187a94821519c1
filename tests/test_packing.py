"""text/packing: token-window chunking + next-fit sequence packing,
verified against brute-force Python references and packing invariants."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from gdal_ray.text.packing import chunk_documents, pack_sequences
from gdal_ray.util import to_arrow


def _rand_docs(n, rng, max_words=23):
    words = ["alpha", "b", "gamma2", "dd", "eee", "zz9", "window", "x"]
    texts = [" ".join(rng.choice(words, size=rng.integers(1, max_words)))
             for _ in range(n)]
    return pa.table({"doc_id": pa.array(range(n), pa.int64()),
                     "text": pa.array(texts)})


def _brute_chunks(texts, chunk, overlap):
    stride = chunk - overlap
    out = []
    for did, s in enumerate(texts):
        toks = s.split(" ")
        n = len(toks)
        nch = 1 + max(0, -(-(n - chunk) // stride)) if n > chunk else 1
        for j in range(nch):
            sl = toks[j * stride:j * stride + chunk]
            out.append((did, j, " ".join(sl), len(sl)))
    return sorted(out)


@pytest.mark.parametrize("chunk,overlap", [(8, 0), (5, 2), (4, 3)])
def test_chunk_documents_matches_brute(ray_session, chunk, overlap):
    rng = np.random.default_rng(7)
    t = _rand_docs(80, rng)
    got = to_arrow(chunk_documents(rd.from_arrow(t), chunk_tokens=chunk,
                                   overlap=overlap))
    rows = sorted(zip(got["doc_id"].to_pylist(), got["chunk_idx"].to_pylist(),
                      got["chunk"].to_pylist(), got["n_tokens"].to_pylist()))
    assert rows == _brute_chunks(t["text"].to_pylist(), chunk, overlap)


def test_chunk_zero_overlap_reassembles(ray_session):
    """With overlap=0 the chunks partition the token stream: re-joining
    a doc's chunks in order reproduces the document exactly."""
    rng = np.random.default_rng(3)
    t = _rand_docs(50, rng, max_words=40)
    got = to_arrow(chunk_documents(rd.from_arrow(t), chunk_tokens=6)) \
        .to_pandas().sort_values(["doc_id", "chunk_idx"])
    rebuilt = got.groupby("doc_id")["chunk"].apply(" ".join)
    for did, s in enumerate(t["text"].to_pylist()):
        assert rebuilt[did] == s


def test_pack_sequences_invariants_and_brute(ray_session):
    rng = np.random.default_rng(11)
    t = _rand_docs(300, rng, max_words=30)
    got = to_arrow(pack_sequences(rd.from_arrow(t), max_tokens=40,
                                  num_parts=8)).to_pandas()
    assert len(got) == 300
    assert set(got.columns) == {"doc_id", "n_tokens", "seq_id", "seq_pos"}
    # token counts match whitespace tokenization
    ntok = {i: len(s.split(" ")) for i, s in enumerate(t["text"].to_pylist())}
    assert got.set_index("doc_id")["n_tokens"].to_dict() == ntok
    # per-sequence budget: sum <= max_tokens unless singleton oversized
    for sid, g in got.groupby("seq_id"):
        tot = g["n_tokens"].sum()
        assert tot <= 40 or len(g) == 1
        assert sorted(g["seq_pos"]) == list(range(len(g)))
        # docs in a sequence are consecutive ids within their partition
        assert (g.sort_values("seq_pos")["doc_id"].diff().dropna() > 0).all()
    # brute-force next-fit per partition reproduces the assignment exactly
    for part in range(8):
        ids = sorted(i for i in range(300) if i % 8 == part)
        seqs, cur, s = {}, 0, 0
        for i in ids:
            n = ntok[i]
            if cur and cur + n > 40:
                s += 1
                cur = 0
            seqs[i] = s + (part << 32)
            cur += n
            if cur > 40:  # oversized singleton consumed the sequence
                s += 1
                cur = 0
        sub = got[got["doc_id"] % 8 == part].set_index("doc_id")
        assert sub["seq_id"].to_dict() == seqs


def test_pack_deterministic_across_block_layouts(ray_session):
    """seq assignment is a function of (ids, counts, num_parts) only —
    the same input split into different block counts packs identically."""
    rng = np.random.default_rng(5)
    t = _rand_docs(200, rng)
    a = to_arrow(pack_sequences(rd.from_arrow(t), max_tokens=32,
                                num_parts=4)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = to_arrow(pack_sequences(
        rd.from_arrow(t).repartition(13), max_tokens=32,
        num_parts=4)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_pack_token_col_shortcut(ray_session):
    """token_col reuses a precomputed count (no tokenization shuffle-side)."""
    t = pa.table({"doc_id": pa.array(range(20), pa.int64()),
                  "text": pa.array(["w " * (i + 1) for i in range(20)]),
                  "tc": pa.array([i + 1 for i in range(20)], pa.int64())})
    got = to_arrow(pack_sequences(rd.from_arrow(t), token_col="tc",
                                  max_tokens=10, num_parts=2)).to_pandas()
    assert got.set_index("doc_id")["n_tokens"].to_dict() == {
        i: i + 1 for i in range(20)}


def test_prepare_training_data_end_to_end(ray_session, sf_dir):
    """The composed prep chain: every sequence respects the token budget
    (or is an oversized singleton), chunk ids decode to (doc, chunk)."""
    import ray.data as rd

    from gdal_ray.pipelines.curation import prepare_training_data

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "source"])
    out = to_arrow(prepare_training_data(
        docs, weights={"en": 0.6, "de": 0.4}, chunk_tokens=32,
        max_tokens=128, num_parts=8)).to_pandas()
    assert len(out) > 0
    assert set(out.columns) == {"chunk_id", "n_tokens", "seq_id", "seq_pos"}
    assert (out["n_tokens"] <= 32).all()  # chunking caps every piece
    per_seq = out.groupby("seq_id")["n_tokens"].sum()
    assert (per_seq <= 128).all()  # chunks <= 32 can never need a singleton
    # chunk ids decode: chunk_idx component bounded by the doc's chunks
    assert ((out["chunk_id"] % (1 << 20)) < 1000).all()
