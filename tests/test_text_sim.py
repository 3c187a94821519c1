"""Text analysis / dedup / similarity vs DuckDB oracles (sf0.001)."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from gdal_ray.sim import knn
from gdal_ray.text import analysis as TA
from gdal_ray.text import dedup as DD
from gdal_ray.util import sf_path, to_arrow


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb.connect()
    for t in ["documents", "embeddings"]:
        con.execute(f"create view {t} as select * from read_parquet('{sf_path(sf_dir, t)}')")
    return con


def test_token_count_matches_duckdb(sf_dir, con):
    ds = rd.read_parquet(sf_path(sf_dir, "documents"), columns=["doc_id", "text"])
    got = to_arrow(TA.add_token_count(ds)).to_pandas().sort_values("doc_id")
    exp = con.execute(
        "select doc_id, length(regexp_extract_all(text, '\\S+')) n from documents order by doc_id"
    ).df()
    assert got["n_tokens"].tolist() == exp["n"].tolist()


def test_fingerprint_matches_md5(sf_dir, con):
    ds = rd.read_parquet(sf_path(sf_dir, "documents"), columns=["doc_id", "text"])
    got = to_arrow(TA.add_fingerprint(ds)).to_pandas().sort_values("doc_id")
    exp = con.execute("select doc_id, md5(text) fp from documents order by doc_id").df()
    assert got["fp"].tolist() == exp["fp"].tolist()


def test_langid_runs_deterministic(sf_dir):
    ds = rd.read_parquet(sf_path(sf_dir, "documents"), columns=["doc_id", "text"])
    out1 = to_arrow(ds.map_batches(TA.LangId, batch_format="pyarrow", concurrency=2))
    out2 = to_arrow(ds.map_batches(TA.LangId, batch_format="pyarrow", concurrency=2))
    d1 = out1.to_pandas().sort_values("doc_id")["lang_pred"].tolist()
    d2 = out2.to_pandas().sort_values("doc_id")["lang_pred"].tolist()
    assert d1 == d2 and len(d1) == 500


def test_exact_dedup(sf_dir, con):
    ds = rd.read_parquet(sf_path(sf_dir, "documents"), columns=["doc_id", "text"])
    got = to_arrow(DD.exact_dedup(ds, "doc_id")).to_pandas().sort_values("fp")
    exp = con.execute(
        "select md5(text) fp, min(doc_id) doc_id from documents group by 1 order by 1"
    ).df()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()


def test_minhash_lsh_finds_exact_dups(sf_dir):
    # identical texts must collide in every band -> candidate pair
    ds = rd.read_parquet(sf_path(sf_dir, "documents"), columns=["doc_id", "text"])
    t = pq.read_table(sf_path(sf_dir, "documents"), columns=["doc_id", "text"])
    texts = t["text"].to_pylist()
    dup_pairs = set()
    seen = {}
    for i, s in zip(t["doc_id"].to_pylist(), texts):
        if s in seen:
            dup_pairs.add((seen[s], i))
        else:
            seen[s] = i
    cand = to_arrow(DD.minhash_candidate_pairs(ds, "doc_id"))
    cand_set = set(zip(cand["id_a"].to_pylist(), cand["id_b"].to_pylist()))
    assert dup_pairs <= cand_set
    verified = to_arrow(DD.exact_jaccard_pairs(ds, cand, "doc_id", threshold=0.999))
    vset = set(zip(verified["id_a"].to_pylist(), verified["id_b"].to_pylist()))
    assert dup_pairs <= vset


def test_simhash_identical_texts_equal(sf_dir):
    ds = rd.read_parquet(sf_path(sf_dir, "documents"), columns=["doc_id", "text"])
    out = to_arrow(ds.map_batches(DD.SimHasher, batch_format="pyarrow", concurrency=2)).to_pandas()
    by_text = {}
    t = pq.read_table(sf_path(sf_dir, "documents"), columns=["doc_id", "text"])
    text_of = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    for _, row in out.iterrows():
        by_text.setdefault(text_of[row.doc_id], set()).add(row.simhash)
    for text, hashes in by_text.items():
        assert len(hashes) == 1


def test_brute_force_knn_matches_duckdb(sf_dir, con):
    ds = rd.read_parquet(sf_path(sf_dir, "embeddings"))
    t = pq.read_table(sf_path(sf_dir, "embeddings"))
    emb = np.asarray(t["embedding"].combine_chunks().flatten(), dtype=np.float64).reshape(len(t), -1)
    ids = np.asarray(t["vec_id"])
    q = emb[ids == 0]
    out = to_arrow(
        knn.brute_force_topk(ds, q, np.array([0]), k=10)
    ).to_pandas().sort_values("score", ascending=False)
    exp = con.execute(
        """select e2.vec_id, list_cosine_similarity(e1.embedding, e2.embedding) s
           from embeddings e1, embeddings e2
           where e1.vec_id=0 and e2.vec_id<>0
           order by s desc, e2.vec_id limit 10"""
    ).df()
    assert out["vec_id"].tolist() == exp["vec_id"].tolist()
    assert np.allclose(out["score"].to_numpy(), exp["s"].to_numpy(), atol=1e-9)


def test_lsh_topk_subset_of_brute(sf_dir):
    ds = rd.read_parquet(sf_path(sf_dir, "embeddings"))
    t = pq.read_table(sf_path(sf_dir, "embeddings"))
    emb = np.asarray(t["embedding"].combine_chunks().flatten(), dtype=np.float64).reshape(len(t), -1)
    ids = np.asarray(t["vec_id"])
    q = emb[ids == 0]
    out = to_arrow(knn.lsh_topk(ds, q, np.array([0]), k=5, dim=emb.shape[1]))
    # approximate: result non-empty and deterministic
    assert out.num_rows >= 1
    out2 = to_arrow(knn.lsh_topk(ds, q, np.array([0]), k=5, dim=emb.shape[1]))
    assert sorted(out["vec_id"].to_pylist()) == sorted(out2["vec_id"].to_pylist())


def test_ivf_topk_recall(sf_dir):
    import numpy as np
    import pyarrow as pa

    from gdal_ray.sim.knn import brute_force_topk, ivf_topk
    from gdal_ray.util import read_table, to_arrow

    ds = read_table(sf_dir, "embeddings")
    tbl = pa.concat_tables(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    Q = np.stack([np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()[:5]])
    qids = np.asarray(tbl["vec_id"].to_pylist()[:5])

    exact = to_arrow(brute_force_topk(ds, Q, qids, 5)).to_pandas()
    approx = to_arrow(ivf_topk(ds, Q, qids, 5, nlist=8, nprobe=4)).to_pandas()
    assert len(approx) <= len(exact)
    # per-query recall vs exact must be high with half the lists probed
    recalls = []
    for qid in qids:
        e = set(exact[exact.query_id == qid]["vec_id"])
        a = set(approx[approx.query_id == qid]["vec_id"])
        recalls.append(len(e & a) / max(len(e), 1))
    assert np.mean(recalls) >= 0.6, recalls
    # probing ALL lists must be exact
    full = to_arrow(ivf_topk(ds, Q, qids, 5, nlist=8, nprobe=8)).to_pandas()
    for qid in qids:
        e = set(exact[exact.query_id == qid]["vec_id"])
        f = set(full[full.query_id == qid]["vec_id"])
        assert e == f, qid


def test_bpe_token_count_matches_duckdb(sf_dir):
    import duckdb

    from gdal_ray.text.analysis import _BPE_RE, add_token_count
    from gdal_ray.util import read_table, sf_path, to_arrow

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    got = to_arrow(add_token_count(ds, pattern="bpe")).to_pandas().sort_values("doc_id")
    con = duckdb.connect()
    pat = _BPE_RE.replace("'", "''")
    exp = con.execute(
        f"""select doc_id, length(regexp_extract_all(text, '{pat}')) n
            from read_parquet('{sf_path(sf_dir, "documents")}') order by doc_id"""
    ).df()
    assert got["n_tokens"].tolist() == exp["n"].tolist()
    # bpe counts >= whitespace counts (punctuation splits off)
    ws = to_arrow(add_token_count(ds, pattern="whitespace")).to_pandas().sort_values("doc_id")
    assert (got["n_tokens"].to_numpy() >= ws["n_tokens"].to_numpy()).all()


def test_lsh_mega_bucket_salting_preserves_recall():
    """A synthetic corpus where >10^4 near-identical docs collide in one
    LSH bucket: the salted pair generator must keep the bucket CONNECTED
    (one component under union-find) and must not silently drop it — the
    round-2 behavior dropped buckets >200 ids entirely."""
    import ray.data as rd

    n = 12_000
    base = "the quick brown fox jumps over the lazy dog again and again "
    texts = [base + ("extra" if i % 2 else "") for i in range(n)]  # 2 variants
    t = pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                  "text": pa.array(texts)})
    ds = rd.from_arrow([t.slice(i, 3000) for i in range(0, n, 3000)])
    cand = to_arrow(DD.minhash_candidate_pairs(ds, "doc_id", bands=4, num_perm=16))
    assert cand.num_rows > 0
    ia = cand["id_a"].to_numpy()
    ib = cand["id_b"].to_numpy()
    # union-find: all docs of each variant must form one component
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(ia, ib):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots = {find(i) for i in range(0, n, 2)}
    assert len(roots) == 1, f"even-variant split into {len(roots)} components"
    roots_odd = {find(i) for i in range(1, n, 2)}
    assert len(roots_odd) == 1
    # pair count stays O(n * pair_cap), not O(n^2)
    assert cand.num_rows < 10_000_000


def test_exact_jaccard_distributed_matches_bruteforce():
    """Distributed verify == per-pair brute force on a small corpus."""
    import ray.data as rd

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",   # near-dup of 0
        "one two three four five six seven eight nine",
        "alpha beta gamma delta epsilon zeta eta theta",  # exact dup of 0
        "totally different words here nothing shared at all",
    ]
    t = pa.table({"doc_id": pa.array(np.arange(5), pa.int64()),
                  "text": pa.array(texts)})
    pairs = pa.table({"id_a": pa.array([0, 0, 0, 2], pa.int64()),
                      "id_b": pa.array([1, 3, 4, 4], pa.int64())})
    ds = rd.from_arrow([t.slice(0, 2), t.slice(2)])
    got = to_arrow(DD.exact_jaccard_pairs(
        ds, pairs, "doc_id", threshold=0.0)).to_pandas()
    got = got.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    exp = {}
    for a, b in zip([0, 0, 0, 2], [1, 3, 4, 4]):
        sa = DD._shingle_hashes(texts[a], 3)
        sb = DD._shingle_hashes(texts[b], 3)
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        exp[(a, b)] = round(inter / (sa.size + sb.size - inter), 6)
    assert len(got) == 4
    for _, r in got.iterrows():
        assert abs(r["jaccard"] - exp[(int(r["id_a"]), int(r["id_b"]))]) < 1e-9


def test_pq_topk_recall_and_exactness_limit():
    """PQ/ADC approximate kNN. Within-cluster ordering is below PQ's
    quantization resolution BY DESIGN (all members share a code), so the
    meaningful properties are: (1) every retrieved neighbor comes from
    the query's own cluster (cluster-level recall 1.0 on well-separated
    clusters); (2) codes are m uint8 per vector; (3) in the LOSSLESS
    regime (corpus = the centroid set itself) PQ top-k order matches
    brute force exactly."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.sim.knn import pq_encode, pq_topk, pq_train

    rng = np.random.RandomState(9)
    centers = rng.normal(0, 10, (20, 16))
    X = np.repeat(centers, 100, axis=0) + rng.normal(0, 0.1, (2000, 16))
    ids = np.arange(2000)
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.FixedSizeListArray.from_arrays(
                      pa.array(X.ravel()), 16)})
    ds = rd.from_arrow([t.slice(i, 500) for i in range(0, 2000, 500)])
    q = X[ids % 400 == 0]
    qids = ids[ids % 400 == 0]
    out = to_arrow(pq_topk(ds, q, qids, k=10, m=8, ksub=64,
                           train_sample=2000)).to_pandas()
    for qi in qids:
        got = out[out["query_id"] == qi]["vec_id"].astype(int).to_numpy()
        assert len(got) == 10
        assert np.all(got // 100 == qi // 100), (qi, got)

    books = pq_train(X, m=8, ksub=64, iters=5)
    codes = pq_encode(X, books)
    assert codes.shape == (2000, 8) and codes.dtype == np.uint8

    # lossless regime: 60 distinct vectors, ksub=64 >= 60 -> every vector
    # is its own code; ADC distances are EXACT -> matches brute force
    V = rng.normal(0, 5, (60, 16))
    ids2 = np.arange(60)
    t2 = pa.table({"vec_id": pa.array(ids2, pa.int64()),
                   "embedding": pa.FixedSizeListArray.from_arrays(
                       pa.array(V.ravel()), 16)})
    ds2 = rd.from_arrow(t2)
    out2 = to_arrow(pq_topk(ds2, V[:3], ids2[:3], k=5, m=8, ksub=64,
                            train_sample=60)).to_pandas()
    for qi in range(3):
        d = ((V - V[qi]) ** 2).sum(1)
        d[qi] = np.inf
        truth = ids2[np.argsort(d, kind="stable")[:5]]
        got = out2[out2["query_id"] == qi].sort_values("dist")["vec_id"].astype(int).to_numpy()
        assert set(got) == set(truth), (qi, got, truth)


def test_ann_merges_are_tree_shaped(sf_dir):
    """VERDICT r3 item 2: brute_force_topk / ivf_topk must pre-reduce
    partials through a tree stage before the single-partition head-k —
    never one task holding q*k*num_blocks rows. The plan must show TWO
    Repartition stages with a merge map between them (pq_topk's ladder)."""
    import re

    import numpy as np

    from gdal_ray.sim.knn import brute_force_topk, ivf_topk
    from gdal_ray.util import read_table

    ds = read_table(sf_dir, "embeddings")
    dim = len(read_table(sf_dir, "embeddings").take(1)[0]["embedding"])
    q = np.random.RandomState(0).standard_normal((2, dim))
    for fn in (brute_force_topk, ivf_topk):
        out = fn(ds, q, np.array([900001, 900002]), 3)
        plan = repr(out)  # lazy Dataset repr prints the full logical chain
        stages = re.findall(r"Repartition", plan)
        assert len(stages) >= 2, f"{fn.__name__} plan lacks tree merge: {plan}"
        assert out.count() > 0


def test_arrow_tokenizer_bit_parity_with_per_doc_path():
    """The Arrow-native tokenizer (utf8_split_whitespace + empty filter)
    must produce BIT-IDENTICAL minhash signatures and simhashes to the
    per-doc Python str.split path on whitespace edge cases."""
    import pyarrow as pa

    from gdal_ray.text import dedup as DD

    texts = [
        "plain words here",
        "  leading and  double   spaces ",
        "tab\tsep\nnewline\r\nmix",
        "",  # empty -> padded window
        None,  # null text
        "one",  # shorter than shingle width
        "unicode nbsp thin　ideographic",
        "élève café 中文 文字",
        " \t \n ",  # whitespace-only
        "x " * 500,  # long doc
    ]
    mh = DD.MinHasher(num_perm=32, shingle_w=3)
    t = pa.table({"text": pa.array(texts, pa.string())})
    batch_sigs = mh(t)["minhash"].combine_chunks()
    import numpy as np

    got = np.asarray(batch_sigs.flatten()).reshape(len(texts), 32)
    for i, s in enumerate(texts):
        expect = mh.signature(s or "")
        assert (got[i] == expect).all(), (i, s)

    # simhash: batch vs a singleton batch per doc
    sh = DD.SimHasher()
    batch = sh(t)["simhash"].to_numpy(zero_copy_only=False)
    for i, s in enumerate(texts):
        one = sh(pa.table({"text": pa.array([s], pa.string())}))
        assert batch[i] == one["simhash"][0].as_py(), (i, s)

    # tokenizer counts match Python str.split
    th, ntok = DD._tokenize_whitespace(t["text"])
    assert ntok.tolist() == [len((s or "").split()) for s in texts]
    assert th.size == int(ntok.sum())


def test_repetition_signals_vs_bruteforce(ray_session):
    """Gopher n-gram repetition coverage: exact match vs a per-doc Python
    brute force (the lexsort grouping must be collision-free and exact)."""
    from collections import Counter

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.text.analysis import repetition_signals
    from gdal_ray.util import to_arrow

    texts = [
        "a b a b a b c",
        "x y z x y z x y z x y z",
        "one two three four five",
        "",
        "w w w w w",
        "p q r s t p q r s t p q r s t",
    ]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(texts))),
                                 "text": texts}))
    out = to_arrow(repetition_signals(ds, top_ns=(2, 3), dup_ns=(2, 5))) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    def brute(text, n):
        ws = text.split()
        grams = [tuple(ws[i:i + n]) for i in range(len(ws) - n + 1)]
        if not grams:
            return 0.0, 0.0
        c = Counter(grams)
        L = max(len(text), 1)

        def glen(g):
            return sum(len(w) for w in g) + (n - 1)

        top = max(f * glen(g) for g, f in c.items())
        dup = sum(f * glen(g) for g, f in c.items() if f > 1)
        return min(top / L, 1.0), min(dup / L, 1.0)

    def rnd6(v):
        return np.floor(v * 1e6 + 0.5) / 1e6

    for i, txt in enumerate(texts):
        row = out.iloc[i]
        for n in (2, 3):
            t_, d_ = brute(txt, n)
            assert row[f"top_{n}gram_char_frac"] == rnd6(t_), (i, n)
            if n == 2:
                assert row[f"dup_{n}gram_char_frac"] == rnd6(d_), (i, n)
        _, d5 = brute(txt, 5)
        assert row["dup_5gram_char_frac"] == rnd6(d5), i


def test_tfidf_top_terms_vs_bruteforce(ray_session):
    """tf * ln(N/df) top-term per doc must match a per-doc Python brute
    force, including the (score desc, term asc) tie-break and k>1."""
    import math
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.text.tfidf import tfidf_top_terms
    from gdal_ray.util import to_arrow

    texts = [
        "apple banana apple cherry",
        "banana banana cherry",
        "unique words only here",
        "",
        "apple apple apple",
        "zeta zeta alpha alpha",  # exact score tie -> term asc wins
    ]
    n = len(texts)
    ds = rd.from_arrow(pa.table({"doc_id": list(range(n)), "text": texts})) \
        .repartition(3)
    got = to_arrow(tfidf_top_terms(ds, k=2, round_digits=None)) \
        .to_pandas().sort_values(["doc_id", "tfidf", "term"],
                                 ascending=[True, False, True])

    df = Counter()
    for t in texts:
        df.update(set(t.split()))
    want = {}
    for i, t in enumerate(texts):
        tf = Counter(t.split())
        scored = sorted(((w, f, df[w], f * math.log(n / df[w]))
                         for w, f in tf.items()),
                        key=lambda x: (-x[3], x[0]))[:2]
        want[i] = scored
    for i in range(n):
        rows = got[got.doc_id == i]
        assert len(rows) == len(want[i]), i
        for (w, f, d, s), (_, r) in zip(want[i], rows.iterrows()):
            assert r["term"] == w and r["tf"] == f and r["df"] == d, (i, w)
            assert abs(r["tfidf"] - s) < 1e-12, (i, w)


def test_redact_pii_patterns(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.text.pii import redact_pii
    from gdal_ray.util import to_arrow

    texts = [
        "mail a.b+c@foo-bar.org now",
        "server at 192.168.0.1 and 10.0.0.255",
        "call 415-555-0042 or 212.555.9999",
        "ssn 078-05-1120 leaked",
        "clean text no pii",
        "two mails x@y.io z@w.ai one ip 1.2.3.4",
    ]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(texts))),
                                 "text": texts}))
    out = to_arrow(redact_pii(ds)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "text"] == "mail <EMAIL> now"
    assert out.loc[1, "text"] == "server at <IP> and <IP>"
    assert out.loc[2, "text"] == "call <PHONE> or <PHONE>"
    assert out.loc[3, "text"] == "ssn <SSN> leaked"
    assert out.loc[4, "text"] == "clean text no pii"
    assert out.loc[5, "text"] == "two mails <EMAIL> <EMAIL> one ip <IP>"
    assert out["n_email"].tolist() == [1, 0, 0, 0, 0, 2]
    assert out["n_ip"].tolist() == [0, 2, 0, 0, 0, 1]
    assert out["n_phone"].tolist() == [0, 0, 2, 0, 0, 0]
    assert out["n_ssn"].tolist() == [0, 0, 0, 1, 0, 0]


def test_span_dedup_vs_bruteforce(ray_session):
    """C4-style span dedup == per-corpus Python brute force: non-first
    occurrences of duplicated n-grams are deleted, winner survives."""
    from collections import defaultdict

    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.text.spandedup import span_dedup
    from gdal_ray.util import to_arrow

    texts = {
        0: "the quick brown fox jumps over the lazy dog",
        1: "lorem the quick brown fox jumps away now",   # dup 5-gram w/ 0
        2: "the quick brown fox jumps over the lazy dog",  # full dup of 0
        3: "totally unrelated words here",
        4: "",
        5: "short doc",
    }
    n = 5
    ds = rd.from_arrow(pa.table({"doc_id": list(texts),
                                 "text": list(texts.values())})).repartition(4)
    got = dict(zip(*[c.to_pylist() for c in
                     to_arrow(span_dedup(ds, n=n)).columns]))

    # brute force
    occ = defaultdict(list)
    for d, t in texts.items():
        ws = t.split()
        for i in range(len(ws) - n + 1):
            occ[tuple(ws[i:i + n])].append((d, i))
    rem = defaultdict(set)
    for gram, lst in occ.items():
        if len(lst) >= 2:
            for d, i in sorted(lst)[1:]:
                rem[d].update(range(i, i + n))
    want = {d: " ".join(w for i, w in enumerate(t.split())
                        if i not in rem[d])
            for d, t in texts.items()}
    assert got == want
    assert got[2] == ""          # whole doc was one duplicated window chain
    assert got[0] == texts[0]    # winner untouched


def test_lm_score_vs_bruteforce(ray_session):
    """Char-trigram LM scoring == per-doc Python brute force (add-one
    smoothing, alphabet from reference trigram chars), incl. non-ASCII."""
    import math
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.text.lmscore import lm_score
    from gdal_ray.util import to_arrow

    ref_texts = ["abcabcabd", "hello world", "café au lait"]
    docs = ["abcab", "hello", "zzzzz", "xy", "", "café"]
    rds = rd.from_arrow(pa.table({"doc_id": list(range(len(ref_texts))),
                                  "text": ref_texts})).repartition(2)
    dds = rd.from_arrow(pa.table({"doc_id": list(range(len(docs))),
                                  "text": docs})).repartition(3)
    got = to_arrow(lm_score(dds, rds, round_digits=None)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    tri = Counter()
    for t in ref_texts:
        for i in range(len(t) - 2):
            tri[t[i:i + 3]] += 1
    pref = Counter()
    for g, c in tri.items():
        pref[g[:2]] += c
    alpha = len({ch for g in tri for ch in g})

    for i, d in enumerate(docs):
        grams = [d[j:j + 3] for j in range(len(d) - 2)]
        if not grams:
            want = 0.0
        else:
            want = sum(math.log((tri.get(g, 0) + 1.0)
                                / (pref.get(g[:2], 0) + alpha))
                       for g in grams) / len(grams)
        assert abs(got.loc[i, "lm_score"] - want) < 1e-12, (i, d)


def test_top_ngrams_matches_duckdb(sf_dir, con):
    """Corpus-wide top-k bigrams + trigrams equal DuckDB's unnest-based
    counts (count desc, gram asc tie cut)."""
    ds = rd.read_parquet(sf_path(sf_dir, "documents"), columns=["text"])
    for n in (2, 3):
        got = to_arrow(TA.top_ngrams(ds, n=n, k=25)).to_pandas() \
            .reset_index(drop=True)
        join = " || ' ' || ".join(f"ws[i+{j}]" for j in range(n))
        exp = con.execute(f"""
            WITH d AS (SELECT list_filter(string_split(text, ' '),
                                          w -> w <> '') AS ws FROM documents),
            g AS (SELECT {join} AS gram FROM
                  (SELECT ws, unnest(generate_series(1, greatest(len(ws) - {n - 1}, 0))) AS i FROM d))
            SELECT gram, COUNT(*) AS n FROM g
            GROUP BY gram ORDER BY n DESC, gram LIMIT 25""").df()
        assert got["gram"].tolist() == exp["gram"].tolist()
        assert got["n"].tolist() == exp["n"].tolist()


def test_bm25_scores_vs_bruteforce(ray_session):
    """bm25_scores (lucene idf) vs a direct per-doc computation; the
    ratio-idf mode must rank identically for a single term."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.text.tfidf import bm25_scores
    from gdal_ray.util import to_arrow

    rng = np.random.default_rng(5)
    vocab = ["data", "query", "window", "join", "scan", "x"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 25)))
             for _ in range(120)]
    t = pa.table({"doc_id": pa.array(range(120), pa.int64()),
                  "text": pa.array(texts)})
    terms = ["data", "window", "absent_term"]
    got = to_arrow(bm25_scores(rd.from_arrow(t), terms)) \
        .to_pandas().set_index("doc_id")["score"].to_dict()

    n = 120
    k1, b = 1.2, 0.75
    dls = [len(s.split(" ")) for s in texts]
    avgdl = sum(dls) / n
    dfv = {w: sum(1 for s in texts if w in s.split(" ")) for w in terms}
    want = {}
    for i, s in enumerate(texts):
        toks = s.split(" ")
        sc = 0.0
        for w in terms:
            f = toks.count(w)
            if f == 0 or dfv[w] == 0:
                continue
            idf = math.log((n - dfv[w] + 0.5) / (dfv[w] + 0.5) + 1.0)
            sc += idf * f * (k1 + 1.0) / (
                f + k1 * (1.0 - b + b * dls[i] / avgdl))
        if sc > 0:
            want[i] = sc
    assert set(got) == set(want)
    for i, v in want.items():
        assert abs(got[i] - v) < 1e-12, i
    # top_k path: ranked prefix of the full result
    top = to_arrow(bm25_scores(rd.from_arrow(t), terms, top_k=7)) \
        .to_pandas()
    full = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:7]
    assert list(zip(top["doc_id"], top["score"])) == full


def test_dedup_within_doc_brute(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.text.analysis import dedup_within_doc
    from gdal_ray.util import to_arrow

    texts = [
        "a b a c b a d",
        "x x x",
        "one two three",
        "",
        "p q p q r p",
    ]
    ds = rd.from_arrow(pa.table({"i": list(range(len(texts))),
                                 "text": texts})).repartition(2)
    out = to_arrow(dedup_within_doc(ds, delimiter=" "))
    out = out.take(pa.compute.sort_indices(out["i"]))

    def brute(t):
        seen, kept = set(), []
        for w in t.split(" "):
            if w not in seen:
                seen.add(w)
                kept.append(w)
        return " ".join(kept), len(kept)

    for i, t in enumerate(texts):
        exp_text, exp_n = brute(t)
        assert out["deduped_text"][i].as_py() == exp_text, t
        assert out["deduped_text_n_kept"][i].as_py() == exp_n, t


def test_bigram_lm_brute(ray_session):
    """bigram_lm_score vs a dict-based reference of the same add-k model
    (history-count convention)."""
    import math
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.text.ngramlm import bigram_lm_score
    from gdal_ray.util import to_arrow

    texts = ["a b a b c", "b c b c a a", "c a b", "x", "a a a a"]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(texts))),
                                 "text": texts})).repartition(2)
    out = to_arrow(bigram_lm_score(ds, k=0.5, num_parts=2))
    out = out.take(pa.compute.sort_indices(out["doc_id"]))

    uni, bi = Counter(), Counter()
    for t in texts:
        ws = t.split()
        for i in range(len(ws) - 1):
            uni[ws[i]] += 1
            bi[(ws[i], ws[i + 1])] += 1
    V = len(uni)
    for d, t in enumerate(texts):
        ws = t.split()
        lps = [math.log((bi[(ws[i], ws[i + 1])] + 0.5)
                        / (uni[ws[i]] + 0.5 * V))
               for i in range(len(ws) - 1)]
        got = out["bigram_logp"][d].as_py()
        if not lps:
            assert got is None
            assert out["bigram_logp_n_bigrams"][d].as_py() == 0
        else:
            assert abs(got - sum(lps) / len(lps)) < 1e-12, t
            assert out["bigram_logp_n_bigrams"][d].as_py() == len(lps)


def test_matryoshka_truncate(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.sim.vectors import matryoshka_truncate
    from gdal_ray.util import to_arrow

    X = np.arange(24, dtype=np.float64).reshape(4, 6) + 1.0
    ds = rd.from_arrow(pa.table({
        "vec_id": list(range(4)),
        "embedding": [row.tolist() for row in X]}))
    out = to_arrow(matryoshka_truncate(ds, 3))
    out = out.take(pa.compute.sort_indices(out["vec_id"]))
    got = np.array(out["embedding"].to_pylist())
    exp = X[:, :3] / np.linalg.norm(X[:, :3], axis=1, keepdims=True)
    assert np.allclose(got, exp)
    assert np.allclose(np.linalg.norm(got, axis=1), 1.0)
    # renormalize=False keeps raw prefixes
    raw = to_arrow(matryoshka_truncate(ds, 3, renormalize=False))
    raw = raw.take(pa.compute.sort_indices(raw["vec_id"]))
    assert np.allclose(np.array(raw["embedding"].to_pylist()), X[:, :3])


def test_kmeans_checkpoint_resume(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.sim.vectors import kmeans_fit

    rng = np.random.default_rng(6)
    X = np.concatenate([rng.normal(c, 0.3, (40, 5))
                        for c in (0.0, 5.0, -5.0)])
    ds = rd.from_arrow(pa.table({
        "vec_id": list(range(len(X))),
        "embedding": [r.tolist() for r in X]})).repartition(3)
    cp = str(tmp_path / "km.npz")
    # phase 1 "crashes" after 3 iterations
    kmeans_fit(ds, k=3, iters=3, checkpoint_path=cp)
    # resume to 8 must equal an uninterrupted 8-iteration run bit-exact
    resumed = kmeans_fit(ds, k=3, iters=8, checkpoint_path=cp)
    clean = kmeans_fit(ds, k=3, iters=8)
    assert np.array_equal(resumed, clean)
    # shape mismatch refused
    import pytest as _pytest

    with _pytest.raises(ValueError, match="shape mismatch"):
        kmeans_fit(ds, k=2, iters=8, checkpoint_path=cp)
