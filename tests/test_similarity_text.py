"""ANN search + text-analysis operators over the driver's testdata tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from nrsr_crawler_spark.operators import similarity as SIM
from nrsr_crawler_spark.operators import text as T
from nrsr_crawler_spark.operators import multimodal as MM
from nrsr_crawler_spark.sources import images as I

SF = "/root/testdata/sf0.001"


def test_bruteforce_topk(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    out = SIM.bruteforce_topk(emb, queries, k=5)
    rows = out.collect()
    assert len(rows) == 15
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        sims = [r["cos_sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)
        assert all(r["neighbor_id"] != q for r in rs)


def test_lsh_topk_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = SIM.bruteforce_topk(emb, queries, k=5)
    # top-1 cosines in this data are only ~0.33 (θ≈70°), so per-bit collision
    # p≈0.61 → bits=4, tables=16 gives theoretical recall ≈0.9
    approx = SIM.lsh_topk(emb, queries, dim=64, k=5, bits=4, tables=16)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.7, recall


def test_ivf_topk_recall_and_candidate_bound(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = SIM.bruteforce_topk(emb, queries, k=5)
    approx = SIM.ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=4)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    # with near-orthogonal random vectors cells are weakly informative; the
    # point of the bound is that probing half the cells must recover at least
    # roughly half the true neighbors while scanning far less than the corpus
    recall = len(e & a) / len(e)
    assert recall >= 0.4, recall
    # every returned neighbor must come from a probed cell (candidate
    # soundness): re-derive assignments and check containment
    n = emb.count()
    probed = SIM.ivf_topk(emb, queries, k=n, n_centroids=8, nprobe=4)
    assert a <= {(r["query_id"], r["neighbor_id"]) for r in probed.collect()}


def test_token_counts(spark):
    df = spark.createDataFrame([("one two  three",), ("",), ("  x ",)], "t string")
    got = [r["n"] for r in df.select(T.token_count(F.col("t")).alias("n")).collect()]
    assert got == [3, 0, 1]


def test_lang_id_on_documents(spark):
    # NB the testdata's `lang` column is a synthetic label unrelated to the
    # text — every doc is the same English-ish word soup; the heuristic must
    # detect that (predict 'en' or abstain with 'unk', never another lang)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    scored = T.lang_scores(docs, "text")
    en_rate = scored.filter(F.col("pred_lang") == "en").count() / docs.count()
    assert en_rate > 0.85, en_rate
    assert scored.filter(~F.col("pred_lang").isin("en", "unk")).count() == 0


def test_lang_id_discriminates(spark):
    rows = [
        (1, "the cat and the dog walk to a house in the rain"),
        (2, "der Hund und die Katze ist nicht ein Tier zu Hause"),
        (3, "qqq www eee rrr"),
    ]
    scored = T.lang_scores(spark.createDataFrame(rows, "doc_id long, text string"), "text")
    got = {r["doc_id"]: r["pred_lang"] for r in scored.collect()}
    assert got == {1: "en", 2: "de", 3: "unk"}


def test_quality_features(spark):
    df = spark.createDataFrame([(1, "The quick fox, it is!")], "doc_id long, text string")
    r = T.quality_features(df, "doc_id", "text").collect()[0]
    assert r["n_tokens"] == 5
    assert r["punct_bps"] > 0 and r["upper_bps"] > 0
    assert r["stopword_bps"] > 0  # 'it' + 'is'


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame([(1, "A  b\tc"), (2, "a b c"), (3, "a b d")], "doc_id long, text string")
    fps = {r["doc_id"]: r["fingerprint"] for r in T.fingerprint(df, "doc_id", "text").collect()}
    assert fps[1] == fps[2] != fps[3]


def test_multimodal_pipeline(spark):
    ids = [(f"img{i:010d}", f"cap {i}") for i in range(1, 13)]
    images = I.build_images(spark, spark.createDataFrame(ids, "image_id string, caption string"))
    stats = MM.decode_stats(images)
    assert stats.count() == 12
    assert stats.filter((F.col("mean_px") < 0) | (F.col("mean_px") > 255)).count() == 0
    small = MM.resize_images(images, 8, 8)
    assert small.filter((F.col("w") != 8) | (F.col("h") != 8)).count() == 0
    feats = MM.extract_features(images, bins=16).collect()
    assert all(len(r["features"]) == 16 for r in feats)
    assert all(abs(sum(r["features"]) - 1.0) < 1e-3 for r in feats)


def test_frame_sampling(spark):
    import numpy as np

    frames = [I.original_pixels(f"f{i}") for i in range(6)]
    data = MM.pack_video(frames, "png")
    videos = spark.createDataFrame([("v1", bytearray(data))], "video_id string, bytes binary")
    sampled = MM.sample_frames(videos, every=2).collect()
    assert [r["frame_idx"] for r in sorted(sampled, key=lambda r: r["frame_idx"])] == [0, 2, 4]
    px, _ = I.decode_image(bytes(sorted(sampled, key=lambda r: r["frame_idx"])[0]["frame_bytes"]))
    assert np.array_equal(px, frames[0])


def test_non_fimg_decode_is_explicit_stub(spark):
    import pytest

    with pytest.raises(Exception, match="Pillow|NotImplemented"):
        MM.decode_stats(
            spark.createDataFrame([("x", bytearray(b"\x89PNG\r\n..."))], "image_id string, bytes binary")
        ).collect()


def test_duplicated_span_stats(spark):
    base = " ".join(f"w{i}" for i in range(20))  # 20 tokens → 13 8-gram windows
    rows = [
        (1, base),                                   # duplicated wholesale by doc 2
        (2, base),
        (3, "alpha " + base),                        # shares base's windows, +1 unique-prefix window... prefix windows overlap base
        (4, " ".join(f"u{i}" for i in range(20))),   # fully unique
        (5, "too short to have any window"),         # 6 tokens < 8 → zero windows
        (6, ""),                                     # empty text
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r.doc_id: (r.n_windows, r.dup_windows, r.dup_bps)
        for r in T.duplicated_span_stats(df, "doc_id", "text", n=8).collect()
    }
    assert out[1] == (13, 13, 10000)
    assert out[2] == (13, 13, 10000)
    # doc 3: 14 windows; the 13 suffix windows equal base's, the 1 window
    # starting at 'alpha' is unique → floor(13*10000/14) = 9285
    assert out[3] == (14, 13, 9285)
    assert out[4] == (13, 0, 0)
    assert out[5] == (0, 0, 0)
    assert out[6] == (0, 0, 0)


def test_lsh_near_dup_pairs_subset_and_recall(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((20, 16))
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    # plant 5 near-dups: tiny perturbations of vectors 0..4 → cosine ≈ 1
    for j in range(5):
        rows.append((100 + j, [float(x) for x in base[j] + rng.standard_normal(16) * 0.01]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    from nrsr_crawler_spark.operators.dedup import embedding_near_dups

    brute = {
        (r.id_a, r.id_b)
        for r in embedding_near_dups(emb, "vec_id", "embedding", threshold=0.95).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in SIM.lsh_near_dup_pairs(
            emb, dim=16, threshold=0.95, bits=8, tables=8
        ).collect()
    }
    assert lsh <= brute  # never invents a pair
    assert {(j, 100 + j) for j in range(5)} <= brute
    # near-parallel planted pairs survive bucketing with 8 tables
    assert len(lsh & {(j, 100 + j) for j in range(5)}) >= 4


def test_lsh_near_dup_hot_bucket_cap(spark):
    # 30 identical vectors → every table's bucket holds all 30; a cap of 10
    # drops the bucket entirely, so NO pairs — the cap is a frequency guard
    rows = [(i, [1.0] * 8) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = SIM.lsh_near_dup_pairs(emb, dim=8, threshold=0.9, bits=4, tables=2, max_bucket=10)
    assert capped.count() == 0
    uncapped = SIM.lsh_near_dup_pairs(emb, dim=8, threshold=0.9, bits=4, tables=2)
    assert uncapped.count() == 30 * 29 // 2


# -- SemDeDup semantic dedup --------------------------------------------------


def test_semantic_dedup_hand_built_clusters(spark):
    from nrsr_crawler_spark.operators.similarity import semantic_dedup

    # centroids = ids < 2: vec0=[1,0] (cell 0), vec1=[0,1] (cell 1).
    # vec2/vec3 point almost exactly along vec0 -> cell 0, both semantic
    # dups of vec0 (min-id keep).  vec4 == vec1 -> dup of 1.  vec5 lands in
    # cell 0 but at cosine ~0.75 to everything there -> kept.
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [1.0, 0.01]),
        (3, [1.0, 0.011]),
        (4, [0.0, 1.0]),
        (5, [0.8, 0.7]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(df, n_centroids=2, threshold=0.95).collect()
    }
    assert len(out) == 6
    assert out[0]["kept"] and out[0]["cell"] == 0
    assert out[1]["kept"] and out[1]["cell"] == 1
    assert out[2]["dup_of"] == 0 and not out[2]["kept"]
    assert out[3]["dup_of"] == 0
    assert out[4]["dup_of"] == 1 and out[4]["cell"] == 1
    assert out[5]["kept"] and out[5]["cell"] == 0


def test_semantic_dedup_max_cell_drops_degenerate_cell(spark):
    from nrsr_crawler_spark.operators.similarity import semantic_dedup

    # 5 identical vectors pile into one cell; with max_cell=3 the cell is
    # excluded from the pair join, so nothing is marked dup — but every
    # vector still appears in the output with its cell id.
    rows = [(i, [1.0, 0.0]) for i in range(5)] + [(9, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, n_centroids=2, threshold=0.95, max_cell=3).collect()
    assert len(out) == 6
    assert all(r["kept"] for r in out)


# -- integer BM25 retrieval ----------------------------------------------------


def _bm25_ref(corpus, queries, k):
    """Pure-Python replica of the integer-BM25 math (retrieval.py docstring)."""
    n = len(corpus)
    toks = {d: t.split() for d, t in corpus}
    t_total = sum(len(v) for v in toks.values())
    df = {}
    for tks in toks.values():
        for term in set(tks):
            df[term] = df.get(term, 0) + 1
    out = []
    for qid, terms in sorted(queries.items()):
        scores = {}
        for d, tks in toks.items():
            s = 0
            for term in terms:
                tf = tks.count(term)
                if tf == 0 or term not in df:
                    continue
                idf = (1_000_000 * (n - df[term])) // n
                dl_part = (750 * len(tks) * n) // t_total
                denom = tf * 1000 + (1200 * (250 + dl_part)) // 1000
                s += (idf * tf * 2200) // denom
            if s:
                scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out.extend((qid, d, s, i + 1) for i, (d, s) in enumerate(ranked))
    return sorted(out)


def test_bm25_topk_matches_pure_python_reference(spark):
    from nrsr_crawler_spark.operators.retrieval import bm25_topk

    corpus = [(1, "cat dog cat"), (2, "dog fish"), (3, "cat cat cat cat")]
    queries = {"q": ["cat", "fish"]}
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = sorted(
        (r["query_id"], r["doc_id"], r["score"], r["rank"])
        for r in bm25_topk(df, "doc_id", "text", queries, k=10).collect()
    )
    assert got == _bm25_ref(corpus, queries, 10)
    # rare term (fish, df=1) outranks saturated common term: d2 first
    by_rank = {r[3]: r[1] for r in got}
    assert by_rank[1] == 2


def test_bm25_ignores_terms_absent_from_corpus(spark):
    from nrsr_crawler_spark.operators.retrieval import bm25_topk

    df = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    out = bm25_topk(df, "doc_id", "text", {"q": ["zzz_missing", "alpha"]}, k=5).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 1  # scored on alpha alone


# -- vocabulary coverage curve -------------------------------------------------


def test_vocab_coverage_counts_and_cumshare(spark):
    from nrsr_crawler_spark.operators.text import vocab_coverage

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    rows = sorted(
        (r["rank"], r["term"], r["cnt"], r["cum_share_bps"])
        for r in vocab_coverage(df, "doc_id", "text", k=10).collect()
    )
    assert rows == [(1, "a", 2, 4000), (2, "b", 2, 8000), (3, "c", 1, 10000)]


# -- fixed-iteration integer k-means -------------------------------------------


def _py_kmeans(vecs: dict[int, list[float]], k: int, iterations: int):
    """Pure-Python mirror of similarity.kmeans_fixed's exact arithmetic."""
    import math

    q = {i: [float(round(x * 1000)) for x in v] for i, v in vecs.items()}
    cents = {i: list(q[i]) for i in sorted(q) if i < k}

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    assign = {}
    for it in range(iterations):
        assign = {
            i: min(((d2(qv, cv), cid) for cid, cv in sorted(cents.items())))[1]
            for i, qv in q.items()
        }
        if it < iterations - 1:
            for cid in cents:
                members = [q[i] for i, c in assign.items() if c == cid]
                if members:
                    cents[cid] = [
                        math.floor(sum(col) / len(col)) for col in zip(*members)
                    ]
    return {
        i: (assign[i], int(d2(q[i], cents[assign[i]]))) for i in q
    }


def test_kmeans_fixed_matches_python_reference(spark):
    from nrsr_crawler_spark.operators.similarity import kmeans_fixed

    import random

    rng = random.Random(7)
    # two obvious blobs + noise, 6-dim
    vecs = {}
    for i in range(20):
        base = 1.0 if i % 2 == 0 else -1.0
        vecs[i] = [base + rng.uniform(-0.2, 0.2) for _ in range(6)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    # quantization happens from FLOAT storage: mirror the float32 rounding
    f32 = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in df.collect()}
    expected = _py_kmeans(f32, k=3, iterations=3)
    got = {
        r["vec_id"]: (r["cell"], r["dist2"])
        for r in kmeans_fixed(df, k=3, iterations=3).collect()
    }
    assert got == expected


def test_kmeans_fixed_empty_cell_keeps_centroid(spark):
    from nrsr_crawler_spark.operators.similarity import kmeans_fixed

    # vec 2 duplicates centroid 0's seed point, so the min-cid tiebreak
    # drains cell 2 in iteration 1 (every point goes to 0 or 1).  Centroid 0
    # then moves to the blob mean [33, 0] while EMPTY cell 2 must keep its
    # seed [0, 0] — which wins vecs 0 and 2 back in iteration 2 (dist 0 vs
    # 1089).  If the empty cell were dropped or zeroed differently, the
    # final assignment would change — this is the retention proof.
    rows = [
        (0, [0.0, 0.0]),
        (1, [10.0, 10.0]),
        (2, [0.0, 0.0]),
        (3, [0.1, 0.0]),
        (4, [10.1, 10.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: (r["cell"], r["dist2"])
        for r in kmeans_fixed(df, k=3, iterations=2).collect()
    }
    expected = _py_kmeans({i: v for i, v in rows}, k=3, iterations=2)
    assert out == expected
    # the retained empty-cell centroid reclaims its duplicate point…
    assert out[2][0] == 2 and out[2][1] == 0
    # …while the moved centroid 0 keeps only the off-center member
    assert out[3][0] == 0
    assert out[1][0] == 1 and out[4][0] == 1


def test_kmeans_training_reduces_distortion(spark):
    """Lloyd's guarantee: total within-cell distortion (Σ dist2) is monotone
    non-increasing in the iteration count — the property the trained-codebook
    path exists for.  (Recall at fixed nprobe is NOT guaranteed to improve on
    near-orthogonal random data, so that is deliberately not asserted.)"""
    from nrsr_crawler_spark.operators.similarity import kmeans_fixed
    from nrsr_crawler_spark.sources.tpch import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")

    def distortion(iters: int) -> int:
        return (
            kmeans_fixed(emb, k=8, iterations=iters)
            .agg(F.sum("dist2").alias("s"))
            .collect()[0]["s"]
        )

    d1, d2, d3 = distortion(1), distortion(2), distortion(3)
    assert d2 <= d1 and d3 <= d2, (d1, d2, d3)
    assert d2 < d1  # the seed codebook is strictly improvable on this data


def test_ivf_trained_codebook_stays_sound(spark):
    """ivf_topk(train_iterations=2): results remain candidate-sound (every
    neighbor comes from a probed cell) with usable recall vs brute force."""
    from nrsr_crawler_spark.operators.similarity import bruteforce_topk, ivf_topk
    from nrsr_crawler_spark.sources.tpch import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in bruteforce_topk(emb, queries, k=5).collect()
    }
    trained = ivf_topk(
        emb, queries, k=5, n_centroids=8, nprobe=4, train_iterations=2
    )
    got = {(r["query_id"], r["neighbor_id"]) for r in trained.collect()}
    assert len(got & truth) / len(truth) >= 0.4
    n = emb.count()
    probed_all = ivf_topk(
        emb, queries, k=n, n_centroids=8, nprobe=4, train_iterations=2
    )
    assert got <= {(r["query_id"], r["neighbor_id"]) for r in probed_all.collect()}


# -- exact phrase search --------------------------------------------------------


def test_phrase_topk_hand_built(spark):
    from nrsr_crawler_spark.operators.retrieval import phrase_topk

    df = spark.createDataFrame(
        [
            (1, "the quick fox jumps the quick fox sleeps"),  # "the quick fox" ×2
            (2, "quick the fox"),                              # words present, order wrong
            (3, "the quick fox"),                              # exactly once
            (4, "a b a b a"),                                  # overlapping "a b a" ×2
            (5, "nothing relevant here"),
        ],
        "doc_id long, text string",
    )
    out = phrase_topk(
        df, "doc_id", "text", {"pq": ["the", "quick", "fox"], "aba": ["a", "b", "a"]}, k=5
    )
    got = {(r["phrase_id"], r["doc_id"]): (r["n_occurrences"], r["rank"]) for r in out.collect()}
    assert got[("pq", 1)] == (2, 1)
    assert got[("pq", 3)] == (1, 2)
    assert ("pq", 2) not in got and ("pq", 5) not in got
    # repeated-term phrase with overlapping matches: positions 1 and 3
    assert got[("aba", 4)] == (2, 1)
    assert len([k for k in got if k[0] == "aba"]) == 1
