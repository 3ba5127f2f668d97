"""Dedup suite over synthetic docs with planted duplicates."""

from __future__ import annotations

from pyspark.sql import functions as F

from nrsr_crawler_spark.operators import dedup as D


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = "the quick brown fox jumps over the lazy dog near the river bank tonight"
    other = "completely different content about spark shuffles and bloom filters here"
    rows = [
        (1, base),
        (2, base),          # exact dup of 1
        (3, near),          # near dup of 1 (1 word differs)
        (4, other),
        (5, "a b c"),       # shorter than shingle width
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_groups(spark):
    g = D.exact_groups(_docs(spark), "doc_id", "text").collect()
    sizes = sorted(r["group_size"] for r in g)
    assert sizes == [1, 1, 1, 2]
    dup = [r for r in g if r["group_size"] == 2][0]
    assert dup["kept_id"] == 1


def test_word_shingles(spark):
    sh = D.word_shingles(_docs(spark), "doc_id", "text", 3)
    per_doc = {r["doc_id"]: r["n"] for r in sh.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert per_doc[5] == 1  # "a b c" → one 3-shingle
    assert per_doc[1] == 12  # 14 words → 12 trigram shingles, all distinct


def test_jaccard_pairs_finds_near_dup(spark):
    pairs = D.jaccard_pairs(_docs(spark), "doc_id", "text", 3, 1, 2).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got      # identical
    assert (1, 3) in got and (2, 3) in got  # near dup
    assert not any(4 in p or 5 in p for p in got)


def test_minhash_lsh_matches_exact_on_high_threshold(spark):
    docs = _docs(spark)
    lsh = {(r["id_a"], r["id_b"]) for r in D.minhash_lsh_dedup(docs, "doc_id", "text").collect()}
    # identical docs always collide in every band
    assert (1, 2) in lsh
    # LSH output ⊆ exact-verified pairs (no false positives post-verify)
    exact = {(r["id_a"], r["id_b"]) for r in D.jaccard_pairs(docs, "doc_id", "text", 3, 1, 2).collect()}
    assert lsh <= exact


def test_simhash_near_dups(spark):
    sim = D.simhash16(_docs(spark), "doc_id", "text")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in D.simhash_pairs(sim, "doc_id", 3).collect()}
    assert pairs.get((1, 2)) == 0  # identical text → identical simhash
    assert (1, 4) not in pairs


def test_embedding_near_dups(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.02, 0.0]),   # ~same direction
        (3, [0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["id_a"], r["id_b"]) for r in D.embedding_near_dups(emb, "vec_id", "embedding", 0.95).collect()}
    assert got == {(1, 2)}


def test_stop_shingle_guard(spark):
    # boilerplate shared by every doc must not create quadratic pairs
    rows = [(i, f"common boiler plate sentence here unique{i} tail{i} word{i}") for i in range(1, 11)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    unguarded = D.jaccard_pairs(docs, "doc_id", "text", 3, 1, 10)
    guarded = D.jaccard_pairs(docs, "doc_id", "text", 3, 1, 10, max_df=3)
    assert guarded.count() < unguarded.count()


def test_incremental_dedup_verdicts(spark):
    from nrsr_crawler_spark.operators.dedup import incremental_dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [
            (1, base),
            (2, "completely different corpus text with its own words here now"),
            (3, base + " lambda"),  # sibling of the near-dup below
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (100, base),  # exact dup of corpus 1
            (101, base + " mu"),  # near dup of 1/3 (high shingle overlap)
            (102, "totally novel words nowhere else seen in any snapshot at all"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["batch_id"]: (r["verdict"], r["matched_id"])
        for r in incremental_dedup(corpus, batch, "doc_id", "text").collect()
    }
    assert out[100] == ("exact_dup", 1)
    assert out[101][0] == "near_dup" and out[101][1] in (1, 3)
    assert out[102] == ("novel", None)
    # every batch doc gets exactly one verdict row
    assert len(out) == 3


def test_containment_catches_embedded_fragment_jaccard_misses(spark):
    from nrsr_crawler_spark.operators.dedup import containment_pairs, jaccard_pairs

    frag = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, f"{filler} {frag}"), (2, frag), (3, "totally unrelated words here now")],
        "doc_id long, text string",
    )
    # symmetric Jaccard at 50%: the fragment drowns in the article's union
    assert jaccard_pairs(docs, "doc_id", "text", 3, 1, 2).count() == 0
    got = containment_pairs(docs, "doc_id", "text", 3, threshold_num=9, threshold_den=10).collect()
    assert [(r.contained_id, r.container_id) for r in got] == [(2, 1)]
    (row,) = got
    # every one of the fragment's 3 trigrams appears in the article
    assert row.common == row.n_contained == 3 and row.n_container > 30


def test_containment_mutual_when_docs_identical(spark):
    from nrsr_crawler_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f")], "doc_id long, text string"
    )
    got = {(r.contained_id, r.container_id) for r in containment_pairs(docs, "doc_id", "text").collect()}
    assert got == {(1, 2), (2, 1)}
