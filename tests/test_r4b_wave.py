"""Round-4 wave B: OPIC, graph stats, quota/systematic sampling, perplexity
bits, TF-IDF keywords, shard planning — unit semantics + plan-quality gates
(the oracle hash gate runs separately via scripts/oracle_check.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from nrsr_crawler_spark.operators.lm_score import bigram_bits_score, floor_log2, tfidf_keywords
from nrsr_crawler_spark.operators.opic import SCALE, degree_stats, opic_fixed
from nrsr_crawler_spark.operators.prefix import total_ordered_cumsum
from nrsr_crawler_spark.operators.quota import domain_quota_topk, systematic_weighted_sample
from nrsr_crawler_spark.operators.shard_plan import byte_shard_plan

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


# -- OPIC ---------------------------------------------------------------------


def test_opic_tiny_graph_hand_computed(spark):
    # 1 -> 2, 2 -> 1, 2 -> 3;  3 dangling.  N = 3, cash0 = S div 3.
    e = spark.createDataFrame([(1, 2), (2, 1), (2, 3)], "src long, dst long")
    out = {r["node"]: (r["cash"], r["hist"]) for r in opic_fixed(e, iterations=1).collect()}
    c0 = SCALE // 3
    d = c0  # node 3's cash is dangling
    expect = {
        1: (c0 // 2 + d // 3, c0),  # from 2 (out=2) + dangling share
        2: (c0 // 1 + d // 3, c0),  # from 1 (out=1)
        3: (c0 // 2 + d // 3, c0),  # from 2
    }
    assert out == expect


def test_opic_history_accumulates_and_mass_bounded(spark):
    e = spark.createDataFrame([(1, 2), (2, 1), (2, 3)], "src long, dst long")
    k2 = opic_fixed(e, iterations=2).agg(
        F.sum("cash").alias("c"), F.sum("hist").alias("h")
    ).collect()[0]
    # cash mass only shrinks by truncation (≤1 per node per term per round)
    assert k2["c"] <= SCALE and k2["c"] >= SCALE - 2 * 3 * 3
    # hist after K rounds = sum of cash_0..cash_{K-1} over nodes ≈ K·S
    assert k2["h"] <= 2 * SCALE and k2["h"] >= 2 * (SCALE - 2 * 3 * 3)


def test_opic_broadcast_and_shuffle_regimes_agree(spark):
    e = spark.createDataFrame(
        [(i, (i * 7) % 23) for i in range(40)] + [(5, 5), (11, 3)],
        "src long, dst long",
    )
    a = {(r["node"], r["cash"], r["hist"]) for r in opic_fixed(e, 2, broadcast_cash=True).collect()}
    b = {(r["node"], r["cash"], r["hist"]) for r in opic_fixed(e, 2, broadcast_cash=False).collect()}
    assert a == b


def test_opic_empty_edges_returns_empty(spark):
    # n == 0 must yield an empty (node, cash, hist) frame, not
    # ZeroDivisionError at SCALE // n — same contract as the other kernels.
    empty = spark.createDataFrame([], "src long, dst long")
    out = opic_fixed(empty)
    assert out.columns == ["node", "cash", "hist"]
    assert out.count() == 0


# -- degree stats -------------------------------------------------------------


def test_degree_stats_tiny_graph(spark):
    # edges: 1->2, 2->1 (reciprocal), 2->3, 3->3 (self loop), 4->5
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 3), (4, 5), (1, 2)],  # dup collapses
        "src long, dst long",
    )
    r = degree_stats(e).collect()[0].asDict()
    assert r == {
        "n_nodes": 5,
        "n_edges": 5,
        "n_self_loops": 1,
        "n_dangling": 1,  # node 5 has no outlinks
        "n_sources": 1,  # node 4 has no inlinks
        "max_out_deg": 2,  # node 2
        "max_in_deg": 2,  # node 3 (from 2 and itself)
        "n_reciprocal_pairs": 1,  # {1,2}
    }


# -- prefix sum ---------------------------------------------------------------


def test_bucketed_cumsum_equals_global_window(spark):
    df = spark.range(0, 500).select(
        F.col("id").alias("k"), ((F.col("id") * 37) % 101 + 1).alias("w")
    )
    two = total_ordered_cumsum(df, "k", "w")
    glob = df.withColumn("_ok", F.md5(F.col("k").cast("string"))).withColumn(
        "cum_hi",
        F.sum("w").over(Window.orderBy("_ok", "k").rowsBetween(Window.unboundedPreceding, 0)),
    )
    a = {(r["k"], r["cum_hi"]) for r in two.collect()}
    b = {(r["k"], r["cum_hi"]) for r in glob.collect()}
    assert a == b


def test_bucketed_cumsum_no_global_window_funnel(spark):
    df = spark.range(0, 100).select(F.col("id").alias("k"), F.lit(3).alias("w"))
    plan = _plan(total_ordered_cumsum(df, "k", "w"))
    # the O(rows) window must be partitioned; the only global-order window
    # allowed is the B-row bucket-offset one (operates on 16 rows)
    assert "partitionBy=[_bkt]" in plan.replace(" ", "") or "_bkt" in plan


# -- systematic sampling ------------------------------------------------------


def test_systematic_sample_draws_exactly_n(spark):
    df = spark.range(1, 200).select(
        F.col("id").alias("k"), ((F.col("id") * 13) % 50 + 1).alias("w")
    )
    out = systematic_weighted_sample(df, "k", "w", n_samples=32)
    got = out.agg(F.sum("multiplicity")).collect()[0][0]
    assert got == 32
    # a row can never be drawn more than ceil(n*w/W) + 1 times
    rows = out.collect()
    total = df.agg(F.sum("w")).collect()[0][0]
    for r in rows:
        assert r["multiplicity"] <= (32 * r["w"]) // total + 1


def test_systematic_sample_heavy_row_always_in(spark):
    # one row holds >1/2 the mass; with n=8 it must be drawn ≥3 times
    rows = [(1, 1000)] + [(i, 10) for i in range(2, 30)]
    df = spark.createDataFrame(rows, "k long, w long")
    out = {r["k"]: r["multiplicity"] for r in systematic_weighted_sample(df, "k", "w", 8).collect()}
    assert out[1] >= 3


# -- domain quota -------------------------------------------------------------


def test_domain_quota_caps_every_domain(spark):
    df = spark.range(0, 300).select(
        F.col("id").alias("doc"),
        (F.col("id") % 7).cast("string").alias("dom"),
        (F.col("id") * 31 % 97).alias("q"),
    )
    out = domain_quota_topk(df, "dom", [F.col("q").desc(), F.col("doc")], k=4)
    per = out.groupBy("dom").agg(F.count(F.lit(1)).alias("c"), F.max("rk").alias("m")).collect()
    assert all(r["c"] == 4 and r["m"] == 4 for r in per)
    # kept rows are the top-q rows of each domain
    top = df.withColumn("rk", F.row_number().over(Window.partitionBy("dom").orderBy(F.col("q").desc(), "doc")))
    expect = {(r["doc"]) for r in top.filter(F.col("rk") <= 4).collect()}
    assert {r["doc"] for r in out.collect()} == expect


def test_domain_quota_plan_uses_window_group_limit(spark):
    from nrsr_crawler_spark.entry_queries import QUERIES

    plan = _plan(QUERIES["docs_domain_quota"](spark, SF))
    assert "WindowGroupLimit" in plan, plan[:2000]
    assert "BatchEvalPython" not in plan


# -- lm scoring ---------------------------------------------------------------


def test_floor_log2_matches_math(spark):
    vals = [1, 2, 3, 4, 255, 256, 257, 1 << 40, (1 << 40) + 1]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {r["x"]: r["l"] for r in df.select("x", floor_log2(F.col("x")).alias("l")).collect()}
    for v in vals:
        assert got[v] == int(math.floor(math.log2(v))), v


def test_perplexity_bits_separates_indomain_from_gibberish(spark):
    fluent = "the quick brown fox jumps over the lazy dog " * 5
    rows = [(i, fluent, "train") for i in range(8)]
    rows.append((100, fluent, "eval"))
    rows.append((101, "zx qv jj kk wq pp zz xx cc vv bb nn mm " * 5, "eval"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r["bits_avg"] for r in
           bigram_bits_score(df, "doc_id", "text", F.col("source") == "train").collect()}
    assert out[100] < out[101]
    assert all(v >= 0 for v in out.values())


def test_perplexity_zero_bigram_doc_scores_zero(spark):
    df = spark.createDataFrame(
        [(1, "hello world hello world", "t"), (2, "single", "e"), (3, "", "e")],
        "doc_id long, text string, source string",
    )
    out = {r["doc_id"]: (r["n_bigrams"], r["bits_avg"]) for r in
           bigram_bits_score(df, "doc_id", "text", F.col("source") == "t").collect()}
    assert out[2] == (0, 0) and out[3] == (0, 0)
    assert out[1][0] == 3


def test_tfidf_keywords_rare_term_wins(spark):
    rows = [(i, "common common common filler") for i in range(10)]
    rows.append((99, "common rareword filler"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_keywords(df, "doc_id", "text", k=2)
    top99 = [r["term"] for r in out.filter(F.col("doc_id") == 99).orderBy("rk").collect()]
    assert top99[0] == "rareword"
    plan = _plan(out)
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan


# -- shard plan ---------------------------------------------------------------


def test_shard_plan_sizes_bounded(spark):
    df = spark.range(0, 400).select(
        F.col("id").alias("k"), ((F.col("id") * 97) % 5000 + 100).alias("sz")
    )
    out = byte_shard_plan(df, "k", "sz", shard_bytes=50_000)
    per = out.groupBy("shard_id").agg(F.sum("sz").alias("b")).collect()
    max_rec = 5099
    assert all(r["b"] <= 50_000 + max_rec for r in per)
    # start-offset binning: every record's offset is within the shard
    assert out.filter(F.col("shard_offset") >= 50_000).count() == 0
    # shards are contiguous 0..max
    ids = sorted(r["shard_id"] for r in per)
    assert ids == list(range(len(ids)))


def test_shard_plan_deterministic(spark):
    df = spark.range(0, 100).select(F.col("id").alias("k"), F.lit(1000).alias("sz"))
    a = {(r["k"], r["shard_id"], r["shard_offset"]) for r in byte_shard_plan(df, "k", "sz", 9000).collect()}
    b = {(r["k"], r["shard_id"], r["shard_offset"]) for r in byte_shard_plan(df, "k", "sz", 9000).collect()}
    assert a == b


# -- registry plan gates ------------------------------------------------------


@pytest.mark.parametrize(
    "name",
    ["link_graph_stats", "docs_systematic_sample", "text_perplexity_bits",
     "text_tfidf_keywords", "images_shard_plan"],
)
def test_r4b_queries_stay_jvm_side(spark, name):
    from nrsr_crawler_spark.entry_queries import QUERIES

    plan = _plan(QUERIES[name](spark, SF))
    assert "BatchEvalPython" not in plan, name
    assert "CartesianProduct" not in plan, name
