"""Round-4 wave D: filter funnel + cluster-size histogram reports."""

from __future__ import annotations

from pyspark.sql import functions as F

from nrsr_crawler_spark.operators.reports import cluster_size_histogram, quality_funnel


def test_funnel_stage_semantics(spark):
    # 80 tokens over 10 distinct words: top1 share 10% < the 20% gate
    long_en = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    repeated = "spam " * 80  # top1 = 100%
    short_en = "just a few tokens here"
    rows = [
        (1, long_en, "en"),
        (2, long_en, "en"),
        (3, long_en, "de"),  # dropped at lang
        (4, short_en, "en"),  # dropped at length
        (5, repeated, "en"),  # dropped at repetition
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["stage"]: r for r in quality_funnel(df, "doc_id", "text", "lang").collect()}
    assert out["all"]["n_kept"] == 5 and out["all"]["n_dropped_here"] is None
    assert out["lang"]["n_kept"] == 4 and out["lang"]["n_dropped_here"] == 1
    assert out["length"]["n_kept"] == 3 and out["length"]["n_dropped_here"] == 1
    assert out["wordlen"]["n_kept"] == 3
    assert out["repetition"]["n_kept"] == 2 and out["repetition"]["n_dropped_here"] == 1
    # stages are ordered and monotone non-increasing
    keeps = [r["n_kept"] for r in sorted(
        quality_funnel(df, "doc_id", "text", "lang").collect(),
        key=lambda r: r["stage_idx"],
    )]
    assert keeps == sorted(keeps, reverse=True)


def test_funnel_is_one_plan_no_python(spark):
    df = spark.createDataFrame(
        [(1, "a b c", "en")], "doc_id long, text string, lang string"
    )
    out = quality_funnel(df, "doc_id", "text", "lang")
    plan = out._jdf.queryExecution().explainString(
        out._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_cluster_histogram_counts(spark):
    groups = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
        "doc_id long, rep long",
    )
    out = {r["cluster_size"]: (r["n_clusters"], r["n_docs"]) for r in
           cluster_size_histogram(groups).collect()}
    assert out == {3: (1, 3), 1: (1, 1), 2: (1, 2)}
    # invariant: Σ n_docs == member count
    assert sum(v[1] for v in out.values()) == 6
