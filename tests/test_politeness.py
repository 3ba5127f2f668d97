"""Two-level salted budget pop must be byte-identical to the naive
single-window top-k (operators/politeness.py)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from nrsr_crawler_spark.operators.politeness import pop_budget, pop_order


def _frontier(spark, n=5000, hosts=3):
    # heavy skew: 90% of rows on host 0 (the single-domain reference shape)
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit("www.nrsr.sk"))
        .otherwise(F.concat(F.lit("h"), (F.col("id") % hosts).cast("string")))
        .alias("host"),
        (F.col("id") % 4).alias("priority"),
        F.col("id").alias("seq"),
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
    )


def test_pop_budget_matches_naive(spark):
    fr = _frontier(spark)
    budget = 17
    got = pop_budget(fr, budget=budget).select("host", "seq", "rk")
    w = Window.partitionBy("host").orderBy(*pop_order())
    naive = (
        fr.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= budget)
        .select("host", "seq", "rk")
    )
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0


def test_budget_never_exceeded(spark):
    fr = _frontier(spark)
    counts = pop_budget(fr, budget=5).groupBy("host").count().collect()
    assert all(r["count"] <= 5 for r in counts)
