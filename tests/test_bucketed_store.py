"""Bucketed seen-store layout: the co-located-join plan gate.

At 10^10 URLs the seen store must not re-shuffle every epoch; bucketed on
``url_hash`` with a matching candidate layout, the per-epoch anti-join is
planned with zero Exchange.  These tests assert exactly that property (and
that a non-bucketed baseline DOES exchange, so the gate is meaningful).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nrsr_crawler_spark.lake.bucketed import (
    bucketed_anti_join,
    bucketed_equi_join,
    ensure_db,
    probe_plan_is_colocated,
    write_bucketed,
)

N_BUCKETS = 4


@pytest.fixture(scope="module")
def bucket_db(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucket_lake")
    ensure_db(spark, "bucketdemo", str(loc))
    spark.catalog.setCurrentDatabase("bucketdemo")
    seen = spark.range(0, 1000).select(
        (F.col("id") * 7919).alias("url_hash"), F.lit(1).alias("epoch")
    )
    cand = spark.range(500, 1500).select(
        (F.col("id") * 7919).alias("url_hash"),
        F.col("id").cast("int").alias("prio"),
    )
    write_bucketed(seen, "seen_b", N_BUCKETS)
    write_bucketed(cand, "cand_b", N_BUCKETS)
    yield "bucketdemo"
    spark.catalog.setCurrentDatabase("default")
    spark.sql("DROP DATABASE IF EXISTS bucketdemo CASCADE")


def test_bucketed_anti_join_has_no_exchange(spark, bucket_db):
    out = bucketed_anti_join(spark, "cand_b", "seen_b")
    assert probe_plan_is_colocated(out), out._jdf.queryExecution().executedPlan().toString()
    # correctness: candidates 500..1499 minus seen 0..999 = 500 unseen
    got = sorted(r["url_hash"] for r in out.collect())
    assert got == [i * 7919 for i in range(1000, 1500)]


def test_bucketed_equi_join_has_no_exchange(spark, bucket_db):
    out = bucketed_equi_join(spark, "cand_b", "seen_b")
    assert probe_plan_is_colocated(out)
    assert out.count() == 500  # overlap 500..999


def test_unbucketed_baseline_does_exchange(spark, bucket_db):
    """The gate is meaningful: the same join over plain DataFrames shuffles."""
    seen = spark.range(0, 1000).select((F.col("id") * 7919).alias("url_hash"))
    cand = spark.range(500, 1500).select((F.col("id") * 7919).alias("url_hash"))
    out = cand.join(seen.hint("merge"), "url_hash", "left_anti")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
    assert not probe_plan_is_colocated(out)


def test_bucketed_store_survives_append(spark, bucket_db):
    """Epoch deltas append into the same bucket layout; the join stays
    exchange-free afterwards (multiple files per bucket are fine — buckets
    align, only the in-task sort grows)."""
    delta = spark.range(2000, 2100).select(
        (F.col("id") * 7919).alias("url_hash"), F.lit(2).alias("epoch")
    )
    write_bucketed(delta, "seen_b", N_BUCKETS, mode="append")
    out = bucketed_anti_join(spark, "cand_b", "seen_b")
    assert probe_plan_is_colocated(out)
    assert out.count() == 500
