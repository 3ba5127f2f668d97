"""robots.txt evaluation: longest-prefix-wins, allow-beats-disallow on ties,
permissive default matching the reference (settings.py:22)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nrsr_crawler_spark.operators.robots import allowed_expr, allowed_join
from nrsr_crawler_spark.sources.synthetic_site import robots_rules

RULES = [
    {"host": "www.nrsr.sk", "user_agent": "*", "rule": "disallow", "path_prefix": "/web/private", "crawl_delay": None},
    {"host": "www.nrsr.sk", "user_agent": "*", "rule": "allow", "path_prefix": "/web/private/open", "crawl_delay": None},
    {"host": "www.nrsr.sk", "user_agent": "*", "rule": "allow", "path_prefix": "/", "crawl_delay": None},
]

CASES = [
    ("https://www.nrsr.sk/web/Default.aspx?sid=x", True),
    ("https://www.nrsr.sk/web/private/p1", False),
    ("https://www.nrsr.sk/web/private/open/doc", True),   # longer allow overrides
    ("https://other.host/web/private/p1", True),          # no rules for host
]


def _df(spark):
    return spark.createDataFrame(
        [(u, e) for u, e in CASES], "canon_url string, expect boolean"
    ).select(
        "canon_url",
        "expect",
        F.lower(F.try_parse_url("canon_url", F.lit("HOST"))).alias("host"),
        F.xxhash64("canon_url").alias("url_hash"),
    )


def test_allowed_expr(spark):
    df = _df(spark).withColumn(
        "got", allowed_expr(RULES, F.col("canon_url"), F.col("host"))
    )
    assert df.filter(F.col("got") != F.col("expect")).count() == 0


def test_allowed_join_matches_expr(spark):
    rules_df = spark.createDataFrame(
        RULES, "host string, user_agent string, rule string, path_prefix string, crawl_delay double"
    )
    kept = {r["canon_url"] for r in allowed_join(_df(spark), rules_df).collect()}
    assert kept == {u for u, e in CASES if e}


def test_reference_default_is_permissive(spark):
    rules = robots_rules(permissive=True)
    df = _df(spark).withColumn("got", allowed_expr(rules, F.col("canon_url"), F.col("host")))
    # permissive set allows everything on the covered host; uncovered host default-allows
    assert df.filter(~F.col("got")).count() == 0
