"""Flagship query: one frontier epoch's schedule+dedup pass (SURVEY §3.1).

This is the engine's headline workload per BASELINE.json's target metric
("URLs scheduled + deduped / sec"): candidate URLs → canonicalize →
fingerprint → in-batch exact dedup → anti-join vs the seen set → per-host
politeness-budget pop.  Exercised here over the driver's TPC-H-ish tables so
the DuckDB oracle can verify it; bench.py runs the same plan for throughput.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nrsr_crawler_spark.operators import frontier, politeness
from nrsr_crawler_spark.sources.tpch import load


def frontier_schedule_dedup(spark: SparkSession, sf_dir: str, budget: int = 100) -> DataFrame:
    """Schedule+dedup one synthetic epoch.

    Candidates: one URL per lineitem row keyed by part (duplicate-heavy —
    many lineitems share a part, like detail pages cross-linked from many
    list pages).  Seen set: parts with ``p_partkey % 3 = 0`` (previously
    fetched).  Pop: LIFO top-``budget`` per host.
    """
    li = load(spark, sf_dir, "lineitem")
    raw = li.select(
        F.concat(
            F.lit("HTTPS://WWW.NRSR.SK/web/Default.aspx?sid=zakony&MasterID="),
            F.col("l_partkey"),
            F.lit("#x"),
        ).alias("url"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("seq"),
        F.lit(0).alias("priority"),
    )
    candidates = frontier.prepare_candidates(raw)
    seen = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 3 == 0).select(
        F.xxhash64(
            F.concat(
                F.lit("https://www.nrsr.sk/web/Default.aspx?MasterID="),
                F.col("p_partkey"),
                F.lit("&sid=zakony"),
            )
        ).alias("url_hash")
    )
    fresh = frontier.dedup_against_seen(candidates, seen)
    # seq may tie across URLs (synthetic data reuses (orderkey, linenumber)),
    # so total-order the pop with the canonical URL as tiebreak
    popped = politeness.pop_budget(fresh, budget=budget, tiebreak=[F.col("canon_url")])
    return popped.select("canon_url", "seq", "rk")


FLAGSHIP_ORACLE = """
WITH cand AS (
    SELECT 'https://www.nrsr.sk/web/Default.aspx?MasterID=' || l_partkey || '&sid=zakony' AS canon_url,
           l_orderkey * 8 + l_linenumber AS seq,
           l_partkey AS partkey
    FROM lineitem
), dedup AS (
    SELECT canon_url, MIN(seq) AS seq, MIN(partkey) AS partkey
    FROM cand GROUP BY canon_url
), fresh AS (
    SELECT d.* FROM dedup d
    WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = d.partkey AND p.p_partkey % 3 = 0)
)
SELECT canon_url, seq, rk FROM (
    SELECT canon_url, seq, row_number() OVER (ORDER BY seq DESC, canon_url) AS rk FROM fresh
) WHERE rk <= 100
"""
