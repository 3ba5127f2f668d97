"""Round-4 wave H query battery — image resize planning + crawl-cost ETA,
hash-gated against DuckDB oracles (registered into entry_queries.QUERIES /
ORACLES on import):

 - images_resolution_ladder  training-resolution tier + downscale factor
                             per image (operators/resize_plan.py)
 - crawl_drain_plan          per-host frontier drain ETA under politeness
                             delays (operators/budget_plan.py)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nrsr_crawler_spark.entry_queries import query
from nrsr_crawler_spark.operators.budget_plan import host_drain_plan
from nrsr_crawler_spark.operators.resize_plan import resolution_ladder_plan
from nrsr_crawler_spark.sources.tpch import load

# ---------------------------------------------------------------------------
# Resolution ladder over synthesized image dims: sides 64..1663, so all
# four outcomes occur (reject, 256, 512, 1024).  Pure column math — the
# plan gate asserts zero Exchange.
# ---------------------------------------------------------------------------


@query(
    "images_resolution_ladder",
    """
    WITH img AS (
        SELECT printf('img%010d', p_partkey) AS image_id,
               CAST(64 + (p_partkey % 1600) AS INTEGER) AS w,
               CAST(64 + ((p_partkey * 7) % 1600) AS INTEGER) AS h
        FROM part
    ),
    t AS (
        SELECT image_id, w, h,
               CAST(CASE WHEN least(w, h) >= 1024 THEN 1024
                         WHEN least(w, h) >= 512 THEN 512
                         WHEN least(w, h) >= 256 THEN 256
                         ELSE 0 END AS BIGINT) AS tier,
               least(w, h) AS short
        FROM img
    )
    SELECT image_id, w, h, tier,
           CAST(CASE WHEN tier = 0 THEN 0
                     ELSE tier * 10000 // short END AS BIGINT) AS scale_bps
    FROM t
    """,
)
def images_resolution_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    k = F.col("p_partkey")
    images = part.select(
        F.format_string("img%010d", k).alias("image_id"),
        (64 + (k % 1600)).cast("int").alias("w"),
        (64 + ((k * 7) % 1600)).cast("int").alias("h"),
    )
    return resolution_ladder_plan(images, "image_id", "w", "h", ladder=(256, 512, 1024))


# ---------------------------------------------------------------------------
# Per-host drain ETA: frontier URLs from orders (23 hosts), politeness
# delays from an O(hosts) dimension synthesized off nation-sized keys —
# broadcast-joined.  Window = 1 day; hosts with heavy frontiers and slow
# crawl-delays overflow it.
# ---------------------------------------------------------------------------


@query(
    "crawl_drain_plan",
    """
    WITH f AS (
        SELECT 'h' || (o_orderkey % 23) AS host FROM orders
    ),
    d AS (
        SELECT 'h' || n AS host,
               CAST(500 + (n * 733) % 4500 AS BIGINT) AS delay_ms
        FROM (SELECT UNNEST(range(23)) AS n)
    ),
    c AS (SELECT host, COUNT(*) AS n_urls FROM f GROUP BY host)
    SELECT c.host, CAST(c.n_urls AS BIGINT) AS n_urls, d.delay_ms,
           CAST(c.n_urls * d.delay_ms // 1000 AS BIGINT) AS eta_s,
           c.n_urls * d.delay_ms // 1000 > 86400 AS over_budget
    FROM c JOIN d USING (host)
    """,
)
def crawl_drain_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    frontier = orders.select(
        F.concat(F.lit("h"), (F.col("o_orderkey") % 23).cast("string")).alias("host")
    )
    delays = spark.range(23).select(
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
        (500 + (F.col("id") * 733) % 4500).cast("long").alias("delay_ms"),
    )
    return host_drain_plan(frontier, delays, "host", "delay_ms", window_s=86400)
