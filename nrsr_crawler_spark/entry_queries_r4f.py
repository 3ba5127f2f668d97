"""Round-4 wave F query battery — crawl-operations operators, each
hash-gated against a DuckDB oracle (registered into entry_queries.QUERIES /
ORACLES on import):

 - warc_cdx_index      WARC segment layout + CDX byte offsets with
                       Common-Crawl revisit dedup (operators/warc.py)
 - url_canonical_pick  canonical-URL cluster representative election
                       (operators/canonical.py)
 - crawl_snapshot_diff two-epoch URL diff → per-host change report
                       (operators/snapshot_diff.py)
 - host_error_spike    per-host error-rate spike detection over fetch
                       telemetry (operators/anomaly.py)

Oracle-portability follows the entry_queries_ml.py conventions: md5 as the
cross-engine hash, integer cross-multiplied thresholds, BIGINT floor
division (Spark ``div`` == DuckDB ``//`` on non-negative ints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nrsr_crawler_spark.entry_queries import query
from nrsr_crawler_spark.operators.anomaly import error_spike_report
from nrsr_crawler_spark.operators.canonical import elect_canonical
from nrsr_crawler_spark.operators.snapshot_diff import host_change_report, snapshot_diff
from nrsr_crawler_spark.operators.warc import warc_plan
from nrsr_crawler_spark.sources.tpch import load

# ---------------------------------------------------------------------------
# WARC/CDX archive plan: fetches synthesized from documents with ~40% of
# payload digests duplicated (doc_id % 300), so the revisit-dedup branch is
# exercised.  Payload length derives from the digest key, keeping identical
# digests the same size (a real refetch of identical bytes).
# ---------------------------------------------------------------------------


@query(
    "warc_cdx_index",
    """
    WITH f AS (
        SELECT 'https://www.nrsr.sk/doc?id=' || doc_id AS url,
               md5(CAST(doc_id % 300 AS VARCHAR)) AS digest,
               (doc_id % 300) * 7 + 100 AS payload_len
        FROM documents
    ),
    k AS (
        SELECT url, digest, payload_len, md5(url) AS ok,
               substr(md5(url), 1, 1) AS shard
        FROM f
    ),
    e AS (
        SELECT *, CASE WHEN url = MIN(url) OVER (PARTITION BY digest)
                       THEN 'response' ELSE 'revisit' END AS rec_type
        FROM k
    ),
    s AS (
        SELECT url, shard, rec_type, ok,
               CAST(CASE WHEN rec_type = 'response' THEN 200 + payload_len
                         ELSE 120 END AS BIGINT) AS rec_len
        FROM e
    )
    SELECT url, shard, rec_type, rec_len,
           CAST(COALESCE(SUM(rec_len) OVER (
                    PARTITION BY shard ORDER BY ok, url
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0) AS BIGINT) AS byte_offset
    FROM s
    """,
)
def warc_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    fetches = docs.select(
        F.concat(F.lit("https://www.nrsr.sk/doc?id="), F.col("doc_id").cast("string")).alias(
            "url"
        ),
        F.md5((F.col("doc_id") % 300).cast("string")).alias("digest"),
        ((F.col("doc_id") % 300) * 7 + 100).cast("long").alias("payload_len"),
    )
    return warc_plan(fetches, "url", "digest", "payload_len", shard_prefix_chars=1)


# ---------------------------------------------------------------------------
# Canonical-URL election: 4 variants per page (https/http × www/bare ×
# tracking param), canon key computed FROM THE URL STRING by regexp in both
# engines (scheme+www strip, utm strip), representative = (https first,
# shortest, lexmin) — so the https bare-host variant must win every cluster
# where it exists.
# ---------------------------------------------------------------------------

_VARIANT_URL_SQL = """
        SELECT (CASE WHEN o_orderkey % 4 IN (0, 1) THEN 'https' ELSE 'http' END)
               || '://'
               || (CASE WHEN o_orderkey % 2 = 0 THEN 'www.' ELSE '' END)
               || 'nrsr.sk/Default.aspx?sid=zakony&ZakZborID=13&ID='
               || (o_orderkey // 4)
               || (CASE WHEN o_orderkey % 4 = 3 THEN '&utm_source=newsletter' ELSE '' END)
               AS url
        FROM orders
"""


@query(
    "url_canonical_pick",
    f"""
    WITH u AS ({_VARIANT_URL_SQL}),
    c AS (
        SELECT url,
               regexp_replace(
                   regexp_replace(url, '^https?://(www\\.)?', ''),
                   '&utm_[a-z_]+=[^&]*', '', 'g') AS canon
        FROM u
    ),
    r AS (
        SELECT canon, url,
               CASE WHEN url LIKE 'https://%' THEN 0 ELSE 1 END AS rk,
               length(url) AS ln
        FROM c
    ),
    w AS (
        SELECT canon, url,
               ROW_NUMBER() OVER (PARTITION BY canon ORDER BY rk, ln, url) AS rn
        FROM r
    ),
    g AS (
        SELECT canon, CAST(COUNT(*) AS BIGINT) AS n_variants,
               CAST(SUM(CASE WHEN rk = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_https
        FROM r GROUP BY canon
    )
    SELECT g.canon, w.url AS rep_url, g.n_variants, g.n_https
    FROM g JOIN w ON w.canon = g.canon AND w.rn = 1
    """,
)
def url_canonical_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    url = F.concat(
        F.when((k % 4).isin(0, 1), F.lit("https")).otherwise(F.lit("http")),
        F.lit("://"),
        F.when(k % 2 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("nrsr.sk/Default.aspx?sid=zakony&ZakZborID=13&ID="),
        F.expr("o_orderkey div 4").cast("string"),
        F.when(k % 4 == 3, F.lit("&utm_source=newsletter")).otherwise(F.lit("")),
    )
    canon = F.regexp_replace(
        F.regexp_replace(F.col("url"), r"^https?://(www\.)?", ""),
        r"&utm_[a-z_]+=[^&]*",
        "",
    )
    urls = orders.select(url.alias("url")).withColumn("canon", canon)
    return elect_canonical(urls, "canon", "url")


# ---------------------------------------------------------------------------
# Snapshot diff: epoch A = orders not divisible by 7, epoch B = not
# divisible by 5; every key divisible by 3 changed payload between epochs.
# Gone/added/changed/same all non-empty by construction; host change rates
# in exact basis points.
# ---------------------------------------------------------------------------


@query(
    "crawl_snapshot_diff",
    """
    WITH base AS (
        SELECT o_orderkey AS k,
               'h' || (o_orderkey % 23) AS host,
               'https://h' || (o_orderkey % 23) || '.nrsr.sk/p/' || o_orderkey AS url
        FROM orders
    ),
    old AS (
        SELECT url, host, md5('v1:' || k) AS digest FROM base WHERE k % 7 <> 0
    ),
    new AS (
        SELECT url, host,
               CASE WHEN k % 3 = 0 THEN md5('v2:' || k) ELSE md5('v1:' || k) END AS digest
        FROM base WHERE k % 5 <> 0
    ),
    d AS (
        SELECT COALESCE(n.host, o.host) AS host,
               CASE WHEN o.digest IS NULL THEN 'added'
                    WHEN n.digest IS NULL THEN 'gone'
                    WHEN o.digest = n.digest THEN 'same'
                    ELSE 'changed' END AS change
        FROM old o FULL OUTER JOIN new n ON o.url = n.url
    ),
    agg AS (
        SELECT host,
               CAST(SUM(CASE WHEN change = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
               CAST(SUM(CASE WHEN change = 'gone' THEN 1 ELSE 0 END) AS BIGINT) AS n_gone,
               CAST(SUM(CASE WHEN change = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
               CAST(SUM(CASE WHEN change = 'same' THEN 1 ELSE 0 END) AS BIGINT) AS n_same
        FROM d GROUP BY host
    )
    SELECT host, n_added, n_gone, n_changed, n_same,
           CAST(CASE WHEN n_changed + n_same = 0 THEN 0
                     ELSE n_changed * 10000 // (n_changed + n_same) END AS BIGINT)
               AS change_bps
    FROM agg
    """,
)
def crawl_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    base = orders.select(
        k.alias("k"),
        F.concat(F.lit("h"), (k % 23).cast("string")).alias("host"),
        F.concat(
            F.lit("https://h"),
            (k % 23).cast("string"),
            F.lit(".nrsr.sk/p/"),
            k.cast("string"),
        ).alias("url"),
    )
    old = base.filter(F.col("k") % 7 != 0).select(
        "url", "host", F.md5(F.concat(F.lit("v1:"), F.col("k").cast("string"))).alias("digest")
    )
    new = base.filter(F.col("k") % 5 != 0).select(
        "url",
        "host",
        F.when(
            F.col("k") % 3 == 0,
            F.md5(F.concat(F.lit("v2:"), F.col("k").cast("string"))),
        )
        .otherwise(F.md5(F.concat(F.lit("v1:"), F.col("k").cast("string"))))
        .alias("digest"),
    )
    return host_change_report(snapshot_diff(old, new, "url", "digest", "host"))


# ---------------------------------------------------------------------------
# Host error-spike report over fetch telemetry synthesized from events:
# a background 1/17 error rate everywhere plus host h5 failing ~half its
# fetches on days ≡ 3 (mod 7) — the report must flag exactly the cells
# where the day's rate clears 3× the host baseline with ≥5 errors of
# support.  Day buckets / 11 hosts give ~25 fetches per cell at sf0.01, so
# the spike days actually clear the support floor (hour-grained cells at
# this sf hold ~1 event — vacuous).
# ---------------------------------------------------------------------------


@query(
    "host_error_spike",
    """
    WITH f AS (
        SELECT 'h' || (user_id % 11) AS host,
               epoch_us(ts) // 86400000000 AS day_id,
               CASE WHEN event_id % 17 = 0
                         OR (user_id % 11 = 5 AND event_id % 2 = 0
                             AND (epoch_us(ts) // 86400000000) % 7 = 3)
                    THEN 1 ELSE 0 END AS e
        FROM events
    ),
    cells AS (
        SELECT host, day_id, COUNT(*) AS n_fetches, SUM(e) AS n_errors
        FROM f GROUP BY host, day_id
    ),
    h AS (
        SELECT host, SUM(n_fetches) AS tot_f, SUM(n_errors) AS tot_e
        FROM cells GROUP BY host
    )
    SELECT c.host, c.day_id AS bucket,
           CAST(c.n_fetches AS BIGINT) AS n_fetches,
           CAST(c.n_errors AS BIGINT) AS n_errors,
           CAST(c.n_errors * 10000 // c.n_fetches AS BIGINT) AS bucket_bps,
           CAST(h.tot_e * 10000 // h.tot_f AS BIGINT) AS base_bps
    FROM cells c JOIN h USING (host)
    WHERE c.n_errors * h.tot_f >= 3 * c.n_fetches * h.tot_e
      AND c.n_errors >= 5 AND h.tot_e >= 1
    """,
)
def host_error_spike(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    day = F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
    fetches = events.select(
        F.concat(F.lit("h"), (F.col("user_id") % 11).cast("string")).alias("host"),
        day.alias("day_id"),
        (
            (F.col("event_id") % 17 == 0)
            | (
                (F.col("user_id") % 11 == 5)
                & (F.col("event_id") % 2 == 0)
                & (day % 7 == 3)
            )
        ).alias("err"),
    )
    return error_spike_report(
        fetches, "host", "day_id", F.col("err"), factor=3, min_errors=5
    )
