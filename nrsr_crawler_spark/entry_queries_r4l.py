"""Round-4 wave L query battery — redirect resolution, politeness audit,
dedup savings, hash-gated against DuckDB oracles (registered into
entry_queries.QUERIES / ORACLES on import):

 - redirect_resolve     terminal-URL resolution by pointer doubling with
                        loud cycle flagging (operators/redirects.py)
 - politeness_audit     inter-arrival compliance vs per-host crawl delays
                        (operators/compliance.py)
 - dedup_savings_report per-source bytes reclaimed by exact dedup
                        (operators/savings.py)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nrsr_crawler_spark.entry_queries import query
from nrsr_crawler_spark.operators.compliance import politeness_audit
from nrsr_crawler_spark.operators.redirects import resolve_redirects
from nrsr_crawler_spark.operators.savings import dedup_savings
from nrsr_crawler_spark.sources.tpch import load

# ---------------------------------------------------------------------------
# Redirect chains of ≤7 hops synthesized from orders (chain = key div 8,
# hop position = key % 8; TPC-H key gaps just shorten some chains — both
# engines see the same edges), plus a 4→5→6→7→4 cycle on every 50th chain.
# Three doubling rounds resolve ≤8 hops; cycle members come back
# resolved=false.
# ---------------------------------------------------------------------------

_RU = "'https://www.nrsr.sk/r/'"


def _redirect_doubling_oracle(doublings: int = 3) -> str:
    parts = [
        f"""
    WITH e AS (
        SELECT {_RU} || (o_orderkey // 8) || '/' || (o_orderkey % 8) AS src,
               {_RU} || (o_orderkey // 8) || '/' || (o_orderkey % 8 + 1) AS dst
        FROM orders WHERE o_orderkey % 8 < 7
        UNION ALL
        SELECT {_RU} || (o_orderkey // 8) || '/7',
               {_RU} || (o_orderkey // 8) || '/4'
        FROM orders WHERE o_orderkey % 8 = 7 AND (o_orderkey // 8) % 50 = 0
    ),
    s0 AS (SELECT src, dst AS nxt, CAST(1 AS BIGINT) AS hops FROM e)"""
    ]
    for i in range(doublings):
        parts.append(
            f""",
    s{i + 1} AS (
        SELECT a.src, COALESCE(b.nxt, a.nxt) AS nxt,
               a.hops + COALESCE(b.hops, 0) AS hops
        FROM s{i} a LEFT JOIN s{i} b ON a.nxt = b.src)"""
        )
    parts.append(
        f""",
    d AS (SELECT DISTINCT src AS u FROM e)
    SELECT s{doublings}.src, s{doublings}.nxt AS final_url,
           CAST(s{doublings}.hops AS BIGINT) AS hops, d.u IS NULL AS resolved
    FROM s{doublings} LEFT JOIN d ON s{doublings}.nxt = d.u"""
    )
    return "".join(parts)


@query("redirect_resolve", _redirect_doubling_oracle(3))
def redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    base = F.concat(
        F.lit("https://www.nrsr.sk/r/"),
        F.expr("o_orderkey div 8").cast("string"),
        F.lit("/"),
    )
    chain = orders.filter(k % 8 < 7).select(
        F.concat(base, (k % 8).cast("string")).alias("src"),
        F.concat(base, (k % 8 + 1).cast("string")).alias("dst"),
    )
    cyc = orders.filter((k % 8 == 7) & (F.expr("o_orderkey div 8") % 50 == 0)).select(
        F.concat(base, F.lit("7")).alias("src"),
        F.concat(base, F.lit("4")).alias("dst"),
    )
    return resolve_redirects(chain.unionByName(cyc), doublings=3)


# ---------------------------------------------------------------------------
# Politeness-compliance audit: fetch log from events (13 hosts), per-host
# required delays 100–999 ms.  Inter-arrival gaps in the synthetic stream
# land on both sides of the thresholds, so violations and clean hosts
# both occur.
# ---------------------------------------------------------------------------


@query(
    "politeness_audit",
    """
    WITH f AS (
        SELECT 'h' || (user_id % 13) AS host, epoch_us(ts) AS ts_us, event_id
        FROM events
    ),
    g AS (
        SELECT host,
               ts_us - lag(ts_us) OVER (PARTITION BY host ORDER BY ts_us, event_id)
                   AS gap_us
        FROM f
    ),
    d AS (
        SELECT 'h' || n AS host, CAST(100 + (n * 37) % 900 AS BIGINT) AS delay_ms
        FROM (SELECT UNNEST(range(13)) AS n)
    ),
    per AS (
        SELECT host, COUNT(*) AS n_fetches, COUNT(gap_us) AS n_gaps,
               MIN(gap_us) AS mg
        FROM g GROUP BY host
    ),
    v AS (
        SELECT g.host, COUNT(*) AS n_violations
        FROM g JOIN d USING (host)
        WHERE gap_us IS NOT NULL AND gap_us < delay_ms * 1000
        GROUP BY g.host
    )
    SELECT p.host, CAST(p.n_fetches AS BIGINT) AS n_fetches,
           CAST(p.n_gaps AS BIGINT) AS n_gaps,
           CAST(COALESCE(v.n_violations, 0) AS BIGINT) AS n_violations,
           CAST(p.mg // 1000 AS BIGINT) AS min_gap_ms,
           COALESCE(v.n_violations, 0) = 0 AS ok
    FROM per p JOIN d USING (host) LEFT JOIN v ON v.host = p.host
    """,
)
def politeness_audit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    fetches = events.select(
        F.concat(F.lit("h"), (F.col("user_id") % 13).cast("string")).alias("host"),
        F.expr("unix_micros(cast(ts as timestamp))").alias("ts_us"),
        F.col("event_id").alias("fetch_id"),
    )
    delays = spark.range(13).select(
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
        (100 + (F.col("id") * 37) % 900).cast("long").alias("delay_ms"),
    )
    return politeness_audit(fetches, delays, "host", "ts_us", "fetch_id", "delay_ms")


# ---------------------------------------------------------------------------
# Dedup savings: synthetic content digests in groups of 3 (doc_id div 3),
# so every source shows real reclaimable bytes; sizes vary inside a group
# and the min-id keeper's bytes are the ones NOT saved.
# ---------------------------------------------------------------------------


@query(
    "dedup_savings_report",
    """
    WITH k AS (
        SELECT source, md5('doc-' || (doc_id // 3)) AS digest,
               doc_id AS id, n_chars AS sz
        FROM documents
    ),
    g AS (
        SELECT source, digest, COUNT(*) AS n, SUM(sz) AS grp_bytes,
               MIN(id) AS keep_id
        FROM k GROUP BY source, digest
    ),
    ks AS (
        SELECT g.source, g.n, g.grp_bytes, g.grp_bytes - k.sz AS saved
        FROM g JOIN k ON k.source = g.source AND k.digest = g.digest
                     AND k.id = g.keep_id
    ),
    agg AS (
        SELECT source, SUM(n) AS n_docs, COUNT(*) AS n_groups,
               SUM(n) - COUNT(*) AS n_dups_removed,
               SUM(grp_bytes) AS total_bytes, SUM(saved) AS bytes_saved
        FROM ks GROUP BY source
    )
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_groups AS BIGINT) AS n_groups,
           CAST(n_dups_removed AS BIGINT) AS n_dups_removed,
           CAST(total_bytes AS BIGINT) AS total_bytes,
           CAST(bytes_saved AS BIGINT) AS bytes_saved,
           CAST(CASE WHEN total_bytes = 0 THEN 0
                     ELSE bytes_saved * 10000 // total_bytes END AS BIGINT)
               AS savings_bps
    FROM agg
    """,
)
def dedup_savings_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        "n_chars",
        F.concat(F.lit("doc-"), F.expr("doc_id div 3").cast("string")).alias("content"),
    )
    return dedup_savings(docs, "doc_id", "content", "n_chars", "source")
