"""Extension query battery — remaining SURVEY §2 checklist rows not already
covered by entry_queries.py / entry_queries_ml.py, each with a DuckDB oracle:

 - A4  nested list building (collect_list(struct) + array_sort)
 - A3  cross-epoch first-writer-wins entity dedup
 - F7  two-format date parse with fallback + noon normalization
 - S6  archive side of the upsert sink (old versions of changed rows)
 - robots.txt longest-prefix allow/deny evaluation (north_star)
 - U3  intersect (membership guard)
 - J5  parent→child lineage meta carry-through
 - O2  key-ordered store read (rank exposed so order is hash-verifiable)

Registered into entry_queries.QUERIES/ORACLES on import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nrsr_crawler_spark.entry_queries import query
from nrsr_crawler_spark.functions import cleaners as C
from nrsr_crawler_spark.operators import merge_sink, robots
from nrsr_crawler_spark.sources.tpch import load


# ---------------------------------------------------------------------------
# A4: nested list building — votes accumulated into a parent row
# (votings.py:201-216) as sort_array(collect_list(struct(...))), then flat
# summary columns so the value-hash compare stays engine-portable.
# O1's deterministic output sort (votings.py:243) is the array_sort.
# ---------------------------------------------------------------------------
@query(
    "a4_nested_votes",
    """
    WITH m AS (
        SELECT l_orderkey, COUNT(*) AS n_votes,
               MIN(l_linenumber) AS first_line, MAX(l_linenumber) AS last_line
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT m.l_orderkey, m.n_votes, MIN(l.l_returnflag) AS first_flag,
           m.first_line, m.last_line
    FROM lineitem l JOIN m ON l.l_orderkey = m.l_orderkey AND l.l_linenumber = m.first_line
    GROUP BY m.l_orderkey, m.n_votes, m.first_line, m.last_line
    """,
)
def a4_nested_votes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("l_linenumber").alias("line"), F.col("l_returnflag").alias("flag")))
        ).alias("votes")
    )
    return nested.select(
        "l_orderkey",
        F.size("votes").cast("long").alias("n_votes"),
        F.element_at("votes", 1)["flag"].alias("first_flag"),
        F.element_at("votes", 1)["line"].alias("first_line"),
        F.element_at("votes", -1)["line"].alias("last_line"),
    )


# ---------------------------------------------------------------------------
# A3: cross-epoch entity dedup — first writer wins (amendments.py:179-181,
# `if external_id not in self.crawled_amendments`).  Set-wise: argmin over
# the discovery order, ties broken by key (min(struct)) — exactly how the
# engine picks the surviving frontier row in operators/frontier.py.
# ---------------------------------------------------------------------------
@query(
    "a3_first_writer_wins",
    """
    WITH m AS (SELECT o_custkey, MIN(o_orderdate) AS first_date FROM orders GROUP BY o_custkey)
    SELECT o.o_custkey, m.first_date, MIN(o.o_orderkey) AS first_orderkey
    FROM orders o JOIN m ON o.o_custkey = m.o_custkey AND o.o_orderdate = m.first_date
    GROUP BY o.o_custkey, m.first_date
    """,
)
def a3_first_writer_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.min(F.struct(F.col("o_orderdate"), F.col("o_orderkey"))).alias("w"))
        .select(
            "o_custkey",
            F.col("w.o_orderdate").alias("first_date"),
            F.col("w.o_orderkey").alias("first_orderkey"),
        )
    )


# ---------------------------------------------------------------------------
# F7: date parse with format fallback ('%d. %m. %Y' then '%d.%m.%Y',
# bills.py:114-121) + noon normalization — the messy string is synthesized in
# BOTH formats (by row parity) and must round-trip through the fallback chain.
# ---------------------------------------------------------------------------
@query(
    "f7_date_fallback",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 2 = 0 THEN strftime(o_orderdate, '%-d. %-m. %Y')
                ELSE strftime(o_orderdate, '%-d.%-m.%Y') END AS raw,
           CAST(date_trunc('day', o_orderdate) + INTERVAL 12 HOUR AS TIMESTAMP) AS parsed_noon
    FROM orders
    """,
)
def f7_date_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    raw = F.when(
        F.col("o_orderkey") % 2 == 0, F.date_format("o_orderdate", "d. M. yyyy")
    ).otherwise(F.date_format("o_orderdate", "d.M.yyyy"))
    return orders.select(
        "o_orderkey",
        raw.alias("raw"),
        C.parse_date_noon(raw).alias("parsed_noon"),
    )


# ---------------------------------------------------------------------------
# S6: archive side of the upsert sink (pipelines.py:139-140) — the OLD
# version of every changed row lands in the archive table.
# ---------------------------------------------------------------------------
@query(
    "s6_archive_rows",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_custkey % 3 = 0 AND c_custkey % 5 <> 0
    """,
)
def s6_archive_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    batch = customer.filter(F.col("c_custkey") % 5 != 0).withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 3 == 0, F.col("c_acctbal") + 1).otherwise(F.col("c_acctbal")),
    )
    res = merge_sink.merge_upsert(customer, batch, ["c_custkey"])
    return res.archived.select("c_custkey", "c_name", "c_acctbal")


# ---------------------------------------------------------------------------
# robots.txt evaluation (north_star; reference disables it at settings.py:22,
# the engine evaluates longest-prefix allow/deny properly).  Zero-shuffle:
# the ruleset compiles to one boolean column expression.
# ---------------------------------------------------------------------------
_ROBOTS_RULES = [
    {"host": "www.nrsr.sk", "user_agent": "*", "rule": "disallow", "path_prefix": "/web/private"},
    {"host": "www.nrsr.sk", "user_agent": "*", "rule": "allow", "path_prefix": "/web/private/pub"},
    {"host": "www.nrsr.sk", "user_agent": "*", "rule": "disallow", "path_prefix": "/admin"},
    {"host": "h1.nrsr.sk", "user_agent": "*", "rule": "disallow", "path_prefix": "/"},
]


@query(
    "robots_allow",
    """
    WITH cand AS (
        SELECT o_orderkey,
               CASE o_orderkey % 3 WHEN 0 THEN 'www.nrsr.sk' WHEN 1 THEN 'h1.nrsr.sk' ELSE 'h2.nrsr.sk' END AS host,
               CASE o_orderkey % 4 WHEN 0 THEN '/web/private/doc'
                                   WHEN 1 THEN '/web/private/pub/doc'
                                   WHEN 2 THEN '/admin/x'
                                   ELSE '/web/doc' END AS path
        FROM orders
    )
    SELECT o_orderkey, host, path,
           CASE WHEN host = 'h1.nrsr.sk' THEN FALSE
                WHEN host <> 'www.nrsr.sk' THEN TRUE
                WHEN path LIKE '/web/private/pub%' THEN TRUE
                WHEN path LIKE '/web/private%' THEN FALSE
                WHEN path LIKE '/admin%' THEN FALSE
                ELSE TRUE END AS allowed
    FROM cand
    """,
)
def robots_allow(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    host = (
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("www.nrsr.sk"))
        .when(F.col("o_orderkey") % 3 == 1, F.lit("h1.nrsr.sk"))
        .otherwise(F.lit("h2.nrsr.sk"))
    )
    path = (
        F.when(F.col("o_orderkey") % 4 == 0, F.lit("/web/private/doc"))
        .when(F.col("o_orderkey") % 4 == 1, F.lit("/web/private/pub/doc"))
        .when(F.col("o_orderkey") % 4 == 2, F.lit("/admin/x"))
        .otherwise(F.lit("/web/doc"))
    )
    cand = orders.select(
        "o_orderkey",
        host.alias("host"),
        path.alias("path"),
        F.concat(F.lit("https://"), host, path).alias("url"),
    )
    return cand.select(
        "o_orderkey",
        "host",
        "path",
        robots.allowed_expr(_ROBOTS_RULES, F.col("url"), F.col("host")).alias("allowed"),
    )


# ---------------------------------------------------------------------------
# U3: intersect-guard — membership test as a set op (SURVEY §2.7;
# `in self.crawled_*` checks).
# ---------------------------------------------------------------------------
@query(
    "u3_intersect",
    """
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def u3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    rich = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000).select("c_custkey")
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return rich.intersect(urgent)


# ---------------------------------------------------------------------------
# J5: parent→child lineage meta carry (votings.py:150-158) — every child URL
# row inherits the parent's context columns; expressed as the parse-stage
# projection (a join here because parent/child live in separate tables).
# ---------------------------------------------------------------------------
@query(
    "j5_lineage_carry",
    """
    SELECT 'https://www.nrsr.sk/web/Default.aspx?sid=zakony&MasterID=' || l.l_partkey AS child_url,
           o.o_orderkey AS parent_id,
           o.o_orderpriority AS parent_priority,
           CAST(o.o_orderkey % 8 + 1 AS BIGINT) AS period_num
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'P'
    """,
)
def j5_lineage_carry(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.concat(
            F.lit("https://www.nrsr.sk/web/Default.aspx?sid=zakony&MasterID="), F.col("l_partkey")
        ).alias("child_url"),
        F.col("o_orderkey").alias("parent_id"),
        F.col("o_orderpriority").alias("parent_priority"),
        (F.col("o_orderkey") % 8 + 1).cast("long").alias("period_num"),
    )


# ---------------------------------------------------------------------------
# O2: key-ordered store read (missing_members.py:28,34 — Mongo reads sorted by
# (period_num, external_id)).  The rank column materializes the order so the
# driver's order-insensitive hash still verifies it.  Partitioned by nation to
# stay scale-sane (a single global ORDER BY is the anti-pattern at 10^10 rows).
# ---------------------------------------------------------------------------
@query(
    "o2_ordered_read",
    """
    SELECT c_nationkey, c_custkey,
           row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rk
    FROM customer
    """,
)
def o2_ordered_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return customer.select(
        "c_nationkey", "c_custkey", F.row_number().over(w).alias("rk")
    )


# ---------------------------------------------------------------------------
# J4 (cuckoo regime): seen-set dedup through the partitioned cuckoo filter —
# the third pluggable dupefilter (SURVEY §2.10; reference DUPEFILTER_CLASS,
# settings.py:114) — INCLUDING the operation Bloom cannot express: expiring
# keys so the scheduler re-enqueues them (recrawl/TTL).  Seen = orders
# divisible by 3; expired back out = orders divisible by 9.  The cuckoo
# probe has zero false negatives and survivors are exact-checked, so the
# result is set-equal to the arithmetic oracle.
# ---------------------------------------------------------------------------
@query(
    "j4_cuckoo_dedup",
    """
    SELECT o_orderkey
    FROM orders
    WHERE o_orderkey % 3 <> 0 OR o_orderkey % 9 = 0
    """,
)
def j4_cuckoo_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators import cuckoo as CK

    orders = load(spark, sf_dir, "orders")
    url = F.concat(
        F.lit("https://www.nrsr.sk/web/Default.aspx?sid=schodze/hlasovanie&ID="),
        F.col("o_orderkey"),
    )
    cand = orders.select("o_orderkey", F.xxhash64(url).alias("url_hash"))
    seen0 = cand.filter(F.col("o_orderkey") % 3 == 0).select("url_hash")
    expired = cand.filter(F.col("o_orderkey") % 9 == 0).select("url_hash")
    segs = CK.build_cuckoo_segments(seen0, n_segments=8, n_buckets=1 << 10)
    segs = CK.delete_cuckoo(segs, expired, n_segments=8)
    seen = seen0.join(expired, "url_hash", "left_anti")
    return CK.dedup_with_cuckoo(cand, seen, segs, n_segments=8).select("o_orderkey")


# ---------------------------------------------------------------------------
# Link-graph PageRank (operators/linkrank.py): authority-ordered crawl
# prioritization over a cyclic page graph derived from lineitem — order
# pages link to part pages, part pages to supplier pages, supplier pages
# back to their orders (suppliers with l_suppkey % 7 == 0 get no outlinks,
# exercising the dangling-mass path).  K = 3 fixed iterations; the whole
# recurrence is scaled-BIGINT floor division, so the oracle is hash-exact.

_PR_ITER_TPL = """
r{t1} AS (
    SELECT n.node,
           CAST((SELECT (3000000000000 // 20) // n FROM nn)
                + (17 * (COALESCE(c.c, 0)
                         + ((SELECT COALESCE(SUM(r.rank), 0) FROM r{t0} r
                             LEFT JOIN outdeg o ON o.src = r.node
                             WHERE o.src IS NULL) // (SELECT n FROM nn)))) // 20
                AS BIGINT) AS rank
    FROM nodes n
    LEFT JOIN (SELECT e.dst, SUM(r.rank // o.out_deg) AS c
               FROM edges e
               JOIN r{t0} r ON r.node = e.src
               JOIN outdeg o ON o.src = e.src
               GROUP BY e.dst) c ON c.dst = n.node
)"""


def _pagerank_oracle(k: int = 3) -> str:
    parts = ["""
WITH edges AS (
    SELECT DISTINCT src, dst FROM (
        SELECT 3 * l_orderkey AS src, 3 * l_partkey + 1 AS dst FROM lineitem
        UNION ALL
        SELECT 3 * l_partkey + 1, 3 * l_suppkey + 2 FROM lineitem
        UNION ALL
        SELECT 3 * l_suppkey + 2, 3 * l_orderkey FROM lineitem WHERE l_suppkey % 7 <> 0
    )
),
nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
outdeg AS (SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY src),
nn AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (SELECT node, CAST((SELECT 1000000000000 // n FROM nn) AS BIGINT) AS rank FROM nodes)"""]
    for t in range(k):
        parts.append("," + _PR_ITER_TPL.format(t0=t, t1=t + 1))
    parts.append(f"\nSELECT node, rank FROM r{k}")
    return "".join(parts)


@query("link_pagerank", _pagerank_oracle(3))
def link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators import linkrank as LR

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_suppkey")
    o = F.col("l_orderkey") * 3
    p = F.col("l_partkey") * 3 + 1
    s = F.col("l_suppkey") * 3 + 2
    edges = (
        li.select(o.alias("src"), p.alias("dst"))
        .unionAll(li.select(p.alias("src"), s.alias("dst")))
        .unionAll(
            li.filter(F.col("l_suppkey") % 7 != 0).select(s.alias("src"), o.alias("dst"))
        )
    )
    return LR.pagerank_fixed(edges, iterations=3).select("node", "rank")


# ---------------------------------------------------------------------------
# O4: robots Crawl-delay → per-host pop budgets.  Host h declaring delay δ
# absorbs ⌊epoch_seconds/δ⌋ fetches per epoch (reference equivalent:
# DOWNLOAD_DELAY=2.5 + CONCURRENT_REQUESTS_PER_IP=1, settings.py:30-33);
# the pop keeps the two-level skew-proof decomposition with the budget as a
# host-constant column.  epoch_seconds=10, default budget 5 → h0 (δ=5.0)
# gets 2, h1 (δ=2.5) gets 4, other hosts 5.
@query(
    "o4_crawl_delay_budget",
    """
    WITH f AS (
        SELECT 'h' || CAST(o_custkey % 4 AS VARCHAR) || '.nrsr.sk' AS host,
               o_orderkey % 3 AS priority,
               o_orderkey AS seq
        FROM orders
    ),
    r AS (
        SELECT host, seq,
               row_number() OVER (PARTITION BY host ORDER BY priority DESC, seq DESC) AS rk
        FROM f
    )
    SELECT host, seq, rk FROM r
    WHERE rk <= CASE host WHEN 'h0.nrsr.sk' THEN 2
                          WHEN 'h1.nrsr.sk' THEN 4
                          ELSE 5 END
    """,
)
def o4_crawl_delay_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators import politeness

    rules = [
        {"host": "h0.nrsr.sk", "user_agent": "*", "rule": "allow", "path_prefix": "/", "crawl_delay": 5.0},
        {"host": "h1.nrsr.sk", "user_agent": "*", "rule": "allow", "path_prefix": "/", "crawl_delay": 2.5},
        {"host": "h1.nrsr.sk", "user_agent": "otherbot", "rule": "allow", "path_prefix": "/", "crawl_delay": 60.0},
    ]
    budgets = robots.crawl_delay_budgets(rules, epoch_seconds=10.0, default_budget=5)
    frontier = load(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), F.col("o_custkey") % 4, F.lit(".nrsr.sk")).alias("host"),
        (F.col("o_orderkey") % 3).alias("priority"),
        F.col("o_orderkey").alias("seq"),
    )
    return politeness.pop_budget(
        frontier,
        budget=robots.budget_expr(budgets, 5, F.col("host")),
        salt_col="seq",
        num_salts=8,
    ).select("host", "seq", "rk")


# ---------------------------------------------------------------------------
# Change-rate recrawl priority (operators/recrawl.py): revisit stats +
# integer freshness priority over a revisit log — here the events table as
# a synthetic fetch history (url = user page, epoch = event_id, content
# hash = event_type).  All integer arithmetic; single window + groupBy.
@query(
    "recrawl_priority",
    """
    WITH seq AS (
        SELECT user_id AS url_hash, event_id AS epoch,
               CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) IS NOT NULL
                     AND event_type <> lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
                    THEN 1 ELSE 0 END AS changed
        FROM events
    ),
    stats AS (
        SELECT url_hash, COUNT(*) AS n_visits, SUM(changed) AS n_changes,
               MAX(epoch) AS last_epoch
        FROM seq GROUP BY url_hash
    )
    SELECT url_hash,
           n_visits,
           CAST(n_changes AS BIGINT) AS n_changes,
           CAST(CASE WHEN n_visits <= 1 THEN 10000
                     ELSE (n_changes * 10000) // (n_visits - 1) END AS BIGINT) AS change_bps,
           CAST((SELECT MAX(event_id) FROM events) - last_epoch AS BIGINT) AS age,
           CAST((CASE WHEN n_visits <= 1 THEN 10000
                      ELSE (n_changes * 10000) // (n_visits - 1) END)
                * ((SELECT MAX(event_id) FROM events) - last_epoch) AS BIGINT) AS recrawl_priority
    FROM stats
    """,
)
def recrawl_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators import recrawl as R

    visits = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("url_hash"),
        F.col("event_id").alias("epoch"),
        F.col("event_type").alias("content_hash"),
    )
    return R.change_rate_priority(visits)


# ---------------------------------------------------------------------------
# F15: tracking-param stripping on canonical URLs (functions/urls.py
# strip_tracking) — utm_*/click-id/session params are per-visitor noise, so
# two tracking aliases of one page must collapse to one frontier row.  URL a
# and URL b differ ONLY in tracking params; after canon+strip they are equal
# and hash-equal.  Rows where o_orderkey % 5 = 0 carry ONLY tracking params
# (the '?' must drop entirely).
@query(
    "f10_strip_tracking",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 5 = 0
                THEN 'https://www.nrsr.sk/Web/Default.aspx'
                ELSE 'https://www.nrsr.sk/Web/Default.aspx?ID=' || o_orderkey || '&sid=zakony'
           END AS stripped_a,
           TRUE AS collapsed
    FROM orders
    """,
)
def f10_strip_tracking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.functions import urls as U

    orders = load(spark, sf_dir, "orders")
    content = F.when(
        F.col("o_orderkey") % 5 == 0, F.lit("")
    ).otherwise(F.concat(F.lit("&ID="), F.col("o_orderkey"), F.lit("&sid=zakony")))
    url_a = F.concat(
        F.lit("HTTPS://WWW.NRSR.SK/Web/Default.aspx?utm_source=mail"),
        content,
        F.lit("&fbclid=x"),
        F.col("o_orderkey"),
    )
    url_b = F.concat(
        F.lit("HTTPS://WWW.NRSR.SK/Web/Default.aspx?UTM_campaign=y"),
        content,
        F.lit("&gclid=z"),
        F.col("o_orderkey"),
        F.lit("#frag"),
    )
    df = orders.select(
        "o_orderkey",
        U.strip_tracking(U.canonicalize(url_a)).alias("stripped_a"),
        U.strip_tracking(U.canonicalize(url_b)).alias("stripped_b"),
    )
    return df.select(
        "o_orderkey",
        "stripped_a",
        (
            (F.col("stripped_a") == F.col("stripped_b"))
            & (U.url_hash(F.col("stripped_a")) == U.url_hash(F.col("stripped_b")))
        ).alias("collapsed"),
    )


# ---------------------------------------------------------------------------
# O4: fetch-retry resolution (operators/retry.py — Scrapy RetryMiddleware
# parity, RETRY_TIMES=2 / RETRY_PRIORITY_ADJUST=-1).  Attempt log derived
# from orders: key o_orderkey fails its first (o_orderkey % 5) attempts —
# fail_times 0-2 resolve 'ok' in fail_times+1 attempts, 3-4 exhaust the
# budget and resolve 'failed' after max_retries+1 = 3 attempts.  Attempt
# rows BEYOND the policy horizon (attempt 3) are present in the log and must
# be ignored.  One map-side-combinable groupBy — no windows, 10^10-attempt
# shape.  The in-crawl-loop wiring (same policy, live pending re-scheduling)
# is gated by tests/test_crawl_retry.py.
@query(
    "o4_retry_resolve",
    """
    WITH log AS (
        SELECT o_orderkey, a.attempt,
               a.attempt >= (o_orderkey % 5) AS ok
        FROM orders, (SELECT unnest([0, 1, 2, 3]) AS attempt) a
    ),
    agg AS (
        SELECT o_orderkey, MIN(CASE WHEN ok THEN attempt END) AS first_ok
        FROM log WHERE attempt <= 2 GROUP BY o_orderkey
    )
    SELECT o_orderkey,
           CAST(COALESCE(first_ok + 1, 3) AS INT) AS n_attempts,
           CASE WHEN first_ok IS NOT NULL THEN 'ok' ELSE 'failed' END AS final_status,
           CAST((COALESCE(first_ok + 1, 3) - 1) * -1 AS INT) AS final_priority_adjust
    FROM agg
    """,
)
def o4_retry_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators import retry as RT

    orders = load(spark, sf_dir, "orders")
    log = orders.select(
        "o_orderkey",
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("attempt"),
    ).withColumn("ok", F.col("attempt") >= F.pmod(F.col("o_orderkey"), F.lit(5)))
    out = RT.resolve_attempts(
        log, max_retries=2, priority_adjust=-1, key_col="o_orderkey"
    )
    return out.select(
        "o_orderkey",
        F.col("n_attempts").cast("int").alias("n_attempts"),
        "final_status",
        F.col("final_priority_adjust").cast("int").alias("final_priority_adjust"),
    )


# S9 (engine addition): HTTP content-encoding middleware parity
# (sources/compression.py; reference settings.py:66 enables Scrapy's
# HttpCompressionMiddleware).  Bodies compressed per-row (gzip / deflate /
# identity by key arithmetic) then inflated back through the middleware —
# the oracle sees the plaintext directly, so any corruption in either
# codec path hash-mismatches on the full body text.  In-engine wiring
# (CrawlEngine inflates at the source boundary) is gated by
# tests/test_compression.py's byte-identical crawl parity.
@query(
    "s9_content_encoding",
    """
    SELECT doc_id,
           CASE hash_bucket % 3 WHEN 0 THEN 'gzip' WHEN 1 THEN 'deflate'
                ELSE 'identity' END AS served_encoding,
           text AS body,
           LENGTH(text) AS n_chars
    FROM (SELECT doc_id, text, row_number() OVER (ORDER BY doc_id) AS hash_bucket
          FROM documents)
    """,
)
def s9_content_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from nrsr_crawler_spark.sources import compression as C

    docs = load(spark, sf_dir, "documents")
    plain = docs.select(
        "doc_id",
        F.row_number().over(Window.orderBy("doc_id")).alias("hash_bucket"),
        F.col("text").cast("binary").alias("body"),
    ).select(
        "doc_id",
        F.when(F.pmod(F.col("hash_bucket"), F.lit(3)) == 0, F.lit("gzip"))
        .when(F.pmod(F.col("hash_bucket"), F.lit(3)) == 1, F.lit("deflate"))
        .otherwise(F.lit("identity"))
        .alias("enc"),
        "body",
    )
    served = C.with_encoding(plain, F.col("enc"))
    inflated = C.inflate_bodies(served)
    return inflated.select(
        "doc_id",
        F.col("enc").alias("served_encoding"),
        F.col("body").cast("string").alias("body"),
        F.length(F.col("body").cast("string")).alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# O5: Scrapy AutoThrottle parity (reference ships it configured-but-
# commented, settings.py:94-103): per-host delay recurrence
# delay' = clamp((delay + latency/target_concurrency)/2) folded over the
# observed latency sequence in integer milliseconds, then epoch budgets
# ⌊epoch_ms/delay⌋ — the same budget_expr hook the crawl-delay path uses.
@query(
    "o5_autothrottle",
    """
    WITH lat AS (
        SELECT 'h' || CAST(o_custkey % 6 AS VARCHAR) || '.nrsr.sk' AS host,
               o_orderkey AS epoch,
               CAST(50 + o_orderkey % 3000 AS BIGINT) AS latency_ms
        FROM orders
    ),
    agg AS (SELECT host, list(latency_ms ORDER BY epoch) AS lats FROM lat GROUP BY host),
    d AS (
        SELECT host,
               list_reduce(
                   list_prepend(CAST(5000 AS BIGINT), lats),
                   (acc, x) -> GREATEST(2500, LEAST(60000, (acc + (x * 1000) // 1000) // 2))
               ) AS delay_ms
        FROM agg
    )
    SELECT host, delay_ms, GREATEST(1, 60000 // delay_ms) AS budget FROM d
    """,
)
def o5_autothrottle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators import politeness

    lat = load(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), F.col("o_custkey") % 6, F.lit(".nrsr.sk")).alias("host"),
        F.col("o_orderkey").alias("epoch"),
        (F.lit(50) + F.col("o_orderkey") % 3000).cast("long").alias("latency_ms"),
    )
    delays = politeness.autothrottle_delays(lat)
    budgets = politeness.autothrottle_budgets(delays, epoch_ms=60000)
    return delays.join(budgets, "host").select("host", "delay_ms", "budget")


# ---------------------------------------------------------------------------
# Anchor-text rollup: HTML pages are BUILT from orders rows (customer pages
# listing order links, plus two "hot list" pages that re-link every 7th
# order — once under a different anchor string, once under the normal one),
# then parsed back by the JVM regexp kernel and aggregated per TARGET.  The
# oracle derives the expected rollup relationally — a hash match certifies
# extraction, the frequency-then-lexicographic top-text rule, and both
# aggregation levels.  Hot targets get in_degree 3 with the normal text
# winning 2-1 over the lexicographically-smaller 'HOT-…' string, so the
# frequency ordering is genuinely exercised.


@query(
    "anchor_text_rollup",
    """
    WITH l AS (SELECT o_orderkey AS okey, o_orderstatus AS st
               FROM orders WHERE o_orderkey <= 4000),
    occ AS (
        SELECT okey, 'O' || okey || '-' || st AS text FROM l
        UNION ALL
        SELECT okey, 'HOT-' || okey FROM l WHERE okey % 7 = 0
        UNION ALL
        SELECT okey, 'O' || okey || '-' || st FROM l WHERE okey % 7 = 0
    ),
    per_text AS (SELECT okey, text, COUNT(*) AS cnt FROM occ GROUP BY okey, text),
    top AS (SELECT okey, text FROM (
                SELECT *, row_number() OVER (PARTITION BY okey ORDER BY cnt DESC, text) AS rn
                FROM per_text) WHERE rn = 1),
    agg AS (SELECT okey, CAST(SUM(cnt) AS BIGINT) AS in_degree, COUNT(*) AS n_texts
            FROM per_text GROUP BY okey)
    SELECT 'https://www.nrsr.sk/web/order/' || agg.okey AS target_url,
           in_degree, n_texts, top.text AS top_text
    FROM agg JOIN top USING (okey)
    """,
)
def anchor_text_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators.linkrank import anchor_text_rollup

    ords = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 4000)
    okey = F.col("o_orderkey").cast("string")
    target = F.concat(F.lit("https://www.nrsr.sk/web/order/"), okey)
    normal = F.concat(F.lit("O"), okey, F.lit("-"), F.col("o_orderstatus"))

    def link(text):
        return F.concat(F.lit('<a href="'), target, F.lit('">'), text, F.lit("</a>"))

    def assemble(grouped):
        return F.array_join(
            F.transform(F.array_sort(F.collect_list("s")), lambda s: s["l"]), ""
        ).alias("html")

    cust_pages = (
        ords.select(
            F.col("o_custkey"),
            F.struct(F.col("o_orderkey").alias("k"), link(normal).alias("l")).alias("s"),
        )
        .groupBy("o_custkey")
        .agg(assemble(None))
        .select(
            F.concat(F.lit("https://www.nrsr.sk/web/cust/"), F.col("o_custkey").cast("string")).alias("page_url"),
            "html",
        )
    )
    hot = ords.filter(F.col("o_orderkey") % 7 == 0)

    def hot_page(name, text):
        return (
            hot.select(F.struct(F.col("o_orderkey").alias("k"), link(text).alias("l")).alias("s"))
            .agg(assemble(None))
            .select(F.lit(f"https://www.nrsr.sk/web/{name}").alias("page_url"), "html")
        )

    pages = cust_pages.unionByName(
        hot_page("hot", F.concat(F.lit("HOT-"), okey))
    ).unionByName(hot_page("hot2", normal))
    return anchor_text_rollup(pages, "page_url", "html")


# ---------------------------------------------------------------------------
# Gap-based event sessionization + JSON props extraction over the events
# table — the semi-structured (JSON column) source surface plus the classic
# event-analytics window, both exact (unix_micros integer gaps; JSON path
# extraction identical in both engines).


@query(
    "events_sessionize",
    """
    WITH e AS (SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events),
    l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
    f AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS brk FROM l),
    s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_seq FROM f)
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events, MIN(ts) AS start_ts, MAX(ts) AS end_ts
    FROM s GROUP BY user_id, session_seq
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators.windows import gap_sessionize

    ev = load(spark, sf_dir, "events")
    return gap_sessionize(ev, "user_id", "ts", "event_id", gap_seconds=1800)


@query(
    "events_json_rollup",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def events_json_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column surface: JSON path extraction from the props
    column (JVM get_json_object — codegen, no UDF), rolled up per type."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# AS-OF join (operators/temporal_joins.py): every non-snapshot order joined
# to the customer's LATEST policy snapshot at or before its date (snapshots
# = every 10th order, one per (customer, date)).  The oracle states as-of
# semantics directly (inequality join + latest-wins rank).


@query(
    "asof_policy_join",
    """
    WITH snaps AS (
        SELECT o_custkey AS ck, o_orderdate AS sd,
               MIN(o_orderkey) AS policy_okey,
               arg_min(o_totalprice, o_orderkey) AS policy_price
        FROM orders WHERE o_orderkey % 10 = 0 GROUP BY 1, 2
    ),
    lefts AS (SELECT o_orderkey, o_custkey, o_orderdate
              FROM orders WHERE o_orderkey % 10 <> 0),
    ranked AS (
        SELECT l.o_orderkey, l.o_custkey, l.o_orderdate,
               s.sd, s.policy_okey, s.policy_price,
               row_number() OVER (PARTITION BY l.o_orderkey ORDER BY s.sd DESC) AS rn
        FROM lefts l LEFT JOIN snaps s
          ON s.ck = l.o_custkey AND s.sd <= l.o_orderdate
    )
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(sd AS TIMESTAMP) AS matched_ts, policy_okey, policy_price
    FROM ranked WHERE rn = 1
    """,
)
def asof_policy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators.temporal_joins import asof_join

    ords = load(spark, sf_dir, "orders")
    snaps = (
        ords.filter(F.col("o_orderkey") % 10 == 0)
        .groupBy(F.col("o_custkey"), F.col("o_orderdate"))
        .agg(F.min(F.struct("o_orderkey", "o_totalprice")).alias("s"))
        .select(
            "o_custkey",
            "o_orderdate",
            F.col("s.o_orderkey").alias("policy_okey"),
            F.col("s.o_totalprice").alias("policy_price"),
        )
    )
    lefts = ords.filter(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    return asof_join(
        lefts, snaps, key="o_custkey", left_ts="o_orderdate",
        right_ts="o_orderdate", payload_cols=["policy_okey", "policy_price"],
    )


# ---------------------------------------------------------------------------
# Binned RANGE join (operators/temporal_joins.py): events assigned to their
# user's session interval via (key, time-bin) equi-join + residual filter —
# never a nested-loop range product.  Intervals come from gap_sessionize;
# the oracle states the BETWEEN join directly.


@query(
    "range_session_assign",
    """
    WITH e AS (SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS us FROM events),
    l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
    f AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS brk FROM l),
    s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_seq FROM f),
    sess AS (SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                    MIN(ts) AS start_ts, MAX(ts) AS end_ts
             FROM s GROUP BY user_id, session_seq)
    SELECT ev.event_id, ev.user_id, ev.event_type, ev.ts,
           sess.session_seq, sess.start_ts, sess.end_ts
    FROM events ev JOIN sess
      ON ev.user_id = sess.user_id AND ev.ts BETWEEN sess.start_ts AND sess.end_ts
    """,
)
def range_session_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators.temporal_joins import range_join_binned
    from nrsr_crawler_spark.operators.windows import gap_sessionize

    ev = load(spark, sf_dir, "events")
    sess = gap_sessionize(ev, "user_id", "ts", "event_id", gap_seconds=1800).select(
        "user_id", "session_seq", "start_ts", "end_ts"
    )
    points = ev.select("event_id", "user_id", "event_type", "ts")
    return range_join_binned(
        points, sess, key="user_id", point_ts="ts",
        start_ts="start_ts", end_ts="end_ts", bin_seconds=3600,
    )


# ---------------------------------------------------------------------------
# Hypertable-style hourly rollup (operators/rollup.py): time-bucket by exact
# integer microsecond floor division, mergeable integer-cent partials.  The
# oracle restates the bucketing and aggregation directly.


@query(
    "events_hourly_rollup",
    """
    WITH b AS (
        SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % 3600000000) AS bucket,
               event_type,
               CAST(round(value * 100) AS BIGINT) AS c
        FROM events
    )
    SELECT bucket, event_type,
           COUNT(*) AS n,
           CAST(SUM(c) AS BIGINT) AS sum_centi,
           MIN(c) AS vmin,
           MAX(c) AS vmax
    FROM b GROUP BY bucket, event_type
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators.rollup import time_rollup

    return time_rollup(
        load(spark, sf_dir, "events"), "ts", ["event_type"], "value", width_seconds=3600
    )


# ---------------------------------------------------------------------------
# Link-graph HITS (operators/linkrank.py hits_fixed): hub/authority scores
# over the same cyclic lineitem-derived page graph as link_pagerank.
# Authority ranks content pages worth fetch budget; hub ranks listing pages
# worth re-crawling for fresh outlinks.  K = 2 iterations = 4 half-steps,
# each an integer edge-sum + L1 renormalization (v * SCALE div total), so
# the oracle unrolls to 4 CTE pairs in exact BIGINT floor division.

_HITS_EDGES = """
WITH edges AS (
    SELECT DISTINCT src, dst FROM (
        SELECT 3 * l_orderkey AS src, 3 * l_partkey + 1 AS dst FROM lineitem
        UNION ALL
        SELECT 3 * l_partkey + 1, 3 * l_suppkey + 2 FROM lineitem
        UNION ALL
        SELECT 3 * l_suppkey + 2, 3 * l_orderkey FROM lineitem WHERE l_suppkey % 7 <> 0
    )
),
nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
nn AS (SELECT COUNT(*) AS n FROM nodes),
h0 AS (SELECT node, CAST((SELECT 1000000 // n FROM nn) AS BIGINT) AS score FROM nodes)"""

_HITS_HALF_TPL = """,
{out}r AS (
    SELECT e.{grp} AS node, SUM(s.score) AS v
    FROM edges e JOIN {prev} s ON s.node = e.{key}
    GROUP BY e.{grp}
),
{out} AS (
    SELECT n.node,
           CAST(COALESCE(r.v, 0) * 1000000
                // COALESCE((SELECT SUM(v) FROM {out}r), 1) AS BIGINT) AS score
    FROM nodes n LEFT JOIN {out}r r ON r.node = n.node
)"""


def _hits_oracle(k: int = 2) -> str:
    parts = [_HITS_EDGES]
    prev = "h0"
    for t in range(1, k + 1):
        parts.append(_HITS_HALF_TPL.format(out=f"a{t}", prev=prev, key="src", grp="dst"))
        parts.append(_HITS_HALF_TPL.format(out=f"h{t}", prev=f"a{t}", key="dst", grp="src"))
        prev = f"h{t}"
    parts.append(
        f"\nSELECT n.node, a.score AS auth, h.score AS hub"
        f"\nFROM nodes n JOIN a{k} a ON a.node = n.node JOIN h{k} h ON h.node = n.node"
    )
    return "".join(parts)


@query("link_hits", _hits_oracle(2))
def link_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators import linkrank as LR

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_suppkey")
    o = F.col("l_orderkey") * 3
    p = F.col("l_partkey") * 3 + 1
    s = F.col("l_suppkey") * 3 + 2
    edges = (
        li.select(o.alias("src"), p.alias("dst"))
        .unionAll(li.select(p.alias("src"), s.alias("dst")))
        .unionAll(
            li.filter(F.col("l_suppkey") % 7 != 0).select(s.alias("src"), o.alias("dst"))
        )
    )
    return LR.hits_fixed(edges, iterations=2).select("node", "auth", "hub")
