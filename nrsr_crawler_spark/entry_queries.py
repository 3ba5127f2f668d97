"""Driver-contract query battery (SURVEY §2 operator inventory → testdata).

Each entry in ``QUERIES`` is a Spark implementation of one operator family
from SURVEY.md §2, expressed over the driver's TPC-H-ish tables; ``ORACLES``
holds the equivalent ANSI SQL DuckDB runs on the same parquet for the
driver's correctness gate (row-count + schema + order-insensitive value
hash).  Column names are aliased identically on both sides.

Numeric policy: monetary/ratio aggregates are emitted as integer "cents"
(``round(sum(x)*100)::bigint``) so double summation-order differences between
engines cannot flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nrsr_crawler_spark.functions import cleaners as C
from nrsr_crawler_spark.functions import urls as U
from nrsr_crawler_spark.operators import anti_joins, merge_sink, windows
from nrsr_crawler_spark.sources.tpch import load

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def _cents(c) -> F.Column:
    return F.round(c * 100).cast("long")


# ---------------------------------------------------------------------------
# A: aggregations (SURVEY §2.4) — TPC-H-Q1-shaped pricing summary.
# Map-side partial aggregation + single shuffle on the 2-col group key.
# ---------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(l_quantity)) AS BIGINT)                                   AS sum_qty,
           CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT)                        AS sum_base_cents,
           CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)     AS sum_disc_cents,
           CAST(ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100) AS BIGINT) AS sum_charge_cents,
           CAST(ROUND(AVG(l_quantity) * 100) AS BIGINT)                             AS avg_qty_centi,
           COUNT(*)                                                                 AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity")).cast("long").alias("sum_qty"),
        _cents(F.sum("l_extendedprice")).alias("sum_base_cents"),
        _cents(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("sum_disc_cents"),
        _cents(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")))).alias("sum_charge_cents"),
        _cents(F.avg("l_quantity")).alias("avg_qty_centi"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# J2: missing_members anti-join (missing_members.py:23-44) — keys in the
# change-log (orders≙member_change) absent from the entity table.  Here:
# customers that never placed an order.
# ---------------------------------------------------------------------------
@query(
    "j2_missing_members",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
    """,
)
def j2_missing_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 250000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    missing = anti_joins.missing_keys(customer, orders, ["c_custkey"])
    return missing.join(customer, "c_custkey").select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# J3: missing_presses (missing_presses.py:25-50) — wanted refs from a flat
# source ∪ an exploded nested source, minus refs already present.
# The nested side is built with collect_list then exploded ($unwind ≙ explode).
# ---------------------------------------------------------------------------
@query(
    "j3_missing_presses",
    """
    WITH wanted AS (
        SELECT l_partkey AS partkey FROM lineitem WHERE l_quantity >= 48
        UNION
        SELECT l.l_partkey FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
    )
    SELECT w.partkey FROM wanted w
    WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = w.partkey AND p.p_size < 25)
    """,
)
def j3_missing_presses(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part")
    wanted_flat = li.filter(F.col("l_quantity") >= 48).select(F.col("l_partkey").alias("partkey"))
    # nested side: per-urgent-order array of partkeys (≙ committeeschedule.points)
    nested = (
        li.join(orders.filter(F.col("o_orderpriority") == "1-URGENT"), li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey")
        .agg(F.collect_list("l_partkey").alias("points"))
    )
    having = part.filter(F.col("p_size") < 25).select(F.col("p_partkey").alias("partkey"))
    return anti_joins.missing_refs(
        wanted_flat, nested, nested_col="points", ref_col="partkey", having=having, keys=["partkey"]
    )


# ---------------------------------------------------------------------------
# J1/S6: keyed upsert-with-archive classification (pipelines.py:133-144).
# old/new snapshots derived deterministically from customer; the engine's
# merge_upsert classifies every batch row insert/update/unchanged.
# ---------------------------------------------------------------------------
@query(
    "j1_upsert_classify",
    """
    WITH old AS (SELECT * FROM customer WHERE c_custkey % 7 <> 0),
         new AS (SELECT c_custkey, c_name, c_nationkey,
                        CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 1 ELSE c_acctbal END AS c_acctbal,
                        c_mktsegment
                 FROM customer WHERE c_custkey % 5 <> 0)
    SELECT n.c_custkey,
           CASE WHEN o.c_custkey IS NULL THEN 'insert'
                WHEN n.c_name IS NOT DISTINCT FROM o.c_name
                 AND n.c_nationkey IS NOT DISTINCT FROM o.c_nationkey
                 AND n.c_acctbal IS NOT DISTINCT FROM o.c_acctbal
                 AND n.c_mktsegment IS NOT DISTINCT FROM o.c_mktsegment THEN 'unchanged'
                ELSE 'update' END AS action
    FROM new n LEFT JOIN old o USING (c_custkey)
    """,
)
def j1_upsert_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    old = customer.filter(F.col("c_custkey") % 7 != 0)
    new = customer.filter(F.col("c_custkey") % 5 != 0).withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 3 == 0, F.col("c_acctbal") + 1).otherwise(F.col("c_acctbal")),
    )
    res = merge_sink.merge_upsert(old, new, ["c_custkey"])
    return res.actions.select("c_custkey", "action")


# ---------------------------------------------------------------------------
# A1/§2.5: daily_clubs sessionization (votings.py:219-244) — carry the last
# header row forward, then roll up per (user, session-header).
# ---------------------------------------------------------------------------
@query(
    "a1_clubs_sessionize",
    """
    WITH tagged AS (
        SELECT user_id, event_id, event_type, value,
               last_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_header
        FROM events
    )
    SELECT user_id, session_header,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(value) * 100) AS BIGINT) AS sum_value_cents
    FROM tagged
    GROUP BY user_id, session_header
    """,
)
def a1_clubs_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "hdr", F.when(F.col("event_type") == "signup", F.col("event_id"))
    )
    tagged = windows.carry_last_header(ev, ["user_id"], "event_id", "hdr", out_col="session_header")
    return tagged.groupBy("user_id", "session_header").agg(
        F.count(F.lit(1)).alias("n_events"),
        _cents(F.sum("value")).alias("sum_value_cents"),
    )


# ---------------------------------------------------------------------------
# O3: frontier pop order — Scrapy LIFO priority pop under a per-host budget
# (settings.py:30-33; SURVEY §2.6).  Hosts/priorities synthesized from orders.
# ---------------------------------------------------------------------------
@query(
    "o3_frontier_pop",
    """
    WITH frontier AS (
        SELECT 'https://h' || (o_custkey % 8) || '.nrsr.sk/doc?ID=' || o_orderkey AS url,
               'h' || (o_custkey % 8) || '.nrsr.sk' AS host,
               6 - CAST(regexp_extract(o_orderpriority, '(\\d+)', 1) AS BIGINT) AS priority,
               o_orderkey AS seq
        FROM orders
    )
    SELECT host, url, rk FROM (
        SELECT host, url,
               row_number() OVER (PARTITION BY host ORDER BY priority DESC, seq DESC) AS rk
        FROM frontier
    ) WHERE rk <= 5
    """,
)
def o3_frontier_pop(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    frontier = orders.select(
        F.concat(F.lit("https://h"), F.col("o_custkey") % 8, F.lit(".nrsr.sk/doc?ID="), F.col("o_orderkey")).alias("url"),
        F.concat(F.lit("h"), F.col("o_custkey") % 8, F.lit(".nrsr.sk")).alias("host"),
        (F.lit(6) - C.first_int(F.col("o_orderpriority"))).alias("priority"),
        F.col("o_orderkey").alias("seq"),
    )
    popped = windows.topk_per_group(
        frontier, ["host"], [F.col("priority").desc(), F.col("seq").desc()], k=5
    )
    return popped.select("host", "url", "rk")


# ---------------------------------------------------------------------------
# P2/P3/P4: pushed-down predicates (period filter + incremental date cutoff,
# nrsr_spider.py:13-26) — filter + projection that must reach the scan.
# ---------------------------------------------------------------------------
@query(
    "p3_incremental_cutoff",
    """
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderstatus = 'F'
    """,
)
def p3_incremental_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderstatus") == "F")
        )
        .select("o_orderkey", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# F1-F13: scalar cleaner suite over strings synthesized from lineitem.
# ---------------------------------------------------------------------------
@query(
    "f_scalar_suite",
    """
    SELECT l_orderkey, l_linenumber,
           regexp_extract('[' || l_returnflag || '] Proti', '\\[(.*)\\].*', 1) AS vote,
           string_split(regexp_extract('javascript:__doPostBack(''grid'',''Page$' || l_linenumber || ''')', '.*(Page.*[0-9]).*', 1), '$')[-1] AS page,
           CAST(date_trunc('day', l_shipdate) + INTERVAL 12 HOUR AS TIMESTAMP) AS ship_noon,
           CAST(regexp_extract('Hlasovanie č. ' || l_orderkey || ' o bode', '(\\d+)', 1) AS BIGINT) AS num,
           replace('mailto:user' || l_suppkey || '@nrsr.sk', 'mailto:', '') AS mail,
           trim(replace('  x' || chr(160) || 'y  ', chr(160), '')) AS cleaned
    FROM lineitem
    WHERE l_orderkey % 97 = 0
    """,
)
def f_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 97 == 0)
    date_str = F.date_format(F.col("l_shipdate"), "d. M. yyyy")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        C.vote_bracket(F.concat(F.lit("["), F.col("l_returnflag"), F.lit("] Proti"))).alias("vote"),
        C.page_token(
            F.concat(F.lit("javascript:__doPostBack('grid','Page$"), F.col("l_linenumber"), F.lit("')"))
        ).alias("page"),
        C.parse_date_noon(date_str).alias("ship_noon"),
        C.first_int(F.concat(F.lit("Hlasovanie č. "), F.col("l_orderkey"), F.lit(" o bode"))).alias("num"),
        C.filter_mailto(F.concat(F.lit("mailto:user"), F.col("l_suppkey"), F.lit("@nrsr.sk"))).alias("mail"),
        C.filter_whitespaces(F.lit("  x\xa0y  ")).alias("cleaned"),
    )


# ---------------------------------------------------------------------------
# F9/F10/F14: URL canonicalization round-trip — messy URL built per order,
# canon + query-param extraction (members.py:81-88).
# ---------------------------------------------------------------------------
@query(
    "f9_url_canon",
    """
    SELECT o_orderkey,
           'https://www.nrsr.sk/Web/Default.aspx?CisObdobia=' || (o_orderkey % 8 + 1)
               || '&ID=' || o_orderkey || '&sid=zakony/cpt' AS canon,
           o_orderkey AS id_param,
           o_orderkey % 8 + 1 AS period
    FROM orders
    """,
)
def f9_url_canon(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    url = F.concat(
        F.lit("HTTPS://WWW.NRSR.SK/Web/Default.aspx?sid=zakony/cpt&CisObdobia="),
        F.col("o_orderkey") % 8 + 1,
        F.lit("&ID="),
        F.col("o_orderkey"),
        F.lit("#top"),
    )
    df = orders.select("o_orderkey", url.alias("url"))
    return df.select(
        "o_orderkey",
        U.canonicalize(F.col("url")).alias("canon"),
        U.url_query_param_long(F.col("url"), "ID").alias("id_param"),
        U.url_query_param_long(F.col("url"), "CisObdobia").alias("period"),
    )


# ---------------------------------------------------------------------------
# U1/U2: union + except (missing_presses.py:50) — nation names reachable from
# rich customers ∪ rich suppliers, minus EUROPE nations.
# ---------------------------------------------------------------------------
@query(
    "u1_union_except",
    """
    SELECT n_name FROM (
        SELECT n.n_name FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey WHERE c.c_acctbal > 9000
        UNION
        SELECT n.n_name FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey WHERE s.s_acctbal > 9000
    )
    EXCEPT
    SELECT n.n_name FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey WHERE r.r_name = 'EUROPE'
    """,
)
def u1_union_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name")
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name")
    )
    europe = (
        nation.join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("n_name")
    )
    return cust.unionByName(supp).distinct().exceptAll(europe.distinct())


# ---------------------------------------------------------------------------
# P5: positional row slicing — tr[position()>1 and position()<last()]
# (votings.py:141) over lineitems of each order.
# ---------------------------------------------------------------------------
@query(
    "p5_positional_slice",
    """
    SELECT l_orderkey, l_linenumber FROM (
        SELECT l_orderkey, l_linenumber,
               row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS pos,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS n
        FROM lineitem
    ) WHERE pos > 1 AND pos < n
    """,
)
def p5_positional_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    return windows.positional_slice(li, ["l_orderkey"], "l_linenumber")


# ---------------------------------------------------------------------------
# A2: distinct (pagination hrefs dedup, votings.py:81) — distinct pairs.
# ---------------------------------------------------------------------------
@query(
    "a2_distinct_pages",
    """
    SELECT DISTINCT l_partkey, l_suppkey FROM lineitem WHERE l_quantity > 49
    """,
)
def a2_distinct_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 49)
        .select("l_partkey", "l_suppkey")
        .dropDuplicates(["l_partkey", "l_suppkey"])
    )


# ---------------------------------------------------------------------------
# Flagship: frontier schedule+dedup epoch pass (plans/flagship.py, SURVEY §3.1)
# ---------------------------------------------------------------------------
from nrsr_crawler_spark.plans.flagship import FLAGSHIP_ORACLE, frontier_schedule_dedup  # noqa: E402

QUERIES["flagship_frontier_schedule"] = frontier_schedule_dedup
ORACLES["flagship_frontier_schedule"] = FLAGSHIP_ORACLE

# training-data pipeline battery (dedup / ANN / text / multimodal)
import nrsr_crawler_spark.entry_queries_ml  # noqa: E402,F401

# remaining §2 checklist rows (A3/A4/F7/S6/robots/U3/J5/O2)
import nrsr_crawler_spark.entry_queries_ext  # noqa: E402,F401
import nrsr_crawler_spark.entry_queries_stream  # noqa: E402,F401

# typed item extraction end-to-end (HTML → parse → fold → keyed merge)
import nrsr_crawler_spark.entry_queries_items  # noqa: E402,F401

# round-4 additive wave (containment / eTLD+1 / DSIR / tile-hash)
import nrsr_crawler_spark.entry_queries_r4  # noqa: E402,F401

# round-4 wave B (OPIC / graph stats / quota / systematic sample /
# perplexity bits / TF-IDF / shard plan)
import nrsr_crawler_spark.entry_queries_r4b  # noqa: E402,F401

# round-4 wave C (triangle counting / mixture epoch plan)
import nrsr_crawler_spark.entry_queries_r4c  # noqa: E402,F401

# round-4 wave D (filter funnel / cluster-size histogram reports)
import nrsr_crawler_spark.entry_queries_r4d  # noqa: E402,F401

# round-4 wave E (HyperBall neighborhood function)
import nrsr_crawler_spark.entry_queries_r4e  # noqa: E402,F401

# round-4 wave F (WARC/CDX plan / canonical election / snapshot diff /
# error-spike report)
import nrsr_crawler_spark.entry_queries_r4f  # noqa: E402,F401

# round-4 wave G (k-core / weighted bottom-k / alignment gate / Heaps curve)
import nrsr_crawler_spark.entry_queries_r4g  # noqa: E402,F401

# round-4 wave H (resolution-ladder resize plan / crawl drain ETA)
import nrsr_crawler_spark.entry_queries_r4h  # noqa: E402,F401

# round-4 wave I (bloom calibration / mixture drift / RRF fusion)
import nrsr_crawler_spark.entry_queries_r4i  # noqa: E402,F401

# round-4 wave J (edit-distance dedup / stopword induction / depth profile)
import nrsr_crawler_spark.entry_queries_r4j  # noqa: E402,F401

# round-4 wave K (co-citation / transition matrix / PMI collocations)
import nrsr_crawler_spark.entry_queries_r4k  # noqa: E402,F401

# round-4 wave L (redirect resolution / politeness audit / dedup savings)
import nrsr_crawler_spark.entry_queries_r4l  # noqa: E402,F401

# round-5 wave (training-data funnel token ledger)
import nrsr_crawler_spark.entry_queries_r5  # noqa: E402,F401
