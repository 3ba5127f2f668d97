"""Round-5 wave: end-to-end training-data funnel token ledger.

``train_token_ledger`` (VERDICT r4 next #7) composes the corpus through
exact dedup → quality gate → decontamination → mixture quota → packing
and emits the per-stage (docs, tokens) ledger — the one-table audit a
training run documents.  Every stage is an existing oracle-exact
primitive (operators/dedup, text, decontaminate, sampling, packing); the
oracle below is their CTE composition in exact integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nrsr_crawler_spark.entry_queries import query
from nrsr_crawler_spark.sources.tpch import load

# Same integer classifier as train_dataset_build (text.QUALITY_CLF_WEIGHTS)
_LOGIT = (
    "-60000 + 1 * mean_word_len_centi + 200 * n_tok "
    "- 8 * punct_bps + 40 * stopword_bps - 12 * upper_bps"
)

_LEDGER_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, lang, source, text,
               regexp_split_to_array(trim(text), '\\s+') AS tk
        FROM documents
    ),
    base AS (
        SELECT doc_id, lang, source, text,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
        FROM documents
    ),
    keep1 AS (
        SELECT MIN(doc_id) AS doc_id
        FROM (SELECT doc_id,
                     md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS f
              FROM documents)
        GROUP BY f
    ),
    s1 AS (SELECT b.* FROM base b JOIN keep1 USING (doc_id)),
    feats AS (
        SELECT doc_id,
               len(tk) AS n_tok,
               CAST(ROUND(LENGTH(regexp_replace(text, '\\s', '', 'g')) * 10000.0 / len(tk)) AS BIGINT) AS mean_word_len_centi,
               CAST(ROUND((LENGTH(text) - LENGTH(regexp_replace(text, '[.,;:!?]', '', 'g'))) * 10000.0 / LENGTH(text)) AS BIGINT) AS punct_bps,
               CAST(ROUND((LENGTH(text) - LENGTH(regexp_replace(text, '[A-Z]', '', 'g'))) * 10000.0 / LENGTH(text)) AS BIGINT) AS upper_bps,
               CAST(ROUND(len(list_filter(tk, t -> list_contains(['the','a','of','and','to','in','is','it'], lower(t)))) * 10000.0 / len(tk)) AS BIGINT) AS stopword_bps
        FROM toks
    ),
    keepq AS (SELECT doc_id FROM feats WHERE ({_LOGIT}) >= 0),
    s2 AS (SELECT s1.* FROM s1 JOIN keepq USING (doc_id)),
    evalg AS (
        SELECT DISTINCT md5(array_to_string(tk[i:i+7], ' ')) AS gkey
        FROM toks, UNNEST(CASE WHEN len(tk) >= 8 THEN range(1, len(tk) - 6) ELSE [] END) AS u(i)
        WHERE doc_id % 20 = 0
    ),
    contam AS (
        SELECT DISTINCT t.doc_id
        FROM toks t,
             UNNEST(CASE WHEN len(t.tk) >= 8 THEN range(1, len(t.tk) - 6) ELSE [] END) AS u(i)
        JOIN evalg e ON md5(array_to_string(t.tk[i:i+7], ' ')) = e.gkey
    ),
    s3 AS (
        SELECT * FROM s2
        WHERE doc_id % 20 <> 0
          AND doc_id NOT IN (SELECT doc_id FROM contam)
    ),
    cq AS (SELECT lang, COUNT(*) AS n_stratum FROM s3 GROUP BY lang),
    wq AS (SELECT lang, CAST(round(sqrt(n_stratum) * 1000000) AS BIGINT) AS w FROM cq),
    tq AS (SELECT SUM(w) AS tot FROM wq),
    qq AS (SELECT lang, CAST((200 * w) // tot AS BIGINT) AS quota FROM wq, tq),
    rq AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR))) AS pick_rank
        FROM s3
    ),
    s4 AS (
        SELECT s3.* FROM s3
        JOIN rq USING (doc_id, lang)
        JOIN qq USING (lang)
        WHERE pick_rank <= quota
    ),
    psrc AS (SELECT source, SUM(n_tokens) AS t FROM s4 GROUP BY source),
    pk AS (
        SELECT CAST(COALESCE(SUM((t + 511) // 512), 0) AS BIGINT) AS n_seqs,
               CAST(COALESCE(SUM(((t + 511) // 512) * 512 - t), 0) AS BIGINT) AS pad_tokens
        FROM psrc
    ),
    m0 AS (SELECT COUNT(*) AS d, CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS t FROM base),
    m1 AS (SELECT COUNT(*) AS d, CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS t FROM s1),
    m2 AS (SELECT COUNT(*) AS d, CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS t FROM s2),
    m3 AS (SELECT COUNT(*) AS d, CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS t FROM s3),
    m4 AS (SELECT COUNT(*) AS d, CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS t FROM s4)
    SELECT CAST(1 AS BIGINT) AS stage_idx, 'exact_dedup' AS stage,
           m0.d AS docs_in, m1.d AS docs_kept, m0.t AS tokens_in, m1.t AS tokens_kept,
           CAST(0 AS BIGINT) AS n_seqs, CAST(0 AS BIGINT) AS pad_tokens
    FROM m0, m1
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'quality_gate', m1.d, m2.d, m1.t, m2.t,
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    FROM m1, m2
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'decontaminate', m2.d, m3.d, m2.t, m3.t,
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    FROM m2, m3
    UNION ALL
    SELECT CAST(4 AS BIGINT), 'mixture_quota', m3.d, m4.d, m3.t, m4.t,
           CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    FROM m3, m4
    UNION ALL
    SELECT CAST(5 AS BIGINT), 'packing', m4.d, m4.d, m4.t, m4.t,
           pk.n_seqs, pk.pad_tokens
    FROM m4, pk
"""


@query("train_token_ledger", _LEDGER_ORACLE)
def train_token_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data funnel as one auditable plan: dedup → quality
    gate → decontamination → mixture quota → packing, per-stage token
    ledger (operators/token_ledger.py)."""
    from nrsr_crawler_spark.operators.token_ledger import token_ledger

    return token_ledger(load(spark, sf_dir, "documents"))


# -- round-5 wave B: crawl-scheduling telemetry & layout operators ------------
#
# frontier_fairness        Jain fairness index over per-host scheduled counts
# frontier_budget_pop      byte-budget greedy pop (rank-cap + bounded cumsum)
# recrawl_revalidation_plan  conditional-GET strategy per recrawl candidate
# frontier_shard_resize    rendezvous shard assignment, N -> 4N move audit

from pyspark.sql import functions as F  # noqa: E402


@query(
    "frontier_fairness",
    """
    WITH s AS (
        SELECT 'h' || (l_orderkey % (1 + (l_suppkey % 50))) AS host FROM lineitem
    ),
    p AS (SELECT host, COUNT(*) AS x FROM s GROUP BY host)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_hosts,
           CAST(SUM(x) AS BIGINT) AS n_scheduled,
           CAST((SUM(x) * SUM(x) * 10000) // (COUNT(*) * SUM(x * x)) AS BIGINT) AS jain_bps,
           CAST((MAX(x) * 10000) // SUM(x) AS BIGINT) AS max_share_bps,
           CAST((MIN(x) * 10000) // SUM(x) AS BIGINT) AS min_share_bps
    FROM p
    """,
)
def frontier_fairness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jain's fairness index over a skewed synthetic epoch schedule
    (operators/fairness.py) — the per-epoch tail-service regression signal
    for the multi-host frontier."""
    from nrsr_crawler_spark.operators.fairness import scheduling_fairness

    li = load(spark, sf_dir, "lineitem")
    sched = li.select(
        F.concat(
            F.lit("h"),
            (F.col("l_orderkey") % (1 + (F.col("l_suppkey") % 50))).cast("string"),
        ).alias("host")
    )
    return scheduling_fairness(sched)


@query(
    "frontier_budget_pop",
    """
    WITH f AS (
        SELECT 'h' || (o_custkey % 23) AS host,
               o_orderkey % 5 AS priority,
               o_orderkey AS seq,
               o_orderkey AS url_hash,
               (o_orderkey % 9000) + 500 AS est_cost_bytes
        FROM orders
    ),
    r AS (
        SELECT *, row_number() OVER (
                   PARTITION BY host
                   ORDER BY priority DESC, seq DESC, url_hash) AS rk
        FROM f
    ),
    c AS (SELECT * FROM r WHERE rk <= 100),
    m AS (
        SELECT *, SUM(est_cost_bytes) OVER (
                   PARTITION BY host
                   ORDER BY priority DESC, seq DESC, url_hash
                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM c
    )
    SELECT host, CAST(priority AS BIGINT) AS priority, seq, url_hash,
           CAST(est_cost_bytes AS BIGINT) AS est_cost_bytes,
           CAST(rk AS BIGINT) AS rk,
           CAST(cum AS BIGINT) AS cum_cost_bytes,
           cum <= 50000 AS taken
    FROM m
    """,
)
def frontier_budget_pop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-budget greedy pop (operators/cost_budget.py): top-100 rank cap
    per host, then first-fit under a 50 kB per-host byte budget."""
    from nrsr_crawler_spark.operators.cost_budget import budget_value_pop

    o = load(spark, sf_dir, "orders")
    fr = o.select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 23).cast("string")).alias("host"),
        (F.col("o_orderkey") % 5).cast("long").alias("priority"),
        F.col("o_orderkey").alias("seq"),
        F.col("o_orderkey").alias("url_hash"),
        ((F.col("o_orderkey") % 9000) + 500).cast("long").alias("est_cost_bytes"),
    )
    out = budget_value_pop(fr, byte_budget=50000, max_candidates=100)
    return out.select(
        "host", "priority", "seq", "url_hash", "est_cost_bytes",
        F.col("rk").cast("long").alias("rk"), "cum_cost_bytes", "taken",
    )


@query(
    "recrawl_revalidation_plan",
    """
    WITH c AS (
        SELECT o_orderkey AS url_hash,
               o_orderkey % 6 AS age_epochs,
               1 + (o_custkey % 7) AS fetch_count,
               o_orderkey % 3 AS change_count,
               (o_orderkey % 2) = 0 AS has_validator,
               1000 + (o_orderkey % 50000) AS size_bytes
        FROM orders
    ),
    p AS (
        SELECT *, CAST((change_count * 10000) // fetch_count AS BIGINT) AS change_bps
        FROM c
    )
    SELECT url_hash, CAST(age_epochs AS BIGINT) AS age_epochs,
           CAST(fetch_count AS BIGINT) AS fetch_count,
           CAST(change_count AS BIGINT) AS change_count,
           has_validator, CAST(size_bytes AS BIGINT) AS size_bytes,
           change_bps,
           CASE WHEN age_epochs < 2 THEN 'skip'
                WHEN has_validator AND change_bps < 2000 THEN 'revalidate'
                ELSE 'refetch' END AS action,
           CAST(CASE WHEN age_epochs >= 2 AND has_validator AND change_bps < 2000
                     THEN GREATEST(size_bytes - 600, 0) ELSE 0 END AS BIGINT)
               AS est_saved_bytes
    FROM p
    """,
)
def recrawl_revalidation_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-GET strategy per recrawl candidate
    (operators/revalidate.py): skip / revalidate / refetch plus the
    projected bandwidth saving — pure codegen scan, zero shuffle."""
    from nrsr_crawler_spark.operators.revalidate import revalidation_plan

    o = load(spark, sf_dir, "orders")
    cand = o.select(
        F.col("o_orderkey").alias("url_hash"),
        (F.col("o_orderkey") % 6).cast("long").alias("age_epochs"),
        (1 + (F.col("o_custkey") % 7)).cast("long").alias("fetch_count"),
        (F.col("o_orderkey") % 3).cast("long").alias("change_count"),
        ((F.col("o_orderkey") % 2) == 0).alias("has_validator"),
        (1000 + (F.col("o_orderkey") % 50000)).cast("long").alias("size_bytes"),
    )
    return revalidation_plan(cand)


@query(
    "frontier_shard_resize",
    """
    WITH hosts AS (
        SELECT DISTINCT 'host' || (c_custkey % 500) AS host FROM customer
    ),
    e1 AS (
        SELECT host, s, substring(md5(host || ':' || CAST(s AS VARCHAR)), 1, 12) AS w
        FROM hosts, UNNEST(range(8)) AS u(s)
    ),
    a1 AS (SELECT host, CAST(arg_max(s, w) AS BIGINT) AS shard_small FROM e1 GROUP BY host),
    e2 AS (
        SELECT host, s, substring(md5(host || ':' || CAST(s AS VARCHAR)), 1, 12) AS w
        FROM hosts, UNNEST(range(32)) AS u(s)
    ),
    a2 AS (SELECT host, CAST(arg_max(s, w) AS BIGINT) AS shard_large FROM e2 GROUP BY host)
    SELECT host, shard_small, shard_large, shard_small <> shard_large AS moved
    FROM a1 JOIN a2 USING (host)
    """,
)
def frontier_shard_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous shard assignment of per-host frontier state at 8 and 32
    shards with the move audit (operators/shard_assign.py) — hosts only
    ever move INTO new shards on a 4x resize, the layout property that
    makes the N -> 4N scale-up cheap."""
    from nrsr_crawler_spark.operators.shard_assign import resize_plan

    hosts = (
        load(spark, sf_dir, "customer")
        .select(
            F.concat(F.lit("host"), (F.col("c_custkey") % 500).cast("string")).alias(
                "host"
            )
        )
        .distinct()
    )
    return resize_plan(hosts, n_shards=8, growth=4)


# -- round-5 wave C: image-payload curation + recrawl telemetry ---------------
#
# images_caption_conflicts  canonical-caption election per visual dup group
# images_crop_plan          deterministic random-resized-crop schedule
# frontier_age_histogram    staleness buckets + cumulative share (TTL input)
# robots_coverage_audit     per-host blocked share of the pending frontier


def _hex4(key_sql: str, i: int) -> str:
    """DuckDB mirror of crop_plan._hex_slice: i-th md5 4-hex-char draw."""
    return f"CAST(('0x' || substr(md5({key_sql}), {1 + 4 * i}, 4)) AS BIGINT)"


@query(
    "images_caption_conflicts",
    """
    WITH imgs AS (
        SELECT printf('img%010d', c_custkey) AS image_id,
               c_custkey % 37 AS phash,
               CASE WHEN c_custkey % 2 = 0 THEN 'even ' || (c_custkey % 5)
                    ELSE 'odd ' || (c_custkey % 5) END AS caption
        FROM customer WHERE c_custkey <= 300
    ),
    r AS (
        SELECT *, row_number() OVER (
                   PARTITION BY phash
                   ORDER BY md5(caption), caption, image_id) AS rn
        FROM imgs
    ),
    agg AS (
        SELECT phash, COUNT(*) AS n_images, COUNT(DISTINCT caption) AS n_captions
        FROM imgs GROUP BY phash
    )
    SELECT CAST(a.phash AS BIGINT) AS phash,
           CAST(n_images AS BIGINT) AS n_images,
           CAST(n_captions AS BIGINT) AS n_captions,
           r.caption AS canonical_caption,
           r.image_id AS keeper_id,
           n_captions > 1 AS conflict
    FROM agg a JOIN r ON r.phash = a.phash AND r.rn = 1
    """,
)
def images_caption_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-caption election over visual near-dup groups
    (operators/caption_conflicts.py): md5-min caption wins, one map-side
    combinable groupBy, conflicts surfaced as telemetry."""
    from nrsr_crawler_spark.operators.caption_conflicts import caption_conflicts

    imgs = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 300)
        .select(
            F.format_string("img%010d", F.col("c_custkey")).alias("image_id"),
            (F.col("c_custkey") % 37).cast("long").alias("phash"),
            F.when(
                F.col("c_custkey") % 2 == 0,
                F.concat(F.lit("even "), (F.col("c_custkey") % 5).cast("string")),
            )
            .otherwise(
                F.concat(F.lit("odd "), (F.col("c_custkey") % 5).cast("string"))
            )
            .alias("caption"),
        )
    )
    return caption_conflicts(imgs)


_CROP_KEY = "image_id || ':' || CAST(epoch AS VARCHAR)"

@query(
    "images_crop_plan",
    f"""
    WITH imgs AS (
        SELECT printf('img%010d', c_custkey) AS image_id,
               64 + (c_custkey % 9) * 16 AS w,
               64 + (c_custkey % 7) * 16 AS h
        FROM customer WHERE c_custkey <= 250
    ),
    ep AS (
        SELECT image_id, w, h, e AS epoch
        FROM imgs, UNNEST(range(4)) AS u(e)
    ),
    d AS (
        SELECT image_id, epoch, w, h,
               (w * (70 + {_hex4(_CROP_KEY, 0)} % 31)) // 100 AS crop_w,
               (h * (70 + {_hex4(_CROP_KEY, 1)} % 31)) // 100 AS crop_h,
               {_hex4(_CROP_KEY, 2)} AS u2,
               {_hex4(_CROP_KEY, 3)} AS u3
        FROM ep
    )
    SELECT image_id, CAST(epoch AS BIGINT) AS epoch,
           CAST(crop_w AS BIGINT) AS crop_w, CAST(crop_h AS BIGINT) AS crop_h,
           CAST(u2 % (w - crop_w + 1) AS BIGINT) AS x0,
           CAST(u3 % (h - crop_h + 1) AS BIGINT) AS y0
    FROM d
    """,
)
def images_crop_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic random-resized-crop schedule (operators/crop_plan.py):
    4 training epochs, crop fractions in [70%, 100%] per axis from
    md5(image_id:epoch) draws — zero shuffle, fully replayable."""
    from nrsr_crawler_spark.operators.crop_plan import crop_plan

    imgs = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 250)
        .select(
            F.format_string("img%010d", F.col("c_custkey")).alias("image_id"),
            (64 + (F.col("c_custkey") % 9) * 16).cast("long").alias("w"),
            (64 + (F.col("c_custkey") % 7) * 16).cast("long").alias("h"),
        )
    )
    return crop_plan(imgs, n_epochs=4)


@query(
    "frontier_age_histogram",
    """
    WITH f AS (SELECT o_orderkey % 47 AS age FROM orders),
    hist AS (SELECT age // 10 AS bucket, COUNT(*) AS n_urls FROM f GROUP BY 1),
    t AS (SELECT SUM(n_urls) AS total FROM hist),
    c AS (
        SELECT bucket, n_urls,
               SUM(n_urls) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum
        FROM hist
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(bucket * 10 AS BIGINT) AS lo,
           CAST(bucket * 10 + 9 AS BIGINT) AS hi,
           CAST(n_urls AS BIGINT) AS n_urls,
           CAST((n_urls * 10000) // total AS BIGINT) AS share_bps,
           CAST((cum * 10000) // total AS BIGINT) AS cum_share_bps
    FROM c, t
    """,
)
def frontier_age_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staleness buckets over last-fetch ages (operators/staleness.py) —
    the input distribution for choosing a recrawl TTL; windows run over
    the bounded bucket table only."""
    from nrsr_crawler_spark.operators.staleness import staleness_histogram

    fr = load(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 47).cast("long").alias("age_epochs")
    )
    return staleness_histogram(fr, width=10)


_AUDIT_RULES = [
    {"host": "www.nrsr.sk", "user_agent": "*", "rule": "disallow",
     "path_prefix": "/private/", "crawl_delay": None},
    {"host": "www.nrsr.sk", "user_agent": "*", "rule": "allow",
     "path_prefix": "/private/open/", "crawl_delay": None},
    {"host": "static.nrsr.sk", "user_agent": "*", "rule": "disallow",
     "path_prefix": "/", "crawl_delay": None},
]


@query(
    "robots_coverage_audit",
    """
    WITH f AS (
        SELECT CASE WHEN l_linenumber % 3 = 0 THEN 'static.nrsr.sk'
                    ELSE 'www.nrsr.sk' END AS host,
               CASE l_orderkey % 4
                    WHEN 0 THEN '/private/doc' || l_orderkey
                    WHEN 1 THEN '/private/open/doc' || l_orderkey
                    ELSE '/web/doc' || l_orderkey END AS path
        FROM lineitem
    ),
    dec AS (
        SELECT host,
               CASE WHEN host = 'static.nrsr.sk' THEN FALSE
                    WHEN path LIKE '/private/open/%' THEN TRUE
                    WHEN path LIKE '/private/%' THEN FALSE
                    ELSE TRUE END AS ok
        FROM f
    ),
    per AS (
        SELECT host, COUNT(*) AS n_urls,
               SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS n_allowed
        FROM dec GROUP BY host
    )
    SELECT host, CAST(n_urls AS BIGINT) AS n_urls,
           CAST(n_allowed AS BIGINT) AS n_allowed,
           CAST(n_urls - n_allowed AS BIGINT) AS n_blocked,
           CAST(((n_urls - n_allowed) * 10000) // n_urls AS BIGINT) AS blocked_bps
    FROM per
    """,
)
def robots_coverage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host blocked share of the pending frontier under the live
    ruleset (operators/compliance.py robots_coverage) — longest-prefix
    allow-over-disallow semantics via robots.allowed_expr, folded into one
    partial-agg groupBy."""
    from nrsr_crawler_spark.operators.compliance import robots_coverage

    li = load(spark, sf_dir, "lineitem")
    cand = li.select(
        F.when(F.col("l_linenumber") % 3 == 0, F.lit("static.nrsr.sk"))
        .otherwise(F.lit("www.nrsr.sk"))
        .alias("host"),
        F.concat(
            F.lit("https://"),
            F.when(F.col("l_linenumber") % 3 == 0, F.lit("static.nrsr.sk"))
            .otherwise(F.lit("www.nrsr.sk")),
            F.when(F.col("l_orderkey") % 4 == 0,
                   F.concat(F.lit("/private/doc"), F.col("l_orderkey").cast("string")))
            .when(F.col("l_orderkey") % 4 == 1,
                  F.concat(F.lit("/private/open/doc"), F.col("l_orderkey").cast("string")))
            .otherwise(
                F.concat(F.lit("/web/doc"), F.col("l_orderkey").cast("string"))),
        ).alias("url"),
    )
    return robots_coverage(cand, _AUDIT_RULES)


# -- round-5 wave D: frontier physical-layout planning ------------------------
#
# frontier_salt_plan       adaptive per-host salt counts for the pop windows
# seen_segment_occupancy   per-segment seen-set load vs uniform expectation


@query(
    "frontier_salt_plan",
    """
    WITH f AS (
        SELECT 'h' || (l_orderkey % (1 + (l_suppkey % 40))) AS host FROM lineitem
    ),
    per AS (SELECT host, COUNT(*) AS n_pending FROM f GROUP BY host),
    s AS (
        SELECT host, n_pending,
               LEAST(64, GREATEST(1, (n_pending + 999) // 1000)) AS salts
        FROM per
    )
    SELECT host, CAST(n_pending AS BIGINT) AS n_pending,
           CAST(salts AS BIGINT) AS salts,
           CAST((n_pending + salts - 1) // salts AS BIGINT) AS rows_per_task
    FROM s
    """,
)
def frontier_salt_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive per-host salt plan (operators/salt_advisor.py): hot hosts
    split into up to 64 level-1 pop buckets of ~1000 rows each, cold hosts
    stay single-bucket — the per-epoch task-size planner for the skewed
    multi-host frontier."""
    from nrsr_crawler_spark.operators.salt_advisor import salt_plan

    li = load(spark, sf_dir, "lineitem")
    pend = li.select(
        F.concat(
            F.lit("h"),
            (F.col("l_orderkey") % (1 + (F.col("l_suppkey") % 40))).cast("string"),
        ).alias("host")
    )
    return salt_plan(pend, target_rows_per_task=1000, max_salts=64)


@query(
    "seen_segment_occupancy",
    """
    WITH seen AS (
        SELECT CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12)) AS BIGINT)
                   AS url_hash
        FROM orders
    ),
    per AS (
        SELECT url_hash % 16 AS segment_id, COUNT(*) AS n_keys
        FROM seen GROUP BY 1
    ),
    t AS (SELECT SUM(n_keys) AS total FROM per)
    SELECT CAST(segment_id AS BIGINT) AS segment_id,
           CAST(n_keys AS BIGINT) AS n_keys,
           CAST((n_keys * 10000) // total AS BIGINT) AS share_bps,
           CAST((n_keys * 16 * 10000) // total AS BIGINT) AS load_bps
    FROM per, t
    """,
)
def seen_segment_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment seen-set occupancy vs uniform expectation
    (operators/segment_stats.py) — the bitset-sizing health check for the
    16-segment partitioned URL-seen store."""
    from nrsr_crawler_spark.operators.segment_stats import segment_occupancy

    seen = load(spark, sf_dir, "orders").select(
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 12), 16, 10)
        .cast("long")
        .alias("url_hash")
    )
    return segment_occupancy(seen, n_segments=16)


# -- round-5 wave E: tail consolidation, storage tiers, cohort retention ------


@query(
    "frontier_task_bins",
    """
    WITH f AS (SELECT 'h' || (l_orderkey % 997) AS host FROM lineitem),
    per AS (SELECT host, COUNT(*) AS n_pending FROM f GROUP BY host),
    c AS (
        SELECT host, n_pending,
               SUM(n_pending) OVER (ORDER BY md5(host), host
                                    ROWS UNBOUNDED PRECEDING) - n_pending AS cum_lo
        FROM per
    )
    SELECT host, CAST(n_pending AS BIGINT) AS n_pending,
           CAST(cum_lo AS BIGINT) AS cum_lo,
           CAST(cum_lo // 500 AS BIGINT) AS bin_id
    FROM c
    """,
)
def frontier_task_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-host tail consolidation (operators/task_bins.py): per-host
    pending counts packed into ~500-URL scheduling bins over the
    deterministic (md5(host), host) order via the two-level prefix sum."""
    from nrsr_crawler_spark.operators.task_bins import host_task_bins

    li = load(spark, sf_dir, "lineitem")
    pend = li.select(
        F.concat(F.lit("h"), (F.col("l_orderkey") % 997).cast("string")).alias("host")
    )
    return host_task_bins(pend, bin_size=500)


@query(
    "images_storage_tiers",
    """
    WITH o AS (
        SELECT 'img' || o_orderkey AS object_id,
               1000 + (o_orderkey % 100000) AS size_bytes,
               o_orderkey % 90 AS age_epochs,
               o_custkey % 6 AS access_count
        FROM orders
    ),
    a AS (
        SELECT *, CASE WHEN age_epochs < 7 THEN 'hot'
                       WHEN age_epochs < 60 OR access_count >= 4 THEN 'warm'
                       ELSE 'cold' END AS tier
        FROM o
    ),
    per AS (
        SELECT tier, COUNT(*) AS n_objects, SUM(size_bytes) AS total_bytes
        FROM a GROUP BY tier
    ),
    t AS (SELECT SUM(total_bytes) AS tt FROM per)
    SELECT tier, CAST(n_objects AS BIGINT) AS n_objects,
           CAST(total_bytes AS BIGINT) AS total_bytes,
           CAST((total_bytes * 10000) // tt AS BIGINT) AS share_bps
    FROM per, t
    """,
)
def images_storage_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot/warm/cold lake-tier plan for the image corpus
    (operators/storage_tiers.py): codegen CASE assignment + one
    partial-agg rollup with byte shares in exact bps."""
    from nrsr_crawler_spark.operators.storage_tiers import tier_assign, tier_totals

    o = load(spark, sf_dir, "orders")
    objs = o.select(
        F.concat(F.lit("img"), F.col("o_orderkey").cast("string")).alias("object_id"),
        (1000 + (F.col("o_orderkey") % 100000)).cast("long").alias("size_bytes"),
        (F.col("o_orderkey") % 90).cast("long").alias("age_epochs"),
        (F.col("o_custkey") % 6).cast("long").alias("access_count"),
    )
    return tier_totals(tier_assign(objs))


@query(
    "events_retention_cohorts",
    """
    WITH e AS (
        SELECT user_id, epoch_us(ts) // 604800000000 AS p FROM events
    ),
    first AS (SELECT user_id, MIN(p) AS cohort FROM e GROUP BY user_id),
    act AS (SELECT DISTINCT user_id, p FROM e),
    per AS (
        SELECT cohort, p - cohort AS "offset", COUNT(DISTINCT a.user_id) AS n_active
        FROM act a JOIN first USING (user_id)
        GROUP BY cohort, p - cohort
    ),
    sizes AS (SELECT cohort, COUNT(*) AS cohort_size FROM first GROUP BY cohort)
    SELECT CAST(cohort AS BIGINT) AS cohort, CAST("offset" AS BIGINT) AS "offset",
           CAST(n_active AS BIGINT) AS n_active,
           CAST(cohort_size AS BIGINT) AS cohort_size,
           CAST((n_active * 10000) // cohort_size AS BIGINT) AS retention_bps
    FROM per JOIN sizes USING (cohort)
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix over the event stream
    (operators/retention.py) — the source-decay telemetry shape (hosts ×
    fetch epochs) expressed on the events table."""
    from nrsr_crawler_spark.operators.retention import retention_cohorts

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp)) div 604800000000").alias("week"),
    )
    return retention_cohorts(ev, "user_id", "week")
