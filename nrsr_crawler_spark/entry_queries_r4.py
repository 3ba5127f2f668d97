"""Round-4 additive query battery — new first-class pipeline operators, each
hash-gated against a DuckDB oracle (registered into entry_queries.QUERIES /
ORACLES on import):

 - dedup_containment   asymmetric Broder containment (subset/quote dedup)
 - domain_rollup       eTLD+1 registrable-domain rollup (PSL semantics)
 - docs_dsir_sample    DSIR-style hashed-feature importance resampling
 - images_tile_neardup crop/re-encode-resistant tile-hash near-dup
 - link_hits lives in entry_queries_ext.py (same wave)

Oracle-portability follows the entry_queries_ml.py conventions: md5 as the
cross-engine hash, integer cross-multiplied thresholds, floor division
(Spark ``div`` == DuckDB ``//`` on non-negative ints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nrsr_crawler_spark.entry_queries import query
from nrsr_crawler_spark.entry_queries_ml import SHINGLES_CTE
from nrsr_crawler_spark.functions.urls import TWO_LEVEL_SUFFIXES, registrable_domain
from nrsr_crawler_spark.operators import dedup as D
from nrsr_crawler_spark.sources.tpch import load

# ---------------------------------------------------------------------------
# Containment dedup (operators/dedup.py containment_pairs): directed pairs
# where ≥30% of the shorter doc's trigram shingles appear in the other doc —
# the subset/quote-inclusion duplicates symmetric Jaccard misses.
# ---------------------------------------------------------------------------


@query(
    "dedup_containment",
    f"""
    WITH {SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
        FROM sh a JOIN sh b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    j AS (
        SELECT p.id_a, p.id_b, p.common, sa.n AS na, sb.n AS nb
        FROM pairs p JOIN sizes sa ON sa.doc_id = p.id_a JOIN sizes sb ON sb.doc_id = p.id_b
    )
    SELECT id_a AS contained_id, id_b AS container_id, common,
           na AS n_contained, nb AS n_container
    FROM j WHERE common * 100 >= na * 30
    UNION ALL
    SELECT id_b, id_a, common, nb, na FROM j WHERE common * 100 >= nb * 30
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.containment_pairs(
        load(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold_num=30, threshold_den=100
    )


# ---------------------------------------------------------------------------
# eTLD+1 registrable-domain rollup (functions/urls.py registrable_domain):
# per-SITE aggregation key for politeness budgets and corpus domain cards.
# Hosts synthesized from customer with engine-portable arithmetic: a mix of
# sub-domained hosts over 1- and 2-level public suffixes, IPv4 literals, and
# single-label hosts; the ORACLE implements the PSL logic generically over
# the host string (list ops), not the synthesis shortcut, so the two engines
# must agree on the suffix-selection branch itself.
# ---------------------------------------------------------------------------

_SUFFIX_SQL = ", ".join(f"'{s}'" for s in TWO_LEVEL_SUFFIXES)

_HOSTS_SQL = """
        SELECT CASE
            WHEN c_custkey % 97 = 0 THEN '10.1.' || (c_custkey % 200) || '.7'
            WHEN c_custkey % 89 = 0 THEN 'localhost'
            ELSE (CASE c_custkey % 4 WHEN 0 THEN 'www.' WHEN 1 THEN 'm.'
                                     WHEN 2 THEN 'static.' ELSE '' END)
                 || 'site' || (c_custkey % 40) || '.'
                 || (CASE c_custkey % 6 WHEN 0 THEN 'com' WHEN 1 THEN 'sk'
                     WHEN 2 THEN 'org' WHEN 3 THEN 'co.uk'
                     WHEN 4 THEN 'com.au' ELSE 'io' END)
        END AS host
        FROM customer
"""


@query(
    "domain_rollup",
    f"""
    WITH hosts AS ({_HOSTS_SQL}),
    rd AS (
        SELECT host,
               CASE
                 WHEN host IS NULL OR len(string_split(host, '.')) <= 1 THEN NULL
                 WHEN regexp_matches(host, '^[0-9]{{1,3}}(\\.[0-9]{{1,3}}){{3}}$') THEN host
                 WHEN len(string_split(host, '.')) >= 3
                      AND (string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1])
                          IN ({_SUFFIX_SQL})
                   THEN string_split(host, '.')[-3] || '.' || string_split(host, '.')[-2]
                        || '.' || string_split(host, '.')[-1]
                 ELSE string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1]
               END AS domain
        FROM hosts
    )
    SELECT domain, COUNT(*) AS n_urls, COUNT(DISTINCT host) AS n_hosts
    FROM rd GROUP BY domain
    """,
)
def domain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    sub = (
        F.when(k % 4 == 0, "www.")
        .when(k % 4 == 1, "m.")
        .when(k % 4 == 2, "static.")
        .otherwise("")
    )
    suffix = (
        F.when(k % 6 == 0, "com")
        .when(k % 6 == 1, "sk")
        .when(k % 6 == 2, "org")
        .when(k % 6 == 3, "co.uk")
        .when(k % 6 == 4, "com.au")
        .otherwise("io")
    )
    host = (
        F.when(k % 97 == 0, F.concat(F.lit("10.1."), (k % 200).cast("string"), F.lit(".7")))
        .when(k % 89 == 0, F.lit("localhost"))
        .otherwise(F.concat(sub, F.lit("site"), (k % 40).cast("string"), F.lit("."), suffix))
    )
    return (
        cust.select(host.alias("host"))
        .groupBy(registrable_domain(F.col("host")).alias("domain"))
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("host").alias("n_hosts"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (operators/sampling.py importance_weights,
# Xie et al. 2023): target corpus = the 'src0' source slice; every raw doc is
# scored by Σ_tokens ratio[md5-bucket(token)] with add-1-smoothed integer
# ratios, and the top-100 by length-normalized weight are kept.
# ---------------------------------------------------------------------------

_NIB4 = (
    "((strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 4096"
    " + (strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1) * 256"
    " + (strpos('0123456789abcdef', substr(md5(w), 3, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr(md5(w), 4, 1)) - 1))"
)


@query(
    "docs_dsir_sample",
    f"""
    WITH tok AS (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    tb AS (SELECT doc_id, source, {_NIB4} % 64 AS b FROM tok),
    rr AS (SELECT b, COUNT(*) AS rc FROM tb GROUP BY b),
    tt AS (SELECT b, COUNT(*) AS tc FROM tb WHERE source = 'src0' GROUP BY b),
    ratio AS (
        SELECT rr.b, (COALESCE(tt.tc, 0) + 1) * 1000000 // (rr.rc + 1) AS ratio
        FROM rr LEFT JOIN tt ON tt.b = rr.b
    ),
    sc AS (
        SELECT doc_id, COUNT(*) AS n_tokens, SUM(ratio) AS score
        FROM tb JOIN ratio USING (b) GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, CAST(score AS BIGINT) AS score,
           CAST(score // n_tokens AS BIGINT) AS avg_weight
    FROM sc ORDER BY avg_weight DESC, doc_id LIMIT 100
    """,
)
def docs_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators.sampling import importance_weights

    docs = load(spark, sf_dir, "documents")
    target = docs.filter(F.col("source") == "src0")
    w = importance_weights(docs, target, "doc_id", "text", n_buckets=64)
    return w.orderBy(F.col("avg_weight").desc(), F.col("doc_id")).limit(100)


# ---------------------------------------------------------------------------
# Tile-hash near-dup (operators/image_dedup.py tile_neardup_pairs): groups of
# 3 synthetic images — original / re-encode (one perturbed tile) / bottom-
# right crop (outer ring of tiles gone) — on a 4×4 origin-aligned tile grid;
# pairs sharing ≥9 coordinate-equal tile hashes survive.  The decode→tile
# Arrow kernel (tile_hashes) runs on real FIMG payloads in
# tests/test_image_dedup.py; this query oracle-gates the pair/bucket logic,
# exactly the images_phash_neardup precedent.
# ---------------------------------------------------------------------------

_TILES_SQL = """
        SELECT printf('img%06d', c_custkey) AS image_id, tr, tc,
               CASE WHEN (c_custkey - 1) % 3 = 1 AND tr = 0 AND tc = 0
                    THEN base_h + 1 ELSE base_h END AS tile_hash
        FROM (
            SELECT c_custkey, g.tr AS tr, h.tc AS tc,
                   ((((c_custkey - 1) // 3) * 16 + g.tr * 4 + h.tc) * 2654435761)
                       % 2147483648 AS base_h
            FROM customer, generate_series(0, 3) g(tr), generate_series(0, 3) h(tc)
            WHERE c_custkey BETWEEN 1 AND 1500
        )
        WHERE NOT ((c_custkey - 1) % 3 = 2 AND (tr = 3 OR tc = 3))
"""


@query(
    "images_tile_neardup",
    f"""
    WITH tiles AS ({_TILES_SQL})
    SELECT a.image_id AS id_a, b.image_id AS id_b, COUNT(*) AS n_match
    FROM tiles a JOIN tiles b
      ON a.tr = b.tr AND a.tc = b.tc AND a.tile_hash = b.tile_hash
     AND a.image_id < b.image_id
    GROUP BY a.image_id, b.image_id
    HAVING COUNT(*) >= 9
    """,
)
def images_tile_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators.image_dedup import tile_neardup_pairs

    cust = load(spark, sf_dir, "customer").filter(F.col("c_custkey").between(1, 1500))
    grid = spark.range(4).select(F.col("id").cast("int").alias("tr")).crossJoin(
        spark.range(4).select(F.col("id").cast("int").alias("tc"))
    )
    k = F.col("c_custkey")
    base_h = ((F.floor((k - 1) / 3) * 16 + F.col("tr") * 4 + F.col("tc")) * 2654435761) % 2147483648
    tiles = (
        cust.crossJoin(F.broadcast(grid))
        .filter(~(((k - 1) % 3 == 2) & ((F.col("tr") == 3) | (F.col("tc") == 3))))
        .select(
            F.format_string("img%06d", k).alias("image_id"),
            "tr",
            "tc",
            F.when(((k - 1) % 3 == 1) & (F.col("tr") == 0) & (F.col("tc") == 0), base_h + 1)
            .otherwise(base_h)
            .cast("long")
            .alias("tile_hash"),
        )
    )
    return tile_neardup_pairs(tiles, min_matching_tiles=9)


# ---------------------------------------------------------------------------
# Domain-level politeness budget (operators/politeness.py pop_budget keyed on
# functions/urls.py registrable_domain): all subdomains of a site share ONE
# per-epoch fetch budget — m.site.com, www.site.com, static.site.com can't
# triple-dip what robots politeness granted the SITE.  Same skew-proof
# two-level window as the per-host pop; the oracle derives the same top-5
# per eTLD+1 with a single naive window.
# ---------------------------------------------------------------------------


@query(
    "domain_budget_pop",
    f"""
    WITH hosts AS ({_HOSTS_SQL.replace("END AS host", "END AS host, c_custkey AS seq, c_custkey % 3 AS priority")}),
    rd AS (
        SELECT seq, priority,
               CASE
                 WHEN host IS NULL OR len(string_split(host, '.')) <= 1 THEN NULL
                 WHEN regexp_matches(host, '^[0-9]{{1,3}}(\\.[0-9]{{1,3}}){{3}}$') THEN host
                 WHEN len(string_split(host, '.')) >= 3
                      AND (string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1])
                          IN ({_SUFFIX_SQL})
                   THEN string_split(host, '.')[-3] || '.' || string_split(host, '.')[-2]
                        || '.' || string_split(host, '.')[-1]
                 ELSE string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1]
               END AS domain
        FROM hosts
    )
    SELECT domain, seq, priority, rk FROM (
        SELECT domain, seq, priority,
               ROW_NUMBER() OVER (PARTITION BY domain ORDER BY priority DESC, seq DESC) AS rk
        FROM rd
    ) WHERE rk <= 5
    """,
)
def domain_budget_pop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators.politeness import pop_budget

    cust = load(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    sub = (
        F.when(k % 4 == 0, "www.")
        .when(k % 4 == 1, "m.")
        .when(k % 4 == 2, "static.")
        .otherwise("")
    )
    suffix = (
        F.when(k % 6 == 0, "com")
        .when(k % 6 == 1, "sk")
        .when(k % 6 == 2, "org")
        .when(k % 6 == 3, "co.uk")
        .when(k % 6 == 4, "com.au")
        .otherwise("io")
    )
    host = (
        F.when(k % 97 == 0, F.concat(F.lit("10.1."), (k % 200).cast("string"), F.lit(".7")))
        .when(k % 89 == 0, F.lit("localhost"))
        .otherwise(F.concat(sub, F.lit("site"), (k % 40).cast("string"), F.lit("."), suffix))
    )
    frontier = cust.select(
        registrable_domain(host).alias("domain"),
        k.alias("seq"),
        (k % 3).cast("long").alias("priority"),
        F.xxhash64(k).alias("url_hash"),
    )
    popped = pop_budget(frontier, budget=5, host_col="domain")
    return popped.select("domain", "seq", "priority", "rk")


# ---------------------------------------------------------------------------
# BPE merge-pair counting (operators/text.py bpe_pair_counts, Sennrich et al.
# 2016): corpus-wide adjacent char-pair frequencies over word instances — the
# counting kernel a BPE tokenizer trainer loops on.  Top-50 by count with a
# lexicographic tie-break so the result is a deterministic TakeOrdered.
# ---------------------------------------------------------------------------


@query(
    "text_bpe_pairs",
    """
    WITH w AS (
        SELECT t.w FROM (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
        ) t WHERE len(t.w) >= 2
    ),
    pairs AS (
        SELECT substr(w, CAST(i AS INTEGER), 2) AS pair
        FROM w, UNNEST(generate_series(1, len(w) - 1)) AS g(i)
    )
    SELECT pair, COUNT(*) AS n FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT 50
    """,
)
def text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators.text import bpe_pair_counts

    counts = bpe_pair_counts(load(spark, sf_dir, "documents"), "doc_id", "text")
    return counts.orderBy(F.col("n").desc(), F.col("pair")).limit(50)
