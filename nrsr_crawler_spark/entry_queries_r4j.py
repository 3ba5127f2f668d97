"""Round-4 wave J query battery — short-string dedup + corpus/frontier
profiling, hash-gated against DuckDB oracles (registered into
entry_queries.QUERIES / ORACLES on import):

 - dedup_title_edit        blocked Levenshtein near-dup pairs over titles
                           (operators/edit_dedup.py)
 - text_stopword_induction per-language stopword lists by document
                           frequency (operators/stopwords.py)
 - frontier_depth_profile  per-host path-depth × query histogram
                           (operators/url_profile.py)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nrsr_crawler_spark.entry_queries import query
from nrsr_crawler_spark.operators.edit_dedup import edit_neardup_pairs
from nrsr_crawler_spark.operators.stopwords import induce_stopwords
from nrsr_crawler_spark.operators.url_profile import depth_profile
from nrsr_crawler_spark.sources.tpch import load

# ---------------------------------------------------------------------------
# Edit-distance dedup over synthesized titles: groups of 3 variants on a
# fixed-width base ("", "a", " rev B") — only the 1-edit pair clears the
# ≤2 threshold inside a group, and adjacent groups sharing a 12-char
# prefix contribute legitimate 1-edit cross pairs.  Both engines run the
# same Levenshtein DP.
# ---------------------------------------------------------------------------


@query(
    "dedup_title_edit",
    """
    WITH t AS (
        SELECT p_partkey AS id,
               'Record ' || (p_partkey // 3 + 100000)
               || (CASE p_partkey % 3 WHEN 0 THEN '' WHEN 1 THEN 'a'
                   ELSE ' rev B' END) AS title
        FROM part
    ),
    k AS (SELECT id, title, substr(title, 1, 12) AS blk FROM t),
    s AS (SELECT blk FROM k GROUP BY blk HAVING COUNT(*) <= 64),
    c AS (SELECT k.id, k.title, k.blk FROM k JOIN s USING (blk))
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(levenshtein(a.title, b.title) AS INTEGER) AS edits
    FROM c a JOIN c b ON a.blk = b.blk AND a.id < b.id
    WHERE levenshtein(a.title, b.title) <= 2
    """,
)
def dedup_title_edit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    k = F.col("p_partkey")
    titles = part.select(
        k.alias("id"),
        F.concat(
            F.lit("Record "),
            (F.expr("p_partkey div 3") + 100000).cast("string"),
            F.when(k % 3 == 0, F.lit(""))
            .when(k % 3 == 1, F.lit("a"))
            .otherwise(F.lit(" rev B")),
        ).alias("title"),
    )
    return edit_neardup_pairs(
        titles, "id", "title", max_edits=2, prefix_len=12, max_block=64
    )


# ---------------------------------------------------------------------------
# Stopword induction over the documents table: top-20 per language with a
# ≥20% document-frequency floor.
# ---------------------------------------------------------------------------


@query(
    "text_stopword_induction",
    """
    WITH per_doc AS (
        SELECT lang, doc_id, term FROM (
            SELECT lang, doc_id,
                   UNNEST(list_distinct(
                       regexp_split_to_array(trim(lower(text)), '\\s+'))) AS term
            FROM documents
        ) WHERE term <> ''
    ),
    dfreq AS (SELECT lang, term, COUNT(*) AS df FROM per_doc GROUP BY lang, term),
    tot AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    scored AS (
        SELECT d.lang, d.term, CAST(d.df AS BIGINT) AS df,
               CAST(d.df * 10000 // t.n AS BIGINT) AS df_bps
        FROM dfreq d JOIN tot t USING (lang)
    )
    SELECT lang, term, df, df_bps, CAST(rank AS INTEGER) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY lang ORDER BY df DESC, term) AS rank
        FROM scored WHERE df_bps >= 2000
    ) WHERE rank <= 20
    """,
)
def text_stopword_induction(spark: SparkSession, sf_dir: str) -> DataFrame:
    return induce_stopwords(
        load(spark, sf_dir, "documents"), "doc_id", "text", "lang", k=20, min_df_bps=2000
    )


# ---------------------------------------------------------------------------
# Frontier depth profile over synthesized URLs (7 hosts × depths 0–3 ×
# with/without query strings); the operator derives host/depth/query from
# the URL STRING, and the oracle replays the same string logic.
# ---------------------------------------------------------------------------


@query(
    "frontier_depth_profile",
    """
    WITH u AS (
        SELECT 'https://h' || (o_orderkey % 7) || '.nrsr.sk'
               || repeat('/dir', CAST(o_orderkey % 4 AS INTEGER))
               || (CASE WHEN o_orderkey % 3 = 0
                        THEN '?page=' || o_orderkey ELSE '' END) AS url
        FROM orders
    ),
    shaped AS (
        SELECT regexp_extract(regexp_replace(url, '^https?://', ''), '^([^/?]*)', 1) AS host,
               CAST(length(p) - length(replace(p, '/', '')) AS BIGINT) AS depth,
               contains(url, '?') AS has_query
        FROM (SELECT url,
                     regexp_replace(regexp_replace(regexp_replace(url, '^https?://', ''),
                                                   '^[^/?]*', ''),
                                    '\\?.*$', '') AS p
              FROM u)
    ),
    cells AS (
        SELECT host, depth, has_query, CAST(COUNT(*) AS BIGINT) AS n_urls
        FROM shaped GROUP BY host, depth, has_query
    ),
    tot AS (SELECT host, SUM(n_urls) AS _tot FROM cells GROUP BY host)
    SELECT c.host, c.depth, c.has_query, c.n_urls,
           CAST(c.n_urls * 10000 // t._tot AS BIGINT) AS share_bps
    FROM cells c JOIN tot t USING (host)
    """,
)
def frontier_depth_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    urls = orders.select(
        F.concat(
            F.lit("https://h"),
            (k % 7).cast("string"),
            F.lit(".nrsr.sk"),
            F.expr("repeat('/dir', CAST(o_orderkey % 4 AS INT))"),
            F.when(
                k % 3 == 0, F.concat(F.lit("?page="), k.cast("string"))
            ).otherwise(F.lit("")),
        ).alias("url")
    )
    return depth_profile(urls, "url")
