"""Round-4 wave I query battery — pipeline telemetry + rank fusion,
hash-gated against DuckDB oracles (registered into entry_queries.QUERIES /
ORACLES on import):

 - seen_bloom_calibration  exact Bloom-filter FPR/occupancy simulation on
                           a labeled URL sample (operators/bloom_sim.py)
 - corpus_lang_drift       per-language mixture drift between two corpus
                           snapshots (operators/drift.py)
 - text_rrf_fusion         reciprocal-rank fusion of two top-k document
                           rankings (operators/fusion.py)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nrsr_crawler_spark.entry_queries import query
from nrsr_crawler_spark.operators.bloom_sim import bloom_calibration
from nrsr_crawler_spark.operators.drift import mixture_drift
from nrsr_crawler_spark.operators.fusion import rrf_fuse
from nrsr_crawler_spark.sources.tpch import load

# ---------------------------------------------------------------------------
# Bloom calibration: even order keys inserted, odd keys probed (disjoint by
# construction, so every probe hit is a false positive).  m = 65536 bits,
# k = 4 md5-slice hashes — ~2.9 bits/URL at sf0.01, occupancy ~35%, FPR a
# couple of percent: every output column is non-degenerate.
# ---------------------------------------------------------------------------

_BLOOM_POS = ", ".join(
    f"CAST(('0x' || substr(md5(url), {1 + 4 * i}, 4)) AS BIGINT) % 65536"
    for i in range(4)
)


@query(
    "seen_bloom_calibration",
    f"""
    WITH u AS (
        SELECT 'https://www.nrsr.sk/p/' || o_orderkey AS url,
               o_orderkey % 2 = 0 AS ins
        FROM orders
    ),
    pos AS (SELECT url, ins, UNNEST([{_BLOOM_POS}]) AS pos FROM u),
    bits AS (SELECT DISTINCT pos FROM pos WHERE ins),
    pp AS (SELECT url, pos FROM pos WHERE NOT ins),
    per AS (
        SELECT p.url, COUNT(DISTINCT p.pos) AS n_pos,
               COUNT(DISTINCT CASE WHEN b.pos IS NOT NULL THEN p.pos END) AS n_hit
        FROM pp p LEFT JOIN bits b ON p.pos = b.pos GROUP BY p.url
    ),
    ps AS (SELECT COUNT(*) AS n_probes,
                  SUM(CASE WHEN n_hit = n_pos THEN 1 ELSE 0 END) AS n_fp
           FROM per),
    bs AS (SELECT COUNT(*) AS n_bits_set FROM bits)
    SELECT CAST(65536 AS BIGINT) AS m, CAST(4 AS BIGINT) AS k,
           CAST(n_bits_set AS BIGINT) AS n_bits_set,
           CAST(n_bits_set * 10000 // 65536 AS BIGINT) AS occupancy_bps,
           CAST(n_probes AS BIGINT) AS n_probes, CAST(n_fp AS BIGINT) AS n_fp,
           CAST(n_fp * 10000 // n_probes AS BIGINT) AS fp_bps
    FROM ps CROSS JOIN bs
    """,
)
def seen_bloom_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    urls = orders.select(
        F.concat(F.lit("https://www.nrsr.sk/p/"), F.col("o_orderkey").cast("string")).alias(
            "url"
        ),
        (F.col("o_orderkey") % 2 == 0).alias("ins"),
    )
    return bloom_calibration(
        urls.filter("ins").select("url"),
        urls.filter("NOT ins").select("url"),
        "url",
        m=65536,
        k=4,
    )


# ---------------------------------------------------------------------------
# Language-mixture drift between two md5-split snapshots of documents.
# ---------------------------------------------------------------------------


@query(
    "corpus_lang_drift",
    """
    WITH old AS (SELECT lang FROM documents
                 WHERE strpos('01234567', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) > 0),
    new AS (SELECT lang FROM documents
            WHERE strpos('01234567', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) = 0),
    co AS (SELECT lang AS stratum, COUNT(*) AS n_old FROM old GROUP BY lang),
    cn AS (SELECT lang AS stratum, COUNT(*) AS n_new FROM new GROUP BY lang),
    t AS (SELECT (SELECT SUM(n_old) FROM co) AS _to, (SELECT SUM(n_new) FROM cn) AS _tn),
    j AS (
        SELECT COALESCE(co.stratum, cn.stratum) AS stratum,
               COALESCE(n_old, 0) AS n_old, COALESCE(n_new, 0) AS n_new
        FROM co FULL OUTER JOIN cn ON co.stratum = cn.stratum
    )
    SELECT stratum, CAST(n_old AS BIGINT) AS n_old, CAST(n_new AS BIGINT) AS n_new,
           CAST(n_old * 10000 // _to AS BIGINT) AS share_old_bps,
           CAST(n_new * 10000 // _tn AS BIGINT) AS share_new_bps,
           CAST(abs(n_new * 10000 // _tn - n_old * 10000 // _to) AS BIGINT) AS delta_bps
    FROM j CROSS JOIN t
    """,
)
def corpus_lang_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    half = F.expr("instr('01234567', substr(md5(CAST(doc_id AS STRING)), 1, 1)) > 0")
    return mixture_drift(docs.filter(half), docs.filter(~half), "lang")


# ---------------------------------------------------------------------------
# RRF fusion of a length-prior top-100 and a vowel-ratio top-100 (two
# cheap orthogonal priors standing in for BM25 × embedding lists; the
# fusion kernel doesn't care what produced the ranks).
# ---------------------------------------------------------------------------


@query(
    "text_rrf_fusion",
    """
    WITH ra AS (
        SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank_a
        FROM documents QUALIFY rank_a <= 100
    ),
    rb AS (
        SELECT doc_id,
               row_number() OVER (
                   ORDER BY length(regexp_replace(text, '[^aeiou]', '', 'g')) * 10000
                            // n_chars DESC, doc_id) AS rank_b
        FROM documents WHERE n_chars > 0 QUALIFY rank_b <= 100
    )
    SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
           CAST(rank_a AS INTEGER) AS rank_a, CAST(rank_b AS INTEGER) AS rank_b,
           CAST(COALESCE(1000000 // (60 + rank_a), 0)
                + COALESCE(1000000 // (60 + rank_b), 0) AS BIGINT) AS rrf_score
    FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
    """,
)
def text_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    list_a = docs.select("doc_id", "n_chars").orderBy(
        F.desc("n_chars"), "doc_id"
    ).limit(100)
    vr = F.expr("length(regexp_replace(text, '[^aeiou]', '')) * 10000 div n_chars")
    list_b = (
        docs.filter(F.col("n_chars") > 0)
        .select("doc_id", vr.alias("vr"))
        .orderBy(F.desc("vr"), "doc_id")
        .limit(100)
    )
    return rrf_fuse(
        list_a,
        list_b,
        "doc_id",
        order_a=[F.desc("n_chars"), F.col("doc_id")],
        order_b=[F.desc("vr"), F.col("doc_id")],
        c=60,
    )
