"""Round-4 wave D query battery — pipeline telemetry reports
(operators/reports.py), hash-gated against DuckDB oracles (registered into
entry_queries.QUERIES / ORACLES on import)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nrsr_crawler_spark.entry_queries import query
from nrsr_crawler_spark.entry_queries_ml import _MINHASH_SQL, SHINGLES_CTE
from nrsr_crawler_spark.sources.tpch import load

# ---------------------------------------------------------------------------
# Staged quality-filter funnel (the C4-Table-1-shaped attrition report).
# ---------------------------------------------------------------------------


@query(
    "text_filter_funnel",
    r"""
    WITH base AS (
        SELECT doc_id, lang,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
               length(trim(text)) AS n_chr
        FROM documents
    ),
    top AS (
        SELECT doc_id, MAX(c) AS top1 FROM (
            SELECT doc_id, u.w, COUNT(*) AS c
            FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk FROM documents) t,
                 UNNEST(tk) AS u(w)
            GROUP BY doc_id, u.w
        ) GROUP BY doc_id
    ),
    fl AS (
        SELECT b.doc_id,
               (lang = 'en') AS g1,
               (n_tok >= 50) AS g2,
               (n_chr * 10 >= n_tok * 30 AND n_chr * 10 <= n_tok * 120) AS g3,
               (COALESCE(top1, 0) * 5 <= n_tok) AS g4
        FROM base b LEFT JOIN top USING (doc_id)
    ),
    agg AS (
        SELECT COUNT(*) AS k0,
               SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS k1,
               SUM(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END) AS k2,
               SUM(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0 END) AS k3,
               SUM(CASE WHEN g1 AND g2 AND g3 AND g4 THEN 1 ELSE 0 END) AS k4
        FROM fl
    )
    SELECT CAST(0 AS INTEGER) AS stage_idx, 'all' AS stage,
           CAST(k0 AS BIGINT) AS n_kept, CAST(NULL AS BIGINT) AS n_dropped_here FROM agg
    UNION ALL SELECT 1, 'lang', CAST(k1 AS BIGINT), CAST(k0 - k1 AS BIGINT) FROM agg
    UNION ALL SELECT 2, 'length', CAST(k2 AS BIGINT), CAST(k1 - k2 AS BIGINT) FROM agg
    UNION ALL SELECT 3, 'wordlen', CAST(k3 AS BIGINT), CAST(k2 - k3 AS BIGINT) FROM agg
    UNION ALL SELECT 4, 'repetition', CAST(k4 AS BIGINT), CAST(k3 - k4 AS BIGINT) FROM agg
    """,
)
def text_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators.reports import quality_funnel

    return quality_funnel(load(spark, sf_dir, "documents"), "doc_id", "text", "lang")


# ---------------------------------------------------------------------------
# Dedup cluster-size histogram over the SAME verified minhash CC groups
# dedup_minhash_groups certifies (the oracle re-derives that fixpoint and
# histograms it).
# ---------------------------------------------------------------------------


@query(
    "dedup_cluster_histogram",
    f"""
    WITH RECURSIVE {SHINGLES_CTE},
    sigs AS (SELECT doc_id, {_MINHASH_SQL} FROM sh GROUP BY doc_id),
    banded AS (
        SELECT doc_id, 0 AS band, md5(h0 || '|' || h1 || '|' || h2 || '|' || h3) AS bucket FROM sigs
        UNION ALL
        SELECT doc_id, 1 AS band, md5(h4 || '|' || h5 || '|' || h6 || '|' || h7) AS bucket FROM sigs
    ),
    cands AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b USING (band, bucket)
        WHERE a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    prs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
        FROM sh a JOIN sh b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    vpairs AS (
        SELECT p.id_a, p.id_b
        FROM prs p
        JOIN sizes sa ON sa.doc_id = p.id_a JOIN sizes sb ON sb.doc_id = p.id_b
        JOIN cands c ON c.id_a = p.id_a AND c.id_b = p.id_b
        WHERE p.common * 2 >= (sa.n + sb.n - p.common) * 1
    ),
    edges AS (SELECT id_a AS a, id_b AS b FROM vpairs
              UNION ALL SELECT id_b, id_a FROM vpairs),
    reach(id, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id
    ),
    grp AS (SELECT id AS doc_id, MIN(r) AS rep FROM reach GROUP BY id),
    cs AS (SELECT rep, COUNT(*) AS cluster_size FROM grp GROUP BY rep)
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
    FROM cs GROUP BY cluster_size
    """,
)
def dedup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators import dedup as D
    from nrsr_crawler_spark.operators.image_dedup import phash_connected_groups
    from nrsr_crawler_spark.operators.reports import cluster_size_histogram

    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_dedup(
        docs, "doc_id", "text", n=3, num_hashes=8, bands=2,
        threshold_num=1, threshold_den=2,
    ).select("id_a", "id_b")
    groups = phash_connected_groups(pairs, docs.select("doc_id"), id_col="doc_id")
    return cluster_size_histogram(groups, rep_col="rep")
