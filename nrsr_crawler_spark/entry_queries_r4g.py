"""Round-4 wave G query battery — graph + sampling + multimodal-gating
operators, each hash-gated against a DuckDB oracle (registered into
entry_queries.QUERIES / ORACLES on import):

 - link_kcore            k-core decomposition by degree peeling
                         (operators/kcore.py)
 - docs_weighted_sample  deterministic weighted bottom-k sampling
                         (operators/bottomk.py)
 - images_alignment_gate CLIP-score-style caption↔image alignment gate
                         (operators/alignment.py)
 - text_vocab_growth     Heaps-law vocabulary growth curve
                         (operators/vocab_growth.py)

Oracle-portability per entry_queries_ml.py conventions: md5 hex → BIGINT
via conv / '0x' cast, BIGINT floor division, fixed unrolled iteration
counts for the iterative kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nrsr_crawler_spark.entry_queries import query
from nrsr_crawler_spark.operators.alignment import alignment_gate
from nrsr_crawler_spark.operators.bottomk import weighted_bottom_k
from nrsr_crawler_spark.operators.kcore import kcore_peel
from nrsr_crawler_spark.operators.vocab_growth import vocab_growth
from nrsr_crawler_spark.sources.tpch import load

# ---------------------------------------------------------------------------
# k-core peeling over the bipartite order↔part co-purchase graph
# (symmetrized).  Order nodes have degree ≈ items-per-order (1–7), part
# nodes collect many orders — so k=3 peeling cascades: thin orders drop
# first, parts lose degree and drop next round.  Fixed 3 rounds, unrolled
# in the oracle (the operator's true-fixpoint mode loops on node count).
# ---------------------------------------------------------------------------

_KCORE_EDGES = """
    raw AS (SELECT DISTINCT 2 * l_orderkey AS a, 2 * l_partkey + 1 AS b FROM lineitem),
    e0 AS (SELECT a AS src, b AS dst FROM raw UNION ALL SELECT b, a FROM raw)
"""


def _kcore_round(i: int) -> str:
    return f"""
    d{i} AS (SELECT src, COUNT(*) AS deg FROM e{i} GROUP BY src),
    k{i} AS (SELECT src FROM d{i} WHERE deg >= 3),
    e{i + 1} AS (SELECT e.src, e.dst FROM e{i} e
                 JOIN k{i} x ON e.src = x.src
                 JOIN k{i} y ON e.dst = y.src)"""


@query(
    "link_kcore",
    "WITH "
    + _KCORE_EDGES
    + ","
    + ",".join(_kcore_round(i) for i in range(3))
    + """
    SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM e3 GROUP BY src
    """,
)
def link_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    raw = li.select(
        (F.col("l_orderkey") * 2).alias("a"), (F.col("l_partkey") * 2 + 1).alias("b")
    ).distinct()
    edges = raw.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        raw.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    return kcore_peel(edges, k=3, rounds=3)


# ---------------------------------------------------------------------------
# Weighted bottom-k corpus sample: weight = quality-ish integer derived
# from document length, k = 100.  Heavier docs get systematically smaller
# integer priorities, so the sample skews long — deterministically.
# ---------------------------------------------------------------------------


@query(
    "docs_weighted_sample",
    """
    WITH w AS (
        SELECT doc_id, n_chars // 100 + 1 AS weight FROM documents
    ),
    p AS (
        SELECT doc_id, CAST(weight AS BIGINT) AS weight,
               CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                    // weight AS BIGINT) AS priority
        FROM w
    )
    SELECT doc_id, weight, priority FROM p ORDER BY priority, doc_id LIMIT 100
    """,
)
def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", (F.expr("n_chars div 100") + 1).alias("weight")
    )
    return weighted_bottom_k(docs, "doc_id", "weight", k=100)


# ---------------------------------------------------------------------------
# Alignment gate over synthesized image+caption pairs: phash from the
# images_phash_neardup integer construction (positive < 2^62, so bit
# probes are sign-free on both engines), captions with per-image token
# variety.  The oracle recomputes the bucket/bit/score pipeline in SQL.
# ---------------------------------------------------------------------------

_ALIGN_IMG_SQL = """
    img AS (
        SELECT printf('img%010d', c_custkey) AS image_id,
               ((c_custkey * 2654435761) % 2147483648)
               + ((c_custkey * 2246822519 + 2531011) % 2147483648) * 2147483648 AS phash,
               'portrait of member ' || (c_custkey % 50)
                 || ' in session ' || (c_custkey % 7) AS caption
        FROM customer WHERE c_custkey <= 1500
    )
"""


@query(
    "images_alignment_gate",
    "WITH "
    + _ALIGN_IMG_SQL
    + """,
    toks AS (
        SELECT image_id, phash, u.tok
        FROM (SELECT image_id, phash,
                     regexp_split_to_array(trim(lower(caption)), '\\s+') AS tk
              FROM img), UNNEST(tk) AS u(tok)
        WHERE u.tok <> ''
    ),
    probed AS (
        SELECT image_id,
               CAST(('0x' || substr(md5(tok), 1, 2)) AS BIGINT) % 64 AS bucket,
               ((phash >> CAST(CAST(('0x' || substr(md5(tok), 1, 2)) AS BIGINT) % 64
                          AS INTEGER)) & 1) = 1 AS hit
        FROM toks
    ),
    agg AS (
        SELECT image_id,
               CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_buckets,
               CAST(COUNT(DISTINCT CASE WHEN hit THEN bucket END) AS BIGINT) AS n_hits
        FROM probed GROUP BY image_id
    )
    SELECT image_id, n_buckets, n_hits,
           CAST(n_hits * 10000 // n_buckets AS BIGINT) AS score_bps,
           n_hits * 10000 // n_buckets >= 5000 AS aligned
    FROM agg
    """,
)
def images_alignment_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 1500)
    k = F.col("c_custkey")
    images = cust.select(
        F.format_string("img%010d", k).alias("image_id"),
        ((k * 2654435761) % 2147483648 + ((k * 2246822519 + 2531011) % 2147483648) * 2147483648)
        .cast("long")
        .alias("phash"),
        F.concat(
            F.lit("portrait of member "),
            (k % 50).cast("string"),
            F.lit(" in session "),
            (k % 7).cast("string"),
        ).alias("caption"),
    )
    return alignment_gate(images, "image_id", "caption", "phash", threshold_bps=5000)


# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth at 10 corpus-prefix checkpoints.
# ---------------------------------------------------------------------------


@query(
    "text_vocab_growth",
    """
    WITH toks AS (
        SELECT doc_id, u.term
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
              FROM documents), UNNEST(tk) AS u(term)
        WHERE u.term <> ''
    ),
    mx AS (SELECT MAX(doc_id) AS m FROM documents),
    b AS (SELECT doc_id * 10 // (m + 1) AS bucket, term FROM toks CROSS JOIN mx),
    firsts AS (SELECT term, MIN(bucket) AS bucket FROM b GROUP BY term),
    newv AS (SELECT bucket, COUNT(*) AS n_new FROM firsts GROUP BY bucket),
    nt AS (SELECT bucket, COUNT(*) AS n_tokens FROM b GROUP BY bucket)
    SELECT nt.bucket,
           CAST(SUM(n_tokens) OVER (ORDER BY nt.bucket ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_tokens,
           CAST(SUM(COALESCE(n_new, 0)) OVER (ORDER BY nt.bucket ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_vocab
    FROM nt LEFT JOIN newv ON nt.bucket = newv.bucket
    """,
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_growth(load(spark, sf_dir, "documents"), "doc_id", "text", n_checkpoints=10)
