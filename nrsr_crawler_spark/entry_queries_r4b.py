"""Round-4 wave B query battery — crawl-graph and corpus-composition
operators, each hash-gated against a DuckDB oracle (registered into
entry_queries.QUERIES / ORACLES on import):

 - link_opic             OPIC crawl prioritization (Abiteboul et al. 2003)
 - link_graph_stats      link-graph degree/reciprocity/health summary
 - docs_domain_quota     C4/RefinedWeb per-domain contribution cap
 - docs_systematic_sample  exact systematic weighted sampling
 - text_perplexity_bits  CCNet-style bigram-LM bits-per-bigram filter
 - text_tfidf_keywords   integer-idf TF-IDF keyword extraction
 - images_shard_plan     byte-balanced WebDataset shard planning

Integer-log₂ convention (lm_score.floor_log2): floor(log₂ x) =
length(bin(x)) − 1 — Spark and DuckDB both render bin() as the minimal
binary string, so the logs are engine-exact.  All other arithmetic is
BIGINT floor division (Spark ``div`` == DuckDB ``//``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nrsr_crawler_spark.entry_queries import query
from nrsr_crawler_spark.sources.tpch import load

# ---------------------------------------------------------------------------
# OPIC over an orders-derived page graph: customer pages link to their order
# pages; order pages link back to a 100-node hub layer (o_custkey % 100)
# unless o_orderkey % 3 == 0 (those order pages are dangling, exercising the
# cash-redistribution path).  K = 3 synchronous rounds.
# ---------------------------------------------------------------------------

_OPIC_EDGES = """
edges AS (
    SELECT DISTINCT src, dst FROM (
        SELECT o_custkey * 2 AS src, o_orderkey * 2 + 1 AS dst FROM orders
        UNION ALL
        SELECT o_orderkey * 2 + 1, (o_custkey % 100) * 2 FROM orders WHERE o_orderkey % 3 <> 0
    )
),
nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
outdeg AS (SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY src),
nn AS (SELECT COUNT(*) AS n FROM nodes)"""

_OPIC_ITER_TPL = """
s{t1} AS (
    SELECT n.node,
           CAST(COALESCE(c.c, 0)
                + ((SELECT COALESCE(SUM(s.cash), 0) FROM s{t0} s
                    LEFT JOIN outdeg o ON o.src = s.node WHERE o.src IS NULL)
                   // (SELECT n FROM nn)) AS BIGINT) AS cash,
           CAST(p.hist + p.cash AS BIGINT) AS hist
    FROM nodes n
    JOIN s{t0} p ON p.node = n.node
    LEFT JOIN (SELECT e.dst, SUM(s.cash // o.out_deg) AS c
               FROM edges e
               JOIN s{t0} s ON s.node = e.src
               JOIN outdeg o ON o.src = e.src
               GROUP BY e.dst) c ON c.dst = n.node
)"""


def _opic_oracle(k: int = 3) -> str:
    parts = [
        "WITH ",
        _OPIC_EDGES,
        """,
s0 AS (SELECT node, CAST((SELECT 1000000000000 // n FROM nn) AS BIGINT) AS cash,
              CAST(0 AS BIGINT) AS hist FROM nodes)""",
    ]
    for t in range(k):
        parts.append("," + _OPIC_ITER_TPL.format(t0=t, t1=t + 1))
    parts.append(f"\nSELECT node, cash, hist FROM s{k}")
    return "".join(parts)


@query("link_opic", _opic_oracle(3))
def link_opic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPIC importance for frontier prioritization (operators/opic.py)."""
    from nrsr_crawler_spark.operators.opic import opic_fixed

    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("ok"),
        F.col("o_custkey").cast("long").alias("ck"),
    )
    e1 = o.select((F.col("ck") * 2).alias("src"), (F.col("ok") * 2 + 1).alias("dst"))
    e2 = o.filter(F.col("ok") % 3 != 0).select(
        (F.col("ok") * 2 + 1).alias("src"), ((F.col("ck") % 100) * 2).alias("dst")
    )
    return opic_fixed(e1.unionAll(e2), iterations=3).select("node", "cash", "hist")


# ---------------------------------------------------------------------------
# Link-graph health summary over a richer graph: the OPIC edges plus
# reciprocal backlinks (order → customer for o_orderkey % 5 == 0) and hub
# self-loops (o_custkey % 17 == 3) so every stat is exercised non-trivially.
# ---------------------------------------------------------------------------

_STATS_EDGES = """
edges AS (
    SELECT DISTINCT src, dst FROM (
        SELECT o_custkey * 2 AS src, o_orderkey * 2 + 1 AS dst FROM orders
        UNION ALL
        SELECT o_orderkey * 2 + 1, (o_custkey % 100) * 2 FROM orders WHERE o_orderkey % 3 <> 0
        UNION ALL
        SELECT o_orderkey * 2 + 1, o_custkey * 2 FROM orders WHERE o_orderkey % 5 = 0
        UNION ALL
        SELECT (o_custkey % 100) * 2, (o_custkey % 100) * 2 FROM orders WHERE o_custkey % 17 = 3
    )
)"""


@query(
    "link_graph_stats",
    f"""
    WITH {_STATS_EDGES},
    nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
    outd AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    ind AS (SELECT dst, COUNT(*) AS deg FROM edges GROUP BY dst)
    SELECT CAST((SELECT COUNT(*) FROM nodes) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM edges WHERE src = dst) AS BIGINT) AS n_self_loops,
           CAST((SELECT COUNT(*) FROM nodes WHERE node NOT IN (SELECT src FROM edges)) AS BIGINT) AS n_dangling,
           CAST((SELECT COUNT(*) FROM nodes WHERE node NOT IN (SELECT dst FROM edges)) AS BIGINT) AS n_sources,
           CAST((SELECT MAX(deg) FROM outd) AS BIGINT) AS max_out_deg,
           CAST((SELECT MAX(deg) FROM ind) AS BIGINT) AS max_in_deg,
           CAST((SELECT COUNT(*) FROM edges a JOIN edges b ON a.src = b.dst AND a.dst = b.src
                 WHERE a.src < a.dst) AS BIGINT) AS n_reciprocal_pairs
    """,
)
def link_graph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-telemetry graph summary (operators/opic.py degree_stats)."""
    from nrsr_crawler_spark.operators.opic import degree_stats

    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("ok"),
        F.col("o_custkey").cast("long").alias("ck"),
    )
    hub = (F.col("ck") % 100) * 2
    edges = (
        o.select((F.col("ck") * 2).alias("src"), (F.col("ok") * 2 + 1).alias("dst"))
        .unionAll(o.filter(F.col("ok") % 3 != 0).select((F.col("ok") * 2 + 1).alias("src"), hub.alias("dst")))
        .unionAll(o.filter(F.col("ok") % 5 == 0).select((F.col("ok") * 2 + 1).alias("src"), (F.col("ck") * 2).alias("dst")))
        .unionAll(o.filter(F.col("ck") % 17 == 3).select(hub.alias("src"), hub.alias("dst")))
    )
    return degree_stats(edges)


# ---------------------------------------------------------------------------
# Per-domain quota cap (C4 §2.2 / RefinedWeb "URL deduplication + top-domain
# caps"): keep at most k = 5 documents per registrable domain, preferring
# the longest.  Domain synthesized deterministically from doc_id (the PSL
# extraction itself is already oracle-gated by domain_rollup).
# ---------------------------------------------------------------------------


@query(
    "docs_domain_quota",
    """
    WITH d AS (
        SELECT doc_id, 'site' || CAST(doc_id % 23 AS VARCHAR) || '.sk' AS domain, n_chars
        FROM documents
    ),
    r AS (
        SELECT doc_id, domain, n_chars,
               row_number() OVER (PARTITION BY domain ORDER BY n_chars DESC, doc_id) AS rk
        FROM d
    )
    SELECT doc_id, domain, CAST(n_chars AS BIGINT) AS n_chars, CAST(rk AS INTEGER) AS rk
    FROM r WHERE rk <= 5
    """,
)
def docs_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators.quota import domain_quota_topk

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("site"), (F.col("doc_id") % 23).cast("string"), F.lit(".sk")).alias("domain"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )
    out = domain_quota_topk(
        d, "domain", [F.col("n_chars").desc(), F.col("doc_id")], k=5
    )
    return out.select("doc_id", "domain", "n_chars", F.col("rk").cast("int").alias("rk"))


# ---------------------------------------------------------------------------
# Systematic weighted sampling: draw n = 64 positions over the cumulative
# token mass — the deterministic, minimum-variance way to draw a
# token-budgeted mixture slice.  Oracle uses the single global window; the
# Spark side uses the funnel-free two-level prefix sum — bit-identical.
# ---------------------------------------------------------------------------


@query(
    "docs_systematic_sample",
    r"""
    WITH w AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS wt,
               md5(CAST(doc_id AS VARCHAR)) AS ok
        FROM documents
    ),
    c AS (
        SELECT doc_id, wt,
               SUM(wt) OVER (ORDER BY ok, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
        FROM w
    ),
    t AS (SELECT SUM(wt) AS tot FROM w)
    SELECT doc_id, CAST(wt AS BIGINT) AS wt,
           CAST((64 * hi) // tot - (64 * (hi - wt)) // tot AS BIGINT) AS multiplicity
    FROM c, t
    WHERE (64 * hi) // tot - (64 * (hi - wt)) // tot >= 1
    """,
)
def docs_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators.quota import systematic_weighted_sample
    from nrsr_crawler_spark.operators.text import token_count

    d = load(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).cast("long").alias("wt")
    )
    return systematic_weighted_sample(d, "doc_id", "wt", n_samples=64).select(
        "doc_id", "wt", "multiplicity"
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity filter: add-one-smoothed bigram LM trained on the
# src0 slice (the "trusted in-domain" stand-in), every document scored by
# integer bits-per-bigram.
# ---------------------------------------------------------------------------


@query(
    "text_perplexity_bits",
    r"""
    WITH toks AS (
        SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS tk,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n
        FROM documents
    ),
    bg AS (
        SELECT doc_id, source, tk[u.i] AS w1, tk[u.i + 1] AS w2
        FROM toks, UNNEST(CASE WHEN n >= 2 THEN range(1, n) ELSE [] END) AS u(i)
    ),
    tf AS (SELECT doc_id, w1, w2, COUNT(*) AS tf FROM bg GROUP BY doc_id, w1, w2),
    c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg WHERE source = 'src0' GROUP BY w1, w2),
    c1 AS (SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY w1),
    v AS (SELECT COUNT(DISTINCT u.w) AS v FROM toks, UNNEST(tk) AS u(w) WHERE source = 'src0'),
    sc AS (
        SELECT t.doc_id, t.tf,
               length(bin(((COALESCE(c1.c1, 0) + v.v) * 256) // (COALESCE(c2.c2, 0) + 1))) - 1 - 8 AS bits
        FROM tf t
        LEFT JOIN c2 ON c2.w1 = t.w1 AND c2.w2 = t.w2
        LEFT JOIN c1 ON c1.w1 = t.w1, v
    ),
    agg AS (SELECT doc_id, SUM(tf) AS n_bigrams, SUM(bits * tf) AS bits_total FROM sc GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(a.bits_total, 0) AS BIGINT) AS bits_total,
           CAST(COALESCE(a.bits_total, 0) // GREATEST(COALESCE(a.n_bigrams, 0), 1) AS BIGINT) AS bits_avg
    FROM (SELECT DISTINCT doc_id FROM documents) d
    LEFT JOIN agg a ON a.doc_id = d.doc_id
    """,
)
def text_perplexity_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators.lm_score import bigram_bits_score

    docs = load(spark, sf_dir, "documents")
    return bigram_bits_score(docs, "doc_id", "text", F.col("source") == "src0")


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction: top-3 terms per document with integer Q8 idf.
# ---------------------------------------------------------------------------


@query(
    "text_tfidf_keywords",
    r"""
    WITH tf AS (
        SELECT doc_id, u.term AS term, COUNT(*) AS tf
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
              FROM documents WHERE length(trim(text)) > 0) t,
             UNNEST(tk) AS u(term)
        GROUP BY doc_id, u.term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    sc AS (
        SELECT tf.doc_id, tf.term, tf.tf,
               length(bin(((nd.n_docs + 1) * 256) // (dfreq.df + 1))) - 1 AS idf_q8
        FROM tf JOIN dfreq USING (term), nd
    ),
    r AS (
        SELECT doc_id, term, tf, idf_q8, tf * idf_q8 AS score,
               row_number() OVER (PARTITION BY doc_id ORDER BY tf * idf_q8 DESC, term) AS rk
        FROM sc
    )
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(idf_q8 AS BIGINT) AS idf_q8,
           CAST(score AS BIGINT) AS score, CAST(rk AS INTEGER) AS rk
    FROM r WHERE rk <= 3
    """,
)
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators.lm_score import tfidf_keywords

    return tfidf_keywords(load(spark, sf_dir, "documents"), "doc_id", "text", k=3)


# ---------------------------------------------------------------------------
# Byte-balanced shard planning over the image+caption table (input_hint
# shape): nominal decoded size = 9-byte FIMG header + w·h grayscale
# payload, dims from the same arithmetic synthesis images_train_manifest
# uses (the real pipeline passes length(bytes) — same kernel).  1 MB shards.
# ---------------------------------------------------------------------------


@query(
    "images_shard_plan",
    """
    WITH img AS (
        SELECT printf('img%010d', c_custkey) AS image_id,
               9 + (32 + (c_custkey % 7) * 16) * (32 + (c_custkey % 5) * 16) AS size_bytes
        FROM customer WHERE c_custkey BETWEEN 1 AND 2000
    ),
    c AS (
        SELECT image_id, size_bytes,
               SUM(size_bytes) OVER (ORDER BY md5(image_id), image_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
        FROM img
    )
    SELECT image_id, CAST(size_bytes AS BIGINT) AS size_bytes,
           CAST(hi - size_bytes AS BIGINT) AS cum_lo,
           CAST((hi - size_bytes) // 1000000 AS BIGINT) AS shard_id,
           CAST((hi - size_bytes) % 1000000 AS BIGINT) AS shard_offset
    FROM c
    """,
)
def images_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators.shard_plan import byte_shard_plan

    img = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey").between(1, 2000))
        .select(
            F.format_string("img%010d", F.col("c_custkey")).alias("image_id"),
            (
                F.lit(9)
                + (F.lit(32) + (F.col("c_custkey") % 7) * 16)
                * (F.lit(32) + (F.col("c_custkey") % 5) * 16)
            ).cast("long").alias("size_bytes"),
        )
    )
    return byte_shard_plan(img, "image_id", "size_bytes", shard_bytes=1_000_000).select(
        "image_id", "size_bytes", "cum_lo", "shard_id", "shard_offset"
    )
