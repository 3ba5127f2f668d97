"""Round-4 wave K query battery — co-citation, transitions, collocations,
hash-gated against DuckDB oracles (registered into entry_queries.QUERIES /
ORACLES on import):

 - link_cocitation          co-citation relatedness pairs with hub caps
                            (operators/cocitation.py)
 - events_transition_matrix first-order Markov matrix over user event
                            sequences (operators/transitions.py)
 - text_pmi_collocations    top PMI collocations, integer bit-log score
                            (operators/collocations.py)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nrsr_crawler_spark.entry_queries import query
from nrsr_crawler_spark.operators.cocitation import cocitation_pairs
from nrsr_crawler_spark.operators.collocations import pmi_collocations
from nrsr_crawler_spark.operators.transitions import transition_matrix
from nrsr_crawler_spark.sources.tpch import load

# ---------------------------------------------------------------------------
# Co-citation over the order→part bipartite citation graph: parts cited
# together by ≥3 shared orders.  Citer out-degree ≤ 7 by TPC-H shape;
# the cap is asserted generically at 16.
# ---------------------------------------------------------------------------


@query(
    "link_cocitation",
    """
    WITH e AS (SELECT DISTINCT l_orderkey AS citer, l_partkey AS cited FROM lineitem),
    deg AS (SELECT citer, COUNT(*) AS n FROM e GROUP BY citer),
    cool AS (SELECT e.citer, e.cited FROM e JOIN deg USING (citer) WHERE deg.n <= 16)
    SELECT a.cited AS id_a, b.cited AS id_b, CAST(COUNT(*) AS BIGINT) AS n_common
    FROM cool a JOIN cool b ON a.citer = b.citer AND a.cited < b.cited
    GROUP BY a.cited, b.cited HAVING COUNT(*) >= 3
    """,
)
def link_cocitation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("src"), F.col("l_partkey").alias("dst")
    )
    return cocitation_pairs(li, "src", "dst", min_common=3, max_out=16)


# ---------------------------------------------------------------------------
# Event-type transition matrix over per-user sequences ordered by
# (ts, event_id).
# ---------------------------------------------------------------------------


@query(
    "events_transition_matrix",
    """
    WITH seq AS (
        SELECT event_type AS cur,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    pairs AS (
        SELECT cur, nxt, COUNT(*) AS n FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    tot AS (SELECT cur, SUM(n) AS _tot FROM pairs GROUP BY cur)
    SELECT p.cur, p.nxt, CAST(p.n AS BIGINT) AS n,
           CAST(p.n * 10000 // t._tot AS BIGINT) AS p_bps
    FROM pairs p JOIN tot t USING (cur)
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transition_matrix(
        load(spark, sf_dir, "events"), "user_id", "ts", "event_type", "event_id"
    )


# ---------------------------------------------------------------------------
# PMI collocations over the documents corpus: top-50 adjacent pairs with
# ≥2 occurrences and PMI ≥ 1 bit (the synthetic corpus is near-random
# word soup, so genuinely collocated pairs are rare and low-count).
# ---------------------------------------------------------------------------


@query(
    "text_pmi_collocations",
    """
    WITH base AS (
        SELECT regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents
    ),
    uni AS (
        SELECT u.w, COUNT(*) AS c
        FROM base, UNNEST(tk) AS u(w) WHERE u.w <> '' GROUP BY u.w
    ),
    big AS (
        SELECT w1, w2, COUNT(*) AS c_ab FROM (
            SELECT tk[i] AS w1, tk[i + 1] AS w2
            FROM base, UNNEST(range(1, len(tk))) AS r(i)
            WHERE len(tk) >= 2
        ) GROUP BY w1, w2 HAVING COUNT(*) >= 2
    ),
    n_total AS (SELECT SUM(c) AS _N FROM uni),
    scored AS (
        SELECT b.w1, b.w2, b.c_ab,
               (b.c_ab * t._N) // (ua.c * ub.c) AS ratio_q
        FROM big b
        JOIN uni ua ON ua.w = b.w1
        JOIN uni ub ON ub.w = b.w2
        CROSS JOIN n_total t
        WHERE (b.c_ab * t._N) // (ua.c * ub.c) >= 2
    )
    SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab, CAST(ratio_q AS BIGINT) AS ratio_q,
           CAST(length(bin(CAST(ratio_q AS BIGINT))) - 1 AS BIGINT) AS pmi_bits
    FROM scored
    ORDER BY ratio_q DESC, w1, w2 LIMIT 50
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pmi_collocations(
        load(spark, sf_dir, "documents"), "doc_id", "text", k=50, min_count=2
    )
