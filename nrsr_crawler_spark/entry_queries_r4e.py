"""Round-4 wave E query battery — HyperBall neighborhood function
(operators/hyperball.py), hash-gated against a DuckDB oracle (registered
into entry_queries.QUERIES / ORACLES on import).

Oracle strategy: HLL register union is max-merge (idempotent/commutative/
associative), so after K rounds the Spark side's per-node register table is
EXACTLY the sketch of the node's true ball membership.  The oracle unrolls
exact reachability r0..rK as CTEs (feasible at sf0.01), sketches each ball
directly with the same md5 register/rho arithmetic the sketches battery
already certifies, and applies the same integer estimate — bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nrsr_crawler_spark.entry_queries import query
from nrsr_crawler_spark.operators.sketches import hll_lc_table
from nrsr_crawler_spark.sources.tpch import load

_U = "CAST(u AS VARCHAR)"
_HB_REG = (
    f"((strpos('0123456789abcdef', substr(md5({_U}), 1, 1)) - 1) * 16 "
    f"+ (strpos('0123456789abcdef', substr(md5({_U}), 2, 1)) - 1)) % 64"
)
_HB_T = f"ltrim(substr(md5({_U}), 3, 8), '0')"
_HB_RHO = (
    f"CASE WHEN length({_HB_T}) = 0 THEN 33 "
    f"ELSE (8 - length({_HB_T})) * 4 "
    f"+ CASE WHEN substr({_HB_T}, 1, 1) = '1' THEN 3 "
    f"       WHEN substr({_HB_T}, 1, 1) IN ('2','3') THEN 2 "
    f"       WHEN substr({_HB_T}, 1, 1) IN ('4','5','6','7') THEN 1 "
    f"       ELSE 0 END + 1 END"
)
_HB_RAW = (
    "24945719810981888 // (1000 * (SUM(1::BIGINT << (33 - rho_max)) "
    "+ (64 - COUNT(*)) * 8589934592))"
)
_HB_LC = (
    "CASE (64 - COUNT(*)) "
    + " ".join(f"WHEN {v} THEN {e}" for v, e in hll_lc_table(64).items())
    + " END"
)


def _hyperball_oracle(k: int = 3) -> str:
    parts = [
        """
    WITH edges AS (
        SELECT DISTINCT src, dst FROM (
            SELECT o_custkey * 2 AS src, o_orderkey * 2 + 1 AS dst FROM orders
            UNION ALL
            SELECT o_orderkey * 2 + 1, (o_custkey % 100) * 2 FROM orders WHERE o_orderkey % 3 <> 0
        )
    ),
    nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
    r0 AS (SELECT node AS v, node AS u FROM nodes)"""
    ]
    for t in range(1, k + 1):
        parts.append(
            f""",
    r{t} AS (SELECT DISTINCT v, u FROM (
        SELECT v, u FROM r{t - 1}
        UNION ALL
        SELECT e.src AS v, r.u FROM edges e JOIN r{t - 1} r ON r.v = e.dst))"""
        )
    for t in range(k + 1):
        parts.append(
            f""",
    regs{t} AS (SELECT v, reg AS register, MAX(rho) AS rho_max FROM (
        SELECT v, {_HB_REG} AS reg, {_HB_RHO} AS rho FROM r{t}) GROUP BY v, reg),
    est{t} AS (SELECT v, CAST(CASE WHEN {_HB_RAW} <= 160 AND COUNT(*) < 64
                                   THEN {_HB_LC} ELSE {_HB_RAW} END AS BIGINT) AS ball_est
               FROM regs{t} GROUP BY v),
    sum{t} AS (SELECT CAST(SUM(ball_est) AS BIGINT) AS nf_est,
                      CAST(COUNT(*) AS BIGINT) AS n_nodes FROM est{t})"""
        )
    selects = [
        f"SELECT CAST({t} AS INTEGER) AS t, nf_est, n_nodes FROM sum{t}"
        for t in range(k + 1)
    ]
    parts.append("\n    " + "\n    UNION ALL ".join(selects))
    return "".join(parts)


@query("link_hyperball_nf", _hyperball_oracle(3))
def link_hyperball_nf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood function N(t), t = 0..3, over the OPIC page graph."""
    from nrsr_crawler_spark.operators.hyperball import hyperball_nf

    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("ok"),
        F.col("o_custkey").cast("long").alias("ck"),
    )
    e1 = o.select((F.col("ck") * 2).alias("src"), (F.col("ok") * 2 + 1).alias("dst"))
    e2 = o.filter(F.col("ok") % 3 != 0).select(
        (F.col("ok") * 2 + 1).alias("src"), ((F.col("ck") % 100) * 2).alias("dst")
    )
    return hyperball_nf(e1.unionAll(e2), iterations=3, p=6)
