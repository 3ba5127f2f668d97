"""Round-4 wave C query battery — link-spam triangle counting and
training-mixture epoch planning, hash-gated against DuckDB oracles
(registered into entry_queries.QUERIES / ORACLES on import)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nrsr_crawler_spark.entry_queries import query
from nrsr_crawler_spark.sources.tpch import load

# ---------------------------------------------------------------------------
# Triangle counting (operators/triangles.py) over a graph with genuine
# triangles: customer pages link their order pages, order pages link a
# 100-node hub layer, and customer pages also link their own hub — so
# {customer, order, hub} closes whenever the order links its hub.
# The oracle reproduces the SEMANTICS (u<v<w edge-triple count) plus the
# orientation-defined wedge count, not the join strategy.
# ---------------------------------------------------------------------------

_TRI_EDGES = """
raw AS (
    SELECT o_custkey * 2 AS src, o_orderkey * 2 + 1 AS dst FROM orders
    UNION ALL
    SELECT o_orderkey * 2 + 1, (o_custkey % 100) * 2 FROM orders WHERE o_orderkey % 3 <> 0
    UNION ALL
    SELECT o_custkey * 2, (o_custkey % 100) * 2 FROM orders
)"""


@query(
    "link_triangle_count",
    f"""
    WITH {_TRI_EDGES},
    und AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
            FROM raw WHERE src <> dst),
    deg AS (SELECT node, COUNT(*) AS deg
            FROM (SELECT u AS node FROM und UNION ALL SELECT v FROM und)
            GROUP BY node),
    orient AS (SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
                           THEN e.u ELSE e.v END AS a
               FROM und e
               JOIN deg du ON du.node = e.u
               JOIN deg dv ON dv.node = e.v),
    od AS (SELECT a, COUNT(*) AS d FROM orient GROUP BY a),
    tri AS (SELECT COUNT(*) AS t
            FROM und a
            JOIN und b ON b.u = a.u AND b.v > a.v
            JOIN und c ON c.u = a.v AND c.v = b.v)
    SELECT CAST((SELECT COUNT(*) FROM und) AS BIGINT) AS n_und_edges,
           CAST((SELECT COALESCE(SUM(d * (d - 1) // 2), 0) FROM od) AS BIGINT) AS n_wedges,
           CAST((SELECT t FROM tri) AS BIGINT) AS n_triangles
    """,
)
def link_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators.triangles import triangle_count

    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("ok"),
        F.col("o_custkey").cast("long").alias("ck"),
    )
    hub = (F.col("ck") % 100) * 2
    edges = (
        o.select((F.col("ck") * 2).alias("src"), (F.col("ok") * 2 + 1).alias("dst"))
        .unionAll(o.filter(F.col("ok") % 3 != 0).select((F.col("ok") * 2 + 1).alias("src"), hub.alias("dst")))
        .unionAll(o.select((F.col("ck") * 2).alias("src"), hub.alias("dst")))
    )
    return triangle_count(edges)


# ---------------------------------------------------------------------------
# Mixture epoch plan (operators/mixture_plan.py): 20 sources, deterministic
# non-uniform weights summing to exactly 10000 bp, 60k-token budget, 2-epoch
# repetition cap — the GPT-3/LLaMA-style mixture table as a query.
# ---------------------------------------------------------------------------

_RAW_W = [100 + (i * 97) % 900 for i in range(20)]
_W_TOTAL = sum(_RAW_W)
WEIGHTS_BP: dict[str, int] = {
    f"src{i}": (10000 * w) // _W_TOTAL for i, w in enumerate(_RAW_W)
}
WEIGHTS_BP["src19"] += 10000 - sum(WEIGHTS_BP.values())  # exact 10000 total
_BUDGET = 60_000
_MAX_EPOCHS_BP = 20_000

_W_CASE = "CASE source " + " ".join(
    f"WHEN '{s}' THEN {bp}" for s, bp in sorted(WEIGHTS_BP.items())
) + " ELSE 0 END"


@query(
    "mixture_epoch_plan",
    rf"""
    WITH avail AS (
        SELECT source,
               SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+')) END) AS avail_tokens
        FROM documents GROUP BY source
    ),
    plan AS (
        SELECT source, avail_tokens, {_W_CASE} AS weight_bp FROM avail
    )
    SELECT source, CAST(avail_tokens AS BIGINT) AS avail_tokens,
           CAST(weight_bp AS BIGINT) AS weight_bp,
           CAST(({_BUDGET} * weight_bp) // 10000 AS BIGINT) AS target_tokens,
           CAST((({_BUDGET} * weight_bp) // 10000 * 10000) // GREATEST(avail_tokens, 1) AS BIGINT) AS epochs_bp,
           CAST(CASE WHEN (({_BUDGET} * weight_bp) // 10000 * 10000) // GREATEST(avail_tokens, 1) > {_MAX_EPOCHS_BP}
                     THEN 1 ELSE 0 END AS INTEGER) AS over_cap
    FROM plan
    """,
)
def mixture_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.operators.mixture_plan import (
        mixture_epoch_plan as plan_fn,
        source_token_counts,
    )

    avail = source_token_counts(load(spark, sf_dir, "documents"), "source", "text")
    return plan_fn(avail, WEIGHTS_BP, _BUDGET, _MAX_EPOCHS_BP).select(
        "source", "avail_tokens", "weight_bp", "target_tokens", "epochs_bp", "over_cap"
    )
