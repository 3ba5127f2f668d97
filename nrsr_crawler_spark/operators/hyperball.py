"""HyperBall (Boldi & Vigna 2013, "In-core computation of geometric
centralities with HyperBall") — the neighborhood function N(t) of the crawl
link graph: how many (v, u) pairs have dist(v→u) ≤ t.

Why the crawler wants it: N(t) is the standard webgraph shape diagnostic —
its growth curve gives the effective diameter (how many hops until the
frontier saturates a site), which drives crawl-depth budgets and detects
pathological graph shapes (a link farm saturates in 2 hops; a calendar
trap never saturates).  Computing it exactly is an all-pairs BFS; HyperBall
replaces each node's ball with an HLL cardinality sketch and unions
sketches along edges:

    b_0(v) = sketch({v})
    b_{t+1}(v) = b_t(v) ∪ ⋃_{(v,w)∈E} b_t(w)      (max-merge of registers)
    N(t) ≈ Σ_v estimate(b_t(v))

HLL register union is max-merge — idempotent/commutative/associative — so
after K rounds each node's register table is EXACTLY the sketch of its true
ball membership set: the DuckDB oracle can therefore compute exact balls
(unrolled reachability CTEs) and sketch them directly, and the integer
estimates match bit-for-bit.  All register/rho/estimate arithmetic reuses
operators/sketches.py (md5 hex decodes, integer rational estimate, literal
linear-counting table — no floats anywhere).

Scale shape (10^10 edges): per-node state is ≤ m (=2^p) rows, stored sparse
(only set registers); each round is one equi-join of edges against the
state (both hash-partitioned on the join key) + one partial-aggregated
max groupBy on (node, register) — the same shuffle shape as one PageRank
iteration, with localCheckpoint truncating per-round lineage; per-round
estimates are one more partial-aggregated groupBy + a 1-row global sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nrsr_crawler_spark.operators.sketches import (
    _HLL_ALPHA_MILLI,
    _hll_register,
    _hll_rho,
    hll_lc_table,
)


def _per_node_estimate_sum(state: DataFrame, p: int) -> DataFrame:
    """Σ_v corrected-HLL estimate of node v's register table → 1 row
    (nf_est, n_nodes).  Same integer formulas as sketches.hll_estimate,
    applied per node."""
    m = 1 << p
    alpha = _HLL_ALPHA_MILLI[m]
    lc = hll_lc_table(m)
    lc_case = (
        f"case ({m} - count(1)) "
        + " ".join(f"when {v} then {e}L" for v, e in lc.items())
        + " end"
    )
    raw = (
        f"cast({alpha * m * m * (1 << 33)} div "
        f"(1000 * (sum(__w) + ({m} - count(1)) * {1 << 33})) as long)"
    )
    per_node = (
        state.withColumn("__w", F.expr("shiftleft(cast(1 as long), 33 - rho_max)"))
        .groupBy("node")
        .agg(
            F.expr(
                f"cast(case when {raw} <= {5 * m // 2} and count(1) < {m} "
                f"then {lc_case} else {raw} end as long)"
            ).alias("ball_est")
        )
    )
    return per_node.agg(
        F.sum("ball_est").cast("long").alias("nf_est"),
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
    )


def hyperball_nf(edges: DataFrame, iterations: int = 3, p: int = 6) -> DataFrame:
    """edges: (src:long, dst:long).  Returns (t:int, nf_est:long,
    n_nodes:long) for t = 0..iterations — nf_est is the estimated number of
    ordered pairs within distance t along OUT-edges (t=0 rows estimate
    ~n_nodes, sketch noise aside)."""
    e = edges.select("src", "dst").distinct().repartition("dst").persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    m = 1 << p
    key = F.col("node").cast("string")
    state = nodes.select(
        "node",
        _hll_register(key, m).alias("register"),
        _hll_rho(key).cast("int").alias("rho_max"),
    ).localCheckpoint(eager=True)

    rounds = [
        _per_node_estimate_sum(state, p).select(
            F.lit(0).cast("int").alias("t"), "nf_est", "n_nodes"
        )
    ]
    for t in range(1, iterations + 1):
        contrib = e.join(state, state["node"] == e["dst"]).select(
            F.col("src").alias("node"), "register", "rho_max"
        )
        state = (
            state.unionByName(contrib)
            .groupBy("node", "register")
            .agg(F.max("rho_max").alias("rho_max"))
            .localCheckpoint(eager=True)  # truncate per-round lineage
        )
        rounds.append(
            _per_node_estimate_sum(state, p).select(
                F.lit(t).cast("int").alias("t"), "nf_est", "n_nodes"
            )
        )
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionByName(r)
    e.unpersist()
    return out
