"""k-core decomposition by iterative degree peeling.

Crawl/link-graph use: the k-core of the host/page graph is the standard
"dense center" extractor — seed-list curation (cores are crawl-worthy
hubs), spam-farm triage (link farms show up as anomalously deep cores),
and graph-sampling baselines (Seidman 1983; Batagelj–Zaveršnik 2003).
The ``operators/linkrank.py`` scores rank nodes; the core number bounds
which nodes can matter at all.

Algorithm: repeatedly delete every node whose degree in the surviving
subgraph is < k; the fixpoint is the k-core.  Each peel round is one
map-side-combinable degree count plus two semi-joins — O(E) per round,
no global state.  Convergence needs at most "peel depth" rounds (the
longest cascade); like the other iterative kernels here (PageRank, HITS,
HyperBall, CC) the operator runs a FIXED round count so the oracle can
unroll the identical recurrence, and callers that need the true fixpoint
loop until ``n_nodes`` stops shrinking (cheap: one count per round).

Edges must be handed in symmetrized (both directions present, distinct);
degrees are then per-``src`` counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def kcore_peel(
    edges: DataFrame, k: int, rounds: int, broadcast_nodes: bool | None = None
) -> DataFrame:
    """Peel ``rounds`` times and return (node, deg) for the survivors with
    their degree in the surviving subgraph.

    Scale shape: per round one groupBy(src) degree count (partial-agg
    combined) and two left-semi joins restricting edges to survivors.
    Two regimes for the survivor joins (same split as linkrank/opic):
    the survivor set is O(N) — when N fits the broadcast budget (≤ 2·10^6,
    decided once from the initial src count unless forced) BOTH semi-joins
    broadcast and the O(E) edge set never shuffles in the loop, only the
    degree partials do; above the budget the joins shuffle on src/dst.
    ``localCheckpoint`` truncates the per-round lineage so the plan stays
    linear in ``rounds``.
    """
    e = edges.select("src", "dst")
    if broadcast_nodes is None:
        # one-time bounded scalar, same budget rationale as pagerank_fixed
        broadcast_nodes = e.select("src").distinct().count() <= 2_000_000
    bk = broadcast if broadcast_nodes else (lambda df: df)
    for i in range(rounds):
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("src")
        e = (
            e.join(bk(keep), "src", "left_semi")
            .join(bk(keep.withColumnRenamed("src", "dst")), "dst", "left_semi")
            .select("src", "dst")
        )
        # materialize + truncate lineage: each round references e twice, so
        # without this the recompute tree doubles per round (cf. linkrank)
        e = e.localCheckpoint(eager=True)
    return (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .select(F.col("src").alias("node"), "deg")
    )
