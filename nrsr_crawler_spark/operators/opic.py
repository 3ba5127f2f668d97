"""OPIC — On-line Page Importance Computation (Abiteboul, Preda & Cobena,
WWW 2003) — the classic crawl-frontier prioritization algorithm (used by
Apache Nutch as its default scoring plugin), plus link-graph degree/health
stats for crawl telemetry.

Why the crawler needs it: PageRank (operators/linkrank.py) re-ranks the
whole graph in K full passes; OPIC is the *incremental* alternative a
frontier actually runs — every page holds "cash", distributes it to its
outlinks when (re)visited, and accumulates "history" = total cash ever
received.  history/total is an unbiased importance estimate that converges
while the crawl is still discovering the graph, so new frontier URLs get a
meaningful priority immediately.  Reference parity: the reference crawler
fetches in a fixed seed order (spiders enqueue links FIFO —
reference nrsr/spiders/*.py); OPIC is the standard upgrade when the same
frontier must prioritize 10^10 pending URLs.

This module implements the *synchronous batch* formulation (every node
distributes each round — the form a periodic Spark re-rank pass runs
between crawl epochs), in exact integer arithmetic so the recurrence is
hash-gated against a DuckDB oracle:

    S       = 10^12                 (total cash mass)
    N       = |nodes|, out(u) = out-degree over DISTINCT edges
    cash_0  = S div N,  hist_0 = 0
    c(v)    = Σ_{(u,v)∈E} cash_t(u) div out(u)
    D       = Σ_{out(u)=0} cash_t(u)          (dangling cash)
    cash_{t+1}(v) = c(v) + D div N
    hist_{t+1}(v) = hist_t(v) + cash_t(v)

Every op is non-negative BIGINT floor division (Spark ``div`` ==
DuckDB ``//``), so the result is bit-identical in any engine; truncation
leaks ≤1 unit per node per round — deterministic and irrelevant for
ranking.

Scale shape (10^10 edges): identical to pagerank_fixed — edges deduped,
persisted, and hash-partitioned on ``src`` ONCE; each iteration shuffles
only the O(N) cash table (broadcast regime auto-selected when N ≤ 2·10^6);
contributions partial-aggregate map-side into the ``dst`` groupBy; dangling
cash is a 1-row aggregate broadcast; ``localCheckpoint`` truncates the
per-iteration lineage so the plan tree stays O(1) in K.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

SCALE = 10**12


def opic_fixed(
    edges: DataFrame, iterations: int = 3, broadcast_cash: bool | None = None
) -> DataFrame:
    """K-round synchronous OPIC.  ``edges``: (src:long, dst:long), multi-
    edges allowed (deduped here).  Returns (node:long, cash:long,
    hist:long); rank the frontier by ``hist`` (descending) — it is the
    importance estimate; ``cash`` is the carry state an incremental run
    would resume from."""
    e = edges.select("src", "dst").distinct().repartition("src").persist()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg")).persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # bounded driver scalar (one long), not a row collect
    if n == 0:
        # Empty edge set: return an empty (node, cash, hist) frame instead of
        # ZeroDivisionError at SCALE // n — same contract as the other graph
        # kernels on empty input.
        for cached in (e, out_deg, nodes):
            cached.unpersist()
        return nodes.select(
            F.col("node").cast("long"),
            F.lit(0).cast("long").alias("cash"),
            F.lit(0).cast("long").alias("hist"),
        )
    if broadcast_cash is None:
        broadcast_cash = n <= 2_000_000  # same budget rationale as pagerank_fixed
    bc = broadcast if broadcast_cash else (lambda df: df)

    s = nodes.select(
        "node",
        F.lit(SCALE // n).cast("long").alias("cash"),
        F.lit(0).cast("long").alias("hist"),
    ).persist()
    for _ in range(iterations):
        held = s.join(bc(out_deg), s["node"] == out_deg["src"], "left")
        shares = held.filter(F.col("out_deg").isNotNull()).select(
            F.col("src"), F.expr("cash div out_deg").alias("share")
        )
        contrib = e.join(bc(shares), "src").groupBy("dst").agg(F.sum("share").alias("c"))
        dangling = held.filter(F.col("out_deg").isNull()).agg(
            F.coalesce(F.sum("cash"), F.lit(0)).cast("long").alias("d")
        )
        nxt = (
            s.crossJoin(broadcast(dangling))
            .join(bc(contrib), s["node"] == contrib["dst"], "left")
            .select(
                "node",
                (F.coalesce(F.col("c"), F.lit(0)) + F.expr(f"d div {n}"))
                .cast("long")
                .alias("cash"),
                (F.col("hist") + F.col("cash")).cast("long").alias("hist"),
            )
        )
        # eager localCheckpoint: materializes AND truncates lineage (plan tree
        # would otherwise grow exponentially in K — same as pagerank_fixed)
        nxt = nxt.localCheckpoint(eager=True)
        s.unpersist()
        s = nxt
    for cached in (e, out_deg, nodes):
        cached.unpersist()
    return s


def degree_stats(edges: DataFrame) -> DataFrame:
    """One-row link-graph health summary for crawl telemetry: node/edge
    counts, dangling (no outlinks) and source (no inlinks) node counts,
    max in/out degree, self-loop count, and reciprocal pair count (both
    (u,v) and (v,u) present, u<v) — the standard inputs to link-spam and
    crawl-trap triage (a link farm shows as extreme reciprocity + max-degree
    outliers).

    Scale shape: edges dedup + two degree groupBys are all map-side
    partial-aggregated; the reciprocity self-join is a single equi-join on
    the reversed key pair (both sides hash-partitioned on the 2-col join
    key — never a cartesian); every output is a 1-row global aggregate
    (mergeable partials, no driver collect)."""
    e = edges.select("src", "dst").distinct().persist()
    out_d = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    in_d = e.groupBy("dst").agg(F.count(F.lit(1)).alias("deg"))
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    n_edges = e.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum(F.when(F.col("src") == F.col("dst"), 1).otherwise(0))
        .cast("long")
        .alias("n_self_loops"),
    )
    # dangling = nodes never appearing as src; sources = never as dst
    dang = (
        nodes.join(out_d, nodes["node"] == out_d["src"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n_dangling"))
    )
    srcs = (
        nodes.join(in_d, nodes["node"] == in_d["dst"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n_sources"))
    )
    maxes = out_d.agg(F.max("deg").alias("max_out_deg")).crossJoin(
        broadcast(in_d.agg(F.max("deg").alias("max_in_deg")))
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = (
        e.join(rev, ["src", "dst"], "left_semi")
        .filter(F.col("src") < F.col("dst"))
        .agg(F.count(F.lit(1)).alias("n_reciprocal_pairs"))
    )
    out = (
        n_nodes.crossJoin(broadcast(n_edges))
        .crossJoin(broadcast(dang))
        .crossJoin(broadcast(srcs))
        .crossJoin(broadcast(maxes))
        .crossJoin(broadcast(recip))
    )
    return out.select(
        F.col("n_nodes").cast("long"),
        F.col("n_edges").cast("long"),
        F.col("n_self_loops").cast("long"),
        F.col("n_dangling").cast("long"),
        F.col("n_sources").cast("long"),
        F.col("max_out_deg").cast("long"),
        F.col("max_in_deg").cast("long"),
        F.col("n_reciprocal_pairs").cast("long"),
    )
