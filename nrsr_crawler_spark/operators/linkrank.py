"""Fixed-iteration PageRank over the crawl link graph, in exact integer
arithmetic.

Why the crawler needs it: the frontier's ``priority`` column is an open
input (epoch_loop enqueues children at priority 0); a periodic link-graph
rank pass is the standard way a large crawl decides WHICH of 10^10 pending
URLs deserve fetch budget first (authority-ordered crawling).  The engine's
``edges`` lake table (parent_hash → url_hash per epoch) is exactly this
graph.

Why integer arithmetic: floating-point PageRank is not reproducible across
engines (summation order), so it could never be hash-gated against a DuckDB
oracle.  Instead the whole recurrence is defined over scaled BIGINTs with
floor division — bit-identical in any engine:

    S      = 10^12                      (total rank mass)
    N      = |nodes|,  out(u) = out-degree over DISTINCT edges
    r0(v)  = S div N
    c(v)   = Σ_{(u,v)∈E} r_t(u) div out(u)
    D      = Σ_{out(u)=0} r_t(u)        (dangling mass)
    r_{t+1}(v) = ((3·S) div 20) div N  +  (17 · (c(v) + D div N)) div 20

i.e. damping d = 17/20 = 0.85 exactly; every op is non-negative BIGINT
floor division, so Spark's ``div`` and DuckDB's ``//`` agree bit-for-bit.
Truncation leaks ≤1 unit of mass per node per term — deterministic and
irrelevant for ranking (relative error ≤ N/S = 10^-7 at 10^5 nodes).

Scale shape (100 TB / 10^10 edges): edges are deduped and persisted ONCE,
hash-partitioned on ``src`` so every iteration's rank-share join is
co-partitioned (one shuffle of the O(N) rank table per iteration, never the
O(E) edge table); contributions partial-aggregate map-side into the
``dst`` groupBy; the dangling mass is a 1-row aggregate broadcast back.
K is fixed and small (the crawl reprioritizes every few epochs — it does
not need convergence), so lineage stays bounded; each iteration's rank
table is persisted and the previous one unpersisted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

SCALE = 10**12
DAMP_NUM, DAMP_DEN = 17, 20


def pagerank_fixed(
    edges: DataFrame, iterations: int = 3, broadcast_ranks: bool | None = None
) -> DataFrame:
    """K-iteration integer PageRank.  ``edges``: (src:long, dst:long),
    multi-edges allowed (deduped here).  Returns (node:long, rank:long)
    with rank in units of SCALE/N total mass.

    Two regimes on the per-iteration O(N) tables (rank, out-degree,
    contributions) — same split as :func:`hits_fixed`:

    * ``broadcast_ranks`` (auto when N ≤ 2·10^6): the O(N) side of every
      per-iteration join broadcasts, so the persisted O(E) edge table never
      exchanges or sorts and the only shuffle per iteration is the
      partial-aggregated contribution groupBy.
    * shuffle regime (web scale): edges pre-partitioned on ``src`` once, the
      O(N) rank table shuffles to it each iteration (never the O(E) side).
    """
    e = edges.select("src", "dst").distinct().repartition("src").persist()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg")).persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # bounded driver scalar (one long), not a row collect
    base = ((3 * SCALE) // DAMP_DEN) // n
    if broadcast_ranks is None:
        # 2M nodes ≈ 32 MB of paired longs — inside the broadcast budget
        # even after hash-table inflation (see hits_fixed)
        broadcast_ranks = n <= 2_000_000
    bc = broadcast if broadcast_ranks else (lambda df: df)

    r = nodes.select("node", F.lit(SCALE // n).cast("long").alias("rank")).persist()
    for _ in range(iterations):
        ranked = r.join(bc(out_deg), r["node"] == out_deg["src"], "left")
        shares = ranked.filter(F.col("out_deg").isNotNull()).select(
            F.col("src"), F.expr("rank div out_deg").alias("share")
        )
        contrib = (
            e.join(bc(shares), "src")
            .groupBy("dst")
            .agg(F.sum("share").alias("c"))
        )
        dangling = ranked.filter(F.col("out_deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0)).cast("long").alias("d")
        )
        nxt = (
            nodes.crossJoin(broadcast(dangling))
            .join(bc(contrib), nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({DAMP_NUM} * (coalesce(c, 0L) + (d div {n}))) div {DAMP_DEN}"
                    )
                ).cast("long").alias("rank"),
            )
        )
        # eager localCheckpoint: materializes AND truncates lineage — without
        # it the plan tree (and any cache-miss recompute) grows exponentially
        # in K, since each iteration references nodes/edges/r_t several times
        nxt = nxt.localCheckpoint(eager=True)
        r.unpersist()
        r = nxt
    for cached in (e, out_deg, nodes):
        cached.unpersist()
    return r


ANCHOR_RE = r'<a href="([^"]*)">([^<]*)</a>'


def anchor_text_rollup(pages: DataFrame, url_col: str, html_col: str) -> DataFrame:
    """Per-TARGET anchor-text aggregation over raw HTML pages — the classic
    web-corpus operator (anchor text is both a ranking signal and training
    text for the target document; cf. Brin & Page 1998 §2.2, MS MARCO/ORCAS
    anchor corpora).  The reference crawler never aggregates across pages;
    this is the cross-page rollup a 10^10-URL corpus needs.

    For every link target: ``in_degree`` (total incoming links),
    ``n_texts`` (distinct anchor strings), and ``top_text`` — the most
    FREQUENT anchor string, ties broken lexicographically (deterministic,
    oracle-exact).

    Scale shape (100 TB of HTML): link extraction is a JVM
    ``regexp_extract_all`` scan (codegen, no UDF, linear); the explode is
    bounded by links-per-page; aggregation happens in two partial-combined
    groupBys keyed on (target, text) then (target) — both well-mixed URL
    keys, no skew beyond genuinely popular targets, which a ``max_df``-style
    cap could demote if needed.  The raw page HTML never shuffles — only
    (href, text) pairs.
    """
    m = pages.select(
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_RE), F.lit(0))
        ).alias("m")
    ).select(
        F.regexp_extract("m", ANCHOR_RE, 1).alias("target_url"),
        F.regexp_extract("m", ANCHOR_RE, 2).alias("text"),
    )
    per_text = m.groupBy("target_url", "text").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("target_url").orderBy(F.col("cnt").desc(), F.col("text"))
    return (
        per_text.withColumn("rn", F.row_number().over(w))
        .groupBy("target_url")
        .agg(
            F.sum("cnt").alias("in_degree"),
            F.count(F.lit(1)).alias("n_texts"),
            F.max(F.when(F.col("rn") == 1, F.col("text"))).alias("top_text"),
        )
    )


HITS_SCALE = 10**6


def hits_fixed(
    edges: DataFrame, iterations: int = 2, broadcast_scores: bool | None = None
) -> DataFrame:
    """K-iteration integer HITS (Kleinberg 1999, "Authoritative sources in a
    hyperlinked environment") — the hub/authority companion to
    :func:`pagerank_fixed` for crawl prioritization: authority scores rank
    CONTENT pages worth fetching; hub scores rank LISTING pages worth
    re-crawling for fresh outlinks (the nrsr.sk member/session listing pages
    are textbook hubs; reference spiders hardcode that structure, this
    derives it from the link graph).

    Exact integer arithmetic so the result is hash-gated against a DuckDB
    oracle: start from h0(u) = SCALE div N; each half-step is an integer sum
    over edges followed by L1 renormalization ``v * SCALE div Σv`` (floor
    division — bit-identical in Spark ``div`` and DuckDB ``//``).  After
    renormalization every score is ≤ SCALE = 10^6 and the pre-normalization
    edge sums are bounded by SCALE · max_degree, so int64 never overflows
    below max_degree ≈ 10^12 — far beyond any real page's in/out degree.

    Returns (node:long, auth:long, hub:long).

    Scale shape (10^10 edges), two regimes on the score-join — same split as
    the seen-set's bloom broadcast regime (epoch_loop):

    * ``broadcast_scores`` (auto when N ≤ 2·10^6): the O(N) score table is a
      few tens of MB, so each half-step broadcast-hash-joins it onto the
      persisted edge table — the O(E) side never shuffles OR sorts, and the
      only exchange per step is the partial-aggregated O(N) groupBy.
    * shuffle regime (web scale, N ≫ broadcastable): TWO partitioned copies
      of the edge table (by src, by dst) persist once, so neither half-step
      ever re-exchanges the O(E) side — only the O(nonzero nodes) score
      table moves per step.

    Scores stay SPARSE inside the loop (nodes whose edge-sum is zero are
    simply absent — zeros contribute nothing to the next edge-sum nor to the
    L1 normalizer, so the values are bit-identical to the dense recurrence);
    densification to the full node set happens once, at the output.  The
    normalizer is a 1-row aggregate broadcast back; ``localCheckpoint``
    truncates per-half-step lineage exactly as in pagerank_fixed.
    """
    e = edges.select("src", "dst").distinct().persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # bounded driver scalar
    if broadcast_scores is None:
        # 2M nodes ≈ 32 MB of (node, score) longs — comfortably inside the
        # driver/executor broadcast budget even after hash-table inflation
        broadcast_scores = n <= 2_000_000
    if broadcast_scores:
        e_by_src = e_by_dst = e
        extra_cached: tuple[DataFrame, ...] = ()
    else:
        e_by_src = e.repartition("src").persist()
        e_by_dst = e.repartition("dst").persist()
        extra_cached = (e_by_src, e_by_dst)
    hub = nodes.select("node", F.lit(HITS_SCALE // n).cast("long").alias("score"))
    auth = None
    for _ in range(iterations):
        auth = _hits_half(e_by_src, hub, src_to_dst=True, bc=broadcast_scores)
        hub = _hits_half(e_by_dst, auth, src_to_dst=False, bc=broadcast_scores)
    out = (
        nodes.join(auth.withColumnRenamed("score", "auth"), "node", "left")
        .join(hub.withColumnRenamed("score", "hub"), "node", "left")
        .select(
            "node",
            F.coalesce("auth", F.lit(0)).cast("long").alias("auth"),
            F.coalesce("hub", F.lit(0)).cast("long").alias("hub"),
        )
    )
    out = out.localCheckpoint(eager=True)
    for cached in (e, nodes, *extra_cached):
        cached.unpersist()
    return out


def _hits_half(e: DataFrame, score: DataFrame, src_to_dst: bool, bc: bool = False) -> DataFrame:
    """One HITS half-step: propagate ``score`` across edges (src→dst for the
    authority update, dst→src for the hub update), then L1-renormalize to
    HITS_SCALE total mass in floor-division integer arithmetic.  ``bc``
    broadcast-joins the score table (small-N regime); otherwise ``e`` must
    be partitioned on the join key so the edge side never exchanges.  The
    result is sparse: nodes with zero edge-sum are absent (== score 0)."""
    key, other = ("src", "dst") if src_to_dst else ("dst", "src")
    keyed = score.withColumnRenamed("node", key)
    raw = (
        e.join(broadcast(keyed) if bc else keyed, key)
        .groupBy(F.col(other).alias("node"))
        .agg(F.sum("score").alias("v"))
    )
    total = raw.agg(F.coalesce(F.sum("v"), F.lit(1)).cast("long").alias("t"))
    nxt = raw.crossJoin(broadcast(total)).select(
        "node",
        F.expr(f"(v * {HITS_SCALE}L) div t").cast("long").alias("score"),
    )
    return nxt.localCheckpoint(eager=True)
