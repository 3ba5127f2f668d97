"""Redirect-chain resolution by pointer doubling.

Crawls accumulate a redirect map (301/302/canonical-tag: src → dst); the
frontier must collapse every known URL to its TERMINAL target before
dedup/scheduling, or chains get fetched link by link (the reference
follows redirects one hop per request — Scrapy's RedirectMiddleware; at
10^10 URLs the map must resolve in bulk instead).

Naive iteration walks one hop per round (O(longest chain) rounds);
pointer doubling composes the map with itself — f ← f∘f — so R rounds
resolve chains up to 2^R hops (the classic parallel pointer-jumping
trick, Wyllie 1979).  A URL still pointing into the map's domain after R
rounds sits on a chain longer than 2^R or a CYCLE and is flagged
unresolved — a loud signal, never silent truncation.

Scale shape: per round ONE self-equi-join of the O(|map|) state on the
follow pointer (both sides hash-partitioned on the join key) and a
localCheckpoint to truncate lineage; a final broadcast-or-shuffled left
join against the domain marks resolution.  Hops add exactly under
composition, so the oracle unrolls the identical recurrence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(edges: DataFrame, doublings: int = 3) -> DataFrame:
    """``edges`` is a functional map (src, dst) — one out-edge per src.
    Return (src, final_url, hops, resolved) for every src after
    ``doublings`` pointer-doubling rounds (resolves chains ≤ 2^doublings
    hops; longer chains and cycles come back resolved=false)."""
    state = edges.select(
        F.col("src"), F.col("dst").alias("nxt"), F.lit(1).cast("long").alias("hops")
    )
    for _ in range(doublings):
        s2 = state.select(
            F.col("src").alias("_s"),
            F.col("nxt").alias("_n"),
            F.col("hops").alias("_h"),
        )
        state = (
            state.join(s2, state["nxt"] == s2["_s"], "left")
            .select(
                "src",
                F.coalesce("_n", "nxt").alias("nxt"),
                (F.col("hops") + F.coalesce("_h", F.lit(0))).cast("long").alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
    domain = edges.select(F.col("src").alias("_d")).distinct()
    return (
        state.join(domain, state["nxt"] == domain["_d"], "left")
        .select(
            "src",
            F.col("nxt").alias("final_url"),
            "hops",
            F.col("_d").isNull().alias("resolved"),
        )
    )
