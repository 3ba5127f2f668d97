"""Crawl-order certification: recompute the reference's sequential LIFO
fetch order from the engine's logged edge lineage (SURVEY §7 hard part (a)).

The reference's order is inherently sequential (a single-threaded stack), so
a parallel engine cannot *execute* in that order without serializing — and
under the reference's politeness config (1 in-flight request, 2.5 s delay)
execution order is wall-clock-dominated anyway.  What the engine CAN do is
(1) fetch the same URL set, and (2) prove it knows the exact reference
order: replay the logged raw edge multiset (parent, child_idx, child URL —
document order, pre-dedup) through the same dupefilter+stack semantics the
simulator models.  ``certify_order`` does exactly that; tests assert it
equals the golden simulator order, and exact mode (budget=1) additionally
*executes* in that order.

Driver-side on collected edge metadata: O(V+E) over (hash, idx) pairs —
the page bodies never leave the cluster.  At 10^10 scale one certifies
per-subtree prefixes instead of the full order (the full order is a
10^10-long sequence; materializing it IS the output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nrsr_crawler_spark.lake.table import EpochLake


def certify_order(
    spark: SparkSession,
    lake: EpochLake,
    allow=lambda canon: True,
) -> list[dict]:
    """Replay LIFO order from logged lineage; returns the reference fetch
    order as [{fetch_seq, canon_url, url_hash, depth, parent_url}]."""
    edges_df = lake.read_all(spark, "edges")
    frontier0 = spark.read.parquet(lake.delta_path("frontier", 0))
    seeds = [
        (r["seq"], r["canon_url"], r["url_hash"])
        for r in frontier0.select("seq", "canon_url", "url_hash").collect()
    ]
    seeds.sort()
    rows = edges_df.select("parent_hash", "child_idx", "canon_url", "url_hash").collect()
    children: dict[int, list[tuple[int, str, int]]] = {}
    for r in rows:
        if r["canon_url"] is None:
            continue
        children.setdefault(r["parent_hash"], []).append((r["child_idx"], r["canon_url"], r["url_hash"]))
    for v in children.values():
        v.sort()

    stack: list[tuple[str, int, int, str | None]] = []  # (canon, hash, depth, parent)
    seen: set[int] = set()
    order: list[dict] = []

    def schedule(canon: str, h: int, depth: int, parent: str | None) -> None:
        if h in seen or not allow(canon):
            return
        seen.add(h)
        stack.append((canon, h, depth, parent))

    for _, canon, h in seeds:
        schedule(canon, h, 0, None)
    seq = 0
    while stack:
        canon, h, depth, parent = stack.pop()
        order.append(
            {"fetch_seq": seq, "canon_url": canon, "url_hash": h, "depth": depth, "parent_url": parent}
        )
        seq += 1
        for _, c_canon, c_hash in children.get(h, []):
            schedule(c_canon, c_hash, depth + 1, canon)
    return order
