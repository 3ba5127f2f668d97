"""URL structure profiling — per-host path-depth × query-string histogram.

Crawl-scope decisions (how deep to crawl, whether a host is mostly
faceted-search noise) start from the shape of its URL space: a host whose
frontier mass sits at depth ≥ 5 with query strings is a trap candidate
(operators/traps.py demotes templates; this report is the host-level
aggregate view), one with shallow static paths is cheap to exhaust.

Scale shape: depth and has_query are pure codegen string expressions
(slash count on the stripped path — no parse_url, no UDF); ONE partial-
agg groupBy (host, depth, has_query); host totals are an O(hosts) table
broadcast back for exact share basis points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def depth_profile(frontier: DataFrame, url_col: str = "url") -> DataFrame:
    """Return (host, depth, has_query, n_urls, share_bps) where depth is
    the number of path segments and share is of the host's URL count."""
    no_scheme = F.regexp_replace(F.col(url_col), r"^https?://", "")
    host = F.regexp_extract(no_scheme, r"^([^/?]*)", 1)
    rest = F.regexp_replace(no_scheme, r"^[^/?]*", "")
    path = F.regexp_replace(rest, r"\?.*$", "")
    depth = (F.length(path) - F.length(F.regexp_replace(path, "/", ""))).cast("long")
    shaped = frontier.select(
        host.alias("host"),
        depth.alias("depth"),
        F.col(url_col).contains("?").alias("has_query"),
    )
    cells = shaped.groupBy("host", "depth", "has_query").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls")
    )
    totals = cells.groupBy("host").agg(F.sum("n_urls").alias("_tot"))
    return (
        cells.join(broadcast(totals), "host")
        .withColumn("share_bps", F.expr("n_urls * 10000 div _tot").cast("long"))
        .select("host", "depth", "has_query", "n_urls", "share_bps")
    )
