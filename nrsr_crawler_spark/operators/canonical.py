"""Canonical-URL cluster election — pick one representative URL per
canonical cluster.

The reference's dupefilter treats every distinct URL string as distinct
(reference ``nrsr/spiders/*.py`` re-request the exact listing URLs); a
web-scale frontier first collapses the http/https, ``www.``, tracking-param
and trailing-slash variants of the same page into one canonical cluster and
fetches a single elected representative (what search engines call URL
canonicalization / "canonical tag election").

The election is a deterministic argmin over the cluster:

  1. prefer https over http (``scheme_rank`` 0 < 1),
  2. then the shortest URL string,
  3. then the lexicographically smallest — a total order, so the winner is
     unique and engine-independent.

Scale shape: ONE map-side-combinable groupBy on the canonical key —
``min(struct(rank, len, url))`` folds in the combiner, so the shuffle
carries one candidate struct per (cluster × map partition), never the
variant list.  No window, no join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def elect_canonical(
    df: DataFrame,
    canon_col: str = "canon",
    url_col: str = "url",
) -> DataFrame:
    """Return (canon, rep_url, n_variants, n_https) — the elected
    representative per canonical cluster plus cluster stats."""
    url = F.col(url_col)
    is_https = url.startswith("https://")
    cand = F.struct(
        F.when(is_https, F.lit(0)).otherwise(F.lit(1)).alias("scheme_rank"),
        F.length(url).cast("long").alias("url_len"),
        url.alias("u"),
    )
    return (
        df.groupBy(canon_col)
        .agg(
            F.min(cand).alias("_best"),
            F.count(F.lit(1)).alias("n_variants"),
            F.sum(F.when(is_https, 1).otherwise(0)).cast("long").alias("n_https"),
        )
        .select(
            F.col(canon_col),
            F.col("_best.u").alias("rep_url"),
            F.col("n_variants"),
            F.col("n_https"),
        )
    )
