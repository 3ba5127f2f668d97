"""Co-citation relatedness pairs over the link graph.

Two pages repeatedly linked FROM the same documents are related (Small
1973 co-citation; the web version underlies "related pages" and crawl
seed-set expansion — a frontier can boost unfetched URLs co-cited with
known-good pages).  The mirror notion (bibliographic coupling — shared
OUT-links) is the same join with edge direction flipped.

Scale shape: the quadratic danger is a hub citer linking n pages → n²
pairs.  Citers above ``max_out`` out-degree are dropped before pairing
(stop-shingle semantics: a page citing everything carries no relatedness
signal anyway — same reasoning as the triangles/LSH hot-bucket caps), so
per-citer fan-out is bounded by a constant and the pair join is linear
in edges.  One degree groupBy, one broadcast semi-join drop, one
self-equi-join on citer, one partial-agg pair count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def cocitation_pairs(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    min_common: int = 2,
    max_out: int = 16,
) -> DataFrame:
    """Return (id_a, id_b, n_common): pairs of distinct ``dst`` nodes
    co-cited by ≥ ``min_common`` shared ``src`` citers (id_a < id_b),
    counting only citers with out-degree ≤ ``max_out``."""
    e = edges.select(F.col(src_col).alias("citer"), F.col(dst_col).alias("cited")).distinct()
    deg = e.groupBy("citer").agg(F.count(F.lit(1)).alias("_out"))
    cool = e.join(
        broadcast(deg.filter(F.col("_out") <= max_out).select("citer")), "citer"
    )
    a = cool.select("citer", F.col("cited").alias("id_a"))
    b = cool.select("citer", F.col("cited").alias("id_b"))
    return (
        a.join(b, "citer")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
