"""Leak-safe train/val/test split assignment.

The classic training-data failure: random per-document splits put one copy
of a near-duplicate pair in train and the other in val/test, leaking the
eval set into training (the measured motivation behind dedup in Lee et al.,
arXiv:2107.06499 §6.2 — models memorize what the split was supposed to hold
out).  The fix is GROUP-CONSISTENT assignment: connected components over
the near-dup pair graph, every member of a component adopting the split of
its representative, so no edge can straddle a split boundary.

Determinism/portability: the raw split is the first hex nibble of
``md5(id)`` (16 bands — identical string md5 in Spark and DuckDB, no
engine hash); the representative is the component's min id (same convention
as the CC kernel); the final split is the REPRESENTATIVE's raw split.

Scale shape (100 TB): banding is one codegen expression; components come
from the bounded-round min-label propagation kernel
(operators/image_dedup.phash_connected_groups — modality-generic, O(edges +
nodes) per round, near-dup diameters are small); the rep-split lookup is a
self-equi-join of the label table on the rep id — linear, hash-partitioned
on well-mixed ids, no window over the corpus, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# hex nibbles → split, 16 bands: 1 val + 1 test + 14 train (≈ 6.25% each)
VAL_BANDS: tuple[str, ...] = ("0",)
TEST_BANDS: tuple[str, ...] = ("1",)


def split_band(id_col: Column) -> Column:
    """First hex nibble of md5(id) — the deterministic 16-band split key."""
    return F.substring(F.md5(id_col.cast("string")), 1, 1)


def raw_split(id_col: Column) -> Column:
    b = split_band(id_col)
    return (
        F.when(b.isin(*VAL_BANDS), F.lit("val"))
        .when(b.isin(*TEST_BANDS), F.lit("test"))
        .otherwise(F.lit("train"))
    )


def assign_splits_leak_safe(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Group-consistent split assignment over the near-dup graph.

    ``docs`` needs ``id_col``; ``pairs`` is the verified near-dup edge set
    ``(id_a, id_b)`` (e.g. minhash_lsh_dedup output).  Returns one row per
    document: ``(id, group_id, split_raw, split_final, moved)`` where
    ``group_id`` is the component representative (min id), ``split_final``
    is the representative's raw split, and ``moved`` marks documents whose
    raw split was overridden — exactly the documents that WOULD have leaked.
    """
    from nrsr_crawler_spark.operators.image_dedup import phash_connected_groups

    labels = phash_connected_groups(
        pairs.select("id_a", "id_b"), docs.select(id_col), id_col=id_col
    )
    # the rep is itself a document id: its split is a pure expression of it —
    # no second lookup against docs needed
    rep_split = labels.select(F.col("rep").alias("group_id")).distinct().select(
        "group_id", raw_split(F.col("group_id")).alias("split_final")
    )
    return (
        labels.withColumn("split_raw", raw_split(F.col(id_col)))
        .withColumnRenamed("rep", "group_id")
        .join(rep_split, "group_id")
        .select(
            F.col(id_col),
            "group_id",
            "split_raw",
            "split_final",
            (F.col("split_raw") != F.col("split_final")).alias("moved"),
        )
    )


def split_leakage_report(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """The WOULD-HAVE-LEAKED edges: near-dup pairs whose raw (per-document)
    splits differ — each one a train/eval contamination the group-consistent
    assignment prevents.  Returns ``(id_a, id_b, split_a, split_b)``."""
    e = pairs.select("id_a", "id_b")
    return (
        e.withColumn("split_a", raw_split(F.col("id_a")))
        .withColumn("split_b", raw_split(F.col("id_b")))
        .filter(F.col("split_a") != F.col("split_b"))
    )
