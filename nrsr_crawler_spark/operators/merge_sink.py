"""Keyed upsert-with-archive sink (SURVEY §2.1 S6 / §2.3 J1).

Re-expresses /root/reference/nrsr/pipelines.py:34-145 as set-based DataFrame
logic instead of per-item Mongo round-trips:

 - per-type composite natural keys (the ``match_dict`` dispatch,
   pipelines.py:37-131) → ``NATURAL_KEYS``;
 - change detection ``doc2 != dict(item)`` (pipelines.py:138) → xxhash64 over
   all non-key columns;
 - archive-then-replace of changed rows (pipelines.py:139-140) → the old row
   version is appended to an ``archived`` output;
 - unchanged rows are skipped (pipelines.py:141-142), new keys inserted
   (pipelines.py:143-144).

At scale this is exactly Iceberg's ``MERGE INTO target USING batch ON keys``
(row-level-delete table) plus an ``INSERT INTO archived`` of the matched+
changed old rows.  The classification join is batch→current LEFT (output and
shuffle ∝ batch, with matched-key pruning on the store side at deploy);
``upserts``/``archived``/``actions`` are all batch-sized.  Only the
``merged`` full-store view touches every current row — and it is LAZY (an
anti-join of the store against the batch-sized upsert keys plus a union), so
callers that land the result as a MERGE/delta write ``upserts`` and never
materialize it: write volume ∝ batch size, not store size.  The batch side
is deduplicated on the natural key first (last writer in the batch wins,
matching the sequential pipeline where later items overwrite earlier ones).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import NamedTuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# match_dict dispatch table, pipelines.py:37-131
NATURAL_KEYS: dict[str, tuple[str, ...]] = {
    "member": ("type", "external_id", "period_num"),
    "member_change": ("type", "external_id", "period_num", "change_type", "date"),
    "press": ("type", "press_num", "period_num"),
    "session": ("type", "external_id", "period_num"),
    "club": ("type", "external_id", "period_num"),
    "voting": ("type", "external_id", "period_num", "press_num"),
    "daily_club": ("type", "period_num", "date"),
    "bill": ("type", "period_num", "external_id"),
    "bill_step": ("type", "bill_id", "external_id"),
    "debate_appearance": ("type", "external_id"),
    "interpellation": ("type", "external_id"),
    "amendment": ("type", "external_id"),
    "hour_of_questions": ("type", "external_id"),
    "committee": ("type", "external_id"),
    "committeeschedule": ("type", "date", "time"),
}


class MergeResult(NamedTuple):
    merged: DataFrame     # new state of the store (lazy full view; see module doc)
    archived: DataFrame   # old versions of changed rows (append to archive)
    actions: DataFrame    # key columns + action ∈ {insert, update, unchanged}
    upserts: DataFrame    # the insert+update rows — the Iceberg MERGE payload


def natural_keys_for(item_type: str) -> tuple[str, ...]:
    try:
        return NATURAL_KEYS[item_type]
    except KeyError:
        # pipelines.py:130-131 raises on unknown type
        raise ValueError(f"unknown type {item_type}") from None


def row_hash(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """64-bit change-detection hash over all non-key columns (sorted by name
    for determinism) — the set-based ``doc2 != dict(item)``."""
    value_cols = sorted(c for c in df.columns if c not in keys)
    return df.withColumn(
        "__vhash", F.xxhash64(*[F.col(c).cast("string") for c in value_cols])
    )


def merge_upsert(
    current: DataFrame,
    batch: DataFrame,
    keys: Sequence[str],
    batch_order_col: str | None = None,
) -> MergeResult:
    """Apply the reference's upsert-with-archive semantics set-wise.

    ``batch_order_col``: if given, dedupe the batch keeping the row with the
    highest value per key (sequential last-writer-wins); otherwise the batch
    must already be key-unique.
    """
    keys = list(keys)
    if batch_order_col is not None:
        w = Window.partitionBy(*keys).orderBy(F.col(batch_order_col).desc())
        batch = (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", batch_order_col)
        )
    cur = row_hash(current, keys)
    new = row_hash(batch, keys)

    # classification: batch LEFT current — output (and, with Iceberg
    # matched-key pruning, the store-side read) is ∝ batch size.  Rows only
    # in ``current`` never enter this join; they survive via the anti-join in
    # the ``merged`` view below.  Key equality is NULL-SAFE (ADVICE r2): the
    # voting key includes press_num which is legitimately NULL when the page
    # has no press ref — the reference omits absent keys from match_dict
    # (pipelines.py:37-131), i.e. NULL matches NULL; plain ``=`` would
    # re-classify such rows as insert every batch and duplicate them.  This
    # also keeps merge_upsert consistent with typed_store's window path
    # (partitionBy groups NULLs together).
    cond = [F.col(f"n.{k}").eqNullSafe(F.col(f"c.{k}")) for k in keys]
    joined = new.alias("n").join(cur.alias("c"), on=cond, how="left")
    action = (
        F.when(F.col("c.__vhash").isNull(), F.lit("insert"))
        .when(F.col("n.__vhash") == F.col("c.__vhash"), F.lit("unchanged"))
        .otherwise(F.lit("update"))
    )
    classified = joined.withColumn("__action", action)

    value_cols = [c for c in current.columns if c not in keys]
    n_keys = [F.col(f"n.{k}").alias(k) for k in keys]
    upserts = classified.filter(F.col("__action").isin("insert", "update")).select(
        *n_keys, *[F.col(f"n.{c}").alias(c) for c in value_cols]
    )
    archived = classified.filter(F.col("__action") == "update").select(
        *[F.col(f"c.{k}").alias(k) for k in keys],
        *[F.col(f"c.{c}").alias(c) for c in value_cols],
    )
    actions = classified.select(*n_keys, F.col("__action").alias("action"))
    up_keys = upserts.select(*keys)
    merged = current.alias("s").join(
        up_keys.alias("u"),
        on=[F.col(f"s.{k}").eqNullSafe(F.col(f"u.{k}")) for k in keys],
        how="left_anti",
    ).unionByName(upserts)
    return MergeResult(merged=merged, archived=archived, actions=actions, upserts=upserts)
