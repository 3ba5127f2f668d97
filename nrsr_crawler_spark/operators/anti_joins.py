"""Store-diff anti-join jobs (SURVEY §2.3 J2/J3).

Re-expresses the reference's two reconciliation spiders as pure DataFrame
dataflows:

 - ``missing_keys``      ≙ missing_members: keys present in a change-log but
   absent from the entity table (/root/reference/nrsr/spiders/
   missing_members.py:23-44 — Mongo find ×2, client-side sort + set diff).
 - ``missing_refs``      ≙ missing_presses: wanted = refs from two sources
   (one requiring an explode of a nested list) unioned, minus having
   (/root/reference/nrsr/spiders/missing_presses.py:25-50 — find + $unwind
   aggregation + set difference).

Scale notes: both are LEFT ANTI equi-joins.  The "having" side (the entity
table's key projection) is typically orders of magnitude smaller than the
fact side after column pruning — AQE picks broadcast-hash when it fits,
sort-merge otherwise; no hints needed.  Keys are projected before the join so
the shuffle moves only key columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def missing_keys(changes: DataFrame, entities: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Distinct key-tuples in ``changes`` that do not exist in ``entities``.

    Mirrors missing_members.py:39 (``set(changes) - set(members)``) with a
    left-anti join; ``dropDuplicates`` before the join shrinks the probe side.
    """
    left = changes.select(*keys).dropDuplicates(list(keys))
    right = entities.select(*keys).dropDuplicates(list(keys))
    return left.join(right, on=list(keys), how="left_anti")


def missing_refs(
    wanted_flat: DataFrame,
    wanted_nested: DataFrame,
    nested_col: str,
    ref_col: str,
    having: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """missing_presses dataflow: ``(flat ∪ explode(nested)) − having``.

    ``wanted_nested`` carries an array column ``nested_col`` whose elements
    (structs or scalars) contain the ref; explode ≙ Mongo ``$unwind``
    (missing_presses.py:32-36).  Nulls in the ref are dropped, matching the
    ``if 'press_num' in x and x['press_num']`` guard (line 37).
    """
    w1 = wanted_flat.select(*keys)
    w2 = (
        wanted_nested.select(
            *[c for c in keys if c != ref_col],
            F.explode(nested_col).alias("__ref"),
        )
        .withColumn(ref_col, F.col("__ref"))
        .select(*keys)
    )
    wanted = (
        w1.unionByName(w2)
        .filter(F.col(ref_col).isNotNull())
        .dropDuplicates(list(keys))
    )
    return wanted.join(having.select(*keys).dropDuplicates(list(keys)), on=list(keys), how="left_anti")


def normalize_list_first(c: Column) -> Column:
    """``x[0] if isinstance(x, list) else x`` (missing_presses.py:47-48):
    for columns that may carry a single-element list, take the first element."""
    return F.element_at(c, 1)
