"""Bucketed storage layout for the URL-seen store — the co-located-join
lever at 100 TB.

The epoch loop's seen-set probe is an anti-join of this epoch's candidate
URLs against the accumulated seen keys.  Partition/bloom regimes solve it
with broadcasts or cogrouped Arrow probes; the THIRD regime at true
10^10-URL scale is a storage-layout one: persist both sides bucketed on
``url_hash`` into the same bucket count (Spark ``bucketBy``; on Iceberg the
``bucket(N, url_hash)`` partition transform — this module is the sandbox
stand-in, same contract).  Then every epoch's probe join is co-located:
Catalyst plans a SortMergeJoin over the pre-bucketed scans with ZERO
Exchange on either side — the O(frontier) shuffle disappears from the
steady-state loop entirely, leaving only the (tiny) delta write.

The win compounds at scale: the seen side is the biggest table in the
system (10^10 keys ≈ 80+ GB of hashes) and would otherwise re-shuffle every
epoch; bucketed, it is written once per compaction and only ever scanned
in place.  Bucket count is fixed at write time — size it to keys/2^27 or so
(≤ ~1 GB/bucket) and rewrite (compaction) to re-bucket when the store
outgrows it.

``tests/test_bucketed_store.py`` plan-gates the no-Exchange property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ensure_db(spark: SparkSession, db: str, location: str) -> None:
    """Create the catalog database pinned to an explicit filesystem location
    (the lake root) so bucketed tables live next to the epoch deltas, not in
    a cwd-relative spark-warehouse."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{location}'")


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    key: str = "url_hash",
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed AND sorted on ``key``.

    Sorting within buckets means the SMJ reads both sides pre-sorted (no
    per-task sort at 1 GB/bucket scale matters), and that point lookups can
    binary-search row groups via parquet min/max.

    Overwrite is made idempotent ACROSS sessions: a fresh session's
    metastore does not know tables a previous session wrote, so a bare
    ``saveAsTable`` would attempt CREATE and fail on the leftover directory
    (LOCATION_ALREADY_EXISTS).  We drop the catalog entry if present and
    clear a stray location the catalog lost track of before writing.
    """
    if mode == "overwrite":
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        if "." in table:
            db, name = table.split(".", 1)
            try:
                loc_row = [
                    r
                    for r in spark.sql(f"DESCRIBE DATABASE {db}").collect()
                    if r[0].strip().lower() in ("location", "location uri")
                ]
                if loc_row:
                    import shutil
                    from urllib.parse import urlparse

                    p = urlparse(loc_row[0][1]).path
                    if p:
                        shutil.rmtree(f"{p.rstrip('/')}/{name}", ignore_errors=True)
            except Exception:
                pass  # db may not exist yet — CREATE below will place it
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def bucketed_anti_join(
    spark: SparkSession, cand_table: str, seen_table: str, key: str = "url_hash"
) -> DataFrame:
    """This epoch's unseen candidates: LEFT ANTI join of two tables bucketed
    on ``key`` with the same bucket count — planned WITHOUT any Exchange.

    The merge hint pins SortMergeJoin (a broadcast would also be
    exchange-free on the probe side but re-broadcasts the seen store every
    epoch, which is exactly what this layout avoids at 10^10 keys).
    """
    cand = spark.table(cand_table)
    seen = spark.table(seen_table).hint("merge")
    return cand.join(seen, key, "left_anti")


def bucketed_equi_join(
    spark: SparkSession, left_table: str, right_table: str, key: str = "url_hash"
) -> DataFrame:
    """Generic co-located equi-join over same-bucket-count tables (e.g.
    fetch_log enrichment against the frontier) — same zero-Exchange plan."""
    lt = spark.table(left_table)
    rt = spark.table(right_table).hint("merge")
    return lt.join(rt, key, "inner")


def probe_plan_is_colocated(df: DataFrame) -> bool:
    """True iff the physical plan contains a SortMergeJoin and no Exchange —
    the property the bucketed layout exists to guarantee."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "SortMergeJoin" in plan and "Exchange" not in plan
