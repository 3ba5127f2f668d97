"""WARC/CDX archive planning — lay fetched records out into WARC shard
files with exact byte offsets and Common-Crawl-style revisit dedup.

The reference crawler writes each fetched page straight into per-type
stores (reference ``nrsr/pipelines.py`` upsert sinks); a web-scale crawl
instead appends raw fetches to WARC segment files and serves lookups from a
CDX index of (url, file, offset, length).  Common Crawl additionally
replaces byte-identical refetches with tiny ``revisit`` records pointing at
the first ``response`` record for that payload digest (the WARC 1.1
deduplication profile).  This module plans that layout as a pure
DataFrame computation:

 - ``response`` vs ``revisit``: the first URL (deterministic min) per
   payload digest owns the full record; every other fetch of the same
   digest becomes a fixed-size revisit stub.
 - shard assignment: hash prefix of the URL — at 100 TB the prefix is
   widened so each shard maps to one target segment file of a few GB.
 - byte offsets: running total of record lengths within each shard in the
   deterministic order (md5(url), url).  The window is PARTITIONED BY
   shard — shard count grows with the data, so no partition (and no
   reducer) ever sees more than one segment file's worth of records; there
   is no global funnel.

Everything is BIGINT arithmetic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: WARC header overhead charged to a full response record (bytes).
RESPONSE_HEADER_BYTES = 200
#: Fixed size of a revisit stub record (headers only, no payload).
REVISIT_RECORD_BYTES = 120


def warc_plan(
    df: DataFrame,
    url_col: str = "url",
    digest_col: str = "digest",
    payload_len_col: str = "payload_len",
    shard_prefix_chars: int = 1,
) -> DataFrame:
    """Return (url, shard, rec_type, rec_len, byte_offset) per fetch row.

    ``rec_type`` is ``response`` for the minimum URL per digest and
    ``revisit`` otherwise; ``rec_len`` is header+payload for responses and
    the fixed stub size for revisits; ``byte_offset`` is the exclusive
    running byte total within the shard under the order (md5(url), url),
    i.e. the byte position at which the record starts in its segment file.

    Two shuffles: one on digest (response election), one on shard (offset
    window).  Both partition counts scale with the input.
    """
    url = F.col(url_col)
    ok = F.md5(url.cast("string"))
    keyed = df.withColumn("_ok", ok).withColumn(
        "shard", F.substring("_ok", 1, shard_prefix_chars)
    )
    w_digest = Window.partitionBy(digest_col)
    elected = keyed.withColumn(
        "rec_type",
        F.when(url == F.min(url).over(w_digest), F.lit("response")).otherwise(
            F.lit("revisit")
        ),
    )
    rec_len = F.when(
        F.col("rec_type") == "response",
        F.lit(RESPONSE_HEADER_BYTES) + F.col(payload_len_col).cast("long"),
    ).otherwise(F.lit(REVISIT_RECORD_BYTES))
    sized = elected.withColumn("rec_len", rec_len.cast("long"))
    w_shard = (
        Window.partitionBy("shard")
        .orderBy("_ok", url_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return sized.withColumn(
        "byte_offset", F.coalesce(F.sum("rec_len").over(w_shard), F.lit(0)).cast("long")
    ).select(url_col, "shard", "rec_type", "rec_len", "byte_offset")
