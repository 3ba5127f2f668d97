"""Driver-contract query exercising the Structured Streaming frontier path
(SURVEY §2.9): candidates written as a file-source stream → canonicalize →
watermarked streaming dedup → parquet sink → read back as a batch DataFrame.

The deduped *key set* is deterministic (which physical row wins a dup group
is not), so the query projects only the per-key-deterministic columns
(canon_url, host) and the DuckDB oracle reproduces them with DISTINCT over
the same synthetic construction.
"""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nrsr_crawler_spark.entry_queries import query
from nrsr_crawler_spark.sources.tpch import load


@query(
    "stream_dedup_urls",
    """
    SELECT DISTINCT
        'https://www.nrsr.sk/web/Default.aspx?id=' || (o_orderkey % 300) AS canon_url,
        'www.nrsr.sk' AS host
    FROM orders
    """,
)
def stream_dedup_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nrsr_crawler_spark.streaming import frontier_stream as FS

    cand = load(spark, sf_dir, "orders").select(
        F.concat(
            F.lit("HTTPS://WWW.NRSR.SK/web/Default.aspx?id="),
            F.col("o_orderkey") % 300,
        ).alias("url"),
        F.col("o_orderkey").alias("seq"),
        F.lit(0).alias("priority"),
        F.lit(0).alias("depth"),
        F.lit(dt.datetime(2024, 1, 1, 12, 0, 0)).alias("disc_ts"),
    )
    tmp = tempfile.mkdtemp(prefix="nrsr_stream_q_")
    src, out, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
    try:
        cand.write.parquet(src)
        fresh = FS.dedup_within_watermark(
            FS.prepare_stream(FS.candidate_stream(spark, src)), delay="10 minutes"
        )
        q = (
            fresh.select("canon_url", "host")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # materialize before the tmp dir is removed
        rows = spark.read.parquet(out).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, "canon_url string, host string")
