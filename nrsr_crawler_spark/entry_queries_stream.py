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


@query(
    "stream_image_quality",
    """
    SELECT TIMESTAMP '2024-01-01 12:00:00'
               + ((c_custkey // 60) * 60) * INTERVAL 1 SECOND AS win_start,
           CASE c_custkey % 7 WHEN 0 THEN 'flat' WHEN 1 THEN 'clipped'
                ELSE 'ok' END AS flag,
           COUNT(*) AS n_images
    FROM customer WHERE c_custkey <= 240
    GROUP BY 1, 2
    """,
)
def stream_image_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming image ingest (streaming/image_stream.py): decode + quality
    gate + windowed per-flag counts, run availableNow over a deterministic
    event fixture (flags planted by key arithmetic, one far-future sentinel
    event advances the watermark so every real window closes and flushes in
    append mode).  The oracle reproduces the closed windows' counts; the
    pixel-level signal exactness is covered by images_quality_gate."""
    import datetime as dt

    from nrsr_crawler_spark.operators import image_quality as IQ
    from nrsr_crawler_spark.streaming import image_stream as IS

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    modes = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 240)
        .select(
            F.format_string("img%010d", F.col("c_custkey")).alias("image_id"),
            F.lit("cap").alias("caption"),
            F.when(F.pmod(F.col("c_custkey"), F.lit(7)) == 0, F.lit("flat"))
            .when(F.pmod(F.col("c_custkey"), F.lit(7)) == 1, F.lit("clipped"))
            .otherwise(F.lit("ok"))
            .alias("mode"),
            F.col("c_custkey").alias("offset_s"),
        )
    )
    imgs = IQ.build_degraded_images(spark, modes.drop("offset_s"))
    events = imgs.join(
        modes.select("image_id", "offset_s"), "image_id"
    ).select(
        "image_id",
        "bytes",
        "phash",
        (F.lit(t0) + F.make_interval(secs=F.col("offset_s").cast("double"))).alias("fetch_ts"),
    )
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="nrsr_imgstream_q_")
    src, out, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
    try:
        # sentinel must carry decodable bytes — give it a real flat image
        from nrsr_crawler_spark.sources.images import encode_image
        import numpy as np

        sent_bytes = encode_image(np.full((8, 8), 7, dtype=np.uint8), "png")
        sentinel = spark.createDataFrame(
            [("sentinel", sent_bytes, 0, t0 + dt.timedelta(seconds=100000))],
            IS.IMAGE_EVENT_SCHEMA,
        )
        events.unionByName(sentinel).write.parquet(src)
        metrics = IS.windowed_quality_metrics(
            IS.score_stream(IS.image_event_stream(spark, src))
        )
        q = (
            metrics.select("win_start", "flag", "n_images")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = spark.read.parquet(out).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, "win_start timestamp, flag string, n_images long")


@query(
    "stream_sessionize",
    """
    WITH e AS (SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events),
    l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
    f AS (SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS brk FROM l),
    s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_seq FROM f)
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events, MIN(us) AS start_us, MAX(us) AS end_us
    FROM s GROUP BY user_id, session_seq
    """,
)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming sessionization (applyInPandasWithState) over the
    events table: per-user far-future sentinel events force every REAL
    session closed inline, so the emitted closed-session set equals the
    batch gap-sessionize — and the relational oracle — exactly.  (The
    sentinels' own sessions stay open and are never emitted.)"""
    from nrsr_crawler_spark.streaming import frontier_stream as FS

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    far = ev.agg(F.max("ts").alias("m")).collect()[0]["m"] + dt.timedelta(days=10)
    sentinels = (
        ev.select("user_id")
        .distinct()
        .select(
            (-F.col("user_id") - 1).alias("event_id"),
            "user_id",
            F.lit(far).alias("ts"),
        )
    )
    tmp = tempfile.mkdtemp(prefix="nrsr_stream_sess_")
    src, out, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
    try:
        ev.unionByName(sentinels).write.parquet(src)
        stream = spark.readStream.schema(
            "event_id long, user_id long, ts timestamp"
        ).parquet(src)
        closed = FS.sessionize_stream(
            stream, key_col="user_id", ts_col="ts", id_col="event_id",
            gap_seconds=1800,
        )
        q = (
            closed.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = spark.read.parquet(out).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "user_id long, session_seq long, n_events long, start_us long, end_us long",
    )
