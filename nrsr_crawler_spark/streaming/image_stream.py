"""Streaming image ingest: decode → quality-gate → dedup → windowed metrics.

The streaming face of the image axis: as the crawler lands image+caption
rows (input_hint shape) continuously, a Structured Streaming job scores
decoded pixels (operators/image_quality.py — the SAME kernel as batch, one
Arrow pass; mapInPandas is fully streamable), suppresses exact perceptual
re-crawls with watermark-bounded state, and emits windowed per-flag counts
for pipeline monitoring.

Scale shape: decode is per-partition streaming (no state); the phash dedup
keeps state only inside the watermark horizon (O(ingest rate × horizon),
the same trade as the URL stream's dedup_within_watermark); metrics are a
map-side-combinable windowed count.  On a cluster the file source becomes
``format('kafka')`` with identical semantics.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from nrsr_crawler_spark.operators.image_quality import pixel_quality, quality_flag
from nrsr_crawler_spark.operators.multimodal import _decode_any

IMAGE_EVENT_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("phash", LongType()),
        StructField("fetch_ts", TimestampType()),
    ]
)

_SCORED_SCHEMA = (
    "image_id string, phash long, fetch_ts timestamp, entropy_cbits int, "
    "clipped_bps int, std_cpx int, dyn_range int, edge_bps int"
)


def image_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(IMAGE_EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def score_stream(raw: DataFrame) -> DataFrame:
    """Decode + quality signals in one Arrow pass, event-time column kept
    for downstream watermarking; flag gate stays a column expression."""

    def _gen(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "image_id", "phash", "fetch_ts", "entropy_cbits", "clipped_bps",
                "std_cpx", "dyn_range", "edge_bps",
            )}
            for iid, data, ph, ts in zip(
                pdf["image_id"], pdf["bytes"], pdf["phash"], pdf["fetch_ts"]
            ):
                px, _fmt = _decode_any(bytes(data))
                e, c, s, r, g = pixel_quality(px)
                out["image_id"].append(iid)
                out["phash"].append(ph)
                out["fetch_ts"].append(ts)
                out["entropy_cbits"].append(e)
                out["clipped_bps"].append(c)
                out["std_cpx"].append(s)
                out["dyn_range"].append(r)
                out["edge_bps"].append(g)
            yield pd.DataFrame(out)

    scored = raw.mapInPandas(_gen, schema=_SCORED_SCHEMA)
    return scored.withColumn("flag", quality_flag())


def dedup_by_phash(scored: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Suppress exact perceptual re-crawls (identical phash) with
    watermark-bounded state — the streaming complement of the batch
    pigeonhole near-dup join (operators/image_dedup.py), which handles
    the d≤7 Hamming neighbourhood in the lake."""
    return scored.withWatermark("fetch_ts", delay).dropDuplicatesWithinWatermark(
        ["phash"]
    )


def windowed_quality_metrics(
    scored: DataFrame, window: str = "1 minute", delay: str = "2 minutes"
) -> DataFrame:
    """Per-window per-flag counts + mean entropy — the ingest health panel."""
    return (
        scored.withWatermark("fetch_ts", delay)
        .groupBy(F.window("fetch_ts", window).alias("win"), "flag")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.avg("entropy_cbits").cast("long").alias("avg_entropy_cbits"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "flag",
            "n_images",
            "avg_entropy_cbits",
        )
    )
