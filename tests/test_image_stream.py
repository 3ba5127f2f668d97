"""Streaming image ingest (streaming/image_stream.py): the batch quality
kernel streamed, phash re-crawl suppression with bounded state, windowed
flag metrics."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from nrsr_crawler_spark.operators import image_quality as IQ
from nrsr_crawler_spark.sources.images import encode_image, original_pixels, phash64
from nrsr_crawler_spark.streaming import image_stream as IS

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _img_row(image_id, mode, offset_s, px_src=None):
    px = IQ.degrade_pixels(px_src if px_src is not None else original_pixels(image_id), mode, image_id)
    data = encode_image(px, "png")
    return (image_id, data, phash64(px), T0 + dt.timedelta(seconds=offset_s))


def _drain(stream_df, output_mode="update"):
    got = []

    def sink(batch_df, batch_id):
        got.extend(batch_df.collect())

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return got


def test_score_stream_matches_batch_gate(spark, tmp_path):
    rows = [
        _img_row("ok1", "ok", 0),
        _img_row("ok2", "ok", 10),
        _img_row("fl1", "flat", 20),
        _img_row("cl1", "clipped", 30),
    ]
    src = str(tmp_path / "events")
    spark.createDataFrame(rows, IS.IMAGE_EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    scored = _drain(IS.score_stream(IS.image_event_stream(spark, src)), "append")
    flags = {r.image_id: r.flag for r in scored}
    assert flags == {"ok1": "ok", "ok2": "ok", "fl1": "flat", "cl1": "clipped"}

    # streamed signals == batch kernel signals
    batch = {
        r.image_id: (r.entropy_cbits, r.clipped_bps, r.std_cpx)
        for r in IQ.quality_stats(
            spark.createDataFrame(
                [(r[0], r[1]) for r in rows], "image_id string, bytes binary"
            )
        ).collect()
    }
    for r in scored:
        assert (r.entropy_cbits, r.clipped_bps, r.std_cpx) == batch[r.image_id]


def test_phash_dedup_suppresses_recrawl(spark, tmp_path):
    base = original_pixels("imgA")
    rows = [
        _img_row("a-first", "ok", 0, base),
        _img_row("a-again", "ok", 5, base),  # identical pixels → same phash
        _img_row("b-other", "ok", 10),
    ]
    src = str(tmp_path / "events")
    spark.createDataFrame(rows, IS.IMAGE_EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    out = _drain(IS.dedup_by_phash(IS.score_stream(IS.image_event_stream(spark, src))))
    ids = sorted(r.image_id for r in out)
    assert len(ids) == 2 and "b-other" in ids
    assert len([i for i in ids if i.startswith("a-")]) == 1


def test_windowed_quality_metrics(spark, tmp_path):
    rows = [
        _img_row("w1a", "ok", 0),
        _img_row("w1b", "flat", 30),
        _img_row("w2a", "ok", 70),
        _img_row("w2b", "ok", 80),
        # late watermark driver so windows close
        _img_row("late", "ok", 600),
    ]
    src = str(tmp_path / "events")
    spark.createDataFrame(rows, IS.IMAGE_EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    metrics = _drain(
        IS.windowed_quality_metrics(IS.score_stream(IS.image_event_stream(spark, src))),
        "append",
    )
    got = {(r.win_start.minute, r.flag): r.n_images for r in metrics}
    assert got[(0, "ok")] == 1 and got[(0, "flat")] == 1
    assert got[(1, "ok")] == 2
