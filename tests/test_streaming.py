"""Structured Streaming frontier tests (SURVEY §2.9 streaming skin).

Covers: file-source ingest, watermarked streaming dedup
(dropDuplicatesWithinWatermark ≙ J4 with bounded state), the stateful
per-host fetch-slot pacer (applyInPandasWithState — slots continue across
micro-batches), windowed metrics, and the end-to-end foreachBatch pop
pipeline with checkpointed restart.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from nrsr_crawler_spark.streaming import frontier_stream as FS

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _write_batch(spark, path, rows, file_idx):
    df = spark.createDataFrame(rows, schema=FS.CANDIDATE_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(str(path))
    return df


def _rows(specs):
    # spec: (url, seq, priority, depth, ts_offset_s)
    return [
        (u, s, p, d, T0 + dt.timedelta(seconds=o)) for (u, s, p, d, o) in specs
    ]


def _drain(stream_df, output_mode="update"):
    """Run an availableNow pass collecting every micro-batch's rows."""
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


def test_streaming_dedup_within_watermark(spark, tmp_path):
    src = tmp_path / "in"
    _write_batch(
        spark,
        src,
        _rows(
            [
                ("https://www.nrsr.sk/a?x=1", 1, 0, 0, 0),
                ("HTTPS://WWW.NRSR.SK/a?x=1", 2, 0, 0, 1),  # canon-dup of seq 1
                ("https://www.nrsr.sk/b", 3, 0, 0, 2),
            ]
        ),
        0,
    )
    fresh = FS.dedup_within_watermark(
        FS.prepare_stream(FS.candidate_stream(spark, str(src))), delay="10 minutes"
    )
    got = _drain(fresh)
    urls = sorted(r.canon_url for r in got)
    assert len(got) == 2
    assert urls[0].endswith("/a?x=1") and urls[1].endswith("/b")


def test_streaming_dedup_across_micro_batches(spark, tmp_path):
    src = tmp_path / "in"
    _write_batch(spark, src, _rows([("https://www.nrsr.sk/a", 1, 0, 0, 0)]), 0)
    _write_batch(
        spark,
        src,
        _rows(
            [
                ("https://www.nrsr.sk/a", 2, 0, 0, 5),  # re-discovery, in horizon
                ("https://www.nrsr.sk/c", 3, 0, 0, 6),
            ]
        ),
        1,
    )
    fresh = FS.dedup_within_watermark(
        FS.prepare_stream(FS.candidate_stream(spark, str(src), max_files_per_trigger=1)),
        delay="10 minutes",
    )
    got = _drain(fresh)
    assert sorted(r.canon_url.rsplit("/", 1)[-1] for r in got) == ["a", "c"]


def test_fetch_slots_continue_across_batches(spark, tmp_path):
    src = tmp_path / "in"
    # batch 0: host a ×2, host b ×1 ; batch 1: host a ×1, host b ×2
    _write_batch(
        spark,
        src,
        _rows(
            [
                ("https://a.sk/1", 10, 0, 0, 0),
                ("https://a.sk/2", 11, 5, 0, 0),  # higher priority → slot first
                ("https://b.sk/1", 12, 0, 0, 0),
            ]
        ),
        0,
    )
    _write_batch(
        spark,
        src,
        _rows(
            [
                ("https://a.sk/3", 13, 0, 0, 1),
                ("https://b.sk/2", 14, 0, 0, 1),
                ("https://b.sk/3", 15, 9, 0, 1),
            ]
        ),
        1,
    )
    paced = FS.assign_fetch_slots(
        FS.prepare_stream(FS.candidate_stream(spark, str(src), max_files_per_trigger=1)),
        delay_s=2.5,
    )
    got = _drain(paced, output_mode="append")
    by_host = {}
    for r in got:
        by_host.setdefault(r.host, []).append(r)
    # slots are consecutive 0..n-1 per host even though rows spanned 2 batches
    for host, rs in by_host.items():
        assert sorted(r.slot for r in rs) == list(range(len(rs)))
        for r in rs:
            assert r.fetch_offset_ms == r.slot * 2500
    a = {r.canon_url.rsplit("/", 1)[-1]: r.slot for r in by_host["a.sk"]}
    # batch 0: priority 5 ('2') before priority 0 ('1'); batch 1 appends '3'
    assert (a["2"], a["1"], a["3"]) == (0, 1, 2)
    b = {r.canon_url.rsplit("/", 1)[-1]: r.slot for r in by_host["b.sk"]}
    # '1' alone in batch 0 → slot 0; batch 1: priority 9 ('3') then '2'
    assert (b["1"], b["3"], b["2"]) == (0, 1, 2)


def test_windowed_fetch_metrics(spark, tmp_path):
    src = tmp_path / "in"
    _write_batch(
        spark,
        src,
        _rows(
            [
                ("https://a.sk/1", 1, 0, 0, 0),
                ("https://a.sk/2", 2, 0, 0, 3),
                ("https://a.sk/2", 3, 0, 0, 4),  # dup url in same window
                ("https://a.sk/3", 4, 0, 0, 15),  # next window
            ]
        ),
        0,
    )
    m = FS.windowed_fetch_metrics(
        FS.prepare_stream(FS.candidate_stream(spark, str(src))), window="10 seconds"
    )
    got = {(r.win_start, r.host): r for r in _drain(m)}
    w0 = got[(T0, "a.sk")]
    assert w0.n_discovered == 3 and w0.n_distinct_urls == 2
    w1 = got[(T0 + dt.timedelta(seconds=10), "a.sk")]
    assert w1.n_discovered == 1


def test_run_frontier_stream_end_to_end_and_restart(spark, tmp_path):
    src, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    _write_batch(
        spark,
        src,
        _rows(
            [
                ("https://www.nrsr.sk/p?id=1", 1, 0, 0, 0),
                ("https://www.nrsr.sk/p?id=2", 2, 0, 0, 1),
                ("https://www.nrsr.sk/p?id=1", 3, 0, 0, 2),  # dup
            ]
        ),
        0,
    )
    FS.run_frontier_stream(spark, str(src), str(out), str(ckpt), budget=10)
    first = spark.read.parquet(str(out))
    assert first.count() == 2
    assert first.select("canon_url").distinct().count() == 2

    # restart from checkpoint: only the NEW file is processed (no re-emits)
    _write_batch(spark, src, _rows([("https://www.nrsr.sk/p?id=9", 4, 0, 0, 3)]), 1)
    FS.run_frontier_stream(spark, str(src), str(out), str(ckpt), budget=10)
    again = spark.read.parquet(str(out))
    assert again.count() == 3
    assert (
        again.filter(F.col("canon_url").contains("id=9")).count() == 1
    )


def test_streaming_trap_counter_across_batches(spark, tmp_path):
    """Durable per-(host, template) counters: a template crossing its budget
    MID-STREAM flags only the rows past the crossing, with ordinals
    continuing across micro-batches."""
    src = tmp_path / "trap_in"
    _write_batch(
        spark,
        src,
        _rows(
            [
                ("https://a.sk/cal?d=1", 10, 0, 0, 0),
                ("https://a.sk/cal?d=2", 11, 0, 0, 0),
                ("https://a.sk/cal?d=3", 12, 0, 0, 0),
                ("https://a.sk/page?id=1", 13, 0, 0, 0),
            ]
        ),
        0,
    )
    _write_batch(
        spark,
        src,
        _rows(
            [
                ("https://a.sk/cal?d=4", 14, 0, 0, 1),
                ("https://a.sk/cal?d=5", 15, 0, 0, 1),
            ]
        ),
        1,
    )
    flagged = FS.flag_trap_templates_stream(
        FS.prepare_stream(FS.candidate_stream(spark, str(src), max_files_per_trigger=1)),
        max_urls=4,
    )
    got = _drain(flagged, output_mode="append")
    cal = sorted(
        (r for r in got if "cal" in r.canon_url), key=lambda r: r.seq
    )
    # ordinals continue 1..5 across the two batches; only #5 exceeds budget
    assert [r.tpl_seen for r in cal] == [1, 2, 3, 4, 5]
    assert [r.trapped for r in cal] == ["n", "n", "n", "n", "y"]
    page = [r for r in got if "page" in r.canon_url]
    assert len(page) == 1 and page[0].tpl_seen == 1 and page[0].trapped == "n"
    assert all(r.template == "https://a.sk/cal?d=N" for r in cal)


# -- gap sessionization (batch window) ----------------------------------------


def test_gap_sessionize_hand_built(spark):
    import datetime as dt

    from nrsr_crawler_spark.operators.windows import gap_sessionize

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        (1, 10, ts(0)), (1, 11, ts(10)), (1, 12, ts(50)),  # gap 40m -> new session
        (2, 20, ts(0)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    out = {
        (r["user_id"], r["session_seq"]): r
        for r in gap_sessionize(df, "user_id", "ts", "event_id", gap_seconds=1800).collect()
    }
    assert out[(1, 1)]["n_events"] == 2 and out[(1, 1)]["end_ts"] == ts(10)
    assert out[(1, 2)]["n_events"] == 1 and out[(1, 2)]["start_ts"] == ts(50)
    assert out[(2, 1)]["n_events"] == 1
    assert len(out) == 3


def test_gap_sessionize_boundary_is_strict(spark):
    import datetime as dt

    from nrsr_crawler_spark.operators.windows import gap_sessionize

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, 1, t0), (1, 2, t0 + dt.timedelta(seconds=1800))]  # gap == limit
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    out = gap_sessionize(df, "user_id", "ts", "event_id", gap_seconds=1800).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2  # strict '>' keeps one session


def test_sessionize_stream_matches_batch_kernel(spark, tmp_path):
    """Streamed closed sessions == windows.gap_sessionize on the same
    events.  Two micro-batches; a far-future sentinel event per key lets
    the final sessions close inline (sentinels form their own session,
    which stays open and is excluded)."""
    import datetime as dt

    from nrsr_crawler_spark.operators.windows import gap_sessionize

    schema = "event_id long, user_id long, ts timestamp"
    far = T0 + dt.timedelta(days=30)
    b1 = [
        (1, 1, T0),
        (2, 1, T0 + dt.timedelta(seconds=60)),     # same session (gap 60 ≤ 300)
        (3, 2, T0 + dt.timedelta(seconds=10)),
    ]
    b2 = [
        (4, 1, T0 + dt.timedelta(seconds=1000)),   # gap 940 > 300 → new session
        (5, 2, T0 + dt.timedelta(seconds=200)),    # extends user 2's session
        (6, 2, T0 + dt.timedelta(seconds=2000)),   # new session for user 2
    ]
    sentinels = [(100, 1, far), (101, 2, far)]
    src = tmp_path / "sess_in"
    for i, rows in enumerate((b1, b2, sentinels)):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
            str(src)
        )
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    closed = FS.sessionize_stream(
        stream, key_col="user_id", ts_col="ts", id_col="event_id", gap_seconds=300
    )
    got = {
        (r["user_id"], r["session_seq"], r["n_events"], r["start_us"], r["end_us"])
        for r in _drain(closed, output_mode="append")
    }

    all_events = spark.createDataFrame(b1 + b2, schema)
    expected = {
        (
            r["user_id"],
            r["session_seq"],
            r["n_events"],
            int(r["start_ts"].replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000),
            int(r["end_ts"].replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000),
        )
        for r in gap_sessionize(
            all_events, "user_id", "ts", "event_id", gap_seconds=300
        ).collect()
    }
    assert got == expected
    assert len(got) == 4  # u1: 2 sessions, u2: 2 sessions
