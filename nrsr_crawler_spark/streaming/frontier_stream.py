"""Structured Streaming view of the crawl dataflow (SURVEY §2.9).

The reference is an iterative fixpoint crawl driven by a single Twisted
reactor (/root/reference/nrsr/settings.py:30-33); the engine's primary mode is
the batch epoch loop (plans/epoch_loop.py).  This module is the streaming
skin over the same operators, for deployments where discovered URLs arrive
continuously (e.g. a Kafka/file feed of candidate links) rather than in
driver-scheduled epochs:

 - ``candidate_stream``        file-source ``readStream`` of candidate URLs
 - ``prepare_stream``          canon → fingerprint → host (same kernel as batch)
 - ``dedup_within_watermark``  streaming URL-seen dedup with bounded state
                               (``dropDuplicatesWithinWatermark`` — the
                               streaming analogue of the Bloom seen-set J4;
                               state size is bounded by the watermark horizon
                               instead of growing with 10^10 keys)
 - ``assign_fetch_slots``      stateful per-host politeness pacer
                               (``applyInPandasWithState``): every host gets a
                               monotone fetch-slot counter that survives
                               micro-batches; slot i ⇒ fetch at
                               ``i * delay_s`` — exactly the reference's
                               ``DOWNLOAD_DELAY = 2.5`` /
                               ``CONCURRENT_REQUESTS_PER_IP = 1`` serialization
                               (settings.py:30-33), re-expressed as stream
                               state instead of a reactor clock
 - ``windowed_fetch_metrics``  per-host tumbling-window discovery counts with
                               late-data tolerance (watermark), the streaming
                               metrics row of north_rule

Scale notes: all state is keyed by ``host`` (salted upstream via
``host_shard`` when one host dominates — functions/urls.py); the pacer's
per-key state is a single long, so state-store size is O(distinct hosts),
not O(URLs).  Everything crosses the Python boundary in Arrow batches.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from nrsr_crawler_spark.functions import urls as U
from nrsr_crawler_spark.operators import politeness

CANDIDATE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("seq", LongType()),
        StructField("priority", IntegerType()),
        StructField("depth", IntegerType()),
        StructField("disc_ts", TimestampType()),
    ]
)


def candidate_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of discovered candidate URLs.

    On a cluster this would be ``format('kafka')``; a directory of parquet
    files has identical streaming semantics (each file = one producer flush)
    and works offline.
    """
    reader = spark.readStream.schema(CANDIDATE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def prepare_stream(raw: DataFrame, url_col: str = "url") -> DataFrame:
    """Same canonicalize→fingerprint→host kernel as the batch path
    (operators/frontier.py) — pure column expressions, fully streamable.

    Invalid URLs must drop BEFORE the stateful dedup (they'd otherwise
    collapse into the xxhash64(NULL) state key and one would be emitted), so
    filter on the materialized validity boolean — cheap under predicate
    pushdown, unlike ``canon_url IS NOT NULL`` (see ``urls.with_canon``)."""
    return (
        U.with_canon(raw, url_col=url_col, hash_col="url_hash", valid_col="url_ok")
        .filter(F.col("url_ok"))
        .drop("url_ok")
    )


def dedup_within_watermark(
    prepared: DataFrame,
    delay: str = "10 minutes",
    ts_col: str = "disc_ts",
    keys: list[str] | None = None,
) -> DataFrame:
    """Streaming J4: drop re-discovered URLs with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps a fingerprint in state only until
    the watermark passes it, so state is O(discovery rate × horizon) — the
    correct streaming trade for a 10^10-URL crawl where the exact cross-epoch
    seen-set lives in the lake (operators/seen.py) and the stream only needs
    to suppress short-horizon re-discoveries between lake syncs.

    ``keys`` widens the dedup key beyond the fingerprint — the streaming
    crawl (streaming/crawl_stream.py) keys on (url_hash, requeue_round) so a
    politeness-deferred URL survives while true re-discoveries collapse.
    """
    return prepared.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        keys or ["url_hash"]
    )


_PACER_STATE_SCHEMA = StructType([StructField("next_slot", LongType())])


def _paced_output_schema(input_schema: StructType) -> StructType:
    return StructType(
        list(input_schema.fields)
        + [StructField("slot", LongType()), StructField("fetch_offset_ms", LongType())]
    )


def assign_fetch_slots(
    prepared: DataFrame,
    delay_s: float = 2.5,
    order_cols: tuple[str, ...] = ("priority", "seq"),
) -> DataFrame:
    """Stateful per-host politeness pacer (applyInPandasWithState).

    Each host's state is a single monotone counter ``next_slot``.  Within a
    micro-batch, that host's rows are sorted by the pop order (priority DESC,
    seq DESC — the reference's priority-then-LIFO queue, SURVEY §2.6 O3) and
    assigned consecutive slots; slot *i* fetches at ``i * delay_s`` after the
    host's first fetch — byte-for-byte the ``DOWNLOAD_DELAY`` serialization of
    /root/reference/nrsr/settings.py:30-33, but with durable cross-batch
    state instead of an in-memory reactor.
    """
    out_schema = _paced_output_schema(prepared.schema)
    out_cols = [f.name for f in out_schema.fields]
    delay_ms = int(delay_s * 1000)
    sort_cols = list(order_cols)

    def pace(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (next_slot,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            if pdf.empty:
                continue
            batch = pdf.sort_values(sort_cols, ascending=[False] * len(sort_cols))
            n = len(batch)
            slots = pd.RangeIndex(next_slot, next_slot + n)
            batch = batch.assign(
                slot=slots.to_numpy(), fetch_offset_ms=slots.to_numpy() * delay_ms
            )
            next_slot += n
            yield batch[out_cols]
        state.update((next_slot,))

    return prepared.groupBy("host").applyInPandasWithState(
        pace,
        outputStructType=out_schema,
        stateStructType=_PACER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_TRAP_STATE_SCHEMA = StructType([StructField("n", LongType())])


def _trapped_output_schema(input_schema: StructType) -> StructType:
    return StructType(
        list(input_schema.fields)
        + [StructField("tpl_seen", LongType()), StructField("trapped", StringType())]
    )


def flag_trap_templates_stream(
    prepared: DataFrame,
    max_urls: int,
    host_col: str = "host",
    url_col: str = "canon_url",
    order_col: str = "seq",
) -> DataFrame:
    """Streaming crawl-trap guard (operators/traps.py lifted to Structured
    Streaming): durable per-(host, URL-template) counters via
    ``applyInPandasWithState``, so an infinite calendar discovered over many
    micro-batches is caught exactly when its cumulative population crosses
    ``max_urls`` — batch-mode counting would need the whole history re-read
    per batch.

    Each output row carries ``tpl_seen`` (this URL's 1-based ordinal within
    its template, durable across batches and restarts via the checkpointed
    state store) and ``trapped`` ('y'/'n': ordinal past the budget).  Rows
    are ordered by ``order_col`` within the batch so the crossing point is
    deterministic.  Downstream sinks route trapped='y' rows to the
    demoted/parked queue — same demote-don't-drop policy as the batch guard.

    Scale shape: state is one long per DISTINCT (host, template) — shapes,
    not URLs — and the shuffle key (host, template) is exactly the
    aggregation key, one exchange."""
    from nrsr_crawler_spark.operators import traps

    tagged = prepared.withColumn("template", traps.url_template(F.col(url_col)))
    out_schema = _trapped_output_schema(tagged.schema)
    out_cols = [f.name for f in out_schema.fields]

    def flag(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (n,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            if pdf.empty:
                continue
            batch = pdf.sort_values(order_col)
            ordinals = pd.RangeIndex(n + 1, n + 1 + len(batch))
            ords = ordinals.to_numpy()
            batch = batch.assign(
                tpl_seen=ords,
                trapped=pd.Series(ords > max_urls, index=batch.index).map(
                    {True: "y", False: "n"}
                ),
            )
            n += len(batch)
            yield batch[out_cols]
        state.update((n,))

    return tagged.groupBy(host_col, "template").applyInPandasWithState(
        flag,
        outputStructType=out_schema,
        stateStructType=_TRAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_fetch_metrics(
    prepared: DataFrame,
    window: str = "10 seconds",
    delay: str = "30 seconds",
    ts_col: str = "disc_ts",
) -> DataFrame:
    """Per-host tumbling-window discovery counts with late-data tolerance —
    the streaming form of the epoch metrics row (north_rule).  Partial
    (map-side) aggregation + watermark-bounded state; skew on the single
    nrsr.sk host is already defused upstream by salted host_shard."""
    return (
        prepared.withWatermark(ts_col, delay)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col("host"))
        .agg(
            F.count(F.lit(1)).alias("n_discovered"),
            F.approx_count_distinct("url_hash").alias("n_distinct_urls"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "host",
            "n_discovered",
            "n_distinct_urls",
        )
    )


def run_frontier_stream(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    budget: int = 100,
    max_files_per_trigger: int | None = 1,
) -> None:
    """End-to-end streaming frontier: ingest → prepare → watermark dedup →
    per-micro-batch politeness pop (foreachBatch reuses the exact batch
    operator — identical semantics in both modes) → parquet sink.

    ``availableNow`` trigger: drain everything currently in ``in_path`` then
    stop — the streaming analogue of one epoch-loop run, and restartable from
    ``checkpoint`` exactly like the lake resume path (north_rule).
    """
    stream = candidate_stream(spark, in_path, max_files_per_trigger)
    fresh = dedup_within_watermark(prepare_stream(stream))

    def pop_and_append(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        popped = politeness.pop_budget(
            batch_df, budget=budget, tiebreak=[F.col("canon_url")]
        ).withColumn("batch_id", F.lit(batch_id))
        popped.write.mode("append").parquet(out_path)

    q = (
        fresh.writeStream.foreachBatch(pop_and_append)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("session_seq", LongType()),
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def _session_output_schema(key_field: StructField) -> StructType:
    return StructType(
        [
            key_field,
            StructField("session_seq", LongType()),
            StructField("n_events", LongType()),
            StructField("start_us", LongType()),
            StructField("end_us", LongType()),
        ]
    )


def sessionize_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming gap sessionization (applyInPandasWithState +
    EventTimeTimeout) — the stateful twin of windows.gap_sessionize: same
    session definition (consecutive gaps ≤ ``gap_seconds``, ties on
    ``id_col``), sessions emitted when CLOSED — inline when a later event
    opens the next session, or by event-time timeout once the watermark
    passes ``last_event + gap`` (the hanging final session).  On identical,
    watermark-respecting input the closed-session set equals the batch
    operator's output (asserted in tests) with ``start_us``/``end_us`` as
    the exact unix-microsecond bounds.

    Per-key state is 4 longs — O(live keys), never O(events); late events
    beyond the watermark are the stream's contract to drop upstream."""
    out_schema = _session_output_schema(
        events.schema[key_col]
    )

    def sess(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def emit(seq, start, last, n):
            return pd.DataFrame(
                {
                    out_schema.fields[0].name: [key[0]],
                    "session_seq": [seq],
                    "n_events": [n],
                    "start_us": [start],
                    "end_us": [last],
                }
            )

        if state.hasTimedOut:
            seq, start, last, n = state.get
            state.remove()
            yield emit(seq, start, last, n)
            return
        seq, start, last, n = state.get if state.exists else (0, None, None, 0)
        gap_us = gap_seconds * 1_000_000
        closed = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(["__us", id_col])
            for us in pdf["__us"].to_numpy():
                us = int(us)
                if start is None:
                    seq, start, last, n = seq + 1, us, us, 1
                elif us - last > gap_us:
                    closed.append(emit(seq, start, last, n))
                    seq, start, last, n = seq + 1, us, us, 1
                else:
                    last = max(last, us)
                    n += 1
        state.update((seq, start, last, n))
        # close the open session once the watermark passes last + gap
        state.setTimeoutTimestamp(last // 1000 + gap_seconds * 1000)
        for c in closed:
            yield c

    prepared = events.withColumn(
        "__us", F.unix_micros(F.col(ts_col).cast("timestamp"))
    ).withWatermark(ts_col, watermark)
    return prepared.groupBy(key_col).applyInPandasWithState(
        sess,
        outputStructType=out_schema,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
