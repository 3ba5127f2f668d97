"""Round-4 wave F: WARC/CDX plan, canonical election, snapshot diff,
error-spike report."""

from __future__ import annotations

from pyspark.sql import functions as F

from nrsr_crawler_spark.operators.anomaly import error_spike_report
from nrsr_crawler_spark.operators.canonical import elect_canonical
from nrsr_crawler_spark.operators.snapshot_diff import host_change_report, snapshot_diff
from nrsr_crawler_spark.operators.warc import (
    RESPONSE_HEADER_BYTES,
    REVISIT_RECORD_BYTES,
    warc_plan,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


# --------------------------------------------------------------------------
# WARC plan
# --------------------------------------------------------------------------


def test_warc_revisit_election_and_offsets(spark):
    rows = [
        ("https://a/1", "d1", 1000),
        ("https://a/2", "d1", 1000),  # same digest → revisit
        ("https://a/3", "d2", 50),
    ]
    df = spark.createDataFrame(rows, "url string, digest string, payload_len long")
    out = {r["url"]: r for r in warc_plan(df).collect()}
    assert out["https://a/1"]["rec_type"] == "response"
    assert out["https://a/1"]["rec_len"] == RESPONSE_HEADER_BYTES + 1000
    assert out["https://a/2"]["rec_type"] == "revisit"
    assert out["https://a/2"]["rec_len"] == REVISIT_RECORD_BYTES
    assert out["https://a/3"]["rec_type"] == "response"


def test_warc_offsets_are_contiguous_within_shard(spark):
    rows = [(f"https://h/{i}", f"d{i}", 10 * i) for i in range(64)]
    df = spark.createDataFrame(rows, "url string, digest string, payload_len long")
    got = warc_plan(df).collect()
    by_shard: dict[str, list] = {}
    for r in got:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, recs in by_shard.items():
        recs.sort(key=lambda r: r["byte_offset"])
        pos = 0
        for r in recs:
            assert r["byte_offset"] == pos, (shard, r)
            pos += r["rec_len"]


def test_warc_plan_no_python_no_cartesian(spark):
    df = spark.createDataFrame(
        [("https://a/1", "d1", 10)], "url string, digest string, payload_len long"
    )
    plan = _plan(warc_plan(df))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------------
# Canonical election
# --------------------------------------------------------------------------


def test_canonical_election_order(spark):
    rows = [
        ("p1", "http://www.x.sk/p1"),
        ("p1", "https://www.x.sk/p1"),
        ("p1", "https://x.sk/p1"),  # https + shortest → winner
        ("p2", "http://x.sk/p2"),  # only variant → winner by default
    ]
    df = spark.createDataFrame(rows, "canon string, url string")
    out = {r["canon"]: r for r in elect_canonical(df).collect()}
    assert out["p1"]["rep_url"] == "https://x.sk/p1"
    assert out["p1"]["n_variants"] == 3 and out["p1"]["n_https"] == 2
    assert out["p2"]["rep_url"] == "http://x.sk/p2"
    assert out["p2"]["n_variants"] == 1 and out["p2"]["n_https"] == 0


def test_canonical_election_is_single_agg(spark):
    df = spark.createDataFrame([("p1", "https://x.sk/p1")], "canon string, url string")
    plan = _plan(elect_canonical(df))
    # one hash-aggregate pair (partial + final), no window, no join
    assert "Window" not in plan and "Join" not in plan
    assert "BatchEvalPython" not in plan


# --------------------------------------------------------------------------
# Snapshot diff
# --------------------------------------------------------------------------


def test_snapshot_diff_classes(spark):
    old = spark.createDataFrame(
        [("u1", "h1", "a"), ("u2", "h1", "b"), ("u3", "h2", "c")],
        "url string, host string, digest string",
    )
    new = spark.createDataFrame(
        [("u1", "h1", "a"), ("u2", "h1", "B"), ("u4", "h2", "d")],
        "url string, host string, digest string",
    )
    got = {r["url"]: r["change"] for r in snapshot_diff(old, new).collect()}
    assert got == {"u1": "same", "u2": "changed", "u3": "gone", "u4": "added"}
    rep = {r["host"]: r for r in host_change_report(snapshot_diff(old, new)).collect()}
    assert rep["h1"]["n_same"] == 1 and rep["h1"]["n_changed"] == 1
    assert rep["h1"]["change_bps"] == 5000
    assert rep["h2"]["n_gone"] == 1 and rep["h2"]["n_added"] == 1
    assert rep["h2"]["change_bps"] == 0  # no surviving URLs → 0, not div-by-0


def test_snapshot_diff_no_python(spark):
    old = spark.createDataFrame([("u1", "h1", "a")], "url string, host string, digest string")
    new = spark.createDataFrame([("u1", "h1", "a")], "url string, host string, digest string")
    plan = _plan(host_change_report(snapshot_diff(old, new)))
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


# --------------------------------------------------------------------------
# Error-spike report
# --------------------------------------------------------------------------


def test_error_spike_flags_only_spiking_cell(spark):
    rows = []
    # host hA: 10 buckets × 20 fetches, 1 error each except bucket 9 → 12 errors
    for b in range(10):
        for i in range(20):
            err = (i == 0) or (b == 9 and i < 12)
            rows.append(("hA", b, err))
    # host hB: flat error rate, never spikes
    for b in range(10):
        for i in range(20):
            rows.append(("hB", b, i == 0))
    df = spark.createDataFrame(rows, "host string, bucket long, err boolean")
    got = error_spike_report(df, "host", "bucket", F.col("err"), factor=3, min_errors=5).collect()
    assert len(got) == 1
    r = got[0]
    assert r["host"] == "hA" and r["bucket"] == 9
    assert r["n_fetches"] == 20 and r["n_errors"] == 12
    assert r["bucket_bps"] == 6000  # 12/20
    assert r["base_bps"] == 1050  # 21/200


def test_error_spike_broadcasts_host_table(spark):
    df = spark.createDataFrame([("hA", 1, True)], "host string, bucket long, err boolean")
    plan = _plan(error_spike_report(df, "host", "bucket", F.col("err")))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
