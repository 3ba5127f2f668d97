"""Round-4 wave H: resolution-ladder resize plan, crawl drain ETA."""

from __future__ import annotations

from nrsr_crawler_spark.operators.budget_plan import host_drain_plan
from nrsr_crawler_spark.operators.resize_plan import resolution_ladder_plan


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_ladder_tiers_and_scale(spark):
    rows = [
        ("tiny", 100, 300),    # short side 100 < 256 → reject
        ("s", 256, 9999),      # exactly 256 → tier 256, scale 10000
        ("m", 800, 513),       # short 513 → tier 512, scale 512*10000//513
        ("l", 1024, 2048),     # tier 1024
    ]
    df = spark.createDataFrame(rows, "image_id string, w int, h int")
    out = {r["image_id"]: r for r in resolution_ladder_plan(df).collect()}
    assert out["tiny"]["tier"] == 0 and out["tiny"]["scale_bps"] == 0
    assert out["s"]["tier"] == 256 and out["s"]["scale_bps"] == 10000
    assert out["m"]["tier"] == 512 and out["m"]["scale_bps"] == 512 * 10000 // 513
    assert out["l"]["tier"] == 1024
    # never an upscale
    assert all(r["scale_bps"] <= 10000 for r in out.values())


def test_ladder_is_map_only(spark):
    df = spark.createDataFrame([("a", 300, 300)], "image_id string, w int, h int")
    plan = _plan(resolution_ladder_plan(df))
    assert "Exchange" not in plan  # zero shuffle: pure column math
    assert "BatchEvalPython" not in plan


def test_drain_plan_eta_and_budget(spark):
    frontier = spark.createDataFrame(
        [("h1",)] * 10 + [("h2",)] * 200_000, "host string"
    )
    delays = spark.createDataFrame(
        [("h1", 1000), ("h2", 1000)], "host string, delay_ms long"
    )
    out = {r["host"]: r for r in
           host_drain_plan(frontier, delays, window_s=86400).collect()}
    assert out["h1"]["eta_s"] == 10 and not out["h1"]["over_budget"]
    assert out["h2"]["eta_s"] == 200_000 and out["h2"]["over_budget"]


def test_drain_plan_broadcasts_delay_dim(spark):
    frontier = spark.createDataFrame([("h1",)], "host string")
    delays = spark.createDataFrame([("h1", 500)], "host string, delay_ms long")
    plan = _plan(host_drain_plan(frontier, delays))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
