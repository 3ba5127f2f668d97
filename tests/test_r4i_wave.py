"""Round-4 wave I: bloom calibration, mixture drift, RRF fusion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nrsr_crawler_spark.operators.bloom_sim import bloom_calibration
from nrsr_crawler_spark.operators.drift import mixture_drift
from nrsr_crawler_spark.operators.fusion import RRF_SCALE, rrf_fuse


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_bloom_calibration_saturated_filter_fps_everything(spark):
    # m=4 bits: inserting a handful of URLs saturates all 4 positions,
    # so every probe is a false positive and occupancy is 100%
    ins = spark.createDataFrame([(f"u{i}",) for i in range(50)], "url string")
    probes = spark.createDataFrame([(f"p{i}",) for i in range(20)], "url string")
    r = bloom_calibration(ins, probes, m=4, k=4).collect()[0]
    assert r["n_bits_set"] == 4 and r["occupancy_bps"] == 10000
    assert r["n_probes"] == 20 and r["n_fp"] == 20 and r["fp_bps"] == 10000


def test_bloom_calibration_huge_filter_no_fps(spark):
    # m at the 4-hex-slice ceiling, one inserted URL: probes essentially
    # cannot collide on all 4 positions
    ins = spark.createDataFrame([("only",)], "url string")
    probes = spark.createDataFrame([(f"p{i}",) for i in range(20)], "url string")
    r = bloom_calibration(ins, probes, m=65536, k=4).collect()[0]
    assert r["n_fp"] == 0 and r["fp_bps"] == 0
    assert 1 <= r["n_bits_set"] <= 4


def test_bloom_calibration_rejects_mis_sized_filter(spark):
    # m > 65536 would silently bias every position into [0, 65536); k > 8
    # would run past the 32-char md5 — both must fail loudly.
    ins = spark.createDataFrame([("a",)], "url string")
    probes = spark.createDataFrame([("b",)], "url string")
    with pytest.raises(ValueError):
        bloom_calibration(ins, probes, m=1 << 30, k=4)
    with pytest.raises(ValueError):
        bloom_calibration(ins, probes, m=65536, k=9)


def test_bloom_calibration_broadcasts_bits(spark):
    ins = spark.createDataFrame([("a",)], "url string")
    probes = spark.createDataFrame([("b",)], "url string")
    plan = _plan(bloom_calibration(ins, probes))
    assert "BroadcastHashJoin" in plan and "BatchEvalPython" not in plan


def test_mixture_drift_shares_and_delta(spark):
    old = spark.createDataFrame([("en",)] * 8 + [("sk",)] * 2, "lang string")
    new = spark.createDataFrame([("en",)] * 5 + [("sk",)] * 4 + [("de",)], "lang string")
    out = {r["stratum"]: r for r in mixture_drift(old, new).collect()}
    assert out["en"]["share_old_bps"] == 8000 and out["en"]["share_new_bps"] == 5000
    assert out["en"]["delta_bps"] == 3000
    assert out["de"]["n_old"] == 0 and out["de"]["share_old_bps"] == 0
    assert out["de"]["delta_bps"] == 1000
    assert set(out) == {"en", "sk", "de"}


def test_rrf_fuse_scores(spark):
    a = spark.createDataFrame([(1, 100), (2, 50)], "id long, s long")
    b = spark.createDataFrame([(2, 9), (3, 7)], "id long, t long")
    out = {r["id"]: r for r in rrf_fuse(
        a, b, "id", [F.desc("s"), F.col("id")], [F.desc("t"), F.col("id")], c=60
    ).collect()}
    # id 1: rank_a=1 only → 1000000 div 61
    assert out[1]["rrf_score"] == RRF_SCALE // 61 and out[1]["rank_b"] is None
    # id 2: rank_a=2, rank_b=1
    assert out[2]["rrf_score"] == RRF_SCALE // 62 + RRF_SCALE // 61
    # id 3: rank_b=2 only
    assert out[3]["rrf_score"] == RRF_SCALE // 62 and out[3]["rank_a"] is None
    # shared doc outranks single-list docs
    assert out[2]["rrf_score"] > max(out[1]["rrf_score"], out[3]["rrf_score"])
