"""AS-OF join and binned RANGE join — hand-built semantics."""

from __future__ import annotations

import datetime as dt

from nrsr_crawler_spark.operators.temporal_joins import asof_join, range_join_binned

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_join_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, "h", _ts(5)), (2, "h", _ts(10)), (3, "h", _ts(0)), (4, "g", _ts(60))],
        "id long, host string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("h", _ts(1), "v1"), ("h", _ts(10), "v2"), ("g", _ts(90), "vg")],
        "host string, ts timestamp, policy string",
    )
    out = {
        r["id"]: r
        for r in asof_join(left, right, "host", "ts", "ts", ["policy"]).collect()
    }
    assert out[1]["policy"] == "v1"          # latest at or before t=5
    assert out[2]["policy"] == "v2"          # equal timestamp matches (inclusive)
    assert out[3]["policy"] is None          # nothing in effect yet
    assert out[4]["policy"] is None          # other key's snapshot is later
    assert out[2]["matched_ts"] == _ts(10)
    assert len(out) == 4                      # every left row survives


def test_asof_join_key_isolation(spark):
    left = spark.createDataFrame([(1, "a", _ts(50))], "id long, host string, ts timestamp")
    right = spark.createDataFrame(
        [("b", _ts(1), "other-key")], "host string, ts timestamp, policy string"
    )
    (row,) = asof_join(left, right, "host", "ts", "ts", ["policy"]).collect()
    assert row["policy"] is None


def test_range_join_binned_boundaries_and_multibin(spark):
    points = spark.createDataFrame(
        [(1, "u", _ts(0)), (2, "u", _ts(90)), (3, "u", _ts(200)), (4, "v", _ts(90))],
        "event_id long, user string, ts timestamp",
    )
    # interval spans 0..90 min = multiple 1h bins; boundaries inclusive
    intervals = spark.createDataFrame(
        [("u", _ts(0), _ts(90), 7)],
        "user string, start_ts timestamp, end_ts timestamp, tag long",
    )
    out = sorted(
        r["event_id"]
        for r in range_join_binned(
            points, intervals, "user", "ts", "start_ts", "end_ts", bin_seconds=3600
        ).collect()
    )
    assert out == [1, 2]  # 3 outside the range, 4 is another key


def test_range_join_binned_matches_naive_join(spark):
    import random

    rnd = random.Random(7)
    points = spark.createDataFrame(
        [(i, f"u{i % 3}", _ts(rnd.randrange(0, 600))) for i in range(60)],
        "event_id long, user string, ts timestamp",
    )
    ivs = []
    for j in range(9):
        s = rnd.randrange(0, 500)
        ivs.append((f"u{j % 3}", _ts(s), _ts(s + rnd.randrange(10, 240)), j))
    intervals = spark.createDataFrame(
        ivs, "user string, start_ts timestamp, end_ts timestamp, tag long"
    )
    got = sorted(
        (r["event_id"], r["tag"])
        for r in range_join_binned(
            points, intervals, "user", "ts", "start_ts", "end_ts", bin_seconds=1800
        ).collect()
    )
    from pyspark.sql import functions as F

    naive = sorted(
        (r["event_id"], r["tag"])
        for r in points.join(
            intervals,
            (points["user"] == intervals["user"])
            & points["ts"].between(intervals["start_ts"], intervals["end_ts"]),
        ).collect()
    )
    assert got == naive and len(got) > 0


# -- hypertable rollup + incremental merge ------------------------------------


def test_time_rollup_incremental_merge_equals_full(spark):
    from nrsr_crawler_spark.operators.rollup import merge_rollups, time_rollup

    rows = [
        (i, "a" if i % 3 else "b", _ts(i * 7), float(i) + 0.25) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "event_id long, et string, ts timestamp, value double")
    full = time_rollup(df, "ts", ["et"], "value", width_seconds=3600)
    half1 = time_rollup(df.filter("event_id % 2 = 0"), "ts", ["et"], "value", 3600)
    half2 = time_rollup(df.filter("event_id % 2 = 1"), "ts", ["et"], "value", 3600)
    merged = merge_rollups(half1, half2)
    key = lambda r: (r["bucket"], r["et"])  # noqa: E731
    a = {key(r): (r["n"], r["sum_centi"], r["vmin"], r["vmax"]) for r in full.collect()}
    b = {key(r): (r["n"], r["sum_centi"], r["vmin"], r["vmax"]) for r in merged.collect()}
    assert a == b and len(a) > 1


def test_time_bucket_floor_is_exact(spark):
    from pyspark.sql import functions as F

    from nrsr_crawler_spark.operators.rollup import time_bucket

    df = spark.createDataFrame(
        [(_ts(59),), (_ts(60),), (_ts(61),)], "ts timestamp"
    )
    out = [r[0] for r in df.select(time_bucket(F.col("ts"), 3600)).collect()]
    assert out == [_ts(0), _ts(60), _ts(60)]


# -- count-min sketch -----------------------------------------------------------


def test_countmin_never_underestimates_and_merges(spark):
    from pyspark.sql import functions as F

    from nrsr_crawler_spark.operators.sketches import cm_build, cm_estimate, cm_merge

    rows = [(f"item{i % 17}",) for i in range(300)] + [("hot",)] * 50
    df = spark.createDataFrame(rows, "term string")
    truth = {r["term"]: r["cnt"] for r in df.groupBy("term").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    items = df.select("term").distinct()

    sk = cm_build(df, "term", d=4, w=256)
    est = {r["term"]: r["cm_est"] for r in cm_estimate(sk, items, "term", 4, 256).collect()}
    assert set(est) == set(truth)
    for t, true_cnt in truth.items():
        assert est[t] >= true_cnt  # one-sided error
    assert est["hot"] >= 50

    # merge of split sketches == sketch of the union (counts add exactly);
    # deterministic split: tag each occurrence with an id and halve by parity
    idx = spark.createDataFrame(
        [(i, t) for i, (t,) in enumerate(rows)], "i long, term string"
    )
    sk_a = cm_build(idx.filter("i % 2 = 0"), "term", d=4, w=256)
    sk_b = cm_build(idx.filter("i % 2 = 1"), "term", d=4, w=256)
    merged = {(r["r"], r["c"]): r["cnt"] for r in cm_merge(sk_a, sk_b).collect()}
    full = {(r["r"], r["c"]): r["cnt"] for r in sk.collect()}
    assert merged == full


def test_countmin_unseen_item_estimates_from_grid(spark):
    from nrsr_crawler_spark.operators.sketches import cm_build, cm_estimate

    df = spark.createDataFrame([("a",), ("a",), ("b",)], "term string")
    items = spark.createDataFrame([("never_seen_zzz",)], "term string")
    sk = cm_build(df, "term", d=4, w=256)
    (row,) = cm_estimate(sk, items, "term", 4, 256).collect()
    # unseen item: estimate is whatever its cells collided with (possibly 0),
    # never negative
    assert row["cm_est"] >= 0


def test_hll_estimate_within_error_envelope(spark):
    from nrsr_crawler_spark.operators.sketches import hll_build, hll_estimate

    n = 5000
    df = spark.createDataFrame([(f"url-{i}",) for i in range(n)], "term string")
    regs = hll_build(df, "term", p=6)
    (row,) = hll_estimate(regs, p=6).collect()
    assert row["m"] == 64
    assert 1 <= row["registers_set"] <= 64
    # raw HLL relative error ~1.04/sqrt(64) = 13%; generous 3-sigma envelope
    assert abs(row["hll_est"] - n) <= 0.4 * n
    # large range: no zero registers expected, corrected == raw
    assert row["hll_est_corrected"] == row["hll_est"]
    # duplicates must not move the estimate (distinct-count semantics)
    dup = df.unionAll(df).unionAll(df)
    (row2,) = hll_estimate(hll_build(dup, "term", p=6), p=6).collect()
    assert row2["hll_est"] == row["hll_est"]
    # small range: linear counting kicks in and beats the raw estimate
    small = spark.createDataFrame([(f"s-{i}",) for i in range(30)], "term string")
    (row3,) = hll_estimate(hll_build(small, "term", p=6), p=6).collect()
    assert row3["registers_set"] < 64
    assert abs(row3["hll_est_corrected"] - 30) <= abs(row3["hll_est"] - 30)
    assert abs(row3["hll_est_corrected"] - 30) <= 10


def test_hll_merge_equals_union_build(spark):
    from nrsr_crawler_spark.operators.sketches import hll_build, hll_merge

    a = spark.createDataFrame([(f"a-{i}",) for i in range(400)], "term string")
    b = spark.createDataFrame([(f"b-{i}",) for i in range(400)], "term string")
    merged = {
        (r["register"], r["rho_max"])
        for r in hll_merge(hll_build(a, "term"), hll_build(b, "term")).collect()
    }
    full = {
        (r["register"], r["rho_max"])
        for r in hll_build(a.unionAll(b), "term").collect()
    }
    assert merged == full


def test_bigram_coherence_ranks_fluent_text_above_gibberish(spark):
    from nrsr_crawler_spark.operators.text import bigram_coherence

    fluent = "the quick brown fox jumps over the lazy dog"
    rows = [(f"d{i}", fluent) for i in range(20)]
    rows += [("gib", "zq xv qj wk vz kx jq zv qx wv")]
    rows += [("empty", ""), ("one", "solo")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    # k=8 = exactly the fluent collocations (count 20 each); the tie-break
    # fill at count 1 would otherwise admit a couple of gibberish bigrams
    out = {r["doc_id"]: r for r in bigram_coherence(df, "doc_id", "text", k=8).collect()}
    assert len(out) == 23
    # fluent docs: all 8 bigrams are corpus-frequent (20 copies each)
    assert out["d0"]["n_bigrams"] == 8
    assert out["d0"]["coherence_bps"] == 10000
    # gibberish: its bigrams occur once each, below the top-10 cut
    assert out["gib"]["coherence_bps"] == 0
    # degenerate docs: no bigrams, score 0 (not null, not error)
    assert out["empty"]["n_bigrams"] == 0 and out["empty"]["coherence_bps"] == 0
    assert out["one"]["n_bigrams"] == 0 and out["one"]["coherence_bps"] == 0
