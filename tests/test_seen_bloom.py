"""Bloom seen-set invariants (SURVEY §5 item 1): zero false negatives,
bounded false-positive rate, end-to-end dedup == exact dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from nrsr_crawler_spark.operators import seen as S


def _hashes(spark, lo, hi, tag=""):
    return spark.range(lo, hi).select(
        F.xxhash64(F.concat(F.lit(tag), F.col("id").cast("string"))).alias("url_hash")
    )


def test_zero_false_negatives(spark):
    seen = _hashes(spark, 0, 5000)
    segs = S.build_segments(seen, n_segments=8)
    flagged = S.bloom_flag(seen, segs, n_segments=8)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0


def test_fp_rate_bounded(spark):
    seen = _hashes(spark, 0, 5000)
    segs = S.build_segments(seen, n_segments=8)  # 64Ki bits/seg, 8 segs, k=7 → ~5k keys
    fresh = _hashes(spark, 0, 20000, tag="other:")
    flagged = S.bloom_flag(fresh, segs, n_segments=8)
    fp = flagged.filter(F.col("maybe_seen")).count() / 20000
    assert fp < 0.01, fp


def test_dedup_with_bloom_equals_exact(spark):
    """Both physical regimes (broadcast bitsets / cogrouped segments) must
    equal the plain anti-join exactly."""
    seen = _hashes(spark, 0, 3000)
    segs = S.build_segments(seen, n_segments=8)
    cand = _hashes(spark, 1500, 6000).withColumn("seq", F.col("url_hash") % 100)
    exact = cand.join(seen, "url_hash", "left_anti")
    for regime in (True, False):
        got = S.dedup_with_bloom(cand, seen, segs, n_segments=8, broadcast_bits=regime)
        assert got.count() == exact.count(), regime
        assert got.select("url_hash").exceptAll(exact.select("url_hash")).count() == 0, regime


def test_broadcast_probe_matches_cogroup_probe(spark):
    seen = _hashes(spark, 0, 4000)
    segs = S.build_segments(seen, n_segments=8)
    cand = _hashes(spark, 2000, 9000)
    a = S.bloom_flag(cand, segs, n_segments=8).orderBy("url_hash").collect()
    b = S.bloom_flag_broadcast(cand, segs, n_segments=8).orderBy("url_hash").collect()
    assert [(r.url_hash, r.maybe_seen) for r in a] == [(r.url_hash, r.maybe_seen) for r in b]


def test_merge_segments_equals_rebuild(spark):
    """OR-merging a delta into existing bitsets must be bit-identical to
    rebuilding from the union of keys (the epoch loop's O(delta) invariant)."""
    first = _hashes(spark, 0, 3000)
    delta = _hashes(spark, 3000, 4500)
    base = S.build_segments(first, n_segments=8)
    merged = {r.segment_id: r for r in S.merge_segments(base, delta, n_segments=8).collect()}
    rebuilt = {r.segment_id: r for r in S.build_segments(first.unionByName(delta), n_segments=8).collect()}
    assert set(merged) == set(rebuilt)
    for sid, r in rebuilt.items():
        assert merged[sid].bits == r.bits, sid
        assert merged[sid].n_keys == r.n_keys, sid


def test_merge_into_empty_segment(spark):
    """Keys landing in a segment with no prior bitset get a fresh bitset."""
    base = S.build_segments(_hashes(spark, 0, 8).filter("url_hash % 8 = 0"), n_segments=8)
    delta = _hashes(spark, 0, 2000)
    merged = S.merge_segments(base, delta, n_segments=8)
    flagged = S.bloom_flag(delta, merged, n_segments=8)
    assert flagged.filter("NOT maybe_seen").count() == 0  # zero false negatives


def test_bits_sizing():
    m, k = S.bits_for(1_000_000, 0.01)
    assert 9_000_000 < m < 10_000_000
    assert 6 <= k <= 8
