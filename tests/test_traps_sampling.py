"""Unit tests for crawl-trap detection (operators/traps.py), stratified
sampling (operators/sampling.py) and the near-dup training manifest
(operators/image_dedup.neardup_manifest)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nrsr_crawler_spark.operators import politeness, traps
from nrsr_crawler_spark.operators.image_dedup import neardup_manifest
from nrsr_crawler_spark.operators.sampling import stratified_topk


def _frontier(spark, n_trap=50, n_legit=10):
    trap = spark.range(n_trap).select(
        F.concat(F.lit("https://www.nrsr.sk/cal.aspx?day="), F.col("id")).alias("canon_url"),
        F.lit("www.nrsr.sk").alias("host"),
        # traps get the HIGHEST seqs: under LIFO they would pop first
        # without demotion, so the pop assertion below tests the demotion
        (F.col("id") + 1000).alias("seq"),
        F.lit(0).alias("priority"),
    )
    legit = spark.range(n_legit).select(
        F.concat(F.lit("https://www.nrsr.sk/page.aspx?ID="), F.col("id") % 5).alias("canon_url"),
        F.lit("www.nrsr.sk").alias("host"),
        F.col("id").alias("seq"),
        F.lit(0).alias("priority"),
    ).dropDuplicates(["canon_url"])
    return trap.unionByName(legit).withColumn("url_hash", F.xxhash64("canon_url"))


def test_trap_templates_flags_only_exploding_shapes(spark):
    fr = _frontier(spark)
    flagged = traps.trap_templates(fr, max_urls=20).collect()
    assert len(flagged) == 1
    row = flagged[0]
    assert row.template == "https://www.nrsr.sk/cal.aspx?day=N"
    assert row.n_urls == 50 and row.host == "www.nrsr.sk"


def test_demote_traps_pushes_trap_urls_behind_legit(spark):
    fr = _frontier(spark)
    t = traps.trap_templates(fr, max_urls=20)
    demoted = traps.demote_traps(fr, t, penalty=10)
    assert set(demoted.columns) == set(fr.columns)
    # all 5 legit pages must pop before any trap URL under the priority order
    popped = politeness.pop_budget(demoted, budget=5, tiebreak=[F.col("canon_url")])
    urls = [r.canon_url for r in popped.collect()]
    assert len(urls) == 5 and all("page.aspx" in u for u in urls)
    # demotion, not deletion: the trap rows are still present
    assert demoted.count() == fr.count()


def test_stratified_topk_matches_naive_window_and_is_deterministic(spark):
    from pyspark.sql.window import Window

    df = spark.range(1000).select(
        F.concat(F.lit("doc"), F.col("id")).alias("doc_id"),
        (F.col("id") % 3).cast("int").alias("stratum"),
        F.md5(F.concat(F.lit("doc"), F.col("id"))).alias("ord"),
    )
    got = stratified_topk(df, ["stratum"], F.col("ord"), k=7, num_salts=4)
    naive = (
        df.withColumn("rn", F.row_number().over(Window.partitionBy("stratum").orderBy("ord")))
        .filter(F.col("rn") <= 7)
    )
    a = sorted((r.stratum, r.rn, r.doc_id) for r in got.collect())
    b = sorted((r.stratum, r.rn, r.doc_id) for r in naive.collect())
    assert a == b and len(a) == 21
    again = sorted(
        (r.stratum, r.rn, r.doc_id)
        for r in stratified_topk(df, ["stratum"], F.col("ord"), k=7, num_salts=4).collect()
    )
    assert again == a


def test_neardup_manifest_picks_smallest_passing_member(spark):
    groups = spark.createDataFrame(
        [
            ("a1", "a1"), ("a2", "a1"), ("a3", "a1"),  # a1 fails quality
            ("b1", "b1"), ("b2", "b1"),                # all fail
            ("c1", "c1"),                              # singleton, passes
        ],
        "image_id string, rep string",
    )
    quality = spark.createDataFrame(
        [("a1", False), ("a2", True), ("a3", True), ("b1", False), ("b2", False), ("c1", True)],
        "image_id string, ok boolean",
    )
    rows = {r.rep: r for r in neardup_manifest(groups, quality).collect()}
    assert set(rows) == {"a1", "c1"}  # b-group dropped: nothing passes
    assert rows["a1"].kept_id == "a2" and rows["a1"].n_members == 3 and rows["a1"].n_quality == 2
    assert rows["c1"].kept_id == "c1" and rows["c1"].n_members == 1 and rows["c1"].n_quality == 1


# -- temperature-smoothed mixture sampling ------------------------------------


def test_temperature_quotas_rebalance_toward_rare_strata(spark):
    import math

    from nrsr_crawler_spark.operators.sampling import temperature_quotas

    # 90/10 skew: sqrt smoothing lifts the rare stratum's share above 10%
    rows = [(i, "big") for i in range(90)] + [(i + 100, "small") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    q = {r["src"]: r for r in temperature_quotas(df, "src", n_total=50).collect()}
    w_big = round(math.sqrt(90) * 1_000_000)
    w_small = round(math.sqrt(10) * 1_000_000)
    assert q["big"]["quota"] == (50 * w_big) // (w_big + w_small)
    assert q["small"]["quota"] == (50 * w_small) // (w_big + w_small)
    # raw share would give small 5/50; smoothing gives it more
    assert q["small"]["quota"] > 5
    assert q["big"]["quota"] + q["small"]["quota"] <= 50


def test_temperature_mixture_sample_deterministic_and_within_quota(spark):
    from nrsr_crawler_spark.operators.sampling import temperature_mixture_sample

    rows = [(i, "a" if i % 4 else "b") for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out1 = sorted(
        (r["doc_id"], r["src"], r["pick_rank"])
        for r in temperature_mixture_sample(df, "doc_id", "src", 30).collect()
    )
    out2 = sorted(
        (r["doc_id"], r["src"], r["pick_rank"])
        for r in temperature_mixture_sample(df, "doc_id", "src", 30).collect()
    )
    assert out1 == out2  # reproducible
    per_src = {}
    for _id, src, rk in out1:
        per_src.setdefault(src, []).append(rk)
    for src, rks in per_src.items():
        assert sorted(rks) == list(range(1, len(rks) + 1))  # contiguous ranks


# -- curriculum ordering ---------------------------------------------------


def test_curriculum_order_interleaves_and_ascends(spark):
    from pyspark.sql import functions as F

    from nrsr_crawler_spark.operators.sampling import curriculum_order

    rows = [
        # (id, stratum, difficulty proxy)
        (1, "a", 30), (2, "a", 10), (3, "a", 20),
        (4, "b", 5), (5, "b", 50),
        (6, "c", 7),
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, d long")
    out = sorted(
        curriculum_order(df, "doc_id", "src", F.col("d")).collect(),
        key=lambda r: r["order_key"],
    )
    # total unique order
    assert len({r["order_key"] for r in out}) == len(rows)
    # the first |strata| positions are one doc from EACH stratum (round-robin)
    first_wave = [r["stratum"] for r in out[:3]]
    assert sorted(first_wave) == ["a", "b", "c"]
    # and they are each stratum's EASIEST doc
    assert {r["doc_id"] for r in out[:3]} == {2, 4, 6}
    # difficulty ascends within every stratum along the global order
    by_stratum = {}
    for r in out:
        by_stratum.setdefault(r["stratum"], []).append(r["difficulty"])
    for s, ds in by_stratum.items():
        assert ds == sorted(ds), s
    # ties/determinism: re-run produces the identical order
    again = sorted(
        curriculum_order(df, "doc_id", "src", F.col("d")).collect(),
        key=lambda r: r["order_key"],
    )
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in out]


def test_importance_weights_match_python_reference(spark):
    import hashlib

    from nrsr_crawler_spark.operators.sampling import importance_weights

    docs = [
        (1, "parliament session vote law", "wiki"),
        (2, "spam casino bonus click click", "web"),
        (3, "law vote parliament debate committee", "wiki"),
        (4, "click here casino vote", "web"),
    ]
    B, SCALE = 16, 1_000_000

    def bucket(w: str) -> int:
        return int(hashlib.md5(w.encode()).hexdigest()[:4], 16) % B

    raw = [(d, bucket(w)) for d, t, _ in docs for w in t.split(" ")]
    tgt = [b for d, b in raw if d in (1, 3)]
    rc: dict[int, int] = {}
    tc: dict[int, int] = {}
    for _, b in raw:
        rc[b] = rc.get(b, 0) + 1
    for b in tgt:
        tc[b] = tc.get(b, 0) + 1
    ratio = {b: (tc.get(b, 0) + 1) * SCALE // (rc[b] + 1) for b in rc}
    exp = {}
    for d, _, _ in docs:
        bs = [b for dd, b in raw if dd == d]
        s = sum(ratio[b] for b in bs)
        exp[d] = (len(bs), s, s // len(bs))

    sdf = spark.createDataFrame(docs, "doc_id long, text string, source string")
    out = importance_weights(
        sdf, sdf.filter("source = 'wiki'"), "doc_id", "text", n_buckets=B, scale=SCALE
    )
    got = {r.doc_id: (r.n_tokens, r.score, r.avg_weight) for r in out.collect()}
    assert got == exp
    # target-like docs outrank the spam by length-normalized weight
    assert min(got[1][2], got[3][2]) > max(got[2][2], got[4][2])
