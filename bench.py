"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "urls_scheduled_per_sec": ..., "frontier_urls": ...}

The north metric (BASELINE.json): URLs scheduled+deduped/sec — measured on
the flagship frontier pass (canonicalize → fingerprint → exact dedup → seen
anti-join → politeness pop) over a frontier synthesized from lineitem.
Scaling-efficiency evidence (local[8] vs local[32]) is produced by
scripts/scaling_bench.py and recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from nrsr_crawler_spark.session import get_spark  # noqa: E402


HEADLINE = [
    "flagship_frontier_schedule",
    "q1_pricing_summary",
    "j3_missing_presses",
    "o3_frontier_pop",
    "a1_clubs_sessionize",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_bruteforce_topk",
    "text_quality",
    "items_voting_votes",  # typed HTML parse → fold → nested votes pipeline
    "images_phash_neardup",  # image near-dup: banded Hamming join on phash
    "text_substring_dedup",  # exact dup-span detection, linear shingle join
    "link_pagerank",  # iterative integer PageRank, 3 shuffled iterations
    "images_quality_gate",  # decoded-pixel content gate: Arrow decode throughput
    "text_block_dedup",  # C4-style corpus-level span removal + doc rebuild
    "dedup_semantic",  # SemDeDup: codebook cells + within-cell cosine keep-one
    "text_boilerplate_strip",  # CCNet-style per-source frequent-block removal
    # round-4 wave:
    "link_hits",  # iterative integer HITS, 4 shuffled half-steps
    "dedup_containment",  # directed Broder containment, shingle self-join
    "docs_dsir_sample",  # DSIR importance weights: token explode + broadcast ratio
    "images_tile_neardup",  # tile-hash pair join on (tr, tc, hash) buckets
    "domain_budget_pop",  # eTLD+1-keyed two-level politeness pop
    "text_bpe_pairs",  # BPE pair counting: char-pair explode + one aggregate
    # round-5 promotions (VERDICT r4 next #5): the slowest registry queries,
    # budgeted so a plan regression in the iterative/explode kernels is
    # caught by the bench gate, not just the plan audit
    "link_kcore",  # iterative k-core peeling, semi-join fixpoint
    "text_pmi_collocations",  # corpus bigram explode + broadcast vocab joins
    "redirect_resolve",  # pointer-doubling redirect chains, 3 self-join rounds
]

# Per-query regression budgets (VERDICT r3 next #5): the cleanest observed
# median-of-3 per query across the r3/r4 full-bench readings (BENCH_r03.json
# window: cpu/mem control eff 0.763/0.547; r4 window: 0.824/0.181 — the
# per-query MIN across windows approximates the clean-window median, since
# host contention only ever inflates).  The check FAILS the bench run when a
# query exceeds 2× its budget IN A CLEAN WINDOW (same-run mem_control_eff
# ≥ 0.8); in contended windows the shuffle-heavy queries legitimately track
# the saturated external bus (r3 analysis: dedup_minhash_lsh 1.0→4.6 s at
# mem-eff 0.400 with an unchanged plan), so the check reports but does not
# fail.  Update a budget ONLY with a cleaner measured median, never to make
# a regression pass.
QUERY_BUDGETS_SEC = {
    # refreshed from the r4 full-bench reading (cpu/mem control eff
    # 0.956/0.513 — the cleanest full-bench window on record) per the
    # min-across-windows policy; link_pagerank/link_hits additionally
    # re-pinned after the broadcast-regime optimizations (idle-window
    # medians 4.34 / 4.88 s)
    "flagship_frontier_schedule": 1.71,
    "q1_pricing_summary": 0.41,
    "j3_missing_presses": 1.28,
    "o3_frontier_pop": 0.44,
    "a1_clubs_sessionize": 0.55,
    "dedup_minhash_lsh": 1.44,
    "dedup_simhash": 0.70,
    "ann_bruteforce_topk": 0.38,
    "text_quality": 0.22,
    "items_voting_votes": 1.10,
    "images_phash_neardup": 0.49,
    "text_substring_dedup": 0.24,
    "link_pagerank": 4.34,
    "images_quality_gate": 0.42,
    "text_block_dedup": 0.24,
    "dedup_semantic": 0.71,
    "text_boilerplate_strip": 0.29,
    "link_hits": 4.88,
    "dedup_containment": 1.72,
    "docs_dsir_sample": 1.03,
    "images_tile_neardup": 0.41,
    "domain_budget_pop": 0.38,
    "text_bpe_pairs": 0.47,
    # r5 promotions — link_kcore / text_pmi_collocations re-pinned after the
    # r5 replans (broadcast peel regime; single-pass gram counting) from a
    # median-of-3 at sf0.1; redirect_resolve keeps its r4 clean-window pin
    # (the r5 measurement window's CPU control ran ~40% low)
    "link_kcore": 7.6,
    "text_pmi_collocations": 1.45,
    "redirect_resolve": 4.3,
}


def frontier_throughput(
    spark, sf_dir: str, repeat: int = 5, mult: int | None = None
) -> tuple[float, int]:
    """North metric: URLs scheduled+deduped per second (median of repeats)."""
    med, _best, _times, n = frontier_throughput_detail(spark, sf_dir, repeat, mult)
    return med, n


def frontier_throughput_detail(
    spark, sf_dir: str, repeat: int = 5, mult: int | None = None
) -> tuple[float, float, list[float], int]:
    """North metric with per-pass detail: (median u/s, best u/s, pass times, n).

    ``mult`` = candidate URLs per lineitem row (env
    ``SPARK_GRAFT_BENCH_MULT``, default 16 → 9.6M URLs at sf0.1): the
    frontier must be big enough that per-pass work dwarfs fixed job overhead
    (~2 s), otherwise a parallelism comparison measures scheduling constants.
    """
    from nrsr_crawler_spark.operators import frontier, politeness, seen as seen_ops

    from nrsr_crawler_spark.sources.tpch import load

    if mult is None:
        mult = int(os.environ.get("SPARK_GRAFT_BENCH_MULT", "16"))
    li = load(spark, sf_dir, "lineitem")
    # ``mult`` URL candidates per lineitem row → dup-heavy frontier
    raw = li.select(
        F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("i"),
        "l_orderkey",
        "l_suppkey",
        "l_linenumber",
    ).select(
        F.concat(
            F.lit("HTTPS://WWW.NRSR.SK/web/Default.aspx?sid=zakony&ID="),
            (F.col("l_orderkey") * mult + F.col("i")) % 1000000,
            F.lit("&CisObdobia="),
            F.col("l_suppkey") % 8,
        ).alias("url"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("seq"),
        F.lit(0).alias("priority"),
    )
    n_candidates = raw.count()
    seen = load(spark, sf_dir, "orders").select(
        F.xxhash64(
            F.concat(
                F.lit("https://www.nrsr.sk/web/Default.aspx?CisObdobia="),
                F.col("o_custkey") % 8,
                F.lit("&ID="),
                F.col("o_orderkey") % 1000000,
                F.lit("&sid=zakony"),
            )
        ).alias("url_hash")
    )
    segments = seen_ops.build_segments(seen, n_segments=32).persist()
    segments.count()
    # broadcast the bitsets once, as the epoch loop does between snapshots
    bc = seen_ops.collect_segments(spark, segments)

    def one_pass() -> float:
        # the schedule pass never ships URL strings through an exchange
        # (scripts/shuffle_probe.py: 180.6 → 88.6 uncompressed exchange
        # bytes/URL vs the full-payload plan): slim dedup exchange
        # (url_hash, seq, priority, host ≈ 30 B/row) → bloom-pruned seen
        # anti-join → slim pop windows → canon re-derived MAP-SIDE and
        # broadcast-joined onto the budget-bounded winners.  The epoch loop's
        # ENQUEUE path keeps the full payload (its frontier delta write needs
        # every column once per URL ever); this pass is the per-epoch
        # scheduling cost, which at steady state dominates.
        t0 = time.perf_counter()
        cand = frontier.prepare_candidates_slim(raw)
        fresh = seen_ops.dedup_with_bloom(cand, seen, segments, n_segments=32, bc=bc)
        # politeness-realistic per-host budget: the pop stage's level-2 window
        # re-ranks ≤ num_salts·budget rows per host; a huge budget degenerates
        # that into a single-task sort of the whole frontier
        # num_salts bounds level-1 window parallelism for a single-host
        # frontier (profiled: the pop window is the dominant stage; 16 salts
        # capped it at 16-way).  Size it ~2× the largest parallelism level so
        # every core gets work at every measured cluster size.
        keys = politeness.pop_budget(
            fresh, budget=1000, num_salts=64, tiebreak=[F.col("url_hash")]
        ).select("url_hash", "seq", "rk")
        popped = frontier.rejoin_urls(keys, raw)
        popped.select(F.count(F.lit(1))).collect()
        return time.perf_counter() - t0

    # two untimed passes compile the (per-pass fresh) codegen classes and let
    # the JIT warm — steady-state throughput is the number that projects to a
    # long-running crawl, not the first-iteration compile cost
    one_pass()
    one_pass()
    times = [one_pass() for _ in range(repeat)]
    segments.unpersist()
    med = sorted(times)[len(times) // 2]
    best = min(times)
    return n_candidates / med, n_candidates / best, times, n_candidates


def frontier_throughput_multihost_detail(
    spark, sf_dir: str, repeat: int = 5, mult: int | None = None, n_hosts: int = 1000
) -> tuple[float, float, list[float], int]:
    """North-metric variant under real host diversity (VERDICT r4 next #4).

    Same schedule pass as :func:`frontier_throughput_detail` — slim dedup
    exchange → bloom-pruned seen anti-join → two-level politeness pop →
    map-side canon rejoin — but the frontier spans ``n_hosts`` hosts with a
    Zipf(1) popularity skew (host k gets ~1/k of the URL mass: the head
    host holds ~14% of a 1000-host frontier, the closest sandbox proxy for
    the 10^10-URL skew story) and each host gets its own Crawl-delay-derived
    pop budget (a pure function of the host, as robots.crawl_delay_budgets
    produces).  Zipf via inverse-CDF: host_id = floor(n_hosts^u) for
    u = hash-uniform(0,1) ⇒ density ∝ 1/k over [1, n_hosts].
    """
    from nrsr_crawler_spark.operators import frontier, politeness, seen as seen_ops
    from nrsr_crawler_spark.sources.tpch import load

    if mult is None:
        mult = int(os.environ.get("SPARK_GRAFT_BENCH_MULT", "16"))
    li = load(spark, sf_dir, "lineitem")
    u01 = (
        F.pmod(F.xxhash64((F.col("l_orderkey") * mult + F.col("i"))), F.lit(1_000_000))
        / 1_000_000.0
    )
    host_id = F.floor(F.pow(F.lit(float(n_hosts)), u01)).cast("long")
    raw = li.select(
        F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("i"),
        "l_orderkey",
        "l_suppkey",
        "l_linenumber",
    ).select(
        F.concat(
            F.lit("HTTPS://h"),
            host_id,
            F.lit(".example.sk/web/Default.aspx?sid=zakony&ID="),
            (F.col("l_orderkey") * mult + F.col("i")) % 1000000,
            F.lit("&CisObdobia="),
            F.col("l_suppkey") % 8,
        ).alias("url"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("seq"),
        F.lit(0).alias("priority"),
    )
    n_candidates = raw.count()
    seen_u01 = F.pmod(F.xxhash64(F.col("o_orderkey")), F.lit(1_000_000)) / 1_000_000.0
    seen = load(spark, sf_dir, "orders").select(
        F.xxhash64(
            F.concat(
                F.lit("https://h"),
                F.floor(F.pow(F.lit(float(n_hosts)), seen_u01)).cast("long"),
                F.lit(".example.sk/web/default.aspx?cisobdobia="),
                F.col("o_custkey") % 8,
                F.lit("&id="),
                F.col("o_orderkey") % 1000000,
                F.lit("&sid=zakony"),
            )
        ).alias("url_hash")
    )
    segments = seen_ops.build_segments(seen, n_segments=32).persist()
    segments.count()
    bc = seen_ops.collect_segments(spark, segments)
    # per-host Crawl-delay budget: delay_ms = 100 + hash(host)%900 (the same
    # dimension shape robots.crawl_delay_budgets emits), 60 s epoch ⇒
    # budget_h = 60000 div delay_ms ∈ [60, 600] — a pure function of host,
    # so the two-level pop stays exact
    budget_col = F.expr("60000 div (100 + pmod(xxhash64(host), 900))")

    def one_pass() -> float:
        t0 = time.perf_counter()
        cand = frontier.prepare_candidates_slim(raw)
        fresh = seen_ops.dedup_with_bloom(cand, seen, segments, n_segments=32, bc=bc)
        # host diversity supplies the level-1 parallelism (n_hosts × salts
        # buckets), so fewer salts per host than the single-host bench
        keys = politeness.pop_budget(
            fresh, budget=budget_col, num_salts=4, tiebreak=[F.col("url_hash")]
        ).select("url_hash", "seq", "rk")
        popped = frontier.rejoin_urls(keys, raw)
        popped.select(F.count(F.lit(1))).collect()
        return time.perf_counter() - t0

    one_pass()
    one_pass()
    times = [one_pass() for _ in range(repeat)]
    segments.unpersist()
    med = sorted(times)[len(times) // 2]
    best = min(times)
    return n_candidates / med, n_candidates / best, times, n_candidates


def crawl_throughput(spark) -> tuple[float, int, float]:
    """End-to-end crawl-engine rate: drain a deterministic wide synthetic
    site (seed → period lists → pagination → details/members) to fixpoint
    through the full epoch loop — pop, fetch-join, mapInPandas parse, canon,
    bloom dedup, lake commits.  Wide-and-shallow site so the run is a handful
    of meaty epochs, not a long pagination chain of fixed epoch overheads."""
    import tempfile

    from nrsr_crawler_spark.plans.epoch_loop import CrawlEngine
    from nrsr_crawler_spark.sources.synthetic_site import (
        PAGES_SCHEMA,
        SEED_URL,
        generate_site,
        site_rows,
    )

    site = generate_site(periods=8, pages_per_period=8, details_per_page=30, members_per_period=40)
    pages = spark.createDataFrame(site_rows(site), PAGES_SCHEMA)
    t0 = time.perf_counter()
    eng = CrawlEngine(
        spark, pages, tempfile.mkdtemp(prefix="nrsr_bench_") + "/lake",
        budget_per_host=100000, num_salts=16, n_segments=16,
    )
    stats = eng.run(seeds=[SEED_URL])
    dt = time.perf_counter() - t0
    return stats.fetched / dt, stats.fetched, dt


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        fn(spark, sf_dir).select(F.count(F.lit(1))).collect()  # warm (JIT, file listing)
        runs = []
        for _ in range(3):  # median-of-3: the sandbox VM's clock speed wanders
            t0 = time.perf_counter()
            fn(spark, sf_dir).select(F.count(F.lit(1))).collect()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[1], 3)

    ups_med, ups_best, pass_times, n_urls = frontier_throughput_detail(spark, sf_dir)
    mh_med, mh_best, mh_times, mh_urls = frontier_throughput_multihost_detail(
        spark, sf_dir
    )
    cps, n_pages, crawl_wall = crawl_throughput(spark)
    # adjacent hardware-ceiling readings make this artifact self-normalizing:
    # compare rounds via urls/s ÷ control, not raw urls/s (the VM's capacity
    # wanders with external host contention — VERDICT r2)
    from scripts.hw_controls import control_readings

    controls = control_readings()

    # per-query regression gate: enforced only when THIS window's memory-bus
    # control is clean (contended windows inflate shuffle-heavy queries for
    # reasons outside the plans — see QUERY_BUDGETS_SEC)
    budget_checked = controls.get("mem_control_eff", 0.0) >= 0.8
    budget_violations = sorted(
        name
        for name, t in timings.items()
        if name in QUERY_BUDGETS_SEC and t > 2 * QUERY_BUDGETS_SEC[name]
    )

    out = {
        "metric": "headline suite wall time (sf dir); north: urls_scheduled_per_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "query_budgets_sec": QUERY_BUDGETS_SEC,
        "budget_checked": budget_checked,
        "budget_violations": budget_violations,
        "sf": sf_dir,
        # the REPRODUCIBLE number (median of repeats) is THE north metric;
        # best-window is a footnote for cross-checking exceptional readings
        "urls_scheduled_per_sec": round(ups_med),
        "urls_scheduled_per_sec_best": round(ups_best),
        "frontier_pass_times_sec": [round(t, 3) for t in pass_times],
        "frontier_urls": n_urls,
        # multi-host variant: 1000 Zipf(1)-skewed hosts, per-host
        # Crawl-delay budgets (VERDICT r4 next #4)
        "urls_scheduled_per_sec_multihost": round(mh_med),
        "urls_scheduled_per_sec_multihost_best": round(mh_best),
        "frontier_multihost_pass_times_sec": [round(t, 3) for t in mh_times],
        "frontier_multihost_urls": mh_urls,
        "crawl_pages_per_sec": round(cps, 1),
        "crawl_pages": n_pages,
        "crawl_wall_sec": round(crawl_wall, 1),
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
        **controls,
    }
    print(json.dumps(out))
    spark.stop()
    if budget_checked and budget_violations:
        # clean window + >2× a recorded clean median = a real plan/perf
        # regression — fail the run so the driver records it loudly
        raise SystemExit(
            f"budget violations in a clean window: {budget_violations}"
        )


if __name__ == "__main__":
    main()
