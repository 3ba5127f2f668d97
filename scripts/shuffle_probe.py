"""Shuffle-bytes probe: measure exchanged bytes per URL for one frontier
schedule+dedup+pop pass, full-row pop vs slim pop (VERDICT r2 next #2 —
"Done = measured shuffle-bytes/URL down ≥2×, read from the Spark listener").

Method: execute the pass, then walk the EXECUTED plan tree and sum the
``shuffleBytesWritten`` SQLMetric over every exchange (AQE query stages
included).  Prints one JSON line with bytes + bytes/URL for both variants.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nrsr_crawler_spark.session import get_spark  # noqa: E402


def _walk(node):
    yield node
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        yield from _walk(node.executedPlan())
        return
    if cls.endswith("QueryStageExec"):
        yield from _walk(node.plan())
        return
    if cls == "ReusedExchangeExec":
        return  # its child already counted under the original exchange
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i))


def shuffle_bytes(df) -> int:
    # wrap in a count so no payload rows cross to the driver; the SAME Dataset
    # object is executed and probed, so its (adaptive) executedPlan carries
    # the populated SQLMetrics.  The count's own final single-row exchange is
    # negligible and identical across variants.
    import time

    agg = df.select(F.count(F.lit(1)))
    t0 = time.perf_counter()
    agg.collect()
    wall = time.perf_counter() - t0
    qe = agg._jdf.queryExecution()
    written = data = 0
    for node in _walk(qe.executedPlan()):
        m = node.metrics()
        it = m.iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "shuffleBytesWritten":
                written += kv._2().value()  # on-the-wire (LZ4-compressed)
            elif kv._1() == "dataSize" and node.getClass().getSimpleName().startswith(
                ("ShuffleExchange", "Exchange")
            ):
                data += kv._2().value()  # uncompressed rows through exchanges
    return int(written), int(data), wall


def one_pass(spark, sf_dir: str, slim: bool):
    from nrsr_crawler_spark.operators import frontier, politeness, seen as seen_ops
    from nrsr_crawler_spark.sources.tpch import load

    mult = int(os.environ.get("SPARK_GRAFT_BENCH_MULT", "16"))
    li = load(spark, sf_dir, "lineitem")
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
    n = raw.count()
    seen = load(spark, sf_dir, "orders").select(
        F.xxhash64(F.concat(F.lit("x"), F.col("o_orderkey"))).alias("url_hash")
    )
    segments = seen_ops.build_segments(seen, n_segments=32).persist()
    segments.count()
    bc = seen_ops.collect_segments(spark, segments)
    if slim == "schedule":
        # URL strings never shuffle: slim dedup exchange + slim pop windows,
        # canon re-derived map-side and broadcast-joined onto the winners
        cand = frontier.prepare_candidates_slim(raw)
        fresh = seen_ops.dedup_with_bloom(cand, seen, segments, n_segments=32, bc=bc)
        keys = politeness.pop_budget(
            fresh, budget=1000, num_salts=64, tiebreak=[F.col("url_hash")]
        ).select("url_hash", "seq", "rk")
        popped = frontier.rejoin_urls(keys, raw)
    else:
        cand = frontier.prepare_candidates(raw)
        fresh = seen_ops.dedup_with_bloom(cand, seen, segments, n_segments=32, bc=bc)
        if slim:
            popped = politeness.pop_budget_slim(fresh, budget=1000, num_salts=64, tiebreak_cols=["url_hash"])
        else:
            popped = politeness.pop_budget(fresh, budget=1000, num_salts=64, tiebreak=[F.col("canon_url")])
    shuffle_bytes(popped)  # warm pass (codegen/JIT)
    written, data, wall = shuffle_bytes(popped)
    segments.unpersist()
    return written, data, wall, n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("shuffle-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name, slim in (("full_row_pop", False), ("slim_pop", True), ("slim_schedule", "schedule")):
        written, data, wall, n = one_pass(spark, sf_dir, slim)
        out[name] = {
            "shuffle_bytes_written": written,
            "exchange_data_bytes": data,
            "urls": n,
            "wire_bytes_per_url": round(written / n, 1),
            "data_bytes_per_url": round(data / n, 1),
            "wall_sec": round(wall, 2),
        }
    # headline reduction: the shipped slim-schedule plan vs the full-payload
    # round-2 plan (slim_pop is the intermediate step, kept for attribution)
    out["data_reduction_x"] = round(
        out["full_row_pop"]["data_bytes_per_url"]
        / out["slim_schedule"]["data_bytes_per_url"],
        2,
    )
    out["wire_reduction_x"] = round(
        out["full_row_pop"]["wire_bytes_per_url"]
        / out["slim_schedule"]["wire_bytes_per_url"],
        2,
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
