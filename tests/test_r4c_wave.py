"""Round-4 wave C: triangle counting + mixture epoch planning."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from nrsr_crawler_spark.operators.mixture_plan import mixture_epoch_plan, source_token_counts
from nrsr_crawler_spark.operators.triangles import triangle_count


def _brute_triangles(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = {n for e in und for n in e}
    return sum(
        1
        for a, b, c in combinations(sorted(nodes), 3)
        if (a, b) in und and (a, c) in und and (b, c) in und
    )


def test_triangle_count_matches_bruteforce(spark):
    # K4 plus a pendant and a square: K4 has 4 triangles, square has 0
    edges = (
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]  # K4
        + [(4, 5)]  # pendant
        + [(10, 11), (11, 12), (12, 13), (13, 10)]  # C4, no triangles
        + [(2, 1), (3, 3)]  # reverse dup + self loop, both ignored
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    r = triangle_count(df).collect()[0]
    assert r["n_triangles"] == _brute_triangles(edges) == 4
    assert r["n_und_edges"] == 11


def test_triangle_count_hub_wedges_bounded_by_orientation(spark):
    # star: hub 0 connected to 1..20 — naive wedges at the hub = C(20,2)=190;
    # degree-ordered orientation points every edge INTO the hub, so the
    # oriented out-degree of the hub is 0 and total wedge work is 0.
    df = spark.createDataFrame([(0, i) for i in range(1, 21)], "src long, dst long")
    r = triangle_count(df).collect()[0]
    assert r["n_triangles"] == 0
    assert r["n_wedges"] == 0  # the curse-of-the-last-reducer case, defused


def test_triangle_count_empty(spark):
    df = spark.createDataFrame([], "src long, dst long")
    r = triangle_count(df).collect()[0]
    assert (r["n_und_edges"], r["n_wedges"], r["n_triangles"]) == (0, 0, 0)


def test_mixture_plan_arithmetic(spark):
    avail = spark.createDataFrame(
        [("a", 1000), ("b", 4000), ("c", 100)], "source string, avail_tokens long"
    )
    out = {
        r["source"]: r
        for r in mixture_epoch_plan(
            avail, {"a": 5000, "b": 4000, "c": 1000}, total_budget_tokens=10_000,
            max_epochs_bp=20_000,
        ).collect()
    }
    # a: target 5000 over 1000 avail = 5 epochs = 50000 bp, over cap
    assert out["a"]["target_tokens"] == 5000
    assert out["a"]["epochs_bp"] == 50_000 and out["a"]["over_cap"] == 1
    # b: target 4000 over 4000 = exactly 1 epoch
    assert out["b"]["epochs_bp"] == 10_000 and out["b"]["over_cap"] == 0
    # c: target 1000 over 100 avail = 10 epochs
    assert out["c"]["epochs_bp"] == 100_000 and out["c"]["over_cap"] == 1


def test_mixture_plan_unknown_source_gets_zero_weight(spark):
    avail = spark.createDataFrame([("x", 500)], "source string, avail_tokens long")
    r = mixture_epoch_plan(avail, {"a": 10000}, 1000).collect()[0]
    assert r["weight_bp"] == 0 and r["target_tokens"] == 0 and r["epochs_bp"] == 0


def test_source_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "one two three", "s1"), (2, "four five", "s1"), (3, "", "s2")],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r["avail_tokens"] for r in source_token_counts(df, "source", "text").collect()}
    assert got == {"s1": 5, "s2": 0}


def test_registry_queries_stay_jvm_side(spark):
    from nrsr_crawler_spark.entry_queries import QUERIES

    df = QUERIES["mixture_epoch_plan"](spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
