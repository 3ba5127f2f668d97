"""Unit tests: leak-safe split assignment + quality keep-one over near-dup
components (operators/splits.py, dedup.neardup_keep_best)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nrsr_crawler_spark.operators.dedup import neardup_keep_best
from nrsr_crawler_spark.operators.splits import (
    assign_splits_leak_safe,
    raw_split,
    split_leakage_report,
)


def _band_examples(spark, want: dict[str, int], upto: int = 5000) -> dict[str, int]:
    """Find concrete ids landing in each requested split band (val/test/
    train) — the bands are md5-derived, so probe rather than hand-pick."""
    df = spark.range(upto).select(
        F.col("id"), raw_split(F.col("id")).alias("s")
    )
    out: dict[str, list[int]] = {"val": [], "test": [], "train": []}
    for r in df.collect():
        if len(out[r["s"]]) < want.get(r["s"], 0):
            out[r["s"]].append(r["id"])
    for split, n in want.items():
        assert len(out[split]) >= n, f"not enough {split} ids below {upto}"
    return out


def test_leak_safe_assignment_moves_straddling_members(spark):
    bands = _band_examples(spark, {"val": 2, "train": 3, "test": 1})
    v1, v2 = bands["val"][:2]
    t1, t2, t3 = bands["train"][:3]
    x1 = bands["test"][0]
    docs = spark.createDataFrame(
        [(i,) for i in (v1, v2, t1, t2, t3, x1)], "doc_id long"
    )
    # component A: {v1, t1} (straddles val/train); B: {t2, t3} (pure train);
    # v2 and x1 are singletons
    pairs = spark.createDataFrame(
        [(min(v1, t1), max(v1, t1)), (min(t2, t3), max(t2, t3))],
        "id_a long, id_b long",
    )
    out = {r["doc_id"]: r for r in assign_splits_leak_safe(docs, pairs).collect()}
    rep_a = min(v1, t1)
    # every member of A lands on the REP's split — no straddle survives
    assert out[v1]["split_final"] == out[t1]["split_final"] == out[rep_a]["split_raw"]
    assert out[v1]["group_id"] == out[t1]["group_id"] == rep_a
    # exactly the non-rep member moved (its raw split — val vs train —
    # necessarily differs from the rep's)
    assert out[max(v1, t1)]["moved"] and not out[rep_a]["moved"]
    # pure-train component: nobody moves
    assert not out[t2]["moved"] and not out[t3]["moved"]
    # singletons keep their raw split and map to themselves
    assert out[v2]["group_id"] == v2 and out[v2]["split_final"] == "val"
    assert out[x1]["group_id"] == x1 and out[x1]["split_final"] == "test"
    assert not out[v2]["moved"] and not out[x1]["moved"]


def test_leak_safe_assignment_no_cross_split_edges_remain(spark):
    # random-ish graph: chain 0-1-2-3 plus pair (10, 11)
    docs = spark.createDataFrame([(i,) for i in [0, 1, 2, 3, 10, 11, 99]], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    assigned = assign_splits_leak_safe(docs, pairs)
    a = assigned.alias("a")
    b = assigned.alias("b")
    straddle = (
        pairs.join(a, pairs["id_a"] == F.col("a.doc_id"))
        .join(b, pairs["id_b"] == F.col("b.doc_id"))
        .filter(F.col("a.split_final") != F.col("b.split_final"))
        .count()
    )
    assert straddle == 0
    # whereas the RAW assignment may straddle; the report lists exactly those
    rep = split_leakage_report(docs, pairs)
    raw = {r["doc_id"]: r["split_raw"] for r in assigned.collect()}
    expected = {
        (ia, ib)
        for ia, ib in [(0, 1), (1, 2), (2, 3), (10, 11)]
        if raw[ia] != raw[ib]
    }
    got = {(r["id_a"], r["id_b"]) for r in rep.collect()}
    assert got == expected


def test_neardup_keep_best_prefers_quality_then_min_id(spark):
    docs = spark.createDataFrame(
        [(1, 50), (2, 90), (3, 90), (4, 10), (9, 77)],
        "doc_id long, q long",
    )
    # component {1,2,3}: max q=90 shared by 2 and 3 → min id 2 wins;
    # component {4}: alone; 9: alone
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = {r["group_id"]: r for r in neardup_keep_best(docs, pairs, "doc_id", "q").collect()}
    assert out[1]["kept_id"] == 2 and out[1]["kept_quality"] == 90
    assert out[1]["n_members"] == 3
    assert out[4]["kept_id"] == 4 and out[4]["n_members"] == 1
    assert out[9]["kept_id"] == 9 and out[9]["kept_quality"] == 77
