"""Round-4 wave G: k-core peeling, weighted bottom-k, alignment gate,
vocab-growth curve."""

from __future__ import annotations

from pyspark.sql import functions as F

from nrsr_crawler_spark.operators.alignment import alignment_gate
from nrsr_crawler_spark.operators.bottomk import weighted_bottom_k
from nrsr_crawler_spark.operators.kcore import kcore_peel
from nrsr_crawler_spark.operators.vocab_growth import vocab_growth


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def _sym(spark, pairs):
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(rows, "src long, dst long")


# --------------------------------------------------------------------------
# k-core
# --------------------------------------------------------------------------


def test_kcore_peels_cascade(spark):
    # triangle 1-2-3 plus a tail 3-4-5: at k=2 the tail peels over 2 rounds
    edges = _sym(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    out = {r["node"]: r["deg"] for r in kcore_peel(edges, k=2, rounds=3).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_fixed_rounds_match_manual_unroll(spark):
    # chain 1-2-3-4: k=2 kills endpoints each round; after 2 rounds empty
    edges = _sym(spark, [(1, 2), (2, 3), (3, 4)])
    assert kcore_peel(edges, k=2, rounds=2).count() == 0
    # one round only: endpoints gone, middle edge survives
    one = {r["node"]: r["deg"] for r in kcore_peel(edges, k=2, rounds=1).collect()}
    assert one == {2: 1, 3: 1}


# --------------------------------------------------------------------------
# weighted bottom-k
# --------------------------------------------------------------------------


def test_weighted_bottom_k_prefers_heavy_rows(spark):
    rows = [(i, 1 if i < 500 else 1000) for i in range(600)]
    df = spark.createDataFrame(rows, "id long, w long")
    got = weighted_bottom_k(df, "id", "w", k=50).collect()
    assert len(got) == 50
    # heavy rows (ids 500+) have priorities ~1000× smaller — they dominate
    heavy = sum(1 for r in got if r["id"] >= 500)
    assert heavy >= 45
    # deterministic: second run identical
    again = weighted_bottom_k(df, "id", "w", k=50).collect()
    assert sorted(r["id"] for r in got) == sorted(r["id"] for r in again)


def test_weighted_bottom_k_is_take_ordered_not_global_sort(spark):
    df = spark.createDataFrame([(1, 1)], "id long, w long")
    plan = _plan(weighted_bottom_k(df, "id", "w", k=5))
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan


# --------------------------------------------------------------------------
# alignment gate
# --------------------------------------------------------------------------


def test_alignment_gate_scores_and_threshold(spark):
    # phash with ALL bits set → every bucket hits → score 10000, aligned
    # phash 0 → no bucket hits → score 0, not aligned
    rows = [("all", -1, "some caption words"), ("none", 0, "some caption words")]
    df = spark.createDataFrame(rows, "image_id string, phash long, caption string")
    out = {r["image_id"]: r for r in alignment_gate(df, threshold_bps=5000).collect()}
    assert out["all"]["score_bps"] == 10000 and out["all"]["aligned"]
    assert out["none"]["score_bps"] == 0 and not out["none"]["aligned"]
    assert out["all"]["n_buckets"] == out["none"]["n_buckets"] == 3


def test_alignment_gate_null_and_empty_captions_drop(spark):
    rows = [("a", 5, None), ("b", 5, "   "), ("c", -1, "ok")]
    df = spark.createDataFrame(rows, "image_id string, phash long, caption string")
    got = alignment_gate(df).collect()
    assert [r["image_id"] for r in got] == ["c"]


def test_alignment_gate_single_shuffle_no_python(spark):
    df = spark.createDataFrame([("a", 1, "x y")], "image_id string, phash long, caption string")
    plan = _plan(alignment_gate(df))
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
    assert "Join" not in plan  # captions never join anything


# --------------------------------------------------------------------------
# vocab growth
# --------------------------------------------------------------------------


def test_vocab_growth_curve_exact(spark):
    # ids 0..9 → bucket == id with n_checkpoints=10
    docs = [
        (0, "a b"),        # 2 tokens, 2 new
        (1, "a c"),        # 2 tokens, 1 new
        (5, "a b c"),      # 3 tokens, 0 new
        (9, "d"),          # 1 token, 1 new
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["bucket"]: (r["cum_tokens"], r["cum_vocab"]) for r in
           vocab_growth(df, "doc_id", "text", n_checkpoints=10).collect()}
    assert out[0] == (2, 2)
    assert out[1] == (4, 3)
    assert out[5] == (7, 3)
    assert out[9] == (8, 4)


def test_vocab_growth_monotone_and_vocab_le_tokens(spark):
    docs = [(i, f"w{i % 7} w{i % 3} common") for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = sorted(vocab_growth(df, "doc_id", "text").collect(), key=lambda r: r["bucket"])
    for prev, cur in zip(rows, rows[1:]):
        assert cur["cum_tokens"] >= prev["cum_tokens"]
        assert cur["cum_vocab"] >= prev["cum_vocab"]
    assert all(r["cum_vocab"] <= r["cum_tokens"] for r in rows)
