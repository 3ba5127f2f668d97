"""Round-4 wave K: co-citation pairs, transition matrix, PMI collocations."""

from __future__ import annotations

from nrsr_crawler_spark.operators.cocitation import cocitation_pairs
from nrsr_crawler_spark.operators.collocations import pmi_collocations
from nrsr_crawler_spark.operators.transitions import transition_matrix


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_cocitation_counts_and_hub_cap(spark):
    edges = []
    # citers 1..3 each cite pages 10 and 11 → pair (10,11) common=3
    for c in (1, 2, 3):
        edges += [(c, 10), (c, 11)]
    # citer 4 cites 10,12 → (10,12) common=1 only
    edges += [(4, 10), (4, 12)]
    # hub citer 99 cites 20 pages → dropped entirely at max_out=16
    edges += [(99, 100 + i) for i in range(20)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r["id_a"], r["id_b"]): r["n_common"] for r in
           cocitation_pairs(df, min_common=2, max_out=16).collect()}
    assert got == {(10, 11): 3}


def test_cocitation_dedups_multi_edges(spark):
    # duplicate (citer, cited) edges count once
    df = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 11), (2, 10), (2, 11)], "src long, dst long"
    )
    got = {(r["id_a"], r["id_b"]): r["n_common"] for r in
           cocitation_pairs(df, min_common=2).collect()}
    assert got == {(10, 11): 2}


def test_transition_matrix_probabilities(spark):
    rows = [
        (1, 1, 10, "view"), (2, 1, 20, "view"), (3, 1, 30, "buy"),
        (4, 2, 10, "view"), (5, 2, 20, "view"), (6, 2, 30, "view"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts long, event_type string")
    out = {(r["cur"], r["nxt"]): r for r in
           transition_matrix(df, "user_id", "ts", "event_type", "event_id").collect()}
    # view→view 3 times, view→buy once → 7500 / 2500 bps
    assert out[("view", "view")]["n"] == 3 and out[("view", "view")]["p_bps"] == 7500
    assert out[("view", "buy")]["n"] == 1 and out[("view", "buy")]["p_bps"] == 2500
    assert ("buy", "view") not in out  # sequences never cross users


def test_transition_matrix_no_global_window(spark):
    df = spark.createDataFrame([(1, 1, 1, "a")], "event_id long, user_id long, ts long, event_type string")
    plan = _plan(transition_matrix(df, "user_id", "ts", "event_type", "event_id"))
    assert "BatchEvalPython" not in plan


def test_pmi_collocations_find_true_pair(spark):
    # "new york" always together; filler words independent
    docs = [(i, "new york " + ("a b c d e f g h " * 2)) for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = pmi_collocations(df, "doc_id", "text", k=5, min_count=2).collect()
    top = out[0]
    assert (top["w1"], top["w2"]) == ("new", "york")
    assert top["c_ab"] == 10
    # ratio = c_ab*N/(c_a*c_b) = 10*180/(10*10) = 18 → floor log2 = 4
    assert top["ratio_q"] == 18 and top["pmi_bits"] == 4


def test_pmi_top_k_is_take_ordered(spark):
    df = spark.createDataFrame([(1, "x y x y")], "doc_id long, text string")
    plan = _plan(pmi_collocations(df, "doc_id", "text", k=5, min_count=1))
    assert "TakeOrderedAndProject" in plan and "BatchEvalPython" not in plan
