"""Round-4 wave J: edit-distance dedup, stopword induction, depth profile."""

from __future__ import annotations

from nrsr_crawler_spark.operators.edit_dedup import edit_neardup_pairs
from nrsr_crawler_spark.operators.stopwords import induce_stopwords
from nrsr_crawler_spark.operators.url_profile import depth_profile


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_edit_pairs_threshold_and_blocking(spark):
    rows = [
        (1, "the quick brown fox"),
        (2, "the quick brown fax"),   # 1 edit from 1
        (3, "the quick brown foxes"), # 2 edits from 1, 3 from 2
        (4, "a completely different title"),
        (5, "xxx quick brown fox"),   # 1-edit-ish but different PREFIX → unblocked
    ]
    df = spark.createDataFrame(rows, "id long, title string")
    got = {(r["id_a"], r["id_b"]): r["edits"] for r in
           edit_neardup_pairs(df, "id", "title", max_edits=2, prefix_len=12).collect()}
    assert got[(1, 2)] == 1
    assert got[(1, 3)] == 2
    assert (2, 3) not in got          # 3 edits
    assert all(4 not in p for p in got)
    assert all(5 not in p for p in got)  # documented prefix-blocking recall miss


def test_edit_pairs_hot_block_capped(spark):
    # 10 identical-prefix rows with cap 4 → block dropped, zero pairs
    rows = [(i, f"same prefix here {i}") for i in range(10)]
    df = spark.createDataFrame(rows, "id long, title string")
    assert edit_neardup_pairs(df, "id", "title", max_block=4).count() == 0
    plan = _plan(edit_neardup_pairs(df, "id", "title"))
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


def test_stopword_induction_floor_and_rank(spark):
    docs = (
        [(i, "the castle of the king", "en") for i in range(10)]
        + [(100 + i, "a rare word appears", "en") for i in range(2)]
        + [(200 + i, "na hrade kral", "sk") for i in range(5)]
    )
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    out = induce_stopwords(df, "doc_id", "text", "lang", k=5, min_df_bps=5000).collect()
    en = {r["term"]: r for r in out if r["lang"] == "en"}
    # "the" in 10/12 en docs → df 10, 8333 bps; ties rank alphabetically
    # (castle, king, of, the all df=10) so "the" lands at rank 4
    assert en["the"]["df"] == 10 and en["the"]["df_bps"] == 8333 and en["the"]["rank"] == 4
    assert en["castle"]["rank"] == 1
    assert "rare" not in en  # 2/12 < 50% floor
    sk = {r["term"] for r in out if r["lang"] == "sk"}
    assert sk == {"hrade", "kral", "na"}
    # per-doc dedup: repeated term in one doc counts once
    rep = spark.createDataFrame([(1, "spam spam spam", "en")], "doc_id long, text string, lang string")
    r = induce_stopwords(rep, "doc_id", "text", "lang", k=5, min_df_bps=0).collect()
    assert [x["df"] for x in r] == [1]


def test_stopword_plan_uses_window_group_limit(spark):
    df = spark.createDataFrame([(1, "a b", "en")], "doc_id long, text string, lang string")
    plan = _plan(induce_stopwords(df, "doc_id", "text", "lang"))
    assert "WindowGroupLimit" in plan and "BatchEvalPython" not in plan


def test_depth_profile_string_derivation(spark):
    rows = [
        ("https://a.sk",),                 # depth 0, no query
        ("https://a.sk/x/y",),             # depth 2
        ("https://a.sk/x/y?q=1",),         # depth 2, query
        ("http://b.sk/only",),             # other host, depth 1
    ]
    df = spark.createDataFrame(rows, "url string")
    out = {(r["host"], r["depth"], r["has_query"]): r for r in depth_profile(df).collect()}
    assert out[("a.sk", 0, False)]["n_urls"] == 1
    assert out[("a.sk", 2, False)]["n_urls"] == 1
    assert out[("a.sk", 2, True)]["n_urls"] == 1
    assert out[("a.sk", 0, False)]["share_bps"] == 3333
    assert out[("b.sk", 1, False)]["share_bps"] == 10000
    plan = _plan(depth_profile(df))
    assert "BatchEvalPython" not in plan and "parse_url" not in plan
