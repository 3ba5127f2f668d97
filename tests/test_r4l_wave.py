"""Round-4 wave L: redirect resolution, politeness audit, dedup savings."""

from __future__ import annotations

from nrsr_crawler_spark.operators.compliance import politeness_audit
from nrsr_crawler_spark.operators.redirects import resolve_redirects
from nrsr_crawler_spark.operators.savings import dedup_savings


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_redirects_chain_resolution_and_hops(spark):
    # a→b→c→d→T: chain of 4 hops, plus a self-contained 2-cycle x↔y
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "T"), ("x", "y"), ("y", "x")],
        "src string, dst string",
    )
    out = {r["src"]: r for r in resolve_redirects(edges, doublings=3).collect()}
    assert out["a"]["final_url"] == "T" and out["a"]["hops"] == 4 and out["a"]["resolved"]
    assert out["b"]["final_url"] == "T" and out["b"]["hops"] == 3
    assert out["d"]["final_url"] == "T" and out["d"]["hops"] == 1
    # cycle members never leave the map's domain → flagged, not silent
    assert not out["x"]["resolved"] and not out["y"]["resolved"]


def test_redirects_chain_longer_than_2_pow_r_unresolved(spark):
    # 5-hop chain with only 2 doublings (resolves ≤4): head stays unresolved
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i + 1}") for i in range(5)], "src string, dst string"
    )
    out = {r["src"]: r for r in resolve_redirects(edges, doublings=2).collect()}
    assert not out["n0"]["resolved"]
    assert out["n1"]["resolved"] and out["n1"]["final_url"] == "n5"


def test_politeness_audit_violations(spark):
    # hA delay 100ms: gaps 50ms (violation) and 200ms (fine)
    # hB delay 100ms: single fetch → no gaps, ok
    fetches = spark.createDataFrame(
        [("hA", 0, 1), ("hA", 50_000, 2), ("hA", 250_000, 3), ("hB", 0, 4)],
        "host string, ts_us long, fetch_id long",
    )
    delays = spark.createDataFrame(
        [("hA", 100), ("hB", 100)], "host string, delay_ms long"
    )
    out = {r["host"]: r for r in politeness_audit(fetches, delays).collect()}
    assert out["hA"]["n_fetches"] == 3 and out["hA"]["n_gaps"] == 2
    assert out["hA"]["n_violations"] == 1 and out["hA"]["min_gap_ms"] == 50
    assert not out["hA"]["ok"]
    assert out["hB"]["n_gaps"] == 0 and out["hB"]["ok"]
    assert out["hB"]["min_gap_ms"] is None


def test_dedup_savings_keeps_min_id_bytes(spark):
    docs = spark.createDataFrame(
        [
            (1, "same", 100, "web"),
            (2, "same", 150, "web"),   # dup of 1 → 150 saved
            (3, "uniq", 70, "web"),
            (4, "same", 999, "books"), # same digest, other source: separate
        ],
        "doc_id long, content string, n_chars long, source string",
    )
    out = {r["source"]: r for r in
           dedup_savings(docs, "doc_id", "content", "n_chars", "source").collect()}
    web = out["web"]
    assert web["n_docs"] == 3 and web["n_groups"] == 2 and web["n_dups_removed"] == 1
    assert web["total_bytes"] == 320 and web["bytes_saved"] == 150
    assert web["savings_bps"] == 150 * 10000 // 320
    assert out["books"]["bytes_saved"] == 0 and out["books"]["savings_bps"] == 0


def test_wave_l_plans_no_python(spark):
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    assert "BatchEvalPython" not in _plan(resolve_redirects(edges, doublings=1))
    docs = spark.createDataFrame([(1, "c", 10, "s")], "doc_id long, content string, n_chars long, source string")
    plan = _plan(dedup_savings(docs, "doc_id", "content", "n_chars", "source"))
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
