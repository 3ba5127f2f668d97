"""MERGE sink semantics vs the reference pipeline (pipelines.py:133-144):
(a) identical re-crawl row → no-op, (b) changed row → old row archived and
replaced, (c) new key → insert (FIXTURES.md §6 upsert test vectors)."""

from __future__ import annotations

import pytest

from nrsr_crawler_spark.operators.merge_sink import merge_upsert, natural_keys_for


def test_natural_keys_dispatch():
    assert natural_keys_for("member") == ("type", "external_id", "period_num")
    assert natural_keys_for("committeeschedule") == ("type", "date", "time")
    with pytest.raises(ValueError):
        natural_keys_for("nope")  # pipelines.py:130-131


def test_merge_upsert_semantics(spark):
    cur = spark.createDataFrame(
        [("member", 1, 7, "Ján"), ("member", 2, 7, "Eva"), ("member", 3, 7, "Petra")],
        ["type", "external_id", "period_num", "forename"],
    )
    batch = spark.createDataFrame(
        [
            ("member", 1, 7, "Ján"),      # unchanged → skip
            ("member", 2, 7, "Eva Nová"),  # changed → archive old, replace
            ("member", 9, 7, "Nový"),     # new → insert
        ],
        ["type", "external_id", "period_num", "forename"],
    )
    res = merge_upsert(cur, batch, ["type", "external_id", "period_num"])
    actions = {r["external_id"]: r["action"] for r in res.actions.collect()}
    assert actions == {1: "unchanged", 2: "update", 9: "insert"}

    merged = {r["external_id"]: r["forename"] for r in res.merged.collect()}
    assert merged == {1: "Ján", 2: "Eva Nová", 3: "Petra", 9: "Nový"}

    archived = res.archived.collect()
    assert len(archived) == 1 and archived[0]["forename"] == "Eva"


def test_merge_batch_last_writer_wins(spark):
    cur = spark.createDataFrame([("m", 1, "old")], ["type", "external_id", "v"])
    batch = spark.createDataFrame(
        [("m", 1, "first", 10), ("m", 1, "second", 20)],
        ["type", "external_id", "v", "seq"],
    )
    res = merge_upsert(cur, batch, ["type", "external_id"], batch_order_col="seq")
    assert res.merged.collect()[0]["v"] == "second"


def test_merge_null_key_matches_null(spark):
    """ADVICE r2: the voting natural key includes press_num, which fold_voting
    legitimately emits as NULL — key comparison must be null-safe (the
    reference omits absent keys from match_dict, i.e. NULL matches NULL).
    Without eqNullSafe the NULL-press row re-classifies insert every batch
    and duplicates in merged."""
    cur = spark.createDataFrame(
        [("voting", 1, 7, None, "prešiel"), ("voting", 2, 7, 55, "prešiel")],
        "type string, external_id int, period_num int, press_num int, result string",
    )
    batch = spark.createDataFrame(
        [("voting", 1, 7, None, "neprešiel"),   # NULL key: must match → update
         ("voting", 2, 7, 55, "prešiel"),       # unchanged
         ("voting", 3, 7, None, "prešiel")],    # genuinely new NULL-key row
        "type string, external_id int, period_num int, press_num int, result string",
    )
    keys = ["type", "external_id", "period_num", "press_num"]
    res = merge_upsert(cur, batch, keys)
    actions = {r["external_id"]: r["action"] for r in res.actions.collect()}
    assert actions == {1: "update", 2: "unchanged", 3: "insert"}
    merged = sorted((r["external_id"], r["result"]) for r in res.merged.collect())
    assert merged == [(1, "neprešiel"), (2, "prešiel"), (3, "prešiel")]  # no dup of key 1
    # idempotence: re-applying the same batch is all-unchanged (the bug's
    # symptom was insert-every-batch for NULL-key rows)
    again = merge_upsert(res.merged, batch, keys)
    assert {r["action"] for r in again.actions.collect()} == {"unchanged"}
