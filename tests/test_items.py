"""Schema parity with the reference's item declarations (SURVEY §1.1-1.4).

Reflects over /root/reference/nrsr/items.py (read-only) to extract each
scrapy.Item class's declared fields and output processors, then asserts the
engine's ITEM_SPECS match field-for-field — names, order, and fold
semantics.  Also unit-tests the Spark re-expression of the item-loader
folds.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from nrsr_crawler_spark import items as I

REF = "/root/reference/nrsr/items.py"


def _reference_classes() -> dict[str, list[tuple[str, str]]]:
    """class name → [(field, fold)] parsed from the reference source."""
    src = open(REF, encoding="utf-8").read()
    classes: dict[str, list[tuple[str, str]]] = {}
    current = None
    buf = ""
    for line in src.splitlines():
        m = re.match(r"class (\w+)\(scrapy\.Item\):", line)
        if m:
            current = m.group(1)
            classes[current] = []
            buf = ""
            continue
        if current is None:
            continue
        buf += line + "\n"
        # fields may span lines until the closing paren balances
        while True:
            fm = re.search(r"(\w+) = scrapy\.Field\(", buf)
            if not fm:
                if "= scrapy.Field()" in buf:
                    for sm in re.finditer(r"(\w+) = scrapy\.Field\(\)", buf):
                        classes[current].append((sm.group(1), "keep_list"))
                    buf = re.sub(r"\w+ = scrapy\.Field\(\)", "", buf)
                break
            start = fm.end() - 1
            depth = 0
            end = None
            for i, ch in enumerate(buf[start:], start):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        end = i
                        break
            if end is None:
                break  # incomplete; wait for more lines
            body = buf[start : end + 1]
            if "output_processor=TakeFirst" in body:
                fold = "take_first"
            elif "output_processor=Join" in body:
                fold = "join"
            else:
                fold = "keep_list"
            classes[current].append((fm.group(1), fold))
            buf = buf[:fm.start()] + buf[end + 1 :]
    return {k: v for k, v in classes.items() if v}


def test_every_reference_item_class_is_mapped():
    ref = _reference_classes()
    mapped = set(I.CLASS_TO_TYPE) | set(I.CHILD_STRUCTS)
    assert set(ref) == mapped, set(ref) ^ mapped


def test_field_names_and_order_match_reference():
    ref = _reference_classes()
    for cls, item_type in I.CLASS_TO_TYPE.items():
        ref_fields = [f for f, _ in ref[cls]]
        spec_fields = [n for n, _, _ in I.ITEM_SPECS[item_type]]
        assert spec_fields == ref_fields, (cls, spec_fields, ref_fields)


def test_fold_semantics_match_reference():
    ref = _reference_classes()
    for cls, item_type in I.CLASS_TO_TYPE.items():
        for field, ref_fold in ref[cls]:
            assert I.fold_for(item_type, field) == ref_fold, (cls, field)


def test_child_struct_fields_match_reference():
    ref = _reference_classes()
    for cls, st in I.CHILD_STRUCTS.items():
        assert [f.name for f in st.fields] == [f for f, _ in ref[cls]], cls


def test_schema_for_builds_structtype():
    st = I.schema_for("voting")
    assert st["votes"].dataType.elementType == I.VOTING_VOTE
    assert st["external_id"].dataType.typeName() == "long"


def test_apply_fold_semantics(spark):
    df = spark.createDataFrame(
        [([None, "a", "b"],)], "xs array<string>"
    ).select(
        I.apply_fold(F.col("xs"), I.TF).alias("tf"),
        I.apply_fold(F.col("xs"), I.JOIN).alias("joined"),
        I.apply_fold(F.col("xs"), I.KEEP).alias("kept"),
    )
    r = df.collect()[0]
    assert r.tf == "a"                      # first non-null (TakeFirst)
    assert r.joined == "a b"                # Join() drops nulls like ' '.join of extracted
    assert r.kept == [None, "a", "b"]


def test_mapcompose_then_fold(spark):
    # MapCompose(filter_vote) + Join — VotingVoteItem.vote (items.py:234-237)
    from nrsr_crawler_spark.functions import cleaners as C

    df = spark.createDataFrame([(["[Za] x", "[Proti] y"],)], "xs array<string>")
    got = df.select(
        I.apply_fold(
            F.transform(F.col("xs"), lambda x: C.vote_bracket(x)), I.JOIN
        ).alias("v")
    ).collect()[0].v
    assert got == "Za Proti"


# -- positional-td changes-table kernel (bills.py:198-211) --------------------

def test_parse_changes_table_positional_tds():
    from nrsr_crawler_spark.operators.parse_typed import _parse_changes_table

    html = (
        '<div id="billstep" data-period="1"></div>'
        '<table id="changes">'
        "<tr><td> 5. 3. 2004 - doplnenie </td><td>A7</td>"
        '<td><a href="/web/Default.aspx?sid=zakony/zmena&ID=11"></a></td>'
        "<td><a>Príloha 1</a></td>"
        '<td><a href="/web/dok/11"></a></td></tr>'
        "<tr><td>29. 12. 2019, späť</td><td>A8</td>"
        '<td><a href="/d2"></a></td><td><a>P2</a></td><td><a href="/u2"></a></td></tr>'
        "</table>"
    )
    rows = _parse_changes_table(html)
    assert [r["author"] for r in rows] == ["A7", "A8"]  # document order kept
    assert rows[0]["date_raw"] == "5. 3. 2004 - doplnenie"
    assert rows[0]["detail"] == "/web/Default.aspx?sid=zakony/zmena&ID=11"
    assert rows[0]["attachment_title"] == "Príloha 1"
    assert rows[0]["attachment_url"] == "/web/dok/11"
    assert rows[1]["date_raw"] == "29. 12. 2019, späť"


def test_parse_changes_table_absent_or_short_rows():
    from nrsr_crawler_spark.operators.parse_typed import _parse_changes_table

    assert _parse_changes_table("<p>no table</p>") == []
    # rows with <5 tds are skipped (malformed markup), matching the
    # reference's implicit requirement of td[1]..td[5]
    html = '<table id="changes"><tr><td>1. 2. 2003</td><td>A</td></tr></table>'
    assert _parse_changes_table(html) == []
