from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nrsr_crawler_spark.functions import cleaners as C


def _one(spark, col, value):
    return spark.createDataFrame([(value,)], ["v"]).select(col(F.col("v")).alias("o")).collect()[0]["o"]


def test_filter_whitespaces(spark):
    assert _one(spark, C.filter_whitespaces, "  Ján\xa0 Novák \xa0 ") == "Ján Novák"


def test_filter_mailto(spark):
    assert _one(spark, C.filter_mailto, "mailto:jan.novak@nrsr.sk") == "jan.novak@nrsr.sk"


def test_filter_vote(spark):
    assert _one(spark, C.filter_vote, " [Z] ") == "Z"


def test_vote_bracket(spark):
    assert _one(spark, C.vote_bracket, "[Z] Proti") == "Z"
    assert _one(spark, C.vote_bracket, "[N] Nehlasoval") == "N"


def test_page_token(spark):
    assert _one(spark, C.page_token, "javascript:__doPostBack('ctl00$Grid','Page$3')") == "3"


def test_first_int(spark):
    assert _one(spark, C.first_int, "Hlasovanie č. 123 o bode") == 123
    assert _one(spark, C.first_int, "no digits") is None


def test_parse_date_noon(spark):
    # both formats: '%d. %m. %Y' and fallback '%d.%m.%Y' (bills.py:114-121)
    assert _one(spark, C.parse_date_noon, "3. 12. 2019") == dt.datetime(2019, 12, 3, 12, 0, 0)
    assert _one(spark, C.parse_date_noon, "3.12.2019") == dt.datetime(2019, 12, 3, 12, 0, 0)
    assert _one(spark, C.parse_date_noon, "garbage") is None


def test_parse_datetime(spark):
    assert _one(spark, C.parse_datetime, "12. 3. 2019 10:05:33") == dt.datetime(2019, 3, 12, 10, 5, 33)
    assert _one(spark, C.parse_datetime, "12. 3. 2019 10:05") == dt.datetime(2019, 3, 12, 10, 5, 0)


def test_time_range(spark):
    row = _one(spark, C.time_range, "12. 3. 2019 10:05:33 - 10:07:01")
    assert row["start"] == dt.datetime(2019, 3, 12, 10, 5, 33)
    assert row["end"] == dt.datetime(2019, 3, 12, 10, 7, 1)


def test_try_int(spark):
    assert _one(spark, C.try_int, " 42 ") == 42
    assert _one(spark, C.try_int, "x42") is None


def test_clean_text(spark):
    assert _one(spark, C.clean_text, " text\xfd with&nbsp;junk ") == "text withjunk"


def test_take_first(spark):
    df = spark.createDataFrame([([None, "a", "b"],)], "arr array<string>")
    assert df.select(C.take_first(F.col("arr")).alias("o")).collect()[0]["o"] == "a"
