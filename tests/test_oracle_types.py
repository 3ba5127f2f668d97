"""Registry-wide oracle type-hygiene gate (round-5 verdict asks #1/#2).

The r3/r4 driver-red class: DuckDB types an uncast integer ``SUM()`` as
``DECIMAL(38,0)``/``HUGEINT``, fetched as ``decimal.Decimal``, while Spark
emits ``bigint``.  The driver's type-sensitive value hash mismatches; the
old local mirror's ``Decimal(5) == 5`` compare was blind to it.  These
tests (a) sweep every registered oracle's DESCRIBE types and ban the
Decimal family outright, and (b) prove the strict mirror actually rejects
cross-type equality — "test the tester".
"""

from __future__ import annotations

import decimal
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.oracle_check import norm_cell, sweep_oracle_types  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    from nrsr_crawler_spark.sources.tpch import TABLES

    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return c


def test_no_oracle_emits_decimal_or_hugeint(con):
    """Every oracle in the registry binds to driver-hash-safe types."""
    import __spark_entry__ as entry

    violations = sweep_oracle_types(con, entry.oracle_sql())
    assert violations == [], "\n".join(violations)


def test_sweep_flags_uncast_sum(con):
    """The sweep itself must catch the exact defect class it exists for."""
    bait = {"bait": "SELECT SUM(x) AS s FROM (SELECT CAST(1 AS BIGINT) AS x)"}
    bad = sweep_oracle_types(con, bait)
    assert len(bad) == 1 and "bait" in bad[0], bad


def test_norm_cell_rejects_cross_type_equality():
    assert norm_cell(decimal.Decimal(5)) != norm_cell(5)
    assert norm_cell(5) == norm_cell(5)
    assert norm_cell(True) != norm_cell(1)  # bool is not int


def test_norm_cell_decimal_scale_free():
    assert norm_cell(decimal.Decimal("1.10")) == norm_cell(decimal.Decimal("1.1"))
    assert norm_cell(decimal.Decimal("100")) == norm_cell(decimal.Decimal("100.000"))
    assert norm_cell(decimal.Decimal("1.10")) != norm_cell(1.1)  # Decimal vs float
