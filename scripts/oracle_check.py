"""Local mirror of the driver's correctness gate.

Runs every ``queries()[name]`` on Spark and the matching ``oracle_sql()``
on DuckDB over the same parquet dir, compares row count + column names +
order-insensitive values.  Usage:

    python scripts/oracle_check.py [sf_dir] [name ...]
    python scripts/oracle_check.py --json OUT.json [sf_dir] [name ...]

``--json`` additionally writes a per-query artifact
``{name: {rows, green, pair_sha}}`` where ``pair_sha`` is the sha256 of the
query callable's source concatenated with its oracle SQL — a fingerprint of
the frozen query+oracle pair, so a later reviewer can verify which exact
pair the full-registry run certified without re-running it.
"""

from __future__ import annotations

import decimal
import hashlib
import inspect
import json
import math
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from nrsr_crawler_spark.session import get_spark
from nrsr_crawler_spark.sources.tpch import TABLES


def norm_cell(v):
    """Type-exact cell normalization.

    Every scalar is tagged with its Python type name so cross-type equality
    (the round-3/4 blind spot: ``Decimal(5) == 5`` is True under ``==``) can
    never report a match the driver's type-sensitive value hash would
    reject.  A DuckDB ``DECIMAL(38,0)`` therefore mismatches Spark's
    ``bigint`` loudly instead of silently passing.
    """
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        return ("float", repr(round(v, 9)))
    if isinstance(v, decimal.Decimal):
        # Canonical scale-free repr so Decimal('1.10') == Decimal('1.1')
        # across engines, while the "Decimal" tag still refuses to match a
        # plain int on the other side.
        s = format(v, "f")
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        return ("Decimal", s)
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if hasattr(v, "isoformat"):
        return (type(v).__name__, v.isoformat())
    return (type(v).__name__, str(v))


# DuckDB types whose Python fetch representation differs from what Spark
# emits for the same logical value (Decimal vs int, int vs HUGEINT).  An
# oracle emitting one of these is a latent driver-red even when the local
# values "match" — ban them outright.
BANNED_TYPE_PREFIXES = ("DECIMAL", "HUGEINT", "UHUGEINT")


def sweep_oracle_types(con, oracles: dict) -> list[str]:
    """Registry-wide assertion that no oracle emits a banned DuckDB type.

    ``DESCRIBE SELECT ...`` binds without executing, so this is cheap to run
    over the whole registry.  Returns a list of human-readable violations.
    """
    bad: list[str] = []
    for name, sql in sorted(oracles.items()):
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # noqa: BLE001
            bad.append(f"{name}: DESCRIBE failed: {e}")
            continue
        for col, ctype, *_ in rows:
            if any(str(ctype).upper().startswith(p) for p in BANNED_TYPE_PREFIXES):
                bad.append(f"{name}: column {col} has banned oracle type {ctype}")
    return bad


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def pair_sha(fn, sql: str | None) -> str:
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        src = repr(fn)
    return hashlib.sha256((src + "\n--\n" + (sql or "")).encode()).hexdigest()[:16]


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    report: dict[str, dict] = {}

    # Registry-wide type sweep first: any oracle emitting DECIMAL/HUGEINT is
    # a latent driver-red regardless of whether local values compare equal.
    type_violations = sweep_oracle_types(
        con, {k: v for k, v in oracles.items() if not only or k in only}
    )
    for viol in type_violations:
        print(f"FAIL type-sweep: {viol}")
        failures += 1

    def record(name, rows, green, fn, mode="oracle"):
        report[name] = {
            "rows": rows,
            "green": green,
            "mode": mode,
            "pair_sha": pair_sha(fn, oracles.get(name)),
        }

    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            record(name, -1, False, fn)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, no oracle)")
            record(name, len(srows), True, fn, mode="rows-only")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            record(name, len(srows), False, fn)
            continue
        sc, sr = canon_rows(scols, srows)
        dc, dr = canon_rows(dcols, drows)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duckdb={dc}")
            failures += 1
            record(name, len(sr), False, fn)
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duckdb={len(dr)}")
            failures += 1
            record(name, len(sr), False, fn)
            continue
        if sr != dr:
            bad = next(i for i, (a, b) in enumerate(zip(sr, dr)) if a != b)
            print(f"FAIL {name}: values differ at sorted-row {bad}:\n  spark : {sr[bad]}\n  duckdb: {dr[bad]}")
            failures += 1
            record(name, len(sr), False, fn)
            continue
        print(f"ok   {name}: {len(sr)} rows match")
        record(name, len(sr), True, fn)
    spark.stop()
    if json_out:
        summary = {
            "sf_dir": sf_dir,
            "total": len(report),
            "green": sum(1 for v in report.values() if v["green"]),
            "type_violations": type_violations,
            "compare": "type-exact (r5 strict mirror)",
            "queries": report,
        }
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}: {summary['green']}/{summary['total']} green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
