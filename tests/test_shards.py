"""Training-shard writer (operators/shards.py): deterministic membership,
balance, bounded files, stable intra-shard order."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from nrsr_crawler_spark.operators import shards as SH
from nrsr_crawler_spark.sources.tpch import load

SF = "/root/testdata/sf0.001"


def test_assignment_deterministic_and_balanced(spark):
    docs = load(spark, SF, "documents")
    a = {r.doc_id: r.shard_id for r in SH.assign_shards(docs, "doc_id").collect()}
    b = {r.doc_id: r.shard_id for r in SH.assign_shards(docs, "doc_id").collect()}
    assert a == b and len(a) > 0
    assert set(a.values()) <= set(range(SH.DEFAULT_SHARDS))
    counts = SH.shard_stats(docs, "doc_id", F.length("text").cast("long")).collect()
    n = sum(r.n_rows for r in counts)
    mean = n / SH.DEFAULT_SHARDS
    assert max(r.n_rows for r in counts) <= 2.0 * mean  # md5 multinomial balance
    assert min(r.n_rows for r in counts) >= 0.3 * mean


def test_write_shards_bounded_files_and_order(spark, tmp_path):
    docs = load(spark, SF, "documents")
    out = str(tmp_path / "shards")
    SH.write_shards(docs, out, "doc_id", n_shards=4, max_records_per_file=10)

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # membership survives the round-trip
    expected = {r.doc_id: r.shard_id for r in SH.assign_shards(docs, "doc_id", 4).collect()}
    got = {r.doc_id: r.shard_id for r in back.collect()}
    assert got == expected

    for sid in range(4):
        files = glob.glob(f"{out}/shard_id={sid}/*.parquet")
        n_rows = sum(1 for k, v in expected.items() if v == sid)
        assert files, f"shard {sid} missing"
        # maxRecordsPerFile honoured
        import pyarrow.parquet as pq

        for f in files:
            assert pq.read_metadata(f).num_rows <= 10
        # intra-shard order is the sort key
        rows = [r.doc_id for r in spark.read.parquet(f"{out}/shard_id={sid}").collect()]
        assert len(rows) == n_rows
