"""Epoch-versioned parquet table layer (SURVEY §7 step 2).

Stands in for Iceberg in this sandbox (no Iceberg runtime jars available):
append-only per-epoch delta directories plus an atomic driver-side commit
manifest per epoch.  The layout maps 1:1 onto Iceberg at deploy time
(delta dir ≙ snapshot append; manifest ≙ snapshot commit; ``epoch`` is a
partition column) — swap ``EpochLake`` for catalog tables + ``MERGE INTO``
and nothing above this module changes.

Resume semantics (north_rule): a killed run leaves at most one uncommitted
epoch directory, which readers ignore (they read only manifest-committed
epochs); re-running the epoch rewrites the same deterministic content →
byte-identical final tables.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class EpochLake:
    def __init__(self, root: str):
        self.root = Path(root)
        (self.root / "_manifests").mkdir(parents=True, exist_ok=True)

    # -- commit protocol ----------------------------------------------------
    def last_committed(self) -> int:
        epochs = [
            int(p.stem) for p in (self.root / "_manifests").glob("*.json") if p.stem.isdigit()
        ]
        return max(epochs, default=-1)

    def manifest(self, epoch: int) -> dict | None:
        p = self.root / "_manifests" / f"{epoch}.json"
        if not p.exists():
            return None
        return json.loads(p.read_text())

    def commit(self, epoch: int, metrics: dict) -> None:
        p = self.root / "_manifests" / f"{epoch}.json"
        tmp = p.with_suffix(".tmp")
        tmp.write_text(json.dumps({"epoch": epoch, **metrics}, sort_keys=True))
        os.replace(tmp, p)  # atomic

    def metrics(self) -> list[dict]:
        out = []
        for e in range(self.last_committed() + 1):
            m = self.manifest(e)
            if m:
                out.append(m)
        return out

    # -- delta IO -------------------------------------------------------------
    def delta_path(self, table: str, epoch: int) -> str:
        return str(self.root / table / f"epoch={epoch}")

    def write_delta(self, table: str, df: DataFrame, epoch: int) -> None:
        path = Path(self.delta_path(table, epoch))
        if path.exists():  # re-run of an uncommitted epoch: rewrite
            shutil.rmtree(path)
        df.write.mode("overwrite").parquet(str(path))

    def read_all(
        self,
        spark: SparkSession,
        table: str,
        upto: int | None = None,
        schema: str | None = None,
        since: int = -1,
    ) -> DataFrame:
        """Union of all committed deltas in (since, upto].  Uncommitted dirs
        ignored.  This is the FULL-HISTORY read — O(epoch count); hot-path
        callers use :meth:`read_merged` (base + tail)."""
        last = self.last_committed() if upto is None else min(upto, self.last_committed())
        dirs = [
            self.delta_path(table, e)
            for e in range(since + 1, last + 1)
            if Path(self.delta_path(table, e)).exists()
        ]
        if not dirs:
            if schema is None:
                raise ValueError(f"no committed deltas for {table} and no schema given")
            return spark.createDataFrame([], schema)
        return (
            spark.read.option("basePath", str(self.root / table)).parquet(*dirs)
        )

    # -- compaction (Iceberg rewrite_data_files stand-in) ----------------------
    #
    # A BASE is a derived acceleration snapshot: the merge-on-read projection
    # of all deltas ≤ some epoch, written under ``table/_base/upto=N`` with an
    # explicit ``epoch`` data column (the winning row's epoch) and committed
    # by a marker file.  Deltas stay the authoritative history (replay /
    # fetch_order certification still read them); ``read_merged`` reads base +
    # the O(tail) deltas after it, so hot-path reads stop growing with epoch
    # count.  Crash-safe: a base without its marker is ignored; the marker is
    # written only after the parquet write completes.

    _BASE_MARKER = "_BASE_COMMITTED"

    def base_upto(self, table: str) -> int:
        """Epoch of the newest committed base for ``table`` (-1 = none)."""
        base = self.root / table / "_base"
        if not base.exists():
            return -1
        uptos = [
            int(p.name.split("=", 1)[1])
            for p in base.glob("upto=*")
            if (p / self._BASE_MARKER).exists()
        ]
        return max(uptos, default=-1)

    def write_base(self, table: str, df: DataFrame, upto: int) -> None:
        """Write a compacted base as of epoch ``upto`` (``df`` must carry the
        ``epoch`` column) and garbage-collect older bases, RETAINING the
        immediately-previous one — Iceberg's expire_snapshots retention in
        miniature: an in-flight current-view reader planned against the
        previous base survives one compaction cycle (snapshot reads never
        touch bases at all, see read_merged)."""
        from pyspark.sql import functions as F

        path = self.root / table / "_base" / f"upto={upto}"
        if path.exists():
            shutil.rmtree(path)
        # epoch as int matches the partition-discovery type of delta reads
        df.withColumn("epoch", F.col("epoch").cast("int")).write.mode(
            "overwrite"
        ).parquet(str(path))
        (path / self._BASE_MARKER).touch()  # commit point
        uptos = sorted(
            (int(p.name.split("=", 1)[1]) for p in (self.root / table / "_base").glob("upto=*")),
            reverse=True,
        )
        for old in uptos[2:]:
            shutil.rmtree(self.root / table / "_base" / f"upto={old}")

    def read_merged(
        self,
        spark: SparkSession,
        table: str,
        schema: str | None = None,
        upto: int | None = None,
    ) -> DataFrame:
        """Base (if any) + the deltas after it — O(base + tail) files instead
        of O(all epochs).  Logically identical to :meth:`read_all` for
        tables whose base is the per-key latest-row projection (the window
        dedupe downstream picks the same winners either way).

        ``upto`` = snapshot (time-travel) read as of that committed epoch —
        the Iceberg ``VERSION AS OF`` stand-in.  Snapshot reads NEVER touch
        a base: bases are derived acceleration artifacts that compaction
        garbage-collects, so a lazily-planned snapshot must not reference
        one — a base newer than ``upto`` folds in rows past the snapshot,
        and an older one can vanish mid-read when the next compaction
        supersedes it (VERDICT r3 item 8).  Deltas are never deleted, so
        delta-history snapshots are immune to compaction churn by
        construction: time travel costs O(epochs ≤ upto), the current view
        stays O(base + tail)."""
        last = self.last_committed() if upto is None else min(upto, self.last_committed())
        if upto is not None:
            return self.read_all(spark, table, upto=last, schema=schema)
        base_e = self.base_upto(table)
        if base_e < 0 or base_e > last:
            return self.read_all(spark, table, upto=last, schema=schema)
        base = spark.read.parquet(str(self.root / table / "_base" / f"upto={base_e}"))
        tail_dirs = [
            self.delta_path(table, e)
            for e in range(base_e + 1, last + 1)
            if Path(self.delta_path(table, e)).exists()
        ]
        if not tail_dirs:
            return base
        tail = spark.read.option("basePath", str(self.root / table)).parquet(*tail_dirs)
        return base.unionByName(tail.withColumn("epoch", tail["epoch"].cast("int")))
