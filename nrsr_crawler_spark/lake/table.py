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
    ) -> DataFrame:
        """Union of all committed deltas (≤ upto).  Uncommitted dirs ignored."""
        last = self.last_committed() if upto is None else min(upto, self.last_committed())
        dirs = [
            self.delta_path(table, e)
            for e in range(last + 1)
            if Path(self.delta_path(table, e)).exists()
        ]
        if not dirs:
            if schema is None:
                raise ValueError(f"no committed deltas for {table} and no schema given")
            return spark.createDataFrame([], schema)
        return (
            spark.read.option("basePath", str(self.root / table)).parquet(*dirs)
        )
