"""SparkSession factory with the engine's tuned defaults.

The engine targets multi-executor clusters (``spark-submit --py-files``) but
is developed and tested on ``local[N]``.  Every knob set here is equally valid
on a real cluster; nothing is local-mode-specific.

Scale rationale (100 TB / 10^10-URL frontier):
 - AQE on: runtime coalescing of shuffle partitions + skew-join splitting is
   the backstop for the single-host skew the reference exhibits
   (everything under www.nrsr.sk; see /root/reference/nrsr/settings.py:30-33).
 - Arrow on: every custom kernel (URL canon, bloom probe, image decode) is a
   pandas/Arrow UDF -- per-row Python is banned on hot paths (BASELINE.json
   input_hint).
 - shuffle.partitions defaults to a small number for local test SFs; the
   epoch loop overrides per-stage via repartition() keyed on host_shard.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    app_name: str = "nrsr-crawler-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default ``*``);
    on a real cluster the caller simply omits it and lets spark-submit decide.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        # Local-SF realism knob: at 100 TB a scan yields tens of thousands of
        # 128 MB splits and saturates every executor; the driver's sf0.1
        # files are ~10 MB, which the 128 MB default turns into 1-3 tasks on
        # 32 cores — measuring single-core constant factors, not the plan.
        # Small splits restore the cluster-like scan shape; override with
        # SPARK_GRAFT_MAX_PARTITION_BYTES=128m for real-cluster submits.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "1m"),
        )
        .config("spark.sql.files.openCostInBytes", "262144")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
