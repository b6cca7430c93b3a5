"""SparkSession factory tuned for both local testing and cluster scale.

Scale notes (100 TB design target):
- AQE enabled: runtime partition coalescing + skew-join splitting means the
  static ``shuffle.partitions`` only needs to be an upper bound.
- ``session.timeZone=UTC`` pinned so timestamp semantics match the DuckDB
  oracle (DuckDB timestamps are UTC-naive).
- Arrow enabled for the few Pandas-UDF operators (similarity / multimodal).
- On a real cluster the same builder is used with ``master`` left to
  spark-submit; nothing here assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "end_to_end_ml_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master=None`` defers to spark-submit / an existing session, so the same
    code runs on a 1000-executor cluster; tests pass ``local[N]`` explicitly.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and not SparkSession.getActiveSession():
        master = f"local[{DEFAULT_CPUS}]"
    if master:
        builder = builder.master(master)
    conf = {
        "spark.sql.shuffle.partitions": str(shuffle_partitions or DEFAULT_CPUS),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        # Pinned (not just Spark 4's default): several integer operators
        # (e.g. the DSIR score sum) rely on ANSI's loud ARITHMETIC_OVERFLOW
        # instead of a silent wrap for their correctness contract — a
        # deployment that disabled ANSI would trade those raises for
        # wrapped values, diverging from the DuckDB oracle's exact/erroring
        # arithmetic.
        "spark.sql.ansi.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.parquet.filterPushdown": "true",
        # FAIR scheduling so concurrent tuner trials (train/tuner.py sets
        # spark.scheduler.pool per trial thread) share executors instead of
        # FIFO-starving each other; no effect on single-job workloads.
        "spark.scheduler.mode": "FAIR",
        "spark.ui.enabled": "false",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "90g"),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
