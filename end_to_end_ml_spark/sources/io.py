"""Sources & sinks (reference S1/S2/S5/S6: parquet scan+sink, JSON ingest,
CSV sink — src/feature/generate_initial_data.py:57,126-129;
src/inference/api_server.py:150-158).

Spark-first: ``spark.read.parquet`` gives columnar scan with predicate
pushdown + column pruning from Catalyst; nothing manual to do. Writers default
to overwrite-mode parquet, matching the reference's ``to_parquet`` semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table (parquet). Catalyst pushes filters/projections into
    the scan, so callers should chain ``.select``/``.filter`` lazily.

    TIMESTAMP(NANOS) parquet columns (the ``events.ts`` column) aren't a
    Spark SQL type: read them as raw nanosecond longs and convert to
    microsecond timestamps (exact for this data; same truncation DuckDB
    applies when casting ns → its µs-native TIMESTAMP)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Parquet sink (reference S2). ``partition_by`` enables partition pruning
    for downstream time/key-filtered scans at scale."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def ingest_json_records(spark: SparkSession, records, schema) -> DataFrame:
    """JSON record ingest for serving (reference S5,
    src/inference/api_server.py:150-158): dict or list[dict] → DataFrame with
    an explicit schema (never inferred — serving schemas are contracts)."""
    if isinstance(records, dict):
        records = [records]
    return spark.createDataFrame(records, schema=schema)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """CSV sink (reference S6: Optuna trials log, study_logger.py:43-50).
    Tiny driver-adjacent tables (trial logs, metric frames) — still written
    through the distributed writer so the same call works at any size."""
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed-table sink: hashes rows into ``num_buckets`` files
    per partition on the bucket key at write time, so downstream equi-joins
    and aggregations on that key are co-located and run WITHOUT a shuffle
    (both sides bucketed by the same key/count → zero Exchange in the plan).
    The 100 TB lever for fact⋈fact joins repeated across many queries —
    pay the shuffle once at ingest, never again."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)
