"""A/B the round-13 spearman_components checkpointing (q:a18) — REJECTED
on measurement, both variants (see OPTIMIZATION_r13.md): at sf0.1 the
redundant subtree copies execute CONCURRENTLY on idle cores inside one
job, while each lazy localCheckpoint inserts a materialization barrier
that serializes them (both-ckpts: old 4.02 vs new 4.81 min-of-8; counts-
only: 4.36 vs 4.75). The 9-scan plan stands as the measured local
optimum; at cluster scale, where 9 full scans dominate barriers, the
checkpointed form in this script's history is the shape to flip to.
Alternating old-vs-new within one warm session:

  OLD  every consumer of the filtered pair frame and of each column's
       distinct-counts table re-derives it from the parquet scan
       (9 Scan parquet in the a18 plan)
  NEW  lazy localCheckpoint on both: the pair frame (consumed by rx, ry
       and the ranked join) and each counts table (consumed by bounds,
       totals/offsets and the main join)

Collect-compares NEW against OLD first (bitwise row equality), then
alternates noop-forced executions.

Usage: python tools/exp_a18_ckpt_ab.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from end_to_end_ml_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _old_doubled_tie_ranks(df, col, out, n_buckets=32):
    from end_to_end_ml_spark.functions.metrics import _INTEGRAL_DTYPES

    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("__cnt"))
    dtype = dict(df.dtypes)[col]
    assert dtype in _INTEGRAL_DTYPES
    bounds = counts.agg(F.min(col).alias("__lo"), F.max(col).alias("__hi"))
    bkt = F.expr(
        f"(CAST({col} AS BIGINT) - CAST(__lo AS BIGINT)) div "
        f"greatest(1L, (CAST(__hi AS BIGINT) - CAST(__lo AS BIGINT)"
        f" + {n_buckets}) div {n_buckets})"
    )
    counts = (
        counts.crossJoin(F.broadcast(bounds))
        .withColumn("__bkt", bkt)
        .drop("__lo", "__hi")
    )
    totals = counts.groupBy("__bkt").agg(F.sum("__cnt").alias("__bn"))
    off_w = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__bkt", F.coalesce(F.sum("__bn").over(off_w), F.lit(0)).alias("__boff")
    )
    in_w = (
        Window.partitionBy("__bkt")
        .orderBy(col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return counts.join(F.broadcast(offsets), "__bkt").select(
        col,
        (
            2 * (F.col("__boff") + F.coalesce(F.sum("__cnt").over(in_w), F.lit(0)))
            + F.col("__cnt")
            + 1
        ).alias(out),
    )


def old_a18(spark, sf_dir):
    from end_to_end_ml_spark.operators.similarity import quantize_milli
    from end_to_end_ml_spark.sources.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    m = li.select(
        quantize_milli(F.col("l_quantity")).alias("x"),
        quantize_milli(F.col("l_extendedprice")).alias("y"),
    )
    df = m.filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    rx = _old_doubled_tie_ranks(df, "x", "__r2x")
    ry = _old_doubled_tie_ranks(df, "y", "__r2y")
    ranked = df.select("x", "y").join(rx, "x").join(ry, "y")
    dec = "decimal(38,0)"
    r2x = F.col("__r2x").cast(dec)
    r2y = F.col("__r2y").cast(dec)
    return ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(r2x).cast("long").alias("sum_rx"),
        F.sum(r2y).cast("long").alias("sum_ry"),
        F.sum(r2x * r2y).cast("double").alias("sum_rxry"),
        F.sum(r2x * r2x).cast("double").alias("sum_rxrx"),
        F.sum(r2y * r2y).cast("double").alias("sum_ryry"),
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(
        "a18-ckpt-ab",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "256k",
            "spark.sql.files.openCostInBytes": "64k",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256k",
            "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=512m",
            "spark.cleaner.periodicGC.interval": "2min",
        },
    )
    from end_to_end_ml_spark.plans.entry_queries import REGISTRY

    new_fn = REGISTRY["a18_spearman_components"][0]

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        return dt

    base = sorted(tuple(r) for r in old_a18(spark, SF_DIR).collect())
    got = sorted(tuple(r) for r in new_fn(spark, SF_DIR).collect())
    assert got == base, "NEW rows differ from OLD"
    print(f"[check] a18: identical ({got})", file=sys.stderr)

    run(old_a18)
    run(new_fn)
    olds, news = [], []
    for _ in range(rounds):
        olds.append(run(old_a18))
        news.append(run(new_fn))
    print(
        f"a18: old_min={min(olds):.3f}s new_min={min(news):.3f}s "
        f"old={['%.2f' % x for x in olds]} new={['%.2f' % x for x in news]}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
