"""A/B the fused count+boundary-sketch aggregate (ordinal.count_and_boundaries)
against the previous two-job form (count() then percentile job), alternating
within one warm session. The query PLAN is unchanged by this optimization —
the win is one fewer full-input driver job — so the evidence is job count +
alternating wall time, not a plan diff.

Usage: python tools/exp_cnb_ab.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from end_to_end_ml_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(
        "cnb-ab",
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
    from pyspark.sql import functions as F

    from end_to_end_ml_spark.operators import ordinal
    from end_to_end_ml_spark.plans.entry_queries import REGISTRY

    fused = ordinal.count_and_boundaries

    def unfused(df, key_col, n_buckets=32):
        # the pre-optimization cost shape: one count job + one sketch job
        n = df.count()
        probs = [i / n_buckets for i in range(1, n_buckets)]
        boundaries: list[float] = []
        if probs:
            row = df.agg(
                F.percentile_approx(F.col(key_col).cast("double"), probs).alias("b")
            ).collect()[0]
            boundaries = ordinal.dedup_boundaries(row["b"])
        return int(n), boundaries

    names = ["emb4_negative_pairs", "emb5_cosine_histogram"]
    sc = spark.sparkContext

    def run(name: str) -> tuple[float, int]:
        fn = REGISTRY[name][0]
        j0 = len(sc.statusTracker().getJobIdsForGroup(None))
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        return dt, -1

    # warm-up once per variant
    for variant in (unfused, fused):
        ordinal.count_and_boundaries = variant
        for n in names:
            run(n)

    results: dict[str, dict[str, list[float]]] = {
        n: {"before": [], "after": []} for n in names
    }
    for _ in range(rounds):
        for tag, variant in (("before", unfused), ("after", fused)):
            ordinal.count_and_boundaries = variant
            for n in names:
                dt, _ = run(n)
                results[n][tag].append(dt)

    for n in names:
        b = min(results[n]["before"])
        a = min(results[n]["after"])
        print(
            f"{n}: before min {b:.3f}s {['%.2f' % x for x in results[n]['before']]} "
            f"| after min {a:.3f}s {['%.2f' % x for x in results[n]['after']]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
