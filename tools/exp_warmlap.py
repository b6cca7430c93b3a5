"""One-off experiment (round 8): does a second untimed HEADLINE warm lap
move the slot-1 min-of-5 closer to the warm fold, or is the residual gap
run-to-run environment noise? Runs ONLY the headline segment in a fresh
bench-identical session, with a configurable number of warm laps, and
prints slot1/warm sums. Compare across alternating invocations.

Usage: python tools/exp_warmlap.py <n_laps>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from end_to_end_ml_spark.session import get_spark  # noqa: E402


def main() -> None:
    laps = int(sys.argv[1])
    spark = get_spark(
        "exp-warmlap",
        master=f"local[{bench.CPUS}]",
        shuffle_partitions=bench.CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "256k",
            "spark.sql.files.openCostInBytes": "64k",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256k",
            "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=512m",
            "spark.cleaner.periodicGC.interval": "2min",
        },
    )
    from end_to_end_ml_spark.plans.entry_queries import REGISTRY
    from end_to_end_ml_spark.sources import load_table

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in ("lineitem", "orders", "customer", "events"):
        load_table(spark, bench.SF_DIR, t).count()
    for _ in range(laps):
        for name in bench.HEADLINE:
            bench.force(REGISTRY[name][0](spark, bench.SF_DIR))
            spark.catalog.clearCache()
    slot1 = {}
    best = {}
    for name in bench.HEADLINE:
        fn = REGISTRY[name][0]
        b = float("inf")
        for rep in range(5):
            t0 = time.perf_counter()
            bench.force(fn(spark, bench.SF_DIR))
            dt = time.perf_counter() - t0
            b = min(b, dt)
        slot1[name] = b
        spark.catalog.clearCache()
        spark._jvm.System.gc()
    # warm fold: 2 more reps each in the fully-warmed session
    for name in bench.HEADLINE:
        fn = bench.REGISTRY_FN = REGISTRY[name][0]
        b = slot1[name]
        for _ in range(2):
            t0 = time.perf_counter()
            bench.force(fn(spark, bench.SF_DIR))
            b = min(b, time.perf_counter() - t0)
        best[name] = b
        spark.catalog.clearCache()
    print(
        f"laps={laps} slot1_sum={sum(slot1.values()):.3f} "
        f"warm_sum={sum(best.values()):.3f}"
    )


if __name__ == "__main__":
    main()
