"""Optimization probe: time individual registry queries in a
bench-identical session (same conf as bench.py) and/or dump their
``explain("formatted")`` plans to plans/<round>/<query>_<tag>.txt (SPARK_GRAFT_PLANS_ROUND, default r14).

Usage:
  python tools/opt_probe.py --reps 5 q1_pricing_summary d16_prefix_filter_jaccard
  python tools/opt_probe.py --plan before d16_prefix_filter_jaccard
  python tools/opt_probe.py --reps 5 --plan after d16_prefix_filter_jaccard

With --reps N each query runs N noop-forced executions and prints every
rep plus the min (the bench statistic). With --plan TAG the formatted
plan is written to plans/<round>/<name>_<TAG>.txt. Alternating A/B across
two working trees is done by running this twice from different checkouts;
within-session rep lists make warm-up slope visible either way.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from end_to_end_ml_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=0)
    ap.add_argument("--plan", default=None, metavar="TAG")
    ap.add_argument("--json", action="store_true", help="print one JSON line")
    args = ap.parse_args()

    spark = get_spark(
        "opt-probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={
            # bench.py's small-SF conf, verbatim — probe numbers must be
            # comparable to bench rows
            "spark.sql.files.maxPartitionBytes": "256k",
            "spark.sql.files.openCostInBytes": "64k",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256k",
            "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=512m",
            "spark.cleaner.periodicGC.interval": "2min",
        },
    )
    from end_to_end_ml_spark.plans.entry_queries import REGISTRY

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"),
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    results: dict[str, dict] = {}
    for name in args.queries:
        fn = REGISTRY[name][0]
        if args.plan:
            os.makedirs(plans_dir, exist_ok=True)
            df = fn(spark, SF_DIR)
            path = os.path.join(plans_dir, f"{name}_{args.plan}.txt")
            with open(path, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                    df._jdf.queryExecution(), "formatted"
                ))
            print(f"[plan] wrote {path}", file=sys.stderr)
        if args.reps > 0:
            spark.sparkContext.setJobDescription(f"probe:{name}")
            reps = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                reps.append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)
            spark._jvm.System.gc()
            results[name] = {"reps": reps, "min": min(reps)}
            if not args.json:
                print(f"{name}: min={min(reps)} reps={reps}")
    if args.json and results:
        print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "probe": results}))


if __name__ == "__main__":
    main()
