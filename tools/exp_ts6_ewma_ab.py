"""Round-14 ts6 A/B: closed-form prefix EWMA vs the applyInPandas shard
kernel (r13 verdict item 6).

For alpha = 1/2 the recursion e_t = 0.5*x_t + 0.5*e_{t-1} scaled by 2^t
is a plain prefix sum: s_t = s_{t-1} + 2^{t-1}*x_t (s_0 = x_0), and
e_t = 2^{-t}*s_t. Every scaling is a power-of-two multiply — EXACT in
IEEE — so fl(0.5*x + 0.5*e) = 2^{-t}*fl(2^{t-1}*x + s): the window
cumulative sum reproduces the recursion BITWISE, as long as 2^{t-1}*x_t
and s_t stay inside double range — they overflow near t ~ 1000 for
x ~ O(100), which is the range hazard the verdict flags. This probe
measures (a) bitwise parity on the real data (max key length ~99 at
sf0.1) and (b) wall time vs the pandas shard kernel.

Usage: python tools/exp_ts6_ewma_ab.py [reps_per_arm]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from end_to_end_ml_spark.session import get_spark  # noqa: E402
from end_to_end_ml_spark.sources.io import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def ewma_closed_form(df, key_col, ts_col, value_col, tiebreak_col):
    """alpha=1/2 EWMA as an exp-weighted prefix sum (see module doc)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged = df.select(
        F.col(key_col).cast("long").alias(key_col),
        F.col(ts_col),
        F.col(tiebreak_col).cast("long").alias(tiebreak_col),
        F.col(value_col).cast("double").alias(value_col),
    ).withColumn("__t", F.row_number().over(w) - F.lit(1))
    term = F.when(F.col("__t") == 0, F.col(value_col)).otherwise(
        F.col(value_col) * F.pow(F.lit(2.0), F.col("__t") - 1)
    )
    return staged.withColumn(
        "ewma", F.sum(term).over(wsum) * F.pow(F.lit(2.0), -F.col("__t"))
    ).select(key_col, ts_col, tiebreak_col, value_col, "ewma")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(
        "exp-ts6-r14",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "256k",
            "spark.sql.files.openCostInBytes": "64k",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256k",
            "spark.cleaner.periodicGC.interval": "2min",
        },
    )
    from end_to_end_ml_spark.operators import timeseries as TS

    def arm_pandas():
        ev = load_table(spark, SF_DIR, "events")
        return TS.ewma(ev, "user_id", "ts", "value", "event_id", alpha=0.5).orderBy(
            "user_id", "ts", "event_id"
        )

    def arm_window():
        ev = load_table(spark, SF_DIR, "events")
        return ewma_closed_form(ev, "user_id", "ts", "value", "event_id").orderBy(
            "user_id", "ts", "event_id"
        )

    # ---- bitwise parity across every SF dir available ----
    base = os.path.dirname(SF_DIR.rstrip("/"))
    for d in sorted(os.listdir(base)):
        sfd = os.path.join(base, d)
        ev = load_table(spark, sfd, "events")
        a = [tuple(r) for r in
             TS.ewma(ev, "user_id", "ts", "value", "event_id", alpha=0.5)
             .orderBy("user_id", "ts", "event_id").collect()]
        b = [tuple(r) for r in
             ewma_closed_form(ev, "user_id", "ts", "value", "event_id")
             .orderBy("user_id", "ts", "event_id").collect()]
        exact = a == b  # tuple equality on doubles == bitwise for non-NaN
        print(f"{d}: rows={len(a)} bitwise_equal={exact}", flush=True)
        if not exact:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print("  first diffs:", diffs)
            raise SystemExit("PARITY FAIL")

    # ---- alternating timing ----
    arms = {"pandas_shard": arm_pandas, "window_closed": arm_window}
    times = {a: [] for a in arms}
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for r in range(reps):
        for name, build in arms.items():
            spark.sparkContext.setJobDescription(f"ts6:{name}:rep{r}")
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            times[name].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
    for name, ts in times.items():
        print(f"{name}: min={min(ts)} reps={ts}")


if __name__ == "__main__":
    main()
