"""Hot-score degeneracy probe (round-12 verdict #2 evidence): measure the
two-level rank with and without the order-preserving id-range bucket on a
frame where ONE score value dominates — the case score quantization
GUARANTEES at scale (N / |distinct scores| rows per score partition).

Shapes compared, both computing the exact same positions:
  A (pre-r12): level-1 row_number partitioned BY SCORE alone — the hot
     score collapses into ONE WindowExec partition (single task sorts ~N
     rows).
  B (r12):     metrics.two_level_rank — level-1 partitioned by
     (score, (id - min_id) div gsize), hot score split n_buckets ways.

Methodology per the repo's measurement discipline (r11 lesson): warm every
variant once, then time ALTERNATING rounds, report per-round ratios — a
sequential A-block/B-block run biases against whichever runs first.

Usage: python tools/exp_hot_score_rank.py [n_rows] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from end_to_end_ml_spark.functions import metrics as M
from end_to_end_ml_spark.session import get_spark


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("exp-hot-score", shuffle_partitions=32)

    # all-one-score worst case with a thin tail of other scores (so the
    # offsets frame is non-trivial): 95% of rows share score 7
    df = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 20 < 19, F.lit(7))
            .otherwise((F.col("id") % 13).cast("long"))
            .alias("s"),
        )
    )

    def force(frame) -> None:
        frame.write.format("noop").mode("overwrite").save()

    def old_shape():
        ranked = df.withColumn(
            "r_in", F.row_number().over(Window.partitionBy("s").orderBy("doc_id"))
        )
        counts = ranked.groupBy("s").agg(F.count(F.lit(1)).alias("cnt"))
        w_off = Window.orderBy(F.col("s").desc()).rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = (
            counts.withColumn(
                "offset", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
            )
            .crossJoin(F.broadcast(counts.agg(F.sum("cnt").alias("n_total"))))
            .select("s", "offset", "n_total")
        )
        return (
            ranked.join(offsets, "s")
            .select("doc_id", (F.col("offset") + F.col("r_in")).alias("pos"))
        )

    def new_shape():
        return M.two_level_rank(df, "s", "doc_id").select("doc_id", "pos")

    # equality spot-check before timing anything
    mism = (
        old_shape().alias("a")
        .join(new_shape().alias("b"), "doc_id")
        .filter(F.col("a.pos") != F.col("b.pos"))
        .count()
    )
    assert mism == 0, f"shapes disagree on {mism} rows"

    force(old_shape())
    force(new_shape())
    for r in range(rounds):
        t0 = time.perf_counter()
        force(old_shape())
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        force(new_shape())
        tb = time.perf_counter() - t0
        print(
            f"round {r}: old(score-only) {ta:.2f}s  "
            f"new(score,range-bucket) {tb:.2f}s  ratio {ta / tb:.2f}x"
        )


if __name__ == "__main__":
    main()
