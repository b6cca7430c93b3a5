"""A/B the round-13 q23/q24/pipe5 restructures, alternating old-vs-new
query shapes within one warm session:

  q23/q24  OLD: distinct (l_orderkey, l_partkey) + self-join on l_orderkey
           NEW: one groupBy(l_orderkey) collecting the sorted-distinct part
                array + in-array pair combinations (no join)
  pipe5    OLD: .distinct() on both broadcast probe sides
           NEW: no distinct — LEFT SEMI/ANTI are set-based already

Each OLD shape is inlined here verbatim (the registry now holds the NEW
one). For every pair the script first collect-compares full results (exact
row equality after sorting), then alternates noop-forced executions and
prints per-variant rep lists + mins.

Usage: python tools/exp_basket_ab.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from end_to_end_ml_spark.session import get_spark  # noqa: E402
from end_to_end_ml_spark.sources.io import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def old_q23(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct().localCheckpoint(
        eager=False
    )
    a = items.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(20)
    )


def old_q24(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct().localCheckpoint(
        eager=False
    )
    n_orders_total = items.select("l_orderkey").distinct().count()
    part_counts = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_part"))
    a = items.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 3)
    )
    enriched = pairs.join(
        F.broadcast(
            part_counts.select(
                F.col("l_partkey").alias("part_a"), F.col("n_part").alias("n_a")
            )
        ),
        "part_a",
    ).join(
        F.broadcast(
            part_counts.select(
                F.col("l_partkey").alias("part_b"), F.col("n_part").alias("n_b")
            )
        ),
        "part_b",
    )
    return (
        enriched.select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            (
                (F.col("n_ab") * F.lit(n_orders_total))
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(20)
    )


def old_pipe5(spark, sf_dir):
    from pyspark.sql import Window

    from end_to_end_ml_spark.operators import text

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 3 != 0)
    cands = docs.filter(F.col("doc_id") % 3 == 0)
    staged = cands.select(
        "doc_id", "lang", "n_chars", text.tokens("text").alias("__toks")
    ).localCheckpoint(eager=False)
    q = staged.select(
        "doc_id", "lang", "n_chars", F.size("__toks").alias("__ntok")
    ).filter((F.col("__ntok") >= 10) & (F.col("n_chars") >= 50))
    probe_grams = (
        train.select(text.tokens("text").alias("__toks"))
        .select(F.explode(text.word_ngrams_from_tokens("__toks", 8)).alias("g"))
        .distinct()
    )
    contaminated = (
        staged.select(
            "doc_id", F.explode(text.word_ngrams_from_tokens("__toks", 8)).alias("g")
        )
        .join(F.broadcast(probe_grams), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    clean = q.join(F.broadcast(contaminated), "doc_id", "left_anti")
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    return (
        clean.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 25)
        .select("doc_id", "lang", "n_chars")
        .orderBy("lang", "doc_id")
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(
        "basket-ab",
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

    CASES = {
        "q23": (old_q23, REGISTRY["q23_copurchase_pairs"][0]),
        "q24": (old_q24, REGISTRY["q24_association_rules"][0]),
        "pipe5": (old_pipe5, REGISTRY["pipe5_eval_set"][0]),
    }

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        # localCheckpoint blocks are RDD-level persists freed by the async
        # ContextCleaner only after a driver GC notices the dead refs
        # (bench.py does the same after every query)
        spark._jvm.System.gc()
        return dt

    for name, (old, new) in CASES.items():
        base = sorted(tuple(r) for r in old(spark, SF_DIR).collect())
        got = sorted(tuple(r) for r in new(spark, SF_DIR).collect())
        assert got == base, f"{name}: NEW rows differ from OLD"
        print(f"[check] {name}: identical ({len(got)} rows)", file=sys.stderr)

    for name, (old, new) in CASES.items():
        run(old)
        run(new)
        olds: list[float] = []
        news: list[float] = []
        for _ in range(rounds):
            olds.append(run(old))
            news.append(run(new))
        print(
            f"{name}: old_min={min(olds):.3f}s new_min={min(news):.3f}s "
            f"old={['%.2f' % x for x in olds]} new={['%.2f' % x for x in news]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
