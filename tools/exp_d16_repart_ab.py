"""A/B the candidate-dedup partitioning inside prefix_filter_jaccard_pairs
(q:d16), alternating within one warm session:

  A  dedup_default — dropDuplicates plans its own (id_a, id_b) exchange,
                     then EnsureRequirements adds a second full candidate
                     exchange (id_a) for the first verify join
  B  repart_id_a   — repartition("id_a") BEFORE the dedup: one exchange of
                     the raw candidates serves both the dedup aggregate and
                     the verify join (trade: the shuffle carries raw
                     candidates, ~1.26x rows at sf0.1, instead of map-side
                     deduplicated ones)

Prints per-variant rep lists + mins and collect-compares B against A once
(exact row equality after sorting) so the partitioning change can't alter
results.

Usage: python tools/exp_d16_repart_ab.py [rounds]
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
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(
        "d16-repart-ab",
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
    from end_to_end_ml_spark.operators import dedup
    from end_to_end_ml_spark.plans.entry_queries import REGISTRY

    fn = REGISTRY["d16_prefix_filter_jaccard"][0]

    VARIANTS = {"A_dedup_default": False, "B_repart_id_a": True}

    def run() -> float:
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        # localCheckpoint blocks are RDD-level persists freed by the async
        # ContextCleaner only after a driver GC notices the dead refs
        # (bench.py does the same after every query)
        spark._jvm.System.gc()
        return dt

    dedup._PF_REPART_CAND = False
    base = sorted(tuple(r) for r in fn(spark, SF_DIR).collect())
    print(f"[check] baseline rows: {len(base)}", file=sys.stderr)
    dedup._PF_REPART_CAND = True
    got = sorted(tuple(r) for r in fn(spark, SF_DIR).collect())
    assert got == base, "B_repart_id_a rows differ from baseline"
    print(f"[check] B_repart_id_a: identical ({len(got)} rows)", file=sys.stderr)

    for tag, flag in VARIANTS.items():
        dedup._PF_REPART_CAND = flag
        run()
    results: dict[str, list[float]] = {t: [] for t in VARIANTS}
    for _ in range(rounds):
        for tag, flag in VARIANTS.items():
            dedup._PF_REPART_CAND = flag
            results[tag].append(run())
    dedup._PF_REPART_CAND = True

    for tag, reps in results.items():
        print(f"{tag}: min={min(reps):.3f}s reps={['%.2f' % x for x in reps]}")
    spark.stop()


if __name__ == "__main__":
    main()
