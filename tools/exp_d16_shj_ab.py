"""A/B the join strategy inside prefix_filter_jaccard_pairs (q:d16),
alternating within one warm session:

  A  baseline        — planner default (SMJ for candidate + both verify joins)
  B  verify=SHJ      — shuffle_hash hint on the ranked side of both
                       verification joins (skips sorting the ~1M-row candidate
                       frame twice; the second sort carries both token arrays)
  C  B + cand=SHJ    — additionally build a local hash map on one prefix side
                       of the candidate self-join instead of sorting both

Prints per-variant rep lists + mins and collect-compares B/C against A once
(exact row equality after sorting) so a strategy change can't alter results.

Usage: python tools/exp_d16_shj_ab.py [rounds]
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
        "d16-shj-ab",
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

    VARIANTS = {
        "A_baseline": (None, None),
        "B_verify_shj": ("shuffle_hash", None),
        "C_verify_cand_shj": ("shuffle_hash", "shuffle_hash"),
    }

    def set_variant(tag: str) -> None:
        v, c = VARIANTS[tag]
        dedup._PF_VERIFY_HINT = v
        dedup._PF_CAND_HINT = c

    def run() -> float:
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    # correctness first: exact row equality vs baseline
    set_variant("A_baseline")
    base = sorted(tuple(r) for r in fn(spark, SF_DIR).collect())
    print(f"[check] baseline rows: {len(base)}", file=sys.stderr)
    for tag in ("B_verify_shj", "C_verify_cand_shj"):
        set_variant(tag)
        got = sorted(tuple(r) for r in fn(spark, SF_DIR).collect())
        assert got == base, f"{tag} rows differ from baseline"
        print(f"[check] {tag}: identical ({len(got)} rows)", file=sys.stderr)

    # warm-up one lap per variant, then alternate
    for tag in VARIANTS:
        set_variant(tag)
        run()
    results: dict[str, list[float]] = {t: [] for t in VARIANTS}
    for _ in range(rounds):
        for tag in VARIANTS:
            set_variant(tag)
            results[tag].append(run())
    set_variant("A_baseline")

    for tag, reps in results.items():
        print(f"{tag}: min={min(reps):.3f}s reps={['%.2f' % x for x in reps]}")
    spark.stop()


if __name__ == "__main__":
    main()
