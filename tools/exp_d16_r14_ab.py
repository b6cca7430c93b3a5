"""Round-14 d16 A/B: tid INT narrowing + gram-explode checkpoint.

Arms (all inside ONE warm session, alternating reps so host drift
cancels — the repo's measurement discipline):

  base      : r13 shape (_PF_TID_NARROW=False, _PF_TOKS_CKPT=False)
  tid_int   : narrow token ids to INT when the counted vocab fits
              (guide §2.3 — stoks arrays are the verify-shuffle payload)
  toks_ckpt : materialize the gram explode so dfreq + ranked share one
              tokenize pass (re-run of the r13 scatter-dominated A/B on
              the post-heap-fix host, per the r13 verdict item 2)
  both      : tid_int + toks_ckpt

Parity: the four arms' full collected outputs must be identical
(bitwise on the jaccard double) before any timing is trusted.

Usage: python tools/exp_d16_r14_ab.py [reps_per_arm]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from end_to_end_ml_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

ARMS = {
    "base": dict(
        _PF_TID_NARROW=False, _PF_TOKS_CKPT=False, _PF_DRIVER_VOCAB_ROWS=0
    ),
    "tid_int": dict(
        _PF_TID_NARROW=True, _PF_TOKS_CKPT=False, _PF_DRIVER_VOCAB_ROWS=0
    ),
    "toks_ckpt": dict(
        _PF_TID_NARROW=False, _PF_TOKS_CKPT=True, _PF_DRIVER_VOCAB_ROWS=0
    ),
    "both": dict(
        _PF_TID_NARROW=True, _PF_TOKS_CKPT=True, _PF_DRIVER_VOCAB_ROWS=0
    ),
    "drv_vocab": dict(
        _PF_TID_NARROW=True, _PF_TOKS_CKPT=True, _PF_DRIVER_VOCAB_ROWS=65536
    ),
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(
        "exp-d16-r14",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "256k",
            "spark.sql.files.openCostInBytes": "64k",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256k",
            "spark.cleaner.periodicGC.interval": "2min",
        },
    )
    from end_to_end_ml_spark.operators import dedup
    from end_to_end_ml_spark.plans.entry_queries import REGISTRY

    fn = REGISTRY["d16_prefix_filter_jaccard"][0]

    def set_arm(arm: str) -> None:
        for attr, val in ARMS[arm].items():
            setattr(dedup, attr, val)

    # ---- parity first: all four arms produce the identical result ----
    ref = None
    for arm in ARMS:
        set_arm(arm)
        rows = [tuple(r) for r in fn(spark, SF_DIR).collect()]
        if ref is None:
            ref = rows
        elif rows != ref:
            raise SystemExit(f"PARITY FAIL: arm {arm} differs from base")
        spark.catalog.clearCache()
    print(f"parity OK across {len(ARMS)} arms ({len(ref)} rows)", flush=True)

    # ---- alternating timing, cold reps (clearCache per rep) ----
    times: dict[str, list[float]] = {a: [] for a in ARMS}
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # settle
    for r in range(reps):
        for arm in ARMS:
            set_arm(arm)
            spark.sparkContext.setJobDescription(f"d16:{arm}:rep{r}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times[arm].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
    set_arm("base")  # leave module state as found
    for arm, ts in times.items():
        print(f"{arm}: min={min(ts)} reps={ts}")


if __name__ == "__main__":
    main()
