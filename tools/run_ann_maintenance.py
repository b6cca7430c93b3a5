"""Incremental-ANN maintenance driver — the embedding-side sibling of
tools/run_curation_pipeline.py: build (or reuse) the persisted IVF index
over the HISTORY corpus, route the NEW batch through
ivf_probe_pairs_adaptive (lossless triangle-inequality probe when
pruning engages, bounded n_probe approximate probe in the degenerate
near-uniform-direction regime), and MATERIALIZE what a dedup/link
maintenance job consumes: the pair parquet + a stats JSON recording
WHICH contract the batch got (mode, pruned_fraction, pair count).

Stages (each a library operator):
  1. index        — operators/similarity.ivf_build_index (history only;
                    persisted cells, bounded driver sample)
  2. regime probe — ivf_pruning_report (two small jobs)
  3. routed probe — ivf_probe_pairs_adaptive (exact | approx)
  4. write        — pairs parquet + ann_stats.json sidecar

Usage: python tools/run_ann_maintenance.py [sf_dir] [out_dir] [threshold]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from end_to_end_ml_spark.operators import similarity  # noqa: E402
from end_to_end_ml_spark.session import get_spark  # noqa: E402
from end_to_end_ml_spark.sources import load_table  # noqa: E402


def maintain(
    spark,
    sf_dir: str,
    threshold: float = 0.4,
    n_centroids: int = 16,
    n_probe: int = 4,
    batch_mod: int = 4,
):
    """(pairs_df, index, stats_dict) — the pairs frame is returned
    DISTRIBUTED (never collected) together with the live index so the
    caller can write/count the pairs and then unpersist. Kept as a
    function so tests can run it on sf0.001 without the CLI path. The
    index is built per call here; a long-lived maintenance loop holds one
    IvfIndex across batches and pays only the probe per batch (the pipe9
    contract)."""
    emb = load_table(spark, sf_dir, "embeddings")
    batch = emb.filter(F.col("vec_id") % batch_mod == 0)
    hist = emb.filter(F.col("vec_id") % batch_mod != 0)
    index = similarity.ivf_build_index(
        hist, "vec_id", "embedding", n_centroids=n_centroids
    )
    rep = similarity.ivf_pruning_report(
        batch, "vec_id", "embedding", index, threshold
    ).collect()[0]
    # the report is handed to the router so the candidate-cell probe is
    # computed ONCE (round-9 ADVICE — the router used to re-run it)
    pairs, mode = similarity.ivf_probe_pairs_adaptive(
        batch, "vec_id", "embedding", index,
        threshold=threshold, n_probe=n_probe, report=rep,
    )
    stats = {
        "mode": mode,
        "threshold": threshold,
        "n_probe": n_probe if mode == "approx" else None,
        "pruned_fraction": rep["pruned_fraction"],
        "cells_total": rep["cells_total"],
        "n_queries": rep["n_queries"],
        "contract": (
            "exact: every pair with round(cos,6) >= threshold is present"
            if mode == "exact"
            else "approx: every emitted pair is true (exact verify); "
            "recall < 1 possible outside the n_probe nearest cells"
        ),
    }
    # NOTE: the pairs frame stays distributed (round-9 ADVICE — no
    # driver-side collect funnel); callers write/count it, then
    # index.unpersist() when done with the batch.
    return pairs, index, stats


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_ann_maintenance"
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 0.4
    spark = get_spark("run-ann-maintenance")
    pairs, index, stats = maintain(spark, sf_dir, threshold)
    os.makedirs(out_dir, exist_ok=True)
    # executor-side write — pairs never touch the driver; the count reads
    # back the written parquet footers (cheap metadata job)
    target = os.path.join(out_dir, "pairs")
    pairs.write.mode("overwrite").parquet(target)
    index.unpersist()
    stats["n_pairs"] = spark.read.parquet(target).count()
    stats["sf_dir"] = sf_dir
    with open(os.path.join(out_dir, "ann_stats.json"), "w") as f:
        json.dump(stats, f, indent=1, sort_keys=True)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
