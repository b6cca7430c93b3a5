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
       python tools/run_ann_maintenance.py [sf_dir] [out_dir] [threshold] --epochs 3

--epochs runs the PROBE-THEN-ADD loop instead (maintain_epochs): one
index build, then each ingest night probes the current index and is
ivf_index_add-ed into it — per-epoch pairs parquet + a stats sidecar
recording the pruned_fraction trajectory the rebuild policy watches.
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
    try:
        rep = similarity.ivf_pruning_report(
            batch, "vec_id", "embedding", index, threshold
        ).collect()[0]
        # the report is handed to the router so the candidate-cell probe
        # is computed ONCE (round-9 ADVICE — the router used to re-run it)
        pairs, mode = similarity.ivf_probe_pairs_adaptive(
            batch, "vec_id", "embedding", index,
            threshold=threshold, n_probe=n_probe, report=rep,
        )
    except BaseException:
        # failure before the index handle reaches the caller would leak
        # the persisted cells frame for the session lifetime
        index.unpersist()
        raise
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


def maintain_epochs(
    spark,
    sf_dir: str,
    threshold: float = 0.4,
    n_epochs: int = 3,
    n_centroids: int = 16,
    n_probe: int = 4,
    min_pruned_fraction: float = 0.05,
    out_dir: str | None = None,
):
    """The PROBE-THEN-ADD maintenance loop (the long-lived form the
    per-batch maintain() docstring promises): build the index once over
    the history split, then for each ingest night e (vec_id%4==0 and
    (vec_id div 4)%n_epochs == e) route the batch through the adaptive
    probe against the CURRENT index — which by then contains history
    PLUS every earlier night — and ivf_index_add the batch in (O(batch)
    layered add; the chain of shared cached layers is freed once at the
    end). Records per-epoch (mode, pruned_fraction, n_pairs) so the
    rebuild policy (pruned_fraction decaying below the routing floor as
    radii inflate) is observable.

    With ``out_dir`` the per-epoch pairs are WRITTEN distributed
    (out_dir/pairs/epoch=e, counted off the written files) — the
    production path; without it they are collected and returned (the
    bounded test/demo path). Returns (per_epoch_pairs, stats) —
    row-lists, or written paths when out_dir is given."""
    emb = load_table(spark, sf_dir, "embeddings")
    hist = emb.filter(F.col("vec_id") % 4 != 0)
    index = similarity.ivf_build_index(
        hist, "vec_id", "embedding", n_centroids=n_centroids
    )
    epochs = []
    pairs_per_epoch = []
    try:
        for e in range(n_epochs):
            batch = emb.filter(
                (F.col("vec_id") % 4 == 0)
                & (F.expr("(vec_id div 4)") % n_epochs == e)
            )
            rep = similarity.ivf_pruning_report(
                batch, "vec_id", "embedding", index, threshold
            ).collect()[0]
            pairs, mode = similarity.ivf_probe_pairs_adaptive(
                batch, "vec_id", "embedding", index,
                threshold=threshold, n_probe=n_probe,
                min_pruned_fraction=min_pruned_fraction, report=rep,
            )
            if out_dir is not None:
                target = os.path.join(out_dir, "pairs", f"epoch={e}")
                pairs.write.mode("overwrite").parquet(target)
                n_pairs = spark.read.parquet(target).count()
                pairs_per_epoch.append(target)
            else:
                rows = pairs.collect()
                n_pairs = len(rows)
                pairs_per_epoch.append(rows)
            # the add SUPERSEDES index (shared cached layers, O(batch)
            # cost) — no unpersist of the input; the CURRENT index owns
            # every layer, so the finally below frees the whole chain
            index = similarity.ivf_index_add(index, batch, "vec_id", "embedding")
            epochs.append(
                {
                    "epoch": e,
                    "mode": mode,
                    "pruned_fraction": rep["pruned_fraction"],
                    "n_queries": rep["n_queries"],
                    "n_pairs": n_pairs,
                }
            )
        stats = {
            "threshold": threshold,
            "n_epochs": n_epochs,
            "epochs": epochs,
            "index_rows": index.cells.count(),
        }
    finally:
        index.unpersist()
    return pairs_per_epoch, stats


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    ap.add_argument("out_dir", nargs="?", default="/tmp/spark_ann_maintenance")
    ap.add_argument("threshold", nargs="?", type=float, default=0.4)
    ap.add_argument(
        "--epochs", type=int, default=None,
        help="run the probe-then-add loop for N ingest nights",
    )
    ns = ap.parse_args()
    sf_dir, out_dir, threshold = ns.sf_dir, ns.out_dir, ns.threshold
    spark = get_spark("run-ann-maintenance")
    if ns.epochs is not None:
        _, stats = maintain_epochs(
            spark, sf_dir, threshold, n_epochs=ns.epochs, out_dir=out_dir
        )
        stats["sf_dir"] = sf_dir
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "ann_stats.json"), "w") as f:
            json.dump(stats, f, indent=1, sort_keys=True)
        print(json.dumps(stats))
        return
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
