"""End-to-end LLM-data curation driver — the data-side sibling of
tools/run_pipeline.py: run the pipe10 budget-curation chain over the
documents table and MATERIALIZE the result the way a pretraining job
consumes it (curated parquet shards + a stats JSON sidecar).

Stages (each a library operator, composed into few jobs):
  1. quality gate      — Gopher integer rules (operators/text)
  2. exact dedup       — normalized-fingerprint keep-min-id
  3. budget allocation — temperature-weighted token budget per source
                         (operators/split.token_budget_allocation)
  4. admit draws       — integer md5 cross-multiplication per doc
  5. shard + write     — deterministic md5 shard shuffle (operators/pack)
                         partitioned parquet + stats JSON

Usage: python tools/run_curation_pipeline.py [sf_dir] [out_dir] [budget]
       python tools/run_curation_pipeline.py [sf_dir] [out_dir] [budget] --incremental

--incremental runs the pipe11 shape instead: only the NEW batch
(doc_id % 4 == 0) is curated, deduplicated against the HISTORY
fingerprint store (16-byte prefix-8 fps, anti join) as well as within
itself — and the survivor frame is MATERIALIZED ONCE (persist) before
the allocation and draw passes, fixing operationally the two-pass
survivor-scan trade the declarative pipe10/pipe11 query forms document.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from end_to_end_ml_spark.operators import pack, split, text  # noqa: E402
from end_to_end_ml_spark.session import get_spark  # noqa: E402
from end_to_end_ml_spark.sources import load_table  # noqa: E402


def curate(spark, sf_dir: str, budget_tokens: int, n_shards: int = 8):
    """The pipe10 chain + shard assignment, returned as (curated_df,
    per_source_stats_df). Kept as a function so tests can run it on
    sf0.001 without touching the CLI path."""
    docs = load_table(spark, sf_dir, "documents")
    feat = docs.select(
        "doc_id",
        "source",
        "text",
        text.fingerprint_column("text").alias("fp"),
        *text.gopher_evidence_columns("text"),
    ).select("*", *text.gopher_rule_columns())
    w_fp = Window.partitionBy("fp")
    surv = (
        # Keeper selection MUST see NULL-source docs (round-9 ADVICE): in
        # the oracled pipe10 form a NULL-source doc that is the min-doc_id
        # keeper of a fingerprint suppresses its non-NULL duplicates, and
        # only the allocation/rates join drops the NULL-source survivor
        # itself. Filtering source before the window would let those
        # duplicates through — so the NULL filter runs AFTER dedup here,
        # exactly as PIPE10_SQL does.
        feat.filter(F.col("keep"))
        .withColumn("keeper", F.min("doc_id").over(w_fp))
        .filter((F.col("doc_id") == F.col("keeper")) & F.col("source").isNotNull())
        .select("doc_id", "source", "text", "n_words")
    )
    rates = split.token_budget_allocation(
        surv, "source", "n_words", budget_tokens=budget_tokens,
        max_epochs_x1024=1024,
    ).select(
        "source",
        "n_tokens",
        "alloc_tokens",
        F.col("epochs_ppm").alias("admit_ppm"),
        "clipped",
    )
    draw = F.expr(
        "CAST(conv(substring(md5(concat_ws('|', 'bud1',"
        " CAST(doc_id AS STRING))), 1, 12), 16, 10) AS DECIMAL(38,0))"
        " * 1000000 < CAST(admit_ppm AS DECIMAL(38,0)) * 281474976710656"
    )
    admitted = surv.join(
        F.broadcast(rates.select("source", "admit_ppm")), "source"
    ).filter(draw)
    curated = pack.shard_shuffle(
        admitted, "doc_id", n_shards=n_shards, salt="cur1"
    ).select("shard", "pos", "doc_id", "source", "n_words", "text")
    stats = (
        admitted.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_words").cast("long").alias("n_tokens_kept"),
        )
        .join(rates, "source")
        .orderBy("source")
    )
    return curated, stats


def curate_incremental(
    spark, sf_dir: str, budget_tokens: int, n_shards: int = 8, batch_mod: int = 4
):
    """The pipe11 chain, operationally: curate only the NEW batch
    (doc_id % batch_mod == 0) against the history fingerprint store,
    with the survivor frame persisted ONCE so the allocation pass and
    the admit-draw pass read cached blocks instead of re-running the
    gate + dedup lineage (the two-pass trade the declarative query form
    documents — here the batch is materialized, exactly what a nightly
    production run does). History ships fingerprints only — 16 bytes
    per historical doc at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(
        F.concat_ws(" ", F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 8))
    )
    hist = (
        docs.filter(F.col("doc_id") % batch_mod != 0).select(fp.alias("fp")).distinct()
    )
    feat = (
        docs.filter(F.col("doc_id") % batch_mod == 0)
        .select(
            "doc_id",
            "source",
            "text",
            fp.alias("fp"),
            *text.gopher_evidence_columns("text"),
        )
        .select("*", *text.gopher_rule_columns())
    )
    w_fp = Window.partitionBy("fp").orderBy("doc_id")
    surv = (
        feat.filter(F.col("keep") & F.col("source").isNotNull())
        .withColumn("__rn", F.row_number().over(w_fp))
        .filter(F.col("__rn") == 1)
        .join(hist, "fp", "left_anti")
        .select("doc_id", "source", "text", "n_words")
        .persist()
    )
    rates = split.token_budget_allocation(
        surv, "source", "n_words", budget_tokens=budget_tokens,
        max_epochs_x1024=1024,
    ).select(
        "source",
        "n_tokens",
        "alloc_tokens",
        F.col("epochs_ppm").alias("admit_ppm"),
        "clipped",
    )
    draw = F.expr(
        "CAST(conv(substring(md5(concat_ws('|', 'bud2',"
        " CAST(doc_id AS STRING))), 1, 12), 16, 10) AS DECIMAL(38,0))"
        " * 1000000 < CAST(admit_ppm AS DECIMAL(38,0)) * 281474976710656"
    )
    admitted = surv.join(
        F.broadcast(rates.select("source", "admit_ppm")), "source"
    ).filter(draw)
    curated = pack.shard_shuffle(
        admitted, "doc_id", n_shards=n_shards, salt="cur2"
    ).select("shard", "pos", "doc_id", "source", "n_words", "text")
    stats = (
        admitted.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_words").cast("long").alias("n_tokens_kept"),
        )
        .join(rates, "source")
        .orderBy("source")
    )
    return curated, stats


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--incremental"]
    incremental = "--incremental" in sys.argv[1:]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.001"
    out_dir = args[1] if len(args) > 1 else "/tmp/spark_curation_run"
    budget = int(args[2]) if len(args) > 2 else 50_000
    spark = get_spark("run-curation")
    fn = curate_incremental if incremental else curate
    curated, stats = fn(spark, sf_dir, budget)
    target = os.path.join(out_dir, "curated")
    # partitionBy shard: each pretraining reader takes one directory;
    # within a shard, pos is the reproducible md5 training order
    curated.write.mode("overwrite").partitionBy("shard").parquet(target)
    rows = [r.asDict() for r in stats.collect()]
    summary = {
        "sf_dir": sf_dir,
        "mode": "incremental" if incremental else "full",
        "budget_tokens": budget,
        "sources": rows,
        "total_docs_kept": int(sum(r["n_docs_kept"] for r in rows)),
        "total_tokens_kept": int(sum(r["n_tokens_kept"] for r in rows)),
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "curation_stats.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
