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
       python tools/run_curation_pipeline.py [sf_dir] [out_dir] [budget] --dsir-frac 0.5

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


#: Curated "target" sources for the optional DSIR stage — must match
#: plans/entry_queries._DSIR_TARGET_SOURCES (the oracled mix5 row).
DSIR_TARGET_SOURCES = ("src0", "src1", "src2", "src3")


def curate(
    spark,
    sf_dir: str,
    budget_tokens: int,
    n_shards: int = 8,
    dsir_frac: float | None = None,
):
    """The pipe10 chain + shard assignment, returned as (curated_df,
    per_source_stats_df). Kept as a function so tests can run it on
    sf0.001 without touching the CLI path.

    ``dsir_frac`` switches on the DSIR selection stage between dedup and
    budget allocation (the published curation order: quality gate →
    dedup → target-similarity selection → mixture): survivors from the
    curated target sources pass unconditionally; pool survivors are
    scored by hashed-bigram importance weight vs the target distribution
    (operators/text.dsir_*) and only the top ceil(dsir_frac * |pool|)
    proceed to allocation. Zero-bigram pool docs are unscorable and
    dropped by the stage (the documented mix5 contract). The one extra
    job is the pool count; selection itself is a TakeOrderedAndProject
    + a semi join back on doc_id."""
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
    if dsir_frac is not None:
        import math

        # the DSIR stage reads the survivor frame several times (pool
        # count, weight build, scoring, the semi join) — persist it once
        # so those passes read cached blocks instead of re-running the
        # gate + dedup window lineage (the curate_epoch materialization
        # pattern; without it full-mode --dsir-frac is a five-pass trade)
        surv = surv.persist()
        is_target = F.col("source").isin(*DSIR_TARGET_SOURCES)
        tgt = surv.filter(is_target)
        pool = surv.filter(~is_target)
        k = int(math.ceil(dsir_frac * pool.count()))
        # single-scan weight building: surv's lineage is the gate + dedup
        # window, so every extra pass re-runs it — the flag variant costs
        # one survivor pass instead of two
        weights = text.dsir_bucket_weights_from_flag(surv, is_target, "text")
        top = text.dsir_select(
            tgt, pool, "doc_id", "text", k=k, weights=weights
        ).select("doc_id")
        surv = tgt.unionByName(pool.join(top, "doc_id", "semi"))
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


def fingerprint_expr():
    """pipe11's normalized prefix-8 fingerprint (16-byte md5 of the first
    8 whitespace tokens) — the ONLY thing the history store ever ships."""
    return F.md5(
        F.concat_ws(" ", F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 8))
    )


def curate_epoch(
    spark,
    batch_docs,
    hist_fps,
    budget_tokens: int,
    n_shards: int = 8,
    salt: str = "cur2",
):
    """ONE nightly epoch of the pipe11 chain over an arbitrary batch
    frame: Gopher gate → within-batch keep-first dedup on the prefix-8
    fingerprint → LEFT ANTI against ``hist_fps`` (a 1-column `fp` frame,
    or None for the first epoch) → per-source budget admission →
    integer md5 draws → shard assignment. The survivor frame is
    persisted ONCE (the materialization trade pipe11's declarative form
    documents). Returns (curated_df, stats_df, admitted_fps_df) — the
    caller unions admitted_fps into its store so the NEXT epoch dedups
    against everything the corpus already contains (a draw-rejected doc
    keeps its chance in later epochs; an admitted fingerprint never
    re-enters)."""
    feat = batch_docs.select(
        "doc_id",
        "source",
        "text",
        fingerprint_expr().alias("fp"),
        *text.gopher_evidence_columns("text"),
    ).select("*", *text.gopher_rule_columns())
    w_fp = Window.partitionBy("fp").orderBy("doc_id")
    surv = (
        feat.filter(F.col("keep") & F.col("source").isNotNull())
        .withColumn("__rn", F.row_number().over(w_fp))
        .filter(F.col("__rn") == 1)
    )
    if hist_fps is not None:
        surv = surv.join(hist_fps, "fp", "left_anti")
    surv = surv.select("doc_id", "source", "text", "n_words", "fp").persist()
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
        admitted, "doc_id", n_shards=n_shards, salt=salt
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
    return curated, stats, admitted.select("fp").distinct()


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
    per historical doc at any corpus size. Delegates to
    :func:`curate_epoch`; pipe11 parity is pinned by
    tests/test_pack_chunk.py."""
    docs = load_table(spark, sf_dir, "documents")
    hist = (
        docs.filter(F.col("doc_id") % batch_mod != 0)
        .select(fingerprint_expr().alias("fp"))
        .distinct()
    )
    curated, stats, _ = curate_epoch(
        spark,
        docs.filter(F.col("doc_id") % batch_mod == 0),
        hist,
        budget_tokens,
        n_shards=n_shards,
    )
    return curated, stats


def run_epochs(
    spark, sf_dir: str, budget_tokens: int, n_epochs: int = 3, out_dir: str | None = None
):
    """Chain :func:`curate_epoch` across ``n_epochs`` synthetic 'nights'
    (night e = doc_id % n_epochs == e) carrying the VERSIONED fingerprint
    store between them — the composed loop the per-epoch function exists
    for (round-9 verdict #5). The store after night e is exactly the
    union of all admitted fingerprints through night e (store version e
    written to fp_store/v{e} when out_dir is given), so no fingerprint
    is ever admitted twice across epochs. Returns
    (per_epoch, fp_store_df) where per_epoch is a list of
    (curated_df, stats_df) per night — frames, never driver collects
    (their lineage reads the per-epoch persisted survivor frame, so they
    stay cheap to evaluate after the loop)."""
    docs = load_table(spark, sf_dir, "documents")
    store = None
    per_epoch = []
    for e in range(n_epochs):
        batch = docs.filter(F.col("doc_id") % n_epochs == e)
        curated, stats, admitted_fps = curate_epoch(
            spark, batch, store, budget_tokens, salt=f"cur2e{e}"
        )
        # materialize the store ONCE per night: checkpoint through parquet
        # when out_dir is given (the versioned store a production loop
        # keeps), else persist — either way the next epoch reads stored
        # fps, not a growing lineage over every prior night
        new_store = (
            admitted_fps if store is None else store.unionByName(admitted_fps)
        ).distinct()
        if out_dir is not None:
            version_dir = os.path.join(out_dir, "fp_store", f"v{e}")
            new_store.write.mode("overwrite").parquet(version_dir)
            store = spark.read.parquet(version_dir)
            curated.write.mode("overwrite").partitionBy("shard").parquet(
                os.path.join(out_dir, "curated", f"epoch={e}")
            )
        else:
            store = new_store.persist()
        per_epoch.append((curated, stats))
    return per_epoch, store


def main() -> None:
    argv = sys.argv[1:]
    dsir_frac = None
    if "--dsir-frac" in argv:
        i = argv.index("--dsir-frac")
        dsir_frac = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if a != "--incremental"]
    incremental = "--incremental" in argv
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.001"
    out_dir = args[1] if len(args) > 1 else "/tmp/spark_curation_run"
    budget = int(args[2]) if len(args) > 2 else 50_000
    if incremental and dsir_frac is not None:
        raise SystemExit(
            "--dsir-frac is a full-mode stage (selection vs the whole "
            "survivor pool); combining it with --incremental would "
            "silently score only the nightly batch against itself. "
            "Run full-mode selection, or extend curate_epoch explicitly."
        )
    spark = get_spark("run-curation")
    if incremental:
        curated, stats = curate_incremental(spark, sf_dir, budget)
    else:
        curated, stats = curate(spark, sf_dir, budget, dsir_frac=dsir_frac)
    target = os.path.join(out_dir, "curated")
    # partitionBy shard: each pretraining reader takes one directory;
    # within a shard, pos is the reproducible md5 training order
    curated.write.mode("overwrite").partitionBy("shard").parquet(target)
    rows = [r.asDict() for r in stats.collect()]
    summary = {
        "sf_dir": sf_dir,
        "mode": "incremental" if incremental else "full",
        "dsir_frac": dsir_frac,
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
