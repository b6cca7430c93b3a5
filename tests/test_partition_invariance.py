"""Metamorphic partition-invariance suite: the determinism-critical
operators claim their results are independent of physical partitioning
(md5 draws, frozen boundaries, explicit tie-breaks). Re-running each under
different repartitionings must give IDENTICAL results — the property that
makes them reproducible on any cluster layout and oracle-checkable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, n=300):
    return spark.createDataFrame(
        [
            (
                i,
                " ".join(f"w{(i * 7 + j) % 40}" for j in range(10 + i % 5)),
                ["en", "de", "fr"][i % 3],
                i * 13 % 997,
            )
            for i in range(n)
        ],
        ["doc_id", "text", "lang", "n_chars"],
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


PARTITIONINGS = [1, 3, 17]


class TestPartitionInvariance:
    def _invariant(self, spark, fn):
        base = _docs(spark)
        results = [_rows(fn(base.repartition(p))) for p in PARTITIONINGS]
        assert results[0] == results[1] == results[2]
        assert len(results[0]) > 0

    def test_temperature_sample(self, spark):
        from end_to_end_ml_spark.operators.split import temperature_sample

        self._invariant(
            spark,
            lambda df: temperature_sample(df, "doc_id", "lang").select(
                "doc_id", "lang"
            ),
        )

    def test_shard_shuffle(self, spark):
        from end_to_end_ml_spark.operators.pack import shard_shuffle

        self._invariant(
            spark,
            lambda df: shard_shuffle(df.select("doc_id"), "doc_id", 4),
        )

    def test_global_ordinal(self, spark):
        from end_to_end_ml_spark.operators.ordinal import global_ordinal

        self._invariant(
            spark,
            lambda df: global_ordinal(
                df.select("doc_id", "n_chars"), "n_chars", "doc_id", n_buckets=6
            ),
        )

    def test_group_split(self, spark):
        from end_to_end_ml_spark.operators.split import group_split

        self._invariant(
            spark,
            lambda df: group_split(df, "lang", 0.4).select("doc_id", "split"),
        )

    def test_stratified_split_column(self, spark):
        from end_to_end_ml_spark.operators.split import stratified_split_column

        self._invariant(
            spark,
            lambda df: stratified_split_column(df, "lang", "doc_id", 0.7).select(
                "doc_id", "split"
            ),
        )

    def test_minhash_pairs(self, spark):
        from end_to_end_ml_spark.operators.dedup import minhash_dedup_pairs

        base = _docs(spark, 120)
        results = [
            _rows(
                minhash_dedup_pairs(
                    base.repartition(p), "doc_id", "text", threshold=0.3
                ).select("id_a", "id_b")
            )
            for p in PARTITIONINGS
        ]
        assert results[0] == results[1] == results[2]

    def test_negative_pairs(self, spark):
        from end_to_end_ml_spark.operators.similarity import negative_pairs

        self._invariant(
            spark,
            lambda df: negative_pairs(df.select("doc_id"), "doc_id", k=2),
        )

    def test_feature_hash_audit(self, spark):
        from end_to_end_ml_spark.operators.prep import feature_hash_audit

        self._invariant(
            spark, lambda df: feature_hash_audit(df, ["lang"], n_buckets=8)
        )

    def test_carve_assignment(self, spark):
        from end_to_end_ml_spark.operators.split import carve_assignment

        self._invariant(
            spark,
            lambda df: carve_assignment(df, "lang", "doc_id").select(
                "doc_id", "subset"
            ),
        )

    def test_hll_registers(self, spark):
        from end_to_end_ml_spark.operators.timeseries import (
            hll_registers,
            hll_registers_rollup,
        )

        self._invariant(
            spark,
            lambda df: hll_registers_rollup(
                hll_registers(
                    df.withColumn("ts", F.to_timestamp(F.lit("2024-01-02 03:00:00"))),
                    "doc_id",
                    "ts",
                    "lang",
                ),
                group_col="lang",
            ),
        )

    def test_winsorize(self, spark):
        from end_to_end_ml_spark.operators.prep import winsorize

        self._invariant(
            spark,
            lambda df: winsorize(df, "n_chars", "doc_id").select(
                "doc_id", "n_chars_w"
            ),
        )

    def test_gopher_filters(self, spark):
        from end_to_end_ml_spark.operators.text import gopher_quality_filters

        self._invariant(
            spark, lambda df: gopher_quality_filters(df, "doc_id", "text")
        )

    def test_token_budget_allocation(self, spark):
        from end_to_end_ml_spark.operators.split import token_budget_allocation

        self._invariant(
            spark,
            lambda df: token_budget_allocation(
                df.select("lang", F.col("n_chars").alias("n_tokens")),
                "lang",
                "n_tokens",
                budget_tokens=1000,
            ),
        )

    def test_tile_dedup_rewrite(self, spark):
        from end_to_end_ml_spark.operators.dedup import tile_dedup_rewrite

        self._invariant(
            spark, lambda df: tile_dedup_rewrite(df, "doc_id", "text", 4)
        )

    def test_id_gap_audit(self, spark):
        from end_to_end_ml_spark.operators.prep import id_gap_audit

        # n_chars has duplicates and gaps -> all branches exercised
        self._invariant(
            spark, lambda df: id_gap_audit(df, "n_chars", bucket_size=64)
        )

    def test_target_encode_table(self, spark):
        from end_to_end_ml_spark.features.pipeline import target_encode_table

        self._invariant(
            spark,
            lambda df: target_encode_table(df, "lang", "n_chars", smoothing=10),
        )

    def test_budget_curation_chain(self, spark):
        """The full pipe10 composition (gopher gate -> fp-dedup ->
        budget allocation -> md5 admit draws) must be partition-invariant
        end-to-end: every decision is integer/md5-derived."""
        from pyspark.sql import Window as W
        from end_to_end_ml_spark.operators import split as S
        from end_to_end_ml_spark.operators import text as T

        def chain(df):
            feat = df.select(
                "doc_id",
                F.col("lang").alias("source"),
                T.fingerprint_column("text").alias("fp"),
                *T.gopher_evidence_columns("text"),
            ).select("*", *T.gopher_rule_columns(min_words=5, min_stopword_hits=0))
            surv = (
                feat.filter(F.col("keep"))
                .withColumn("keeper", F.min("doc_id").over(W.partitionBy("fp")))
                .filter(F.col("doc_id") == F.col("keeper"))
                .select("doc_id", "source", "n_words")
            )
            rates = S.token_budget_allocation(
                surv, "source", "n_words", budget_tokens=500, max_epochs_x1024=1024
            ).select("source", F.col("epochs_ppm").alias("admit_ppm"))
            draw = F.expr(
                "CAST(conv(substring(md5(concat_ws('|', 'bud1',"
                " CAST(doc_id AS STRING))), 1, 12), 16, 10) AS DECIMAL(38,0))"
                " * 1000000 < CAST(admit_ppm AS DECIMAL(38,0)) * 281474976710656"
            )
            return (
                surv.join(F.broadcast(rates), "source")
                .filter(draw)
                .select("doc_id", "source", "n_words")
            )

        self._invariant(spark, chain)

    def test_histogram_quantiles(self, spark):
        from end_to_end_ml_spark.operators import timeseries as TS

        def run(df):
            ev = df.select(
                "lang",
                F.to_timestamp(
                    F.concat(
                        F.lit("2024-01-0"), (F.col("doc_id") % 7 + 1).cast("string")
                    )
                ).alias("ts"),
                (F.col("n_chars") % 97).cast("double").alias("value"),
            )
            h = TS.histogram_sketch(ev, "ts", "lang", "value", bin_width=10.0)
            return TS.histogram_quantiles(
                TS.histogram_merge(h, "lang"), ["lang", "bucket"]
            )

        self._invariant(spark, run)

    def test_rolling_origin_assign(self, spark):
        from end_to_end_ml_spark.operators.split import rolling_origin_assign

        def run(df):
            ev = df.select(
                "doc_id",
                F.timestamp_seconds(
                    F.lit(1704067200) + F.col("doc_id") * 977
                ).alias("ts"),
            )
            return rolling_origin_assign(ev, "ts", n_slices=4).select(
                "doc_id", "slice"
            )

        self._invariant(spark, run)


class TestDsirPartitionInvariance:
    """DSIR selection claims engine-exact integer determinism — so its
    weight table, scores, and top-k must be identical under any physical
    partitioning of target and pool (md5 buckets, integer div, doc_id
    tie-breaks)."""

    def test_dsir_select(self, spark):
        from end_to_end_ml_spark.operators.text import dsir_select

        base = _docs(spark)
        tgt = base.filter(F.col("doc_id") % 3 == 0)
        pool = base.filter(F.col("doc_id") % 3 != 0)
        results = [
            sorted(
                tuple(r)
                for r in dsir_select(
                    tgt.repartition(p), pool.repartition(p),
                    "doc_id", "text", k=40,
                ).collect()
            )
            for p in PARTITIONINGS
        ]
        assert results[0] == results[1] == results[2]
        assert len(results[0]) == 40

    def test_dsir_weights_from_flag(self, spark):
        from end_to_end_ml_spark.operators.text import (
            dsir_bucket_weights_from_flag,
        )

        base = _docs(spark).withColumn("is_tgt", F.col("doc_id") % 3 == 0)
        results = [
            sorted(
                tuple(r)
                for r in dsir_bucket_weights_from_flag(
                    base.repartition(p), "is_tgt", "text"
                ).collect()
            )
            for p in PARTITIONINGS
        ]
        assert results[0] == results[1] == results[2]
        assert len(results[0]) > 0
