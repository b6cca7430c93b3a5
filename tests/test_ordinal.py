"""Dense global ordinals (distributed zipWithIndex) + ordinal-backed
exact winsorization + group-leakage-safe split."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_ml_spark.operators.ordinal import global_ordinal
from end_to_end_ml_spark.operators.prep import winsorize
from end_to_end_ml_spark.operators.split import group_split
from end_to_end_ml_spark.plans.lint import audit_plan


def _expected(rows):
    # rank under (key, pk)
    return {
        pk: i for i, (key, pk) in enumerate(sorted((k, p) for p, k in rows))
    }


class TestGlobalOrdinal:
    def test_matches_total_order_with_ties(self, spark):
        rows = [(i, (i * 37) % 11) for i in range(300)]  # heavy ties
        df = spark.createDataFrame(rows, ["pk", "key"])
        out = global_ordinal(df, "key", "pk", n_buckets=7).collect()
        exp = _expected(rows)
        assert {r["pk"]: r["ordinal"] for r in out} == exp
        assert sorted(r["ordinal"] for r in out) == list(range(300))

    def test_constant_key_single_bucket(self, spark):
        df = spark.createDataFrame([(i, 5) for i in range(50)], ["pk", "key"])
        out = global_ordinal(df, "key", "pk", n_buckets=8).collect()
        assert {r["pk"]: r["ordinal"] for r in out} == {i: i for i in range(50)}

    def test_more_buckets_than_values(self, spark):
        rows = [(i, i % 3) for i in range(30)]
        df = spark.createDataFrame(rows, ["pk", "key"])
        out = global_ordinal(df, "key", "pk", n_buckets=64).collect()
        assert {r["pk"]: r["ordinal"] for r in out} == _expected(rows)

    def test_plan_has_no_global_window(self, spark):
        df = spark.createDataFrame([(i, i % 7) for i in range(100)], ["pk", "key"])
        hazards = audit_plan(global_ordinal(df, "key", "pk", n_buckets=4))
        assert hazards == []

    def test_rejects_bad_buckets(self, spark):
        df = spark.createDataFrame([(1, 1)], ["pk", "key"])
        with pytest.raises(ValueError):
            global_ordinal(df, "key", "pk", n_buckets=0)


class TestWinsorize:
    def test_matches_manual_clamp(self, spark):
        vals = [(i, v) for i, v in enumerate([1, 2, 2, 3, 4, 100, -50, 5, 6, 7] * 10)]
        df = spark.createDataFrame(vals, ["pk", "v"])
        out = winsorize(df, "v", "pk", p_lo=0.05, p_hi=0.95).collect()
        ordered = sorted(v for _, v in vals)
        n = len(vals)
        lo = ordered[int(0.05 * (n - 1))]
        hi = ordered[int(0.95 * (n - 1))]
        for r in out:
            assert r["v_w"] == min(max(r["v"], lo), hi)

    def test_empty_raises(self, spark):
        df = spark.createDataFrame([], "pk long, v long")
        with pytest.raises(ValueError):
            winsorize(df, "v", "pk")

    def test_bad_quantiles_raise(self, spark):
        df = spark.createDataFrame([(1, 1)], ["pk", "v"])
        with pytest.raises(ValueError):
            winsorize(df, "v", "pk", p_lo=0.9, p_hi=0.1)


class TestGroupSplit:
    def test_groups_never_straddle(self, spark):
        rows = [(i, f"g{i % 17}") for i in range(500)]
        df = spark.createDataFrame(rows, ["pk", "grp"])
        out = group_split(df, "grp", test_frac=0.4).collect()
        sides = {}
        for r in out:
            sides.setdefault(r["grp"], set()).add(r["split"])
        assert all(len(s) == 1 for s in sides.values())
        assert {s for ss in sides.values() for s in ss} == {"train", "test"}

    def test_deterministic_and_frac_sensitive(self, spark):
        df = spark.createDataFrame([(i, f"g{i % 50}") for i in range(200)], ["pk", "grp"])
        a = {(r["pk"], r["split"]) for r in group_split(df, "grp", 0.3).collect()}
        b = {(r["pk"], r["split"]) for r in group_split(df, "grp", 0.3).collect()}
        assert a == b
        n_test = sum(1 for _, s in a if s == "test")
        assert 0 < n_test < 200

    def test_rejects_bad_frac(self, spark):
        df = spark.createDataFrame([(1, "g")], ["pk", "grp"])
        with pytest.raises(ValueError):
            group_split(df, "grp", test_frac=1.5)


class TestQuantileUniform:
    def test_endpoints_and_monotone(self, spark):
        from end_to_end_ml_spark.operators.prep import quantile_uniform

        df = spark.createDataFrame([(i, v) for i, v in enumerate([5, 1, 9, 3, 7])], ["pk", "v"])
        out = sorted(quantile_uniform(df, "v", "pk").collect(), key=lambda r: r["v"])
        qs = [r["v_q"] for r in out]
        assert qs == [0.0, 0.25, 0.5, 0.75, 1.0]

    def test_single_row_zero(self, spark):
        from end_to_end_ml_spark.operators.prep import quantile_uniform

        out = quantile_uniform(
            spark.createDataFrame([(1, 42)], ["pk", "v"]), "v", "pk"
        ).collect()
        assert out[0]["v_q"] == 0.0

    def test_empty_raises(self, spark):
        from end_to_end_ml_spark.operators.prep import quantile_uniform

        with pytest.raises(ValueError):
            quantile_uniform(spark.createDataFrame([], "pk long, v long"), "v", "pk")


class TestNegativePairs:
    def test_shape_and_no_self_pairs(self, spark):
        from end_to_end_ml_spark.operators.similarity import negative_pairs

        df = spark.createDataFrame([(i,) for i in range(40)], ["vec_id"])
        out = negative_pairs(df, "vec_id", k=3).collect()
        ids = set(range(40))
        assert all(r["neg_id"] in ids for r in out)
        assert all(r["neg_id"] != r["anchor_id"] for r in out)
        per_anchor = {}
        for r in out:
            per_anchor.setdefault(r["anchor_id"], 0)
            per_anchor[r["anchor_id"]] += 1
        # every anchor draws 3 times; a draw is dropped only if it self-hits
        assert all(2 <= c <= 3 for c in per_anchor.values())
        assert sum(per_anchor.values()) >= 40 * 3 - 40

    def test_deterministic(self, spark):
        from end_to_end_ml_spark.operators.similarity import negative_pairs

        df = spark.createDataFrame([(i,) for i in range(30)], ["vec_id"])
        a = {(r["anchor_id"], r["k_idx"], r["neg_id"]) for r in negative_pairs(df, "vec_id", 2).collect()}
        b = {(r["anchor_id"], r["k_idx"], r["neg_id"]) for r in negative_pairs(df, "vec_id", 2).collect()}
        assert a == b

    def test_validations(self, spark):
        from end_to_end_ml_spark.operators.similarity import negative_pairs

        df1 = spark.createDataFrame([(1,)], ["vec_id"])
        with pytest.raises(ValueError):
            negative_pairs(df1, "vec_id", k=0)
        with pytest.raises(ValueError):
            negative_pairs(df1, "vec_id", k=2)


class TestJoinCardinality:
    def test_matches_actual_join(self, spark):
        from end_to_end_ml_spark.operators.skew import join_cardinality

        a = spark.createDataFrame([(1,), (1,), (2,), (3,)], ["k"])
        b = spark.createDataFrame([(1,), (2,), (2,), (9,)], ["j"])
        r = join_cardinality(a, b, "k", "j").collect()[0]
        actual = a.join(b, a["k"] == b["j"]).count()
        assert int(r["join_rows"]) == actual == 4
        assert int(r["max_key_rows"]) == 2
        assert r["n_matching_keys"] == 2
        assert r["left_rows"] == 4 and r["right_rows"] == 4

    def test_disjoint_keys_zero(self, spark):
        from end_to_end_ml_spark.operators.skew import join_cardinality

        a = spark.createDataFrame([(1,)], ["k"])
        b = spark.createDataFrame([(2,)], ["j"])
        r = join_cardinality(a, b, "k", "j").collect()[0]
        assert int(r["join_rows"]) == 0 and int(r["max_key_rows"]) == 0


class TestNullGroupContracts:
    def test_temperature_sample_drops_null_groups(self, spark):
        from end_to_end_ml_spark.operators.split import temperature_sample

        rows = [(i, "a" if i < 40 else ("b" if i < 50 else None)) for i in range(60)]
        df = spark.createDataFrame(rows, ["pk", "grp"])
        kept = temperature_sample(df, "pk", "grp").collect()
        assert all(r["grp"] is not None for r in kept)
        # smallest NON-NULL group (b, 10 rows) keeps everything: null rows
        # must not have been counted as a pseudo-group that shrinks b
        assert sum(1 for r in kept if r["grp"] == "b") == 10

    def test_group_split_null_group_shares_fate(self, spark):
        from end_to_end_ml_spark.operators.split import group_split

        df = spark.createDataFrame(
            [(1, None), (2, None), (3, "g")], ["pk", "grp"]
        )
        out = group_split(df, "grp", 0.5).collect()
        null_sides = {r["split"] for r in out if r["grp"] is None}
        assert len(null_sides) == 1  # all null-group rows move together


class TestFeatureHash:
    def test_buckets_stable_and_null_passthrough(self, spark):
        from end_to_end_ml_spark.operators.prep import (
            feature_hash_audit,
            feature_hash_expr,
        )

        df = spark.createDataFrame(
            [("a",), ("a",), ("b",), (None,)], ["c"]
        )
        out = df.select("c", feature_hash_expr("c", 8).alias("b")).collect()
        by_v = {}
        for r in out:
            by_v.setdefault(r["c"], set()).add(r["b"])
        assert len(by_v["a"]) == 1 and list(by_v["a"])[0] is not None
        assert by_v[None] == {None}
        audit = feature_hash_audit(df, ["c"], n_buckets=8).collect()
        assert sum(r["n_rows"] for r in audit) == 3  # nulls excluded
        assert all(r["bucket"] is not None for r in audit)

    def test_collisions_reported(self, spark):
        from end_to_end_ml_spark.operators.prep import feature_hash_audit

        df = spark.createDataFrame([(f"v{i}",) for i in range(200)], ["c"])
        audit = feature_hash_audit(df, ["c"], n_buckets=4).collect()
        assert sum(r["n_values"] for r in audit) == 200
        assert max(r["n_values"] for r in audit) > 1  # pigeonhole


class TestBrierComponents:
    def test_matches_direct_quantized_brier(self, spark):
        from end_to_end_ml_spark.functions.metrics import brier_components

        rows = [(i, i % 2, ((i * 37) % 1024) / 1024.0) for i in range(500)]
        df = spark.createDataFrame(rows, ["pk", "label", "score"])
        r = brier_components(df, "label", "score").collect()[0]
        expect = sum(
            (round(s * 1024) - 1024 * y) ** 2 for _, y, s in rows
        )
        assert r["sum_sq_num"] == expect and r["n"] == 500
        brier = r["sum_sq_num"] / (r["n"] * r["scale"] ** 2)
        direct = sum((s - y) ** 2 for _, y, s in rows) / 500
        assert abs(brier - direct) < 1e-6  # quantization-level agreement


class TestNullValueContracts:
    def test_winsorize_bounds_ignore_nulls(self, spark):
        from end_to_end_ml_spark.operators.prep import winsorize

        rows = [(i, None) for i in range(10)] + [
            (100 + i, i + 1) for i in range(90)
        ]
        df = spark.createDataFrame(rows, "pk long, v long")
        out = {r["pk"]: r["v_w"] for r in winsorize(df, "v", "pk", 0.05, 0.95).collect()}
        ordered = list(range(1, 91))
        lo = ordered[int(0.05 * 89)]
        hi = ordered[int(0.95 * 89)]
        assert out[100] == lo          # below-lo value clamps UP (null lo would skip this)
        assert out[100 + 89] == hi
        assert all(out[i] is None for i in range(10))  # nulls pass through as null

    def test_quantile_uniform_drops_nulls_and_stays_uniform(self, spark):
        from end_to_end_ml_spark.operators.prep import quantile_uniform

        rows = [(0, None)] + [(i, i) for i in range(1, 6)]
        df = spark.createDataFrame(rows, "pk long, v long")
        out = quantile_uniform(df, "v", "pk").collect()
        assert {r["pk"] for r in out} == {1, 2, 3, 4, 5}
        qs = sorted(r["v_q"] for r in out)
        assert qs == [0.0, 0.25, 0.5, 0.75, 1.0]
