"""Expectations gate (operators/expect.py) and incremental aggregate
maintenance (operators/merge.py agg_snapshot/merge_agg_snapshots)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_ml_spark.operators.expect import Check, enforce
from end_to_end_ml_spark.operators.merge import agg_snapshot, merge_agg_snapshots


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", None), (3, "zz", 5.0)],
        ["id", "cat", "v"],
    )


class TestCheck:
    def test_report_values(self, spark, frame):
        rep = {
            r["expectation"]: r
            for r in (
                Check()
                .row_count_min(3)
                .unique_key("id")
                .null_frac_max("v", 0.5)
                .value_min("v", 0)
                .value_max("v", 15)
                .accepted_values("cat", ["a", "b"])
                .run(frame)
                .collect()
            )
        }
        assert rep["row_count>=3"].passed and rep["row_count>=3"].measured == 4.0
        assert not rep["unique(id)"].passed and rep["unique(id)"].measured == 1.0
        assert rep["null_frac(v)<=0.5"].passed and rep["null_frac(v)<=0.5"].measured == 0.25
        assert rep["min(v)>=0"].passed
        assert not rep["max(v)<=15"].passed and rep["max(v)<=15"].measured == 20.0
        assert not rep["accepted_values(cat)"].passed
        assert rep["accepted_values(cat)"].measured == 1.0  # only 'zz'; null-tolerant

    def test_single_pass_plan(self, spark, frame):
        """All expectations must come from ONE aggregate over ONE scan."""
        rep = Check().row_count_min(1).value_min("v", 0).null_frac_max("v", 1).run(frame)
        plan = rep._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan ") <= 1, plan

    def test_enforce_raises_with_names(self, spark, frame):
        rep = Check().row_count_min(100).unique_key("id").run(frame)
        with pytest.raises(ValueError, match="row_count>=100"):
            enforce(rep)
        enforce(Check().row_count_min(1).run(frame))  # passing gate: no raise

    def test_empty_check_raises(self, spark, frame):
        with pytest.raises(ValueError):
            Check().run(frame)


class TestIncrementalAgg:
    SPECS = {
        "n": ("count", "v"),
        "s": ("sum", "id"),
        "lo": ("min", "v"),
        "hi": ("max", "v"),
    }

    def test_merge_equals_full(self, spark):
        rows = [(i % 7, i, float((i * 13) % 50)) for i in range(200)]
        df = spark.createDataFrame(rows, ["k", "id", "v"])
        full = agg_snapshot(df, ["k"], self.SPECS)
        base = agg_snapshot(df.filter(F.col("id") < 120), ["k"], self.SPECS)
        delta = agg_snapshot(df.filter(F.col("id") >= 120), ["k"], self.SPECS)
        merged = merge_agg_snapshots(base, delta, ["k"], self.SPECS)
        a = {r["k"]: (r["n"], r["s"], r["lo"], r["hi"]) for r in full.collect()}
        b = {r["k"]: (r["n"], r["s"], r["lo"], r["hi"]) for r in merged.collect()}
        assert a == b

    def test_new_and_untouched_keys_pass_through(self, spark):
        base = agg_snapshot(
            spark.createDataFrame([(1, 1, 1.0)], ["k", "id", "v"]), ["k"], self.SPECS
        )
        delta = agg_snapshot(
            spark.createDataFrame([(2, 5, 9.0)], ["k", "id", "v"]), ["k"], self.SPECS
        )
        out = {r["k"]: r for r in merge_agg_snapshots(base, delta, ["k"], self.SPECS).collect()}
        assert out[1]["n"] == 1 and out[1]["s"] == 1
        assert out[2]["n"] == 1 and out[2]["s"] == 5 and out[2]["hi"] == 9.0

    def test_associativity(self, spark):
        parts = [
            spark.createDataFrame(
                [(i % 3, i, float(i)) for i in range(lo, hi)], ["k", "id", "v"]
            )
            for lo, hi in [(0, 30), (30, 80), (80, 100)]
        ]
        snaps = [agg_snapshot(p, ["k"], self.SPECS) for p in parts]
        left = merge_agg_snapshots(
            merge_agg_snapshots(snaps[0], snaps[1], ["k"], self.SPECS),
            snaps[2], ["k"], self.SPECS,
        )
        right = merge_agg_snapshots(
            snaps[0],
            merge_agg_snapshots(snaps[1], snaps[2], ["k"], self.SPECS),
            ["k"], self.SPECS,
        )
        key = lambda rs: {r["k"]: (r["n"], r["s"], r["lo"], r["hi"]) for r in rs}
        assert key(left.collect()) == key(right.collect())

    def test_bad_agg_name_raises(self, spark):
        df = spark.createDataFrame([(1, 1, 1.0)], ["k", "id", "v"])
        with pytest.raises(ValueError):
            agg_snapshot(df, ["k"], {"m": ("median", "v")})


class TestDiffSnapshots:
    def test_all_change_classes(self, spark):
        from end_to_end_ml_spark.operators.merge import diff_snapshots

        old = spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None)], ["k", "s", "v"]
        )
        new = spark.createDataFrame(
            [(2, "b", 2.0), (3, "c", 9.0), (4, "d", 4.0)], ["k", "s", "v"]
        )
        out = {r["k"]: r["change"] for r in diff_snapshots(old, new, ["k"]).collect()}
        # 1 removed, 2 unchanged (absent), 3 changed (None -> 9.0), 4 added
        assert out == {1: "removed", 3: "changed", 4: "added"}

    def test_null_vs_nul_byte_distinguished(self, spark):
        from end_to_end_ml_spark.operators.merge import diff_snapshots

        old = spark.createDataFrame([(1, None)], "k INT, v STRING")
        new = spark.createDataFrame([(1, "\x00")], "k INT, v STRING")
        # the injective per-column encoding (NULL marker vs V+md5) must
        # tell NULL apart from any literal value, including a NUL byte
        out = {r["k"]: r["change"] for r in diff_snapshots(old, new, ["k"]).collect()}
        assert out == {1: "changed"}

    def test_separator_in_value_injective(self, spark):
        from end_to_end_ml_spark.operators.merge import diff_snapshots

        # under the old concat_ws('\x1f') encoding these two rows produced
        # the SAME byte string ('x' + sep + 'y' + sep + 'z') and the change
        # was silently dropped; per-column hashing makes the encoding
        # injective
        old = spark.createDataFrame([(1, "x\x1fy", "z")], "k INT, a STRING, b STRING")
        new = spark.createDataFrame([(1, "x", "y\x1fz")], "k INT, a STRING, b STRING")
        out = {r["k"]: r["change"] for r in diff_snapshots(old, new, ["k"]).collect()}
        assert out == {1: "changed"}


def test_empty_input_fails_range_gates(spark):
    """Range expectations over an EMPTY frame must FAIL (null measure ->
    passed=False), not vanish into three-valued-NULL truth."""
    empty = spark.createDataFrame([], "id INT, v DOUBLE")
    rep = {
        r["expectation"]: r
        for r in (
            Check().row_count_min(1).value_min("v", 0).value_max("v", 10).run(empty)
        ).collect()
    }
    assert not rep["row_count>=1"].passed
    assert not rep["min(v)>=0"].passed and rep["min(v)>=0"].measured is None
    assert not rep["max(v)<=10"].passed


def test_diff_snapshots_all_key_columns_raises(spark):
    """Every column a key -> no compare columns: explicit ValueError, not
    an opaque F.concat() failure (r6 advisory)."""
    import pytest

    from end_to_end_ml_spark.operators.merge import diff_snapshots

    df = spark.createDataFrame([(1, "a")], ["k1", "k2"])
    with pytest.raises(ValueError, match="no compare columns"):
        diff_snapshots(df, df, ["k1", "k2"])
