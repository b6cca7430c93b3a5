"""Unit tests for prep operators — mirrors the reference's
tests/test_feature/test_data_preprocessor.py behaviors (keep-last dedup,
token normalization, type enforcement, step ordering)."""

from __future__ import annotations

import pytest

from end_to_end_ml_spark.operators import prep


def test_blanks_to_null(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("  ", "y"), ("", "z"), ("b", " \t ")], ["c1", "c2"]
    )
    out = prep.blanks_to_null(df).collect()
    assert [r["c1"] for r in out] == ["a", None, None, "b"]
    assert [r["c2"] for r in out] == ["x", "y", "z", None]


def test_normalize_missing_tokens(spark):
    df = spark.createDataFrame(
        [("<NA>",), ("null",), ("?",), ("N/A",), ("nan",), ("ok",)], ["c"]
    )
    out = prep.normalize_missing_tokens(df).collect()
    assert [r["c"] for r in out] == [None] * 5 + ["ok"]


def test_dedup_keep_last(spark):
    df = spark.createDataFrame(
        [(1, 10, "old"), (1, 20, "new"), (2, 5, "only")], ["pk", "ts", "v"]
    )
    out = {r["pk"]: r["v"] for r in prep.dedup_keep_last(df, ["pk"], "ts").collect()}
    assert out == {1: "new", 2: "only"}


def test_validate_no_duplicates_raises(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a")], ["pk", "v"])
    with pytest.raises(ValueError, match="duplicate"):
        prep.validate_no_duplicates(df, ["pk"])


def test_validate_no_duplicates_pk_only(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b")], ["pk", "v"])
    with pytest.raises(ValueError, match="primary key"):
        prep.validate_no_duplicates(df, ["pk"])


def test_enforce_types_coerce(spark):
    df = spark.createDataFrame(
        [("2024-01-01", "1.5", 7), ("not-a-date", "2.5", 8)], ["d", "n", "c"]
    )
    out = prep.enforce_types(
        df, numeric_cols=["n"], categorical_cols=["c"], date_cols=["d"]
    )
    types = dict(out.dtypes)
    assert types == {"d": "timestamp", "n": "float", "c": "string"}
    rows = out.collect()
    assert rows[0]["d"] is not None and rows[1]["d"] is None  # coerce → null


def test_null_fraction_audit(spark):
    df = spark.createDataFrame([(1, None), (2, "x"), (None, None)], "a int, b string")
    out = {r["column_name"]: r["null_fraction"] for r in prep.null_fraction_audit(df).collect()}
    assert out["a"] == pytest.approx(1 / 3)
    assert out["b"] == pytest.approx(2 / 3)


def test_high_null_columns(spark):
    df = spark.createDataFrame([(1, None), (2, None), (3, "x")], "a int, b string")
    assert prep.high_null_columns(df, threshold=0.5) == ["b"]


def test_recode_values_passthrough(spark):
    df = spark.createDataFrame([("1",), ("2",), ("9",)], ["g"])
    out = prep.recode_values(df, "g", {"1": "Poor", "2": "Fair"}).collect()
    assert [r["g"] for r in out] == ["Poor", "Fair", "9"]  # unmapped passes through


def test_sanitize_column_names(spark):
    df = spark.createDataFrame([(1, 2)], ["a col!", "b(c)"])
    assert prep.sanitize_column_names(df).columns == ["a_col_", "b_c_"]


def test_prep_pipeline_order_and_insert(spark):
    df = spark.createDataFrame([(" ",), ("null",)], ["c"])
    pipe = prep.PrepPipeline([lambda d: prep.normalize_missing_tokens(d)])
    pipe.add_step(lambda d: prep.blanks_to_null(d), position=0)
    out = pipe.run(df).collect()
    assert [r["c"] for r in out] == [None, None]


def test_validate_request_schema():
    from end_to_end_ml_spark.operators.prep import validate_request_schema

    expected = ["BMI", "Age", "Smoker"]
    ok = validate_request_schema(expected, {"BMI": 1, "Age": 2, "Smoker": 0, "ID": 9}, pk_col="ID")
    assert ok == {"missing": [], "unexpected": []}
    bad = validate_request_schema(expected, {"BMI": 1, "Extra": 5})
    assert bad["missing"] == ["Age", "Smoker"]
    assert bad["unexpected"] == ["Extra"]
