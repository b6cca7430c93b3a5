"""Declarative data-quality expectations, evaluated in ONE aggregation pass.

The Deequ/Great-Expectations-shaped gate a training pipeline runs before it
trusts an input: row volume, null fractions, key uniqueness, value ranges,
categorical domains. Every registered expectation contributes its measure to
a SINGLE global aggregate over the frame — one scan, partial-agg map-side,
one 1-row shuffle — and the report is a tiny (expectation, measured, passed)
frame derived from that row. At 100 TB the one-pass property is the point:
k expectations cost one read, not k.

The report stays a DataFrame plan end-to-end (agg → struct array → explode),
so it is oracle-checkable and composes with sinks/alerting like any other
query. Gate behavior (raise on failure) is the caller's 3-row collect.

Reference analogue: the reference validates inputs imperatively per-step
(duplicate checks, schema checks — SURVEY §2 P5/P12); this is the batched
declarative form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Check:
    """Fluent expectation builder; ``run(df)`` returns the report frame."""

    def __init__(self) -> None:
        # list of (name, measure_builder() -> Column, pass_predicate(measured) -> Column)
        self._exps: list[tuple[str, Column, object]] = []

    def _add(self, name: str, measure: Column, pred) -> "Check":
        self._exps.append((name, measure, pred))
        return self

    def row_count_min(self, n: int) -> "Check":
        return self._add(
            f"row_count>={n}", F.count(F.lit(1)), lambda m: m >= n
        )

    def null_frac_max(self, col: str, frac: float) -> "Check":
        nulls = F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
        return self._add(
            f"null_frac({col})<={frac}",
            nulls / F.count(F.lit(1)),
            lambda m: m <= frac,
        )

    def unique_key(self, *cols: str) -> "Check":
        dupes = F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols])
        return self._add(
            f"unique({','.join(cols)})", dupes, lambda m: m == 0
        )

    def value_min(self, col: str, lo) -> "Check":
        return self._add(f"min({col})>={lo}", F.min(col), lambda m: m >= lo)

    def value_max(self, col: str, hi) -> "Check":
        return self._add(f"max({col})<={hi}", F.max(col), lambda m: m <= hi)

    def accepted_values(self, col: str, values: list) -> "Check":
        bad = F.sum(
            F.when(F.col(col).isin(values) | F.col(col).isNull(), 0).otherwise(1)
        )
        return self._add(
            f"accepted_values({col})", bad, lambda m: m == 0
        )

    def run(self, df: DataFrame) -> DataFrame:
        """One aggregation pass → (expectation, measured DOUBLE, passed)."""
        if not self._exps:
            raise ValueError("no expectations registered")
        aggs = [
            m.cast("double").alias(f"__m{i}")
            for i, (_, m, _p) in enumerate(self._exps)
        ]
        agg = df.agg(*aggs)
        rows = F.array(
            *[
                F.struct(
                    F.lit(name).alias("expectation"),
                    F.col(f"__m{i}").alias("measured"),
                    # NULL measure (min/max over an EMPTY frame) must fail,
                    # not vanish: a three-valued NULL `passed` would slip
                    # through enforce()'s ~passed filter and an empty input
                    # would silently clear every range gate
                    F.coalesce(pred(F.col(f"__m{i}")), F.lit(False)).alias(
                        "passed"
                    ),
                )
                for i, (name, _m, pred) in enumerate(self._exps)
            ]
        )
        return agg.select(F.explode(rows).alias("r")).select(
            "r.expectation", "r.measured", "r.passed"
        )


def enforce(report: DataFrame) -> None:
    """Gate: raise ValueError listing every failed expectation (the
    report is k rows — this collect is the alerting edge, not data
    movement)."""
    failed = [r["expectation"] for r in report.filter(~F.col("passed")).collect()]
    if failed:
        raise ValueError(f"data-quality expectations failed: {failed}")
