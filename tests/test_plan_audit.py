"""Plan-shape regression guard: every relational headline query must keep the
physical-plan properties the 100 TB design depends on — no cartesian
products, no row-at-a-time Python in relational plans, filters pushed into
the parquet scans that have them."""

from __future__ import annotations

import pytest

from end_to_end_ml_spark.plans.entry_queries import REGISTRY

SF = "/root/testdata/sf0.001"

RELATIONAL = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q4_order_priority",
    "q5_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_volume_customers",
    "w4_running_total",
    "w5_topk_per_group",
    "p6_latest_order_per_customer",
    "t1_stratified_split",
    "s3_pit_join",
    "a6_roc_auc",
    "a8_auc_ovr_macro",
    "a12_roc_curve",
    "m8_threshold_sweep",
    "agg_rollup",
    "agg_cube",
    "j5_customers_without_orders",
    "skew1_salted_join_agg",
]

# queries whose filters should reach the parquet reader
PUSHDOWN_PROBES = {
    "q1_pricing_summary": "LessThanOrEqual(l_shipdate",
    "q6_forecast_revenue": "IsNotNull(l_quantity)",
    "q10_returned_items": "EqualTo(l_returnflag,R)",
}


def _plan(spark, name: str) -> str:
    df = REGISTRY[name][0](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", RELATIONAL)
def test_no_cartesian_or_python_row_udf(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan  # row-at-a-time Python UDF


@pytest.mark.parametrize("name", sorted(PUSHDOWN_PROBES))
def test_filters_reach_the_scan(spark, name):
    plan = _plan(spark, name)
    assert PUSHDOWN_PROBES[name] in plan, plan
