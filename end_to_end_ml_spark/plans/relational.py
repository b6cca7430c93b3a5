"""Composed relational plans over the synthetic star schema — the engine's
general query surface (scan → filter → join → aggregate → window → top-k),
exercising the operators the reference uses implicitly (projection pushdown,
equi/semi joins, groupBy aggregation, ranking).

Determinism for oracle checks: monetary aggregates are summed as DECIMAL
(exact, order-independent — a float sum's value depends on partition merge
order) and presented as DOUBLE. This matches how TPC-H itself specifies
money columns and makes results bit-identical across engines.

Scale notes:
- Dimension joins (region/nation/supplier/customer vs lineitem) are
  broadcast: the small side is < spark.sql.autoBroadcastJoinThreshold at any
  SF since dims grow far slower than facts. No shuffle of the fact table for
  q3/q5-style plans beyond the required agg shuffle.
- Aggregations rely on partial (map-side) aggregation; group key cardinality
  is tiny vs input, so the reduce shuffle is negligible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources import load_table

DEC = "decimal(20,4)"


def q1_pricing_summary(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem (scan + 8-agg groupBy)."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    tax = F.col("l_tax").cast(DEC)
    qty = F.col("l_quantity").cast(DEC)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (1 - disc)).cast("decimal(27,4)").cast("double").alias("sum_disc_price"),
            F.sum(price * (1 - disc) * (1 + tax)).cast("decimal(27,4)").cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(disc).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_top_unshipped_orders(spark, sf_dir: str, segment: str = "BUILDING", k: int = 10) -> DataFrame:
    """TPC-H Q3-style: 3-way join + revenue agg + top-k. Customer filter is a
    broadcast semi-side; lineitem shuffles once on l_orderkey."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == segment)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1995-03-15").cast("timestamp")
    revenue = F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))
    # broadcast ONLY the customer dim: orders is a fact table (grows with SF)
    # and must stay shuffle-joined; Catalyst/AQE picks the strategy for it.
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(
            orders.filter(F.col("o_orderdate") < cutoff).join(
                F.broadcast(cust), orders.o_custkey == cust.c_custkey
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("decimal(27,4)").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(k)
    )


def q4_order_priority(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: EXISTS → left-semi join, then priority counts."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.select("l_orderkey").distinct()
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q5_supplier_volume(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: fact table joined to a fully-broadcast dimension chain
    (supplier→nation→region), revenue per nation."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dims = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    revenue = F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))
    return (
        li.join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(revenue).cast("decimal(27,4)").cast("double").alias("revenue"))
        .orderBy("r_name", "n_name")
    )


def top_parts_by_price(spark, sf_dir: str, k: int = 10) -> DataFrame:
    """W1: top-k with keep-all tie semantics (rank() <= k, like
    Series.nlargest(keep='all')).

    Scale-safe plan — a bare ``rank() OVER (ORDER BY price DESC)`` funnels
    the WHOLE table through one WindowExec partition. Instead:

    1. Find the k-th price with ``orderBy desc → limit(k) → min``: Spark
       plans the sort-limit as TakeOrderedAndProject (per-partition top-k,
       merge k rows per partition on the driver) — no global sort, and the
       scan reads only the price column. The scalar collect is a k-row
       fold, the repo's accepted pattern for tiny aggregates.
    2. Filter ``p_retailprice >= kth`` as a LITERAL predicate — pushed into
       the parquet scan (min/max row-group pruning skips almost the whole
       table at 100 TB).
    3. Rank only the survivors (≥ k rows + ties at the k-th price): the
       unpartitioned window now sees O(k) rows, not N.

    Identical keep-all tie semantics: every row with price above the k-th
    survives the filter, so ranks ≤ k are unchanged."""
    part = load_table(spark, sf_dir, "part")
    kth = (
        part.select("p_retailprice")
        .orderBy(F.col("p_retailprice").desc())
        .limit(k)
        .agg(F.min("p_retailprice").alias("kth"))
        .collect()[0]["kth"]
    )
    if kth is None:  # empty table: no rows can rank
        survivors = part.filter(F.lit(False))
    else:
        survivors = part.filter(F.col("p_retailprice") >= F.lit(kth))
    w = Window.orderBy(F.col("p_retailprice").desc())
    return (
        survivors.withColumn("price_rank", F.rank().over(w))
        .filter(F.col("price_rank") <= k)
        .select("p_partkey", "p_name", "p_retailprice", "price_rank")
        .orderBy("price_rank", "p_partkey")
    )


def customer_running_totals(spark, sf_dir: str) -> DataFrame:
    """W4-style running sums: per-customer cumulative order value over time.
    Deterministic order (date, then PK); decimal running sum is exact."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_total"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


def latest_order_per_customer(spark, sf_dir: str) -> DataFrame:
    """P6 applied to the star schema: keep-last dedup of orders by customer
    (latest o_orderdate, PK tie-break)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        orders.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .orderBy("o_custkey")
    )


def q10_returned_items(spark, sf_dir: str, k: int = 20) -> DataFrame:
    """TPC-H Q10-style: top-k customers by revenue lost to returns in a
    quarter. Plan shape for 100 TB: the date predicate is pushed into the
    orders scan (row-group pruning), lineitem⋈orders and orders⋈customer
    shuffle on their keys (both sides grow with SF — AQE picks the
    strategy), and only the tiny nation dim is broadcast. The top-k is a
    TakeOrderedAndProject — no global sort materialization."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    lo = F.lit("1995-10-01").cast("timestamp")
    hi = F.lit("1996-01-01").cast("timestamp")
    revenue = F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue).cast("decimal(27,4)").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(k)
    )


def q6_forecast_revenue(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure scan-filter-aggregate — every predicate reaches
    the parquet reader (PushedFilters), no shuffle at all beyond the final
    single-row agg. The canonical 'is pushdown working' probe."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC)
            )
            .cast("decimal(27,4)")
            .cast("double")
            .alias("revenue")
        )
    )


def q14_promo_revenue(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: promo revenue share. part is a broadcast dim; the
    conditional aggregation is one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC)))
                .cast("decimal(27,4)")
                .cast("double")
                / F.sum(rev).cast("decimal(27,4)").cast("double")
            ).alias("promo_revenue_pct")
        )
    )


def q18_large_volume_customers(spark, sf_dir: str, qty_threshold: int = 250, k: int = 20) -> DataFrame:
    """TPC-H Q18-style: orders whose total quantity exceeds the threshold,
    with customer context. The HAVING subquery aggregates lineitem FIRST
    (map-side partial agg shrinks 4B rows/TB to one row per qualifying
    order) and only then joins — never the reverse."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("__sq"))
        .filter(F.col("__sq") > qty_threshold)
        .select("l_orderkey", F.col("__sq").cast("double").alias("sum_qty"))
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(k)
    )


def q7_volume_shipping(
    spark, sf_dir: str, nation_a: str = "NATION_1", nation_b: str = "NATION_2"
) -> DataFrame:
    """TPC-H Q7-style: bilateral shipping volume between two nations by year.
    Five-table join where BOTH nation lookups broadcast; the OR'd nation-pair
    predicate is applied after the equi-joins (Catalyst pushes the IN-list
    halves into each broadcast build side), so the fact table shuffles only
    for the final small groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin(nation_a, nation_b))
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin(nation_a, nation_b))
    revenue = F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(revenue).cast("decimal(27,4)").cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q12_late_shipments(spark, sf_dir: str, late_days: int = 60) -> DataFrame:
    """TPC-H Q12-style: shipping-delay audit — per order priority, how many
    lineitems shipped, and how many shipped more than ``late_days`` after
    the order date, split into a high/low-priority severity count (the
    Q12 CASE-aggregation shape; the testdata schema has no l_shipmode, so
    priority plays the grouping role).

    Plan: lineitem⋈orders is the only shuffle (both sides big, equi-key);
    the CASE counts are one aggregation pass with map-side combine —
    integers only, oracle-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(late.cast("long")).alias("n_late"),
            F.sum((late & high).cast("long")).alias("n_late_high"),
            F.sum((late & ~high).cast("long")).alias("n_late_low"),
        )
        .orderBy("o_orderpriority")
    )


def q13_customer_order_distribution(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count, INCLUDING
    zero-order customers (the left join is the point of the query).

    Plan: orders pre-aggregates to one row per customer BEFORE the join
    (map-side combine collapses the fact table), the left join fills the
    zero bucket, and the second aggregation is over |distinct counts|
    rows — tiny. Never joins raw orders onto customer."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    per_cust = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("__n"))
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("__n"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q17_small_quantity_revenue(spark, sf_dir: str, brand: str = "Brand#23") -> DataFrame:
    """TPC-H Q17-style: revenue locked in small-quantity orders of one
    brand's parts — lineitems whose quantity is below 20% of that part's
    average order quantity.

    The threshold predicate is kept EXACT across engines by clearing the
    division: qty < 0.2 * (s/n)  ⇔  5 * qty * n < s, all decimal/integer
    arithmetic (an avg-as-double would make boundary rows engine-dependent).

    Plan: per-part averages come from a groupBy on the lineitem side
    FIRST (partial agg), the part dim filters by brand and broadcasts,
    and the per-part threshold table broadcast-joins back — the fact
    table is scanned once and never shuffled on anything but l_partkey."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    branded = part.filter(F.col("p_brand") == brand).select("p_partkey")
    per_part = (
        li.join(F.broadcast(branded), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).alias("__s"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    qualifying = (
        li.join(
            F.broadcast(per_part.withColumnRenamed("l_partkey", "__pk")),
            F.col("l_partkey") == F.col("__pk"),
        )
        .filter(
            F.lit(5) * F.col("l_quantity").cast(DEC) * F.col("__n") < F.col("__s")
        )
    )
    return qualifying.agg(
        (
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("decimal(27,4)").cast("double")
            / F.lit(7.0)
        ).alias("avg_yearly")
    )


def q19_disjunctive_revenue(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style: revenue under an OR-of-ANDs predicate over three
    (brand, size range, quantity range) triples — the classic disjunctive
    pushdown test: Catalyst must split the OR across the part (brand,
    size) and lineitem (quantity) sides rather than evaluating it post-
    join on the cross of both tables.

    Plan: part pre-filters to the union of the three brand/size windows
    (pushed to its scan) and broadcasts; the residual OR runs as the join
    condition's filter."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    arm = lambda b, s_lo, s_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == b)
        & F.col("p_size").between(s_lo, s_hi)
        & qty.between(q_lo, q_hi)
    )
    pred = (
        arm("Brand#12", 1, 5, 1, 11)
        | arm("Brand#23", 1, 10, 10, 20)
        | arm("Brand#34", 1, 15, 20, 30)
    )
    part_side = part.filter(
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15))
    ).select("p_partkey", "p_brand", "p_size")
    rev = F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))
    return (
        li.join(F.broadcast(part_side), F.col("l_partkey") == F.col("p_partkey"))
        .filter(pred)
        .agg(F.sum(rev).cast("decimal(27,4)").cast("double").alias("revenue"))
    )


def q22_idle_balances(spark, sf_dir: str, since: str = "1998-01-01") -> DataFrame:
    """TPC-H Q22-style: positive-balance customers with no RECENT orders
    (none since ``since``) whose balance beats the positive-balance
    average, grouped by nation (the schema has no phone country code, so
    c_nationkey plays that role; and nearly every synthetic customer has
    SOME order, so the lapsed-since predicate keeps the anti-join
    non-vacuous — 3 qualifying customers at sf0.01, 30 at sf0.1).

    The global-average threshold stays engine-exact by clearing the
    division (bal * n > s over decimals); the no-orders condition is a
    LEFT ANTI join (never a NOT IN that scans orders per row).

    Plan: the (s, n) scalar aggregate broadcasts; customer anti-joins
    orders' distinct custkeys; one final small groupBy on nation."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    pos = cust.filter(F.col("c_acctbal") > 0)
    thresh = pos.agg(
        F.sum(F.col("c_acctbal").cast(DEC)).alias("__s"),
        F.count(F.lit(1)).alias("__n"),
    )
    return (
        pos.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal").cast(DEC) * F.col("__n") > F.col("__s"))
        .join(
            orders.filter(
                F.col("o_orderdate") >= F.lit(since).cast("timestamp")
            ).select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def q8_market_share(
    spark, sf_dir: str, nation: str = "BRAZIL", region: str = "AMERICA"
) -> DataFrame:
    """TPC-H Q8-style: one supplier nation's share of a region's order
    revenue per year. Share = conditional-sum / sum in ONE aggregation
    pass; both numerator and denominator are exact decimal sums, so the
    final division is a single engine-stable float op.

    Plan: lineitem joins orders (shuffle, both grow with SF), everything
    else — customer's nation→region chain and supplier's nation — is a
    broadcast dim. The nation-match flag is computed BEFORE aggregation,
    so no second pass and no self-join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    cust_region = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(
            F.broadcast(reg.filter(F.col("r_name") == region)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nation = supp.join(
        F.broadcast(nat.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
        supp.s_nationkey == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    rev = F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_region), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == nation, rev).otherwise(F.lit(0).cast(DEC)))
                .cast("decimal(27,4)")
                .cast("double")
                / F.sum(rev).cast("decimal(27,4)").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q15_top_supplier(spark, sf_dir: str, quarter_start: str = "1996-01-01") -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum revenue in a quarter —
    keep-all tie semantics via an exact-decimal equality against the max
    (floats would make the tie engine-dependent; decimals make it exact).

    Plan: one filtered pass over lineitem pre-aggregates per supplier
    (map-side combine), the 1-row max broadcasts back, and the supplier
    dim broadcast-joins for names — the fact table is never scanned
    twice."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    lo = F.lit(quarter_start).cast("timestamp")
    hi = F.add_months(F.lit(quarter_start).cast("date"), 3).cast("timestamp")
    rev = F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))
    per_supp = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_suppkey")
        .agg(F.sum(rev).cast("decimal(27,4)").alias("__rev"))
    )
    mx = per_supp.agg(F.max("__rev").alias("__mx"))
    return (
        per_supp.crossJoin(F.broadcast(mx))
        .filter(F.col("__rev") == F.col("__mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("__rev").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def q2_min_cost_supplier(
    spark, sf_dir: str, p_type: str = "ECONOMY", min_size: int = 25, k: int = 100
) -> DataFrame:
    """TPC-H Q2-style correlated-min subquery: for each qualifying part,
    the supplier(s) offering the minimum observed price (min
    l_extendedprice stands in for ps_supplycost — the synthetic schema
    has no partsupp table; lineitem is the part↔supplier relation).
    Reference parity: the classic "WHERE cost = (SELECT min(cost) ...
    correlated on partkey)" shape, decorrelated by hand into a per-key
    min + equi-join — exactly what Catalyst does to the SQL form.

    Exactness: the kept metric is a bare ``min`` over doubles (order
    independent, no float accumulation), so the min-equality tie
    semantics are engine-identical: EVERY supplier at the per-part min
    survives, both here and in the DuckDB oracle.

    Plan at scale: two groupBy passes over (partkey, suppkey) — the
    second reuses the first's shuffle partitioning (partkey is a prefix
    of the first's keys, Catalyst plans no second exchange of the big
    side). part and supplier⋈nation are broadcast dims. ORDER BY is
    total (acctbal desc, then PKs) so LIMIT is deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == p_type) & (F.col("p_size") >= min_size)
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("supply_cost")
    )
    min_cost = cost.groupBy("l_partkey").agg(
        F.min("supply_cost").alias("__min_cost")
    ).withColumnRenamed("l_partkey", "__mk")
    sn = supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    return (
        cost.join(
            min_cost,
            (F.col("l_partkey") == F.col("__mk"))
            & (F.col("supply_cost") == F.col("__min_cost")),
        )
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(k)
    )


def q9_product_profit(spark, sf_dir: str, name_like: str = "bolt") -> DataFrame:
    """TPC-H Q9-style product-profit rollup: revenue on parts whose name
    contains a token, by supplier nation and order year. The synthetic
    schema has no ps_supplycost, so profit = discounted revenue (the
    5-way join shape — lineitem ⋈ orders ⋈ part ⋈ supplier ⋈ nation —
    is the point, not the cost subtraction).

    Plan at scale: lineitem⋈orders is the only fact-fact shuffle (on
    orderkey); part (substring-filtered — pushed to the scan) and
    supplier⋈nation broadcast. Group keys (nation, year) are tiny, so
    partial aggregation collapses the map side before the final
    exchange. Decimal sums keep the oracle hash exact."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains(name_like))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    sn = supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    amount = F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))
    return (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_semi")
        .join(orders.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(sn.select("s_suppkey", "n_name")), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("decimal(27,4)").cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q11_important_parts(
    spark, sf_dir: str, nation: str = "NATION_3", fraction: float = 0.002
) -> DataFrame:
    """TPC-H Q11-style scalar-subquery HAVING: parts whose traded value
    through one nation's suppliers exceeds ``fraction`` of that nation's
    total — the "HAVING sum(v) > (SELECT sum(v) * f FROM ...)" shape.

    Exactness: the threshold comparison is cleared of division AND of
    float multiplication — ``value * 10000 > total * (f * 10000)`` stays
    in decimal × integer arithmetic, so the boundary rows are
    engine-identical (a float threshold would make ties flap).

    Plan at scale: ONE filtered pass over lineitem pre-aggregates per
    partkey; the grand total derives from re-aggregating that SMALL
    per-part frame (not a second fact scan) and broadcasts back as a
    1-row cross join."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == nation)
    nsupp = supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
    value = F.col("l_extendedprice").cast(DEC)
    per_part = (
        li.join(F.broadcast(nsupp.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(value).cast("decimal(27,4)").alias("__value"))
    )
    total = per_part.agg(F.sum("__value").cast("decimal(38,4)").alias("__total"))
    scaled = int(round(fraction * 10000))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("__value") * 10000 > F.col("__total") * scaled)
        .select("l_partkey", F.col("__value").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), "l_partkey")
    )


def q16_supplier_counts(
    spark, sf_dir: str, excl_brand: str = "Brand#9", max_size: int = 25
) -> DataFrame:
    """TPC-H Q16-style NOT-IN + COUNT DISTINCT: distinct supplier count
    per (brand, type, size) bucket, excluding one brand and blacklisted
    suppliers (negative balance stands in for the 'Customer Complaints'
    comment filter). The NOT IN becomes a LEFT ANTI join — never a
    per-row subquery scan. lineitem is the part↔supplier relation.

    Plan at scale: the blacklist is a tiny broadcast anti-join applied
    BEFORE the expensive distinct; (part,supp) pairs dedupe in the same
    shuffle that feeds the count-distinct re-key; part attrs broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != excl_brand) & (F.col("p_size") <= max_size)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    pairs = (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .distinct()
    )
    return (
        pairs.join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


def q21_sole_failing_supplier(
    spark, sf_dir: str, nation: str = "NATION_3", k: int = 50
) -> DataFrame:
    """TPC-H Q21-style double-correlated EXISTS / NOT EXISTS self-join:
    suppliers in one nation who were the ONLY supplier with returned
    ('R') lines on a finished multi-supplier order — EXISTS(other
    supplier on the order) AND NOT EXISTS(other supplier who also
    returned). The schema has no commit/receipt dates, so returnflag
    plays the "kept waiting" role; the plan shape (semi-join + anti-join
    against the same fact table on the same key) is the point.

    Plan at scale: both the EXISTS and NOT-EXISTS sides shuffle on
    l_orderkey — the SAME key as the probe side, so AQE coalesces into
    co-partitioned sort-merge joins with the non-equi suppkey<>suppkey
    residual as a post-join filter. The nation's supplier set and orders
    status filter reduce the probe side before any self-join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == nation)
    nsupp = supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey).select(
        "s_suppkey", "s_name"
    )
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(nsupp), li.l_suppkey == F.col("s_suppkey"))
        .join(orders.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .select("l_orderkey", "l_suppkey", "s_name")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    return (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(k)
    )
