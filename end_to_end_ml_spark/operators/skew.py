"""Skew-handling operators for 100 TB shuffles.

Spark already handles two big classes of skew without help:
- algebraic aggregations (sum/count/avg/min/max) do map-side partial
  aggregation, so a skewed groupBy key never concentrates raw rows;
- AQE splits oversized shuffle partitions for sort-merge joins
  (``spark.sql.adaptive.skewJoin.enabled``, on in our session factory).

What still needs manual treatment:
- **skewed joins where AQE can't help** (e.g. the skewed side feeds other
  operators that pin the partitioning, or broadcast is impossible because
  the dim side is mid-sized): salt the fact side, replicate the dim side;
- **holistic aggregations** (collect_list/collect_set/percentile over a hot
  key): two-stage salt → merge.

Both transforms are *plan rewrites that preserve semantics exactly*, so they
are DuckDB-oracle-checkable — the salted plan must produce bit-identical
results to the naive plan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side's hot keys spread over ``salt_buckets``
    shuffle partitions: fact rows get a deterministic salt (hash of the
    whole row modulo S — reproducible, no rand()), dim rows are replicated
    S times. The join key becomes (key, salt), so one hot key occupies S
    partitions instead of one. Shuffle volume: fact unchanged, dim ×S —
    the right trade when dim ≪ fact but too big to broadcast.

    Only fact-preserving join types are allowed: under 'right'/'full'
    (or 'left_anti') an unmatched dim key would surface once per salt
    replica, silently breaking the exact-semantics contract."""
    if how not in ("inner", "left", "left_semi"):
        raise ValueError(
            f"salted_join supports how in ('inner','left','left_semi'); got {how!r} "
            "— dim-side replicas would duplicate unmatched dim keys"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt_buckets))
    f = fact.withColumn("__salt", salt)
    d = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>")),
    )
    return f.join(d, on=[on, "__salt"], how=how).drop("__salt")


def salted_collect_list(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    salt_buckets: int = 16,
    sort_result: bool = True,
) -> DataFrame:
    """Holistic aggregation (collect_list) under key skew: stage 1 collects
    per (key, salt) — bounded partition payloads — stage 2 flattens the at
    most S partial lists per key. With ``sort_result`` the final array is
    sorted, making the output deterministic and engine-comparable."""
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(salt_buckets))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(F.collect_list(value_col).alias("__part"))
    )
    merged = partial.groupBy(*key_cols).agg(
        F.flatten(F.collect_list("__part")).alias(value_col + "s")
    )
    if sort_result:
        merged = merged.withColumn(value_col + "s", F.array_sort(F.col(value_col + "s")))
    return merged


def skew_report(df, key_cols, top_k: int = 5):
    """Key-skew diagnosis — the profiling pass run BEFORE deciding whether
    a join/agg needs salting or AQE skew-split: per distinct key count the
    rows, then summarize the distribution (one tiny second aggregate) and
    name the ``top_k`` heaviest keys. ``skew_ratio_ppm`` = max_count·1e6
    DIV total (exact integer): a join key where one key holds >1-2% of a
    100 TB fact is the salting trigger.

    Two aggregations over the per-key counts frame (|distinct keys| rows,
    never raw data), both partial-agg friendly; the top-k comes from a
    TakeOrdered limit — NOT a collect_list over all keys, which would pull
    every distinct key into one aggregation buffer. Output is ONE row:
    (n_keys, n_rows, max_count, top_keys, top_counts, skew_ratio_ppm)."""
    from pyspark.sql import functions as F

    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    counts = df.groupBy(key.alias("key")).agg(F.count(F.lit(1)).alias("n"))
    summary = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_count"),
    )
    top = (
        counts.orderBy(F.col("n").desc(), "key")
        .limit(top_k)
        .agg(
            F.collect_list(
                # sort key (-n, key): count DESC with key ASC tie-break —
                # deterministic and engine-matching
                F.struct(
                    (-F.col("n")).cast("long").alias("neg_n"),
                    "key",
                    F.col("n").cast("long").alias("n"),
                )
            ).alias("__top")
        )
        .select(F.sort_array(F.col("__top")).alias("__top"))
    )
    return summary.crossJoin(F.broadcast(top)).select(
        "n_keys",
        "n_rows",
        "max_count",
        F.transform("__top", lambda s: s["key"]).alias("top_keys"),
        F.transform("__top", lambda s: s["n"]).alias("top_counts"),
        F.expr("max_count * 1000000 DIV n_rows").alias("skew_ratio_ppm"),
    )


def join_cardinality(left, right, left_key: str, right_key: str):
    """EXACT join-output cardinality without running the join — the
    pre-flight companion to :func:`skew_report`: |A ⋈ B| on an equi-key is
    Σ_k n_A(k)·n_B(k) over the per-key count frames, so the estimate costs
    two aggregations plus a join of COUNT rows (|distinct keys|, never the
    facts). Also reports each side's row total and the heaviest single
    key's output contribution — the number that decides between a plain
    shuffle join, salting, or rethinking the query (a 100 TB join that
    would emit 10^16 rows should die in planning, not in production).

    All integers; products carried in decimal(38,0) (a hot key times a hot
    key overflows int64 fast). 1-row output."""
    la = left.groupBy(F.col(left_key).alias("__k")).agg(
        F.count(F.lit(1)).alias("__na")
    )
    rb = right.groupBy(F.col(right_key).alias("__k")).agg(
        F.count(F.lit(1)).alias("__nb")
    )
    dec = "decimal(38,0)"
    prod = (F.col("__na").cast(dec) * F.col("__nb").cast(dec)).alias("__p")
    joined = la.join(rb, "__k").select("__k", prod)
    return (
        joined.agg(
            F.sum("__p").cast(dec).alias("join_rows"),
            F.max("__p").cast(dec).alias("max_key_rows"),
            F.count(F.lit(1)).alias("n_matching_keys"),
        )
        .crossJoin(F.broadcast(left.agg(F.count(F.lit(1)).alias("left_rows"))))
        .crossJoin(F.broadcast(right.agg(F.count(F.lit(1)).alias("right_rows"))))
        .select(
            "left_rows",
            "right_rows",
            "n_matching_keys",
            F.coalesce(F.col("join_rows"), F.lit(0).cast(dec)).alias("join_rows"),
            F.coalesce(F.col("max_key_rows"), F.lit(0).cast(dec)).alias(
                "max_key_rows"
            ),
        )
    )
