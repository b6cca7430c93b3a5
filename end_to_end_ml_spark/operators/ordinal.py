"""Global dense ordinals (distributed zipWithIndex for DataFrames).

Assigning every row a dense 0-based sequence number in a global sort order
is the layout primitive behind negative-sampling index spaces, dense
embedding-table ids, and resumable corpus cursors — and the naive plan,
``row_number() OVER (ORDER BY key)``, is the canonical scale-killer: an
unpartitioned window moves the whole table through one task.

The distributed form here is the classic two-pass rank:

1. **Boundary sketch, collected once.** ``approx_percentile`` produces
   ~n_buckets-1 split points for the order key (one cheap aggregate; the
   k-float collect is a bounded driver fold). Boundary *placement* only
   affects balance, never correctness, so an approximate sketch is enough —
   but because the sketch is collected and re-embedded as literals, the
   bucket function is frozen: later passes cannot drift even though
   aggregate-merge order in a re-evaluation is not deterministic.
2. **Bucket assignment** is then a pure row-local expression (a chain of
   ``key >= boundary`` comparisons — whole-stage codegen, no shuffle).
3. **Exact offsets**: per-bucket counts (map-side combined, n_buckets rows)
   prefix-summed with a window over that *bounded* aggregate.
4. **Within-bucket rank**: ``row_number`` partitioned by bucket (the one
   fact-sized hash shuffle), ordered by (key, pk) so ties are total.

ordinal = offset(bucket) + local_rank - 1. Equal keys always land in the
same bucket (same comparisons), and bucket id is monotone in key, so the
concatenated order (bucket, key, pk) equals the global order (key, pk) —
the result is exactly ``row_number() OVER (ORDER BY key, pk) - 1``, which
is what the DuckDB oracle computes. This mirrors what RDD.zipWithIndex does
(count-per-partition then offset) but stays in the DataFrame API with a
data-derived range partitioning.

No reference analogue (the reference's pandas frames have a free
RangeIndex); part of the 100 TB layout surface beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F



def dedup_boundaries(raw) -> list[float]:
    """Drop NULL and consecutive-duplicate split points from a collected
    approx-percentile sketch (duplicates only create empty buckets, but
    pruning them keeps the codegen comparison chain short on
    low-cardinality keys)."""
    out: list[float] = []
    for bv in raw or []:
        if bv is not None and (not out or bv != out[-1]):
            out.append(float(bv))
    return out


def count_and_boundaries(
    df: DataFrame, key_col: str, n_buckets: int = 32
) -> tuple[int, list[float]]:
    """Exact row count + the approx boundary sketch in ONE aggregate job.

    Callers that need both (negative_pairs' modulus, winsorize /
    quantile_uniform's rank indices) otherwise pay two full input scans —
    a separate ``count()`` job followed by :func:`global_ordinal`'s
    percentile job. Both are driver folds over the same pass, so fuse
    them; pass the sketch to ``global_ordinal(boundaries=...)`` to skip
    its internal job. Count is exact (the correctness-bearing half);
    boundary placement only affects bucket balance, never output."""
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    probs = [i / n_buckets for i in range(1, n_buckets)]
    aggs = [F.count(F.lit(1)).alias("__n")]
    if probs:
        aggs.append(
            F.percentile_approx(F.col(key_col).cast("double"), probs).alias("__b")
        )
    row = df.agg(*aggs).collect()[0]
    boundaries = dedup_boundaries(row["__b"]) if probs else []
    return int(row["__n"]), boundaries


def bucket_expr(key, boundaries: list[float]):
    """Row-local bucket id for frozen boundary literals: a chain of
    ``key >= b`` comparisons (whole-stage codegen, no shuffle); NULL keys
    land in bucket 0 (every comparison is null -> otherwise(0))."""
    bucket = F.lit(0)
    for bv in boundaries:
        bucket = bucket + F.when(key >= F.lit(bv), 1).otherwise(0)
    return bucket


def global_ordinal(
    df: DataFrame,
    key_col: str,
    pk_col: str,
    n_buckets: int = 32,
    out_col: str = "ordinal",
    boundaries: list[float] | None = None,
) -> DataFrame:
    """Add ``out_col``: the dense 0-based global rank of each row under
    ``ORDER BY key_col, pk_col`` (ties broken by pk, so the order is
    total). ``n_buckets`` is the parallelism knob — at 100 TB use O(10k)
    buckets so each per-bucket sort fits an executor core. Pass
    ``boundaries`` (e.g. from :func:`count_and_boundaries`) to skip the
    sketch job — placement only affects balance, never the output.

    Null keys: every NULL lands in bucket 0 (all boundary comparisons are
    null -> otherwise(0)) and Spark's default ascending sort puts NULLS
    FIRST, so nulls occupy ordinals 0..n_null-1 deterministically. Note
    DuckDB defaults to NULLS LAST — an oracle over nullable keys must say
    ``ORDER BY key NULLS FIRST`` explicitly to match.

    MULTI-EVALUATION CAVEAT (as for temperature_sample): the input plan
    is evaluated more than once (percentile sketch, bucket counts, final
    rank pass) — and so are the callers built on this machinery
    (winsorize, quantile_uniform, negative_pairs). A NONDETERMINISTIC
    upstream (rand()-derived sample, non-idempotent source) can therefore
    yield boundaries/offsets inconsistent with the rows they are applied
    to. Persist (or checkpoint) such an input first; deterministic inputs
    are usually cheaper re-scanned than cached (see the measured note in
    temperature_sample)."""
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    if boundaries is None:
        # sketch job; callers that ALSO need a row count should fuse the
        # two via count_and_boundaries and pass the sketch in here
        probs = [i / n_buckets for i in range(1, n_buckets)]
        boundaries = []
        if probs:
            row = df.agg(
                F.percentile_approx(F.col(key_col).cast("double"), probs).alias("b")
            ).collect()[0]
            boundaries = dedup_boundaries(row["b"])
    key = F.col(key_col).cast("double")
    staged = df.withColumn("__bucket", bucket_expr(key, boundaries))

    counts = staged.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n"))
    # prefix-sum over the BOUNDED aggregate (<= n_buckets rows): the global
    # window here is over sketch-sized input, never the fact table
    off_w = (
        Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__bucket",
        F.coalesce(F.sum("__n").over(off_w), F.lit(0)).alias("__offset"),
    )

    rank_w = Window.partitionBy("__bucket").orderBy(key_col, pk_col)
    return (
        staged.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            out_col,
            (F.col("__offset") + F.row_number().over(rank_w) - 1).cast("long"),
        )
        .drop("__bucket", "__offset")
    )
