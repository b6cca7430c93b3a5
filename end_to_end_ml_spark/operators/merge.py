"""CDC merge / upsert (SCD-1 "latest wins") as a pure DataFrame plan.

The reference materializes feature snapshots by overwriting whole datasets
(src/feature/generate_initial_data.py sink paths); at 100 TB the idiomatic
form is an incremental MERGE: a base snapshot (one row per key) plus a
change stream (many rows per key, possibly tombstones) → the next snapshot.
Spark has no MERGE INTO without a table format (Delta/Iceberg), but the
relational core is engine-native and oracle-checkable:

1. reduce changes to latest-per-key (window over the key — distributed,
   no global sort; ties broken by a PK column for determinism);
2. FULL OUTER join base ⋈ latest-changes on the key (one co-partitioned
   shuffle; AQE handles skewed keys);
3. coalesce change-over-base per column; drop keys whose latest change is
   a tombstone.

Scale: both sides shuffle on the merge key once; if the change batch is
small (the common incremental case) Spark broadcasts it and the snapshot
never moves. Writing the result back through ``write_parquet`` (or a
bucketed table on the key) makes the next merge co-located.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_changes(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Newest change row per key (row_number over the key window)."""
    order = [F.col(ts_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    delete_predicate: Column | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Merge ``changes`` into ``base`` (both carrying the same schema):
    update-on-match, insert-on-new, delete when the key's LATEST change
    satisfies ``delete_predicate`` (evaluated on the change row — a
    tombstone marker). Returns the next snapshot, one row per key.

    The per-column rule is plain coalesce(change, base): a change row wins
    wherever present, untouched base rows pass through."""
    keys = list(key_cols)
    value_cols = [c for c in base.columns if c not in keys]
    latest = latest_changes(changes, keys, ts_col, tiebreak_cols)
    if delete_predicate is not None:
        latest = latest.withColumn("__tombstone", delete_predicate)
    else:
        latest = latest.withColumn("__tombstone", F.lit(False))
    b = base.select(*keys, *[F.col(c).alias(f"__b_{c}") for c in value_cols])
    c = latest.select(
        *keys,
        "__tombstone",
        *[F.col(col).alias(f"__c_{col}") for col in value_cols],
    )
    merged = b.join(c, on=keys, how="full_outer")
    out_cols = [
        F.coalesce(F.col(f"__c_{col}"), F.col(f"__b_{col}")).alias(col)
        for col in value_cols
    ]
    return (
        merged.filter(~F.coalesce(F.col("__tombstone"), F.lit(False)))
        .select(*keys, *out_cols)
    )


# ---------------------------------------------------------------------------
# incremental aggregate maintenance
# ---------------------------------------------------------------------------

# spec name -> (partial-agg builder over the raw column, snapshot merge rule)
# Only ALGEBRAIC aggregates belong here: ones whose partials combine by a
# closed-form rule. (Holistic aggregates — exact median, exact distinct —
# need their full input or a mergeable sketch; see timeseries.py's HLL
# rollup for the sketch form.)
_AGG_SPECS = {
    "count": (
        lambda c: F.count(F.lit(1)),
        lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
    ),
    "sum": (
        lambda c: F.sum(c),
        lambda a, b: F.when(a.isNull() & b.isNull(), F.lit(None)).otherwise(
            F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))
        ),
    ),
    "min": (lambda c: F.min(c), F.least),
    "max": (lambda c: F.max(c), F.greatest),
}


def agg_snapshot(
    df: DataFrame, key_cols: list[str], specs: dict[str, tuple[str, str]]
) -> DataFrame:
    """Aggregate ``df`` into a mergeable snapshot: one row per key with one
    column per ``specs`` entry {out_col: (agg, in_col)}, agg in
    count/sum/min/max. The snapshot is the persisted state of an
    incremental pipeline — see :func:`merge_agg_snapshots`."""
    aggs = []
    for out, (agg, col) in specs.items():
        if agg not in _AGG_SPECS:
            raise ValueError(f"unsupported agg {agg!r}; use {sorted(_AGG_SPECS)}")
        aggs.append(_AGG_SPECS[agg][0](col).alias(out))
    return df.groupBy(*key_cols).agg(*aggs)


def merge_agg_snapshots(
    base: DataFrame,
    delta: DataFrame,
    key_cols: list[str],
    specs: dict[str, tuple[str, str]],
) -> DataFrame:
    """Incremental aggregate maintenance: merge a delta's
    :func:`agg_snapshot` into the base snapshot WITHOUT rescanning the
    base's facts — count/sum add, min/max fold (least/greatest). At
    100 TB this is the difference between touching a day of data and
    touching three years of it: the base facts are never re-read, only
    the (small) keyed snapshot joins the delta's.

    FULL OUTER on the keys so new keys insert and untouched keys pass
    through; the merge rules handle the one-sided-null rows. Exactly the
    partial-aggregation algebra Spark itself uses map-side, lifted to
    snapshot granularity (same reason the rules are restricted to
    algebraic aggregates).

    Both inputs must already be snapshots with identical ``specs``
    columns; merging is associative, so daily→weekly→monthly rollups
    compose."""
    keys = list(key_cols)
    b = base.select(*keys, *[F.col(c).alias(f"__b_{c}") for c in specs])
    d = delta.select(*keys, *[F.col(c).alias(f"__d_{c}") for c in specs])
    merged = b.join(d, on=keys, how="full_outer")
    out = []
    for name, (agg, _col) in specs.items():
        rule = _AGG_SPECS[agg][1]
        out.append(rule(F.col(f"__b_{name}"), F.col(f"__d_{name}")).alias(name))
    return merged.select(*keys, *out)


def diff_snapshots(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Dataset-version diff: (key, change) with change ∈ added / removed /
    changed — the audit between two materializations of the same keyed
    dataset (what changed since the last training snapshot?). Unchanged
    rows are dropped (at 100 TB they are almost everything; emitting them
    would make the diff as big as the data).

    One FULL OUTER join on the key; equality is md5 over an INJECTIVE
    row encoding (cheap fixed-width compare instead of N column
    equalities, null-safe by construction). Separator-in-value
    ambiguity is eliminated by hashing each column separately first:
    every column contributes either the 1-char NULL marker or 'V' + its
    fixed-width 32-hex md5, so no value can collide with a neighbor's
    encoding and two different rows can only hash equal via an md5
    collision. Both sides shuffle once on the key; pre-bucketed
    snapshots diff co-located."""
    keys = list(key_cols)
    cols = compare_cols or [c for c in old.columns if c not in keys]
    if not cols:
        # every column is a key: F.concat(*[]) would raise deep inside the
        # plan; fail here with the actionable message instead. (A key-only
        # existence diff is diff_snapshots(old, new, keys, [lit-column]) or
        # simply an anti-join each way.)
        raise ValueError(
            "diff_snapshots: no compare columns (all columns are keys); "
            "use an anti-join for a key-only existence diff"
        )

    def fp(df):
        parts = [
            F.when(F.col(c).isNull(), F.lit("N")).otherwise(
                F.concat(F.lit("V"), F.md5(F.col(c).cast("string")))
            )
            for c in cols
        ]
        return F.md5(F.concat(*parts))

    o = old.select(*keys, fp(old).alias("__old_fp"))
    n = new.select(*keys, fp(new).alias("__new_fp"))
    joined = o.join(n, on=keys, how="full_outer")
    change = (
        F.when(F.col("__old_fp").isNull(), F.lit("added"))
        .when(F.col("__new_fp").isNull(), F.lit("removed"))
        .when(F.col("__old_fp") != F.col("__new_fp"), F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*keys, "change")
    )
