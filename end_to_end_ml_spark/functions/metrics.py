"""Classification metrics as pure relational queries (reference §2.4-2.5).

Every metric here is ONE DataFrame plan — no per-threshold rescans, no
driver-side numpy. That's the 100 TB design: confusion counts are a 4-row
groupBy; AUC is a rank statistic (one sort); ROC/PR curves and the threshold
sweep come from a single sorted-cumulative pass (O(N log N) total, not
O(T*N)); ECE and lift/gains are bucketed aggregations.

Reference citations (relative to /root/reference/):
- A4  confusion matrix        src/training/evaluation/evaluator.py:392-467
- A5  acc/P/R/F1/F-beta       src/training/core/optimizer.py:168-215
- A6  ROC-AUC                 src/training/core/optimizer.py:206-211
- A9  ECE (binned)            src/training/evaluation/evaluator.py:818-875
- A12 ROC/PR curve points     src/training/evaluation/visualizer.py:77-139
- A13 cumulative gains/lift   src/training/evaluation/visualizer.py:141-183
- M7  threshold application   src/training/evaluation/evaluator.py:697-714
- M8  threshold sweep         src/training/evaluation/champion.py:143-172

Determinism note: counts are exact integers; ratios are single IEEE
divisions of exact integers — bit-identical across engines, which is what
makes these queries DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_threshold(df: DataFrame, score_col: str, threshold: float, out_col: str = "prediction") -> DataFrame:
    """M7: score >= t → 1 else 0 (JVM-side CASE, no UDF)."""
    return df.withColumn(out_col, (F.col(score_col) >= F.lit(threshold)).cast("int"))


def confusion_matrix(df: DataFrame, label_col: str, pred_col: str) -> DataFrame:
    """A4: groupBy(true, pred) counts + row-normalized fraction via a window
    sum over the true label (one shuffle, 4 rows out for binary)."""
    counts = df.groupBy(label_col, pred_col).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy(label_col)
    return counts.select(
        F.col(label_col).alias("label"),
        F.col(pred_col).alias("prediction"),
        "n",
        (F.col("n") / F.sum("n").over(w)).alias("row_fraction"),
    ).orderBy("label", "prediction")


def binary_metrics(
    df: DataFrame, label_col: str, pred_col: str, beta: float = 1.0
) -> DataFrame:
    """A5: accuracy/precision/recall/F1/F-beta in ONE aggregation pass over
    TP/FP/FN/TN (map-side partial aggregation, single reduce)."""
    lbl, prd = F.col(label_col), F.col(pred_col)
    agg = df.agg(
        F.sum(((lbl == 1) & (prd == 1)).cast("long")).alias("tp"),
        F.sum(((lbl == 0) & (prd == 1)).cast("long")).alias("fp"),
        F.sum(((lbl == 1) & (prd == 0)).cast("long")).alias("fn"),
        F.sum(((lbl == 0) & (prd == 0)).cast("long")).alias("tn"),
    )
    b2 = beta * beta
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    return agg.select(
        tp.alias("tp"),
        fp.alias("fp"),
        fn.alias("fn"),
        tn.alias("tn"),
        ((tp + tn) / (tp + fp + fn + tn)).alias("accuracy"),
        (tp / (tp + fp)).alias("precision"),
        (tp / (tp + fn)).alias("recall"),
        (2 * tp / (2 * tp + fp + fn)).alias("f1"),
        ((1 + b2) * tp / ((1 + b2) * tp + b2 * fn + fp)).alias("fbeta"),
    )


def roc_auc(df: DataFrame, label_col: str, score_col: str) -> DataFrame:
    """A6: Mann-Whitney rank-statistic AUC with proper tie handling
    (average ranks), as a single sort + two windows:

        AUC = (sum of positive ranks - n_pos(n_pos+1)/2) / (n_pos * n_neg)

    Tie-group average ranks are means of consecutive integers (exact halves),
    so the whole computation is exact until one final division.
    """
    w_order = Window.orderBy(F.col("s"))
    w_ties = Window.partitionBy(F.col("s"))
    ranked = df.select(
        F.col(label_col).alias("y"), F.col(score_col).alias("s")
    ).withColumn("rn", F.row_number().over(w_order)).withColumn(
        "rank", F.avg("rn").over(w_ties)
    )
    return ranked.agg(
        F.sum(F.when(F.col("y") == 1, F.col("rank"))).alias("pos_rank_sum"),
        F.sum((F.col("y") == 1).cast("long")).alias("n_pos"),
        F.sum((F.col("y") == 0).cast("long")).alias("n_neg"),
    ).select(
        (
            (F.col("pos_rank_sum") - F.col("n_pos") * (F.col("n_pos") + 1) / 2)
            / (F.col("n_pos") * F.col("n_neg"))
        ).alias("roc_auc")
    )


def ece_bins(
    df: DataFrame, label_col: str, score_col: str, n_bins: int = 10
) -> DataFrame:
    """A9: equal-width calibration bins. Returns the per-bin table
    (bin, n, avg_label, avg_confidence) — ECE = Σ |avg_label-avg_conf|·n/N is
    a trivial driver fold over ≤ n_bins rows. Relational end-to-end."""
    binned = df.select(
        F.least(
            F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
        ).alias("bin"),
        F.col(label_col).cast("double").alias("y"),
        F.col(score_col).cast("double").alias("s"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("y").alias("avg_label"),
            F.avg("s").alias("avg_confidence"),
        )
        .orderBy("bin")
    )


def expected_calibration_error(
    df: DataFrame, label_col: str, score_col: str, n_bins: int = 10
) -> float:
    """A9 scalar form (driver fold over the tiny bin table)."""
    rows = ece_bins(df, label_col, score_col, n_bins).collect()
    total = sum(r["n"] for r in rows)
    return sum(abs(r["avg_label"] - r["avg_confidence"]) * r["n"] for r in rows) / total


def roc_curve(df: DataFrame, label_col: str, score_col: str) -> DataFrame:
    """A12: one curve point per DISTINCT score — pre-aggregate by score
    (shuffle reduces N rows to |distinct scores|), then cumulative window
    sums ordered by score desc. Single pass; no per-threshold rescans."""
    by_score = df.groupBy(F.col(score_col).alias("threshold")).agg(
        F.sum((F.col(label_col) == 1).cast("long")).alias("pos"),
        F.sum((F.col(label_col) == 0).cast("long")).alias("neg"),
    )
    w = Window.orderBy(F.col("threshold").desc()).rowsBetween(Window.unboundedPreceding, 0)
    totals = Window.partitionBy()
    return by_score.select(
        "threshold",
        F.sum("pos").over(w).alias("cum_tp"),
        F.sum("neg").over(w).alias("cum_fp"),
        (F.sum("pos").over(w) / F.sum("pos").over(totals)).alias("tpr"),
        (F.sum("neg").over(w) / F.sum("neg").over(totals)).alias("fpr"),
    ).orderBy(F.col("threshold").desc())


def precision_recall_curve(df: DataFrame, label_col: str, score_col: str) -> DataFrame:
    """A12 (PR form) + A10 groundwork: precision/recall at each distinct
    score threshold from the same sorted-cumulative pass."""
    curve = roc_curve(df, label_col, score_col)
    return curve.select(
        "threshold",
        (F.col("cum_tp") / (F.col("cum_tp") + F.col("cum_fp"))).alias("precision"),
        F.col("tpr").alias("recall"),
    )


def lift_gains(
    df: DataFrame, label_col: str, score_col: str, tiebreak_col: str, n_tiles: int = 10
) -> DataFrame:
    """A13: decile gains & lift. ntile needs a TOTAL order to be
    deterministic — ``tiebreak_col`` (a PK) breaks score ties identically on
    any engine/partitioning. Cumulatives are integer window sums."""
    w_tile = Window.orderBy(F.col(score_col).desc(), F.col(tiebreak_col))
    tiled = df.select(
        F.col(label_col).alias("y"), F.ntile(n_tiles).over(w_tile).alias("decile")
    )
    per = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    totals = Window.partitionBy()
    return per.select(
        "decile",
        "n",
        "pos",
        (F.sum("pos").over(w_cum) / F.sum("pos").over(totals)).alias("cum_gain"),
        (
            (F.sum("pos").over(w_cum) / F.sum("pos").over(totals))
            / (F.sum("n").over(w_cum) / F.sum("n").over(totals))
        ).alias("lift"),
    ).orderBy("decile")


def threshold_sweep(
    df: DataFrame,
    label_col: str,
    score_col: str,
    beta: float = 1.0,
    n_thresholds: int = 99,
) -> DataFrame:
    """M8: F-beta at thresholds i/(n+1), i=1..n — WITHOUT n rescans.

    Pre-aggregate once by distinct score (N rows → |scores|), cross-join the
    tiny threshold list (|scores| × n is small), aggregate. At 100 TB the
    big table is touched exactly once.
    """
    by_score = df.groupBy(F.col(score_col).alias("s")).agg(
        F.sum((F.col(label_col) == 1).cast("long")).alias("pos"),
        F.sum((F.col(label_col) == 0).cast("long")).alias("neg"),
    )
    spark = df.sparkSession
    thresholds = spark.range(1, n_thresholds + 1).select(
        (F.col("id") / (n_thresholds + 1)).alias("threshold")
    )
    b2 = beta * beta
    joined = thresholds.join(by_score, how="cross")
    agg = joined.groupBy("threshold").agg(
        F.sum(F.when(F.col("s") >= F.col("threshold"), F.col("pos")).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("s") >= F.col("threshold"), F.col("neg")).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("s") < F.col("threshold"), F.col("pos")).otherwise(0)).alias("fn"),
    )
    return agg.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        (
            (1 + b2) * F.col("tp")
            / ((1 + b2) * F.col("tp") + b2 * F.col("fn") + F.col("fp"))
        ).alias("fbeta"),
    ).orderBy("threshold")


def best_threshold(df: DataFrame, label_col: str, score_col: str, beta: float = 1.0) -> float:
    """M8 argmax (driver fold over the 99-row sweep result)."""
    rows = threshold_sweep(df, label_col, score_col, beta).collect()
    best = max(rows, key=lambda r: (r["fbeta"] if r["fbeta"] is not None else -1.0))
    return float(best["threshold"])


def class_imbalance_ratio(df: DataFrame, label_col: str) -> float:
    """A3: n_neg / n_pos → e.g. XGBoost scale_pos_weight."""
    r = df.agg(
        F.sum((F.col(label_col) == 0).cast("long")).alias("neg"),
        F.sum((F.col(label_col) == 1).cast("long")).alias("pos"),
    ).collect()[0]
    return r["neg"] / r["pos"]


def column_variance(df: DataFrame, cols) -> DataFrame:
    """A14: per-column variance for variance-threshold selection, computed
    via exact decimal sums (engine-independent, unlike streaming variance):
    var = (Σx² − (Σx)²/n) / (n−1)."""
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        d = F.col(c).cast("decimal(20,4)")
        aggs += [F.sum(d).alias(f"__s_{c}"), F.sum(d * d).alias(f"__q_{c}")]
    agg = df.agg(*aggs)
    n = F.col("n").cast("double")
    exprs = []
    for c in cols:
        s = F.col(f"__s_{c}").cast("double")
        q = F.col(f"__q_{c}").cast("double")
        exprs.append(((q - s * s / n) / (n - F.lit(1.0))).alias(c))
    long = agg.select(*exprs).selectExpr(
        "stack({}, {}) as (column_name, variance)".format(
            len(cols), ", ".join(f"'{c}', `{c}`" for c in cols)
        )
    )
    return long.orderBy("column_name")
