"""Prefix-filter similarity-join scale probe (d16 family): measure
``dedup.prefix_filter_jaccard_pairs`` wall time and candidate-pair count as
the corpus replicates k-fold, in the two regimes that bracket real corpus
growth:

  disjoint : replica r prefixes every word with ``r{r}_`` — vocabulary
             grows k-fold, per-token document frequency is UNCHANGED, and
             cross-replica Jaccard is 0. This is the Heaps'-law-ish regime
             (real corpora grow vocabulary with size); the candidate law
             Sigma_t df_prefix(t)^2 predicts candidates scale ~k and wall
             ~linear.
  shared   : replicas keep the text verbatim (ids offset) — every token's
             df multiplies by k, so the same law predicts candidates ~k^2.
             This is the adversarial fixed-vocabulary regime the operator's
             docstring warns about (and why d16 shingles to bigrams: rarity
             is what the filter prunes on).

A probe that showed ~k^2 candidates in the DISJOINT regime would falsify
the operator's 100 TB story; ~k there plus ~k^2 in the shared regime is the
law behaving as documented. Candidate counts are computed by the same
dictionary-encode -> rarest-prefix -> token self-join steps as the
production operator (kept in lockstep with operators/dedup.py:1253-1328);
wall times come from the production function itself.

Methodology per the repo's measurement discipline: warm each scale point
once, then time rounds in a k-ascending-then-descending palindrome so slow
host drift cancels; report per-round times and the min.

Usage: python tools/exp_prefix_filter_scale.py [sf_dir] [max_k] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from end_to_end_ml_spark.operators import dedup
from end_to_end_ml_spark.operators.dedup import _spread
from end_to_end_ml_spark.operators.ordinal import global_ordinal
from end_to_end_ml_spark.session import get_spark

ID_STRIDE = 10_000_000  # > any doc_id at the SFs the probe runs on


def replicate(docs, k: int, regime: str):
    """k replicas of the corpus; ids offset by replica * ID_STRIDE so the
    id space stays disjoint and id_a < id_b never pairs a doc with its own
    replica twice. ``disjoint`` prefixes each word with the replica tag so
    the replicas share no vocabulary."""
    reps = docs.crossJoin(
        F.broadcast(
            docs.sparkSession.range(k).select(F.col("id").alias("__rep"))
        )
    )
    doc_id = (F.col("doc_id") + F.col("__rep") * ID_STRIDE).alias("doc_id")
    if regime == "shared":
        return reps.select(doc_id, "text")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    tagged = F.array_join(
        F.transform(
            toks,
            lambda t: F.concat(
                F.lit("r"), F.col("__rep").cast("string"), F.lit("_"), t
            ),
        ),
        " ",
    )
    return reps.select(doc_id, tagged.alias("text"))


def candidate_count(df, threshold_x100: int = 60, ngram: int = 2) -> int:
    """Candidate-pair count via the production operator's own steps
    (operators/dedup.py prefix_filter_jaccard_pairs, pre-verification)."""
    staged = _spread(df).select(
        F.col("doc_id").alias("doc"),
        F.split(F.trim(F.col("text")), r"\s+").alias("__w"),
    )
    w = F.col("__w")
    gram_expr = F.array_distinct(
        F.when(F.size(w) < ngram, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(w) - (ngram - 1)),
                lambda i: F.concat_ws(" ", F.slice(w, i, ngram)),
            )
        )
    )
    toks = staged.select("doc", F.explode(gram_expr).alias("token"))
    dfreq = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df_t"))
        .localCheckpoint(eager=False)
    )
    vocab_ids = global_ordinal(dfreq, "df_t", "token", out_col="tid").select(
        "token", F.col("tid").cast("long").alias("tid")
    )
    ranked = (
        toks.join(F.broadcast(vocab_ids), "token")
        .groupBy("doc")
        .agg(F.array_sort(F.collect_list("tid")).alias("stoks"))
        .select("doc", "stoks", F.size("stoks").cast("long").alias("sz"))
    )
    p_len = (
        F.col("sz") - F.expr(f"({threshold_x100} * sz + 99) div 100") + F.lit(1)
    )
    prefixes = ranked.select(
        "doc",
        "sz",
        F.explode(F.slice(F.col("stoks"), 1, p_len.cast("int"))).alias("ptok"),
    )
    a = prefixes.select(F.col("doc").alias("id_a"), F.col("sz").alias("pa"), "ptok")
    b = prefixes.select(F.col("doc").alias("id_b"), F.col("sz").alias("pb"), "ptok")
    return (
        a.join(b, "ptok")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.lit(100) * F.col("pa") >= F.lit(threshold_x100) * F.col("pb"))
            & (F.lit(100) * F.col("pb") >= F.lit(threshold_x100) * F.col("pa"))
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
        .count()
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("exp-prefix-filter-scale", shuffle_partitions=32)
    base = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", "text")
    )
    n_base = base.count()

    ks = []
    k = 1
    while k <= max_k:
        ks.append(k)
        k *= 2
    # shared regime is ~k^2 in candidates — cap it at 2x to demonstrate
    # the law without a 64x-verification sitting
    points = [("disjoint", k) for k in ks] + [
        ("shared", k) for k in ks if k <= 2
    ]

    frames = {}
    for regime, k in points:
        frames[(regime, k)] = replicate(base, k, regime).localCheckpoint()

    def run(regime: int, k: int) -> tuple[float, int]:
        t0 = time.monotonic()
        n_out = (
            dedup.prefix_filter_jaccard_pairs(
                frames[(regime, k)], "doc_id", "text", threshold_x100=60, ngram=2
            )
            .count()
        )
        return time.monotonic() - t0, n_out

    stats: dict[tuple[str, int], dict] = {}
    for regime, k in points:
        wall, n_out = run(regime, k)  # warm lap, untimed
        stats[(regime, k)] = {
            "docs": n_base * k,
            "out_pairs": n_out,
            "walls": [],
        }
    palindrome = points + points[::-1]
    for _ in range(rounds):
        for regime, k in palindrome:
            wall, _ = run(regime, k)
            stats[(regime, k)]["walls"].append(round(wall, 2))
    for regime, k in points:
        stats[(regime, k)]["cands"] = candidate_count(frames[(regime, k)])

    base_key = ("disjoint", 1)
    print(f"\nbase corpus: {n_base} docs ({sf_dir}, doc_id%2==0)")
    print(
        f"{'regime':9s} {'k':>2s} {'docs':>7s} {'cands':>10s} {'out':>6s} "
        f"{'min_wall':>8s} {'cand_x':>7s} {'wall_x':>7s}  walls"
    )
    for regime, k in points:
        s = stats[(regime, k)]
        mw = min(s["walls"])
        cx = s["cands"] / stats[base_key]["cands"]
        wx = mw / min(stats[base_key]["walls"])
        print(
            f"{regime:9s} {k:2d} {s['docs']:7d} {s['cands']:10d} "
            f"{s['out_pairs']:6d} {mw:8.2f} {cx:7.2f} {wx:7.2f}  {s['walls']}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
