"""Coverage for the real-MLlib flagship scores path after its registry
slot moved to the oracled ml1b leaderboard (round-9, r8 verdict #5):
the LBFGS fit + vector_to_array scoring projection must keep running
end-to-end even though the driver no longer exercises it."""

from __future__ import annotations

from end_to_end_ml_spark.plans.ml_pipeline import ml_scores_query

SF_DIR = "/root/testdata/sf0.001"


def test_ml_scores_query_end_to_end(spark):
    out = ml_scores_query(spark, SF_DIR)
    rows = out.collect()
    assert len(rows) > 0
    assert out.columns == ["o_orderkey", "label", "pos_proba", "prediction"]
    for r in rows:
        assert 0.0 <= r["pos_proba"] <= 1.0
        assert r["prediction"] in (0.0, 1.0)
        assert r["label"] in (0.0, 1.0)
    # scores must be non-degenerate (the model learned SOMETHING)
    probs = {round(r["pos_proba"], 6) for r in rows}
    assert len(probs) > 1
