"""M5: soft/hard voting ensemble over fitted models (reference
src/training/core/ensemble.py:77-156) — MLlib has no VotingClassifier, so
this composes N fitted PipelineModels/classifiers at transform time.

Soft vote: element-wise mean of the probability vectors → argmax.
Hard vote: majority over predictions (ties → lowest class index, sklearn's
behavior).

Each model transforms the input once; per-model outputs join back on the
caller's unique id column (broadcast-sized per-row vectors, equi-join on the
id — co-partitioned after the first shuffle). The vote itself is narrow
array arithmetic, no UDFs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class VotingEnsemble:
    """Compose >= 2 fitted models (reference requires >= 2, ensemble.py:96)."""

    def __init__(
        self,
        models: list,
        voting: str = "soft",
        id_col: str = "id",
        probability_col: str = "probability",
        prediction_col: str = "prediction",
    ):
        if len(models) < 2:
            raise ValueError("voting ensemble needs >= 2 fitted models")
        if voting not in ("soft", "hard"):
            raise ValueError(f"voting must be 'soft' or 'hard', got {voting!r}")
        self.models = models
        self.voting = voting
        self.id_col = id_col
        self.probability_col = probability_col
        self.prediction_col = prediction_col

    def transform(self, df: DataFrame) -> DataFrame:
        out = df
        for i, m in enumerate(self.models):
            scored = m.transform(df).select(
                self.id_col,
                vector_to_array(F.col(self.probability_col)).alias(f"__p{i}"),
                F.col(self.prediction_col).cast("long").alias(f"__v{i}"),
            )
            out = out.join(scored, on=self.id_col)
        n = len(self.models)
        prob_cols = [f"__p{i}" for i in range(n)]
        vote_cols = [f"__v{i}" for i in range(n)]

        if self.voting == "soft":
            summed = reduce(
                lambda a, b: F.zip_with(a, b, lambda x, y: x + y),
                [F.col(c) for c in prob_cols],
            )
            avg = F.transform(summed, lambda x: x / F.lit(float(n)))
            out = (
                out.withColumn("probability", array_to_vector(avg))
                # array_position of the max = argmax; first occurrence wins →
                # lowest class index on ties, like numpy argmax
                .withColumn(
                    "prediction",
                    (F.array_position(avg, F.array_max(avg)) - 1).cast("double"),
                )
            )
        else:
            votes = F.array(*[F.col(c) for c in vote_cols])
            candidates = F.array_sort(F.array_distinct(votes))
            # encode (count desc, class asc) into one orderable key:
            # key = count * K - class; argmax(key) = majority w/ low-class ties
            k = F.lit(1000)
            keys = F.transform(
                candidates,
                lambda v: F.size(F.filter(votes, lambda x: x == v)) * k - v,
            )
            best_key = F.array_max(keys)
            out = out.withColumn(
                "prediction",
                F.element_at(
                    candidates, F.array_position(keys, best_key).cast("int")
                ).cast("double"),
            )
        return out.drop(*prob_cols, *vote_cols)


def get_base_models(models: list) -> list[tuple[str, object]]:
    """Pair each fitted base model with its OWN final-estimator class name
    (reference /root/reference/src/training/core/ensemble.py:77-103,
    pinned by test_ensemble_and_config.py::
    test_get_base_models_uses_each_classifier_name): a PipelineModel
    reports the class of its LAST stage (the classifier), a bare model
    its own class — so a [LogisticRegression, RandomForest] list never
    collapses to one repeated name."""
    out = []
    for m in models:
        est = m.stages[-1] if hasattr(m, "stages") else m
        out.append((type(est).__name__, m))
    return out
