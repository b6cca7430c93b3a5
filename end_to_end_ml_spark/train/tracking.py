"""Experiment tracking (reference E7,
src/training/tracking/experiment_tracker.py:26-475).

The reference defines an abstract ``ExperimentTracker`` with Comet and
MLflow backends behind it. Comet is explicitly out of scope (SURVEY §2.10);
this module keeps the same observable surface with two backends:

- :class:`LocalJsonTracker` — always available; accumulates params /
  metrics / assets / model registrations in memory and writes one
  ``run.json`` on ``end()``. This is the audit trail the e2e pipeline test
  asserts against.
- :class:`MLflowExperimentTracker` — import-gated (mlflow is not in this
  container); mirrors every call onto an active MLflow run.

Scale note: trackers log DRIVER-SIDE SCALARS (a metric value, a param, a
path) — nothing here touches executors or adds Spark jobs; a tracked run
costs the same shuffles as an untracked one.
"""

from __future__ import annotations

import json
import os
import time
from abc import ABC, abstractmethod
from typing import Any


class ExperimentTracker(ABC):
    """Abstract tracking surface (reference experiment_tracker.py:26-150)."""

    @abstractmethod
    def log_metric(self, name: str, value: float, step: int | None = None) -> None: ...

    def log_metrics(self, metrics: dict[str, float], step: int | None = None) -> None:
        for k, v in metrics.items():
            self.log_metric(k, v, step)

    @abstractmethod
    def log_parameter(self, name: str, value: Any) -> None: ...

    def log_parameters(self, params: dict[str, Any]) -> None:
        for k, v in params.items():
            self.log_parameter(k, v)

    @abstractmethod
    def log_asset(self, name: str, payload: Any) -> None:
        """Structured asset (trials table, confusion matrix, curve points)."""

    def log_confusion_matrix(self, rows: list[dict], name: str = "confusion_matrix") -> None:
        self.log_asset(name, rows)

    @abstractmethod
    def log_model(self, model_name: str, path: str) -> None: ...

    @abstractmethod
    def register_model(self, model_name: str, **kwargs) -> None: ...

    @abstractmethod
    def get_metric(self, metric_name: str) -> float | None: ...

    @abstractmethod
    def end(self) -> None: ...


class LocalJsonTracker(ExperimentTracker):
    """Always-on local backend: one JSON document per run."""

    def __init__(self, out_dir: str, run_name: str = "run") -> None:
        self._out_dir = out_dir
        self._run_name = run_name
        self._doc: dict[str, Any] = {
            "run_name": run_name,
            "started_at": time.strftime("%Y-%m-%dT%H:%M:%S", time.gmtime()),
            "params": {},
            "metrics": {},
            "metric_steps": [],
            "assets": {},
            "models": {},
            "registered": [],
        }
        self._ended = False

    @property
    def path(self) -> str:
        return os.path.join(self._out_dir, f"{self._run_name}.json")

    def log_metric(self, name: str, value: float, step: int | None = None) -> None:
        self._doc["metrics"][name] = float(value)
        if step is not None:
            self._doc["metric_steps"].append(
                {"name": name, "value": float(value), "step": step}
            )

    def log_parameter(self, name: str, value: Any) -> None:
        self._doc["params"][name] = value

    def log_asset(self, name: str, payload: Any) -> None:
        self._doc["assets"][name] = payload

    def log_model(self, model_name: str, path: str) -> None:
        self._doc["models"][model_name] = path

    def register_model(self, model_name: str, **kwargs) -> None:
        self._doc["registered"].append({"name": model_name, **kwargs})

    def get_metric(self, metric_name: str) -> float | None:
        return self._doc["metrics"].get(metric_name)

    def end(self) -> None:
        if self._ended:
            return
        self._doc["ended_at"] = time.strftime("%Y-%m-%dT%H:%M:%S", time.gmtime())
        os.makedirs(self._out_dir, exist_ok=True)
        with open(self.path, "w") as f:
            json.dump(self._doc, f, indent=2, default=str)
        self._ended = True


class MLflowExperimentTracker(ExperimentTracker):
    """MLflow backend (reference experiment_tracker.py:304-475); requires the
    mlflow package and an active/startable run."""

    def __init__(self, run_name: str = "run") -> None:  # pragma: no cover - mlflow absent here
        import mlflow

        self._mlflow = mlflow
        if mlflow.active_run() is None:
            mlflow.start_run(run_name=run_name)

    def log_metric(self, name, value, step=None):  # pragma: no cover
        self._mlflow.log_metric(name, float(value), step=step)

    def log_parameter(self, name, value):  # pragma: no cover
        self._mlflow.log_param(name, value)

    def log_asset(self, name, payload):  # pragma: no cover
        self._mlflow.log_dict(
            payload if isinstance(payload, (dict, list)) else {"value": payload},
            f"{name}.json",
        )

    def log_model(self, model_name, path):  # pragma: no cover
        self._mlflow.log_param(f"model_path_{model_name}", path)

    def register_model(self, model_name, **kwargs):  # pragma: no cover
        self._mlflow.log_dict(kwargs, f"registered_{model_name}.json")

    def get_metric(self, metric_name):  # pragma: no cover
        run = self._mlflow.active_run()
        return run.data.metrics.get(metric_name) if run else None

    def end(self):  # pragma: no cover
        self._mlflow.end_run()


def create_tracker(
    out_dir: str, run_name: str = "run", backend: str = "auto"
) -> ExperimentTracker:
    """Factory: 'local', 'mlflow', or 'auto' (mlflow when importable, local
    fallback — the reference's tracker-selection behavior with Comet
    descoped)."""
    if backend in ("auto", "mlflow"):
        try:  # pragma: no cover - mlflow not installed in this container
            return MLflowExperimentTracker(run_name)
        except ImportError:
            if backend == "mlflow":
                raise
    return LocalJsonTracker(out_dir, run_name)
