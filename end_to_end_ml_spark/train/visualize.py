"""Evaluation-figure assets (reference E7 gap: src/training/evaluation/
visualizer.py:77-183 renders ROC / PR / lift-gains figures and logs them to
the tracker).

The engine's counterpart keeps the split the reference blurs: the CURVE
DATA is computed distributed (the a12/a10/a13 operators, bounded row counts
via ``score_precision``), collected as a small table, and logged as a
structured ``figure_*`` asset any frontend can render; actual PNG
rendering is import-gated on matplotlib (absent from this container — the
gate mirrors how LightGBM/XGBoost are handled in train/models.py).

Scale note: every figure here is a driver-side fold of an already-reduced
frame — ≤ 10^score_precision+1 curve points, ≤ n_tiles decile rows — never
a collect of the scored dataset itself.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..functions import metrics as M


def _rows(df: DataFrame) -> list[dict]:
    return [r.asDict() for r in df.collect()]


def log_evaluation_figures(
    tracker,
    scored: DataFrame,
    label_col: str = "label",
    proba_col: str = "pos_proba",
    tiebreak_col: str | None = None,
    score_precision: int = 3,
    n_tiles: int = 10,
    render_dir: str | None = None,
) -> dict[str, list[dict]]:
    """Log the three reference evaluation figures as tracker assets:
    ``figure_roc_curve`` (visualizer.py:77-110), ``figure_pr_curve``
    (:111-140), and — when a ``tiebreak_col`` is given — ``figure_lift_gains``
    (:141-183). Returns the logged payloads (also handy for tests).

    If ``render_dir`` is set AND matplotlib is importable, PNGs are written
    there and logged as ``figure_*_png`` path assets; without matplotlib
    the data assets alone are the deliverable."""
    figures: dict[str, list[dict]] = {
        "figure_roc_curve": _rows(
            M.roc_curve(scored, label_col, proba_col, score_precision)
        ),
        "figure_pr_curve": _rows(
            M.precision_recall_curve(scored, label_col, proba_col, score_precision)
        ),
    }
    if tiebreak_col is not None:
        figures["figure_lift_gains"] = _rows(
            M.lift_gains(
                scored,
                label_col,
                proba_col,
                tiebreak_col,
                n_tiles=n_tiles,
                score_precision=score_precision,
            )
        )
    for name, payload in figures.items():
        tracker.log_asset(name, payload)
    if render_dir is not None:
        _render_pngs(tracker, figures, render_dir)
    return figures


def _render_pngs(tracker, figures: dict[str, list[dict]], render_dir: str) -> None:
    """Optional raster rendering — import-gated; data assets already logged."""
    try:  # pragma: no cover - matplotlib absent from this container
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    os.makedirs(render_dir, exist_ok=True)  # pragma: no cover
    axes = {  # pragma: no cover
        "figure_roc_curve": ("fpr", "tpr"),
        "figure_pr_curve": ("recall", "precision"),
        "figure_lift_gains": ("decile", "lift"),
    }
    for name, rows in figures.items():  # pragma: no cover
        if not rows:
            continue
        x_key, y_key = axes[name]
        fig, ax = plt.subplots()
        ax.plot([r[x_key] for r in rows], [r[y_key] for r in rows])
        ax.set_xlabel(x_key)
        ax.set_ylabel(y_key)
        ax.set_title(name)
        path = os.path.join(render_dir, f"{name}.png")
        fig.savefig(path)
        plt.close(fig)
        tracker.log_asset(f"{name}_png", path)
