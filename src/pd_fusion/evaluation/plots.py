"""Run-artifact plots (host-side matplotlib, Agg backend).

Artifact contract matches the reference (src/pd_fusion/evaluation/
plots.py:13-107): five figures — scenario-degradation bars, reliability
diagram, ROC, PR, risk-coverage — and, next to every PNG, a ``.csv``
twin holding the plotted data with the same column names, so downstream
analysis never has to re-derive curves from predictions.

Implementation is table-driven here: each public function assembles a
DataFrame, persists the CSV twin, then hands the draw step to a shared
figure context. seaborn is optional (bar styling only).
"""
import contextlib
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd
from sklearn.calibration import calibration_curve
from sklearn.metrics import precision_recall_curve, roc_curve

try:
    import seaborn as _sns
except Exception:  # pragma: no cover - optional styling dep
    _sns = None


def save_plot_data(df: pd.DataFrame, output_path: Path):
    """Write a figure's underlying data (the CSV half of the contract)."""
    df.to_csv(output_path, index=False)


@contextlib.contextmanager
def _figure(output_path: Path, *, title, xlabel=None, ylabel=None,
            square=False, grid=True):
    """One finished figure: yields the axes, then titles/saves/closes."""
    fig, ax = plt.subplots(figsize=(6, 6) if square else (10, 6))
    try:
        yield ax
        ax.set_title(title)
        if xlabel:
            ax.set_xlabel(xlabel)
        if ylabel:
            ax.set_ylabel(ylabel)
        if grid:
            ax.grid(True, alpha=0.3)
        fig.tight_layout()
        fig.savefig(output_path)
    finally:
        plt.close(fig)


def plot_degradation_curve(results: dict, output_path: Path):
    """ROC/PR-AUC per missingness scenario, as a bar chart."""
    rows = pd.DataFrame(
        {
            "Scenario": list(results),
            "ROC-AUC": [m["roc_auc"] for m in results.values()],
            "PR-AUC": [m["pr_auc"] for m in results.values()],
        }
    )
    save_plot_data(rows, output_path.with_suffix(".csv"))
    with _figure(
        output_path,
        title="Model Robustness: ROC-AUC vs Missingness Scenario",
        ylabel="ROC-AUC",
        grid=False,
    ) as ax:
        if _sns is not None:
            _sns.barplot(data=rows, x="Scenario", y="ROC-AUC", hue="Scenario", ax=ax)
        else:  # pragma: no cover
            ax.bar(rows["Scenario"], rows["ROC-AUC"])
        ax.tick_params(axis="x", rotation=45)
        for lbl in ax.get_xticklabels():
            lbl.set_horizontalalignment("right")


def plot_calibration_curve_func(y_true, y_prob, output_path: Path, model_name="Model"):
    """Reliability diagram over 10 equal-width probability bins."""
    frac_pos, mean_pred = calibration_curve(y_true, y_prob, n_bins=10)
    save_plot_data(
        pd.DataFrame(
            {
                "Mean_Predicted_Probability": mean_pred,
                "Fraction_of_Positives": frac_pos,
            }
        ),
        output_path.with_suffix(".csv"),
    )
    with _figure(
        output_path,
        title=f"Reliability Diagram ({model_name})",
        xlabel="Mean Predicted Probability",
        ylabel="Fraction of Positives",
        square=True,
    ) as ax:
        ax.plot(mean_pred, frac_pos, marker="o", label=model_name)
        ax.plot([0, 1], [0, 1], "k--", label="Perfectly Calibrated")
        ax.legend()


def plot_roc_curve(y_true, y_prob, output_path: Path):
    fpr, tpr, _ = roc_curve(y_true, y_prob)
    save_plot_data(pd.DataFrame({"FPR": fpr, "TPR": tpr}), output_path.with_suffix(".csv"))
    with _figure(
        output_path,
        title="ROC Curve",
        xlabel="False Positive Rate",
        ylabel="True Positive Rate",
        square=True,
    ) as ax:
        ax.plot(fpr, tpr, label="ROC Curve")
        ax.plot([0, 1], [0, 1], "k--")


def plot_pr_curve(y_true, y_prob, output_path: Path):
    precision, recall, _ = precision_recall_curve(y_true, y_prob)
    save_plot_data(
        pd.DataFrame({"Recall": recall, "Precision": precision}),
        output_path.with_suffix(".csv"),
    )
    with _figure(
        output_path,
        title="Precision-Recall Curve",
        xlabel="Recall",
        ylabel="Precision",
        square=True,
    ) as ax:
        ax.plot(recall, precision, label="PR Curve")


def plot_risk_coverage(data: dict, output_path: Path):
    """Selective-prediction curve: error rate among covered samples."""
    save_plot_data(
        pd.DataFrame({"Coverage": data["coverage"], "Risk": data["risk"]}),
        output_path.with_suffix(".csv"),
    )
    with _figure(
        output_path,
        title="Risk-Coverage Curve",
        xlabel="Coverage (Fraction of samples predicted)",
        ylabel="Risk (Error Rate)",
        square=True,
    ) as ax:
        ax.plot(data["coverage"], data["risk"], label="Risk-Coverage")
        ax.set_xlim(0, 1)
        ax.legend()
