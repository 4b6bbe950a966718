"""Results analysis & visualization (the 41_* stage).

Produces, for a chosen result CSV, the same artifact set as the reference
(41_results_analysis_and_visualization.py):

  similarity_score_summary.csv        groupby(case, delegate_type) mean/std (41:40-45)
  metrics/metrics_<case>_<dtype>.csv  classification report per group (41:90-104)
  img/cm_<case>_<dtype>.png           confusion matrices (41:58-73)
  img/similarity_score_distribution.png  boxplot by dtype × case (41:76-88)
  img/<exp>_scores_hist.png           histogram per .npy score file (41:106-125)

Number formatting matches (float_format %.4f).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def find_result_csvs(results_dir: str | Path = "results") -> list[Path]:
    """All result_*.csv under the results root, sorted (41:13-16)."""
    return sorted(Path(results_dir).rglob("result_*.csv"))


def analyze(result_csv: str | Path, make_plots: bool = True) -> dict:
    """Run the full analysis; returns {summary_df, metrics, paths}."""
    import pandas as pd
    from sklearn.metrics import classification_report, confusion_matrix

    result_csv = Path(result_csv)
    df = pd.read_csv(result_csv)
    out_dir = result_csv.parent
    img_dir = out_dir / "img"
    metrics_dir = out_dir / "metrics"

    # [0] similarity summary
    summary = (
        df.groupby(["case", "delegate_type"])["similarity_score"]
        .agg(["mean", "std"]).reset_index()
    )
    summary_path = out_dir / "similarity_score_summary.csv"
    summary.to_csv(summary_path, index=False, float_format="%.4f")

    # Union of true AND predicted classes: in nearest mode a prediction
    # can name a class absent from the test set, and sklearn silently
    # DROPS samples whose prediction is outside ``labels`` — a wrong
    # prediction must appear in the matrix, not vanish. (Identical to
    # true-only labels in the reference's same-class runs, where
    # predicted == true by construction — 41_results:58-73.)
    class_list = sorted(set(df["true_class"]) | set(df["predicted_class"]))
    groups = df.groupby(["case", "delegate_type"])

    metrics: dict[tuple[str, str], "pd.DataFrame"] = {}
    metrics_dir.mkdir(parents=True, exist_ok=True)
    for (case, dtype), gdf in groups:
        report = classification_report(
            gdf["true_class"], gdf["predicted_class"],
            labels=class_list, output_dict=True, zero_division=0,
        )
        rdf = pd.DataFrame(report).transpose()
        rdf.insert(0, "case", case)
        rdf.insert(1, "delegate_type", dtype)
        rdf.to_csv(metrics_dir / f"metrics_{case}_{dtype}.csv",
                   float_format="%.4f")
        metrics[(case, dtype)] = rdf

    plot_paths: list[Path] = []
    if make_plots:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import seaborn as sns

        img_dir.mkdir(parents=True, exist_ok=True)

        # [1] confusion matrices
        for (case, dtype), gdf in groups:
            cm = confusion_matrix(
                gdf["true_class"], gdf["predicted_class"], labels=class_list
            )
            fig, ax = plt.subplots(
                figsize=(max(4, len(class_list)), max(3, len(class_list)))
            )
            im = ax.imshow(cm, cmap="Blues")
            ax.set_xticks(range(len(class_list)))
            ax.set_yticks(range(len(class_list)))
            ax.set_xticklabels(class_list, rotation=45, ha="right")
            ax.set_yticklabels(class_list)
            for r in range(cm.shape[0]):
                for c in range(cm.shape[1]):
                    ax.text(c, r, str(cm[r, c]), ha="center", va="center",
                            color="black" if cm[r, c] < cm.max() / 2 else "white")
            ax.set_xlabel("Predicted")
            ax.set_ylabel("True")
            ax.set_title(f"Confusion Matrix\n{case.upper()} - {dtype}")
            fig.colorbar(im)
            fig.tight_layout()
            p = img_dir / f"cm_{case}_{dtype}.png"
            fig.savefig(p)
            plt.close(fig)
            plot_paths.append(p)

        # [2] score distribution boxplot
        fig = plt.figure(figsize=(12, 6))
        sns.boxplot(data=df, x="delegate_type", y="similarity_score",
                    hue="case")
        plt.title("Similarity score distribution by delegate type")
        plt.ylabel("Cosine Similarity")
        plt.xlabel("Delegate Vector Type")
        plt.legend(title="Case")
        plt.tight_layout()
        p = img_dir / "similarity_score_distribution.png"
        fig.savefig(p)
        plt.close(fig)
        plot_paths.append(p)

        # [4] per-experiment .npy histograms
        score_dir = out_dir / "score_distribution"
        if score_dir.exists():
            for npy_file in sorted(score_dir.glob("*.npy")):
                scores = np.load(npy_file)
                fig = plt.figure()
                sns.histplot(scores, bins=20, kde=len(scores) > 1)
                plt.title(f"Score Distribution: {npy_file.stem}")
                plt.xlabel("Cosine Similarity")
                plt.ylabel("Frequency")
                plt.tight_layout()
                p = img_dir / f"{npy_file.stem}_hist.png"
                fig.savefig(p)
                plt.close(fig)
                plot_paths.append(p)

    return {
        "summary": summary,
        "summary_path": summary_path,
        "metrics": metrics,
        "plots": plot_paths,
    }
