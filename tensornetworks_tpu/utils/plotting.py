"""Training-curve plotting. Parity: ``utils.py:38-67`` (reference
``plot_training_results``) with headless-friendly save-to-file support."""

from __future__ import annotations

from typing import Optional

import numpy as np


def plot_training_results(results_dict: dict, title: str = "Training Results",
                          save_path: Optional[str] = None, show: bool = False):
    """Stacked per-metric line plots, one panel per history key."""
    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    metrics = {k: v for k, v in results_dict.items()
               if isinstance(v, (list, np.ndarray)) and np.ndim(v) == 1 and len(v) > 1}
    if not metrics:
        print("No results to plot.")
        return None

    fig, axes = plt.subplots(len(metrics), 1, figsize=(10, len(metrics) * 3), sharex=True)
    if len(metrics) == 1:
        axes = [axes]
    for ax, (name, values) in zip(axes, metrics.items()):
        ax.plot(range(len(values)), values, label=name)
        ax.set_ylabel(name.replace("_", " ").title())
        ax.legend()
        ax.grid(True)
    axes[-1].set_xlabel("Epoch")
    fig.suptitle(title, fontsize=16)
    plt.tight_layout(rect=[0, 0, 1, 0.96])
    if save_path:
        fig.savefig(save_path, dpi=120)
        print(f"Saved plot to {save_path}")
    if show:
        plt.show()
    else:
        plt.close(fig)
    return fig


def plot_posterior_comparison(true_posterior: dict, learned: dict,
                              title: str = "True vs Learned Posterior",
                              save_path: Optional[str] = None, show: bool = False):
    """Grouped bar chart of true vs learned probabilities per outcome —
    the reference's final comparison figure (``run_sprinkler_ksd.py:189-220``)."""
    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    keys = sorted(true_posterior)
    x = np.arange(len(keys))
    t = [true_posterior[k] for k in keys]
    l = [learned.get(k, 0.0) for k in keys]
    width = 0.38
    fig, ax = plt.subplots(figsize=(max(8, len(keys) * 0.8), 5))
    ax.bar(x - width / 2, t, width, label="True", alpha=0.85)
    ax.bar(x + width / 2, l, width, label="Learned", alpha=0.85)
    ax.set_xticks(x)
    ax.set_xticklabels(["".join(map(str, k)) for k in keys],
                       rotation=45 if len(keys) > 8 else 0)
    ax.set_ylabel("Probability")
    ax.set_title(title)
    ax.legend()
    ax.grid(True, axis="y", alpha=0.3)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        print(f"Saved plot to {save_path}")
    if show:
        plt.show()
    else:
        plt.close(fig)
    return fig
