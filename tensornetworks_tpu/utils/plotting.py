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
