from .plotting import plot_training_results

__all__ = ["plot_training_results"]
