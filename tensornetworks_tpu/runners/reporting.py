"""Console reporting shared by the runners: truth-vs-learned tables and
stability statistics (parity with the reference runners' final reports,
``run_sprinkler_ksd.py:124-188``, ``run_sprinkler_adversarial.py:149-212``)."""

from __future__ import annotations

import numpy as np


def print_final_report(latent_vars, observed, true_posterior: dict, learned: dict,
                       final_tvd: float):
    print("\n--- Final Comparison: True vs Learned Posterior ---")
    header = f"{'Assignment (' + ','.join(latent_vars) + ')':<24}{'True':>12}{'Learned':>12}{'|diff|':>12}"
    print(header)
    print("-" * len(header))
    for key in sorted(true_posterior):
        t = true_posterior[key]
        l = learned.get(key, 0.0)
        print(f"{str(key):<24}{t:>12.6f}{l:>12.6f}{abs(t - l):>12.6f}")
    print("-" * len(header))
    print(f"Final TVD vs true posterior (evidence {observed}): {final_tvd:.6f}")


def print_stability_stats(history: dict, key: str = "tvd"):
    vals = np.asarray(history.get(key, []), dtype=float)
    vals = vals[np.isfinite(vals)]
    if vals.size:
        n = vals.size
        early = vals[: n // 4] if n >= 8 else vals
        late = vals[-n // 4 :] if n >= 8 else vals
        print(f"\nTVD stats: mean {vals.mean():.6f} | std {vals.std():.6f} | min {vals.min():.6f}")
        print(f"Stability: early-std {early.std():.6f} -> late-std {late.std():.6f}")
    # Throughput prints even when TVD tracking is off (track_tvd=False is
    # the norm for the n >= 22 runs, where the steady rate matters most).
    if "epochs_per_sec" in history:
        steady = history.get("epochs_per_sec_steady")
        print(f"Throughput: {history['epochs_per_sec']:.1f} epochs/s "
              f"({history.get('train_seconds', float('nan')):.3f}s total"
              + (f"; steady {steady:.1f} epochs/s post-compile chunks"
                 if steady else "") + ")")
