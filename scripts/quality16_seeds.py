"""Seed stability of the 16q bn_structured quality configuration.

The driver metric (`bench.py` quality_path) reports seed 0; this probe runs
K seeds of the same engine configuration to report mean/std/min best-TVD —
feasible interactively only at the round-3 engine rates (415 eps: a seed
costs ~15 s where round 2 needed ~4 min).

Usage: python scripts/quality16_seeds.py [n] [epochs] [chunk] [seeds]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 6000
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 1500
    seeds = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    from tensornetworks_tpu import get_random_chain_network
    from tensornetworks_tpu.engines import QuantumKSDVariationalInference

    bn = get_random_chain_network(n + 1, seed=0)
    latent = [f"V{i}" for i in range(n)]
    observed = {f"V{n}": 1}
    post = bn.posterior_vector(latent, observed)

    best = []
    t0 = time.perf_counter()
    for seed in range(seeds):
        eng = QuantumKSDVariationalInference(
            bn, latent, list(observed), qbm_num_latent_vars=n,
            qbm_ansatz_layers=8, qbm_ansatz_type="bn_structured", seed=seed)
        h = eng.train(observed, num_epochs=epochs, lr_born_machine=0.05,
                      verbose=False, true_posterior_for_tvd=post,
                      chunk_epochs=chunk, seed=seed)
        best.append(eng.best_tvd_)
        print(f"seed {seed}: best TVD {eng.best_tvd_:.4f} "
              f"(steady {h.get('epochs_per_sec_steady', float('nan')):.1f} eps)")
    b = np.asarray(best)
    print(f"RESULT n={n} epochs={epochs} seeds={seeds} "
          f"best_tvd mean={b.mean():.4f} std={b.std():.4f} "
          f"min={b.min():.4f} max={b.max():.4f} wall={time.perf_counter()-t0:.0f}s")


if __name__ == "__main__":
    main()
