"""Bandwidth x seed cross-check at 20q: is the single-seed argmin l=0.1
(TVD 0.0229 vs 0.0550 at l=0.05, RESULTS.md) a bandwidth effect or basin
luck? Runs a small (scales x seeds) grid at the 6k-epoch budget.

Usage: python scripts/probe_lengthscale20_seeds.py [n] [epochs] [seeds] [scales...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 6000
    n_seeds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    scales = ([float(x) for x in sys.argv[4:]] if len(sys.argv) > 4
              else [0.05, 0.1])

    from tensornetworks_tpu.core import get_random_chain_network
    from tensornetworks_tpu.engines import QuantumKSDVariationalInference

    bn = get_random_chain_network(n + 1, seed=0)
    latent = [f"V{i}" for i in range(n)]
    observed = {f"V{n}": 1}
    post = bn.posterior_vector(latent, observed)

    table = {}
    for ls in scales:
        row = []
        for seed in range(n_seeds):
            eng = QuantumKSDVariationalInference(
                bn, latent, list(observed), qbm_num_latent_vars=n,
                qbm_ansatz_layers=8, qbm_ansatz_type="bn_structured",
                seed=seed, base_kernel_length_scale=ls)
            t0 = time.perf_counter()
            eng.train(observed, num_epochs=epochs, lr_born_machine=0.05,
                      verbose=False, true_posterior_for_tvd=post,
                      chunk_epochs=1500)
            row.append(eng.best_tvd_)
            print(f"l={ls} seed={seed}: best TVD {eng.best_tvd_:.4f} "
                  f"[{time.perf_counter()-t0:.0f}s]", flush=True)
        table[ls] = row
        r = np.asarray(row)
        print(f"l={ls}: mean {r.mean():.4f} +- {r.std():.4f} "
              f"(min {r.min():.4f})", flush=True)
    best = min(table, key=lambda k: float(np.mean(table[k])))
    print(f"RESULT n={n} epochs={epochs} seeds={n_seeds} "
          f"mean-argmin l={best} ({float(np.mean(table[best])):.4f})")


if __name__ == "__main__":
    main()
