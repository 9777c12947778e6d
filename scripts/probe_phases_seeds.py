"""Seed stability of the LR-annealed warm-restart schedule at 16q: does
annealing also lift the unlucky seeds, or only polish the good ones?
(Single-phase 48k seeds: mean 0.0506 ± 0.0192, min 0.0267 — RESULTS.md.)

Usage: python scripts/probe_phases_seeds.py [n] [seeds] [length_scale|auto]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PHASES = [(48000, 0.05), (24000, 0.005), (24000, 0.001)]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    ls = (sys.argv[3] if len(sys.argv) > 3 else 1.0)
    if ls != "auto":
        ls = float(ls)

    from tensornetworks_tpu.core import get_random_chain_network
    from tensornetworks_tpu.engines import QuantumKSDVariationalInference

    bn = get_random_chain_network(n + 1, seed=0)
    latent = [f"V{i}" for i in range(n)]
    observed = {f"V{n}": 1}
    post = bn.posterior_vector(latent, observed)

    bests = []
    for seed in range(seeds):
        eng = QuantumKSDVariationalInference(
            bn, latent, list(observed), qbm_num_latent_vars=n,
            qbm_ansatz_layers=8, qbm_ansatz_type="bn_structured", seed=seed,
            base_kernel_length_scale=ls)
        t0 = time.perf_counter()
        best = np.inf
        for epochs, lr in PHASES:
            eng.train(observed, num_epochs=epochs, lr_born_machine=lr,
                      verbose=False, true_posterior_for_tvd=post,
                      chunk_epochs=1500)
            best = min(best, eng.best_tvd_)
        bests.append(best)
        print(f"seed {seed}: annealed best TVD {best:.4f} "
              f"[{time.perf_counter()-t0:.0f}s]", flush=True)
    b = np.asarray(bests)
    print(f"RESULT n={n} seeds={seeds} ls={ls} annealed best_tvd mean={b.mean():.4f} "
          f"std={b.std():.4f} min={b.min():.4f} max={b.max():.4f}")


if __name__ == "__main__":
    main()
