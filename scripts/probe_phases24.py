"""LR-annealed warm restarts at 24 qubits (exact KSD, 16.8M states).

Single-phase runs saturate at best TVD ~0.125-0.14 by ~3000 epochs, but the
direct fit proves the ansatz represents the posterior at TVD 0.038
(probe_distill24): the plateau is optimization. Anneal the restarts.

Usage: python scripts/probe_phases24.py [n] [e1] [e2] [e3] [length_scale|auto]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    e1 = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    e2 = int(sys.argv[3]) if len(sys.argv) > 3 else 1500
    e3 = int(sys.argv[4]) if len(sys.argv) > 4 else 1500
    ls = (sys.argv[5] if len(sys.argv) > 5 else 1.0)
    if ls != "auto":
        ls = float(ls)

    from tensornetworks_tpu.core import get_random_chain_network
    from tensornetworks_tpu.engines import QuantumKSDVariationalInference

    bn = get_random_chain_network(n + 1, seed=0)
    latent = [f"V{i}" for i in range(n)]
    observed = {f"V{n}": 1}
    post = bn.posterior_vector(latent, observed)

    eng = QuantumKSDVariationalInference(
        bn, latent, list(observed), qbm_num_latent_vars=n,
        qbm_ansatz_layers=8, qbm_ansatz_type="bn_structured", seed=0,
        base_kernel_length_scale=ls)
    t0 = time.perf_counter()
    best = np.inf
    for epochs, lr in [(e1, 0.05), (e2, 0.005), (e3, 0.001)]:
        eng.train(observed, num_epochs=epochs, lr_born_machine=lr,
                  verbose=False, true_posterior_for_tvd=post,
                  chunk_epochs=100)
        best = min(best, eng.best_tvd_)
        print(f"phase ({epochs} @ {lr}): best TVD {eng.best_tvd_:.4f} "
              f"[{time.perf_counter()-t0:.0f}s cum]", flush=True)
    print(f"RESULT n={n} annealed best TVD {best:.4f} "
          f"({time.perf_counter()-t0:.0f}s total)")


if __name__ == "__main__":
    main()
