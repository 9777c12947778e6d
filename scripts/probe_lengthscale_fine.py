"""Fine Hamming-bandwidth sweep + annealed restarts at the best scale.

The coarse sweep (probe_lengthscale16) found sharper-is-better down to
l=0.25 (0.0259 vs 0.0403 at the reference's l=1, same 6k budget). This
refines the sweep below 0.25, then runs the 3-phase annealed schedule at
the argmin to combine both levers.

Usage: python scripts/probe_lengthscale_fine.py [n] [epochs] [scales...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 6000
    scales = ([float(s) for s in sys.argv[3:]] if len(sys.argv) > 3
              else [0.0625, 0.1, 0.15, 0.2, 0.3])

    from tensornetworks_tpu.core import get_random_chain_network
    from tensornetworks_tpu.engines import QuantumKSDVariationalInference

    bn = get_random_chain_network(n + 1, seed=0)
    latent = [f"V{i}" for i in range(n)]
    observed = {f"V{n}": 1}
    post = bn.posterior_vector(latent, observed)

    def make(ls):
        return QuantumKSDVariationalInference(
            bn, latent, list(observed), qbm_num_latent_vars=n,
            qbm_ansatz_layers=8, qbm_ansatz_type="bn_structured", seed=0,
            base_kernel_length_scale=ls)

    results = {}
    for ls in scales:
        eng = make(ls)
        t0 = time.perf_counter()
        eng.train(observed, num_epochs=epochs, lr_born_machine=0.05,
                  verbose=False, true_posterior_for_tvd=post,
                  chunk_epochs=1500)
        results[ls] = eng.best_tvd_
        print(f"l={ls}: best TVD {eng.best_tvd_:.4f} "
              f"[{time.perf_counter()-t0:.0f}s]", flush=True)

    best_ls = min(results, key=results.get)
    print(f"argmin l={best_ls} ({results[best_ls]:.4f}); running annealed "
          f"3-phase schedule at that scale", flush=True)
    eng = make(best_ls)
    best = np.inf
    t0 = time.perf_counter()
    for ph_epochs, lr in [(48000, 0.05), (24000, 0.005), (24000, 0.001)]:
        eng.train(observed, num_epochs=ph_epochs, lr_born_machine=lr,
                  verbose=False, true_posterior_for_tvd=post,
                  chunk_epochs=1500)
        best = min(best, eng.best_tvd_)
        print(f"  phase ({ph_epochs} @ {lr}): best TVD {eng.best_tvd_:.4f} "
              f"[{time.perf_counter()-t0:.0f}s cum]", flush=True)
    print(f"RESULT n={n} l={best_ls} annealed best TVD {best:.4f}")


if __name__ == "__main__":
    main()
