"""Hamming-kernel bandwidth sweep for large-n KSD quality.

The base kernel is k(z1,z2) = exp(-||z1-z2||_1 / (n·ℓ)) (reference
``stein_utils.py:30-55``) with ℓ = 1 in every shipped config — tuned (if at
all) at n = 3. At n = 16-24 the same ℓ makes the kernel 5-8x flatter per
bit, which plausibly under-weights local discrepancies and is a candidate
cause of the large-n KSD optimization gap (direct fits reach 0.02-0.04
where KSD stalls at 0.05-0.13, RESULTS.md). Sweep ℓ at fixed budget.

Usage: python scripts/probe_lengthscale16.py [n] [epochs] [scales...]
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
              else [0.25, 0.5, 1.0, 2.0, 4.0])

    from tensornetworks_tpu.core import get_random_chain_network
    from tensornetworks_tpu.engines import QuantumKSDVariationalInference

    bn = get_random_chain_network(n + 1, seed=0)
    latent = [f"V{i}" for i in range(n)]
    observed = {f"V{n}": 1}
    post = bn.posterior_vector(latent, observed)

    for ls in scales:
        eng = QuantumKSDVariationalInference(
            bn, latent, list(observed), qbm_num_latent_vars=n,
            qbm_ansatz_layers=8, qbm_ansatz_type="bn_structured", seed=0,
            base_kernel_length_scale=ls)
        t0 = time.perf_counter()
        eng.train(observed, num_epochs=epochs, lr_born_machine=0.05,
                  verbose=False, true_posterior_for_tvd=post,
                  chunk_epochs=1500)
        print(f"l={ls}: best TVD {eng.best_tvd_:.4f} "
              f"[{time.perf_counter()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
