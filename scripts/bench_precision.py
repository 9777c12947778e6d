"""Precision/quality A/B on the real TPU: train the quantum-KSD Sprinkler
oracle (the config where DEFAULT precision was measured to cost 24x quality)
and a 16q structured short run under each matmul precision.

Usage: python scripts/bench_precision.py [default high highest]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_one(prec: str):
    os.environ["TNTPU_MATMUL_PRECISION"] = prec
    from tensornetworks_tpu.core import (get_random_chain_network,
                                         get_sprinkler_network)
    from tensornetworks_tpu.engines import QuantumKSDVariationalInference

    # --- 3q Sprinkler oracle (reference config) ---
    bn = get_sprinkler_network()
    post = bn.posterior_vector(["C", "S", "R"], {"W": 1})
    m = QuantumKSDVariationalInference(
        bn, ["C", "S", "R"], ["W"], qbm_num_latent_vars=3,
        qbm_ansatz_layers=4, seed=0)
    t0 = time.time()
    m.train({"W": 1}, num_epochs=1000, lr_born_machine=5e-3,
            true_posterior_for_tvd=post, verbose=False)
    print(f"[{prec}] 3q sprinkler: best TVD {m.best_tvd_:.6f} "
          f"({time.time()-t0:.0f}s)", flush=True)

    # --- 16q structured short run ---
    n = 16
    bn2 = get_random_chain_network(n + 2, seed=7)
    latent = [f"V{i}" for i in range(n)]
    observed = {f"V{n}": 1, f"V{n+1}": 0}
    post2 = bn2.posterior_vector(latent, observed)
    m2 = QuantumKSDVariationalInference(
        bn2, latent, list(observed), qbm_num_latent_vars=n,
        qbm_ansatz_layers=8, qbm_ansatz_type="bn_structured", seed=0)
    t0 = time.time()
    h = m2.train(observed, num_epochs=800, lr_born_machine=0.05,
                 true_posterior_for_tvd=post2, verbose=False,
                 chunk_epochs=400)
    loss = np.asarray(h["loss_ksd"])
    print(f"[{prec}] 16q structured 800ep: best TVD {m2.best_tvd_:.4f} "
          f"loss[-1] {loss[-1]:.5f} eps {h['epochs_per_sec']:.1f} "
          f"({time.time()-t0:.0f}s)", flush=True)


def main():
    precs = sys.argv[1:] or ["highest", "high", "default"]
    for p in precs:
        run_one(p)


if __name__ == "__main__":
    main()
