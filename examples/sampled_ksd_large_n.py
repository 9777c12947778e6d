"""Sampled (U-statistic) KSD-VI at 24 qubits — beyond exact enumeration.

At n=24 the exact Stein path cannot even build its (2^24, 24) float64 score
table (~3.2 GB), and the reference's O(4^n) per-epoch loop would need ~10^14
kernel evaluations per epoch. The sampled engine sidesteps both: scores come
from the network's CPT factors (O(#nodes) per sample, core/factors.py), the
Stein Gram is the closed form on the (M, n) sample matrix, and ∇θ KSD² is
the REINFORCE estimator (exact-gradient-verified in tests).

Measured on one TPU v5e chip: 300 epochs at ~1.0 epochs/s end-to-end with
1024 shots/epoch, including a per-epoch exact-TVD diagnostic (drop
``true_posterior_for_tvd`` to halve the cost — at n ≥ 27 the exact posterior
itself stops being computable and the diagnostic must go).

``chunk_epochs`` splits training into bounded device programs — required on
backends that kill long-running programs (see RESULTS.md), bit-identical
results either way.

Run: python examples/sampled_ksd_large_n.py
"""

import numpy as np

from tensornetworks_tpu import get_random_chain_network
from tensornetworks_tpu.engines import SampledKSDVariationalInference


def main():
    n = 24
    bn = get_random_chain_network(n + 2, seed=11)
    latent = [f"V{i}" for i in range(n)]
    observed = {f"V{n}": 1, f"V{n+1}": 0}
    # Exact posterior for the TVD diagnostic (float64 host table; feasible
    # up to n ≈ 26 — beyond that, train without tracking).
    posterior = bn.posterior_vector(latent, observed).astype(np.float32)

    engine = SampledKSDVariationalInference(
        bn, latent, list(observed.keys()),
        qbm_ansatz_layers=4, qbm_backend="auto", num_samples=1024, seed=0)
    history = engine.train(observed, num_epochs=300, lr_born_machine=0.05,
                           verbose=True, true_posterior_for_tvd=posterior,
                           chunk_epochs=50)
    print(f"U-stat KSD²: {history['loss_ksd'][0]:.2f} -> "
          f"{history['loss_ksd'][-1]:.2f}")
    print(f"best TVD vs exact 2^{n}-state posterior: {engine.best_tvd_:.4f}")
    print(f"throughput: {history['epochs_per_sec']:.2f} epochs/s")


if __name__ == "__main__":
    main()
