"""DAG-structured ansatz at 16 qubits — the cold-start trainability fix.

Hardware-efficient circuits stall at TVD ≈ 0.82 under cold-start KSD at 16
qubits, at any depth, length scale, or init scheme (RESULTS.md "Objective
quality at scale"). Wiring the entanglers along the Bayesian network's own
edges (`ansatz_type="bn_structured"`; same 3·L·n parameter count) fixes it:
measured best TVD ≈ **0.15** after 3000 epochs and **0.064** after 12000
(one TPU v5e chip; float-op ordering varies slightly across executor
versions) — and the edges are derived from the network automatically.

Run: python examples/structured_ansatz_16_qubits.py
"""

from tensornetworks_tpu import get_random_chain_network
from tensornetworks_tpu.engines import QuantumKSDVariationalInference


def main():
    n = 16
    bn = get_random_chain_network(n + 2, seed=7)
    latent = [f"V{i}" for i in range(n)]
    observed = {f"V{n}": 1, f"V{n+1}": 0}
    posterior = bn.posterior_vector(latent, observed)

    model = QuantumKSDVariationalInference(
        bn, latent, list(observed.keys()), qbm_num_latent_vars=n,
        qbm_ansatz_layers=8, qbm_ansatz_type="bn_structured",
    )
    print(f"auto-derived entangling map: {model.born_machine.edges}")
    history = model.train(observed, num_epochs=3000, lr_born_machine=0.05,
                          true_posterior_for_tvd=posterior, verbose=True,
                          chunk_epochs=1000)
    print(f"best TVD vs exact 2^{n}-state posterior: {model.best_tvd_:.4f} "
          f"(hardware_efficient cold start: ~0.82)")
    print(f"throughput: {history['epochs_per_sec']:.1f} epochs/s")


if __name__ == "__main__":
    main()
