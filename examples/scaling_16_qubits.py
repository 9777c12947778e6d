"""Large-n demo: 16-qubit quantum KSD-VI on a random 17-variable network.

The reference caps out at 3 latent variables (its per-epoch cost is 4^n
Python-scalar Stein evaluations); here the Stein Gram is a Kronecker-factored
operator and each epoch is a few MXU matmuls (~4 ms on one TPU v5e chip).

Run: python examples/scaling_16_qubits.py
"""

from tensornetworks_tpu import QuantumKSDVariationalInference, get_random_chain_network


def main():
    n = 16
    bn = get_random_chain_network(n + 1, seed=0)
    latent = [f"V{i}" for i in range(n)]
    observed = {f"V{n}": 1}
    posterior = bn.posterior_vector(latent, observed)

    model = QuantumKSDVariationalInference(
        bn, latent, list(observed.keys()), qbm_num_latent_vars=n,
        qbm_ansatz_layers=4, qbm_ansatz_type="hardware_efficient",
    )
    history = model.train(observed, num_epochs=500, lr_born_machine=5e-3,
                          true_posterior_for_tvd=posterior, verbose=True)
    print(f"best TVD vs exact 2^{n}-state posterior: {model.best_tvd_:.5f}")
    print(f"throughput: {history['epochs_per_sec']:.1f} epochs/s")


if __name__ == "__main__":
    main()
