"""Quickstart: exact posterior + all three VI engines on the Sprinkler network.

Run: python examples/quickstart.py
"""

from tensornetworks_tpu import (
    AdversarialVariationalInference,
    KSDVariationalInference,
    QuantumKSDVariationalInference,
    calculate_tvd,
    get_sprinkler_network,
)


def main():
    bn = get_sprinkler_network()
    latent, observed = ["C", "S", "R"], {"W": 1}
    posterior, p_obs = bn.get_true_posterior(latent, observed)
    print(f"P(W=1) = {p_obs:.6f}; exact posterior computed by dense enumeration.")

    # --- Quantum KSD VI: PQC Born machine, gradients through the simulator ---
    qksd = QuantumKSDVariationalInference(
        bn, latent, ["W"], qbm_num_latent_vars=3, qbm_ansatz_layers=4,
        qbm_ansatz_type="hardware_efficient",
    )
    qksd.train(observed, num_epochs=1000, lr_born_machine=5e-3,
               true_posterior_for_tvd=posterior, verbose=False)
    print(f"quantum KSD   final TVD: {calculate_tvd(posterior, qksd.get_prob_dict()):.5f}")

    # --- Classical KSD VI: softmax-table Born machine ---
    ksd = KSDVariationalInference(bn, latent, ["W"],
                                  born_machine_config={"conditioning_dim": 0})
    ksd.train(observed, num_epochs=1500, lr_born_machine=5e-3,
              true_posterior_for_tvd=posterior, entropy_weight=1e-3, verbose=False)
    print(f"classical KSD final TVD: {calculate_tvd(posterior, ksd.get_prob_dict()):.5f}")

    # --- Adversarial VI: REINFORCE vs MLP discriminator ---
    advi = AdversarialVariationalInference(
        bn, latent, ["W"],
        born_machine_config={"conditioning_dim": 1, "init_method": "uniform"},
        classifier_config={"hidden_dims": [32, 16]},
    )
    advi.train(observed, num_epochs=800, batch_size=100, lr_born_machine=3e-3,
               lr_classifier=3e-2, k_classifier_steps=5,
               true_posterior_for_tvd=posterior, adam_betas=(0.5, 0.999),
               verbose=False)
    print(f"adversarial   final TVD: {calculate_tvd(posterior, advi.get_prob_dict()):.5f}")


if __name__ == "__main__":
    main()
