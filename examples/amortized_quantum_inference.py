"""Amortized quantum inference: one conditioned PQC answers every query.

The reference's ``conditioning_dim`` is an unimplemented warning stub
(``quantum_born_machine.py:132-137``); here the observation is angle-embedded
into the circuit and a single parameter vector is trained against all
observations simultaneously (vmapped KSD).

Run: python examples/amortized_quantum_inference.py
"""

import numpy as np

from tensornetworks_tpu import calculate_tvd, get_sprinkler_network
from tensornetworks_tpu.engines import AmortizedKSD
from tensornetworks_tpu.models import QuantumBornMachine


def main():
    bn = get_sprinkler_network()
    observations = [{"W": 0}, {"W": 1}]

    qbm = QuantumBornMachine(3, ansatz_layers=4, conditioning_dim=1)
    engine = AmortizedKSD(bn, ["C", "S", "R"], ["W"], born_machine=qbm)
    engine.train(observations, num_epochs=1500, lr=5e-3, verbose=True)

    for obs in observations:
        true_post, _ = bn.get_true_posterior(["C", "S", "R"], obs)
        q = np.asarray(engine.posterior_for(obs))
        learned = {k: float(q[i]) for i, k in enumerate(sorted(true_post))}
        print(f"x={obs}: TVD vs exact posterior = "
              f"{calculate_tvd(true_post, learned):.5f}")


if __name__ == "__main__":
    main()
