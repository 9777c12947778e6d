"""Amortized-inference runner: ONE conditional Born machine trained over
every observation of the evidence variable simultaneously (beyond-reference
capability — the reference trains one model per observation and its quantum
conditioning is an unimplemented warning stub, ``quantum_born_machine.py:
132-137``).

CLI: ``tntpu amortized --qubits N [--quantum] [--ansatz bn_structured] ...``
"""

from __future__ import annotations

import numpy as np

from ..core import calculate_tvd
from ..engines.amortized import AmortizedKSD
from .scale import make_scale_problem


def run_amortized_experiment(num_qubits: int = 4, num_epochs: int = 1500,
                             lr: float = 3e-3, layers: int = 4,
                             quantum: bool = False,
                             ansatz: str = "hardware_efficient",
                             entropy_weight: float = 1e-3, seed: int = 0,
                             verbose: bool = True, mesh=None,
                             reupload: bool = False,
                             length_scale="auto",
                             chunk_epochs=None, lr_phases=None,
                             learned_embedding: bool = False,
                             embed_per_layer: bool = False):
    bn, latent, observed = make_scale_problem(num_qubits, seed)
    obs_var = list(observed.keys())[0]
    observations = [{obs_var: 0}, {obs_var: 1}]

    if quantum:
        from ..models import QuantumBornMachine
        from ..sim.structured import latent_edges

        edges = (latent_edges(bn, latent) if ansatz == "bn_structured"
                 else None)
        qbm = QuantumBornMachine(num_qubits, ansatz_layers=layers,
                                 conditioning_dim=1, ansatz_type=ansatz,
                                 edges=edges, cond_reupload=reupload,
                                 cond_learned_embedding=learned_embedding,
                                 cond_embed_per_layer=embed_per_layer)
        model = AmortizedKSD(bn, latent, [obs_var], born_machine=qbm,
                             seed=seed, base_kernel_length_scale=length_scale)
    else:
        model = AmortizedKSD(bn, latent, [obs_var],
                             born_machine_config={"use_logits": True,
                                                  "dropout_rate": 0.0},
                             seed=seed, base_kernel_length_scale=length_scale)

    history = model.train(observations, num_epochs=num_epochs, lr=lr,
                          entropy_weight=entropy_weight, verbose=verbose,
                          seed=seed, mesh=mesh, chunk_epochs=chunk_epochs,
                          lr_phases=lr_phases)

    per_obs_tvd = {}
    for obs in observations:
        post = bn.posterior_vector(latent, obs)
        q = np.asarray(model.posterior_for(obs))
        per_obs_tvd[obs[obs_var]] = float(0.5 * np.abs(q - post).sum())
    if verbose:
        kind = "quantum" if quantum else "classical"
        print(f"amortized {kind} KSD at {num_qubits}q ({ansatz if quantum else 'MLP'}): "
              + ", ".join(f"TVD[{obs_var}={k}]={v:.4f}"
                          for k, v in sorted(per_obs_tvd.items())))
    return {"history": history, "model": model, "per_obs_tvd": per_obs_tvd}
