"""Distributed scale runner: the full KSD engine over a device mesh.

CLI: ``tntpu scale --qubits N --mesh D [--ansatz bn_structured] ...``
On a single-host test environment provision virtual devices first (the
tests' conftest does this; standalone:
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` + CPU platform).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..engines.distributed import DistributedQuantumKSDVariationalInference
from ..ops.hamming import resolve_length_scale
from .scale import make_scale_problem


def run_distributed_scale_experiment(num_qubits: int = 8, layers: int = 4,
                                     num_epochs: int = 200, lr: float = 5e-3,
                                     seed: int = 0,
                                     ansatz: str = "hardware_efficient",
                                     num_devices: Optional[int] = None,
                                     chunk_epochs: Optional[int] = None,
                                     verbose: bool = True,
                                     track_tvd: Optional[bool] = None,
                                     lr_phases=None,
                                     length_scale="auto"):
    """``lr_phases``: LR-annealed warm restarts, same semantics as the
    single-chip runner (each phase restarts the cosine schedule from the
    previous best snapshot; across-phase best restored)."""
    bn, latent, observed = make_scale_problem(num_qubits, seed)
    if track_tvd is None:
        track_tvd = num_qubits <= 20
    posterior = bn.posterior_vector(latent, observed) if track_tvd else None

    model = DistributedQuantumKSDVariationalInference(
        bn, latent, list(observed.keys()), qbm_num_latent_vars=num_qubits,
        qbm_ansatz_layers=layers, qbm_ansatz_type=ansatz,
        qbm_init_method="small_random", seed=seed, num_devices=num_devices,
        base_kernel_length_scale=length_scale)
    if verbose:
        print(f"mesh: {model.mesh.devices.size} devices, "
              f"per-device state = 2^{num_qubits}/{model.mesh.shape['state']}")
    phases = list(lr_phases) if lr_phases else [(num_epochs, lr)]
    best_tvd, best_params = np.inf, None
    for phase in phases:
        if len(phase) == 3:
            p_epochs, p_lr, p_ls = phase
            model.base_kernel_length_scale = resolve_length_scale(
                p_ls, num_qubits)
        else:
            p_epochs, p_lr = phase
        history = model.train(observed, num_epochs=int(p_epochs),
                              lr_born_machine=float(p_lr),
                              verbose=verbose, true_posterior_for_tvd=posterior,
                              gradient_clip_norm=10.0, chunk_epochs=chunk_epochs)
        if posterior is not None and model.best_tvd_ < best_tvd:
            best_tvd, best_params = model.best_tvd_, model.best_params_
        if verbose and len(phases) > 1:
            print(f"phase ({int(p_epochs)} epochs @ lr {p_lr}): "
                  f"best TVD {model.best_tvd_:.6f}")
    if best_params is not None:
        model.params = best_params
        model.best_params_ = best_params
        model.best_tvd_ = best_tvd
    if verbose and track_tvd:
        tvds = np.asarray(history["tvd"], dtype=float)
        finite = tvds[np.isfinite(tvds)]
        if finite.size:
            print(f"{num_qubits}-qubit distributed ksd: "
                  f"final TVD {finite[-1]:.6f}, best {finite.min():.6f}")
    return {"history": history, "model": model, "num_qubits": num_qubits}
