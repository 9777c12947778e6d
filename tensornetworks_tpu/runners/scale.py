"""Large-n scaling experiments (BASELINE.json configs 4-5): the 8-variable
custom Bayesian network with an 8-qubit entangling-ansatz Born machine under
both objectives, and the 16/20-qubit large-state-space KSD throughput runs.

These are the regimes the reference cannot reach (its per-epoch cost is
4^n Python-scalar Stein evaluations, ``ksd_vi.py:114-131``): at n=16 that is
4.3e9 pairs per epoch; here an epoch is O(n²·2^n) MXU work via the
Kronecker-factorized Stein matvec.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

from ..core import calculate_tvd, get_random_chain_network
from ..ops.hamming import resolve_length_scale
from ..engines import AdversarialVariationalInference, QuantumKSDVariationalInference
from .reporting import print_stability_stats


def make_scale_problem(num_qubits: int, seed: int = 0):
    """num_qubits latent vars + 1 observed var, random CPT DAG."""
    bn = get_random_chain_network(num_qubits + 1, seed=seed)
    latent = [f"V{i}" for i in range(num_qubits)]
    observed = {f"V{num_qubits}": 1}
    return bn, latent, observed


def run_scale_experiment(num_qubits: int = 8, layers: int = 4, num_epochs: int = 200,
                         lr: float = 5e-3, objective: str = "ksd", seed: int = 0,
                         verbose: bool = True, track_tvd: Optional[bool] = None,
                         ansatz: str = "hardware_efficient",
                         chunk_epochs: Optional[int] = None,
                         resume_state_path: Optional[str] = None,
                         temper_betas=None, backend: str = "auto",
                         num_samples: int = 1024,
                         checkpoint_path: Optional[str] = None,
                         grad_method: str = "auto",
                         grad_baseline: str = "loo",
                         warm_start: Optional[str] = None,
                         warm_start_epochs: int = 2000,
                         lr_phases=None,
                         length_scale="auto",
                         adv_batch_size: int = 256,
                         adv_k_classifier: int = 3,
                         adv_lr_classifier_mult: float = 10.0):
    """``chunk_epochs``/``resume_state_path``/``temper_betas``/``backend``
    plumb straight into the quantum KSD engine (see
    ``QuantumKSDVariationalInference.train``); ``num_samples`` applies to
    ``objective='sampled-ksd'`` only.

    ``warm_start='marginals'`` (ksd objective only): before KSD training,
    distill the Born machine toward the product of exact posterior marginals
    (``engines.marginals_product`` + ``fit_born_machine``) and start from the
    fitted parameters — the reference has no warm-start mechanism at all.
    Measured NEGATIVE for ``bn_structured`` (RESULTS.md), positive for
    ``hardware_efficient``.

    ``length_scale``: Hamming base-kernel bandwidth (float or ``'auto'``,
    the default here — the measured per-n optimum: ``1/n`` for n <= 17,
    ``2/n`` from n >= 18; see ``ops.hamming.resolve_length_scale``). The
    reference's ``l=1`` was tuned at n=3 and is measurably 3-7x worse in
    final TVD at n >= 16 (RESULTS.md bandwidth sweeps); the Sprinkler
    parity runners keep the reference default.

    ``lr_phases`` (ksd and adversarial objectives): list of ``(epochs, lr)``
    or ``(epochs, lr, length_scale)`` — LR-
    annealed warm restarts. Each phase restarts the cosine schedule from the
    previous phase's best-TVD snapshot at its own peak LR; overrides
    ``num_epochs``/``lr``. Measured at 16q: (48000, 0.05), (24000, 0.005),
    (24000, 0.001) reaches best TVD 0.0201 vs 0.0267 single-phase
    (RESULTS.md). For the adversarial objective the discriminator LR stays
    10x the Born LR per phase and the length-scale field is ignored (no
    kernel); each phase restarts REINFORCE from the best snapshot with
    fresh sample noise. The returned history is the final phase's; the
    model is left restored at the across-phase best parameters.

    ``adv_batch_size``/``adv_k_classifier``/``adv_lr_classifier_mult``
    (adversarial objective only): REINFORCE batch size (the gradient-noise
    lever — the adversarial analogue of sampled-KSD shots), discriminator
    steps per Born step, and the per-phase lr_D/lr_G ratio. Defaults are
    the reference's Sprinkler settings (256 / 3 / 10)."""
    bn, latent, observed = make_scale_problem(num_qubits, seed)
    # Exact posterior tracking is cheap up to ~20 vars (dense 2^n vector).
    if track_tvd is None:
        track_tvd = num_qubits <= 20
    posterior = bn.posterior_vector(latent, observed) if track_tvd else None

    if objective == "ksd":
        model = QuantumKSDVariationalInference(
            bn, latent, list(observed.keys()), qbm_num_latent_vars=num_qubits,
            qbm_ansatz_layers=layers, qbm_ansatz_type=ansatz,
            qbm_init_method="small_random", seed=seed, qbm_backend=backend,
            base_kernel_length_scale=length_scale,
        )
        if warm_start is not None:
            if warm_start != "marginals":
                raise ValueError(f"unknown warm_start {warm_start!r}; "
                                 "expected 'marginals'")
            from ..engines import fit_born_machine, marginals_product

            target = (posterior if posterior is not None
                      else bn.posterior_vector(latent, observed))
            surrogate = marginals_product(target, num_qubits)
            t0 = time.perf_counter()
            warm_params, wh = fit_born_machine(
                model.born_machine, surrogate,
                num_epochs=warm_start_epochs, lr=0.05,
                chunk_epochs=chunk_epochs, seed=seed)
            model.params = warm_params
            if verbose:
                print(f"warm start: TVD(model, marginals surrogate) = "
                      f"{wh['best_tvd']:.4f} in {time.perf_counter()-t0:.0f}s")
        phases = list(lr_phases) if lr_phases else [(num_epochs, lr)]
        best_tvd, best_params = np.inf, None
        for phase in phases:
            # Optional third element: a per-phase kernel length scale
            # (bandwidth annealing — train smooth first, sharpen later).
            if len(phase) == 3:
                p_epochs, p_lr, p_ls = phase
                model.base_kernel_length_scale = resolve_length_scale(
                    p_ls, num_qubits)
            else:
                p_epochs, p_lr = phase
            history = model.train(observed, num_epochs=int(p_epochs),
                                  lr_born_machine=float(p_lr),
                                  verbose=verbose,
                                  true_posterior_for_tvd=posterior,
                                  gradient_clip_norm=10.0,
                                  chunk_epochs=chunk_epochs,
                                  resume_state_path=resume_state_path,
                                  temper_betas=temper_betas,
                                  checkpoint_path=checkpoint_path)
            # Each train() restores its own phase-best into model.params (so
            # the next phase restarts from it), but a later phase can end
            # worse than an earlier one — keep the across-phase best.
            if posterior is not None and model.best_tvd_ < best_tvd:
                best_tvd, best_params = model.best_tvd_, model.best_params_
            if verbose and len(phases) > 1:
                print(f"phase ({int(p_epochs)} epochs @ lr {p_lr}): "
                      f"best TVD {model.best_tvd_:.6f}")
        if best_params is not None:
            model.params = best_params
            model.best_params_ = best_params
            model.best_tvd_ = best_tvd
    elif objective == "adversarial":
        # BASELINE.json config 4: quantum Born machine under the adversarial
        # objective (a combination the reference never wired up).
        from ..models import QuantumBornMachine

        edges = None
        if ansatz == "bn_structured":
            from ..sim.structured import latent_edges

            edges = latent_edges(bn, latent)
        qbm = QuantumBornMachine(num_qubits, ansatz_layers=layers,
                                 ansatz_type=ansatz, edges=edges,
                                 init_method="small_random")
        model = AdversarialVariationalInference(
            bn, latent, list(observed.keys()),
            born_machine=qbm,
            classifier_config={"hidden_dims": [max(2 * num_qubits, 32),
                                               max(num_qubits, 16)]},
            seed=seed,
        )
        # LR-annealed warm restarts (round 5): same semantics as the KSD
        # branch — each phase restarts both cosine schedules from the
        # previous phase's best-TVD snapshot (train() restores it into
        # model.born_params / classifier_vars) at its own peak LR. A phase
        # entry's optional third element is ignored here (no kernel to
        # anneal under this objective).
        adv_phases = ([(int(p[0]), float(p[1])) for p in lr_phases]
                      if lr_phases else [(num_epochs, lr)])
        best_tvd, best_born, best_clf = np.inf, None, None
        for pi, (p_epochs, p_lr) in enumerate(adv_phases):
            history = model.train(observed, num_epochs=p_epochs,
                                  batch_size=adv_batch_size,
                                  lr_born_machine=p_lr,
                                  lr_classifier=adv_lr_classifier_mult * p_lr,
                                  k_classifier_steps=adv_k_classifier,
                                  k_born_steps=1,
                                  verbose=verbose,
                                  true_posterior_for_tvd=posterior,
                                  gradient_clip_norm=5.0, baseline_decay=0.95,
                                  adam_betas=(0.5, 0.999),
                                  chunk_epochs=chunk_epochs,
                                  resume_state_path=resume_state_path,
                                  seed=seed + 7919 * pi,
                                  # finite log p(x|z) clamp: the reference's
                                  # ±inf edge semantics freeze REINFORCE from
                                  # n ≈ 16 (engines/advi.py log_p_floor note)
                                  log_p_floor=60.0)
            if posterior is not None and model.best_tvd_ < best_tvd:
                best_tvd = model.best_tvd_
                best_born, best_clf = model.born_params, model.classifier_vars
            if verbose and len(adv_phases) > 1:
                print(f"phase ({p_epochs} epochs @ lr {p_lr}): "
                      f"best TVD {model.best_tvd_:.6f}")
        if best_born is not None:
            model.born_params, model.classifier_vars = best_born, best_clf
            model.best_tvd_ = best_tvd
    elif objective == "sampled-ksd":
        # Past-exact-enumeration path (no reference counterpart): sampled
        # U-statistic KSD with CPT-factored scores (engines/sampled.py).
        from ..engines import SampledKSDVariationalInference

        model = SampledKSDVariationalInference(
            bn, latent, list(observed.keys()), qbm_ansatz_layers=layers,
            qbm_ansatz_type="hardware_efficient",
            qbm_init_method="small_random", num_samples=num_samples, seed=seed,
            qbm_grad_method=grad_method, grad_baseline=grad_baseline,
            base_kernel_length_scale=length_scale,
        )
        history = model.train(observed, num_epochs=num_epochs,
                              lr_born_machine=lr, verbose=verbose,
                              true_posterior_for_tvd=posterior,
                              gradient_clip_norm=10.0,
                              chunk_epochs=(chunk_epochs if chunk_epochs
                                            else (50 if num_qubits >= 20 else None)))
    else:
        raise ValueError(f"unknown objective {objective!r}")

    if verbose:
        tvds = np.asarray(history["tvd"], dtype=float)
        finite = tvds[np.isfinite(tvds)]
        if finite.size:
            print(f"{num_qubits}-qubit {objective}: final TVD {finite[-1]:.6f}, "
                  f"best {finite.min():.6f}")
        print_stability_stats(history)
    return {"history": history, "model": model, "num_qubits": num_qubits,
            "objective": objective}


def run_sampling_throughput(num_qubits: int = 20, layers: int = 2,
                            num_samples: int = 1 << 16, verbose: bool = True,
                            backend: str = "auto"):
    """20-qubit batched statevector Born machine sampling stress
    (BASELINE.json config 5): forward + categorical sampling throughput."""
    import jax
    import jax.numpy as jnp

    from ..models import QuantumBornMachine

    qbm = QuantumBornMachine(num_qubits, ansatz_layers=layers,
                             ansatz_type="hardware_efficient", backend=backend)
    params = qbm.init(jax.random.PRNGKey(0))

    @jax.jit
    def draw(key, p):
        return qbm.sample(key, p, num_samples)

    key = jax.random.PRNGKey(1)
    s = draw(key, params)
    float(s[0, 0])
    t0 = time.perf_counter()
    reps = 5
    for i in range(reps):
        s = draw(jax.random.fold_in(key, i), params)
    float(s[0, 0])  # value fetch, not block_until_ready (axon timing quirk)
    dt = (time.perf_counter() - t0) / reps
    rate = num_samples / dt
    if verbose:
        print(f"{num_qubits}-qubit sampling: {rate:,.0f} samples/s "
              f"({num_samples} samples in {dt * 1e3:.1f} ms incl. statevector forward)")
    return {"samples_per_sec": rate, "num_qubits": num_qubits}
