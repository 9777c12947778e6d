"""Sampled-KSD variational inference: U-statistic KSD + REINFORCE gradients.

Scaling path past exact Stein enumeration. The exact engines (engines/ksd.py)
evaluate ``qᵀ K_p q`` over all 2^n outcomes — optimal up to n ≈ 22, but the
(2^n, n) float64 score table and the 3n+1 Kronecker passes eventually exceed
memory. This engine needs **no 2^n-sized Stein structures**: per epoch it

1. samples M bitstrings from the Born machine,
2. scores them directly from the Bayesian network's CPT factors
   (core/factors.py — O(n·#nodes) per sample, never a 2^n table),
3. builds the (M, M) Stein Gram with the closed form on sample rows
   (ops/stein_sampled.py), and
4. estimates ∇θ KSD² by the score-function (REINFORCE) identity
   ∇θ E[k_p(z, z')] = 2 E[k_p(z, z') ∇θ log qθ(z)], with an exactly
   unbiased leave-index-out baseline (``grad_baseline='loo'``; see
   ops/stein_sampled.reinforce_surrogate for the bias analysis).

No reference counterpart: ``sozoluffy/TensorNetworks`` is exact-only (its
O(4^n)-per-epoch loop caps it at 3 latent variables in practice). The
estimator math is verified exactly in tests/test_sampled_ksd.py (the
enumerated-weights form of the surrogate reproduces ∇(qᵀ K_p q) to fp
precision, and the sampled Gram equals ``stein_gram_dense`` on the full
enumeration).

The born machine's forward is still the exact statevector (2^n amplitudes —
the simulator's own scaling axis); what this engine removes is every
*auxiliary* 2^n structure. The Stein side was removed in round 1 (CPT-factored
scores, (M, M) sample Gram). Round 3 removes the sampling side: with
``sampling="two_stage"`` (auto at n ≥ 20) shots are drawn by exact two-stage
categorical sampling on the (R, C) super-block view of |ψ|²
(``sim.sampling.sample_indices_2d``) — row from the 2^{n/2}-length marginal
CDF, column from the M gathered rows — and ``log q`` at the shots comes from
the same two-level gather, so no 2^n-length CDF, searchsorted, or flat
scatter-backward ever exists. This is what lets training run at n = 28 on one
chip (RESULTS.md), where the flat inverse-CDF's cumsum alone is 1 GB.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.bayes_net import BayesianNetwork
from ..core.factors import make_latent_log_joint_fn
from ..models.born_quantum import QuantumBornMachine
from ..ops.hamming import resolve_length_scale
from ..ops.stein_sampled import (reinforce_surrogate, reinforce_surrogate_cv,
                                 score_at_samples, stein_gram_samples,
                                 ksd_ustat)
from ..sim.sampling import gather_2d, sample_indices, sample_indices_2d
from ..core.bits import jnp_index_to_bits
from .common import (force_fetch, global_norm, guarded_update,
                     highest_matmul_precision, history_to_numpy,
                     make_optimizer, tree_select)
from .ksd import _posterior_vec_from


class SampledKSDVariationalInference:
    """Quantum (or classical) Born-machine VI with sampled KSD.

    Same training surface as ``QuantumKSDVariationalInference`` plus
    ``num_samples`` (shots per epoch). ``born_machine`` may be any model
    exposing ``init`` / ``probs``; defaults to a QuantumBornMachine built
    from the ``qbm_*`` kwargs.
    """

    def __init__(self, bn: BayesianNetwork, latent_vars_names, observed_vars_names,
                 *, qbm_ansatz_layers: int = 4,
                 qbm_ansatz_type: str = "hardware_efficient",
                 qbm_init_method: str = "small_random",
                 qbm_backend: str = "auto", qbm_edges=None,
                 born_machine=None,
                 base_kernel_length_scale: float = 1.0,
                 num_samples: int = 512, seed: int = 0,
                 qbm_remat_layers: Optional[bool] = None,
                 sampling: str = "auto", qbm_grad_method: str = "auto",
                 grad_baseline: str = "loo"):
        self.bn = bn
        self.latent_vars_names = list(latent_vars_names)
        self.observed_vars_names = list(observed_vars_names)
        self.num_latent_vars = len(self.latent_vars_names)
        self.length_scale = resolve_length_scale(
            base_kernel_length_scale, self.num_latent_vars)
        self.num_samples = int(num_samples)
        self.seed = seed
        if qbm_ansatz_type == "bn_structured" and qbm_edges is None:
            from ..sim.structured import latent_edges

            qbm_edges = latent_edges(bn, self.latent_vars_names)
        # Past n ≈ 26 even the per-layer-checkpointed autodiff backward OOMs
        # one chip (measured at n=28: >20 concurrent 1 GB plane temps in the
        # transposed program); the adjoint sweep keeps the live set at two
        # statevectors regardless of depth (sim/blocked_adjoint.py).
        use_adjoint = (qbm_grad_method == "adjoint" or (
            qbm_grad_method == "auto" and self.num_latent_vars >= 26
            and qbm_ansatz_type != "bn_structured"))
        if qbm_remat_layers is None:
            qbm_remat_layers = self.num_latent_vars >= 26 and not use_adjoint
        self.born_machine = born_machine if born_machine is not None else (
            QuantumBornMachine(
                num_latent_vars=self.num_latent_vars,
                ansatz_layers=qbm_ansatz_layers, ansatz_type=qbm_ansatz_type,
                init_method=qbm_init_method,
                backend="blocked" if use_adjoint and qbm_backend == "auto" else qbm_backend,
                edges=qbm_edges, remat_layers=qbm_remat_layers,
                grad_method="adjoint" if use_adjoint else "autodiff"))
        self.params = self.born_machine.init(jax.random.PRNGKey(seed))
        if sampling == "auto":
            sampling = "two_stage" if self.num_latent_vars >= 20 else "flat"
        if sampling not in ("flat", "two_stage"):
            raise ValueError(f"sampling must be flat|two_stage|auto, got {sampling!r}")
        self.sampling = sampling
        if grad_baseline not in ("loo", "mean", "none", "cv"):
            raise ValueError(
                f"grad_baseline must be loo|mean|none|cv, got {grad_baseline!r}")
        self.grad_baseline = grad_baseline
        self.history_: Optional[dict] = None

    def train(self, x_observation_dict: Dict[str, int], num_epochs: int,
              lr_born_machine: float, verbose: bool = True,
              true_posterior_for_tvd=None, use_lr_scheduler: bool = True,
              gradient_clip_norm: float = 10.0, optimizer_type: str = "adam",
              adam_betas=(0.9, 0.999), seed: Optional[int] = None,
              chunk_epochs: Optional[int] = None,
              reuse_loss_forward_for_eval: bool = False) -> dict:
        """``reuse_loss_forward_for_eval``: same semantics as the exact
        engines (engines/ksd.py run_ksd_scan) — epoch t's loss-forward
        probabilities ARE epoch t−1's post-update distribution, so the
        per-epoch exact-TVD eval consumes the loss forward instead of running
        a second statevector forward, halving forwards per epoch (the
        dominant per-epoch cost at n ≥ 24, where the two blocked forwards
        dwarf the (M, M) Gram). The final epoch is evaluated once after the
        scan; reported best/TVD histories shift one epoch later."""
        n, M = self.num_latent_vars, self.num_samples
        log_joint_z = make_latent_log_joint_fn(
            self.bn, self.latent_vars_names, x_observation_dict)
        posterior_vec = _posterior_vec_from(true_posterior_for_tvd, n, jnp.float32)
        track = posterior_vec is not None
        optimizer = make_optimizer(optimizer_type, lr_born_machine, num_epochs,
                                   use_lr_scheduler, adam_betas,
                                   gradient_clip_norm)
        bm = self.born_machine

        two_stage = self.sampling == "two_stage"
        rb = (n + 1) // 2
        R, C = 1 << rb, 1 << (n - rb)
        use_cv = self.grad_baseline == "cv"
        if use_cv:
            from ..core.bits import all_bitstrings

            # Small (2^⌈n/2⌉, ⌈n/2⌉) bit matrices for the exact differentiable
            # bit marginals E_qθ[z] via two axis reductions of the (R, C)
            # probs view — never a (2^n, n) matrix. Variable 0 is the MSB of
            # the flat index = the MSB of the row index (core/bits.py).
            Br = jnp.asarray(all_bitstrings(rb, np.float32))
            Bc = jnp.asarray(all_bitstrings(n - rb, np.float32))

        def epoch_losses(params, key):
            q = bm.probs(params).astype(jnp.float32)
            P2 = q.reshape(R, C)
            if two_stage:
                # Measurement-shot path: (R, C) super-block sampling + the
                # two-level gather for log q — no 2^n CDF / flat scatter.
                idx, r, c = sample_indices_2d(
                    key, jax.lax.stop_gradient(P2), M)
                q_at = gather_2d(P2, r, c)
                log_q = jnp.log(jnp.clip(q_at, 1e-12, None))
            else:
                idx = sample_indices(key, jax.lax.stop_gradient(q), M)
                log_q = jnp.log(jnp.clip(q[idx], 1e-12, None))
            Z = jnp_index_to_bits(idx, n, dtype=jnp.float32)
            S_x = score_at_samples(log_joint_z, Z.astype(jnp.int32))
            gram = stein_gram_samples(S_x.astype(jnp.float32), Z, n,
                                      self.length_scale)
            est = ksd_ustat(gram)
            if use_cv:
                marg = jnp.concatenate([P2.sum(axis=1) @ Br,
                                        P2.sum(axis=0) @ Bc])
                surrogate = reinforce_surrogate_cv(gram, log_q, Z, marg)
            else:
                surrogate = reinforce_surrogate(gram, log_q,
                                                self.grad_baseline)
            # Value reads as the U-stat estimate; gradient flows only
            # through the REINFORCE surrogate.
            loss = jax.lax.stop_gradient(est - surrogate) + surrogate
            return loss, q

        reuse_eval = reuse_loss_forward_for_eval and track

        def make_step(post):
            def step(carry, epoch):
                p, st, k, bt, be, bp = carry
                k, sub = jax.random.split(k)
                (loss, q), grads = jax.value_and_grad(
                    epoch_losses, has_aux=True)(p, sub)
                gnorm = global_norm(grads)
                ok = jnp.isfinite(loss)
                if reuse_eval:
                    # q is the PREVIOUS epoch's post-update distribution
                    # (epoch 0's is the init — not a best candidate); the
                    # final epoch is evaluated once after the scan.
                    tvd = 0.5 * jnp.abs(q - post).sum()
                    imp = (tvd < bt) & (epoch > 0)
                    bt = jnp.where(imp, tvd, bt)
                    be = jnp.where(imp, epoch - 1, be)
                    bp = tree_select(imp, p, bp)
                    p, st = guarded_update(optimizer, grads, st, p, ok)
                elif track:
                    p, st = guarded_update(optimizer, grads, st, p, ok)
                    q_eval = bm.probs(p).astype(jnp.float32)
                    tvd = 0.5 * jnp.abs(q_eval - post).sum()
                    imp = tvd < bt
                    bt = jnp.where(imp, tvd, bt)
                    be = jnp.where(imp, epoch, be)
                    bp = tree_select(imp, p, bp)
                else:
                    p, st = guarded_update(optimizer, grads, st, p, ok)
                    tvd = jnp.asarray(jnp.nan, jnp.float32)
                return (p, st, k, bt, be, bp), (loss, tvd, gnorm, ~ok)

            return step

        def run(params, key, post):
            opt_state = optimizer.init(params)
            init = (params, opt_state, key,
                    jnp.asarray(jnp.inf, jnp.float32),
                    jnp.asarray(0, jnp.int32), params)
            (p, st, k, bt, be, bp), hist = jax.lax.scan(
                make_step(post), init, jnp.arange(num_epochs, dtype=jnp.int32))
            return p, bt, be, bp, hist

        t0 = time.perf_counter()
        with highest_matmul_precision():
            key0 = jax.random.PRNGKey(self.seed if seed is None else seed)
            if chunk_epochs and chunk_epochs < num_epochs:
                # Bounded device programs (see run_ksd_scan.chunk_epochs):
                # posterior rides as an operand tuple, never an HLO constant.
                def _scan_chunk(carry, epochs, pv_t):
                    return jax.lax.scan(
                        make_step(pv_t[0] if pv_t else None), carry, epochs)

                scan_chunk = jax.jit(_scan_chunk)
                pv_t = (posterior_vec,) if track else ()
                carry = (self.params, optimizer.init(self.params), key0,
                         jnp.asarray(jnp.inf, jnp.float32),
                         jnp.asarray(0, jnp.int32), self.params)
                parts, chunk_seconds = [], []
                for s in range(0, num_epochs, chunk_epochs):
                    epochs = jnp.arange(s, min(s + chunk_epochs, num_epochs),
                                        dtype=jnp.int32)
                    tc = time.perf_counter()
                    carry, o = scan_chunk(carry, epochs, pv_t)
                    np.asarray(carry[3])  # sync: previous program finished
                    chunk_seconds.append((int(epochs.shape[0]),
                                          time.perf_counter() - tc))
                    parts.append(o)
                    if verbose and len(chunk_seconds) % 10 == 0:
                        done = sum(e for e, _ in chunk_seconds)
                        print(f"  [chunk] {done}/{num_epochs} epochs "
                              f"{time.perf_counter() - t0:.0f}s "
                              f"best_tvd={float(carry[3]):.4f}", flush=True)
                hist = jax.tree.map(lambda *xs: jnp.concatenate(xs), *parts)
                params, _, _, bt, be, bp = carry
                losses, tvds, gnorms, skipped = hist
            else:
                jrun = jax.jit(run) if track else jax.jit(lambda p, k: run(p, k, None))
                out = (jrun(self.params, key0, posterior_vec) if track
                       else jrun(self.params, key0))
                params, bt, be, bp, (losses, tvds, gnorms, skipped) = out
            if reuse_eval:
                # The scan's TVDs lag one epoch — evaluate the final params
                # once (the only extra forward in the whole run).
                tvd_fin = float(jax.jit(
                    lambda p, pv: 0.5 * jnp.abs(
                        bm.probs(p).astype(jnp.float32) - pv).sum())(
                    params, posterior_vec))
                if tvd_fin < float(bt):
                    bt = jnp.asarray(tvd_fin, jnp.float32)
                    be = jnp.asarray(num_epochs - 1, jnp.int32)
                    bp = params
            force_fetch(losses)
        elapsed = time.perf_counter() - t0

        self.params = params
        self.best_tvd_ = float(bt)
        self.best_epoch_ = int(be)
        self.best_params_ = bp
        if track and np.isfinite(self.best_tvd_):
            if verbose:
                print(f"Restoring best parameters (TVD: {self.best_tvd_:.6f})")
            self.params = bp
        history = history_to_numpy(
            {"loss_ksd": losses, "tvd": tvds, "grad_norm": gnorms})
        history["epochs_per_sec"] = num_epochs / elapsed if elapsed > 0 else float("inf")
        if chunk_epochs and chunk_epochs < num_epochs:
            from .ksd import steady_epochs_per_sec

            steady = steady_epochs_per_sec(chunk_seconds)
            if steady is not None:
                history["epochs_per_sec_steady"] = steady
        history["train_seconds"] = elapsed
        history["num_skipped_updates"] = int(np.asarray(skipped).sum())
        self.history_ = history
        if verbose:
            print(f"Sampled KSD ({M} shots/epoch): {num_epochs} epochs in "
                  f"{elapsed:.3f}s ({history['epochs_per_sec']:.1f} epochs/s)")
        return history

    def get_prob_dict(self) -> dict:
        return self.born_machine.get_prob_dict(self.params)
