"""Distributed sampled-KSD engine: the real n ≥ 30 multi-chip training path.

``DistributedQuantumKSDVariationalInference`` (engines/distributed.py) is
exact-only — its per-device (2^n/D, n) float score shards and n+1 Kronecker
columns die around n ≈ 25-26, exactly where multi-chip starts to matter. This
engine composes the three pieces that scale past that wall:

1. the fully distributed ansatz executor (state sharded 2^n/D per device,
   ``parallel/distributed_ansatz.py``),
2. distributed two-stage measurement sampling (bit-identical to the
   single-device ``sample_indices_2d``; ``parallel/distributed_sampled.py``),
3. the sampled U-statistic estimator — CPT-factored scores, (M, M) sample
   Gram, REINFORCE surrogate with loo/cv baselines (``ops/stein_sampled.py``)
   — whose per-sample structures are O(M·n + M²), independent of 2^n, and
   run replicated while gradients flow back through the psum'd row gather
   into the owning shard and the sharded circuit.

Loss parity vs the single-device ``SampledKSDVariationalInference`` is exact
(same key ⇒ same shots ⇒ same losses; asserted on the 8-virtual-device CPU
mesh in tests/test_distributed_sampled.py and in ``__graft_entry__``'s
multi-chip dryrun).

No reference counterpart: the reference is single-process, exact-only, and
capped at n = 3 in practice (SURVEY.md §2, §6).
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..core.bayes_net import BayesianNetwork
from ..core.bits import all_bitstrings, jnp_index_to_bits
from ..core.factors import make_latent_log_joint_fn
from ..ops.hamming import resolve_length_scale
from ..ops.stein_sampled import (ksd_ustat, reinforce_surrogate,
                                 reinforce_surrogate_cv, score_at_samples,
                                 stein_gram_samples)
from ..parallel.distributed_ansatz import make_distributed_ansatz_probs
from ..parallel.distributed_sampled import make_distributed_two_stage_sampler
from ..parallel.mesh import make_mesh, replicated, state_sharding
from .common import (force_fetch, global_norm, guarded_update,
                     highest_matmul_precision, history_to_numpy,
                     make_optimizer, tree_select)
from .ksd import _posterior_vec_from


class DistributedSampledKSDVariationalInference:
    """Mesh-sharded counterpart of ``SampledKSDVariationalInference`` —
    same estimator, same training surface, every 2^n buffer distributed."""

    def __init__(self, bayesian_network: BayesianNetwork,
                 latent_vars_names: Sequence[str],
                 observed_vars_names: Sequence[str], *,
                 qbm_ansatz_layers: int = 4,
                 qbm_ansatz_type: str = "hardware_efficient",
                 qbm_init_method: str = "small_random", qbm_edges=None,
                 base_kernel_length_scale: float = 1.0,
                 num_samples: int = 512, seed: int = 0,
                 grad_baseline: str = "loo",
                 mesh: Optional[Mesh] = None,
                 num_devices: Optional[int] = None,
                 state_dtype=jnp.complex64):
        if mesh is None:
            mesh = make_mesh(num_devices)
        if qbm_ansatz_type == "bn_structured" and qbm_edges is None:
            from ..sim.structured import latent_edges

            qbm_edges = latent_edges(bayesian_network, latent_vars_names)
        self.mesh = mesh
        self.bn = bayesian_network
        self.latent_vars_names = list(latent_vars_names)
        self.observed_vars_names = list(observed_vars_names)
        self.num_latent_vars = len(self.latent_vars_names)
        self.length_scale = resolve_length_scale(
            base_kernel_length_scale, self.num_latent_vars)
        self.num_samples = int(num_samples)
        self.seed = seed
        if grad_baseline not in ("loo", "mean", "none", "cv"):
            raise ValueError(
                f"grad_baseline must be loo|mean|none|cv, got {grad_baseline!r}")
        self.grad_baseline = grad_baseline
        self.ansatz_type = qbm_ansatz_type
        self.ansatz_layers = qbm_ansatz_layers
        self.edges = list(qbm_edges) if qbm_edges is not None else None
        self._probs = make_distributed_ansatz_probs(
            mesh, self.num_latent_vars, qbm_ansatz_layers, qbm_ansatz_type,
            dtype=state_dtype, edges=self.edges)
        if qbm_ansatz_type == "basic":
            self.num_params = 2 * qbm_ansatz_layers * self.num_latent_vars
        else:
            self.num_params = 3 * qbm_ansatz_layers * self.num_latent_vars
        key = jax.random.PRNGKey(seed)
        if qbm_init_method == "zero":
            p0 = jnp.zeros(self.num_params, dtype=jnp.float32)
        elif qbm_init_method == "small_random":
            p0 = 0.1 * jax.random.normal(key, (self.num_params,),
                                         dtype=jnp.float32)
        else:
            p0 = jax.random.uniform(key, (self.num_params,),
                                    dtype=jnp.float32, maxval=2.0 * np.pi)
        self.params = jax.device_put(p0, replicated(mesh))
        self.history_: Optional[dict] = None

    def train(self, x_observation_dict: Dict[str, int], num_epochs: int,
              lr_born_machine: float, verbose: bool = True,
              true_posterior_for_tvd=None, use_lr_scheduler: bool = True,
              gradient_clip_norm: float = 10.0, optimizer_type: str = "adam",
              adam_betas=(0.9, 0.999), seed: Optional[int] = None,
              chunk_epochs: Optional[int] = None,
              reuse_loss_forward_for_eval: bool = False) -> dict:
        """Same surface and RNG schedule as
        ``SampledKSDVariationalInference.train`` (shot-for-shot identical
        given the same seed), every 2^n array sharded over the mesh."""
        n, M = self.num_latent_vars, self.num_samples
        log_joint_z = make_latent_log_joint_fn(
            self.bn, self.latent_vars_names, x_observation_dict)
        posterior_vec = _posterior_vec_from(true_posterior_for_tvd, n,
                                            jnp.float32)
        track = posterior_vec is not None
        if track:
            posterior_vec = jax.device_put(posterior_vec,
                                           state_sharding(self.mesh))
        optimizer = make_optimizer(optimizer_type, lr_born_machine,
                                   num_epochs, use_lr_scheduler, adam_betas,
                                   gradient_clip_norm)
        rb = (n + 1) // 2
        R, C = 1 << rb, 1 << (n - rb)
        sampler = make_distributed_two_stage_sampler(self.mesh, n, M)
        use_cv = self.grad_baseline == "cv"
        if use_cv:
            Br = jnp.asarray(all_bitstrings(rb, np.float32))
            Bc = jnp.asarray(all_bitstrings(n - rb, np.float32))
        probs = self._probs

        def epoch_losses(params, key):
            q = probs(params).astype(jnp.float32)      # (2^n,), sharded
            P2 = q.reshape(R, C)
            idx, q_at = sampler(P2, key)               # replicated (M,)
            log_q = jnp.log(jnp.clip(q_at, 1e-12, None))
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
                    tvd = 0.5 * jnp.abs(q - post).sum()
                    imp = (tvd < bt) & (epoch > 0)
                    bt = jnp.where(imp, tvd, bt)
                    be = jnp.where(imp, epoch - 1, be)
                    bp = tree_select(imp, p, bp)
                    p, st = guarded_update(optimizer, grads, st, p, ok)
                elif track:
                    p, st = guarded_update(optimizer, grads, st, p, ok)
                    q_eval = probs(p).astype(jnp.float32)
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
                make_step(post), init,
                jnp.arange(num_epochs, dtype=jnp.int32))
            return p, bt, be, bp, hist

        t0 = time.perf_counter()
        with highest_matmul_precision():
            key0 = jax.random.PRNGKey(self.seed if seed is None else seed)
            if chunk_epochs and chunk_epochs < num_epochs:
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
                hist = jax.tree.map(lambda *xs: jnp.concatenate(xs), *parts)
                params, _, _, bt, be, bp = carry
                losses, tvds, gnorms, skipped = hist
            else:
                jrun = (jax.jit(run) if track
                        else jax.jit(lambda p, k: run(p, k, None)))
                out = (jrun(self.params, key0, posterior_vec) if track
                       else jrun(self.params, key0))
                params, bt, be, bp, (losses, tvds, gnorms, skipped) = out
            if reuse_eval:
                tvd_fin = float(jax.jit(
                    lambda p, pv: 0.5 * jnp.abs(
                        probs(p).astype(jnp.float32) - pv).sum())(
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
        history["epochs_per_sec"] = (num_epochs / elapsed if elapsed > 0
                                     else float("inf"))
        if chunk_epochs and chunk_epochs < num_epochs:
            from .ksd import steady_epochs_per_sec

            steady = steady_epochs_per_sec(chunk_seconds)
            if steady is not None:
                history["epochs_per_sec_steady"] = steady
        history["train_seconds"] = elapsed
        history["num_skipped_updates"] = int(np.asarray(skipped).sum())
        self.history_ = history
        if verbose:
            print(f"Distributed sampled KSD ({self.mesh.devices.size} devices, "
                  f"{M} shots/epoch): {num_epochs} epochs in {elapsed:.3f}s "
                  f"({history['epochs_per_sec']:.1f} epochs/s)")
        return history
