"""Adversarial variational inference (prior-contrastive) engine.

Rebuild of ``adversarial_vi.py`` (reference): an MLP discriminator is trained
to separate Born-machine samples from prior samples; the Born machine is
updated by REINFORCE on the reward ``logit_d(z, x) − log p(x|z)`` with an EMA
baseline. The whole epoch — k_D discriminator steps, k_G REINFORCE steps,
scheduler bookkeeping, TVD eval, best-snapshotting — is one ``lax.scan`` body
jitted into a single XLA program; sampling uses on-device
``jax.random.categorical`` and ``log p(x|z)`` is a precomputed ``2^n`` table
gathered per sample (vs the reference's per-sample Python marginalization
loop, ``adversarial_vi.py:60-102`` — SURVEY.md §3.3's hot spot).

Matched semantics (reference file:line):
- D loss: BCE-with-logits on batch Born (label 1) vs batch prior (label 0)
  samples, k_classifier_steps per epoch (``adversarial_vi.py:151-182``)
- classifier input z or concat(z, x) by declared input width (``:157-165``)
- reward r = logit_d − log p(x|z); baseline initialized to the first batch
  mean at epoch 0, then EMA with ``baseline_decay`` (``:200-214``)
- entropy bonus hard-coded −0.01·log q inside the REINFORCE loss (``:219-221``)
- loss_q = mean(log q · stop_grad(r − b) − bonus) (``:221``)
- NaN/Inf guard skipping the Born update (``:223-231``)
- per-epoch cosine LR stepping for both optimizers (``:237-240``)
- log p(x|z) edge cases: prior(z) < 1e-9 ⇒ ±inf; else log(p + 1e-9) (``:91-100``)
- best-TVD state snapshots for both networks, restored after training
  (``:243-268``; the reference gates restoration on ``verbose`` — fixed here).
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..core.bayes_net import BayesianNetwork
from ..core.bits import generate_all_binary_outcomes, jnp_index_to_bits
from ..models.born_classical import ClassicalBornMachine
from ..models.classifier import BinaryClassifierMLP
from .common import (force_fetch, global_norm, guarded_update, history_to_numpy,
                     make_optimizer, scan_logging_supported, tree_select)
from .ksd import _posterior_vec_from


class AdversarialVariationalInference:
    def __init__(self, bayesian_network: BayesianNetwork, latent_vars_names: Sequence[str],
                 observed_vars_names: Sequence[str], born_machine_config: Optional[dict] = None,
                 classifier_config: Optional[dict] = None, dtype=jnp.float32, seed: int = 0,
                 born_machine=None):
        """``born_machine_config`` builds the reference's classical Born
        machine; alternatively pass a ready model (e.g. a
        ``QuantumBornMachine``) via ``born_machine`` — anything exposing
        ``init/probs/get_prob_dict`` works, enabling the BASELINE.json
        "quantum Born machine + adversarial objective" configuration the
        reference itself never supported."""
        self.bn = bayesian_network
        self.latent_vars_names = list(latent_vars_names)
        self.observed_vars_names = list(observed_vars_names)
        self.num_latent_vars = len(latent_vars_names)
        self.num_observed_vars = len(observed_vars_names)
        self.dtype = dtype
        self.seed = seed

        born_machine_config = dict(born_machine_config or {})
        if born_machine is not None:
            self.born_machine = born_machine
        else:
            # Reference forces small_random init (adversarial_vi.py:27).
            born_machine_config = {**born_machine_config, "init_method": "small_random"}
            self.born_machine = ClassicalBornMachine(
                num_latent_vars=self.num_latent_vars, dtype=dtype, **born_machine_config
            )
        classifier_config = dict(classifier_config or {})
        classifier_input_dim = self.num_latent_vars
        if born_machine_config.get("conditioning_dim", 0) > 0:
            classifier_input_dim += born_machine_config["conditioning_dim"]
        self.classifier = BinaryClassifierMLP(input_dim=classifier_input_dim,
                                              **classifier_config)
        self.classifier_input_dim = classifier_input_dim

        k0, k1 = jax.random.split(jax.random.PRNGKey(seed))
        self.born_params = self.born_machine.init(k0)
        self.classifier_vars = self.classifier.init_variables(k1)

        # Tabulated prior p(z), renormalized if needed (adversarial_vi.py:37-47).
        prior = self.bn.marginal_table(self.latent_vars_names)
        s = prior.sum()
        if s > 0 and not np.isclose(s, 1.0):
            prior = prior / s
        self.prior_z_probs = jnp.asarray(prior, dtype=dtype)
        self.prior_z_dist_dict = {
            t: float(prior[i])
            for i, t in enumerate(generate_all_binary_outcomes(self.num_latent_vars))
        }
        self.history_: Optional[dict] = None
        self._x_condition = None

    # ---------------------------------------------------------------- tables

    def _log_p_x_given_z_table(self, x_observation_dict) -> np.ndarray:
        """Dense log p(x|z) over all 2^n z, with the reference's edge cases
        (adversarial_vi.py:91-100): prior < 1e-9 ⇒ ±inf; else log(p + 1e-9)."""
        joint = self.bn.conditional_joint_table(self.latent_vars_names, x_observation_dict)
        prior = np.asarray(self.prior_z_probs, dtype=np.float64)
        out = np.empty_like(joint)
        low_prior = prior < 1e-9
        ratio = np.where(low_prior, 1.0, joint / np.where(low_prior, 1.0, prior))
        out = np.log(ratio + 1e-9)
        out[low_prior & (joint > 1e-9)] = np.inf
        out[low_prior & (joint <= 1e-9)] = -np.inf
        return out

    # ----------------------------------------------------------------- train

    def train(self, x_observation_dict: Dict[str, int], num_epochs: int, batch_size: int,
              lr_born_machine: float, lr_classifier: float, k_classifier_steps: int = 1,
              k_born_steps: int = 1, verbose: bool = True, true_posterior_for_tvd=None,
              use_lr_scheduler: bool = True, gradient_clip_norm: float = 10.0,
              baseline_decay: float = 0.99, optimizer_type: str = "adam",
              adam_betas=(0.9, 0.999), seed: Optional[int] = None,
              checkpoint_path: Optional[str] = None,
              profile_dir: Optional[str] = None,
              chunk_epochs: Optional[int] = None,
              resume_state_path: Optional[str] = None,
              fail_after_chunks: Optional[int] = None,
              log_p_floor: Optional[float] = None) -> dict:
        """``chunk_epochs``: split the epoch scan into separately dispatched
        device programs of at most this many epochs — bit-identical to the
        single scan (the carry: both parameter sets, both optimizer states
        incl. cosine-schedule counts, the EMA baseline, RNG key and best
        snapshots flows across chunks on device). Required for long runs on
        runtime-bounded backends (the tunneled TPU worker kills ~2-minute
        programs), same machinery as ``run_ksd_scan`` (engines/ksd.py).

        ``resume_state_path`` (chunked mode only): durable mid-training
        resume — after every chunk the carry + history is snapshotted to this
        ``.npz``; an existing file resumes from its chunk boundary,
        bit-identical to an uninterrupted run."""
        if resume_state_path and not chunk_epochs:
            raise ValueError("resume_state_path requires chunk_epochs")
        if self.num_observed_vars > 0 and set(x_observation_dict) != set(self.observed_vars_names):
            raise ValueError("Keys in x_observation_dict must match self.observed_vars_names.")

        n = self.num_latent_vars
        dtype = self.dtype
        x_obs = jnp.asarray(
            [x_observation_dict[nm] for nm in self.observed_vars_names], dtype=dtype
        )
        x_cond = None
        if self.born_machine.conditioning_dim > 0:
            if self.num_observed_vars == 0:
                raise ValueError("Born machine is conditional but no observed vars specified.")
            if self.born_machine.conditioning_dim != self.num_observed_vars:
                raise ValueError("Born machine conditioning_dim must match num_observed_vars.")
            x_cond = x_obs
        self._x_condition = x_cond

        include_x = (
            self.classifier_input_dim == n + self.num_observed_vars
            and self.num_observed_vars > 0
        )
        log_p_np = self._log_p_x_given_z_table(x_observation_dict)
        if log_p_floor is not None:
            # Large-n enablement (round 4, documented deviation): the
            # reference's ±inf edge cases (adversarial_vi.py:91-100) are
            # exact at n=3 but break REINFORCE from n ≈ 16 — near-uniform
            # early Born samples hit prior(z) < 1e-9 states (min prior
            # ~0.05^n for the random-CPT networks), one ±inf reward makes
            # the whole batch loss non-finite, and the NaN guard then skips
            # EVERY update (measured at 16q: TVD frozen at init for 3000
            # epochs). A finite clamp at ±log_p_floor keeps the reward
            # signal and is exact wherever the reference's table is finite.
            log_p_np = np.clip(log_p_np, -log_p_floor, log_p_floor)
        log_p_table = jnp.asarray(log_p_np, dtype=dtype)
        posterior_vec = _posterior_vec_from(true_posterior_for_tvd, n, dtype)
        track_tvd = posterior_vec is not None

        opt_born = make_optimizer(optimizer_type, lr_born_machine, num_epochs,
                                  use_lr_scheduler, adam_betas, gradient_clip_norm,
                                  steps_per_epoch=k_born_steps)
        opt_clf = make_optimizer(optimizer_type, lr_classifier, num_epochs,
                                 use_lr_scheduler, adam_betas, gradient_clip_norm,
                                 steps_per_epoch=k_classifier_steps)

        bm = self.born_machine
        clf = self.classifier
        prior_logits = jnp.log(jnp.clip(self.prior_z_probs, 1e-30, None))
        has_batch_stats = "batch_stats" in self.classifier_vars

        is_classical = isinstance(bm, ClassicalBornMachine)

        def bm_probs(bp, rng=None, train=False):
            if is_classical:
                return bm.probs(bp, x_cond, train=train, dropout_rng=rng)
            return bm.probs(bp).astype(dtype)

        def clf_input(z):
            if include_x:
                xb = jnp.broadcast_to(x_obs, (z.shape[0], x_obs.shape[0]))
                return jnp.concatenate([z, xb], axis=1)
            return z

        def sample_q(bp, key, rng):
            p = bm_probs(bp, rng, train=True)
            pp = p + 1e-10
            logits = jnp.log(pp / pp.sum())
            idx = jax.random.categorical(key, logits, shape=(batch_size,))
            return jnp_index_to_bits(idx, n, dtype=dtype), idx

        def sample_prior(key):
            idx = jax.random.categorical(key, prior_logits, shape=(batch_size,))
            return jnp_index_to_bits(idx, n, dtype=dtype)

        def clf_apply(cv, x, train):
            if has_batch_stats and train:
                logits, updates = clf.apply(cv, x, train=True, mutable=["batch_stats"])
                return logits, {**cv, **updates}
            return clf.apply(cv, x, train=train), cv

        def epoch_step(carry, epoch, log_p_table, posterior_vec):
            (bp, bo, cv, co, key, baseline,
             best_tvd, best_epoch, best_bp, best_cv, best_probs) = carry

            # --- Discriminator phase (adversarial_vi.py:151-182) ---
            loss_d = jnp.asarray(0.0, dtype)
            gnorm_d = jnp.asarray(0.0, dtype)
            for _ in range(k_classifier_steps):
                key, kq, kp, kd = jax.random.split(key, 4)
                z_born, _ = sample_q(bp, kq, kd)
                z_prior = sample_prior(kp)
                inputs = jnp.concatenate([clf_input(z_born), clf_input(z_prior)], axis=0)
                labels = jnp.concatenate(
                    [jnp.ones((batch_size, 1), dtype), jnp.zeros((batch_size, 1), dtype)], axis=0
                )

                def d_loss_fn(params_cv):
                    vars_ = {**cv, "params": params_cv}
                    logits, new_vars = clf_apply(vars_, inputs, train=True)
                    # BCEWithLogits, mean reduction.
                    l = jnp.mean(
                        jnp.clip(logits, 0, None) - logits * labels
                        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
                    )
                    return l, new_vars

                (loss_d, new_vars), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                    cv["params"]
                )
                gnorm_d = global_norm(grads)
                new_p, co = guarded_update(opt_clf, grads, co, cv["params"],
                                           jnp.isfinite(loss_d))
                cv = {**new_vars, "params": new_p}

            # --- Born (REINFORCE) phase (adversarial_vi.py:187-231) ---
            loss_q = jnp.asarray(jnp.nan, dtype)
            gnorm_q = jnp.asarray(0.0, dtype)
            for _ in range(k_born_steps):
                key, kq, kd = jax.random.split(key, 3)

                def q_loss_fn(bp_):
                    z_q, idx = sample_q(bp_, kq, kd)
                    logits_d, _ = clf_apply(cv, clf_input(z_q), train=False)
                    logit_vals = logits_d[:, 0]
                    log_p = log_p_table[idx]
                    raw_reward = logit_vals - log_p
                    batch_mean = jax.lax.stop_gradient(raw_reward.mean())
                    new_baseline = jnp.where(
                        epoch == 0,
                        batch_mean,
                        baseline_decay * baseline + (1 - baseline_decay) * batch_mean,
                    )
                    reinforce = raw_reward - new_baseline
                    p = bm_probs(bp_, kd, train=True)
                    log_q = jnp.log(jnp.clip(p, 1e-10, None))[idx]
                    entropy_bonus = -0.01 * log_q  # hard-coded, adversarial_vi.py:219
                    loss = (log_q * jax.lax.stop_gradient(reinforce) - entropy_bonus).mean()
                    return loss, new_baseline

                (loss_q, baseline), grads = jax.value_and_grad(q_loss_fn, has_aux=True)(bp)
                gnorm_q = global_norm(grads)
                bp, bo = guarded_update(opt_born, grads, bo, bp, jnp.isfinite(loss_q))

            # --- TVD eval + best snapshot (adversarial_vi.py:243-254) ---
            if track_tvd:
                q_eval = bm_probs(bp)
                tvd = 0.5 * jnp.abs(q_eval - posterior_vec).sum()
                improved = tvd < best_tvd
                best_tvd = jnp.where(improved, tvd, best_tvd)
                best_epoch = jnp.where(improved, epoch, best_epoch)
                best_bp = tree_select(improved, bp, best_bp)
                best_cv = tree_select(improved, cv, best_cv)
                best_probs = jnp.where(improved, q_eval, best_probs)
            else:
                tvd = jnp.asarray(jnp.nan, dtype)

            if verbose and scan_logging_supported():
                # Periodic console logging (adversarial_vi.py:256-262).
                log_every = max(1, num_epochs // 20)

                def _log(e, ld, lq, t_):
                    msg = (f"Epoch {int(e) + 1}/{num_epochs} | Loss D: {float(ld):.4f} "
                           f"| Loss G: {float(lq):.4f}")
                    if np.isfinite(float(t_)):
                        msg += f" | TVD: {float(t_):.4f}"
                    print(msg)

                jax.lax.cond(
                    ((epoch % log_every) == 0) | (epoch == num_epochs - 1),
                    lambda args: jax.debug.callback(_log, *args),
                    lambda args: None,
                    (epoch, loss_d, loss_q, tvd),
                )

            carry = (bp, bo, cv, co, key, baseline,
                     best_tvd, best_epoch, best_bp, best_cv, best_probs)
            return carry, (loss_d, loss_q, tvd, gnorm_q, gnorm_d)

        def scan_epochs(carry, epochs, log_p, pv):
            return jax.lax.scan(
                lambda c, e: epoch_step(c, e, log_p, pv), carry, epochs)

        def unpack(carry, outs):
            (bp, _, cv, _, _, _, best_tvd, best_epoch, best_bp, best_cv,
             best_probs) = carry
            return dict(born_params=bp, classifier_vars=cv, best_tvd=best_tvd,
                        best_epoch=best_epoch, best_born=best_bp,
                        best_clf=best_cv, best_probs=best_probs, outs=outs)

        from ..train.profiling import profile_trace
        from .common import highest_matmul_precision

        key0 = jax.random.PRNGKey(self.seed if seed is None else seed)
        chunk_seconds = None
        t0 = time.perf_counter()
        with profile_trace(profile_dir), highest_matmul_precision():
            if chunk_epochs:
                # Bounded device programs, same machinery as run_ksd_scan:
                # strong-typed carry (a weak int would change aval after
                # chunk 0 and recompile the whole chunk program), tables as
                # operands (never HLO constants), fetch-synced chunk timing,
                # durable resume snapshots.
                from .ksd import (_load_chunk_state, _resume_fingerprint,
                                  _save_chunk_state)

                def _init(bp0, cv0, k):
                    return (bp0, opt_born.init(bp0), cv0,
                            opt_clf.init(cv0["params"]), k,
                            jnp.asarray(0.0, dtype),
                            jnp.asarray(jnp.inf, dtype),
                            jnp.asarray(-1, jnp.int32), bp0, cv0,
                            bm_probs(bp0))
                init = jax.jit(_init)(self.born_params, self.classifier_vars,
                                      key0)
                scan_chunk = jax.jit(scan_epochs)
                carry, parts, start = init, [], 0
                fingerprint = _resume_fingerprint(init, num_epochs,
                                                  chunk_epochs)
                if resume_state_path:
                    import os

                    if os.path.exists(resume_state_path):
                        carry, prev_outs, start = _load_chunk_state(
                            resume_state_path, init, fingerprint)
                        if prev_outs is not None:
                            parts.append(prev_outs)
                chunk_seconds = []
                for s in range(start, num_epochs, chunk_epochs):
                    epochs = jnp.arange(s, min(s + chunk_epochs, num_epochs),
                                        dtype=jnp.int32)
                    t_chunk = time.perf_counter()
                    carry, o = scan_chunk(carry, epochs, log_p_table,
                                          posterior_vec)
                    force_fetch(o[0])  # sync: bounded-runtime backend
                    chunk_seconds.append((int(len(epochs)),
                                          time.perf_counter() - t_chunk))
                    parts.append(o)
                    if resume_state_path:
                        _save_chunk_state(resume_state_path, carry, parts,
                                          s + len(epochs), fingerprint)
                    if (fail_after_chunks is not None
                            and len(chunk_seconds) >= fail_after_chunks):
                        raise RuntimeError("fault injection: killed after "
                                           f"{len(chunk_seconds)} chunks")
                if resume_state_path:
                    import os

                    if os.path.exists(resume_state_path):
                        os.remove(resume_state_path)
                outs = (parts[0] if len(parts) == 1
                        else jax.tree.map(lambda *xs: jnp.concatenate(xs),
                                          *parts))
                out = unpack(carry, outs)
            else:
                def run(bp0, cv0, k, log_p, pv):
                    init = (bp0, opt_born.init(bp0), cv0,
                            opt_clf.init(cv0["params"]), k,
                            jnp.asarray(0.0, dtype),
                            jnp.asarray(jnp.inf, dtype),
                            jnp.asarray(-1, jnp.int32), bp0, cv0,
                            bm_probs(bp0))
                    carry, outs = scan_epochs(
                        init, jnp.arange(num_epochs, dtype=jnp.int32),
                        log_p, pv)
                    return unpack(carry, outs)

                out = jax.jit(run)(self.born_params, self.classifier_vars,
                                   key0, log_p_table, posterior_vec)
            force_fetch(out["outs"][0])
        elapsed = time.perf_counter() - t0

        loss_d, loss_q, tvd_h, gq, gd = out["outs"]
        history = history_to_numpy({
            "loss_classifier": loss_d,
            "loss_born_machine": loss_q,
            "tvd": tvd_h,
            "grad_norm_born": gq,
            "grad_norm_classifier": gd,
        })
        history["epochs_per_sec"] = num_epochs / elapsed if elapsed > 0 else float("inf")
        history["train_seconds"] = elapsed
        if chunk_seconds:
            from .ksd import steady_epochs_per_sec

            steady = steady_epochs_per_sec(chunk_seconds)
            if steady is not None:
                history["epochs_per_sec_steady"] = steady
        self.history_ = history
        self.born_params = out["born_params"]
        self.classifier_vars = out["classifier_vars"]
        self.best_tvd_ = float(out["best_tvd"])
        self.best_epoch_ = int(out["best_epoch"])

        if track_tvd and np.isfinite(self.best_tvd_):
            if verbose:
                print(f"Restoring best parameters (TVD: {self.best_tvd_:.6f})")
            self.born_params = out["best_born"]
            self.classifier_vars = out["best_clf"]
        if checkpoint_path:
            from ..train import save_checkpoint, training_bundle

            save_checkpoint(checkpoint_path, {
                "born": training_bundle(self.born_params),
                "classifier": self.classifier_vars,
                "best_tvd": jnp.asarray(self.best_tvd_),
            })
        if verbose:
            print(f"Adversarial training: {num_epochs} epochs in {elapsed:.3f}s "
                  f"({history['epochs_per_sec']:.1f} epochs/s)")
        return history

    def get_prob_dict(self, x_condition=None) -> dict:
        return self.born_machine.get_prob_dict(
            self.born_params, self._x_condition if x_condition is None else x_condition
        )
