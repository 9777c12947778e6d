"""Amortized and vmapped training sweeps — the data-parallel axis.

The reference's conditional Born machine is amortized in principle
(``born_machine_classical_sim.py:24-48``) but every runner trains on a single
observation; and multi-seed stability studies rerun the whole script. Here
both become one vmapped XLA program (SURVEY.md §2 parallelism table: the DP
equivalent). Pass ``mesh=`` (a ``parallel.make_mesh`` mesh) to shard the
observation batch / seed axis over the ``dp`` mesh axis: inputs are placed
with a ``dp`` NamedSharding and the per-item activations pinned with
``with_sharding_constraint``, so GSPMD runs each observation's Stein matvec
(each seed's circuit) on its own devices and all-reduces only the scalar
loss mean:

- ``AmortizedKSD``: train one conditional Born machine against ALL
  observations x simultaneously — loss = mean_x KSD(q_θ(·|x) ‖ p(·|x)),
  with a per-observation score table stacked on a leading batch axis and the
  Stein matvec vmapped over it.
- ``train_multi_seed``: run K independent replicas of a quantum-KSD
  training loop in one program (vmap over the parameter axis).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..core.bayes_net import BayesianNetwork
from ..core.bits import all_bitstrings
from ..models.born_classical import ClassicalBornMachine
from ..models.born_quantum import QuantumBornMachine
from ..ops.hamming import resolve_length_scale
from ..ops.stein import (_make_gcorr_tables_impl, ksd_quadform_gcorr,
                         score_table, stein_gram_dense, stein_matvec)
from .common import (force_fetch, global_norm, guarded_update, history_to_numpy,
                     make_optimizer, tree_select)


class AmortizedKSD:
    """Conditional-Born-machine KSD trained over a batch of observations."""

    def __init__(self, bayesian_network: BayesianNetwork, latent_vars_names: Sequence[str],
                 observed_vars_names: Sequence[str], born_machine_config: Optional[dict] = None,
                 base_kernel_length_scale: float = 1.0, dtype=jnp.float32, seed: int = 0,
                 born_machine=None):
        """``born_machine_config`` builds a conditional classical Born
        machine; alternatively pass a conditioned ``QuantumBornMachine`` via
        ``born_machine`` for amortized *quantum* inference (its angle
        embedding is vmapped over the observation batch)."""
        self.bn = bayesian_network
        self.latent_vars_names = list(latent_vars_names)
        self.observed_vars_names = list(observed_vars_names)
        self.num_latent_vars = len(latent_vars_names)
        self.length_scale = resolve_length_scale(
            base_kernel_length_scale, self.num_latent_vars)
        self.dtype = dtype
        if born_machine is not None:
            self.born_machine = born_machine
        else:
            cfg = {**(born_machine_config or {}),
                   "conditioning_dim": len(observed_vars_names),
                   "init_method": "small_random"}
            self.born_machine = ClassicalBornMachine(
                num_latent_vars=self.num_latent_vars, dtype=dtype, **cfg
            )
        self.params = self.born_machine.init(jax.random.PRNGKey(seed))

    def _stacked_tables(self, observations: List[Dict[str, int]]):
        scores, posts, xs = [], [], []
        for obs in observations:
            t = self.bn.conditional_joint_table(self.latent_vars_names, obs)
            scores.append(score_table(t))
            s = t.sum()
            posts.append(t / s if s > 0 else np.zeros_like(t))
            xs.append([obs[k] for k in self.observed_vars_names])
        S = jnp.asarray(np.stack(scores), dtype=self.dtype)       # (X, 2^n, n)
        P = jnp.asarray(np.stack(posts), dtype=self.dtype)        # (X, 2^n)
        X = jnp.asarray(np.asarray(xs), dtype=jnp.float32)        # (X, d)
        return S, P, X

    def _operator_tables(self, S: jnp.ndarray):
        """Stacked per-observation Stein operator tables (leading X axis).

        Mirrors ``SteinOperator``'s size-adaptive production layout: dense
        Gram matrices at n <= 12, the n+1-column gcorr decomposition beyond
        (the naive 3n+1 ``stein_matvec`` this engine used through round 3 is
        ~4x slower at n = 20, RESULTS.md optimization log #13). Returns
        ``(quad_batch, tables)`` where ``quad_batch(q, tables) -> (X,)``
        evaluates every observation's quadratic form qᵀ K_p q."""
        n = self.num_latent_vars
        ls = self.length_scale
        if n <= 12:
            G = jax.jit(jax.vmap(
                lambda s: stein_gram_dense(s, n, ls, dtype=self.dtype)))(S)

            def quad_batch(q, tabs):
                (G_,) = tabs
                return jnp.einsum("xi,xij,xj->x", q, G_, q)

            return quad_batch, (G,)

        kron = "2d" if n <= 17 else "rows"
        corr = "folded" if n >= 24 else ("matmul" if n >= 18 else "flips")
        T = jax.jit(jax.vmap(lambda s: _make_gcorr_tables_impl(s, n)))(S)

        def quad_batch(q, tabs):
            (T_,) = tabs
            return jax.vmap(lambda qq, tt: ksd_quadform_gcorr(
                qq, tt, n, ls, 7, kron, corr))(q, T_)

        return quad_batch, (T,)

    def train(self, observations: List[Dict[str, int]], num_epochs: int = 0,
              lr: float = 3e-3, gradient_clip_norm: float = 5.0,
              entropy_weight: float = 1e-3, verbose: bool = True,
              seed: int = 0, mesh=None,
              chunk_epochs: Optional[int] = None,
              lr_phases=None) -> dict:
        """``mesh``: optional device mesh (``parallel.make_mesh``) — the
        observation batch axis of the operator tables, posteriors,
        conditioning inputs and per-observation probability rows is sharded
        over its ``dp`` axis (data parallelism across observations).

        ``chunk_epochs``: split training into bounded device programs of at
        most this many epochs (bit-identical carry across chunks) — required
        for long runs on the tunneled TPU backend, which kills device
        programs running more than ~2 minutes.

        ``lr_phases``: LR-annealed warm restarts, same semantics as the
        single-observation engines (runners/scale.py): a list of
        ``(epochs, lr)`` or ``(epochs, lr, length_scale)`` tuples; each phase
        restarts the cosine schedule from the across-phase BEST-mean-TVD
        snapshot at its own peak LR (and optionally its own kernel
        bandwidth). Overrides ``num_epochs``/``lr``. The returned history is
        the final phase's; the model is left restored at the across-phase
        best parameters (``best_mean_tvd_`` / ``best_params_``)."""
        if lr_phases:
            best_tvd, best_params = np.inf, None
            for phase in lr_phases:
                if len(phase) == 3:
                    p_epochs, p_lr, p_ls = phase
                    self.length_scale = resolve_length_scale(
                        p_ls, self.num_latent_vars)
                else:
                    p_epochs, p_lr = phase
                history = self._train_single(
                    observations, int(p_epochs), float(p_lr),
                    gradient_clip_norm, entropy_weight, verbose, seed, mesh,
                    chunk_epochs)
                if self.best_mean_tvd_ < best_tvd:
                    best_tvd, best_params = (self.best_mean_tvd_,
                                             self.best_params_)
                if verbose:
                    print(f"phase ({int(p_epochs)} epochs @ lr {p_lr}, "
                          f"l={self.length_scale:.4g}): best mean TVD "
                          f"{self.best_mean_tvd_:.6f}")
            if best_params is not None:
                self.params = best_params
                self.best_params_ = best_params
                self.best_mean_tvd_ = best_tvd
            return history
        return self._train_single(observations, num_epochs, lr,
                                  gradient_clip_norm, entropy_weight, verbose,
                                  seed, mesh, chunk_epochs)

    def _train_single(self, observations, num_epochs, lr, gradient_clip_norm,
                      entropy_weight, verbose, seed, mesh, chunk_epochs):
        n = self.num_latent_vars
        S, posts, X = self._stacked_tables(observations)
        quad_batch, tables = self._operator_tables(S)
        bm = self.born_machine
        optimizer = make_optimizer("adam", lr, num_epochs,
                                   gradient_clip_norm=gradient_clip_norm)

        if mesh is not None:
            from ..parallel.mesh import data_sharding, replicated

            tables = jax.tree.map(
                lambda x: jax.device_put(x, data_sharding(mesh, x.ndim)),
                tables)
            posts = jax.device_put(posts, data_sharding(mesh, 2))
            X = jax.device_put(X, data_sharding(mesh, 2))
            self.params = jax.device_put(self.params, replicated(mesh))
            constrain = lambda q: jax.lax.with_sharding_constraint(
                q, data_sharding(mesh, 2))
        else:
            constrain = lambda q: q

        is_classical = isinstance(bm, ClassicalBornMachine)
        # Quantum (deterministic) forwards reuse the loss forward for the
        # per-epoch eval (CLAUDE.md round-3 rule; same convention as
        # run_ksd_scan's reuse_loss_forward_for_eval): the loss forward at
        # epoch t IS epoch t-1's post-update distribution, so in-scan evals
        # lag one epoch and the final epoch is evaluated once post-scan.
        # Classical BMs train with dropout noise — they keep the separate
        # deterministic eval forward.
        reuse_eval = not is_classical

        def batch_probs(params, rng=None, train=False):
            if is_classical:
                return constrain(bm.probs(params, X, train=train, dropout_rng=rng))
            return constrain(jax.vmap(lambda x: bm.probs(params, x))(X))

        # Operator tables / posteriors pass through the jit boundary as
        # arguments (closure capture would embed them as HLO constants —
        # fatal at large n).
        def loss_fn(params, rng, tabs):
            q = batch_probs(params, rng, train=True)  # (X, 2^n)
            q = q.astype(self.dtype)
            ksd = jnp.sqrt(jnp.clip(quad_batch(q, tabs), 1e-12, None))
            ent = -(q * jnp.log(jnp.clip(q, 1e-10, None))).sum(-1)
            return (ksd - entropy_weight * ent).mean(), q

        def epoch(carry, epoch_i, tabs, posts_):
            params, opt_state, key, best_tvd, best_epoch, best_params = carry
            key, sub = jax.random.split(key)
            (loss, q), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, sub, tabs)
            ok = jnp.isfinite(loss)
            if reuse_eval:
                # q is the PRE-update forward = previous epoch's post-update
                # distribution (the init at epoch 0 — not a best candidate).
                tvd = 0.5 * jnp.abs(q - posts_).sum(-1)
                mean_tvd = tvd.mean()
                improved = (mean_tvd < best_tvd) & (epoch_i > 0)
                best_tvd = jnp.where(improved, mean_tvd, best_tvd)
                best_epoch = jnp.where(improved, epoch_i - 1, best_epoch)
                best_params = tree_select(improved, params, best_params)
                params, opt_state = guarded_update(optimizer, grads, opt_state,
                                                   params, ok)
            else:
                params, opt_state = guarded_update(optimizer, grads, opt_state,
                                                   params, ok)
                q_eval = batch_probs(params).astype(self.dtype)
                tvd = 0.5 * jnp.abs(q_eval - posts_).sum(-1)
                mean_tvd = tvd.mean()
                improved = mean_tvd < best_tvd
                best_tvd = jnp.where(improved, mean_tvd, best_tvd)
                best_epoch = jnp.where(improved, epoch_i, best_epoch)
                best_params = tree_select(improved, params, best_params)
            carry = (params, opt_state, key, best_tvd, best_epoch, best_params)
            return carry, (loss, mean_tvd, global_norm(grads))

        def scan_epochs(carry, epochs, tabs, posts_):
            return jax.lax.scan(lambda c, e: epoch(c, e, tabs, posts_),
                                carry, epochs)

        from .common import highest_matmul_precision

        chunk_seconds = None
        t0 = time.perf_counter()
        with highest_matmul_precision():
            key0 = jax.random.PRNGKey(seed)
            # Strong-typed carry scalars (weak ints change aval after chunk 0
            # and recompile the whole chunk program — WORKLOG r3).
            init = (self.params, optimizer.init(self.params), key0,
                    jnp.asarray(jnp.inf, self.dtype),
                    jnp.asarray(-1, jnp.int32), self.params)
            if chunk_epochs and chunk_epochs < num_epochs:
                scan_chunk = jax.jit(scan_epochs)
                carry, parts = init, []
                chunk_seconds = []
                for s in range(0, num_epochs, chunk_epochs):
                    epochs = jnp.arange(s, min(s + chunk_epochs, num_epochs),
                                        dtype=jnp.int32)
                    t_chunk = time.perf_counter()
                    carry, o = scan_chunk(carry, epochs, tables, posts)
                    force_fetch(o[0])  # sync: previous program finished
                    chunk_seconds.append((int(len(epochs)),
                                          time.perf_counter() - t_chunk))
                    parts.append(o)
                losses, tvds, gnorms = jax.tree.map(
                    lambda *xs: jnp.concatenate(xs), *parts)
            else:
                run = jax.jit(scan_epochs)
                carry, (losses, tvds, gnorms) = run(
                    init, jnp.arange(num_epochs, dtype=jnp.int32), tables,
                    posts)
            (params, _, _, best_tvd, best_epoch, best_params) = carry
            if reuse_eval:
                # Final epoch's post-update eval (in-scan evals lag one) +
                # history shift so mean_tvd[t] is epoch t's POST-update TVD,
                # matching the non-reuse path exactly (run_ksd_scan does the
                # same).
                def _final(p, bt, be, bp, posts_, th):
                    q_last = batch_probs(p).astype(self.dtype)
                    tvd_last = 0.5 * jnp.abs(q_last - posts_).sum(-1).mean()
                    improved = tvd_last < bt
                    bt = jnp.where(improved, tvd_last, bt)
                    be = jnp.where(improved, num_epochs - 1, be)
                    bp = tree_select(improved, p, bp)
                    th = jnp.concatenate(
                        [th[1:], tvd_last[None].astype(th.dtype)])
                    return bt, be, bp, th

                best_tvd, best_epoch, best_params, tvds = jax.jit(_final)(
                    params, best_tvd, best_epoch, best_params, posts, tvds)
            force_fetch(losses)
        elapsed = time.perf_counter() - t0

        # Restore the best-mean-TVD snapshot (the single-observation engines'
        # convention; pre-round-4 this engine kept the FINAL params).
        self.best_mean_tvd_ = float(best_tvd)
        self.best_epoch_ = int(best_epoch)
        self.best_params_ = best_params
        if np.isfinite(self.best_mean_tvd_):
            self.params = best_params
        else:
            self.params = params
        history = history_to_numpy({"loss": losses, "mean_tvd": tvds,
                                    "grad_norm": gnorms})
        history["epochs_per_sec"] = (num_epochs / elapsed if elapsed > 0
                                     else float("inf"))
        history["train_seconds"] = elapsed
        if chunk_seconds:
            from .ksd import steady_epochs_per_sec

            steady = steady_epochs_per_sec(chunk_seconds)
            if steady is not None:
                history["epochs_per_sec_steady"] = steady
        if verbose:
            print(f"Amortized KSD over {len(observations)} observations: "
                  f"best mean TVD {self.best_mean_tvd_:.6f} "
                  f"(final {history['mean_tvd'][-1]:.6f})")
        return history

    def posterior_for(self, observation: Dict[str, int]) -> jnp.ndarray:
        x = jnp.asarray([observation[k] for k in self.observed_vars_names],
                        dtype=jnp.float32)
        # jit, not eager: per-op dispatch of a circuit forward is ~90 ms/op
        # through the TPU tunnel and eager complex ops are UNIMPLEMENTED on
        # the axon backend outright. HIGHEST precision to match the training
        # eval — at DEFAULT the TPU's bf16 matmul passes inflated a 16q
        # amortized eval TVD 0.0786 -> 0.1352 (measured round 4; same effect
        # as RESULTS.md optimization log #9).
        from .common import highest_matmul_precision

        with highest_matmul_precision():
            return jax.jit(self.born_machine.probs)(self.params, x)


def train_multi_seed(bayesian_network: BayesianNetwork, latent_vars_names, observed_dict,
                     num_seeds: int = 4, ansatz_layers: int = 2,
                     ansatz_type: str = "hardware_efficient", num_epochs: int = 200,
                     lr: float = 5e-3, gradient_clip_norm: float = 10.0,
                     base_seed: int = 0, mesh=None, params0=None):
    """K independent quantum-KSD replicas trained in ONE vmapped program.

    Returns (stacked final params (K, P), per-seed tvd history (epochs, K),
    per-seed loss history (epochs, K)). The reference's stability studies
    rerun scripts serially; here replicas vectorize over the model axis and,
    with ``mesh=``, shard the seed axis over the mesh's ``dp`` devices.

    Every replica carries its own optimizer state and is updated through the
    per-seed NaN guard (``guarded_update``): a non-finite loss in one seed
    freezes that seed's params, optimizer moments AND schedule count without
    touching the others — exactly what K independent single-seed runs
    (``run_ksd_scan``) would do. Gradient clipping is likewise per-seed.
    """
    n = len(latent_vars_names)
    bn = bayesian_network
    t = bn.conditional_joint_table(latent_vars_names, observed_dict)
    S = jnp.asarray(score_table(t), dtype=jnp.float32)
    post = jnp.asarray(t / t.sum(), dtype=jnp.float32)
    B = jnp.asarray(all_bitstrings(n), dtype=jnp.float32)
    qbm = QuantumBornMachine(n, ansatz_layers=ansatz_layers, ansatz_type=ansatz_type)
    if params0 is None:
        keys = jax.random.split(jax.random.PRNGKey(base_seed), num_seeds)
        params0 = jax.vmap(qbm.init)(keys)  # (K, P)
    else:
        params0 = jnp.asarray(params0)
        if params0.shape[0] != num_seeds:
            raise ValueError(f"params0 leading axis {params0.shape[0]} != "
                             f"num_seeds {num_seeds}")
    optimizer = make_optimizer("adam", lr, num_epochs,
                               gradient_clip_norm=gradient_clip_norm)
    if mesh is not None:
        from ..parallel.mesh import data_sharding

        params0 = jax.device_put(params0, data_sharding(mesh, params0.ndim))

    if n <= 12:
        gram = stein_gram_dense(S, n, 1.0, dtype=jnp.float32)

        def quad(q):
            return q @ (gram @ q)
    else:
        def quad(q):
            return q @ stein_matvec(q, S, B, n, 1.0)

    def one_loss(p):
        q = qbm.probs(p).astype(jnp.float32)
        return jnp.sqrt(jnp.clip(quad(q), 1e-12, None))

    def epoch(carry, _):
        params, opt_state = carry
        losses, grads = jax.vmap(jax.value_and_grad(one_loss))(params)
        # Per-seed NaN guard: each replica has its own optimizer state, so a
        # diverged seed skips its update (and schedule step) independently.
        params, opt_state = jax.vmap(
            lambda g, s, p, ok: guarded_update(optimizer, g, s, p, ok)
        )(grads, opt_state, params, jnp.isfinite(losses))
        q = jax.vmap(lambda p: qbm.probs(p).astype(jnp.float32))(params)
        tvd = 0.5 * jnp.abs(q - post[None, :]).sum(-1)
        return (params, opt_state), (losses, tvd)

    run = jax.jit(lambda p: jax.lax.scan(
        epoch, (p, jax.vmap(optimizer.init)(p)), None, length=num_epochs))
    from .common import highest_matmul_precision

    with highest_matmul_precision():
        (params, _), (losses, tvds) = run(params0)
        force_fetch(losses)
    return params, np.asarray(tvds), np.asarray(losses)
