"""Distribution distillation: fit a Born machine directly to a target.

Beyond-reference utility (no counterpart in ``sozoluffy/TensorNetworks``; the
reference trains only through KSD / adversarial objectives). Two uses:

1. **Warm starts** — pretrain a Born machine toward a cheap surrogate (e.g.
   the product of posterior marginals) before handing it to a VI engine, by
   assigning the fitted params to ``engine.params``.
2. **Expressivity diagnostics** — when a VI run plateaus, fitting the same
   model *directly* to the exact posterior separates "the ansatz can't
   represent it" from "the VI objective doesn't prefer it". This is the probe
   that attributed the 16-qubit KSD plateau to the objective (RESULTS.md,
   "Objective quality at scale"): a direct TVD fit of the same circuit
   reaches far lower TVD than any KSD-trained model.

Runs as one jitted ``lax.scan`` with the shared optimizer stack (cosine LR,
NaN-skip) and on-device best-snapshot tracking, like the VI engines.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .common import (force_fetch, guarded_update, highest_matmul_precision,
                     make_optimizer, tree_select)


def marginals_product(probs, num_vars: int) -> np.ndarray:
    """Product of single-variable marginals of a ``2^n`` distribution.

    The cheap mean-field surrogate used for warm starts (RESULTS.md "warm
    starts": 2x better final HE TVD at 16q): captures every first-order
    marginal exactly while being representable by even shallow circuits.
    Host-side numpy (f64) — one pass per variable over the table.
    """
    p = np.asarray(probs, dtype=np.float64).reshape((2,) * num_vars)
    out = np.ones((), dtype=np.float64)
    for i in range(num_vars):
        m = p.sum(axis=tuple(j for j in range(num_vars) if j != i))
        out = np.multiply.outer(out, m)
    flat = out.reshape(-1)
    return flat / flat.sum()


def _loss(kind: str, q: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    if kind == "tvd":
        return 0.5 * jnp.abs(q - target).sum()
    if kind == "kl":
        # KL(target || q): mass-covering; standard distillation direction.
        safe_q = jnp.clip(q, 1e-12, None)
        safe_t = jnp.clip(target, 1e-12, None)
        return (target * (jnp.log(safe_t) - jnp.log(safe_q))).sum()
    if kind == "l2":
        return jnp.sum((q - target) ** 2)
    raise ValueError(f"Unknown distill loss {kind!r}; expected tvd|kl|l2")


def fit_born_machine(born_machine, target_probs, *, num_epochs: int = 1000,
                     lr: float = 0.05, loss: str = "tvd",
                     optimizer_type: str = "adam",
                     use_lr_scheduler: bool = True,
                     gradient_clip_norm: float = 10.0,
                     params0=None, x_condition=None,
                     seed: int = 0, jit: bool = True,
                     chunk_epochs: Optional[int] = None):
    """Fit ``born_machine`` so its distribution matches ``target_probs``.

    Works with either ``ClassicalBornMachine`` or ``QuantumBornMachine``
    (anything exposing ``.init(key)`` and ``.probs(params[, x])``).

    ``chunk_epochs``: like the VI engines' chunked mode — split the epoch
    scan into separately dispatched bounded programs (bit-identical results;
    one jitted chunk program reused across chunks). Required on backends
    that kill long-running device programs (the tunneled TPU) once
    ``num_epochs`` × per-epoch cost exceeds the runtime bound — e.g. direct
    fits at n ≥ 22.

    Returns ``(best_params, history)`` where ``history`` has ``loss``,
    ``tvd`` (always tracked vs the target, whatever the fit loss),
    ``best_tvd``, ``best_epoch``.
    """
    target = jnp.asarray(np.asarray(target_probs), dtype=jnp.float32)
    params = born_machine.init(jax.random.PRNGKey(seed)) if params0 is None else params0
    optimizer = make_optimizer(optimizer_type, lr, num_epochs,
                               use_lr_scheduler, (0.9, 0.999),
                               gradient_clip_norm)

    def probs_fn(p):
        if x_condition is not None:
            return born_machine.probs(p, x_condition).astype(jnp.float32)
        return born_machine.probs(p).astype(jnp.float32)

    def _scan_epochs(carry, epochs, target):
        def step(carry, epoch):
            p, st, bt, be, bp = carry
            # Eval-forward reuse (the VI engines' convention): TVD is
            # tracked from the SAME forward the loss differentiates —
            # pre-update params — instead of a second circuit pass. One
            # forward per epoch; at n = 24 the extra pass was the difference
            # between fitting and blowing the backend's program-time bound.
            def loss_and_q(pp):
                q = probs_fn(pp)
                return _loss(loss, q, target), q

            (loss_v, q), grads = jax.value_and_grad(
                loss_and_q, has_aux=True)(p)
            tvd = 0.5 * jnp.abs(q - target).sum()
            imp = tvd < bt
            bt = jnp.where(imp, tvd, bt)
            be = jnp.where(imp, epoch, be)
            bp = tree_select(imp, p, bp)
            ok = jnp.isfinite(loss_v)
            p, st = guarded_update(optimizer, grads, st, p, ok)
            return (p, st, bt, be, bp), (loss_v, tvd)

        return jax.lax.scan(step, carry, epochs)

    # Strong-typed carry scalars: a weak-typed scalar changes aval after the
    # first chunk and forces a full chunk-program recompile (WORKLOG r3).
    init = (params, optimizer.init(params), jnp.asarray(jnp.inf, jnp.float32),
            jnp.asarray(0, jnp.int32), params)
    with highest_matmul_precision():
        if chunk_epochs and jit:
            # One jitted chunk program, reused across chunks; the target
            # vector rides through the jit boundary as an operand (closure
            # capture would embed a 2^n HLO constant).
            scan_chunk = jax.jit(_scan_epochs)
            carry, parts = init, []
            for s in range(0, num_epochs, chunk_epochs):
                epochs = jnp.arange(s, min(s + chunk_epochs, num_epochs),
                                    dtype=jnp.int32)
                carry, o = scan_chunk(carry, epochs, target)
                # Sync: bounded-runtime backends kill overlapping programs.
                force_fetch(o[0])
                parts.append(o)
            losses = jnp.concatenate([p[0] for p in parts])
            tvds = jnp.concatenate([p[1] for p in parts])
            _, _, bt, be, best_params = carry
        else:
            run = (jax.jit(_scan_epochs) if jit else _scan_epochs)
            (_, _, bt, be, best_params), (losses, tvds) = run(
                init, jnp.arange(num_epochs, dtype=jnp.int32), target)
            force_fetch(losses)
    history = {
        "loss": np.asarray(losses),
        "tvd": np.asarray(tvds),
        "best_tvd": float(bt),
        "best_epoch": int(be),
    }
    return best_params, history


def fit_conditioned_born_machine(born_machine, targets, x_conditions, *,
                                 num_epochs: int = 1000, lr: float = 0.05,
                                 loss: str = "tvd",
                                 optimizer_type: str = "adam",
                                 use_lr_scheduler: bool = True,
                                 gradient_clip_norm: float = 10.0,
                                 params0=None, seed: int = 0,
                                 chunk_epochs: Optional[int] = None):
    """Conditioned direct fit: ONE conditioned Born machine fitted to a
    BATCH of target distributions simultaneously (loss = mean over
    observations). This is the amortized expressivity diagnostic (the
    conditioned analogue of use 2 above): when an amortized KSD run
    plateaus, it separates "the conditioned ansatz cannot represent several
    posteriors at once" from "the amortized objective doesn't find them" —
    the same attribution that cracked the single-observation 16q plateau
    (RESULTS.md "Objective quality at scale").

    ``targets``: (X, 2^n) array of target distributions; ``x_conditions``:
    (X, d) conditioning inputs, one row per target. Returns
    ``(best_params, history)`` with ``history['mean_tvd']`` per epoch and
    ``best_mean_tvd``/``best_epoch``.
    """
    T = jnp.asarray(np.asarray(targets), dtype=jnp.float32)
    X = jnp.asarray(np.asarray(x_conditions), dtype=jnp.float32)
    if T.ndim != 2 or X.shape[0] != T.shape[0]:
        raise ValueError(f"targets {T.shape} / x_conditions {X.shape} must "
                         "share a leading observation axis")
    params = (born_machine.init(jax.random.PRNGKey(seed))
              if params0 is None else params0)
    optimizer = make_optimizer(optimizer_type, lr, num_epochs,
                               use_lr_scheduler, (0.9, 0.999),
                               gradient_clip_norm)

    def batch_probs(p, X_):
        return jax.vmap(
            lambda x: born_machine.probs(p, x).astype(jnp.float32))(X_)

    def _scan_epochs(carry, epochs, T_, X_):
        def step(carry, epoch):
            p, st, bt, be, bp = carry

            # Eval-forward reuse (one batched forward per epoch): TVD is
            # tracked from the same forward the loss differentiates.
            def loss_and_q(pp):
                q = batch_probs(pp, X_)
                lv = jnp.mean(jax.vmap(lambda qq, tt: _loss(loss, qq, tt))(
                    q, T_))
                return lv, q

            (loss_v, q), grads = jax.value_and_grad(
                loss_and_q, has_aux=True)(p)
            tvd = (0.5 * jnp.abs(q - T_).sum(-1)).mean()
            imp = tvd < bt
            bt = jnp.where(imp, tvd, bt)
            be = jnp.where(imp, epoch, be)
            bp = tree_select(imp, p, bp)
            ok = jnp.isfinite(loss_v)
            p, st = guarded_update(optimizer, grads, st, p, ok)
            return (p, st, bt, be, bp), (loss_v, tvd)

        return jax.lax.scan(step, carry, epochs)

    init = (params, optimizer.init(params),
            jnp.asarray(jnp.inf, jnp.float32), jnp.asarray(0, jnp.int32),
            params)
    with highest_matmul_precision():
        if chunk_epochs:
            scan_chunk = jax.jit(_scan_epochs)
            carry, parts = init, []
            for s in range(0, num_epochs, chunk_epochs):
                epochs = jnp.arange(s, min(s + chunk_epochs, num_epochs),
                                    dtype=jnp.int32)
                carry, o = scan_chunk(carry, epochs, T, X)
                force_fetch(o[0])
                parts.append(o)
            losses = jnp.concatenate([p[0] for p in parts])
            tvds = jnp.concatenate([p[1] for p in parts])
            _, _, bt, be, best_params = carry
        else:
            (_, _, bt, be, best_params), (losses, tvds) = jax.jit(
                _scan_epochs)(init, jnp.arange(num_epochs, dtype=jnp.int32),
                              T, X)
            force_fetch(losses)
    history = {
        "loss": np.asarray(losses),
        "mean_tvd": np.asarray(tvds),
        "best_mean_tvd": float(bt),
        "best_epoch": int(be),
    }
    return best_params, history
