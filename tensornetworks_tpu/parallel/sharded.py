"""Sharded training steps: the full KSD / adversarial programs pjit-ed over a
('dp', 'state') mesh.

Design (SURVEY.md §5.7-5.8): the ``2^n`` state axis is the workload's "long
sequence" — the probability vector q, the score table S, the bits table B and
every Kronecker matvec column are sharded over the ``state`` mesh axis with
``NamedSharding``; the Kronecker contractions on the leading (sharded) bits
then lower to XLA collective-permutes over ICI, which GSPMD inserts
automatically from the sharding constraints. Sample batches (REINFORCE /
discriminator) shard over the ``dp`` axis.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import optax

from ..models.born_quantum import QuantumBornMachine
from ..ops.stein import SteinOperator
from .mesh import Mesh, data_sharding, replicated, state_sharding


def make_sharded_ksd_step(qbm: QuantumBornMachine, op: SteinOperator, mesh: Mesh,
                          optimizer: optax.GradientTransformation):
    """One full quantum-KSD train step (forward → loss → grad → update) with
    the state axis sharded over the mesh. Returns the jit-compiled step
    function (the operator tables are placed sharded internally).

    The STATEVECTOR itself is sharded inside the circuit forward: when the
    Born machine uses the blocked executor, its state function is rebuilt
    with a ``with_sharding_constraint`` hook pinned after every layer, so
    GSPMD partitions the gate contractions (inserting ICI collective-permutes
    for gates on the sharded leading bits) instead of replicating the whole
    2^n state per device. For explicit manual control of the collective
    schedule see ``parallel.distributed_train`` (shard_map path)."""
    v_sh = state_sharding(mesh, ndim=1, axis=0)
    rep = replicated(mesh)

    gram = jax.device_put(op.gram, state_sharding(mesh, ndim=2, axis=0)) if op.dense else None
    # Production matvec form only (VERDICT r4 item 7): the n+1-column gcorr
    # decomposition, its tables sharded over the state axis. Sharding the
    # flat 2^n index = sharding the leading (row) bits of the (R, C) view:
    # St (n, 2^n) and Rv (2^n,) shard their state axis, Sfr/Sfc (b, R, C)
    # shard R. GSPMD inserts the cross-shard collectives for the leading-bit
    # flips from these constraints.
    from ..ops.stein import ksd_quadform_gcorr

    if not op.dense and op.gcorr is None:
        raise ValueError("make_sharded_ksd_step needs the gcorr-tables "
                         "operator path (dense=False, use_pallas=False)")
    dtype = op.gram.dtype if op.dense else op.gcorr.St.dtype
    tables = None
    if not op.dense:
        t = op.gcorr
        tables = type(t)(
            St=jax.device_put(t.St, state_sharding(mesh, ndim=2, axis=1)),
            Sfr=jax.device_put(t.Sfr, state_sharding(mesh, ndim=3, axis=1)),
            Sfc=jax.device_put(t.Sfc, state_sharding(mesh, ndim=3, axis=1)),
            Rv=jax.device_put(t.Rv, v_sh))

    if qbm.backend in ("blocked", "pallas2d") and qbm.conditioning_dim == 0:
        from ..sim.blocked import make_blocked_probs_fn

        probs_fn = make_blocked_probs_fn(
            qbm.num_latent_vars, qbm.ansatz_layers, qbm.ansatz_type,
            dtype=qbm.dtype,
            constrain=lambda s: jax.lax.with_sharding_constraint(s, v_sh))
    else:
        probs_fn = qbm.probs

    def loss_fn(params):
        q = probs_fn(params).astype(dtype)
        q = jax.lax.with_sharding_constraint(q, v_sh)
        if gram is not None:
            quad = jnp.dot(q, gram @ q)
        else:
            quad = ksd_quadform_gcorr(q, tables, op.num_vars,
                                      op.length_scale, op.group,
                                      op._gcorr_kron, op._gcorr_corr)
        return jnp.sqrt(jnp.clip(quad, 1e-12, None))

    @partial(jax.jit, out_shardings=(rep, None, rep))
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def make_sharded_advi_classifier_step(clf, mesh: Mesh, optimizer, batch_size: int,
                                      input_dim: int):
    """Discriminator step with the sample batch sharded over the 'dp' axis."""
    b_sh = data_sharding(mesh, ndim=2, axis=0)
    rep = replicated(mesh)

    def loss_fn(params, inputs, labels):
        logits = clf.apply({"params": params}, inputs, train=False)
        return jnp.mean(
            jnp.clip(logits, 0, None) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )

    @partial(jax.jit, in_shardings=(rep, None, b_sh, b_sh), out_shardings=(rep, None, rep))
    def step(params, opt_state, inputs, labels):
        loss, grads = jax.value_and_grad(loss_fn)(params, inputs, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step
