"""End-to-end distributed KSD training: gradients through the state-sharded
circuit AND the state-sharded Stein operator.

This is the n-beyond-single-chip-memory training path (SURVEY.md §5.7-5.8):
every ``2^n``-length buffer — the statevector, the probability vector q, the
score table S, and all n+1 Kronecker matvec columns — is
sharded over the mesh's ``state`` axis, so per-device memory scales as
``2^n / D``. Circuit gates on global (device-axis) bits exchange partner
shards via ``lax.ppermute`` over ICI; the Stein quadratic form mixes the
global bits with one ``all_gather`` + per-device weighted reduction; the
scalar loss is one ``psum``. Gradients flow through all of it — shard_map's
AD transposes ppermute to the inverse permute and all_gather to
psum_scatter, keeping the backward pass distributed too.

The reference has no distributed support of any kind (SURVEY.md §2); this
module is the TPU-native scaling layer built on top of the reference-parity
semantics (loss = sqrt(clamp(qᵀ K_p q, 1e-12)), ``ksd_vi.py:133-134``).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.hamming import decay_factor
from ..ops.kron import kron_matvec, kron_power_np
from .distributed_ansatz import make_distributed_ansatz_probs
from .mesh import STATE_AXIS, state_sharding
from .shard_state import _num_global_bits


def make_distributed_stein_matvec(mesh: Mesh, num_vars: int,
                                  length_scale: float = 1.0, group: int = 7):
    """Build ``matvec(q, S) -> K_p @ q`` with every operand sharded over
    the ``state`` mesh axis (q: (2^n,); S: (2^n, n) row-sharded).

    n+1-column decomposition (``ops.stein.stein_matvec_gcorr`` derives it):
    only ``[q, S_t∘q]`` ride the Kronecker apply — a local ``A^{⊗(n-k)}``
    block matmul plus ONE ``all_gather`` + per-device mixing for the k
    global bits — so the ICI payload is 2.9x smaller than the 3n+1 form.
    The 2n bit-masked columns are closed-form 2x2 G-corrections applied
    after the apply: for a LOCAL bit, an in-shard flip; for a GLOBAL
    (device-axis) bit, the flipped-bit values are the partner shard's mix
    of the SAME gathered buffer (one extra (D,)-row contraction per global
    bit per needed column — no extra collective). The round-3 cancellation
    in ``ops.stein.stein_matvec_gcorr_tables`` applies verbatim here —
    ``(1-2B_t)·cf_t ≡ a/(1-a²)`` and ``G00 + G11 = 1`` collapse every
    bits-table term, so the bits table is gone from the distributed path
    too (one fewer sharded (2^n, n) operand).
    """
    k = _num_global_bits(mesh)
    n = num_vars
    if k > n:
        raise ValueError(f"state axis ({1 << k} devices) exceeds 2^{n} states")
    a = decay_factor(n, length_scale)
    A = np.array([[1.0, a], [a, 1.0]])
    inv = 1.0 / (1.0 - a * a)
    aI = a * inv            # a/(1-a²): the constant flip weight
    G00 = -a * a * inv
    Mk = kron_power_np(A, k)  # (D, D) global-bit mixing operator
    local_vars = n - k
    rbl = (local_vars + 1) // 2
    cbl = local_vars - rbl
    spec_v = P(STATE_AXIS)
    spec_m = P(STATE_AXIS, None)

    def _flip_local(v, tl):
        """Flip local (in-shard) bit ``tl`` of a (2^{n-k},) shard: sublane-
        axis swap on the local 2D view (column bits through a transpose)."""
        from ..ops.stein import _row_bit_flip

        X = v.reshape(1 << rbl, 1 << cbl)
        if tl < rbl:
            return _row_bit_flip(X, tl).reshape(-1)
        return _row_bit_flip(X.T, tl - rbl).T.reshape(-1)

    @partial(shard_map, mesh=mesh, in_specs=(spec_v, spec_m),
             out_specs=spec_v)
    def matvec(q, S):
        V = jnp.concatenate([q[:, None], S * q[:, None]], axis=1)  # (.., n+1)
        if local_vars > 0:
            V = kron_matvec(V, A, local_vars, group=group)
        gathered = jax.lax.all_gather(V, STATE_AXIS)  # (D, 2^n/D, n+1)
        idx = jax.lax.axis_index(STATE_AXIS)
        Mk_dev = jnp.asarray(Mk, dtype=V.dtype)
        row = jnp.take(Mk_dev, idx, axis=0)  # (D,)
        Y = jnp.tensordot(row, gathered, axes=(0, 0))  # (2^n/D, n+1)
        P0, Q = Y[:, 0], Y[:, 1:]

        accS = jnp.zeros_like(P0)   # Σ_t S_t ∘ flip_t(P0)
        accU = jnp.zeros_like(P0)   # Σ_t flip_t(P0)
        accQ = jnp.zeros_like(P0)   # Σ_t flip_t(Q_t)
        for t in range(n):
            if t < k:
                # global bit: partner-shard values of [Kq, K(S_t q)] are a
                # second Mk-row mix of the already-gathered buffer
                row_p = jnp.take(Mk_dev, idx ^ (1 << (k - 1 - t)), axis=0)
                P0p = jnp.tensordot(row_p, gathered[..., 0], axes=(0, 0))
                Qtp = jnp.tensordot(row_p, gathered[..., 1 + t], axes=(0, 0))
            else:
                tl = t - k
                P0p = _flip_local(P0, tl)
                Qtp = _flip_local(Q[:, t], tl)
            accS = accS + S[:, t] * P0p
            accU = accU + P0p
            accQ = accQ + Qtp

        R = S.sum(axis=1)
        c1 = 1.0 - 1.0 / a
        c2 = 1.0 - a
        term_G = (S * Q).sum(axis=1)
        y_Rj = Q.sum(axis=1)
        y_T1 = G00 * R * P0 + aI * accS
        y_T1t = G00 * y_Rj + aI * accQ
        y_Ri = R * P0
        y_D = (G00 * n) * P0 + aI * accU

        return (
            term_G
            - c1 * (y_T1 + y_T1t)
            - c2 * (y_Ri + y_Rj - y_T1 - y_T1t)
            + 2.0 * n * (1.0 - a) * P0
            - 2.0 * (1.0 / a - a) * y_D
        )

    return matvec


def make_distributed_stein_quadform(mesh: Mesh, num_vars: int,
                                    length_scale: float = 1.0, group: int = 7):
    """``quadform(q, S) = qᵀ K_p q`` on state-sharded operands, with a
    custom VJP reusing the forward matvec (K_p is symmetric, so
    ∂(qᵀKq)/∂q = 2·K_p q — one distributed matvec total instead of two)."""
    matvec = make_distributed_stein_matvec(mesh, num_vars, length_scale, group)

    @jax.custom_vjp
    def quadform(q, S):
        return jnp.dot(q, matvec(q, S))

    def fwd(q, S):
        y = matvec(q, S)
        return jnp.dot(q, y), (y, S)

    def bwd(res, g):
        y, S = res
        # S is a constant of the objective: zero cotangent.
        return (2.0 * g * y, jnp.zeros_like(S))

    quadform.defvjp(fwd, bwd)
    return quadform


def place_stein_tables(mesh: Mesh, score: np.ndarray, num_vars: int,
                       dtype=jnp.float32):
    """Device-put the score table row-sharded over the state axis.

    Returns a 1-tuple so callers can splat it as ``op.args()``-style jit
    arguments (the bits table cancelled out of the distributed matvec in
    round 3)."""
    del num_vars
    sh = state_sharding(mesh, ndim=2, axis=0)
    S = jax.device_put(jnp.asarray(score, dtype=dtype), sh)
    return (S,)


def make_distributed_ksd_train_step(mesh: Mesh, num_wires: int, layers: int,
                                    ansatz_type: str,
                                    optimizer: optax.GradientTransformation,
                                    length_scale: float = 1.0, group: int = 7,
                                    state_dtype=jnp.complex64,
                                    eps: float = 1e-12):
    """One full distributed KSD train step: sharded circuit forward → sharded
    Stein quadratic form → loss → grads (through every collective) → update.

    Returns ``step(params, opt_state, S) -> (params, opt_state, loss)``;
    pass the table from :func:`place_stein_tables` (it crosses the jit
    boundary as an argument so it never embeds as an HLO constant). ``params``
    are replicated; the statevector, q, and the score table stay sharded
    end to end.
    """
    probs_fn = make_distributed_ansatz_probs(mesh, num_wires, layers,
                                             ansatz_type, dtype=state_dtype)
    quadform = make_distributed_stein_quadform(mesh, num_wires, length_scale,
                                               group)

    def loss_fn(params, S):
        q = probs_fn(params).astype(S.dtype)
        return jnp.sqrt(jnp.clip(quadform(q, S), eps, None))

    @jax.jit
    def step(params, opt_state, S):
        loss, grads = jax.value_and_grad(loss_fn)(params, S)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step
